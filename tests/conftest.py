"""Test configuration: CPU backend, 8 virtual devices, f64 enabled.

Per SURVEY.md §4.2: unit/oracle tests run on CPU in float64; the distributed tests
use XLA's forced host-platform device count to get an 8-device mesh without TPUs.
Must run before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# lax small-matrix backend: the unrolled TPU-prod path inflates CPU compile
# times badly; its math is covered by tests/test_smallla.py explicitly
os.environ.setdefault("SCVX_SMALL_LA", "lax")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

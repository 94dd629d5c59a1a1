// Dense float64 SOCP interior-point oracle (native C++, CPU).
//
// The reference pipeline calls an external native conic solver (ECOS, C) for
// every subproblem — SURVEY.md §2.1 C7/C8. This is the TPU-native framework's
// counterpart native component: an independently-implemented Nesterov-Todd /
// Mehrotra predictor-corrector IPM used as the high-accuracy ground truth in
// tests (ECOS itself is unavailable here: no network, no wheels).
//
// Standard form:  min c'x  s.t.  A x = b,  G x + s = h,  s in K,
// K = product of nonnegative rays ("lin" entries) and second-order cones.
// Optional diagonal quadratic term P (pins + damping) via pdiag.
//
// Exposed as a C ABI for ctypes (oracle/native.py). Dense partial-pivot LU;
// sizes here are test-scale (<= a few thousand), perf is not the point.
//
// Build: g++ -O3 -shared -fPIC -o liboracle.so scvx_oracle.cpp

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

using std::size_t;

struct Mat {
  int r = 0, c = 0;
  std::vector<double> a;
  Mat() = default;
  Mat(int r_, int c_) : r(r_), c(c_), a((size_t)r_ * c_, 0.0) {}
  double& operator()(int i, int j) { return a[(size_t)i * c + j]; }
  double operator()(int i, int j) const { return a[(size_t)i * c + j]; }
};

// y += alpha * M x  (M: r x c)
void gemv(const Mat& M, const double* x, double* y, double alpha, bool trans) {
  if (!trans) {
    for (int i = 0; i < M.r; ++i) {
      double acc = 0.0;
      const double* row = &M.a[(size_t)i * M.c];
      for (int j = 0; j < M.c; ++j) acc += row[j] * x[j];
      y[i] += alpha * acc;
    }
  } else {
    for (int i = 0; i < M.r; ++i) {
      const double* row = &M.a[(size_t)i * M.c];
      double xi = alpha * x[i];
      for (int j = 0; j < M.c; ++j) y[j] += row[j] * xi;
    }
  }
}

// In-place LU with partial pivoting; returns false when singular.
bool lu_factor(Mat& M, std::vector<int>& piv) {
  int n = M.r;
  piv.resize(n);
  for (int i = 0; i < n; ++i) piv[i] = i;
  for (int k = 0; k < n; ++k) {
    int p = k;
    double best = std::fabs(M(k, k));
    for (int i = k + 1; i < n; ++i) {
      double v = std::fabs(M(i, k));
      if (v > best) { best = v; p = i; }
    }
    if (best < 1e-300) return false;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(M(k, j), M(p, j));
      std::swap(piv[k], piv[p]);
    }
    double inv = 1.0 / M(k, k);
    for (int i = k + 1; i < n; ++i) {
      double f = M(i, k) * inv;
      M(i, k) = f;
      if (f != 0.0)
        for (int j = k + 1; j < n; ++j) M(i, j) -= f * M(k, j);
    }
  }
  return true;
}

void lu_solve(const Mat& LU, const std::vector<int>& piv, double* x) {
  int n = LU.r;
  std::vector<double> b(n);
  for (int i = 0; i < n; ++i) b[i] = x[piv[i]];
  for (int i = 0; i < n; ++i) {
    double acc = b[i];
    for (int j = 0; j < i; ++j) acc -= LU(i, j) * b[j];
    b[i] = acc;
  }
  for (int i = n - 1; i >= 0; --i) {
    double acc = b[i];
    for (int j = i + 1; j < n; ++j) acc -= LU(i, j) * b[j];
    b[i] = acc / LU(i, i);
  }
  std::memcpy(x, b.data(), sizeof(double) * n);
}

struct Cones {
  int n_cones;
  const int* kind;  // 0 = lin block, 1 = soc
  const int* dim;
  int m = 0;
  int degree = 0;
  Cones(int nc, const int* k, const int* d) : n_cones(nc), kind(k), dim(d) {
    for (int i = 0; i < nc; ++i) {
      m += dim[i];
      degree += (kind[i] == 0) ? dim[i] : 1;
    }
  }
};

void cone_identity(const Cones& K, double* e) {
  int off = 0;
  for (int i = 0; i < K.n_cones; ++i) {
    if (K.kind[i] == 0)
      for (int j = 0; j < K.dim[i]; ++j) e[off + j] = 1.0;
    else {
      e[off] = 1.0;
      for (int j = 1; j < K.dim[i]; ++j) e[off + j] = 0.0;
    }
    off += K.dim[i];
  }
}

double interior_shift(const Cones& K, const double* v) {
  double alpha = 0.0;
  int off = 0;
  for (int i = 0; i < K.n_cones; ++i) {
    if (K.kind[i] == 0) {
      for (int j = 0; j < K.dim[i]; ++j) alpha = std::fmax(alpha, -v[off + j]);
    } else {
      double t = 0.0;
      for (int j = 1; j < K.dim[i]; ++j) t += v[off + j] * v[off + j];
      alpha = std::fmax(alpha, std::sqrt(t) - v[off]);
    }
    off += K.dim[i];
  }
  return alpha;
}

// Build dense W and Winv (NT scaling).
bool nt_scaling(const Cones& K, const double* s, const double* z, Mat& W,
                Mat& Winv) {
  int off = 0;
  W = Mat(K.m, K.m);
  Winv = Mat(K.m, K.m);
  for (int ic = 0; ic < K.n_cones; ++ic) {
    int d = K.dim[ic];
    if (K.kind[ic] == 0) {
      for (int j = 0; j < d; ++j) {
        double w = std::sqrt(s[off + j] / z[off + j]);
        if (!std::isfinite(w) || w <= 0) return false;
        W(off + j, off + j) = w;
        Winv(off + j, off + j) = 1.0 / w;
      }
    } else {
      const double* ss = s + off;
      const double* zz = z + off;
      double rs = ss[0] * ss[0], rz = zz[0] * zz[0];
      for (int j = 1; j < d; ++j) { rs -= ss[j] * ss[j]; rz -= zz[j] * zz[j]; }
      if (rs <= 0 || rz <= 0) return false;
      double sqs = std::sqrt(rs), sqz = std::sqrt(rz);
      std::vector<double> sb(d), zb(d);
      for (int j = 0; j < d; ++j) { sb[j] = ss[j] / sqs; zb[j] = zz[j] / sqz; }
      double dot = 0.0;
      for (int j = 0; j < d; ++j) dot += sb[j] * zb[j];
      double gamma = std::sqrt((1.0 + dot) / 2.0);
      std::vector<double> wb(d);
      wb[0] = (sb[0] + zb[0]) / (2.0 * gamma);
      for (int j = 1; j < d; ++j) wb[j] = (sb[j] - zb[j]) / (2.0 * gamma);
      double eta = std::pow(rs / rz, 0.25);
      double a = wb[0];
      for (int i = 0; i < d; ++i)
        for (int j = 0; j < d; ++j) {
          double wij, vij;
          if (i == 0 && j == 0) { wij = a; vij = a; }
          else if (i == 0) { wij = wb[j]; vij = -wb[j]; }
          else if (j == 0) { wij = wb[i]; vij = -wb[i]; }
          else {
            double base = (i == j) ? 1.0 : 0.0;
            wij = base + wb[i] * wb[j] / (1.0 + a);
            vij = wij;
          }
          W(off + i, off + j) = eta * wij;
          Winv(off + i, off + j) = vij / eta;
        }
    }
    off += d;
  }
  return true;
}

void jordan_mul(const Cones& K, const double* u, const double* v, double* out) {
  int off = 0;
  for (int ic = 0; ic < K.n_cones; ++ic) {
    int d = K.dim[ic];
    if (K.kind[ic] == 0) {
      for (int j = 0; j < d; ++j) out[off + j] = u[off + j] * v[off + j];
    } else {
      double dot = 0.0;
      for (int j = 0; j < d; ++j) dot += u[off + j] * v[off + j];
      for (int j = 1; j < d; ++j)
        out[off + j] = u[off] * v[off + j] + v[off] * u[off + j];
      out[off] = dot;
    }
    off += d;
  }
}

void jordan_solve(const Cones& K, const double* lam, const double* d_,
                  double* out) {
  int off = 0;
  for (int ic = 0; ic < K.n_cones; ++ic) {
    int d = K.dim[ic];
    if (K.kind[ic] == 0) {
      for (int j = 0; j < d; ++j) out[off + j] = d_[off + j] / lam[off + j];
    } else {
      double det = lam[off] * lam[off];
      double l1d1 = 0.0;
      for (int j = 1; j < d; ++j) {
        det -= lam[off + j] * lam[off + j];
        l1d1 += lam[off + j] * d_[off + j];
      }
      double x0 = (lam[off] * d_[off] - l1d1) / det;
      out[off] = x0;
      for (int j = 1; j < d; ++j)
        out[off + j] = (d_[off + j] - x0 * lam[off + j]) / lam[off];
    }
    off += d;
  }
}

double max_step(const Cones& K, const double* s, const double* ds) {
  double alpha = 1e30;
  int off = 0;
  for (int ic = 0; ic < K.n_cones; ++ic) {
    int d = K.dim[ic];
    if (K.kind[ic] == 0) {
      for (int j = 0; j < d; ++j)
        if (ds[off + j] < 0)
          alpha = std::fmin(alpha, -s[off + j] / ds[off + j]);
    } else {
      double cc = s[off] * s[off], bb = s[off] * ds[off], aa = ds[off] * ds[off];
      for (int j = 1; j < d; ++j) {
        cc -= s[off + j] * s[off + j];
        bb -= s[off + j] * ds[off + j];
        aa -= ds[off + j] * ds[off + j];
      }
      if (std::fabs(aa) < 1e-300) {
        if (bb < 0) alpha = std::fmin(alpha, -cc / (2.0 * bb));
      } else {
        double disc = bb * bb - aa * cc;
        if (disc >= 0) {
          double sq = std::sqrt(disc);
          double r1 = (-bb - sq) / aa, r2 = (-bb + sq) / aa;
          if (r1 > 0) alpha = std::fmin(alpha, r1);
          if (r2 > 0) alpha = std::fmin(alpha, r2);
        }
      }
      if (ds[off] < 0) alpha = std::fmin(alpha, -s[off] / ds[off]);
    }
    off += d;
  }
  return alpha;
}

}  // namespace

extern "C" {

// Returns 0 ok; stats = {gap, pres, dres, iters, converged}
int scvx_oracle_solve(int n, int p, int m, const double* c, const double* A,
                      const double* b, const double* G, const double* h,
                      int n_cones, const int* cone_kind, const int* cone_dim,
                      const double* pdiag,  // length n or NULL
                      double tol, int max_iters, double reg, double* x_out,
                      double* y_out, double* z_out, double* s_out,
                      double* stats) {
  Cones K(n_cones, cone_kind, cone_dim);
  if (K.m != m) return 1;
  Mat Am(p, n), Gm(m, n);
  std::memcpy(Am.a.data(), A, sizeof(double) * (size_t)p * n);
  std::memcpy(Gm.a.data(), G, sizeof(double) * (size_t)m * n);

  int N = n + p + m;
  std::vector<double> x(n, 0.0), y(p, 0.0), z(m, 0.0), s(m, 0.0), e(m, 0.0);
  cone_identity(K, e.data());

  Mat W, Winv;
  std::vector<int> piv;
  Mat KKT(N, N);
  std::vector<double> rhs(N), sol(N);

  auto build_and_factor = [&](const Mat& WtW) -> bool {
    KKT = Mat(N, N);
    for (int i = 0; i < n; ++i)
      KKT(i, i) = (pdiag ? pdiag[i] : 0.0) + reg;
    for (int i = 0; i < p; ++i)
      for (int j = 0; j < n; ++j) {
        KKT(j, n + i) = Am(i, j);
        KKT(n + i, j) = Am(i, j);
      }
    for (int i = 0; i < p; ++i) KKT(n + i, n + i) = -reg;
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < n; ++j) {
        KKT(j, n + p + i) = Gm(i, j);
        KKT(n + p + i, j) = Gm(i, j);
      }
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < m; ++j) KKT(n + p + i, n + p + j) = -WtW(i, j);
    return lu_factor(KKT, piv);
  };

  auto kkt_solve = [&](const double* bx, const double* by, const double* bz,
                       double* dx, double* dy, double* dz) {
    std::memcpy(rhs.data(), bx, sizeof(double) * n);
    std::memcpy(rhs.data() + n, by, sizeof(double) * p);
    std::memcpy(rhs.data() + n + p, bz, sizeof(double) * m);
    lu_solve(KKT, piv, rhs.data());
    std::memcpy(dx, rhs.data(), sizeof(double) * n);
    std::memcpy(dy, rhs.data() + n, sizeof(double) * p);
    std::memcpy(dz, rhs.data() + n + p, sizeof(double) * m);
  };

  // ---- init with W = I --------------------------------------------------
  {
    Mat I(m, m);
    for (int i = 0; i < m; ++i) I(i, i) = 1.0;
    if (!build_and_factor(I)) return 2;
    std::vector<double> bx(n, 0.0), dz(m);
    kkt_solve(bx.data(), b, h, x.data(), y.data(), dz.data());
    // s = h - G x, shifted interior
    std::memcpy(s.data(), h, sizeof(double) * m);
    gemv(Gm, x.data(), s.data(), -1.0, false);
    double a = interior_shift(K, s.data());
    for (int i = 0; i < m; ++i) s[i] += (1.0 + a) * e[i];
    // dual init
    std::vector<double> mc(n), zeros_p(p, 0.0), zeros_m(m, 0.0), xd(n);
    for (int i = 0; i < n; ++i) mc[i] = -c[i];
    kkt_solve(mc.data(), zeros_p.data(), zeros_m.data(), xd.data(), y.data(),
              z.data());
    a = interior_shift(K, z.data());
    for (int i = 0; i < m; ++i) z[i] += (1.0 + a) * e[i];
  }

  double cnorm = 1.0, bnorm = 1.0, hnorm = 1.0;
  for (int i = 0; i < n; ++i) cnorm += c[i] * c[i];
  for (int i = 0; i < p; ++i) bnorm += b[i] * b[i];
  for (int i = 0; i < m; ++i) hnorm += h[i] * h[i];
  cnorm = std::sqrt(cnorm); bnorm = std::sqrt(bnorm); hnorm = std::sqrt(hnorm);

  double gap = 1e30, pres = 1e30, dres = 1e30;
  int it = 0;
  std::vector<double> rx(n), ry(p), rz(m);
  std::vector<double> dxa(n), dya(p), dza(m), dsa(m);
  std::vector<double> dx(n), dy(p), dz(m), ds(m);
  std::vector<double> lam(m), ds_t(m), tmp(m), bz(m);

  for (it = 1; it <= max_iters; ++it) {
    // residuals
    for (int i = 0; i < n; ++i)
      rx[i] = c[i] + (pdiag ? pdiag[i] * x[i] : 0.0);
    gemv(Am, y.data(), rx.data(), 1.0, true);
    gemv(Gm, z.data(), rx.data(), 1.0, true);
    for (int i = 0; i < p; ++i) ry[i] = -b[i];
    gemv(Am, x.data(), ry.data(), 1.0, false);
    for (int i = 0; i < m; ++i) rz[i] = s[i] - h[i];
    gemv(Gm, x.data(), rz.data(), 1.0, false);

    double sz = 0.0, cx = 0.0;
    for (int i = 0; i < m; ++i) sz += s[i] * z[i];
    for (int i = 0; i < n; ++i) cx += c[i] * x[i];
    double mu = sz / K.degree;
    gap = sz / std::fmax(1.0, std::fabs(cx));
    double nry = 0, nrz = 0, nrx = 0;
    for (int i = 0; i < p; ++i) nry += ry[i] * ry[i];
    for (int i = 0; i < m; ++i) nrz += rz[i] * rz[i];
    for (int i = 0; i < n; ++i) nrx += rx[i] * rx[i];
    pres = std::sqrt(nry + nrz) / std::fmax(bnorm, hnorm);
    dres = std::sqrt(nrx) / cnorm;
    if (gap < tol && pres < tol && dres < tol) {
      it -= 1;
      break;
    }

    if (!nt_scaling(K, s.data(), z.data(), W, Winv)) break;
    Mat WtW(m, m);
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < m; ++j) {
        double acc = 0.0;
        for (int k2 = 0; k2 < m; ++k2) acc += W(i, k2) * W(k2, j);
        WtW(i, j) = acc;
      }
    if (!build_and_factor(WtW)) break;

    std::fill(lam.begin(), lam.end(), 0.0);
    gemv(W, z.data(), lam.data(), 1.0, false);

    // affine
    jordan_mul(K, lam.data(), lam.data(), ds_t.data());
    jordan_solve(K, lam.data(), ds_t.data(), tmp.data());
    for (int i = 0; i < m; ++i) bz[i] = -rz[i];
    gemv(W, tmp.data(), bz.data(), 1.0, false);
    std::vector<double> nrx_v(n), nry_v(p);
    for (int i = 0; i < n; ++i) nrx_v[i] = -rx[i];
    for (int i = 0; i < p; ++i) nry_v[i] = -ry[i];
    kkt_solve(nrx_v.data(), nry_v.data(), bz.data(), dxa.data(), dya.data(),
              dza.data());
    for (int i = 0; i < m; ++i) dsa[i] = -rz[i];
    gemv(Gm, dxa.data(), dsa.data(), -1.0, false);

    double a_aff = std::fmin(1.0, std::fmin(max_step(K, s.data(), dsa.data()),
                                            max_step(K, z.data(), dza.data())));
    double mu_aff = 0.0;
    for (int i = 0; i < m; ++i)
      mu_aff += (s[i] + a_aff * dsa[i]) * (z[i] + a_aff * dza[i]);
    mu_aff /= K.degree;
    double eta = std::pow(std::fmax(0.0, std::fmin(1.0, mu_aff / mu)), 3.0);

    // corrector
    std::vector<double> wds(m, 0.0), wdz(m, 0.0), gam(m);
    gemv(Winv, dsa.data(), wds.data(), 1.0, false);
    gemv(W, dza.data(), wdz.data(), 1.0, false);
    jordan_mul(K, wds.data(), wdz.data(), gam.data());
    for (int i = 0; i < m; ++i) ds_t[i] += gam[i] - eta * mu * e[i];
    jordan_solve(K, lam.data(), ds_t.data(), tmp.data());
    for (int i = 0; i < m; ++i) bz[i] = -rz[i];
    gemv(W, tmp.data(), bz.data(), 1.0, false);
    kkt_solve(nrx_v.data(), nry_v.data(), bz.data(), dx.data(), dy.data(),
              dz.data());
    for (int i = 0; i < m; ++i) ds[i] = -rz[i];
    gemv(Gm, dx.data(), ds.data(), -1.0, false);

    bool finite = true;
    for (int i = 0; i < n && finite; ++i) finite = std::isfinite(dx[i]);
    for (int i = 0; i < m && finite; ++i)
      finite = std::isfinite(ds[i]) && std::isfinite(dz[i]);
    if (!finite) break;

    double alpha = std::fmin(1.0, 0.98 * std::fmin(
        max_step(K, s.data(), ds.data()), max_step(K, z.data(), dz.data())));
    for (int i = 0; i < n; ++i) x[i] += alpha * dx[i];
    for (int i = 0; i < p; ++i) y[i] += alpha * dy[i];
    for (int i = 0; i < m; ++i) {
      z[i] += alpha * dz[i];
      s[i] += alpha * ds[i];
    }
  }

  std::memcpy(x_out, x.data(), sizeof(double) * n);
  std::memcpy(y_out, y.data(), sizeof(double) * p);
  std::memcpy(z_out, z.data(), sizeof(double) * m);
  std::memcpy(s_out, s.data(), sizeof(double) * m);
  stats[0] = gap;
  stats[1] = pres;
  stats[2] = dres;
  stats[3] = (double)it;
  stats[4] = (gap < tol && pres < tol && dres < tol) ? 1.0 : 0.0;
  return 0;
}

}  // extern "C"

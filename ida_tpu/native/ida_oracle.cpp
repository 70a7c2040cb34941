// ida_oracle: compact serial C++ IDA (variable-order BDF, dense Newton)
// used as (a) a differential-testing oracle for the JAX solver and (b) the
// native CPU baseline in bench.py.
//
// Role parity: the reference differential-tests against the real C SUNDIALS
// through FFI (reference benches/dense.rs:10-158, Cargo.toml sundials-sys);
// this file plays that role in-repo with zero external deps. The algorithm
// is the fixed-leading-coefficient BDF method of IDA (Brenan/Campbell/
// Petzold; SUNDIALS ida.c): same coefficient recurrences, error tests,
// order/step selection, and modified-Newton policy implemented by the JAX
// core (see ida_tpu/core/*.py docstrings for the file:line spec map).
//
// Build: g++ -O3 -shared -fPIC -o libida_oracle.so ida_oracle.cpp

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int MAXORD = 5;
constexpr int MXORDP1 = 6;
constexpr int MXNCF = 10, MXNEF = 10, MAXNLSIT = 4;
constexpr double EPCON = 0.33, XRATE = 0.25, RATEMAX = 0.9;
constexpr double UROUND = 2.220446049250313e-16;

typedef void (*res_fn)(double t, const double* y, const double* yp, double* r,
                       void* user);
typedef void (*jac_fn)(double t, double cj, const double* y, const double* yp,
                       const double* r, double* J /* row-major n*n */,
                       void* user);
typedef void (*root_fn)(double t, const double* y, const double* yp,
                        double* g /* [nrt] */, void* user);

struct Vec {
  std::vector<double> d;
  explicit Vec(int n = 0) : d(n, 0.0) {}
  double* p() { return d.data(); }
  const double* p() const { return d.data(); }
  double& operator[](int i) { return d[i]; }
  double operator[](int i) const { return d[i]; }
  int size() const { return (int)d.size(); }
};

// --- dense LU with partial pivoting (SUNDIALS denseGETRF/GETRS order) ---
static int getrf(std::vector<double>& a, std::vector<int>& piv, int n) {
  for (int k = 0; k < n; ++k) {
    int l = k;
    for (int i = k + 1; i < n; ++i)
      if (std::fabs(a[i * n + k]) > std::fabs(a[l * n + k])) l = i;
    piv[k] = l;
    if (a[l * n + k] == 0.0) return k + 1;
    if (l != k)
      for (int j = 0; j < n; ++j) std::swap(a[k * n + j], a[l * n + j]);
    const double mult = 1.0 / a[k * n + k];
    for (int i = k + 1; i < n; ++i) a[i * n + k] *= mult;
    for (int j = k + 1; j < n; ++j) {
      const double akj = a[k * n + j];
      if (akj != 0.0)
        for (int i = k + 1; i < n; ++i) a[i * n + j] -= akj * a[i * n + k];
    }
  }
  return 0;
}

static void getrs(const std::vector<double>& a, const std::vector<int>& piv,
                  double* b, int n) {
  for (int k = 0; k < n; ++k)
    if (piv[k] != k) std::swap(b[k], b[piv[k]]);
  for (int k = 0; k < n - 1; ++k)
    for (int i = k + 1; i < n; ++i) b[i] -= a[i * n + k] * b[k];
  for (int k = n - 1; k > 0; --k) {
    b[k] /= a[k * n + k];
    for (int i = 0; i < k; ++i) b[i] -= a[i * n + k] * b[k];
  }
  b[0] /= a[0];
}

struct Ida {
  int n;
  res_fn res;
  jac_fn jac;
  void* user;

  double phi[MXORDP1 + 1][1];  // placeholder; real storage below
  std::vector<double> phiv;    // [MXORDP1][n]
  double psi[MXORDP1], alpha[MXORDP1], beta[MXORDP1], sigma[MXORDP1],
      gamma[MXORDP1];
  Vec ee, delta, yy, yp, yyp, ypp, ewt, savres, cvals, dvals;
  std::vector<double> J;
  std::vector<int> piv;

  double tn = 0, hh = 0, hused = 0, rr = 0, cj = 0, cjlast = 0, cjold = 0,
         cjratio = 0, ss = 0, oldnrm = 0, eps_newt = 0, toldel = 0,
         tretlast = 0, hmax_inv = 0, hin0 = 0;
  int kk = 0, kused = 0, knew = 0, phase = 0, ns = 0;
  long nst = 0, nre = 0, nje = 0, nni = 0, netf = 0, ncfn = 0, nsetups = 0;
  double rtol = 0;
  std::vector<double> atol;

  // ---- rootfinding state (C ida.c IDARcheck1/2/3 + IDARootfind; the
  // sequencing and every branch mirror ida_tpu/core/root.py, which cites
  // the reference impl_r_check.rs line by line — keeping the two engines
  // independently-implemented twins of the same published algorithm,
  // Hiebert & Shampine SAND80-0180) ----
  int nrt = 0;
  root_fn gfun = nullptr;
  std::vector<double> glo, ghi, grout;
  std::vector<int> iroots, rootdir;
  std::vector<char> gactive;
  double tlo = 0, thi = 0, trout = 0, ttol = 0, toutc = 0;
  bool irfnd = false;
  long nge = 0;

  double* phirow(int j) { return &phiv[j * n]; }

  // ---- per-step-attempt data trace (cross-engine parity anchor) ----
  // When trc is set, step() dumps one JSONL record at the top of every
  // attempt — the same instant and field names as the JAX engine's
  // jax.debug.callback trace (ida_tpu/core/step.py attempt_once /
  // ida_tpu/utils/trace.py TRACE_FIELDS), restricted to the fields this
  // oracle tracks. scripts/compare_traces.py diffs the two engines'
  // traces field-by-field per attempt — the role of the reference's
  // instrumented-C trace diff (reference src/lib.rs:635-639 +
  // scripts/data_trace.ipynb).
  FILE* trc = nullptr;

  void jkey(const char* k, bool first = false) const {
    std::fprintf(trc, first ? "\"%s\":" : ",\"%s\":", k);
  }
  void jnum(const char* k, double v) const {
    jkey(k);
    std::fprintf(trc, "%.17g", v);
  }
  void jint(const char* k, long v) const {
    jkey(k);
    std::fprintf(trc, "%ld", v);
  }
  void jvecd(const char* k, const double* v, int m, bool first = false) const {
    jkey(k, first);
    std::fputc('[', trc);
    for (int i = 0; i < m; ++i)
      std::fprintf(trc, i ? ",%.17g" : "%.17g", v[i]);
    std::fputc(']', trc);
  }
  void jveci(const char* k, const int* v, int m) const {
    jkey(k);
    std::fputc('[', trc);
    for (int i = 0; i < m; ++i) std::fprintf(trc, i ? ",%d" : "%d", v[i]);
    std::fputc(']', trc);
  }

  void dump_trace() const {
    std::fputc('{', trc);
    jkey("phi", true);
    std::fputc('[', trc);
    for (int j = 0; j < MXORDP1; ++j) {
      if (j) std::fputc(',', trc);
      std::fputc('[', trc);
      for (int i = 0; i < n; ++i)
        std::fprintf(trc, i ? ",%.17g" : "%.17g", phiv[j * n + i]);
      std::fputc(']', trc);
    }
    std::fputc(']', trc);
    jvecd("psi", psi, MXORDP1);
    jvecd("alpha", alpha, MXORDP1);
    jvecd("beta", beta, MXORDP1);
    jvecd("sigma", sigma, MXORDP1);
    jvecd("gamma", gamma, MXORDP1);
    jvecd("ee", ee.p(), n);
    jvecd("yy", yy.p(), n);
    jvecd("yp", yp.p(), n);
    jvecd("yypredict", yyp.p(), n);
    jvecd("yppredict", ypp.p(), n);
    jvecd("ewt", ewt.p(), n);
    jvecd("savres", savres.p(), n);
    jnum("tn", tn);
    jnum("hh", hh);
    jnum("hused", hused);
    jnum("rr", rr);
    jint("kk", kk);
    jint("kused", kused);
    jint("knew", knew);
    jint("phase", phase);
    jint("ns", ns);
    jnum("cj", cj);
    jnum("cjlast", cjlast);
    jnum("cjold", cjold);
    jnum("cjratio", cjratio);
    jnum("ss", ss);
    jnum("oldnrm", oldnrm);
    jnum("eps_newt", eps_newt);
    jnum("toldel", toldel);
    // dense LU workspace: [n][n] factors + pivots (same GETRF packing
    // and piv[k]-is-swapped-row convention as ida_tpu/ops/dense_lu.py)
    jkey("lu");
    std::fputc('[', trc);
    for (int r = 0; r < n; ++r) {
      if (r) std::fputc(',', trc);
      std::fputc('[', trc);
      for (int c = 0; c < n; ++c)
        std::fprintf(trc, c ? ",%.17g" : "%.17g", J[(size_t)r * n + c]);
      std::fputc(']', trc);
    }
    std::fputc(']', trc);
    jveci("piv", piv.data(), n);
    jint("nst", nst);
    jint("nre", nre);
    jint("ncfn", ncfn);
    jint("netf", netf);
    jint("nni", nni);
    jint("nsetups", nsetups);
    jint("nje", nje);
    std::fputs("}\n", trc);
  }

  double wrms(const double* x, const double* w) const {
    double s = 0;
    for (int i = 0; i < n; ++i) {
      const double t = x[i] * w[i];
      s += t * t;
    }
    return std::sqrt(s / n);
  }

  void ewt_set() {
    for (int i = 0; i < n; ++i)
      ewt[i] = 1.0 / (rtol * std::fabs(phirow(0)[i]) + atol[i]);
  }

  double set_coeffs() {
    if (hh != hused || kk != kused) ns = 0;
    ns = std::min(ns + 1, kused + 2);
    if (kk + 1 >= ns) {
      beta[0] = 1.0;
      alpha[0] = 1.0;
      double temp1 = hh;
      gamma[0] = 0.0;
      sigma[0] = 1.0;
      for (int i = 1; i <= kk; ++i) {
        const double temp2 = psi[i - 1];
        psi[i - 1] = temp1;
        beta[i] = beta[i - 1] * psi[i - 1] / temp2;
        temp1 = temp2 + hh;
        alpha[i] = hh / temp1;
        sigma[i] = i * sigma[i - 1] * alpha[i];
        gamma[i] = gamma[i - 1] + alpha[i - 1] / hh;
      }
      psi[kk] = temp1;
    }
    double alphas = 0, alpha0 = 0;
    for (int i = 0; i < kk; ++i) {
      alphas -= 1.0 / (i + 1);
      alpha0 -= alpha[i];
    }
    cjlast = cj;
    cj = -alphas / hh;
    double ck = std::fabs(alpha[kk] + alphas - alpha0);
    ck = std::max(ck, alpha[kk]);
    for (int i = ns; i <= kk; ++i)
      for (int j = 0; j < n; ++j) phirow(i)[j] *= beta[i];
    return ck;
  }

  void predict() {
    for (int j = 0; j < n; ++j) {
      double s = 0;
      for (int i = 0; i <= kk; ++i) s += phirow(i)[j];
      yyp[j] = s;
      double sp = 0;
      for (int i = 1; i <= kk; ++i) sp += gamma[i] * phirow(i)[j];
      ypp[j] = sp;
    }
  }

  static bool finite_vec(const double* v, int m) {
    for (int i = 0; i < m; ++i)
      if (!std::isfinite(v[i])) return false;
    return true;
  }

  // returns 0 ok, 1 recoverable (singular or non-finite Jacobian).
  // C IDA semantics (ida_ls.c idaLsSetup): the Jacobian is evaluated at
  // the residual ALREADY computed by the nonlinear solver (savres), with
  // no extra residual evaluation — keeps nre and savres in cross-engine
  // trace parity with the JAX engine (core/nls.py _lsetup).
  int lsetup() {
    ++nje;
    ++nsetups;
    jac(tn, cj, yy.p(), yp.p(), savres.p(), J.data(), user);
    if (!finite_vec(J.data(), n * n)) return 1;
    const int ret = getrf(J, piv, n);
    cjold = cj;
    cjratio = 1.0;
    ss = 20.0;
    return ret ? 1 : 0;
  }

  // returns 0 ok, 1 recoverable conv failure, 2 recoverable residual
  // failure (non-finite residual — same channel as the JAX engine's
  // core/nls.py _res_ok), 3 recoverable lsetup failure
  int nonlinear_solve() {
    bool call_lsetup = (nst == 0);
    if (nst == 0) {
      cjold = cj;
      ss = 20.0;
    }
    cjratio = cj / cjold;
    const double lo = (1.0 - XRATE) / (1.0 + XRATE);
    if (cjratio < lo || cjratio > 1.0 / lo) call_lsetup = true;
    if (cj != cjlast) ss = 100.0;

    for (int attempt = 0; attempt < 2; ++attempt) {
      // residual at predictor
      for (int i = 0; i < n; ++i) {
        yy[i] = yyp[i];
        yp[i] = ypp[i];
      }
      res(tn, yy.p(), yp.p(), delta.p(), user);
      ++nre;
      // non-finite predictor residual: terminal for this attempt (the
      // fresh-J retry would re-evaluate at the same point), before any
      // Jacobian is evaluated there
      if (!finite_vec(delta.p(), n)) return 2;
      // savres shadows every finite residual evaluation (C IDA ida_savres;
      // JAX core/nls.py keeps savres == delta on the dense path)
      std::memcpy(savres.p(), delta.p(), n * sizeof(double));
      bool jcur = false;
      if (call_lsetup) {
        if (lsetup()) return 3;  // recoverable lsetup failure
        jcur = true;
      }
      // Newton iteration from ycor = 0
      for (int i = 0; i < n; ++i) ee[i] = 0.0;
      int m = 0;
      int status = -1;  // -1 continue, 0 ok, 1 conv fail
      while (true) {
        ++nni;
        for (int i = 0; i < n; ++i) delta[i] = -delta[i];
        getrs(J, piv, delta.p(), n);
        if (cjratio != 1.0)
          for (int i = 0; i < n; ++i) delta[i] *= 2.0 / (1.0 + cjratio);
        for (int i = 0; i < n; ++i) ee[i] += delta[i];
        const double delnrm = wrms(delta.p(), ewt.p());
        bool converged = false;
        if (m == 0) {
          oldnrm = delnrm;
          if (delnrm <= 1.0e-4 * toldel) converged = true;
        } else {
          const double rate = std::pow(delnrm / oldnrm, 1.0 / m);
          if (rate > RATEMAX) {
            status = 1;
            break;
          }
          ss = rate / (1.0 - rate);
        }
        if (converged || ss * delnrm <= eps_newt) {
          status = 0;
          break;
        }
        ++m;
        if (m >= MAXNLSIT) {
          status = 1;
          break;
        }
        for (int i = 0; i < n; ++i) {
          yy[i] = yyp[i] + ee[i];
          yp[i] = ypp[i] + cj * ee[i];
        }
        res(tn, yy.p(), yp.p(), delta.p(), user);
        ++nre;
        if (!finite_vec(delta.p(), n)) {
          status = 2;  // in-loop residual failure: eligible for jbad retry
          break;
        }
        std::memcpy(savres.p(), delta.p(), n * sizeof(double));
      }
      if (status == 0) {
        for (int i = 0; i < n; ++i) {
          yy[i] = yyp[i] + ee[i];
          yp[i] = ypp[i] + cj * ee[i];
        }
        return 0;
      }
      if (!jcur) {
        call_lsetup = true;
        continue;  // retry with fresh Jacobian (conv AND residual kinds)
      }
      return status;  // recoverable convergence (1) / residual (2) failure
    }
    return 1;
  }

  // returns 0 pass, 1 fail; sets err_k, err_km1, knew
  int test_error(double ck, double& err_k, double& err_km1) {
    const double enorm_k = wrms(ee.p(), ewt.p());
    err_k = sigma[kk] * enorm_k;
    const double terr_k = err_k * (kk + 1);
    knew = kk;
    err_km1 = 0.0;
    if (kk > 1) {
      for (int i = 0; i < n; ++i) delta[i] = phirow(kk)[i] + ee[i];
      const double enorm_km1 = wrms(delta.p(), ewt.p());
      err_km1 = sigma[kk - 1] * enorm_km1;
      const double terr_km1 = kk * err_km1;
      if (kk > 2) {
        for (int i = 0; i < n; ++i) delta[i] += phirow(kk - 1)[i];
        const double enorm_km2 = wrms(delta.p(), ewt.p());
        const double terr_km2 = (kk - 1) * sigma[kk - 2] * enorm_km2;
        if (std::max(terr_km1, terr_km2) <= terr_k) knew = kk - 1;
      } else {
        if (terr_km1 <= 0.5 * terr_k) knew = kk - 1;
      }
    }
    return (ck * enorm_k <= 1.0) ? 0 : 1;
  }

  void restore(double saved_t) {
    tn = saved_t;
    for (int j = 1; j <= kk; ++j) psi[j - 1] = psi[j] - hh;
    for (int i = ns; i <= kk; ++i)
      for (int j = 0; j < n; ++j) phirow(i)[j] /= beta[i];
  }

  void complete_step(double err_k, double err_km1) {
    ++nst;
    const int kdiff = kk - kused;
    kused = kk;
    hused = hh;
    if (knew == kk - 1 || kk == MAXORD) phase = 1;
    if (phase == 0) {
      if (nst > 1) {
        kk += 1;
        double hnew = 2.0 * hh;
        const double tmp = std::fabs(hnew) * hmax_inv;
        if (tmp > 1.0) hnew /= tmp;
        hh = hnew;
      }
    } else {
      enum { LOWER, MAINTAIN, RAISE } action = MAINTAIN;
      double err_kp1 = 0.0;
      if (knew == kk - 1)
        action = LOWER;
      else if (kk == MAXORD)
        action = MAINTAIN;
      else if (kk + 1 >= ns || kdiff == 1)
        action = MAINTAIN;
      else {
        for (int i = 0; i < n; ++i) delta[i] = ee[i] - phirow(kk + 1)[i];
        const double enorm = wrms(delta.p(), ewt.p());
        err_kp1 = enorm / (kk + 2);
        const double terr_k = (kk + 1) * err_k;
        const double terr_kp1 = (kk + 2) * err_kp1;
        if (kk == 1) {
          action = (terr_kp1 >= 0.5 * terr_k) ? MAINTAIN : RAISE;
        } else {
          const double terr_km1 = kk * err_km1;
          if (terr_km1 <= std::min(terr_k, terr_kp1))
            action = LOWER;
          else if (terr_kp1 >= terr_k)
            action = MAINTAIN;
          else
            action = RAISE;
        }
      }
      double err_knew = err_k;
      if (action == RAISE) {
        kk += 1;
        err_knew = err_kp1;
      } else if (action == LOWER) {
        kk -= 1;
        err_knew = err_km1;
      }
      double hnew = hh;
      rr = std::pow(2.0 * err_knew + 1.0e-4, -1.0 / (kk + 1));
      if (rr >= 2.0) {
        hnew = 2.0 * hh;
        const double tmp = std::fabs(hnew) * hmax_inv;
        if (tmp > 1.0) hnew /= tmp;
      } else if (rr <= 1.0) {
        rr = std::max(0.5, std::min(0.9, rr));
        hnew = hh * rr;
      }
      hh = hnew;
    }
    if (kused < MAXORD)
      std::memcpy(phirow(kused + 1), ee.p(), n * sizeof(double));
    // phi update recurrence walking kused..0
    std::vector<double> tmp(ee.d);
    for (int i = kused; i >= 0; --i) {
      for (int j = 0; j < n; ++j) {
        tmp[j] += phirow(i)[j];
        phirow(i)[j] = tmp[j];
      }
    }
  }

  // one internal step; returns 0 ok, negative fatal
  int step() {
    const double saved_t = tn;
    if (nst == 0) {
      kk = 1;
      kused = 0;
      hused = 0;
      psi[0] = hh;
      cj = 1.0 / hh;
      phase = 0;
      ns = 0;
    }
    int ncf = 0, nef = 0;
    double ck, err_k = 0, err_km1 = 0;
    while (true) {
      if (trc) dump_trace();  // same instant as the JAX attempt_once trace
      ck = set_coeffs();
      tn += hh;
      predict();
      const int nlf = nonlinear_solve();
      int etf = 1;
      if (nlf == 0) etf = test_error(ck, err_k, err_km1);
      if (nlf == 0 && etf == 0) break;  // success
      restore(saved_t);
      phase = 1;
      if (nlf == 0) {
        // error test failure policy
        ++nef;
        ++netf;
        if (nef == 1) {
          const double err_knew = (kk == knew) ? err_k : err_km1;
          kk = knew;
          rr = 0.9 * std::pow(2.0 * err_knew + 1.0e-4, -1.0 / (kk + 1));
          rr = std::max(0.25, std::min(0.9, rr));
          hh *= rr;
        } else if (nef == 2) {
          kk = knew;
          rr = 0.25;
          hh *= rr;
        } else if (nef < MXNEF) {
          kk = 1;
          rr = 0.25;
          hh *= rr;
        } else {
          return -3;  // ERR_FAIL
        }
      } else {
        ++ncf;
        ++ncfn;
        rr = 0.25;
        hh *= rr;
        if (ncf >= MXNCF) {
          // fatal code keyed on the recoverable kind (C IDAHandleNFlag)
          if (nlf == 2) return -9;  // REP_RES_ERR
          if (nlf == 3) return -6;  // LSETUP_FAIL
          return -4;                // CONV_FAIL
        }
      }
      if (nst == 0) {
        // IDAReset (C ida.c): psi[0] = hh and rescale ONLY phi[1]
        // (= h * y'0) by rr. The reference Rust scales the whole phi
        // array (src/lib.rs:1249-1252) including phi[0] = y0 — a port
        // bug, deliberately not replicated (see core/coeffs.py reset).
        psi[0] = hh;
        for (int j = 0; j < n; ++j) phirow(1)[j] *= rr;
      }
    }
    complete_step(err_k, err_km1);
    for (int i = 0; i < n; ++i) ee[i] *= ck;
    return 0;
  }

  void get_solution(double t) {
    const int kord = (kused == 0) ? 1 : kused;
    const double delt = t - tn;
    double c = 1.0, d = 0.0;
    double gam = delt / psi[0];
    cvals[0] = c;
    for (int j = 1; j <= kord; ++j) {
      d = d * gam + c / psi[j - 1];
      c = c * gam;
      gam = (delt + psi[j - 1]) / psi[j];
      cvals[j] = c;
      dvals[j - 1] = d;
    }
    for (int i = 0; i < n; ++i) {
      double s = 0;
      for (int j = 0; j <= kord; ++j) s += cvals[j] * phirow(j)[i];
      yy[i] = s;
      double sp = 0;
      for (int j = 1; j <= kord; ++j) sp += dvals[j - 1] * phirow(j)[i];
      yp[i] = sp;
    }
  }

  // ---- rootfinding (see the state-block comment above) ----
  void eval_g(double t, const double* y, const double* ypv, double* out) {
    gfun(t, y, ypv, out, user);
    ++nge;
  }

  // r_check1 (core/root.py r_check1 / impl_r_check.rs:32-99): evaluate g
  // at t0, deactivate exact zeros, try to re-activate at t0 + smallh
  void rcheck1() {
    std::fill(iroots.begin(), iroots.end(), 0);
    tlo = tn;
    ttol = (std::fabs(tn) + std::fabs(hh)) * UROUND * 100.0;
    eval_g(tlo, phirow(0), phirow(1), glo.data());
    std::vector<char> zero0(nrt, 0);
    bool any_zero = false;
    for (int i = 0; i < nrt; ++i) {
      zero0[i] = std::fabs(glo[i]) == 0.0;
      if (zero0[i]) {
        gactive[i] = 0;
        any_zero = true;
      }
    }
    if (!any_zero) return;
    const double hratio = std::max(ttol / std::fabs(hh), 0.1);
    const double smallh = hratio * hh;
    const double tplus = tlo + smallh;
    for (int i = 0; i < n; ++i) yy[i] = phirow(0)[i] + smallh * phirow(1)[i];
    std::vector<double> gtmp(nrt);
    eval_g(tplus, yy.p(), phirow(1), gtmp.data());
    for (int i = 0; i < nrt; ++i) {
      if (zero0[i] && std::fabs(gtmp[i]) != 0.0) {
        gactive[i] = 1;
        glo[i] = gtmp[i];
      }
    }
  }

  // r_check2 (core/root.py r_check2 / impl_r_check.rs:117-209): re-check
  // at (and just past) the last root. Returns 0 none / 1 found / 2 close.
  int rcheck2() {
    if (!irfnd) return 0;
    get_solution(tlo);
    eval_g(tlo, yy.p(), yp.p(), glo.data());
    bool any_zero = false;
    for (int i = 0; i < nrt; ++i) {
      iroots[i] = (gactive[i] && std::fabs(glo[i]) == 0.0) ? 1 : 0;
      if (iroots[i]) any_zero = true;
    }
    if (!any_zero) return 0;
    ttol = (std::fabs(tn) + std::fabs(hh)) * UROUND * 100.0;
    const double smallh = (hh > 0.0) ? ttol : -ttol;
    const double tplus = tlo + smallh;
    if ((tplus - tn) * hh >= 0.0) {
      for (int i = 0; i < n; ++i) yy[i] += (smallh / hh) * phirow(1)[i];
      // yp stays the tlo derivative (linear probe)
    } else {
      get_solution(tplus);
    }
    std::vector<double> gtmp(nrt);
    eval_g(tplus, yy.p(), yp.p(), gtmp.data());
    bool close = false, found = false;
    for (int i = 0; i < nrt; ++i) {
      if (!gactive[i]) continue;
      if (std::fabs(gtmp[i]) == 0.0) {
        if (iroots[i] > 0) close = true;
        else {
          iroots[i] = 1;
          found = true;
        }
      } else if (iroots[i] > 0) {
        glo[i] = gtmp[i];  // moved off zero: fresh bracket base
      }
    }
    if (close) return 2;  // CLOSE_ROOTS (caller treats as terminal)
    return found ? 1 : 0;
  }

  // sign-change scan shared by rootfind (core/root.py _scan)
  void root_scan(const double* gnew, bool& zroot, bool& sgnchg, int& imax) {
    zroot = false;
    sgnchg = false;
    imax = 0;
    double maxfrac = 0.0;
    for (int i = 0; i < nrt; ++i) {
      if (!gactive[i]) continue;
      if ((double)rootdir[i] * glo[i] > 0.0) continue;  // dirok filter
      if (std::fabs(gnew[i]) == 0.0) {
        zroot = true;
        continue;
      }
      if (glo[i] * gnew[i] < 0.0) {
        const double frac = std::fabs(gnew[i] / (gnew[i] - glo[i]));
        if (!sgnchg || frac > maxfrac) {
          maxfrac = frac;
          sgnchg = true;
          imax = i;
        }
      }
    }
  }

  // Illinois modified-secant location on (tlo, thi) (core/root.py
  // _root_find / impl_r_check.rs:343-576). Returns found.
  bool rootfind() {
    bool zroot0, sgnchg0;
    int imax;
    root_scan(ghi.data(), zroot0, sgnchg0, imax);
    if (!sgnchg0) {
      trout = thi;
      grout = ghi;
      if (zroot0) {
        for (int i = 0; i < nrt; ++i) {
          const bool dirok = (double)rootdir[i] * glo[i] <= 0.0;
          iroots[i] = (gactive[i] && dirok && std::fabs(ghi[i]) == 0.0)
                          ? (glo[i] > 0.0 ? -1 : 1)
                          : 0;
        }
      }
      return zroot0;
    }
    double alph = 1.0;
    int side = 0, sideprev = -1;
    while (std::fabs(thi - tlo) > ttol) {
      alph = (sideprev == side) ? ((side == 2) ? alph * 2.0 : alph * 0.5)
                                : 1.0;
      double tmid =
          thi - (thi - tlo) * ghi[imax] / (ghi[imax] - alph * glo[imax]);
      const double fracint = std::fabs(thi - tlo) / ttol;
      const double fracsub = (fracint > 5.0) ? 0.1 : 0.5 / fracint;
      if (std::fabs(tmid - tlo) < 0.5 * ttol)
        tmid = tlo + fracsub * (thi - tlo);
      if (std::fabs(thi - tmid) < 0.5 * ttol)
        tmid = thi - fracsub * (thi - tlo);
      get_solution(tmid);
      eval_g(tmid, yy.p(), yp.p(), grout.data());
      bool zroot2, sgnchg2;
      int imax2;
      root_scan(grout.data(), zroot2, sgnchg2, imax2);
      sideprev = side;
      if (sgnchg2) {
        thi = tmid;
        ghi = grout;
        side = 1;
        imax = imax2;
      } else if (zroot2) {
        thi = tmid;
        ghi = grout;
        break;  // exact zero at tmid: done (side unchanged)
      } else {
        tlo = tmid;
        glo = grout;
        side = 2;
      }
    }
    for (int i = 0; i < nrt; ++i) {
      const bool dirok = (double)rootdir[i] * glo[i] <= 0.0;
      const bool hit = gactive[i] && dirok &&
                       (std::fabs(ghi[i]) == 0.0 || glo[i] * ghi[i] < 0.0);
      iroots[i] = hit ? (glo[i] > 0.0 ? -1 : 1) : 0;
    }
    trout = thi;
    grout = ghi;
    return true;
  }

  // r_check3 (core/root.py r_check3 / impl_r_check.rs:221-271): search
  // (tlo, min(tn, toutc)] after a successful step (NORMAL task)
  bool rcheck3(double tout) {
    toutc = tout;
    thi = ((toutc - tn) * hh >= 0.0) ? tn : toutc;
    get_solution(thi);
    eval_g(thi, yy.p(), yp.p(), ghi.data());
    ttol = (std::fabs(tn) + std::fabs(hh)) * UROUND * 100.0;
    const bool found = rootfind();
    for (int i = 0; i < nrt; ++i)
      if (!gactive[i] && grout[i] != 0.0) gactive[i] = 1;
    tlo = trout;
    glo = grout;
    if (found) get_solution(trout);
    return found;
  }

  // one IDASolve-equivalent call in NORMAL mode with rootfinding (the
  // scan-form sequencing of core/solve.py::solve — pre-step rcheck2 +
  // rcheck3 re-checks, per-step rcheck3): returns 0 SUCCESS (tret=tout),
  // 2 ROOT_RETURN (tret=tlo), 3 CLOSE_ROOTS, negative fatal.
  int solve_to_roots(double tout, long mxstep, double* tret) {
    if (nst == 0) {
      ewt_set();
      const double tdist = std::fabs(tout - tn);
      hh = 0.001 * tdist;
      const double ypnorm = wrms(phirow(1), ewt.p());
      if (ypnorm > 2.0 / hh) hh = 0.5 / ypnorm;
      if (tout < tn) hh = -hh;
      if (hin0 != 0.0) hh = hin0;
      kk = 0;
      for (int j = 0; j < n; ++j) phirow(1)[j] *= hh;
      eps_newt = EPCON;
      toldel = 1.0e-4 * eps_newt;
      tretlast = tn;
      rcheck1();
    } else {
      // pre-step root re-checks (impl_solve.rs:186-227)
      const int r2 = rcheck2();
      if (r2 == 2) return 3;
      if (r2 == 1) {
        tretlast = *tret = tlo;
        return 2;
      }
      const double troundoff =
          100.0 * UROUND * (std::fabs(tn) + std::fabs(hh));
      if (std::fabs(tn - tretlast) > troundoff) {
        const bool found3 = rcheck3(tout);
        irfnd = found3;
        if (found3) {
          tretlast = *tret = tlo;
          return 2;
        }
      }
      if ((tn - tout) * hh >= 0.0) {
        get_solution(tout);
        tretlast = *tret = tout;
        return 0;
      }
    }
    for (long nstloc = 0; nstloc < mxstep; ++nstloc) {
      if (nst > 0) ewt_set();
      const int ret = step();
      if (ret < 0) return ret;
      const bool found = rcheck3(tout);
      if (found) {
        irfnd = true;
        tretlast = *tret = tlo;
        return 2;
      }
      if ((tn - tout) * hh >= 0.0) {
        get_solution(tout);
        tretlast = *tret = tout;
        return 0;
      }
    }
    return -1;  // TOO_MUCH_WORK
  }

  // integrate to tout (NORMAL mode); returns 0 ok, negative fatal
  int solve_to(double tout, long mxstep) {
    if (nst == 0) {
      ewt_set();
      const double tdist = std::fabs(tout - tn);
      hh = 0.001 * tdist;
      const double ypnorm = wrms(phirow(1), ewt.p());
      if (ypnorm > 2.0 / hh) hh = 0.5 / ypnorm;
      if (tout < tn) hh = -hh;
      if (hin0 != 0.0) hh = hin0;  // IDASetInitStep: explicit h0 overrides
      kk = 0;
      for (int j = 0; j < n; ++j) phirow(1)[j] *= hh;
      eps_newt = EPCON;
      toldel = 1.0e-4 * eps_newt;
    } else {
      if ((tn - tout) * hh >= 0.0) {
        get_solution(tout);
        tretlast = tout;
        return 0;
      }
    }
    for (long nstloc = 0; nstloc < mxstep; ++nstloc) {
      if (nst > 0) ewt_set();
      const int ret = step();
      if (ret < 0) return ret;
      if ((tn - tout) * hh >= 0.0) {
        get_solution(tout);
        tretlast = tout;
        return 0;
      }
    }
    return -1;  // TOO_MUCH_WORK
  }
};

// ---- IDACalcIC (C ida_ic.c): consistent initial conditions ----
// icopt 1 = IC_YA_YDP_INIT (solve algebraic y + differential y', needs id),
// icopt 2 = IC_Y_INIT (solve all of y given y'). Mirrors C's structure:
// outer mxnh hic-retry loop (YA_YDP), middle maxnj frozen-Jacobian refresh
// loop, inner maxnit Newton with a halving linesearch bounded below by the
// steptol rule (lambda >= steptol / ||step||, steptol = uround^(2/3)).
// Plays the golden-oracle role for ida_tpu/core/calc_ic.py (which uses the
// EXACT AD Jacobian of the IC system instead of C's standard-system
// approximation, so iteration counts differ; the consistent IC is the same).
struct CalcIC {
  int n, icopt;
  res_fn res;
  jac_fn jac;
  void* user;
  double t0, cj;
  const double* id;  // [n] 1.0 differential / 0.0 algebraic (icopt 1)
  std::vector<double> ewt, J, y, yp, r, dx, ynew, ypnew;
  std::vector<int> piv;
  long nni = 0, nje = 0, nbacktr = 0;

  static constexpr int MAXNH = 5, MAXNJ = 4, MAXNIT = 10, MAXBACKS = 100;
  static constexpr double EPICCON = 0.01 * EPCON, ALPHALS = 1.0e-4;

  double wrms(const double* x) const {
    double s = 0;
    for (int i = 0; i < n; ++i) {
      const double t = x[i] * ewt[i];
      s += t * t;
    }
    return std::sqrt(s / n);
  }

  // factor the standard system Jacobian J = dF/dy + cj dF/dy' at (y, y')
  int setup() {
    res(t0, y.data(), yp.data(), r.data(), user);
    jac(t0, cj, y.data(), yp.data(), r.data(), J.data(), user);
    ++nje;
    return getrf(J, piv, n) ? 1 : 0;
  }

  // fnorm of the linearly solved residual at (yt, ypt); dx gets the step
  double fnorm_at(const double* yt, const double* ypt) {
    res(t0, yt, ypt, dx.data(), user);
    getrs(J, piv, dx.data(), n);
    return wrms(dx.data());
  }

  void apply(double lam, const double* dxv) {
    if (icopt == 1) {
      for (int i = 0; i < n; ++i) {
        ynew[i] = y[i] - lam * (1.0 - id[i]) * dxv[i];
        ypnew[i] = yp[i] - lam * cj * id[i] * dxv[i];
      }
    } else {
      for (int i = 0; i < n; ++i) {
        ynew[i] = y[i] - lam * dxv[i];
        ypnew[i] = yp[i];
      }
    }
  }

  // Newton iteration under ONE frozen Jacobian; 0 converged, 1 recoverable
  int newton() {
    double fnorm = fnorm_at(y.data(), yp.data());
    if (fnorm <= EPICCON) return 0;
    const double steptol = std::pow(UROUND, 2.0 / 3.0);
    for (int it = 0; it < MAXNIT; ++it) {
      ++nni;
      std::vector<double> step(dx);  // current Newton step J^{-1} F
      const double stepnorm = wrms(step.data());
      const double rlmin = (stepnorm > 0.0) ? steptol / stepnorm : 1.0;
      double lam = 1.0;
      bool accepted = false;
      double fnew = fnorm;
      for (int nb = 0; nb < MAXBACKS; ++nb) {
        apply(lam, step.data());
        fnew = fnorm_at(ynew.data(), ypnew.data());
        if (fnew <= (1.0 - ALPHALS * lam) * fnorm) {
          accepted = true;
          break;
        }
        ++nbacktr;
        lam *= 0.5;
        if (lam < rlmin) break;  // steptol: step too small to matter
      }
      if (!accepted) return 1;
      y = ynew;
      yp = ypnew;
      fnorm = fnew;
      if (fnorm <= EPICCON) return 0;
      // dx already holds the NEXT step (fnorm_at solved at the accepted
      // point under the frozen factor)
    }
    return 1;
  }

  // full IDACalcIC; 0 ok, 1 failed
  int run(double tout1) {
    const double tdist = std::fabs(tout1 - t0);
    double hic = 0.001 * tdist;
    const double ypnorm = wrms(yp.data());
    if (icopt == 1 && ypnorm > 0.5 / hic) hic = 0.5 / ypnorm;
    if (tout1 < t0) hic = -hic;
    const int mxnh = (icopt == 1) ? MAXNH : 1;
    std::vector<double> y0(y), yp0(yp);
    for (int nh = 0; nh < mxnh; ++nh) {
      cj = (icopt == 1) ? 1.0 / hic : 0.0;
      y = y0;
      yp = yp0;
      for (int nj = 0; nj < MAXNJ; ++nj) {
        if (setup()) break;  // singular: retry with smaller hic
        if (newton() == 0) return 0;
        // recoverable: refresh the Jacobian at the (possibly advanced)
        // iterate and try again (C IDAnlsIC maxnj loop)
      }
      hic *= 0.1;
    }
    return 1;
  }
};

Ida* make_ida(int n, res_fn res, jac_fn jac, void* user, double t0,
              const double* y0, const double* yp0, double rtol,
              const double* atol) {
  Ida* s = new Ida();
  s->n = n;
  s->res = res;
  s->jac = jac;
  s->user = user;
  s->phiv.assign(MXORDP1 * n, 0.0);
  s->ee = Vec(n);
  s->delta = Vec(n);
  s->yy = Vec(n);
  s->yp = Vec(n);
  s->yyp = Vec(n);
  s->ypp = Vec(n);
  s->ewt = Vec(n);
  s->savres = Vec(n);
  s->cvals = Vec(MXORDP1);
  s->dvals = Vec(MXORDP1);
  s->J.assign((size_t)n * n, 0.0);
  s->piv.assign(n, 0);
  s->tn = t0;
  s->rtol = rtol;
  s->atol.assign(atol, atol + n);
  std::memcpy(s->phirow(0), y0, n * sizeof(double));
  std::memcpy(s->phirow(1), yp0, n * sizeof(double));
  // yy/yp start at the user ICs (C IDA: they alias the user vectors), so
  // the first trace record matches the JAX init_state values
  std::memcpy(s->yy.p(), y0, n * sizeof(double));
  std::memcpy(s->yp.p(), yp0, n * sizeof(double));
  std::memset(s->psi, 0, sizeof(s->psi));
  std::memset(s->alpha, 0, sizeof(s->alpha));
  std::memset(s->beta, 0, sizeof(s->beta));
  std::memset(s->sigma, 0, sizeof(s->sigma));
  std::memset(s->gamma, 0, sizeof(s->gamma));
  return s;
}

// ---- built-in Roberts problem (native-speed baseline) ----
void roberts_res(double, const double* y, const double* yp, double* r, void*) {
  r[0] = -0.04 * y[0] + 1.0e4 * y[1] * y[2];
  r[1] = -r[0] - 3.0e7 * y[1] * y[1] - yp[1];
  r[0] -= yp[0];
  r[2] = y[0] + y[1] + y[2] - 1.0;
}

void roberts_jac(double, double cj, const double* y, const double*,
                 const double*, double* J, void*) {
  J[0] = -0.04 - cj;
  J[1] = 1.0e4 * y[2];
  J[2] = 1.0e4 * y[1];
  J[3] = 0.04;
  J[4] = -1.0e4 * y[2] - 6.0e7 * y[1] - cj;
  J[5] = -1.0e4 * y[1];
  J[6] = 1.0;
  J[7] = 1.0;
  J[8] = 1.0;
}

}  // namespace

extern "C" {

// Generic oracle with user callbacks (ctypes). Returns 0 on success.
int ida_oracle_solve(int n, res_fn res, jac_fn jac, void* user, double t0,
                     const double* y0, const double* yp0, double rtol,
                     const double* atol, const double* touts, int nout,
                     long mxstep, double hin,
                     double* y_out /* [nout][n] */,
                     long* stats /* [7]: nst nre nje nni netf ncfn nsetups */) {
  Ida* s = make_ida(n, res, jac, user, t0, y0, yp0, rtol, atol);
  s->hin0 = hin;
  int ret = 0;
  for (int k = 0; k < nout && ret == 0; ++k) {
    ret = s->solve_to(touts[k], mxstep);
    std::memcpy(y_out + (size_t)k * n, s->yy.p(), n * sizeof(double));
  }
  if (stats) {
    stats[0] = s->nst;
    stats[1] = s->nre;
    stats[2] = s->nje;
    stats[3] = s->nni;
    stats[4] = s->netf;
    stats[5] = s->ncfn;
    stats[6] = s->nsetups;
  }
  delete s;
  return ret;
}

// NORMAL-mode integration WITH rootfinding (the role of the reference's
// root-enabled solve loop, examples/roberts.rs:98-136). For each tout the
// driver re-enters until SUCCESS, recording ROOT_RETURNs into the event
// buffers. Returns 0 ok (or 3 CLOSE_ROOTS / negative fatal on abort).
// events: ev_t [max_ev], ev_iroots [max_ev][nrt] (sign convention: +1
// increasing g, -1 decreasing), n_ev out. stats [8]: the usual 7 + nge.
int ida_oracle_solve_roots(int n, res_fn res, jac_fn jac, void* user,
                           double t0, const double* y0, const double* yp0,
                           double rtol, const double* atol, int nrt,
                           root_fn gfun, const int* rootdir /* [nrt] or 0 */,
                           const double* touts, int nout, long mxstep,
                           double hin, double* y_out /* [nout][n] */,
                           double* ev_t, int* ev_iroots, int max_ev,
                           int* n_ev, long* stats /* [8] or null */) {
  Ida* s = make_ida(n, res, jac, user, t0, y0, yp0, rtol, atol);
  s->hin0 = hin;
  s->nrt = nrt;
  s->gfun = gfun;
  s->glo.assign(nrt, 0.0);
  s->ghi.assign(nrt, 0.0);
  s->grout.assign(nrt, 0.0);
  s->iroots.assign(nrt, 0);
  s->rootdir.assign(nrt, 0);
  if (rootdir)
    for (int i = 0; i < nrt; ++i) s->rootdir[i] = rootdir[i];
  s->gactive.assign(nrt, 1);
  int ret = 0, nev = 0;
  for (int k = 0; k < nout && ret == 0; ++k) {
    // re-entry cap: C's Rcheck2 has a theoretical repeat corner (two
    // distinct EXACT float zeros at tlo and tlo+smallh); a library
    // should fail rather than spin on it
    int r = 2;
    for (int reent = 0; reent < 10000 && r == 2; ++reent) {
      double tret = 0.0;
      r = s->solve_to_roots(touts[k], mxstep, &tret);
      if (r == 2) {
        if (nev < max_ev) {
          ev_t[nev] = tret;
          for (int i = 0; i < nrt; ++i)
            ev_iroots[(size_t)nev * nrt + i] = s->iroots[i];
        }
        ++nev;  // re-enter toward the same tout
      }
    }
    if (r != 0) ret = (r == 2) ? -9 /* re-entry cap hit */ : r;
    std::memcpy(y_out + (size_t)k * n, s->yy.p(), n * sizeof(double));
  }
  if (n_ev) *n_ev = nev;
  if (stats) {
    stats[0] = s->nst;
    stats[1] = s->nre;
    stats[2] = s->nje;
    stats[3] = s->nni;
    stats[4] = s->netf;
    stats[5] = s->ncfn;
    stats[6] = s->nsetups;
    stats[7] = s->nge;
  }
  delete s;
  return ret;
}

// ida_oracle_solve with a per-step-attempt JSONL data trace written to
// trace_path (see Ida::dump_trace above): the native half of the
// cross-engine trace diff. Returns 0 on success, -100 if the trace file
// cannot be opened.
int ida_oracle_solve_traced(int n, res_fn res, jac_fn jac, void* user,
                            double t0, const double* y0, const double* yp0,
                            double rtol, const double* atol,
                            const double* touts, int nout, long mxstep,
                            double hin, const char* trace_path,
                            double* y_out /* [nout][n] */,
                            long* stats /* [7] or null */) {
  Ida* s = make_ida(n, res, jac, user, t0, y0, yp0, rtol, atol);
  s->hin0 = hin;
  FILE* f = std::fopen(trace_path, "w");
  if (!f) {
    delete s;
    return -100;
  }
  s->trc = f;
  int ret = 0;
  for (int k = 0; k < nout && ret == 0; ++k) {
    ret = s->solve_to(touts[k], mxstep);
    std::memcpy(y_out + (size_t)k * n, s->yy.p(), n * sizeof(double));
  }
  if (stats) {
    stats[0] = s->nst;
    stats[1] = s->nre;
    stats[2] = s->nje;
    stats[3] = s->nni;
    stats[4] = s->netf;
    stats[5] = s->ncfn;
    stats[6] = s->nsetups;
  }
  std::fclose(f);
  delete s;
  return ret;
}

// IDACalcIC role (C ida_ic.c): corrects y0/yp0 IN PLACE. icopt 1 = YA_YDP
// (id: 1.0 differential / 0.0 algebraic), 2 = Y_INIT. Returns 0 on success.
// stats (optional, [3]): nni, nje, nbacktracks.
int ida_oracle_calc_ic(int n, res_fn res, jac_fn jac, void* user, double t0,
                       double tout1, double* y0 /* in/out */,
                       double* yp0 /* in/out */, double rtol,
                       const double* atol, int icopt, const double* id,
                       long* stats /* [3] or null */) {
  CalcIC c;
  c.n = n;
  c.icopt = icopt;
  c.res = res;
  c.jac = jac;
  c.user = user;
  c.t0 = t0;
  c.id = id;
  c.y.assign(y0, y0 + n);
  c.yp.assign(yp0, yp0 + n);
  c.r.assign(n, 0.0);
  c.dx.assign(n, 0.0);
  c.ynew.assign(n, 0.0);
  c.ypnew.assign(n, 0.0);
  c.J.assign((size_t)n * n, 0.0);
  c.piv.assign(n, 0);
  c.ewt.resize(n);
  for (int i = 0; i < n; ++i)
    c.ewt[i] = 1.0 / (rtol * std::fabs(y0[i]) + atol[i]);
  const int ret = c.run(tout1);
  if (ret == 0) {
    std::memcpy(y0, c.y.data(), n * sizeof(double));
    std::memcpy(yp0, c.yp.data(), n * sizeof(double));
  }
  if (stats) {
    stats[0] = c.nni;
    stats[1] = c.nje;
    stats[2] = c.nbacktr;
  }
  return ret;
}

// Built-in Roberts trajectory: y at each tout plus per-tout cumulative step
// counts (for step-sequence parity checks against the JAX engine).
int ida_oracle_roberts_trajectory(const double* touts, int nout,
                                  double* y_out /* [nout][3] */,
                                  long* nst_out /* [nout] */) {
  static const double y0[3] = {1.0, 0.0, 0.0};
  static const double yp0[3] = {-0.04, 0.04, 0.0};
  static const double atol[3] = {1.0e-8, 1.0e-6, 1.0e-6};
  Ida* s = make_ida(3, roberts_res, roberts_jac, nullptr, 0.0, y0, yp0,
                    1.0e-4, atol);
  int ret = 0;
  for (int k = 0; k < nout && ret == 0; ++k) {
    ret = s->solve_to(touts[k], 100000);
    std::memcpy(y_out + (size_t)k * 3, s->yy.p(), 3 * sizeof(double));
    if (nst_out) nst_out[k] = s->nst;
  }
  delete s;
  return ret;
}

// Built-in Roberts at native speed: integrates `reps` independent instances
// (fresh solver each) across the given touts; returns total internal steps.
long ida_oracle_roberts_bench(const double* touts, int nout, long reps,
                              double* y_final /* [3] */) {
  static const double y0[3] = {1.0, 0.0, 0.0};
  static const double yp0[3] = {-0.04, 0.04, 0.0};
  static const double atol[3] = {1.0e-8, 1.0e-6, 1.0e-6};
  long total = 0;
  for (long r = 0; r < reps; ++r) {
    Ida* s = make_ida(3, roberts_res, roberts_jac, nullptr, 0.0, y0, yp0,
                      1.0e-4, atol);
    for (int k = 0; k < nout; ++k)
      if (s->solve_to(touts[k], 100000) != 0) break;
    total += s->nst;
    if (y_final && r == 0) std::memcpy(y_final, s->yy.p(), 3 * sizeof(double));
    delete s;
  }
  return total;
}

// Built-in Roberts WITH rootfinding at native speed (the two idaRoberts_dns
// root functions): `reps` independent instances across the touts; returns
// total internal steps, and the first rep's event count/times if asked.
void roberts_root(double, const double* y, const double*, double* g, void*) {
  g[0] = y[0] - 1.0e-4;
  g[1] = y[2] - 0.01;
}

long ida_oracle_roberts_roots_bench(const double* touts, int nout, long reps,
                                    double* ev_t /* [4] or null */,
                                    int* n_ev /* or null */) {
  static const double y0[3] = {1.0, 0.0, 0.0};
  static const double yp0[3] = {-0.04, 0.04, 0.0};
  static const double atol[3] = {1.0e-8, 1.0e-6, 1.0e-6};
  long total = 0;
  for (long r = 0; r < reps; ++r) {
    Ida* s = make_ida(3, roberts_res, roberts_jac, nullptr, 0.0, y0, yp0,
                      1.0e-4, atol);
    s->nrt = 2;
    s->gfun = roberts_root;
    s->glo.assign(2, 0.0);
    s->ghi.assign(2, 0.0);
    s->grout.assign(2, 0.0);
    s->iroots.assign(2, 0);
    s->rootdir.assign(2, 0);
    s->gactive.assign(2, 1);
    int nev = 0;
    for (int k = 0; k < nout; ++k) {
      int ret;
      double tret = 0.0;
      while ((ret = s->solve_to_roots(touts[k], 100000, &tret)) == 2) {
        if (r == 0 && ev_t && nev < 4) ev_t[nev] = tret;
        ++nev;
      }
      if (ret != 0) break;
    }
    total += s->nst;
    if (r == 0 && n_ev) *n_ev = nev;
    delete s;
  }
  return total;
}

}  // extern "C"

// Host-side native reference harness for tpukern.
//
// Plays the role of the reference's C++ check/bench utilities
// (kernels/hgemm/utils/utils.h: perf_gemm, gemm_error_check_{tn,nn} — a
// host triple-loop GEMM + max-|diff| reporting used by the standalone
// .bin targets). Here it is a cache-blocked, OpenMP-free C++ GEMM and
// elementwise comparators, exposed with C linkage for ctypes
// (tpukern/native.py). Built by native/Makefile into librefcheck.so.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// C[M,N] = A[M,K] @ B[K,N], f32, cache-blocked.
void ref_sgemm(const float* a, const float* b, float* c,
               int64_t m, int64_t n, int64_t k) {
  constexpr int64_t BM = 64, BN = 64, BK = 64;
  std::memset(c, 0, sizeof(float) * m * n);
  for (int64_t i0 = 0; i0 < m; i0 += BM)
    for (int64_t k0 = 0; k0 < k; k0 += BK)
      for (int64_t j0 = 0; j0 < n; j0 += BN) {
        int64_t im = i0 + BM < m ? i0 + BM : m;
        int64_t km = k0 + BK < k ? k0 + BK : k;
        int64_t jm = j0 + BN < n ? j0 + BN : n;
        for (int64_t i = i0; i < im; ++i)
          for (int64_t kk = k0; kk < km; ++kk) {
            float av = a[i * k + kk];
            const float* brow = b + kk * n;
            float* crow = c + i * n;
            for (int64_t j = j0; j < jm; ++j) crow[j] += av * brow[j];
          }
      }
}

// C[M,N] = A[M,K] @ B[N,K]^T (TN layout, hgemm_mma_stage_tn analog).
void ref_sgemm_tn(const float* a, const float* b, float* c,
                  int64_t m, int64_t n, int64_t k) {
  for (int64_t i = 0; i < m; ++i)
    for (int64_t j = 0; j < n; ++j) {
      double acc = 0.0;
      const float* arow = a + i * k;
      const float* brow = b + j * k;
      for (int64_t kk = 0; kk < k; ++kk) acc += (double)arow[kk] * brow[kk];
      c[i * n + j] = (float)acc;
    }
}

// max/mean absolute difference between two f32 buffers
// (gemm_error_check_* reporting). Returns max; writes mean via out param.
float max_mean_abs_diff(const float* x, const float* y, int64_t n,
                        float* mean_out) {
  double max_d = 0.0, sum_d = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    double d = std::fabs((double)x[i] - (double)y[i]);
    if (d > max_d) max_d = d;
    sum_d += d;
  }
  if (mean_out) *mean_out = (float)(sum_d / (n > 0 ? n : 1));
  return (float)max_d;
}

// allclose with atol+rtol*|ref| (the torch.allclose contract the
// reference harnesses gate on). Returns number of mismatched elements.
int64_t count_mismatch(const float* x, const float* ref, int64_t n,
                       float rtol, float atol) {
  int64_t bad = 0;
  for (int64_t i = 0; i < n; ++i) {
    double tol = atol + rtol * std::fabs((double)ref[i]);
    if (std::fabs((double)x[i] - (double)ref[i]) > tol) ++bad;
  }
  return bad;
}

}  // extern "C"

// Standalone GEMM perf/check bin — the reference's makefile-built
// `.bin` role (kernels/hgemm/utils/utils.h:7-97 perf_gemm +
// gemm_error_check_{tn,nn}, timed with cudaEvent there, std::chrono
// here). Times the cache-blocked host GEMM from refcheck.cc over an MNK
// list and cross-checks the NN and TN paths against each other (an
// XLA/JAX-free sanity island: if both independent loops agree, a
// mismatching accelerator kernel is the broken party).
//
// Build & run:  make -C native perf_gemm.bin && ./native/perf_gemm.bin
// Optional args: perf_gemm.bin [max_size] [iters]

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
void ref_sgemm(const float*, const float*, float*, int64_t, int64_t,
               int64_t);
void ref_sgemm_tn(const float*, const float*, float*, int64_t, int64_t,
                  int64_t);
float max_mean_abs_diff(const float*, const float*, int64_t, float*);
}

static double now_s() {
  using clk = std::chrono::steady_clock;
  return std::chrono::duration<double>(clk::now().time_since_epoch())
      .count();
}

int main(int argc, char** argv) {
  const int64_t max_size = argc > 1 ? atoll(argv[1]) : 1024;
  const int iters = argc > 2 ? atoi(argv[2]) : 3;
  std::mt19937 rng(0);
  std::normal_distribution<float> dist(0.f, 1.f);

  printf("%-8s %-12s %-12s %-12s %-12s\n", "MNK", "NN ms", "NN GFLOPS",
         "TN ms", "max|NN-TN|");
  for (int64_t s = 256; s <= max_size; s *= 2) {
    const int64_t m = s, n = s, k = s;
    std::vector<float> a(m * k), b(k * n), bt(n * k), c_nn(m * n),
        c_tn(m * n);
    for (auto& x : a) x = dist(rng);
    for (auto& x : b) x = dist(rng);
    for (int64_t i = 0; i < k; ++i)  // bt[j, k] = b[k, j]
      for (int64_t j = 0; j < n; ++j) bt[j * k + i] = b[i * n + j];

    double best_nn = 1e30, best_tn = 1e30;
    for (int it = 0; it < iters; ++it) {
      double t0 = now_s();
      ref_sgemm(a.data(), b.data(), c_nn.data(), m, n, k);
      double t1 = now_s();
      ref_sgemm_tn(a.data(), bt.data(), c_tn.data(), m, n, k);
      double t2 = now_s();
      if (t1 - t0 < best_nn) best_nn = t1 - t0;
      if (t2 - t1 < best_tn) best_tn = t2 - t1;
    }
    float mean = 0.f;
    float mx = max_mean_abs_diff(c_nn.data(), c_tn.data(), m * n, &mean);
    double gflops = 2.0 * m * n * k / best_nn / 1e9;
    printf("%-8lld %-12.2f %-12.1f %-12.2f %-12.3e\n",
           (long long)s, best_nn * 1e3, gflops, best_tn * 1e3,
           (double)mx);
    // f32 vs f64-accumulated TN: agreement within f32 rounding
    if (mx > 1e-2f) {
      fprintf(stderr, "FAIL: NN and TN disagree (max %g)\n", (double)mx);
      return 1;
    }
  }
  printf("OK\n");
  return 0;
}

// Host-side event rasterization kernels (C++/OpenMP).
//
// The reference delegates all event->tensor conversion to per-event python
// loops and numpy scatters in dataloader workers (datasets/representations.py,
// datasets/visualize.py:34-37 — its data-pipeline hot spot). This library is
// the native host path of this framework's input pipeline: when host-side
// rasterization is preferred (e.g. to keep device cycles for the model), the
// DataLoader calls these kernels through ctypes instead of running python
// loops. Semantics mirror ei_nexus_tpu/data/representations.py exactly
// (trilinear voxel splat with {-1,+1} polarity, nonzero standardization,
// closed-interval bin membership, last-timestamp-wins surfaces).
//
// Build: see build.sh (g++ -O3 -march=native -fopenmp -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Normalize timestamps to [0, 1] in place over [0, n).
static void normalize_time(const double* t, int64_t n, float* tn) {
  if (n == 0) return;
  const double t0 = t[0];
  const double span = t[n - 1] - t0 + 1e-8;
  for (int64_t i = 0; i < n; ++i) tn[i] = (float)((t[i] - t0) / span);
}

// Trilinear voxel-grid splat. x/y: float pixel coords; t: raw float64
// timestamps (sorted); p: polarity (values < 1 count as -1).
// out: (bins, H, W) float32, zero-initialized by this function.
void voxel_grid(const float* x, const float* y, const double* t,
                const float* p, int64_t n, int bins, int H, int W,
                int normalize, float* out) {
  const int64_t size = (int64_t)bins * H * W;
  std::memset(out, 0, size * sizeof(float));
  if (n == 0) return;
  std::vector<float> tn(n);
  normalize_time(t, n, tn.data());

#ifdef _OPENMP
  int nthreads = omp_get_max_threads();
#else
  int nthreads = 1;
#endif
  // Thread-private accumulators merged at the end (grid is ~6 MB; copies are
  // cheap next to atomic contention on 10M+ scattered adds). For small event
  // counts the partial-grid merge would dominate — accumulate directly into
  // `out` single-threaded when the scatter work is below the merge cost.
  if ((int64_t)n * 8 < (int64_t)nthreads * size) nthreads = 1;

  auto splat_range = [&](float* acc, int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float xs = x[i];
      const float ys = y[i];
      const float ts = tn[i] * (bins - 1);
      const float value = (p[i] < 1.f) ? -1.f : 1.f;
      const int x0 = (int)xs;  // events are nonnegative
      const int y0 = (int)ys;
      const int t0i = (int)ts;
      for (int dx = 0; dx <= 1; ++dx) {
        const int xl = x0 + dx;
        if (xl < 0 || xl >= W) continue;
        const float wx = 1.f - std::fabs((float)xl - xs);
        for (int dy = 0; dy <= 1; ++dy) {
          const int yl = y0 + dy;
          if (yl < 0 || yl >= H) continue;
          const float wy = 1.f - std::fabs((float)yl - ys);
          for (int dt = 0; dt <= 1; ++dt) {
            const int tl = t0i + dt;
            if (tl < 0 || tl >= bins) continue;
            const float wt = 1.f - std::fabs((float)tl - ts);
            acc[((int64_t)tl * H + yl) * W + xl] += value * wx * wy * wt;
          }
        }
      }
    }
  };

  if (nthreads == 1) {
    splat_range(out, 0, n);
  } else {
    std::vector<std::vector<float>> partial(nthreads);
#pragma omp parallel num_threads(nthreads)
    {
#ifdef _OPENMP
      const int tid = omp_get_thread_num();
#else
      const int tid = 0;
#endif
      partial[tid].assign(size, 0.f);
      const int64_t chunk = (n + nthreads - 1) / nthreads;
      const int64_t lo = tid * chunk;
      const int64_t hi = std::min(n, lo + chunk);
      if (lo < hi) splat_range(partial[tid].data(), lo, hi);
    }
    for (int th = 0; th < nthreads; ++th) {
      const float* acc = partial[th].data();
      for (int64_t i = 0; i < size; ++i) out[i] += acc[i];
    }
  }

  if (normalize) {
    // standardize nonzero entries (mean 0, unbiased std 1)
    double sum = 0.0;
    int64_t cnt = 0;
#pragma omp parallel for schedule(static) reduction(+ : sum, cnt)
    for (int64_t i = 0; i < size; ++i)
      if (out[i] != 0.f) { sum += out[i]; ++cnt; }
    if (cnt > 0) {
      const double mean = sum / cnt;
      double var = 0.0;
#pragma omp parallel for schedule(static) reduction(+ : var)
      for (int64_t i = 0; i < size; ++i)
        if (out[i] != 0.f) var += (out[i] - mean) * (out[i] - mean);
      const double std_ = cnt > 1 ? std::sqrt(var / (cnt - 1)) : 0.0;
      const float m = (float)mean;
      const float inv = std_ > 0 ? (float)(1.0 / std_) : 1.f;
#pragma omp parallel for schedule(static)
      for (int64_t i = 0; i < size; ++i)
        if (out[i] != 0.f) out[i] = (out[i] - m) * inv;
    }
  }
}

// Per-polarity time surface: channel 2*b + p keeps the latest normalized
// timestamp per pixel within bin b; closed-interval membership.
void time_surface(const float* x, const float* y, const double* t,
                  const float* p, int64_t n, int bins, int H, int W,
                  float* out) {
  const int n_bins = bins / 2;
  const int64_t size = (int64_t)bins * H * W;
  std::memset(out, 0, size * sizeof(float));
  if (n == 0 || n_bins == 0) return;
  std::vector<float> tn(n);
  normalize_time(t, n, tn.data());
  const float dt_bin = 1.f / n_bins;
  // sequential (write order matters for exact last-wins parity; n is small
  // relative to memory traffic and this is already >100x the python loop)
  for (int64_t i = 0; i < n; ++i) {
    const int xi = (int)x[i];
    const int yi = (int)y[i];
    if (xi < 0 || xi >= W || yi < 0 || yi >= H) continue;
    const int pi = (int)p[i];
    for (int b = 0; b < n_bins; ++b) {
      if (tn[i] >= b * dt_bin && tn[i] <= (b + 1) * dt_bin) {
        const int ch = 2 * b + pi;
        if (ch >= 0 && ch < bins)
          out[((int64_t)ch * H + yi) * W + xi] = tn[i];
      }
    }
  }
}

// Signed event counts per bin: out[b, y, x] += 2p - 1.
void event_stack(const float* x, const float* y, const double* t,
                 const float* p, int64_t n, int bins, int H, int W,
                 float* out) {
  const int64_t size = (int64_t)bins * H * W;
  std::memset(out, 0, size * sizeof(float));
  if (n == 0) return;
  std::vector<float> tn(n);
  normalize_time(t, n, tn.data());
  const float dt_bin = 1.f / bins;
  for (int64_t i = 0; i < n; ++i) {
    const int xi = (int)x[i];
    const int yi = (int)y[i];
    if (xi < 0 || xi >= W || yi < 0 || yi >= H) continue;
    const float v = 2.f * p[i] - 1.f;
    for (int b = 0; b < bins; ++b) {
      if (tn[i] >= b * dt_bin && tn[i] <= (b + 1) * dt_bin)
        out[((int64_t)b * H + yi) * W + xi] += v;
    }
  }
}

// Event-count accumulation image (occupancy-mask source).
void accumulation_image(const float* x, const float* y, int64_t n, int H,
                        int W, float* out) {
  std::memset(out, 0, (int64_t)H * W * sizeof(float));
  for (int64_t i = 0; i < n; ++i) {
    const int xi = (int)x[i];
    const int yi = (int)y[i];
    if (xi < 0 || xi >= W || yi < 0 || yi >= H) continue;
    out[(int64_t)yi * W + xi] += 1.f;
  }
}

}  // extern "C"

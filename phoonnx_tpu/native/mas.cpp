// Monotonic Alignment Search — host-side native kernel.
//
// C++/OpenMP equivalent of the reference's Cython kernel
// (phoonnx_train/vits/monotonic_align/core.pyx:1-43): per-batch dynamic
// program over [T_spec, T_text] with stay/advance recurrence and
// stay-on-tie backtracking. Used by the host data/validation paths; the
// in-graph training path uses the lax.scan/Pallas implementation in
// phoonnx_tpu/ops/mas.py.
//
// Build: see phoonnx_tpu/native/build.py (g++ -O3 -fopenmp -shared -fPIC).

#include <algorithm>
#include <cstdint>

namespace {

constexpr float kNegInf = -1e9f;

// value: [t_y, t_x] row-major, mutated in place into best path scores.
// path:  [t_y, t_x] int32, zero-initialised by the caller.
void maximum_path_single(int32_t* path, float* value, int t_y, int t_x,
                         int stride) {
  for (int y = 0; y < t_y; ++y) {
    const int x_lo = std::max(0, t_x + y - t_y);
    const int x_hi = std::min(t_x, y + 1);
    float* row = value + static_cast<int64_t>(y) * stride;
    const float* prev = value + static_cast<int64_t>(y - 1) * stride;
    for (int x = x_lo; x < x_hi; ++x) {
      const float stay = (x == y) ? kNegInf : prev[x];
      float advance;
      if (x == 0) {
        advance = (y == 0) ? 0.0f : kNegInf;
      } else {
        advance = prev[x - 1];
      }
      row[x] += std::max(advance, stay);
    }
  }

  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[static_cast<int64_t>(y) * stride + index] = 1;
    if (index != 0) {
      const float* prev = value + static_cast<int64_t>(y - 1) * stride;
      if (index == y || prev[index] < prev[index - 1]) {
        --index;
      }
    }
  }
}

}  // namespace

extern "C" {

// paths/values: [b, t_y_max, t_x_max]; t_ys/t_xs: per-batch true lengths.
void maximum_path_batch(int32_t* paths, float* values, const int32_t* t_ys,
                        const int32_t* t_xs, int b, int t_y_max,
                        int t_x_max) {
  const int64_t plane = static_cast<int64_t>(t_y_max) * t_x_max;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i) {
    maximum_path_single(paths + i * plane, values + i * plane, t_ys[i],
                        t_xs[i], t_x_max);
  }
}

}  // extern "C"

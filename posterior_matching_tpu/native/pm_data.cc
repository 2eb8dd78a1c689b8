// Native host-side input-pipeline kernels.
//
// The accelerators consume batches assembled on the host: a shuffled row
// gather out of the resident dataset arrays, plus (for images) the
// uint8 -> float32 /255 rescale the reference does inside tf.data
// (reference utils.py:50-56). Both are memory-bound host ops on the
// critical path between steps; these multithreaded kernels keep them off
// the Python interpreter. Exposed via ctypes (no pybind11 in this image).
//
// Build: posterior_matching_tpu/native/build.py (g++ -O3 -shared).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// Launch `n_threads` workers over [0, n_rows) in contiguous chunks.
template <typename Fn>
void parallel_rows(int64_t n_rows, int n_threads, Fn fn) {
  n_threads = std::max(1, std::min<int>(n_threads, n_rows));
  if (n_threads == 1) {
    fn(0, n_rows);
    return;
  }
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  int64_t chunk = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n_rows, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back(fn, lo, hi);
  }
  for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

// out[i, :] = src[indices[i], :]  (row gather, arbitrary row byte width)
void pm_gather_rows(const uint8_t* src, const int64_t* indices,
                    uint8_t* out, int64_t n_rows, int64_t row_bytes,
                    int n_threads) {
  parallel_rows(n_rows, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out + i * row_bytes, src + indices[i] * row_bytes,
                  static_cast<size_t>(row_bytes));
    }
  });
}

// out[i, :] = float32(src[indices[i], :]) * scale   (fused gather + rescale)
void pm_gather_u8_to_f32(const uint8_t* src, const int64_t* indices,
                         float* out, int64_t n_rows, int64_t row_elems,
                         float scale, int n_threads) {
  parallel_rows(n_rows, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* s = src + indices[i] * row_elems;
      float* d = out + i * row_elems;
      for (int64_t j = 0; j < row_elems; ++j) {
        d[j] = static_cast<float>(s[j]) * scale;
      }
    }
  });
}

// out[i, :] = float32(src[indices[i], :]) (f32 rows, gather only)
void pm_gather_f32(const float* src, const int64_t* indices, float* out,
                   int64_t n_rows, int64_t row_elems, int n_threads) {
  parallel_rows(n_rows, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out + i * row_elems, src + indices[i] * row_elems,
                  sizeof(float) * static_cast<size_t>(row_elems));
    }
  });
}

}  // extern "C"

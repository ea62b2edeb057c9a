// Native fast path for Gaussian-checkpoint PLY IO (data/ply.py).
//
// The 3DGS checkpoint format (reference scene/gaussian_model.py:168-185)
// is one binary `vertex` element whose properties are all float32 — an
// (N, P) array-of-structs on disk vs the (P, N) struct-of-arrays the
// framework holds (column per property). Encode/decode is therefore one
// big f32 transpose; at multi-million N numpy's strided structured-array
// assignment is single-threaded and cache-hostile. This does a blocked,
// multithreaded transpose over plain C pointers (ctypes binding in
// native/__init__.py, numpy fallback in data/ply.py).
#include <algorithm>
#include <cstdint>
#include <thread>
#include <vector>

namespace {
constexpr int64_t kBlock = 64;  // 64x64 f32 tiles: 16 KB in + 16 KB out

void transpose_range(const float* src, int64_t rows, int64_t cols,
                     float* dst, int64_t r0, int64_t r1) {
  // src is (rows, cols) row-major; dst is (cols, rows) row-major.
  for (int64_t rb = r0; rb < r1; rb += kBlock) {
    const int64_t re = std::min(rb + kBlock, r1);
    for (int64_t cb = 0; cb < cols; cb += kBlock) {
      const int64_t ce = std::min(cb + kBlock, cols);
      for (int64_t r = rb; r < re; ++r) {
        const float* s = src + r * cols;
        for (int64_t c = cb; c < ce; ++c) {
          dst[c * rows + r] = s[c];
        }
      }
    }
  }
}
}  // namespace

extern "C" {

// src (rows, cols) f32 row-major -> dst (cols, rows) f32 row-major.
// Returns 0 on success.
int ply_transpose_f32(const float* src, int64_t rows, int64_t cols,
                      float* dst) {
  if (rows <= 0 || cols <= 0) return rows < 0 || cols < 0 ? 1 : 0;
  const int64_t kParallelMin = 1 << 20;  // elements
  unsigned hw = std::thread::hardware_concurrency();
  if (rows * cols < kParallelMin || hw <= 1) {
    transpose_range(src, rows, cols, dst, 0, rows);
    return 0;
  }
  const int64_t n_threads =
      std::min<int64_t>(hw, (rows + kBlock - 1) / kBlock);
  // split on block boundaries so no two threads share a dst cache line
  const int64_t blocks = (rows + kBlock - 1) / kBlock;
  const int64_t per = (blocks + n_threads - 1) / n_threads;
  std::vector<std::thread> ts;
  ts.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    const int64_t r0 = std::min(rows, t * per * kBlock);
    const int64_t r1 = std::min(rows, (t + 1) * per * kBlock);
    if (r0 >= r1) break;
    ts.emplace_back(transpose_range, src, rows, cols, dst, r0, r1);
  }
  for (auto& th : ts) th.join();
  return 0;
}

}  // extern "C"

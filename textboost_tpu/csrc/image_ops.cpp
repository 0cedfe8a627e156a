// Native host-side image ops for the data loader hot path.
//
// The TPU step consumes float32 NHWC batches in [-1, 1]; converting
// uint8 decode output with numpy costs a surprising slice of the host
// budget at high worker counts (allocation + two passes). This kernel
// does the whole uint8 -> normalized-float conversion in one multithreaded
// pass. Built on demand with g++ (textboost_tpu/data/native.py); the
// loader falls back to numpy when no compiler is available.
//
// Counterpart of the torchvision ToDtype+Normalize chain the reference
// uses (textboost/dataset.py:328-334).

#include <cstdint>
#include <cstddef>
#include <thread>
#include <vector>

extern "C" {

// dst[i] = (src[i]/255 - mean)/std, over n elements, using `threads` workers.
void normalize_u8_to_f32(const uint8_t* src, float* dst, int64_t n,
                         float mean, float inv_std, int threads) {
  // Precomputed 256-entry LUT: one load + one store per element.
  float lut[256];
  for (int i = 0; i < 256; ++i) {
    lut[i] = (static_cast<float>(i) / 255.0f - mean) * inv_std;
  }
  if (threads < 1) threads = 1;
  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) dst[i] = lut[src[i]];
  };
  if (threads == 1 || n < (1 << 16)) {
    worker(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = begin + chunk > n ? n : begin + chunk;
    if (begin >= end) break;
    pool.emplace_back(worker, begin, end);
  }
  for (auto& th : pool) th.join();
}

// Gather HWC uint8 crops into a float32 NHWC batch in one pass:
// for each image i, copy the (size x size) window at (tops[i], lefts[i])
// from srcs[i] (h_i x w_i x 3) with normalization.
void crop_normalize_batch(const uint8_t** srcs, const int32_t* heights,
                          const int32_t* widths, const int32_t* tops,
                          const int32_t* lefts, float* dst, int32_t batch,
                          int32_t size, float mean, float inv_std) {
  float lut[256];
  for (int i = 0; i < 256; ++i) {
    lut[i] = (static_cast<float>(i) / 255.0f - mean) * inv_std;
  }
  int64_t img_elems = static_cast<int64_t>(size) * size * 3;
  auto worker = [&](int b) {
    const uint8_t* src = srcs[b];
    int32_t w = widths[b];
    float* out = dst + b * img_elems;
    for (int32_t y = 0; y < size; ++y) {
      const uint8_t* row = src + (static_cast<int64_t>(tops[b] + y) * w +
                                  lefts[b]) * 3;
      float* orow = out + static_cast<int64_t>(y) * size * 3;
      for (int32_t x = 0; x < size * 3; ++x) orow[x] = lut[row[x]];
    }
  };
  std::vector<std::thread> pool;
  for (int b = 0; b < batch; ++b) pool.emplace_back(worker, b);
  for (auto& th : pool) th.join();
}

}  // extern "C"

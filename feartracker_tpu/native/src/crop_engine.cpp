// Fused crop + pad + bilinear resize + normalize, C++ host engine.
//
// The reference's per-frame host preprocessing is a chain of cv2 calls with
// intermediate allocations (ref: utils/utils.py:215-253 get_extended_crop →
// copyMakeBorder → resize, then albumentations Normalize). This engine does
// the whole chain in one pass per output pixel, multi-threaded across a
// batch — the native data-loader/serving component of the TPU build
// (SURVEY.md §2.4: the reference has no native code of its own; its speed
// came from cv2/ANE).
//
// Sampling semantics match feartracker_tpu/ops/crop.py exactly:
//   src = window_origin + (dst + 0.5) * window_size / out_size - 0.5
// with out-of-frame samples reading the pad color (the "virtual padded
// frame" formulation — equivalent to pad-then-resize).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread crop_engine.cpp -o libcropengine.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline void sample_row(const uint8_t* img, int H, int W, int C, int yi,
                       const int* x0, const float* fx, const float* pad,
                       bool y_inside, int out_size, float* row_a, float* row_b) {
  // Gather one source row (y = yi) bilinearly along x for all out pixels.
  // row_a = (1-fx)*img[yi,x0] ; row_b = fx*img[yi,x0+1]; pad outside.
  for (int j = 0; j < out_size; ++j) {
    const int xa = x0[j];
    const int xb = xa + 1;
    const float wxa = 1.0f - fx[j];
    const float wxb = fx[j];
    const bool xa_in = y_inside && xa >= 0 && xa < W;
    const bool xb_in = y_inside && xb >= 0 && xb < W;
    const uint8_t* pa = img + (static_cast<size_t>(yi) * W + xa) * C;
    const uint8_t* pb = img + (static_cast<size_t>(yi) * W + xb) * C;
    for (int c = 0; c < C; ++c) {
      row_a[j * C + c] = wxa * (xa_in ? static_cast<float>(pa[c]) : pad[c]);
      row_b[j * C + c] = wxb * (xb_in ? static_cast<float>(pb[c]) : pad[c]);
    }
  }
}

void crop_one(const uint8_t* img, int H, int W, int C, const float* window,
              int out_size, const float* pad, const float* mean,
              const float* inv_std, float* out) {
  const float wx = window[0], wy = window[1], ww = window[2], wh = window[3];
  std::vector<int> x0(out_size);
  std::vector<float> fx(out_size);
  for (int j = 0; j < out_size; ++j) {
    const float sx = wx + (j + 0.5f) * ww / out_size - 0.5f;
    const float fl = std::floor(sx);
    x0[j] = static_cast<int>(fl);
    fx[j] = sx - fl;
  }
  std::vector<float> row_a(static_cast<size_t>(out_size) * C);
  std::vector<float> row_b(static_cast<size_t>(out_size) * C);
  std::vector<float> row_a2(static_cast<size_t>(out_size) * C);
  std::vector<float> row_b2(static_cast<size_t>(out_size) * C);

  for (int i = 0; i < out_size; ++i) {
    const float sy = wy + (i + 0.5f) * wh / out_size - 0.5f;
    const float fl = std::floor(sy);
    const int ya = static_cast<int>(fl);
    const int yb = ya + 1;
    const float fy = sy - fl;
    const bool ya_in = ya >= 0 && ya < H;
    const bool yb_in = yb >= 0 && yb < H;
    sample_row(img, H, W, C, ya_in ? ya : 0, x0.data(), fx.data(), pad, ya_in,
               out_size, row_a.data(), row_b.data());
    sample_row(img, H, W, C, yb_in ? yb : 0, x0.data(), fx.data(), pad, yb_in,
               out_size, row_a2.data(), row_b2.data());
    float* dst = out + static_cast<size_t>(i) * out_size * C;
    for (int j = 0; j < out_size * C; ++j) {
      const float top = row_a[j] + row_b[j];
      const float bot = row_a2[j] + row_b2[j];
      const float v = top * (1.0f - fy) + bot * fy;
      const int c = j % C;
      dst[j] = (v - mean[c]) * inv_std[c];
    }
  }
}

}  // namespace

extern "C" {

// Single crop. mean/inv_std of length C; pass mean=0, inv_std=1 to skip
// normalization.
void crop_resize_normalize(const uint8_t* img, int H, int W, int C,
                           const float* window, int out_size, const float* pad,
                           const float* mean, const float* inv_std,
                           float* out) {
  crop_one(img, H, W, C, window, out_size, pad, mean, inv_std, out);
}

// Batch over independent frames (each its own window + pad color), threaded.
void crop_resize_normalize_batch(const uint8_t* imgs, int N, int H, int W,
                                 int C, const float* windows, int out_size,
                                 const float* pads, const float* mean,
                                 const float* inv_std, float* out,
                                 int num_threads) {
  const size_t img_stride = static_cast<size_t>(H) * W * C;
  const size_t out_stride = static_cast<size_t>(out_size) * out_size * C;
  std::atomic<int> next(0);
  auto worker = [&]() {
    int n;
    while ((n = next.fetch_add(1)) < N) {
      crop_one(imgs + n * img_stride, H, W, C, windows + n * 4, out_size,
               pads + n * C, mean, inv_std, out + n * out_stride);
    }
  };
  if (num_threads <= 1 || N <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  const int t = std::min(num_threads, N);
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"

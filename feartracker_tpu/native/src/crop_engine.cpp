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

// Horizontally resample one source row (y = yi) into a packed C=3 float row:
// row[j*3+c] = (1-fx)*img[yi,x0] + fx*img[yi,x0+1], pad color outside.
inline void hresample_row3(const uint8_t* img, int H, int W, int yi,
                           const int* x0, const float* fx, const float* pad,
                           bool y_inside, int out_size, float* __restrict__ row) {
  if (!y_inside) {
    for (int j = 0; j < out_size; ++j) {
      row[j * 3 + 0] = pad[0];
      row[j * 3 + 1] = pad[1];
      row[j * 3 + 2] = pad[2];
    }
    return;
  }
  const uint8_t* base = img + static_cast<size_t>(yi) * W * 3;
  for (int j = 0; j < out_size; ++j) {
    const int xa = x0[j];
    const int xb = xa + 1;
    const float wb = fx[j];
    const float wa = 1.0f - wb;
    const bool a_in = xa >= 0 && xa < W;
    const bool b_in = xb >= 0 && xb < W;
    const uint8_t* pa = base + xa * 3;
    const uint8_t* pb = base + xb * 3;
    for (int c = 0; c < 3; ++c) {
      const float va = a_in ? static_cast<float>(pa[c]) : pad[c];
      const float vb = b_in ? static_cast<float>(pb[c]) : pad[c];
      row[j * 3 + c] = wa * va + wb * vb;
    }
  }
}

// Row-cached separable bilinear: horizontal resample each needed source row
// once (consecutive outputs share rows when downscaling ≤2× or upscaling),
// then blend vertically — ~3× fewer horizontal passes than the naive form.
void crop_one(const uint8_t* img, int H, int W, int C, const float* window,
              int out_size, const float* pad, const float* mean,
              const float* inv_std, float* out) {
  const float wx = window[0], wy = window[1], ww = window[2], wh = window[3];
  const float x_lo = wx, x_hi = wx + ww - 1.0f;
  const float y_lo = wy, y_hi = wy + wh - 1.0f;
  std::vector<int> x0(out_size);
  std::vector<float> fx(out_size);
  for (int j = 0; j < out_size; ++j) {
    float sx = wx + (j + 0.5f) * ww / out_size - 0.5f;
    sx = std::min(std::max(sx, x_lo), x_hi);  // window edge replicate (cv2)
    const float fl = std::floor(sx);
    x0[j] = static_cast<int>(fl);
    fx[j] = sx - fl;
  }
  (void)C;  // RGB only; enforced by the Python binding
  std::vector<float> rowA(static_cast<size_t>(out_size) * 3);
  std::vector<float> rowB(static_cast<size_t>(out_size) * 3);
  int cachedA = INT32_MIN, cachedB = INT32_MIN;
  float* bufA = rowA.data();
  float* bufB = rowB.data();

  for (int i = 0; i < out_size; ++i) {
    float sy = wy + (i + 0.5f) * wh / out_size - 0.5f;
    sy = std::min(std::max(sy, y_lo), y_hi);
    const float fl = std::floor(sy);
    const int ya = static_cast<int>(fl);
    const int yb = ya + 1;
    const float fy = sy - fl;
    if (ya == cachedB) {  // reuse: previous bottom row becomes top row
      std::swap(bufA, bufB);
      std::swap(cachedA, cachedB);
    }
    if (cachedA != ya) {
      hresample_row3(img, H, W, ya, x0.data(), fx.data(), pad, ya >= 0 && ya < H,
                     out_size, bufA);
      cachedA = ya;
    }
    if (cachedB != yb) {
      hresample_row3(img, H, W, yb, x0.data(), fx.data(), pad, yb >= 0 && yb < H,
                     out_size, bufB);
      cachedB = yb;
    }
    float* __restrict__ dst = out + static_cast<size_t>(i) * out_size * 3;
    const float wtop = 1.0f - fy;
    for (int j = 0; j < out_size * 3; ++j) {
      const float v = wtop * bufA[j] + fy * bufB[j];
      const int c = j % 3;
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
  if (C != 3) return;  // RGB-only ABI; non-3 would corrupt memory
  crop_one(img, H, W, C, window, out_size, pad, mean, inv_std, out);
}

// Batch over independent frames (each its own window + pad color), threaded.
void crop_resize_normalize_batch(const uint8_t* imgs, int N, int H, int W,
                                 int C, const float* windows, int out_size,
                                 const float* pads, const float* mean,
                                 const float* inv_std, float* out,
                                 int num_threads) {
  if (C != 3) return;  // RGB-only ABI; non-3 would corrupt memory
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

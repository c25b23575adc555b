// Native image preprocessing core for the cullavo_tpu data loader.
//
// The reference framework leans on native code for its hot loops (the CUDA
// MSDeformAttn extension; PIL/torchvision C paths inside the HF processor).
// On TPU the device-side preprocessing is an XLA program
// (cullavo_tpu/data/image_processing.py); THIS file is the host-side
// equivalent used by the input pipeline workers: antialiased bicubic resize
// (shortest edge), center crop, rescale + CLIP normalization, HWC->CHW,
// multithreaded across the batch.  Semantics follow PIL's convolution-based
// resampling (Catmull-Rom bicubic, support widened by the scale factor when
// downsampling) so host- and reference-preprocessed pixels agree closely.
//
// Built as a plain shared library (no pybind11); bound via ctypes from
// cullavo_tpu/native/__init__.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kA = -0.5;  // Catmull-Rom / PIL BICUBIC parameter

double bicubic_kernel(double x) {
  x = std::fabs(x);
  if (x < 1.0) return ((kA + 2.0) * x - (kA + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * kA;
  return 0.0;
}

struct Weights {
  // For each output index: first source index + taps.
  std::vector<int> start;
  std::vector<int> count;
  std::vector<double> taps;  // [out, max_taps] row-major
  int max_taps = 0;
};

// PIL-style weight precomputation: kernel support scales with the
// downsampling ratio (antialiasing).
Weights compute_weights(int in_size, int out_size) {
  Weights w;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 2.0 * filterscale;  // bicubic support = 2
  int max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  w.start.resize(out_size);
  w.count.resize(out_size);
  w.taps.assign(static_cast<size_t>(out_size) * max_taps, 0.0);
  w.max_taps = max_taps;
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = static_cast<int>(center - support + 0.5);
    int hi = static_cast<int>(center + support + 0.5);
    lo = std::max(lo, 0);
    hi = std::min(hi, in_size);
    double sum = 0.0;
    int n = 0;
    for (int j = lo; j < hi; ++j) {
      double v = bicubic_kernel((j - center + 0.5) / filterscale);
      w.taps[static_cast<size_t>(i) * max_taps + n] = v;
      sum += v;
      ++n;
    }
    if (sum != 0.0) {
      for (int t = 0; t < n; ++t)
        w.taps[static_cast<size_t>(i) * max_taps + t] /= sum;
    }
    w.start[i] = lo;
    w.count[i] = n;
  }
  return w;
}

// Resize one HWC uint8 image to (out_h, out_w) fp32 (separable passes).
void resize_image(const uint8_t* src, int h, int win, int out_h, int out_w,
                  std::vector<float>& dst /* out_h*out_w*3 */) {
  Weights wx = compute_weights(win, out_w);
  Weights wy = compute_weights(h, out_h);
  // horizontal pass: [h, out_w, 3]
  std::vector<float> tmp(static_cast<size_t>(h) * out_w * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * win * 3;
    for (int x = 0; x < out_w; ++x) {
      const double* taps = &wx.taps[static_cast<size_t>(x) * wx.max_taps];
      int s = wx.start[x], n = wx.count[x];
      double acc[3] = {0, 0, 0};
      for (int t = 0; t < n; ++t) {
        const uint8_t* px = row + static_cast<size_t>(s + t) * 3;
        acc[0] += taps[t] * px[0];
        acc[1] += taps[t] * px[1];
        acc[2] += taps[t] * px[2];
      }
      float* out = &tmp[(static_cast<size_t>(y) * out_w + x) * 3];
      out[0] = static_cast<float>(acc[0]);
      out[1] = static_cast<float>(acc[1]);
      out[2] = static_cast<float>(acc[2]);
    }
  }
  // vertical pass: [out_h, out_w, 3]
  dst.resize(static_cast<size_t>(out_h) * out_w * 3);
  for (int y = 0; y < out_h; ++y) {
    const double* taps = &wy.taps[static_cast<size_t>(y) * wy.max_taps];
    int s = wy.start[y], n = wy.count[y];
    for (int x = 0; x < out_w; ++x) {
      double acc[3] = {0, 0, 0};
      for (int t = 0; t < n; ++t) {
        const float* px = &tmp[((static_cast<size_t>(s + t)) * out_w + x) * 3];
        acc[0] += taps[t] * px[0];
        acc[1] += taps[t] * px[1];
        acc[2] += taps[t] * px[2];
      }
      float* out = &dst[(static_cast<size_t>(y) * out_w + x) * 3];
      out[0] = static_cast<float>(acc[0]);
      out[1] = static_cast<float>(acc[1]);
      out[2] = static_cast<float>(acc[2]);
    }
  }
}

void process_one(const uint8_t* src, int h, int w, int size,
                 const float* mean, const float* std_, float* out /*3*size*size*/) {
  // shortest-edge resize
  int new_h, new_w;
  if (h <= w) {
    new_h = size;
    new_w = std::max(size, static_cast<int>(std::lround(
        static_cast<double>(w) * size / h)));
  } else {
    new_w = size;
    new_h = std::max(size, static_cast<int>(std::lround(
        static_cast<double>(h) * size / w)));
  }
  std::vector<float> resized;
  resize_image(src, h, w, new_h, new_w, resized);
  int top = (new_h - size) / 2;
  int left = (new_w - size) / 2;
  // crop + rescale + normalize + HWC->CHW
  for (int c = 0; c < 3; ++c) {
    float m = mean[c], s = std_[c];
    for (int y = 0; y < size; ++y) {
      const float* row = &resized[((static_cast<size_t>(top + y)) * new_w + left) * 3];
      float* orow = out + (static_cast<size_t>(c) * size + y) * size;
      for (int x = 0; x < size; ++x) {
        float v = row[static_cast<size_t>(x) * 3 + c] / 255.0f;
        orow[x] = (v - m) / s;
      }
    }
  }
}

}  // namespace

extern "C" {

// Batched preprocess: n images (uint8 HWC, possibly ragged sizes) →
// out [n, 3, size, size] fp32, CLIP-normalized.  Threads across images.
void preprocess_batch(const uint8_t** images, const int* heights,
                      const int* widths, int n, int size, const float* mean,
                      const float* std_, float* out, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  std::size_t per_image = static_cast<size_t>(3) * size * size;
  for (int t = 0; t < num_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += num_threads) {
        process_one(images[i], heights[i], widths[i], size, mean, std_,
                    out + per_image * i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

int native_version() { return 1; }

}  // extern "C"

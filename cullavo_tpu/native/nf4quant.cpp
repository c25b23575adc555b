// Native planar NF4 quantizer for the cullavo_tpu checkpoint/bench path.
//
// Quantizes fp32 weights to the planar 4-bit layout consumed by
// cullavo_tpu/ops/nf4.py::nf4_linear_planar: blockwise (64) absmax scaling,
// nearest-codebook-entry via midpoint comparison, 8 row-planes packed per
// int32 word with the row-contiguous permutation.  Multithreaded across
// layer slices; ~30x faster than the numpy path, which makes quantizing a
// full 7B checkpoint interactive.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kCode[16] = {
    -1.0f, -0.6961928009986877f, -0.5250730514526367f, -0.39491748809814453f,
    -0.28444138169288635f, -0.18477343022823334f, -0.09105003625154495f, 0.0f,
    0.07958029955625534f, 0.16093020141124725f, 0.24611230194568634f,
    0.33791524171829224f, 0.44070982933044434f, 0.5626170039176941f,
    0.7229568362236023f, 1.0f};

inline int encode(float v) {
  // midpoint binary search (15 midpoints)
  int lo = 0, hi = 15;
  while (lo < hi) {
    int mid = (lo + hi) / 2;
    float m = 0.5f * (kCode[mid] + kCode[mid + 1]);
    if (v > m) lo = mid + 1; else hi = mid;
  }
  return lo;
}

constexpr int kBlock = 64;

// one [K, N] slice → words [K/8, N] int32 + scale [K, N/64] fp32
void quantize_slice(const float* w, int K, int N, int32_t* words, float* scale) {
  int k8 = K / 8;
  std::vector<uint8_t> codes(static_cast<size_t>(K) * N);
  for (int r = 0; r < K; ++r) {
    const float* row = w + static_cast<size_t>(r) * N;
    uint8_t* crow = codes.data() + static_cast<size_t>(r) * N;
    float* srow = scale + static_cast<size_t>(r) * (N / kBlock);
    for (int b = 0; b < N / kBlock; ++b) {
      const float* blk = row + b * kBlock;
      float amax = 0.0f;
      for (int i = 0; i < kBlock; ++i) amax = std::max(amax, std::fabs(blk[i]));
      srow[b] = amax;
      float inv = amax == 0.0f ? 1.0f : 1.0f / amax;
      for (int i = 0; i < kBlock; ++i)
        crow[b * kBlock + i] = static_cast<uint8_t>(encode(blk[i] * inv));
    }
  }
  // planar pack: word[k8r, n] |= code[i*k8 + k8r, n] << 4i
  std::memset(words, 0, sizeof(int32_t) * static_cast<size_t>(k8) * N);
  for (int i = 0; i < 8; ++i) {
    for (int r = 0; r < k8; ++r) {
      const uint8_t* crow = codes.data() + static_cast<size_t>(i * k8 + r) * N;
      int32_t* wrow = words + static_cast<size_t>(r) * N;
      for (int n = 0; n < N; ++n) wrow[n] |= static_cast<int32_t>(crow[n]) << (4 * i);
    }
  }
}

}  // namespace

extern "C" {

// w: [L, K, N] fp32 → words [L, K/8, N] int32, scale [L, K, N/64] fp32.
void nf4_quantize_planar(const float* w, int L, int K, int N, int32_t* words,
                         float* scale, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  size_t w_stride = static_cast<size_t>(K) * N;
  size_t words_stride = static_cast<size_t>(K / 8) * N;
  size_t scale_stride = static_cast<size_t>(K) * (N / kBlock);
  for (int t = 0; t < num_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int l = t; l < L; l += num_threads) {
        quantize_slice(w + w_stride * l, K, N, words + words_stride * l,
                       scale + scale_stride * l);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"

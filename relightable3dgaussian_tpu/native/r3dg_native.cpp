// Native runtime helpers for relightable3dgaussian_tpu.
//
// The reference implements its IO/runtime layer in C++/CUDA
// (r3dg-rasterization host code, simple-knn, bvh builders). The TPU build
// keeps device compute in XLA/Pallas; this library provides the host-side
// native pieces: bulk PLY row<->column transcoding (AoS<->SoA), 30-bit
// Morton encoding, and a parallel LSD radix argsort used for host-side
// preprocessing of large point sets.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

// Run fn(begin, end) over [0, total) split across threads.
template <typename F>
void parallel_for(int64_t total, F&& fn) {
  int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(total / 4096, 1));
  if (nt <= 1) {
    fn(static_cast<int64_t>(0), total);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (total + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk;
    int64_t e = std::min<int64_t>(b + chunk, total);
    if (b >= e) break;
    threads.emplace_back([b, e, &fn] { fn(b, e); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Interleaved rows [n x stride_floats] -> per-column contiguous arrays.
// cols: array of n_cols destination pointers, each [n] floats.
void r3dg_aos_to_soa_f32(const float* rows, int64_t n, int32_t stride,
                         float** cols, int32_t n_cols) {
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      const float* src = rows + i * stride;
      for (int32_t c = 0; c < n_cols; ++c) cols[c][i] = src[c];
    }
  });
}

// Per-column arrays -> interleaved rows.
void r3dg_soa_to_aos_f32(float* rows, int64_t n, int32_t stride,
                         const float* const* cols, int32_t n_cols) {
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      float* dst = rows + i * stride;
      for (int32_t c = 0; c < n_cols; ++c) dst[c] = cols[c][i];
    }
  });
}

// 30-bit Morton codes for points normalized into [lo, hi].
void r3dg_morton30(const float* xyz, int64_t n, const float* lo,
                   const float* hi, uint32_t* out) {
  float inv[3];
  for (int k = 0; k < 3; ++k) {
    float range = hi[k] - lo[k];
    inv[k] = range > 1e-9f ? 1.0f / range : 0.0f;
  }
  auto expand = [](uint32_t v) {
    v = (v * 0x00010001u) & 0xFF0000FFu;
    v = (v * 0x00000101u) & 0x0F00F00Fu;
    v = (v * 0x00000011u) & 0xC30C30C3u;
    v = (v * 0x00000005u) & 0x49249249u;
    return v;
  };
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      uint32_t q[3];
      for (int k = 0; k < 3; ++k) {
        float x = (xyz[i * 3 + k] - lo[k]) * inv[k];
        x = x < 0.f ? 0.f : (x > 1.f ? 1.f : x);
        uint32_t u = static_cast<uint32_t>(x * 1024.0f);
        q[k] = u > 1023u ? 1023u : u;
      }
      out[i] = (expand(q[0]) << 2) | (expand(q[1]) << 1) | expand(q[2]);
    }
  });
}

// Stable LSD radix argsort of uint32 keys (8-bit digits); out: permutation.
void r3dg_radix_argsort_u32(const uint32_t* keys, int64_t n, int32_t* out) {
  std::vector<int32_t> tmp(n);
  std::vector<uint32_t> kbuf(keys, keys + n), ktmp(n);
  for (int64_t i = 0; i < n; ++i) out[i] = static_cast<int32_t>(i);
  int32_t* idx_src = out;
  int32_t* idx_dst = tmp.data();
  uint32_t* k_src = kbuf.data();
  uint32_t* k_dst = ktmp.data();
  for (int pass = 0; pass < 4; ++pass) {
    int shift = pass * 8;
    int64_t count[256] = {0};
    for (int64_t i = 0; i < n; ++i) ++count[(k_src[i] >> shift) & 0xFF];
    int64_t sum = 0;
    for (int d = 0; d < 256; ++d) {
      int64_t c = count[d];
      count[d] = sum;
      sum += c;
    }
    for (int64_t i = 0; i < n; ++i) {
      int d = (k_src[i] >> shift) & 0xFF;
      int64_t pos = count[d]++;
      idx_dst[pos] = idx_src[i];
      k_dst[pos] = k_src[i];
    }
    std::swap(idx_src, idx_dst);
    std::swap(k_src, k_dst);
  }
  if (idx_src != out) std::memcpy(out, idx_src, n * sizeof(int32_t));
}

// version tag for cache invalidation
int32_t r3dg_native_version() { return 1; }

}  // extern "C"

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

}  // extern "C"

// ---------------------------------------------------------------------------
// PIZ decompressor for OpenEXR scanline chunks.
//
// Implements the PIZ pipeline from the OpenEXR file-format specification
// (bitmap LUT + canonical Huffman + 2D integer wavelet), used by
// scene/exr.py to read the reference's .exr assets without OpenEXR/cv2
// (neither library exists in this image). Decodes one compressed chunk into
// the channel-planar uint16 buffer of half-float bit patterns.
// ---------------------------------------------------------------------------

namespace piz {

constexpr int USHORT_RANGE = 1 << 16;
constexpr int BITMAP_SIZE = USHORT_RANGE >> 3;
constexpr int HUF_ENCBITS = 16;
constexpr int HUF_DECBITS = 14;
constexpr int HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1;
constexpr int HUF_DECSIZE = 1 << HUF_DECBITS;
constexpr int HUF_DECMASK = HUF_DECSIZE - 1;
constexpr int SHORT_ZEROCODE_RUN = 59;
constexpr int LONG_ZEROCODE_RUN = 63;
constexpr int SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN;

struct HufDec {
  int len = 0;
  int lit = 0;
  std::vector<int> p;
};

struct BitReader {
  const uint8_t* in;
  const uint8_t* end;
  uint64_t c = 0;
  int lc = 0;
  bool ok = true;

  BitReader(const uint8_t* i, const uint8_t* e) : in(i), end(e) {}

  int read_bits(int nBits) {
    while (lc < nBits) {
      if (in >= end) { ok = false; return 0; }
      c = (c << 8) | *in++;
      lc += 8;
    }
    lc -= nBits;
    return static_cast<int>((c >> lc) & ((1 << nBits) - 1));
  }
};

// Unpack the 6-bit-per-symbol code-length table with zero-run extension.
static bool huf_unpack_enc_table(const uint8_t*& ptr, const uint8_t* end,
                                 int im, int iM,
                                 std::vector<uint64_t>& hcode) {
  BitReader br(ptr, end);
  for (; im <= iM; im++) {
    uint64_t l = br.read_bits(6);
    if (!br.ok) return false;
    hcode[im] = l;
    if (l == LONG_ZEROCODE_RUN) {
      int zerun = br.read_bits(8) + SHORTEST_LONG_RUN;
      if (!br.ok || im + zerun > iM + 1) return false;
      while (zerun--) hcode[im++] = 0;
      im--;
    } else if (l >= SHORT_ZEROCODE_RUN) {
      int zerun = static_cast<int>(l) - SHORT_ZEROCODE_RUN + 2;
      if (im + zerun > iM + 1) return false;
      while (zerun--) hcode[im++] = 0;
      im--;
    }
  }
  // Consumed whole bytes only: advance past the bits we used.
  ptr = br.in;
  // Note: a partially consumed byte (br.lc > 0) stays consumed — the packed
  // table is byte-terminated in the stream, and hufUncompress resumes at
  // the next byte boundary (matches OpenEXR, which tracks a byte pointer).
  return true;
}

// Build canonical codes from code lengths (in-place: hcode[i] ends up as
// code << 6 | length).
static void huf_canonical_codes(std::vector<uint64_t>& hcode) {
  uint64_t n[59] = {0};
  for (int i = 0; i < HUF_ENCSIZE; ++i) n[hcode[i]] += 1;
  uint64_t c = 0;
  for (int i = 58; i > 0; --i) {
    uint64_t nc = (c + n[i]) >> 1;
    n[i] = c;
    c = nc;
  }
  for (int i = 0; i < HUF_ENCSIZE; ++i) {
    uint64_t l = hcode[i];
    if (l) hcode[i] = l | (n[l]++ << 6);
  }
}

static bool huf_build_dec_table(const std::vector<uint64_t>& hcode, int im,
                                int iM, std::vector<HufDec>& hdecod) {
  for (; im <= iM; im++) {
    uint64_t c = hcode[im] >> 6;
    int l = static_cast<int>(hcode[im] & 63);
    if ((c >> l) != 0) return false;
    if (l > HUF_DECBITS) {
      HufDec& pl = hdecod[c >> (l - HUF_DECBITS)];
      if (pl.len) return false;
      pl.lit++;
      pl.p.push_back(im);
    } else if (l) {
      HufDec* pl = &hdecod[c << (HUF_DECBITS - l)];
      for (uint64_t i = 1ull << (HUF_DECBITS - l); i > 0; i--, pl++) {
        if (pl->len || !pl->p.empty()) return false;
        pl->len = l;
        pl->lit = im;
      }
    }
  }
  return true;
}

static bool huf_decode(const std::vector<uint64_t>& hcode,
                       const std::vector<HufDec>& hdecod, const uint8_t* in,
                       int64_t ni /* bits */, int rlc, int64_t no,
                       uint16_t* out) {
  uint64_t c = 0;
  int lc = 0;
  const uint8_t* ie = in + (ni + 7) / 8;
  uint16_t* outb = out;
  uint16_t* oe = out + no;

  auto get_char = [&]() {
    c = (c << 8) | *in++;
    lc += 8;
  };
  auto get_code = [&](int po) -> bool {
    if (po == rlc) {
      if (lc < 8) {
        if (in >= ie) return false;
        get_char();
      }
      lc -= 8;
      int cs = static_cast<int>((c >> lc) & 0xff);
      if (out + cs > oe || out == outb) return false;
      uint16_t s = out[-1];
      while (cs-- > 0) *out++ = s;
    } else {
      if (out >= oe) return false;
      *out++ = static_cast<uint16_t>(po);
    }
    return true;
  };

  while (in < ie) {
    get_char();
    while (lc >= HUF_DECBITS) {
      const HufDec& pl = hdecod[(c >> (lc - HUF_DECBITS)) & HUF_DECMASK];
      if (pl.len) {
        lc -= pl.len;
        if (!get_code(pl.lit)) return false;
      } else {
        if (pl.p.empty()) return false;
        int j;
        for (j = 0; j < pl.lit; j++) {
          int sym = pl.p[j];
          int l = static_cast<int>(hcode[sym] & 63);
          while (lc < l && in < ie) get_char();
          if (lc >= l &&
              (hcode[sym] >> 6) == ((c >> (lc - l)) & ((1ull << l) - 1))) {
            lc -= l;
            if (!get_code(sym)) return false;
            break;
          }
        }
        if (j == pl.lit) return false;
      }
    }
  }

  // Flush: the encoder wrote ni bits; drop the padding of the last byte.
  int i = (8 - static_cast<int>(ni)) & 7;
  c >>= i;
  lc -= i;
  while (lc > 0) {
    const HufDec& pl = hdecod[(c << (HUF_DECBITS - lc)) & HUF_DECMASK];
    if (pl.len) {
      lc -= pl.len;
      if (!get_code(pl.lit)) return false;
    } else {
      return false;
    }
  }
  return out == oe;
}

static bool huf_uncompress(const uint8_t* in, int64_t n_in, uint16_t* out,
                           int64_t n_out) {
  if (n_in < 20) return n_out == 0;
  auto rd_u32 = [&](int64_t o) {
    return static_cast<uint32_t>(in[o]) | (static_cast<uint32_t>(in[o + 1]) << 8) |
           (static_cast<uint32_t>(in[o + 2]) << 16) |
           (static_cast<uint32_t>(in[o + 3]) << 24);
  };
  int im = static_cast<int>(rd_u32(0));
  int iM = static_cast<int>(rd_u32(4));
  int64_t nBits = rd_u32(12);
  if (im < 0 || im >= HUF_ENCSIZE || iM < 0 || iM >= HUF_ENCSIZE)
    return false;
  const uint8_t* ptr = in + 20;
  const uint8_t* end = in + n_in;
  std::vector<uint64_t> hcode(HUF_ENCSIZE, 0);
  if (!huf_unpack_enc_table(ptr, end, im, iM, hcode)) return false;
  huf_canonical_codes(hcode);
  if (nBits > 8 * (end - ptr)) return false;
  std::vector<HufDec> hdecod(HUF_DECSIZE);
  if (!huf_build_dec_table(hcode, im, iM, hdecod)) return false;
  return huf_decode(hcode, hdecod, ptr, nBits, iM, n_out, out);
}

// --- 2D integer wavelet (14-bit and 16-bit-modulo variants) ---------------

constexpr int NBITS = 16;
constexpr int A_OFFSET = 1 << (NBITS - 1);
constexpr int MOD_MASK = (1 << NBITS) - 1;

static inline void wdec14(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  int16_t ls = static_cast<int16_t>(l);
  int16_t hs = static_cast<int16_t>(h);
  int hi = hs;
  int ai = ls + (hi & 1) + (hi >> 1);
  int16_t as = static_cast<int16_t>(ai);
  int16_t bs = static_cast<int16_t>(ai - hi);
  a = static_cast<uint16_t>(as);
  b = static_cast<uint16_t>(bs);
}

static inline void wdec16(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  int m = l;
  int d = h;
  int bb = (m - (d >> 1)) & MOD_MASK;
  int aa = (d + bb - A_OFFSET) & MOD_MASK;
  b = static_cast<uint16_t>(bb);
  a = static_cast<uint16_t>(aa);
}

static void wav2_decode(uint16_t* in, int nx, int ox, int ny, int oy,
                        uint16_t mx) {
  bool w14 = (mx < (1 << 14));
  int n = (nx > ny) ? ny : nx;
  int p = 1;
  int p2;
  while (p <= n) p <<= 1;
  p >>= 1;
  p2 = p;
  p >>= 1;

  while (p >= 1) {
    uint16_t* py = in;
    uint16_t* ey = in + oy * (ny - p2);
    int oy1 = oy * p;
    int oy2 = oy * p2;
    int ox1 = ox * p;
    int ox2 = ox * p2;
    uint16_t i00, i01, i10, i11;

    for (; py <= ey; py += oy2) {
      uint16_t* px = py;
      uint16_t* ex = py + ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        uint16_t* p10 = px + oy1;
        uint16_t* p11 = p10 + ox1;
        if (w14) {
          wdec14(*px, *p10, i00, i10);
          wdec14(*p01, *p11, i01, i11);
          wdec14(i00, i01, *px, *p01);
          wdec14(i10, i11, *p10, *p11);
        } else {
          wdec16(*px, *p10, i00, i10);
          wdec16(*p01, *p11, i01, i11);
          wdec16(i00, i01, *px, *p01);
          wdec16(i10, i11, *p10, *p11);
        }
      }
      if (nx & p) {
        uint16_t* p10 = px + oy1;
        if (w14)
          wdec14(*px, *p10, i00, *p10);
        else
          wdec16(*px, *p10, i00, *p10);
        *px = i00;
      }
    }

    if (ny & p) {
      uint16_t* px = py;
      uint16_t* ex = py + ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        if (w14)
          wdec14(*px, *p01, i00, *p01);
        else
          wdec16(*px, *p01, i00, *p01);
        *px = i00;
      }
    }

    p2 = p;
    p >>= 1;
  }
}

}  // namespace piz

extern "C" {

// Decode one PIZ-compressed scanline chunk.
//   in/in_len: the raw compressed chunk payload.
//   out/out_len: planar uint16 output (channels in file order; per channel
//     ny[i] rows of nx[i] values — half bit patterns for HALF channels).
// Returns 0 on success, a negative error code otherwise.
int32_t r3dg_piz_decode(const uint8_t* in, int64_t in_len, uint16_t* out,
                        int64_t out_len, const int32_t* nx,
                        const int32_t* ny, int32_t n_channels) {
  using namespace piz;
  int64_t expected = 0;
  for (int32_t i = 0; i < n_channels; ++i)
    expected += static_cast<int64_t>(nx[i]) * ny[i];
  if (expected != out_len) return -1;
  if (in_len < 4) return -2;

  auto rd_u16 = [&](int64_t o) {
    return static_cast<uint16_t>(in[o] | (in[o + 1] << 8));
  };
  uint16_t min_nz = rd_u16(0);
  uint16_t max_nz = rd_u16(2);
  if (max_nz >= BITMAP_SIZE) return -3;
  int64_t pos = 4;

  std::vector<uint8_t> bitmap(BITMAP_SIZE, 0);
  if (min_nz <= max_nz) {
    int64_t nbytes = max_nz - min_nz + 1;
    if (pos + nbytes > in_len) return -4;
    std::memcpy(bitmap.data() + min_nz, in + pos, nbytes);
    pos += nbytes;
  }

  // reverse LUT: k-th present value (0 always present)
  std::vector<uint16_t> lut(USHORT_RANGE, 0);
  int k = 0;
  for (int i = 0; i < USHORT_RANGE; ++i)
    if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7))))
      lut[k++] = static_cast<uint16_t>(i);
  uint16_t max_value = static_cast<uint16_t>(k - 1);

  if (pos + 4 > in_len) return -5;
  int64_t huf_len = static_cast<uint32_t>(in[pos]) |
                    (static_cast<uint32_t>(in[pos + 1]) << 8) |
                    (static_cast<uint32_t>(in[pos + 2]) << 16) |
                    (static_cast<uint32_t>(in[pos + 3]) << 24);
  pos += 4;
  if (pos + huf_len > in_len) return -6;

  if (!huf_uncompress(in + pos, huf_len, out, out_len)) return -7;

  int64_t off = 0;
  for (int32_t i = 0; i < n_channels; ++i) {
    wav2_decode(out + off, nx[i], 1, ny[i], nx[i], max_value);
    off += static_cast<int64_t>(nx[i]) * ny[i];
  }
  for (int64_t i = 0; i < out_len; ++i) out[i] = lut[out[i]];
  return 0;
}

// version tag for cache invalidation
int32_t r3dg_native_version() { return 2; }

}  // extern "C"

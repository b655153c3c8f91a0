// Native bit-packing library: the host-side hot loop of checkpoint packing.
//
// The reference packs weights with a per-row Python loop over torch tensors
// (reference: quant/quant_linear.py:342-371), which is the slowest stage of
// its pipeline ("pack" phase). This library provides cache-friendly,
// OpenMP-parallel pack/unpack for the same wire format:
//   - 2/4/8-bit: little-endian fields along the K (row) axis, 32/bits per word
//   - 3-bit: the standard GPTQ 32-values-per-3-words scheme (values 10 and 21
//     straddle word boundaries) — see quant/packing.py for the bit layout
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// codes: (K, N) uint32 row-major; out: (K*bits/32, N) uint32 row-major.
void pack_rows(const uint32_t* codes, uint32_t* out, int64_t k, int64_t n,
               int bits) {
  const int64_t ipw = 32 / bits;          // integers per word (2/4/8-bit)
  if (bits == 3) {
    const int64_t blocks = k / 32;        // 32 values -> 3 words
#pragma omp parallel for
    for (int64_t b = 0; b < blocks; ++b) {
      const uint32_t* src = codes + b * 32 * n;
      uint32_t* dst = out + b * 3 * n;
      for (int64_t col = 0; col < n; ++col) {
        uint32_t w0 = 0, w1 = 0, w2 = 0;
        // mask to 3 bits first: out-of-range codes must not smear neighbors
        auto c3 = [&](int j) { return src[j * n + col] & 0x7u; };
        for (int j = 0; j < 10; ++j) w0 |= c3(j) << (3 * j);
        w0 |= (c3(10) & 0x3u) << 30;
        w1 = c3(10) >> 2;
        for (int j = 0; j < 10; ++j) w1 |= c3(11 + j) << (3 * j + 1);
        w1 |= (c3(21) & 0x1u) << 31;
        w2 = c3(21) >> 1;
        for (int j = 0; j < 10; ++j) w2 |= c3(22 + j) << (3 * j + 2);
        dst[col] = w0;
        dst[n + col] = w1;
        dst[2 * n + col] = w2;
      }
    }
    return;
  }
  const uint32_t mask = (bits == 32) ? 0xffffffffu : ((1u << bits) - 1u);
  const int64_t words = k / ipw;
#pragma omp parallel for
  for (int64_t w = 0; w < words; ++w) {
    const uint32_t* src = codes + w * ipw * n;
    uint32_t* dst = out + w * n;
    for (int64_t col = 0; col < n; ++col) {
      uint32_t acc = 0;
      for (int64_t j = 0; j < ipw; ++j)
        acc |= (src[j * n + col] & mask) << (bits * j);
      dst[col] = acc;
    }
  }
}

// packed: (K*bits/32, N) uint32; out: (K, N) uint32.
void unpack_rows(const uint32_t* packed, uint32_t* out, int64_t k, int64_t n,
                 int bits) {
  const int64_t ipw = 32 / bits;
  if (bits == 3) {
    const int64_t blocks = k / 32;
#pragma omp parallel for
    for (int64_t b = 0; b < blocks; ++b) {
      const uint32_t* src = packed + b * 3 * n;
      uint32_t* dst = out + b * 32 * n;
      for (int64_t col = 0; col < n; ++col) {
        const uint32_t w0 = src[col], w1 = src[n + col], w2 = src[2 * n + col];
        for (int j = 0; j < 10; ++j) dst[j * n + col] = (w0 >> (3 * j)) & 0x7u;
        dst[10 * n + col] = ((w0 >> 30) & 0x3u) | ((w1 & 0x1u) << 2);
        for (int j = 0; j < 10; ++j)
          dst[(11 + j) * n + col] = (w1 >> (3 * j + 1)) & 0x7u;
        dst[21 * n + col] = ((w1 >> 31) & 0x1u) | ((w2 & 0x3u) << 1);
        for (int j = 0; j < 10; ++j)
          dst[(22 + j) * n + col] = (w2 >> (3 * j + 2)) & 0x7u;
      }
    }
    return;
  }
  const uint32_t mask = (1u << bits) - 1u;
  const int64_t words = k / ipw;
#pragma omp parallel for
  for (int64_t w = 0; w < words; ++w) {
    const uint32_t* src = packed + w * n;
    uint32_t* dst = out + w * ipw * n;
    for (int64_t col = 0; col < n; ++col) {
      const uint32_t word = src[col];
      for (int64_t j = 0; j < ipw; ++j)
        dst[j * n + col] = (word >> (bits * j)) & mask;
    }
  }
}

// Quantize a float weight to integer codes: codes = rint(w / s + z).
// Semantics match quant/packing.py quantize_weight_to_codes EXACTLY: the
// arithmetic is double precision, rint is round-half-to-even (the default FP
// rounding mode, same as np.rint / torch.round), and there is NO clamp —
// out-of-range values wrap through the uint32 cast exactly like numpy's
// astype chain (the zero==0 wrap is load-bearing for reference wire parity).
// w: (N, K) row-major (out-features x in-features, torch layout);
// scales/zeros: (N, G); g_idx: (K,); out codes: (K, N) (wire layout).
void quantize_to_codes(const float* w, const float* scales, const float* zeros,
                       const int32_t* g_idx, uint32_t* out, int64_t n_rows,
                       int64_t k, int64_t g) {
#pragma omp parallel for
  for (int64_t kk = 0; kk < k; ++kk) {
    const int32_t grp = g_idx[kk];
    for (int64_t row = 0; row < n_rows; ++row) {
      const double s = (double)scales[row * g + grp];
      const double z = (double)zeros[row * g + grp];
      const double q = (double)w[row * k + kk] / s + z;
      const int64_t r = (int64_t)std::rint(q);
      out[kk * n_rows + row] = (uint32_t)r;
    }
  }
}

// Gather rows of a bit-packed matrix WITHOUT materializing unpacked codes:
// out codes row r = in codes row perm[r], word-level (one pass, no 32/bits-x
// inflated intermediate). Covers the checkpoint-load device-layout transform
// (to/from_tpu_layout's per-group interleave) and act-order group-sorting —
// the CPU bottleneck of loading a multi-GB packed checkpoint.
// in/out: (K*bits/32, N) uint32 row-major; perm: (K,) with values in [0, K).
// 2/4/8-bit only (3-bit straddles words; python path handles it).
void gather_rows_packed(const uint32_t* in, uint32_t* out, const int32_t* perm,
                        int64_t k, int64_t n, int bits) {
  const int64_t ipw = 32 / bits;
  const uint32_t mask = (1u << bits) - 1u;
  const int64_t words = k / ipw;
#pragma omp parallel for
  for (int64_t w = 0; w < words; ++w) {
    uint32_t* dst = out + w * n;
    const int32_t* p = perm + w * ipw;
    std::memset(dst, 0, (size_t)n * sizeof(uint32_t));
    for (int64_t j = 0; j < ipw; ++j) {
      const int64_t r = (int64_t)p[j];
      const uint32_t* src = in + (r / ipw) * n;
      const int is = (int)(r % ipw) * bits;
      const int os = (int)j * bits;
      for (int64_t col = 0; col < n; ++col)
        dst[col] |= ((src[col] >> is) & mask) << os;
    }
  }
}

int packlib_version() { return 3; }

}  // extern "C"

"""Bit-packing of quantized integer weights into int32 words.

Wire format is byte-compatible with the reference QuantLinear buffers
(reference: quant/quant_linear.py:316-371):

- ``qweight``  int32, shape (K // 32 * bits, N): integer codes packed along the
  contraction (in-features) axis, little-endian within each 32-bit word.
- ``qzeros``   int32, shape (G, N // 32 * bits): per-group zero-points MINUS ONE
  (the reference's ``zeros -= 1`` offset, quant_linear.py:356) packed along the
  out-features axis. Consumers add the 1 back (quant_linear.py:121).
- ``scales``   fp16/fp32, shape (G, N).
- ``g_idx``    int32, shape (K,): group index per in-feature row.

The reference triton branch supports 2/4/8 bits only (quant_linear.py:308-309); this
module adds the standard GPTQ 3-bit scheme (32 values -> 3 words: 10 values per word
with values 10 and 21 straddling word boundaries) so INT3 checkpoints work too.

Packing here is fully vectorized numpy (the reference loops per row in Python,
quant_linear.py:342-371) plus jnp equivalents for on-device unpacking.

Note on the zero==0 edge: the reference stores ``zero - 1`` in uint32 so an asymmetric
zero-point of 0 wraps and dequantizes as ``maxq + 1``; we reproduce that dequant value
for the wrapped slot. One DELIBERATE divergence: the reference's unmasked OR also smears
the wrap's high bits into neighboring slots of the same word, corrupting up to 10 other
channels' zero-points — we mask every code to its bit width, so only the wrapped slot is
affected. Byte parity holds whenever no zero-point is 0 (production quantization uses
wire_safe zero clamping, and the reference itself produces zero==0 only for
all-non-negative rows).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SUPPORTED_BITS = (1, 2, 3, 4, 8)  # 1-bit is internal (3-bit plane split)


def _check_bits(bits: int) -> None:
    if bits not in SUPPORTED_BITS:
        raise NotImplementedError(f"Only {SUPPORTED_BITS} bits are supported, got {bits}.")


# ---------------------------------------------------------------------------
# numpy (host-side) pack/unpack along axis 0
# ---------------------------------------------------------------------------

def pack_rows(codes: np.ndarray, bits: int) -> np.ndarray:
    """Pack integer codes (K, N) -> int32 (K*bits//32, N) along axis 0."""
    _check_bits(bits)
    codes = np.ascontiguousarray(codes).astype(np.uint32)
    k = codes.shape[0]
    if (k % 32 == 0 if bits == 3 else k % (32 // bits) == 0):
        from .. import native  # C++ fast path (native/packlib.cpp)
        out = native.pack_rows(codes, bits)
        if out is not None:
            return out
    if bits == 3:
        if k % 32 != 0:
            raise ValueError(f"3-bit packing needs K % 32 == 0, got {k}")
        # mask each code to 3 bits FIRST — an out-of-range code (e.g. the
        # zeros-1 uint wrap) must corrupt only its own slot, not smear ones
        # across up to 10 neighbors in the word
        v = codes.reshape(-1, 32, *codes.shape[1:]) & 0x7
        w0 = np.zeros_like(v[:, 0])
        for j in range(10):
            w0 |= v[:, j] << (3 * j)
        w0 |= (v[:, 10] & 0x3) << 30
        w1 = v[:, 10] >> 2
        for j in range(10):
            w1 |= v[:, 11 + j] << (3 * j + 1)
        w1 |= (v[:, 21] & 0x1) << 31
        w2 = v[:, 21] >> 1
        for j in range(10):
            w2 |= v[:, 22 + j] << (3 * j + 2)
        out = np.stack([w0, w1, w2], axis=1).reshape(-1, *codes.shape[1:])
    else:
        ipw = 32 // bits  # integers per word
        if k % ipw != 0:
            raise ValueError(f"{bits}-bit packing needs K % {ipw} == 0, got {k}")
        v = codes.reshape(-1, ipw, *codes.shape[1:])
        out = np.zeros_like(v[:, 0])
        for j in range(ipw):
            out |= (v[:, j] & ((1 << bits) - 1)) << (bits * j)
    return out.astype(np.int32)


def unpack_rows(packed: np.ndarray, bits: int, k: int | None = None) -> np.ndarray:
    """Unpack int32 (K*bits//32, N) -> int32 codes (K, N) along axis 0."""
    _check_bits(bits)
    kfull = packed.shape[0] * 32 // bits
    from .. import native  # C++ fast path (native/packlib.cpp)
    out = native.unpack_rows(packed, bits, kfull)
    if out is not None:
        return out[:k] if k is not None else out
    w = np.ascontiguousarray(packed).view(np.uint32) if packed.dtype == np.int32 else packed.astype(np.uint32)
    if bits == 3:
        c = w.reshape(-1, 3, *w.shape[1:])
        w0, w1, w2 = c[:, 0], c[:, 1], c[:, 2]
        vals = []
        for j in range(10):
            vals.append((w0 >> (3 * j)) & 0x7)
        vals.append(((w0 >> 30) & 0x3) | ((w1 & 0x1) << 2))
        for j in range(10):
            vals.append((w1 >> (3 * j + 1)) & 0x7)
        vals.append(((w1 >> 31) & 0x1) | ((w2 & 0x3) << 1))
        for j in range(10):
            vals.append((w2 >> (3 * j + 2)) & 0x7)
        out = np.stack(vals, axis=1).reshape(-1, *w.shape[1:])
    else:
        ipw = 32 // bits
        maxq = (1 << bits) - 1
        vals = [(w >> (bits * j)) & maxq for j in range(ipw)]
        out = np.stack(vals, axis=1).reshape(-1, *w.shape[1:])
    if k is not None:
        out = out[:k]
    return out.astype(np.int32)


def pack_cols(codes: np.ndarray, bits: int) -> np.ndarray:
    """Pack integer codes (G, N) -> int32 (G, N*bits//32) along the last axis.

    Used for qzeros (reference: quant_linear.py:358-368)."""
    return np.ascontiguousarray(np.swapaxes(pack_rows(np.swapaxes(codes, 0, -1), bits), 0, -1))


def unpack_cols(packed: np.ndarray, bits: int, n: int | None = None) -> np.ndarray:
    """Unpack int32 (G, N*bits//32) -> codes (G, N) along the last axis."""
    return np.ascontiguousarray(np.swapaxes(unpack_rows(np.swapaxes(packed, 0, -1), bits, k=n), 0, -1))


# ---------------------------------------------------------------------------
# jnp (device-side) unpack — used by the XLA fallback path and tests
# ---------------------------------------------------------------------------

def unpack_rows_jnp(packed, bits: int, k: int | None = None):
    """jnp version of unpack_rows: int32 (K*bits//32, N) -> int32 (K, N)."""
    _check_bits(bits)
    w = packed.astype(jnp.uint32)
    if bits == 3:
        c = w.reshape(-1, 3, *w.shape[1:])
        w0, w1, w2 = c[:, 0], c[:, 1], c[:, 2]
        vals = [(w0 >> (3 * j)) & 0x7 for j in range(10)]
        vals.append(((w0 >> 30) & 0x3) | ((w1 & 0x1) << 2))
        vals += [(w1 >> (3 * j + 1)) & 0x7 for j in range(10)]
        vals.append(((w1 >> 31) & 0x1) | ((w2 & 0x3) << 1))
        vals += [(w2 >> (3 * j + 2)) & 0x7 for j in range(10)]
        out = jnp.stack(vals, axis=1).reshape(-1, *w.shape[1:])
    else:
        ipw = 32 // bits
        maxq = (1 << bits) - 1
        vals = [(w >> (bits * j)) & maxq for j in range(ipw)]
        out = jnp.stack(vals, axis=1).reshape(-1, *w.shape[1:])
    if k is not None:
        out = out[:k]
    return out.astype(jnp.int32)


def unpack_cols_jnp(packed, bits: int, n: int | None = None):
    """jnp version of unpack_cols: int32 (G, N*bits//32) -> int32 (G, N)."""
    out = unpack_rows_jnp(jnp.swapaxes(packed, 0, -1), bits, k=n)
    return jnp.swapaxes(out, 0, -1)


# ---------------------------------------------------------------------------
# TPU device layout: group-local nibble interleave
# ---------------------------------------------------------------------------
#
# Kernel-side unpack of the wire layout needs a cross-sublane interleave
# (stack(axis=1).reshape) which Mosaic executes ~6x slower than plain block
# concatenation. The TPU layout reorders rows WITHIN each group so that word w
# of a group packs rows {j*wpg + w : j in 0..ipw-1} (wpg = groupsize/ipw);
# unpacking by [(word >> bits*j) & maxq for j] + concat(axis=0) then yields the
# group's rows in their original order — no interleave, no activation perm.


def gather_rows_packed(packed: np.ndarray, perm: np.ndarray,
                       bits: int) -> np.ndarray:
    """codes[perm] WITHOUT unpacking: out code-row r = in code-row perm[r].

    The word-level gather behind every packed-layout transform (group
    interleave, act-order sort, and their inverses). C++ one-pass fast path
    (native/packlib.cpp gather_rows_packed — ~15x over unpack/index/repack,
    the CPU bottleneck of loading multi-GB checkpoints); numpy fallback.

    perm must be FULL-LENGTH (a permutation of all K code rows): the numpy
    fallback and the C++ path disagree on partial selections (truncation vs
    uninitialized tail), so reject them up front.
    """
    perm = np.asarray(perm, np.int32)
    k = perm.shape[0]
    if k * bits != np.asarray(packed).shape[0] * 32:
        raise ValueError(
            f"gather_rows_packed needs a full-length permutation: perm has "
            f"{k} rows, packed holds {np.asarray(packed).shape[0] * 32 // bits}")
    if bits != 3 and k % (32 // bits) == 0:
        from .. import native
        out = native.gather_rows_packed(packed, perm, bits)
        if out is not None:
            return out
    return pack_rows(unpack_rows(packed, bits, k=k)[perm].astype(np.uint32),
                     bits)


def _tpu_perm(groupsize: int, bits: int) -> np.ndarray:
    """Row permutation within one group: packed_row[i] = orig_row[perm[i]]."""
    ipw = 32 // bits
    wpg = groupsize // ipw
    i = np.arange(groupsize)
    return (i % ipw) * wpg + (i // ipw)


def tpu_layout_supported(k: int, bits: int, groupsize: int) -> bool:
    if groupsize <= 0 or k % groupsize != 0:
        return False
    if bits == 3:
        # bit-plane split (2-bit + 1-bit planes) needs whole words per group
        return groupsize % 32 == 0
    return bits in (2, 4, 8) and groupsize % (32 // bits) == 0


def _codes_to_tpu3(codes: np.ndarray, groupsize: int) -> np.ndarray:
    """3-bit codes (K, N) -> bit-plane TPU layout (K*3/32, N).

    Per group: [2-bit plane, gs/16 words (interleaved ipw=16)] then
    [1-bit plane, gs/32 words (interleaved ipw=32)] — in-kernel unpack is two
    shift/mask+concat passes plus one combine (code = lo | hi << 2)."""
    k, n = codes.shape
    g = k // groupsize
    lo = (codes & 3).astype(np.uint32).reshape(g, groupsize, n)
    hi = (codes >> 2).astype(np.uint32).reshape(g, groupsize, n)
    p2, p1 = _tpu_perm(groupsize, 2), _tpu_perm(groupsize, 1)
    parts = []
    for gi in range(g):
        parts.append(pack_rows(lo[gi][p2], 2))
        parts.append(pack_rows(hi[gi][p1], 1))
    return np.concatenate(parts, axis=0)


def _codes_from_tpu3(packed: np.ndarray, groupsize: int) -> np.ndarray:
    """Inverse of _codes_to_tpu3 -> 3-bit codes (K, N)."""
    spg = 3 * groupsize // 32  # rows per group (lo gs/16 + hi gs/32)
    wlo = groupsize // 16
    g = packed.shape[0] // spg
    n = packed.shape[1]
    inv2 = np.argsort(_tpu_perm(groupsize, 2))
    inv1 = np.argsort(_tpu_perm(groupsize, 1))
    out = np.empty((g, groupsize, n), dtype=np.int32)
    for gi in range(g):
        blk = packed[gi * spg:(gi + 1) * spg]
        lo = unpack_rows(blk[:wlo], 2)[inv2]
        hi = unpack_rows(blk[wlo:], 1)[inv1]
        out[gi] = lo | (hi << 2)
    return out.reshape(g * groupsize, n)


def _tiled_perm(perm: np.ndarray, k: int, groupsize: int) -> np.ndarray:
    """Per-group row permutation -> full-K code-row permutation."""
    g = k // groupsize
    return (np.arange(g, dtype=np.int64)[:, None] * groupsize
            + perm[None, :]).reshape(-1).astype(np.int32)


def to_tpu_layout(qweight: np.ndarray, bits: int, groupsize: int,
                  pre_perm: np.ndarray | None = None) -> np.ndarray:
    """Wire-packed (K*bits/32, N) -> TPU-layout packed, same shape.

    pre_perm: optional code-row permutation applied BEFORE the interleave
    (out = interleave(qweight[pre_perm])) — lets the act-order group sort
    ride the same single gather pass instead of paying two."""
    k = qweight.shape[0] * 32 // bits
    if bits == 3:
        codes = unpack_rows(qweight, bits, k=k)
        if pre_perm is not None:
            codes = codes[pre_perm]
        return _codes_to_tpu3(codes, groupsize)
    perm = _tiled_perm(_tpu_perm(groupsize, bits), k, groupsize)
    if pre_perm is not None:
        perm = np.asarray(pre_perm, np.int32)[perm]
    return gather_rows_packed(qweight, perm, bits)


def from_tpu_layout(qweight: np.ndarray, bits: int, groupsize: int) -> np.ndarray:
    """TPU-layout packed -> wire-packed (inverse of to_tpu_layout)."""
    if bits == 3:
        return pack_rows(_codes_from_tpu3(qweight, groupsize).astype(np.uint32), 3)
    k = qweight.shape[0] * 32 // bits
    inv = np.argsort(_tpu_perm(groupsize, bits))
    return gather_rows_packed(qweight, _tiled_perm(inv, k, groupsize), bits)


def unpack_rows_tpu_jnp(packed, bits: int, groupsize: int):
    """jnp unpack of the TPU layout -> (K, N) codes in original row order."""
    kw, n = packed.shape
    if bits == 3:
        spg = 3 * groupsize // 32
        wlo = groupsize // 16
        g = kw // spg
        blk = packed.astype(jnp.uint32).reshape(g, spg, n)
        lo_w, hi_w = blk[:, :wlo], blk[:, wlo:]
        lo = jnp.concatenate([(lo_w >> (2 * j)) & 3 for j in range(16)], axis=1)
        hi = jnp.concatenate([(hi_w >> j) & 1 for j in range(32)], axis=1)
        out = lo | (hi << 2)
        return out.reshape(g * groupsize, n).astype(jnp.int32)
    ipw = 32 // bits
    maxq = (1 << bits) - 1
    wpg = groupsize // ipw
    g = kw // wpg
    w = packed.astype(jnp.uint32).reshape(g, wpg, n)
    vals = [(w >> (bits * j)) & maxq for j in range(ipw)]  # each (g, wpg, n)
    out = jnp.concatenate(vals, axis=1)  # (g, groupsize, n) rows in order
    return out.reshape(g * groupsize, n).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Full-tensor pack / dequantize
# ---------------------------------------------------------------------------

def quantize_weight_to_codes(w: np.ndarray, scales: np.ndarray, zeros: np.ndarray,
                             g_idx: np.ndarray) -> np.ndarray:
    """Recover integer codes from a (fake-quantized) weight.

    w: (N, K) float (out, in) — torch layout, as produced by the GPTQ solver.
    scales/zeros: (N, G) per-out-channel per-group. g_idx: (K,).
    Returns codes (K, N) int — codes = round(w / scale + zero)
    (reference: quant_linear.py:335-339 computes round((w + scale*zero)/scale)).
    """
    exact32 = all(np.asarray(a).dtype in (np.float32, np.float16)
                  for a in (w, scales, zeros))
    if exact32:  # C++ fast path computes the same double-precision rint
        from .. import native  # (native/packlib.cpp quantize_to_codes)
        out = native.quantize_to_codes(w, scales, zeros, g_idx)
        if out is not None:
            return out
    w = w.astype(np.float64)
    s = scales.astype(np.float64)[:, g_idx]  # (N, K)
    z = zeros.astype(np.float64)[:, g_idx]
    codes = np.rint(w / s + z).astype(np.int64)
    return codes.T.astype(np.int32)  # (K, N)


def pack_quantized(w: np.ndarray, scales: np.ndarray, zeros: np.ndarray,
                   g_idx: np.ndarray, bits: int) -> dict:
    """Produce the packed buffer dict for one linear layer.

    w (N, K) fake-quantized float weight; scales/zeros (N, G); g_idx (K,).
    Returns {'qweight','qzeros','scales','g_idx'} in the reference wire format
    (scales transposed to (G, N), qzeros offset by -1: quant_linear.py:328-371).
    """
    codes = quantize_weight_to_codes(w, scales, zeros, g_idx)  # (K, N)
    qweight = pack_rows(codes, bits)
    z = np.rint(zeros.T.astype(np.float64)).astype(np.int64)  # (G, N)
    qzeros = pack_cols((z - 1).astype(np.uint32), bits)  # uint wrap reproduces reference
    return {
        "qweight": qweight,
        "qzeros": qzeros,
        "scales": scales.T.astype(np.float16),  # (G, N), fp16 like reference
        "g_idx": g_idx.astype(np.int32),
    }


def dequantize(qweight, qzeros, scales, g_idx, bits: int, dtype=jnp.float32):
    """Dequantize packed buffers to a dense (K, N) weight on device (jnp).

    Matches the kernel semantics (q - (z_packed + 1)) * scale with per-row group
    gather via g_idx (reference: quant_linear.py:113-128). This is the XLA
    fallback / oracle for the fused Pallas kernels.
    """
    k = g_idx.shape[0]
    codes = unpack_rows_jnp(qweight, bits, k=k)  # (K, N)
    n = codes.shape[1]
    zeros = unpack_cols_jnp(qzeros, bits, n=n) + 1  # (G, N)
    s = scales.astype(jnp.float32)[g_idx]  # (K, N)
    z = zeros[g_idx]
    return ((codes - z).astype(jnp.float32) * s).astype(dtype)

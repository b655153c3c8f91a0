"""Linear-layer abstractions: dense and bit-packed quantized linears.

The reference materializes quantized layers as nn.Modules swapped into a HF model
(reference: quant/quant_linear.py:304-390). The TPU-native design instead makes the
quantized tensor format a pytree node (`PackedLinear`) that lives directly inside the
model's parameter pytree; "module replacement" is just substituting leaves.

Act-order normalization: the reference kernel gathers per-row group ids on every
K-tile (quant_linear.py:114-118), which is expensive on TPU. `PackedLinear.from_wire`
instead re-orders the packed rows into group-sorted layout once at load time and
stores the input permutation; the matmul applies the (cheap, K-sized) activation
permutation and sees monotone groups (see SURVEY.md §7 hard-parts).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant import packing


class HostBuf:
    """Host-resident save-only buffer carried through pytree AUX data.

    Wraps a numpy array that compute never reads (e.g. the original
    fp16 wire scales kept for byte-exact to_wire). Living in aux rather
    than the children keeps it off the device (no HBM, no H2D per step)
    and out of every jitted step's argument tree, while surviving
    tree_map/device_put/shard_map untouched. Equality/hash are keyed on
    (shape, dtype) only: per-layer CONTENTS legitimately differ, and
    content-sensitive equality would break stack_layers (every layer's
    qzeros/scales_wire would make its treedef unique). The one trace-time
    decision that depends on contents — ops/pallas/mlp.supports_fused
    comparing gate/up g_idx — is covered by PackedLinear.perm_sig, a
    static aux digest that IS part of the treedef."""

    __slots__ = ("arr", "_digest")

    def __init__(self, arr):
        self.arr = np.asarray(arr)
        self._digest = None

    def digest(self) -> int:
        """Cached 64-bit content digest (used for PackedLinear.perm_sig)."""
        if self._digest is None:
            import hashlib
            h = hashlib.blake2b(np.ascontiguousarray(self.arr).tobytes(),
                                digest_size=8)
            self._digest = int.from_bytes(h.digest(), "little")
        return self._digest

    def __eq__(self, other):
        return (isinstance(other, HostBuf)
                and other.arr.shape == self.arr.shape
                and other.arr.dtype == self.arr.dtype)

    def __hash__(self):
        return hash((self.arr.shape, str(self.arr.dtype)))

    def __repr__(self):
        return f"HostBuf({self.arr.shape}, {self.arr.dtype})"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedLinear:
    """Quantized linear parameters in device layout.

    Device children (the jitted-step operands — everything compute reads):
    qweight: int32 (K*bits//32, N) — rows group-sorted (monotone groups).
    scales:  (G, N) fp16/fp32/bf16.
    zeros:   (G, N) float — the effective dequant zero (unpacked qzeros + 1),
             precomputed at load so kernels skip the column-unpack + offset
             (integer-valued <= 2^bits, exact even in bf16).
    perm:    int32 (K,) or None — input permutation applied to activations
             (x[..., perm]); None when g_idx was already monotone.
    bias:    (N,) or None.

    HOST-side aux (HostBuf — never on device, never sharded, never in a jit
    signature; kept only so to_wire/save round trips are byte-exact):
    qzeros:      int32 (G_unpadded, N*bits//32), stored zero-1 (reference
                 offset).
    g_idx:       int32 (K,) original wire-format group ids.
    scales_wire: fp16 (G_unpadded, N) original wire scales (the compute
                 `scales` dtype — bf16 — cannot represent fp16 exactly).
    All three may be None on shard-local TP params (not a save path).

    Static: bits, groupsize, in_features, out_features, layout.
    """

    qweight: jax.Array
    qzeros: Optional[HostBuf]
    scales: jax.Array
    zeros: jax.Array
    g_idx: Optional[HostBuf]
    perm: Optional[jax.Array]
    bias: Optional[jax.Array]
    bits: int
    groupsize: int
    in_features: int
    out_features: int
    # 'wire' = reference row-major nibble order; 'tpu' = group-local nibble
    # interleave so kernels unpack by concat (see quant/packing.py TPU layout)
    layout: str = "wire"
    scales_wire: Optional[HostBuf] = None
    # static digest of g_idx CONTENTS, set iff perm is not None (act-order).
    # Part of the treedef (aux), so trace-time decisions that compare gate/up
    # input permutations (ops/pallas/mlp.supports_fused) are derivable from
    # the jit cache key — two same-shape act-order models with different
    # permutations can never share a wrong compiled fusion decision.
    # None for non-act-order layers keeps same-shape layers treedef-equal;
    # act-order layers (unique per-layer sigs) are re-keyed to a shared
    # combined digest by runtime/runner._normalize_perm_sigs before stacking
    # so they still take the lax.scan path.
    perm_sig: Optional[int] = None
    # CHECKPOINT code width when it differs from the device width `bits`.
    # INT3 checkpoints load into the 4-bit nibble device layout by default
    # (round 5): the 3-bit bit-plane unpack needs ~4x the VPU vector ops of
    # the nibble path and the nibble path is already VPU-unpack-limited, so
    # pure 3-bit device storage measured 140-180 GB/s vs the nibble path's
    # 520-640 on v5e (bench_artifacts/r05/kbench_13b_int3*.json) — one extra
    # bit/weight of HBM buys ~3.5x decode speed. to_wire repacks at
    # wire_bits, keeping checkpoints byte-exact. GPTQ_TPU_INT3_PLANES=1
    # keeps the pure 3-bit device layout (capacity mode).
    wire_bits: Optional[int] = None

    def __post_init__(self):
        if (self.perm is not None and self.perm_sig is None
                and self.g_idx is not None):
            self.perm_sig = self.g_idx.digest()

    def tree_flatten(self):
        children = (self.qweight, self.scales, self.zeros, self.perm,
                    self.bias)
        aux = (self.bits, self.groupsize, self.in_features, self.out_features,
               self.layout, self.qzeros, self.g_idx, self.scales_wire,
               self.perm_sig, self.wire_bits)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        qweight, scales, zeros, perm, bias = children
        (bits, groupsize, in_features, out_features, layout,
         qzeros, g_idx, scales_wire, perm_sig, wire_bits) = aux
        return cls(qweight, qzeros, scales, zeros, g_idx, perm, bias,
                   bits, groupsize, in_features, out_features, layout,
                   scales_wire, perm_sig, wire_bits)

    @classmethod
    def from_wire(cls, qweight, qzeros, scales, g_idx, bits: int,
                  bias=None, dtype=jnp.bfloat16) -> "PackedLinear":
        """Build the device layout from reference wire-format numpy buffers."""
        qweight = np.asarray(qweight)
        qzeros = np.asarray(qzeros)
        scales = np.asarray(scales)
        g_idx = np.asarray(g_idx).astype(np.int32)
        k = g_idx.shape[0]
        n = scales.shape[1]
        num_groups = scales.shape[0]
        groupsize = -(-k // num_groups)

        perm = None
        if np.any(np.diff(g_idx) < 0):  # act-order checkpoint: group-sort rows
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)

        zeros = packing.unpack_cols(qzeros, bits, n=n).astype(np.float32) + 1.0
        # wire scales are fp16 by format; keep the exact buffer for to_wire
        # (the compute dtype below may be bf16, which cannot represent fp16)
        scales_wire = np.asarray(scales, np.float16)

        import os
        wire_bits = None
        if bits == 3 and os.environ.get("GPTQ_TPU_INT3_PLANES", "") != "1":
            # INT3 -> 4-bit nibble DEVICE layout (see wire_bits field doc):
            # the kernel then runs its cheap nibble unpack at 4-bit stream
            # rates instead of the VPU-bound bit-plane split. A load-time
            # transform only — to_wire repacks at 3 bits, byte-exact.
            codes = packing.unpack_rows(np.asarray(qweight), 3, k=k)
            qweight = packing.pack_rows(codes.astype(np.uint32), 4)
            wire_bits, bits = 3, 4

        layout = "wire"
        kp = k
        if packing.tpu_layout_supported(k, bits, groupsize):
            # pad K to a multiple of 8*groupsize so kernels always tile at
            # gpt=8 (static scale-row slices, no giant full-K unrolled loop)
            # when the inflation stays under 12.5%; otherwise keep K and let
            # the kernel use its full-K tile plan. Padded rows carry zero
            # codes and a dummy group (scale 1, zero 0); the kernel pads x
            # with zeros, so they contribute exactly nothing (dot-then-scale:
            # both p and sum(x) vanish on the pad).
            cand = -(-k // (8 * groupsize)) * (8 * groupsize)
            if (k // groupsize) % 8 != 0 and (cand - k) * 8 <= k:
                kp = cand
            if kp != k:
                # zero code rows pack to zero words, and kp-k is whole groups
                # (whole words): pad the PACKED buffer directly
                qweight = np.pad(np.asarray(qweight),
                                 ((0, (kp - k) * bits // 32), (0, 0)))
                gp = (kp - k) // groupsize
                scales = np.concatenate(
                    [scales, np.ones((gp, n), scales.dtype)], axis=0)
                zeros = np.concatenate(
                    [zeros, np.zeros((gp, n), np.float32)], axis=0)
            # act-order sort and device interleave compose into ONE gather
            # pass (pad rows: identity — they are zero words either way)
            pre = None
            if perm is not None:
                pre = perm if kp == k else np.concatenate(
                    [perm, np.arange(k, kp, dtype=np.int32)])
            qweight = packing.to_tpu_layout(np.asarray(qweight), bits,
                                            groupsize, pre_perm=pre)
            layout = "tpu"
        elif perm is not None:
            qweight = packing.gather_rows_packed(qweight, perm, bits)

        return cls(
            qweight=jnp.asarray(qweight),
            qzeros=HostBuf(qzeros),
            scales=jnp.asarray(scales, dtype=dtype),
            zeros=jnp.asarray(zeros, dtype=dtype),
            g_idx=HostBuf(g_idx),
            perm=None if perm is None else jnp.asarray(perm),
            bias=None if bias is None else jnp.asarray(bias, dtype=dtype),
            bits=bits, groupsize=groupsize, in_features=k, out_features=n,
            layout=layout,
            scales_wire=HostBuf(scales_wire),
            wire_bits=wire_bits,
        )

    @staticmethod
    def concat_outputs(linears: list["PackedLinear"]) -> "PackedLinear":
        """Fuse linears sharing the same input into one (concat out-features).

        The load-time equivalent of the reference's fused QKV projection
        (reference: quant/fused_attn.py:177-188 concatenates q/k/v packed
        buffers into one QuantLinear): one kernel launch instead of three,
        and the packed weight is read as one contiguous stream.
        Requires identical K/bits/groupsize/g_idx/perm.
        """
        a = linears[0]
        for b in linears[1:]:
            if (b.bits != a.bits or b.groupsize != a.groupsize
                    or b.in_features != a.in_features or b.layout != a.layout
                    or b.wire_bits != a.wire_bits):
                raise ValueError("fuse: incompatible quantization layouts")
            if (b.perm is None) != (a.perm is None) or (
                    a.perm is not None and not bool(jnp.all(a.perm == b.perm))):
                raise ValueError("fuse: differing input permutations")
        qweight = jnp.concatenate([l.qweight for l in linears], axis=1)
        qzeros = None
        if all(l.qzeros is not None for l in linears):
            qzeros = HostBuf(np.concatenate(
                [l.qzeros.arr for l in linears], axis=1))
        scales = jnp.concatenate([l.scales for l in linears], axis=1)
        zeros = jnp.concatenate([l.zeros for l in linears], axis=1)
        have_bias = [l.bias is not None for l in linears]
        if any(have_bias):
            bias = jnp.concatenate(
                [l.bias if l.bias is not None
                 else jnp.zeros((l.out_features,), scales.dtype)
                 for l in linears])
        else:
            bias = None
        scales_wire = None
        if all(l.scales_wire is not None for l in linears):
            scales_wire = HostBuf(np.concatenate(
                [l.scales_wire.arr for l in linears], axis=1))
        return PackedLinear(
            qweight=qweight, qzeros=qzeros, scales=scales, zeros=zeros,
            g_idx=a.g_idx, perm=a.perm, bias=bias, bits=a.bits,
            groupsize=a.groupsize, in_features=a.in_features,
            out_features=int(sum(l.out_features for l in linears)),
            layout=a.layout, scales_wire=scales_wire, wire_bits=a.wire_bits)

    def to_wire(self) -> dict:
        """Reference wire-format numpy buffers (original, unsorted row order).

        Inverse of from_wire: undoes the TPU nibble interleave and the
        group-sort row permutation so the saved checkpoint is byte-compatible
        with reference QuantLinear buffers (reference:
        quant/quant_linear.py:316-371)."""
        qweight = np.asarray(self.qweight)
        k = self.in_features
        if self.layout == "tpu":
            qweight = packing.from_tpu_layout(qweight, self.bits, self.groupsize)
            if self.k_padded != k:  # drop the K padding (whole packed words)
                qweight = qweight[:k * self.bits // 32]
        if self.perm is not None:
            inv = np.argsort(np.asarray(self.perm)).astype(np.int32)
            qweight = packing.gather_rows_packed(qweight, inv, self.bits)
        if self.wire_bits is not None and self.wire_bits != self.bits:
            # device nibble layout for an INT3 checkpoint: repack the codes
            # at the wire width (codes <= 7, so the narrowing is exact)
            codes = packing.unpack_rows(qweight, self.bits, k=k)
            qweight = packing.pack_rows(codes.astype(np.uint32),
                                        self.wire_bits)
        g = k // self.groupsize if self.groupsize > 0 and k % self.groupsize == 0 \
            else self.scales.shape[0]
        scales = (np.asarray(self.scales_wire.arr, dtype=np.float16)
                  if self.scales_wire is not None
                  else np.asarray(self.scales, dtype=np.float16))
        if self.qzeros is None or self.g_idx is None:
            raise ValueError(
                "to_wire: this PackedLinear carries no wire buffers "
                "(shard-local TP params are not a save path)")
        out = {
            "qweight": qweight,
            "qzeros": np.asarray(self.qzeros.arr),
            "scales": scales[:g],
            "g_idx": np.asarray(self.g_idx.arr),
        }
        if self.bias is not None:
            out["bias"] = np.asarray(self.bias, dtype=np.float16)
        return out

    @property
    def k_padded(self) -> int:
        """Device-layout contraction length (>= in_features when K-padded)."""
        return self.qweight.shape[0] * 32 // self.bits

    def dequantize(self, dtype=jnp.bfloat16):
        """Dense (K_sorted, N) weight in device row order (after perm)."""
        k, n = self.in_features, self.out_features
        if self.layout == "tpu":
            codes = packing.unpack_rows_tpu_jnp(self.qweight, self.bits,
                                                self.groupsize)  # (kp, n)
            g = self.scales.shape[0]
            codes3 = codes.reshape(g, self.groupsize, n).astype(jnp.float32)
            w = (codes3 - self.zeros.astype(jnp.float32)[:, None, :]) \
                * self.scales.astype(jnp.float32)[:, None, :]
            return w.reshape(-1, n)[:k].astype(dtype)
        codes = packing.unpack_rows_jnp(self.qweight, self.bits, k=k)
        g = self.scales.shape[0]
        s = self.scales.astype(jnp.float32)
        zeros = self.zeros.astype(jnp.float32)
        if g * self.groupsize == k:
            codes3 = codes.reshape(g, self.groupsize, n).astype(jnp.float32)
            w = (codes3 - zeros[:, None, :]) * s[:, None, :]
            return w.reshape(k, n).astype(dtype)
        # ragged last group: fall back to a row gather
        gid = jnp.minimum(jnp.arange(k) // self.groupsize, g - 1)
        w = (codes.astype(jnp.float32) - zeros[gid]) * s[gid]
        return w.astype(dtype)


def quant_matmul_xla(x, lin: PackedLinear, dtype=jnp.bfloat16):
    """XLA fallback path: dequantize-to-dense then MXU matmul.

    XLA fuses the unpack/dequant elementwise chain into the matmul's operand
    read for prefill shapes; the Pallas kernel (ops/pallas) replaces this on the
    decode path where HBM traffic must be the packed weight only.
    """
    if lin.perm is not None:
        x = jnp.take(x, lin.perm, axis=-1)
    w = lin.dequantize(dtype)
    y = jnp.matmul(x.astype(dtype), w)
    if lin.bias is not None:
        y = y + lin.bias
    return y


def linear_apply(lin, x, dtype=None):
    """Apply a linear: dense ({'kernel': (K,N), 'bias':...}), packed, or
    LoRA-adapted (ops/lora.LoraLinear wrapping either).

    Compute dtype follows the activation dtype unless overridden."""
    dtype = dtype or x.dtype
    from . import lora  # late import: lora depends on this module
    if isinstance(lin, lora.LoraLinear):
        return lora.lora_apply(lin, x, dtype)
    if isinstance(lin, PackedLinear):
        from . import quant_matmul  # late import: dispatches XLA vs Pallas
        return quant_matmul.quant_matmul(x, lin, dtype=dtype)
    y = jnp.matmul(x.astype(dtype), lin["kernel"].astype(dtype))
    b = lin.get("bias")
    if b is not None:
        y = y + b.astype(dtype)
    return y


def dense(kernel, bias=None):
    d = {"kernel": kernel}
    if bias is not None:
        d["bias"] = bias
    return d

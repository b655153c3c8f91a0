"""Affine min/max quantization parameter search — TPU-native (pure-jnp) re-design.

Functional equivalent of the reference Quantizer (reference: quant/quantizer.py:7-127):
per-channel/per-tensor min/max with symmetric/asymmetric ranges, the zero-range guard
(xmin==xmax==0 -> [-1, +1], quantizer.py:62-64), optional MSE grid-shrink search
(quantizer.py:76-93), and ternary "trits" mode (maxq = -1, quantizer.py:24-30,66-68).

Unlike the reference's stateful nn.Module, parameters here are explicit values threaded
through pure functions so the whole GPTQ solver can live under one jax.jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Static configuration for quantization parameter search.

    Mirrors Quantizer.configure(bits, perchannel, sym, mse, norm, grid, maxshrink,
    trits) (reference: quant/quantizer.py:15-26). Hashable so it can be a jit-static arg.
    """

    bits: int = 4
    perchannel: bool = True
    sym: bool = False
    mse: bool = False
    norm: float = 2.4
    grid: int = 100
    maxshrink: float = 0.8
    trits: bool = False
    # The reference wire format stores asymmetric zero-points as ``zero - 1`` in
    # packed uint words (quant_linear.py:356), so zero == 0 (an all-positive
    # group) wraps to maxq and dequantizes as maxq+1 — the reference's packed
    # kernels silently diverge from its own fake-quant eval there. wire_safe
    # clamps zero into [1, maxq] so the packed grid is always exactly
    # representable; off by default to keep bit-parity with reference math.
    wire_safe: bool = False

    @property
    def maxq(self) -> int:
        # trits mode signals itself with maxq = -1 (reference: quantizer.py:24-25).
        return -1 if self.trits else (2**self.bits - 1)


def quantize_affine(x, scale, zero, maxq: int):
    """Fake-quantize: scale * (clamp(round(x/scale) + zero, 0, maxq) - zero).

    maxq < 0 selects the ternary path (reference: quantizer.py:28-32). jnp.round is
    round-half-to-even, matching torch.round.
    """
    if maxq < 0:
        return (x > scale / 2).astype(x.dtype) * scale + (x < zero / 2).astype(x.dtype) * zero
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def _minmax_ranges(x2d, sym: bool):
    """Per-row min/max with sign guards (reference: quantizer.py:53-64).

    x2d: (channels, elements). Returns (xmin, xmax) each (channels,).
    """
    xmin = jnp.minimum(x2d.min(axis=1), 0.0)
    xmax = jnp.maximum(x2d.max(axis=1), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    return xmin, xmax


def _params_from_range(xmin, xmax, cfg: QuantConfig):
    """scale/zero from a [xmin, xmax] range (reference: quantizer.py:66-74)."""
    maxq = cfg.maxq
    if maxq < 0:  # trits: scale=xmax, zero=xmin
        return xmax, xmin
    scale = (xmax - xmin) / maxq
    if cfg.sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)
        if cfg.wire_safe:
            zero = jnp.clip(zero, 1.0, float(maxq))
    return scale, zero


def _mse_refine(x2d, xmin, xmax, scale, zero, cfg: QuantConfig):
    """MSE grid-shrink search (reference: quantizer.py:76-93).

    Shrinks the range by p = 1 - i/grid for i in [0, maxshrink*grid) and keeps the
    per-channel params minimizing sum(|q - x|^norm). Vectorized with lax.fori_loop
    (the reference's Python loop over the shrink grid).
    """
    maxq = cfg.maxq
    nsteps = int(cfg.maxshrink * cfg.grid)

    def body(i, carry):
        best, scale, zero = carry
        p = 1.0 - i.astype(jnp.float32) / cfg.grid
        xmin1 = p * xmin
        xmax1 = p * xmax
        scale1 = (xmax1 - xmin1) / maxq
        zero1 = zero if cfg.sym else jnp.round(-xmin1 / scale1)
        if not cfg.sym and cfg.wire_safe and maxq >= 0:
            zero1 = jnp.clip(zero1, 1.0, float(maxq))
        q = quantize_affine(x2d, scale1[:, None], zero1[:, None], maxq)
        err = jnp.sum(jnp.abs(q - x2d) ** cfg.norm, axis=1)
        better = err < best
        best = jnp.where(better, err, best)
        scale = jnp.where(better, scale1, scale)
        zero = jnp.where(better, zero1, zero)
        return best, scale, zero

    best = jnp.full(x2d.shape[0], jnp.inf, dtype=jnp.float32)
    _, scale, zero = jax.lax.fori_loop(0, nsteps, body, (best, scale, zero))
    return scale, zero


@partial(jax.jit, static_argnames=("cfg",))
def find_params_weight(w, cfg: QuantConfig):
    """Quantization params for a weight matrix w (out_features, in_features...).

    Equivalent to Quantizer.find_params(x, weight=True) (reference: quantizer.py:34-106):
    perchannel flattens trailing dims and searches per output row; per-tensor searches
    over the whole tensor and broadcasts. Returns (scale, zero) shaped
    (out_features, 1) for perchannel or (1, 1)-broadcastable otherwise, fp32.
    """
    w = w.astype(jnp.float32)
    rows = w.shape[0]
    x2d = w.reshape(rows, -1) if cfg.perchannel else w.reshape(1, -1)

    xmin, xmax = _minmax_ranges(x2d, cfg.sym)
    scale, zero = _params_from_range(xmin, xmax, cfg)
    if cfg.mse:
        # the reference runs the shrink loop for trits (maxq=-1) too, with
        # the same formulas (quantizer.py:76-93)
        scale, zero = _mse_refine(x2d, xmin, xmax, scale, zero, cfg)
    if not cfg.perchannel:
        scale = jnp.broadcast_to(scale, (rows,))
        zero = jnp.broadcast_to(zero, (rows,))
    return scale[:, None], zero[:, None]


@partial(jax.jit, static_argnames=("cfg",))
def find_params_activation(x, cfg: QuantConfig):
    """Params for an activation tensor (reference find_params weight=False path).

    Supports 2D (tokens, features) and 3D (batch, tokens, features) inputs: perchannel
    searches per feature (last dim, reference: quantizer.py:43-49); per-tensor over all
    elements. Returns (scale, zero) broadcastable against x.
    """
    x = x.astype(jnp.float32)
    shape = x.shape
    feat = shape[-1]
    x2d = x.reshape(-1, feat).T if cfg.perchannel else x.reshape(1, -1)

    xmin, xmax = _minmax_ranges(x2d, cfg.sym)
    scale, zero = _params_from_range(xmin, xmax, cfg)
    if cfg.mse:
        # the reference runs the shrink loop for trits (maxq=-1) too, with
        # the same formulas (quantizer.py:76-93)
        scale, zero = _mse_refine(x2d, xmin, xmax, scale, zero, cfg)
    if not cfg.perchannel:
        scale = jnp.broadcast_to(scale, (feat,))
        zero = jnp.broadcast_to(zero, (feat,))
    bshape = (1,) * (len(shape) - 1) + (feat,)
    return scale.reshape(bshape), zero.reshape(bshape)


def fake_quantize(x, scale, zero, cfg: QuantConfig):
    """Quantize-dequantize x with the given params (reference Quantizer.quantize)."""
    return quantize_affine(x.astype(jnp.float32), scale, zero, cfg.maxq)

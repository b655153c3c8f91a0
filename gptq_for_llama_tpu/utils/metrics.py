"""Quantization quality metrics: SNR probe + precision auto-upgrade ladder.

TPU-native equivalents of the reference diagnostics (reference:
utils/modelutils.py:16-83, gptq.py:101-126).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def snr_error(y_pred, y_real, reduction: str = "mean"):
    """Noise/signal power ratio, flattened per leading row then reduced.

    Mirrors torch_snr_error (reference: utils/modelutils.py:36-83):
    snr = sum((pred-real)^2, -1) / (sum(real^2, -1) + 1e-7).
    """
    y_pred = jnp.asarray(y_pred, jnp.float32)
    y_real = jnp.asarray(y_real, jnp.float32)
    if y_pred.shape != y_real.shape:
        raise ValueError(f"shape mismatch {y_pred.shape} vs {y_real.shape}")
    if y_pred.ndim == 1:
        y_pred, y_real = y_pred[None], y_real[None]
    y_pred = y_pred.reshape(y_pred.shape[0], -1)
    y_real = y_real.reshape(y_real.shape[0], -1)
    noise = jnp.sum((y_pred - y_real) ** 2, axis=-1)
    signal = jnp.sum(y_real ** 2, axis=-1)
    snr = noise / (signal + 1e-7)
    if reduction == "mean":
        return jnp.mean(snr)
    if reduction == "sum":
        return jnp.sum(snr)
    if reduction == "none":
        return snr
    raise ValueError(f"Unsupported reduction {reduction!r}")


def gen_conditions(wbits: int, groupsize: int) -> list[tuple[int, int]]:
    """Precision-upgrade ladder for the observe path.

    Halve groupsize down to 32, then double wbits and reset groupsize; stop once
    wbits >= 8 with groupsize exhausted (reference: utils/modelutils.py:16-32).
    The reference's exact-equality stop (`groupsize == 32`) never terminates for
    groupsize < 32 (it only ever passes -1/32/64/128); we stop on g <= 32 so any
    input terminates, which is identical on the reference's domain.
    """
    w, g = wbits, groupsize
    conditions = []
    while not (w >= 8 and (g == -1 or g <= 32)):
        if g > 32:
            g //= 2
        else:
            w *= 2
            g = groupsize
        conditions.append((int(w), int(g)))
    return conditions


def ascii_table(header: list[str], rows: list[list]) -> str:
    """Minimal fixed-width table (stand-in for the reference's texttable dep)."""
    srows = [[f"{c:.6f}" if isinstance(c, float) else str(c) for c in r] for r in rows]
    widths = [max(len(h), *(len(r[i]) for r in srows)) if srows else len(h)
              for i, h in enumerate(header)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def fmt(cells):
        return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"

    lines = [sep, fmt(header), sep] + [fmt(r) for r in srows] + [sep]
    return "\n".join(lines)


def dequant_weight_np(qweight, qzeros, scales, g_idx, bits: int) -> np.ndarray:
    """Host-side dense (out, in) weight from wire-format buffers (for debugging)."""
    from ..quant import packing
    codes = packing.unpack_rows(np.asarray(qweight), bits, k=len(g_idx))  # (K, N)
    zeros = packing.unpack_cols(np.asarray(qzeros), bits, n=codes.shape[1]) + 1
    g = np.asarray(g_idx)
    s = np.asarray(scales, np.float32)
    return (((codes - zeros[g]).astype(np.float32)) * s[g]).T

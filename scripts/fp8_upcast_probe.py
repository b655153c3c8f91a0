"""fp8 KV decode-attention upcast strategies, measured on real Mosaic (r5).

Round-4 verdict: fp8-stored caches lose to XLA because the in-kernel
fp8->f32 upcast dominates (GQA 772 vs 732 us, paged 1836 vs 755) — fp8 was
supposed to buy HBM bandwidth (half the cache bytes), not sell throughput.
This probe times ONE seq-blocked online-softmax decode kernel body under
three K/V load strategies at a 13B-ish shape (h=hkv=32..40, d=128, s=2048):

  native   k_ref[...].astype(f32)             (the current kernel's path)
  intmath  bitcast->u8->i32, reconstruct the bf16 bit pattern with integer
           shifts (exp+120)<<7 | man<<4, subnormals via man*2^-9
  words    cache stored PRE-PACKED as int32 words (4 fp8 lanes per word,
           packed at cache-write time); kernel loads native 32-bit tiles
           (zero relayout), extracts 4 byte planes, integer-upcasts each,
           and dots per plane — q is plane-permuted once outside.

plus the bf16 baseline. If a strategy beats bf16 (it reads half the bytes),
fp8 kernels become the default; if none does, ROOFLINE-level evidence of the
v5e upcast floor is committed instead.

Usage: python scripts/fp8_upcast_probe.py [--out bench_artifacts/r05/fp8_upcast.json]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptq_for_llama_tpu.ops.pallas.autotune import measure

INTERP = os.environ.get("FP8_PROBE_INTERPRET", "") == "1"


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[fp8 +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def _int_upcast(u):
    """fp8 e4m3 bits (int32, one code per element) -> f32 via integer math.
    Normals: bf16 bits = (em<<4) + (120<<7); subnormals: man * 2^-9.
    (e4m3 NaN em=0x7F maps to a large finite value — KV caches are NaN-free
    by construction; the native path would propagate NaN instead.)"""
    sign = jnp.where((u & 0x80) != 0, -1.0, 1.0).astype(jnp.float32)
    em = u & 0x7F
    man = em & 0x7
    bits = ((em << 4) + (120 << 7)).astype(jnp.uint16)
    normal = jax.lax.bitcast_convert_type(bits, jnp.bfloat16).astype(jnp.float32)
    sub = man.astype(jnp.float32) * (2.0 ** -9)
    return jnp.where((em >> 3) == 0, sub, normal) * sign


def kernel_native(off_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale, seq_block):
    _body(off_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
          scale=scale, seq_block=seq_block,
          loadk=lambda r: r[0].astype(jnp.float32),
          loadv=lambda r: r[0].astype(jnp.float32))


def kernel_intmath(off_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                   *, scale, seq_block):
    def load(r):
        u = jax.lax.bitcast_convert_type(r[0], jnp.uint8).astype(jnp.int32)
        return _int_upcast(u)
    _body(off_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
          scale=scale, seq_block=seq_block, loadk=load, loadv=load)


def _body(off_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
          scale, seq_block, loadk, loadv):
    bi = pl.program_id(0)
    si = pl.program_id(2)
    off = off_ref[bi]

    @pl.when(si == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    base = si * seq_block

    @pl.when(base <= off)
    def _():
        q = q_ref[0].astype(jnp.float32)             # (Ht, D)
        k = loadk(k_ref)                             # (BS, Ht, D)
        v = loadv(v_ref)
        logits = jnp.sum(q[None, :, :] * k, axis=-1) * scale
        kj = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + base
        logits = jnp.where(kj <= off, logits, -jnp.inf)
        m_blk = jnp.max(logits, axis=0)
        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, m_blk)
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new[None, :])
        l_ref[0] = l_ref[0] * corr + jnp.sum(p, axis=0)
        acc_ref[:] = acc_ref[:] * corr[:, None] + jnp.sum(p[:, :, None] * v,
                                                          axis=0)
        m_ref[0] = m_new

    @pl.when(si == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[0][:, None]).astype(o_ref.dtype)


def kernel_words(off_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                 *, scale, seq_block):
    """K/V arrive as int32 words (BS, Ht, D/4): native 32-bit tiles, no
    8-bit relayout. Byte plane j of lane i holds element 4i+j; q arrives
    pre-permuted to the same plane-major order (Ht, 4, D/4) so the d-dot is
    a sum over planes; the output acc is plane-major and unpermuted by the
    CALLER (once per step, outside the kernel)."""
    bi = pl.program_id(0)
    si = pl.program_id(2)
    off = off_ref[bi]

    @pl.when(si == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    base = si * seq_block

    @pl.when(base <= off)
    def _():
        kw = k_ref[0]                                 # (BS, Ht, D/4) int32
        vw = v_ref[0]
        logits = None
        for j in range(4):
            qj = q_ref[0, :, j].astype(jnp.float32)   # (Ht, D/4)
            kj_ = _int_upcast((kw >> (8 * j)) & 0xFF)  # (BS, Ht, D/4)
            part = jnp.sum(qj[None] * kj_, axis=-1)   # (BS, Ht)
            logits = part if logits is None else logits + part
        logits = logits * scale
        kj = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + base
        logits = jnp.where(kj <= off, logits, -jnp.inf)
        m_blk = jnp.max(logits, axis=0)
        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, m_blk)
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new[None, :])
        l_ref[0] = l_ref[0] * corr + jnp.sum(p, axis=0)
        for j in range(4):
            vj = _int_upcast((vw >> (8 * j)) & 0xFF)
            acc_ref[:, j] = acc_ref[:, j] * corr[:, None] \
                + jnp.sum(p[:, :, None] * vj, axis=0)
        m_ref[0] = m_new

    @pl.when(si == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[0][:, None, None]).astype(o_ref.dtype)


def run_variant(name, q, k, v, off, scale, bs):
    b, _, h, d = q.shape
    s = k.shape[1]
    grid = (b, 1, s // bs)
    if name == "words":
        kern = functools.partial(kernel_words, scale=scale, seq_block=bs)
        dq = d // 4
        # plane-permute q once outside: element 4i+j -> plane j, lane i
        qp = q.reshape(b, h, dq, 4).transpose(0, 1, 3, 2)  # (B, H, 4, D/4)
        # bitcast 4 trailing fp8 lanes into one int32 word: (B,S,H,D/4)
        # (jax removes the size-4 trailing dim; little-endian byte order)
        kw = jax.lax.bitcast_convert_type(
            k.reshape(b, s, h, dq, 4), jnp.int32)
        vw = jax.lax.bitcast_convert_type(
            v.reshape(b, s, h, dq, 4), jnp.int32)

        @jax.jit
        def call(qp, kw, vw, off):
            out = pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=grid,
                    in_specs=[
                        pl.BlockSpec((1, h, 4, dq),
                                     lambda bi, hi, si, o: (bi, hi, 0, 0)),
                        pl.BlockSpec((1, bs, h, dq),
                                     lambda bi, hi, si, o:
                                     (bi, jnp.minimum(si, o[bi] // bs), hi, 0)),
                        pl.BlockSpec((1, bs, h, dq),
                                     lambda bi, hi, si, o:
                                     (bi, jnp.minimum(si, o[bi] // bs), hi, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, h, 4, dq),
                                           lambda bi, hi, si, o:
                                           (bi, hi, 0, 0)),
                    scratch_shapes=[pltpu.VMEM((h, 4, dq), jnp.float32),
                                    pltpu.VMEM((1, h), jnp.float32),
                                    pltpu.VMEM((1, h), jnp.float32)],
                ),
                out_shape=jax.ShapeDtypeStruct((b, h, 4, dq), jnp.float32),
                interpret=INTERP,
            )(off, qp, kw, vw)
            # unpermute planes back to natural d order (once per step)
            return out.transpose(0, 1, 3, 2).reshape(b, 1, h, d)
        t = measure(lambda qq: call(qq, kw, vw, off), qp, iters=50, reps=3)
        out = call(qp, kw, vw, off)
        return t, out
    kern = functools.partial(
        {"native": kernel_native, "intmath": kernel_intmath}[name],
        scale=scale, seq_block=bs)

    @jax.jit
    def call(q, k, v, off):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=[
                    pl.BlockSpec((1, h, d), lambda bi, hi, si, o: (bi, hi, 0)),
                    pl.BlockSpec((1, bs, h, d),
                                 lambda bi, hi, si, o:
                                 (bi, jnp.minimum(si, o[bi] // bs), hi, 0)),
                    pl.BlockSpec((1, bs, h, d),
                                 lambda bi, hi, si, o:
                                 (bi, jnp.minimum(si, o[bi] // bs), hi, 0)),
                ],
                out_specs=pl.BlockSpec((1, h, d),
                                       lambda bi, hi, si, o: (bi, hi, 0)),
                scratch_shapes=[pltpu.VMEM((h, d), jnp.float32),
                                pltpu.VMEM((1, h), jnp.float32),
                                pltpu.VMEM((1, h), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
            interpret=INTERP,
        )(off, q.reshape(b, h, d), k, v).reshape(b, 1, h, d)
    t = measure(lambda qq: call(qq, k, v, off), q, iters=50, reps=3)
    return t, call(q, k, v, off)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_artifacts/r05/fp8_upcast.json")
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--h", type=int, default=32)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    b, s, h, d, bs = 1, args.s, args.h, 128, 256
    fp8 = jnp.float8_e4m3fn
    scale = 1.0 / float(np.sqrt(d))
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=("shape", "dtype", "sc"))
    def gen(key, shape, dtype, sc=1.0):
        return (jax.random.normal(key, shape, jnp.float32) * sc).astype(dtype)

    q = gen(key, shape=(b, 1, h, d), dtype=jnp.bfloat16)
    k8 = gen(jax.random.PRNGKey(1), shape=(b, s, h, d), dtype=fp8, sc=0.5)
    v8 = gen(jax.random.PRNGKey(2), shape=(b, s, h, d), dtype=fp8, sc=0.5)
    k16 = k8.astype(jnp.bfloat16)
    v16 = v8.astype(jnp.bfloat16)
    off = jnp.asarray([s - 8], jnp.int32)
    results = {"device": jax.devices()[0].device_kind,
               "shape": {"s": s, "h": h, "d": d, "seq_block": bs}}
    stage(f"device {results['device']}; s={s} h={h}")

    # bf16 baseline through the same body
    t16, out16 = run_variant("native", q, k16, v16, off, scale, bs)
    results["bf16_native_us"] = round(t16 * 1e6, 1)
    stage(f"bf16 native: {t16 * 1e6:.1f} us")
    ref = np.asarray(out16, np.float32)

    for name in ("native", "intmath", "words"):
        try:
            t, out = run_variant(name, q, k8, v8, off, scale, bs)
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref))
                        / max(1e-6, float(np.max(np.abs(ref)))))
            results[f"fp8_{name}_us"] = round(t * 1e6, 1)
            results[f"fp8_{name}_relerr"] = round(err, 5)
            stage(f"fp8 {name}: {t * 1e6:.1f} us, rel err {err:.5f}")
        except Exception as e:
            results[f"fp8_{name}_error"] = f"{type(e).__name__}: {str(e)[:250]}"
            stage(f"fp8 {name}: FAIL {type(e).__name__}: {str(e)[:160]}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

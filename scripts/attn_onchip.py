"""On-chip validation of the hardware-gated attention paths (round-4).

Each entry compiles + runs the real Mosaic kernel on the TPU and checks
parity against a pure-jnp oracle computed ON DEVICE (the axon relay rejects
large host<->device transfers, so test data is born on device via jax.random
and only scalar errors are read back). Paths covered:

  - dense decode kernel, bf16 and fp8-stored caches (MHA + GQA head layouts)
  - pool-native paged decode kernel, bf16 and fp8 pools
  - blocked-KV flash prefill at S=8192 (vs the VMEM-resident kernel)
  - blocked-KV flash cached-prefill with an fp8 cache

A Mosaic rejection is recorded as ok=false with the error head — that is a
documented gate, not a crash. Results: bench_artifacts/r04/attn_validate.json

Usage: python scripts/attn_onchip.py [--out PATH]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys, os, time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gptq_for_llama_tpu.ops.pallas.autotune import measure


def stage(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[attn +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def dev_normal(seed, shape, dtype, scale=1.0):
    """Data born on device (tiny compile payload, no host upload)."""
    @functools.partial(jax.jit, static_argnames=("shape", "dtype", "scale"))
    def gen(key, shape, dtype, scale):
        return (jax.random.normal(key, shape, jnp.float32) * scale
                ).astype(dtype)
    return gen(jax.random.PRNGKey(seed), shape=shape, dtype=dtype,
               scale=scale)


@functools.partial(jax.jit, static_argnames=("scale",))
def oracle_decode(q, k, v, off, scale):
    """(B,1,H,D) x (B,S,Hkv,D) masked-softmax oracle, fp32 on-device."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    b, _, h, d = qf.shape
    hkv = kf.shape[2]
    if h != hkv:
        kf = jnp.repeat(kf, h // hkv, axis=2)
        vf = jnp.repeat(vf, h // hkv, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    offs = jnp.broadcast_to(off.reshape(-1), (b,))
    kj = jnp.arange(kf.shape[1])
    mask = kj[None, None, None, :] <= offs[:, None, None, None]
    logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, vf)


@jax.jit
def rel_err(got, want):
    g = got.astype(jnp.float32).reshape(-1)
    w = want.astype(jnp.float32).reshape(-1)
    return jnp.max(jnp.abs(g - w)) / jnp.maximum(1e-6, jnp.max(jnp.abs(w)))


def check(name, fn, results, retries: int = 2):
    """Run one validation; an HTTP-500 from the remote-compile helper is a
    TRANSIENT infrastructure failure (round-4's two 'rejections' both
    compiled clean on re-run), so retry those after a pause — only a
    repeatable error is recorded as the entry's verdict."""
    for attempt in range(retries + 1):
        try:
            out = fn()
            results[name] = {"ok": True, **out}
            stage(f"{name}: OK {out}")
            return
        except Exception as e:
            head = f"{type(e).__name__}: {str(e)[:300]}"
            transient = "HTTP 500" in str(e)
            results[name] = {"ok": False, "error": head,
                             "attempts": attempt + 1}
            stage(f"{name}: FAIL (attempt {attempt + 1}) {head}")
            if os.environ.get("ATTN_ONCHIP_RAISE"):
                traceback.print_exc()
            if not transient or attempt == retries:
                return
            time.sleep(20)


def main():
    try:  # persistent compile cache: the S=8k blocked-flash program takes
        # ~2 min through the remote-compile helper and that helper dies
        # (HTTP 500) intermittently under long compiles — a cache hit from a
        # prior run sidesteps the flake entirely (round-5 finding)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_artifacts/r04/attn_validate.json")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from gptq_for_llama_tpu.ops.pallas.attention import (
        decode_attention, pool_decode_attention)
    from gptq_for_llama_tpu.ops.pallas.flash import (
        flash_prefill, flash_prefill_blocked)

    dev = jax.devices()[0]
    stage(f"device: {dev.device_kind}")
    results = {"device": dev.device_kind}
    rng = np.random.default_rng(0)
    scale = 1.0 / float(np.sqrt(128.0))
    fp8 = jnp.float8_e4m3fn

    def mk(b, s, h, hkv, d=128, dtype=jnp.bfloat16):
        q = dev_normal(1, (b, 1, h, d), jnp.bfloat16)
        k = dev_normal(2, (b, s, hkv, d), dtype, scale=0.5)
        v = dev_normal(3, (b, s, hkv, d), dtype, scale=0.5)
        off = jnp.asarray(rng.integers(s // 2, s - 1, size=(b,)), jnp.int32)
        return q, k, v, off

    # --- dense decode: bf16 + fp8, MHA (7B layout) and GQA (70B-ish) ------
    for tag, hkv, dt in [("decode_bf16_mha", 32, jnp.bfloat16),
                         ("decode_fp8_mha", 32, fp8),
                         ("decode_bf16_gqa", 8, jnp.bfloat16),
                         ("decode_fp8_gqa", 8, fp8)]:
        def run(hkv=hkv, dt=dt):
            q, k, v, off = mk(8, 2048, 32, hkv, dtype=dt)
            got = decode_attention(q, k, v, off, scale)
            want = oracle_decode(q, k, v, off, scale)
            err = float(np.asarray(rel_err(got, want)))
            assert err < 2e-2, f"parity {err}"
            # cache rides as a jit ARGUMENT (closing over 268 MB would be
            # baked into the remote-compile payload; CLAUDE.md)
            t = measure(lambda c, k_, v_, o_: decode_attention(
                c, k_, v_, o_, scale), q, args=(k, v, off),
                iters=args.iters, reps=args.reps)
            # the XLA fallback (what _attn_impl dispatches when the kernel
            # is gated off) on the same inputs — the flip-decision baseline
            t_xla = measure(lambda c, k_, v_, o_: oracle_decode(
                c, k_, v_, o_, scale), q, args=(k, v, off),
                iters=args.iters, reps=args.reps)
            # live bytes actually DMA'd: ~offset slots per row (the kernel
            # clamps past the live prefix), both k and v
            live = int(np.asarray(off, np.int64).sum())
            kv_bytes = 2 * live * k.shape[2] * k.shape[3] * k.dtype.itemsize
            return {"rel_err": err, "us_per_call": round(t * 1e6, 1),
                    "xla_us_per_call": round(t_xla * 1e6, 1),
                    "live_kv_gbps": round(kv_bytes / t / 1e9, 1)}
        check(tag, run, results)

    # --- pool-native paged decode: bf16 + fp8 ----------------------------
    for tag, dt in [("paged_bf16", jnp.bfloat16), ("paged_fp8", fp8)]:
        def run(dt=dt):
            b, mb, bs, h, d = 8, 128, 16, 32, 128  # 2048-token logical view
            nb = b * mb
            q = dev_normal(4, (b, 1, h, d), jnp.bfloat16)
            kp = dev_normal(5, (nb, bs, h, d), dt, scale=0.5)
            vp = dev_normal(6, (nb, bs, h, d), dt, scale=0.5)
            tables = jnp.asarray(
                rng.permutation(nb).reshape(b, mb), jnp.int32)
            off = jnp.asarray(rng.integers(mb * bs // 2, mb * bs - 1,
                                           size=(b,)), jnp.int32)
            got = pool_decode_attention(q, kp, vp, tables, off, scale)

            @jax.jit
            def gathered(kp, vp):
                kd = jnp.take(kp, tables, axis=0).reshape(b, mb * bs, h, d)
                vd = jnp.take(vp, tables, axis=0).reshape(b, mb * bs, h, d)
                return kd, vd
            kd, vd = gathered(kp, vp)
            want = oracle_decode(q, kd, vd, off, scale)[:, 0]
            err = float(np.asarray(rel_err(got.reshape(want.shape), want)))
            assert err < 2e-2, f"parity {err}"
            t = measure(lambda c, kp_, vp_, t_, o_: pool_decode_attention(
                c, kp_, vp_, t_, o_, scale), q, args=(kp, vp, tables, off),
                iters=args.iters, reps=args.reps)

            # gather-then-dense fallback (what sdpa does off-kernel)
            def xla_paged(c, kp_, vp_, t_, o_):
                kd = jnp.take(kp_, t_, axis=0).reshape(b, mb * bs, h, d)
                vd = jnp.take(vp_, t_, axis=0).reshape(b, mb * bs, h, d)
                return oracle_decode(c, kd, vd, o_, scale)
            t_xla = measure(xla_paged, q, args=(kp, vp, tables, off),
                            iters=args.iters, reps=args.reps)
            live = int(np.asarray(off, np.int64).sum())
            kv_bytes = 2 * live * h * d * kp.dtype.itemsize
            return {"rel_err": err, "us_per_call": round(t * 1e6, 1),
                    "xla_us_per_call": round(t_xla * 1e6, 1),
                    "live_kv_gbps": round(kv_bytes / t / 1e9, 1)}
        check(tag, run, results)

    # --- blocked flash at S=8192 vs the VMEM-resident kernel -------------
    def run_blocked_8k():
        # oracle = chunked jnp attention computed on device (the RESIDENT
        # kernel cannot be the oracle here: at S=8192 its Mosaic compile
        # repeatably crashes the remote compile helper — the round-5 bisect
        # that moved supports_prefill's VMEM cap to 2 MB; full-logits jnp at
        # 8k would need 8.6 GB, so the oracle runs 512-wide query chunks)
        b, s, h, d = 1, 8192, 32, 128
        q = dev_normal(7, (b, s, h, d), jnp.bfloat16)
        k = dev_normal(8, (b, s, h, d), jnp.bfloat16, scale=0.5)
        v = dev_normal(9, (b, s, h, d), jnp.bfloat16, scale=0.5)
        got = flash_prefill_blocked(q, k, v, jnp.int32(0), scale)

        cq = 512

        @functools.partial(jax.jit, static_argnames=("q0",))
        def oracle_chunk(q, k, v, q0):
            qf = q[:, q0:q0 + cq].astype(jnp.float32)
            kf, vf = k.astype(jnp.float32), v.astype(jnp.float32)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
            qi = jnp.arange(cq)[:, None] + q0
            kj = jnp.arange(s)[None, :]
            logits = jnp.where((kj <= qi)[None, None], logits, -jnp.inf)
            w = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", w, vf)

        errs = []
        for q0 in (0, s - cq):  # first + last chunk bound the causal range
            want = oracle_chunk(q, k, v, q0=q0)
            errs.append(float(np.asarray(rel_err(got[:, q0:q0 + cq], want))))
        err = max(errs)
        assert err < 2e-2, f"parity vs chunked jnp oracle {err}"
        np.asarray(flash_prefill_blocked(q, k, v, jnp.int32(0),
                                         scale)[0, 0, 0, :1])  # settle
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(flash_prefill_blocked(q, k, v, jnp.int32(0),
                                             scale)[0, 0, 0, :1])
            best = min(best, time.perf_counter() - t0)
        return {"rel_err": err, "blocked_ms": round(best * 1e3, 1)}
    check("flash_blocked_8k", run_blocked_8k, results)

    def run_resident_4096():
        # the resident kernel at its NEW cap boundary (S=4096, K+V = 2 MB)
        b, s, h, d = 1, 4096, 32, 128
        q = dev_normal(7, (b, s, h, d), jnp.bfloat16)
        k = dev_normal(8, (b, s, h, d), jnp.bfloat16, scale=0.5)
        v = dev_normal(9, (b, s, h, d), jnp.bfloat16, scale=0.5)
        got = flash_prefill(q, k, v, scale)
        want = flash_prefill_blocked(q, k, v, jnp.int32(0), scale)
        err = float(np.asarray(rel_err(got, want)))
        assert err < 2e-2, f"resident vs blocked parity {err}"
        times = []
        for fn in (lambda: flash_prefill(q, k, v, scale),
                   lambda: flash_prefill_blocked(q, k, v, jnp.int32(0),
                                                 scale)):
            np.asarray(fn()[0, 0, 0, :1])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn()[0, 0, 0, :1])
                best = min(best, time.perf_counter() - t0)
            times.append(round(best * 1e3, 1))
        return {"rel_err": err, "resident_ms": times[0],
                "blocked_ms": times[1]}
    check("flash_resident_4096", run_resident_4096, results)

    # --- blocked flash cached-prefill with an fp8 cache -------------------
    def run_blocked_fp8():
        b, sq, skv, h, d = 1, 512, 2048, 32, 128
        q = dev_normal(10, (b, sq, h, d), jnp.bfloat16)
        k = dev_normal(11, (b, skv, h, d), fp8, scale=0.5)
        v = dev_normal(12, (b, skv, h, d), fp8, scale=0.5)
        off = jnp.int32(1024)
        got = flash_prefill_blocked(q, k, v, off, scale)

        @functools.partial(jax.jit, static_argnames=())
        def oracle(q, k, v):
            qf, kf, vf = (a.astype(jnp.float32) for a in (q, k, v))
            logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
            qi = jnp.arange(sq)[:, None] + 1024
            kj = jnp.arange(skv)[None, :]
            logits = jnp.where((kj <= qi)[None, None], logits, -jnp.inf)
            w = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", w, vf)
        want = oracle(q, k, v)
        err = float(np.asarray(rel_err(got, want)))
        assert err < 2e-2, f"parity {err}"
        return {"rel_err": err}
    check("flash_blocked_fp8_cached", run_blocked_fp8, results)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v.get("ok") if isinstance(v, dict) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()

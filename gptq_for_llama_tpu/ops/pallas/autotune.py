"""Measured kernel autotuner with a persistent cache.

The reference autotuner benchmarks each Triton config ~40 reps and caches the
best by pow2-rounded M (reference: quant/custom_autotune.py:14-127). The TPU
equivalent tunes the (groups_per_tile, block_n) tiling of the fused
dequant-GEMM kernels:

- candidates come from the same enumeration as the static heuristic
  (`matmul._best_blocks`), so every candidate satisfies the Mosaic
  constraints; the heuristic's own pick is always among them;
- measurement chains many kernel invocations inside ONE jitted fori_loop and
  takes the slope between two unroll factors — this cancels the host-dispatch
  and per-iteration floors of the axon relay (same methodology as
  scripts/kbench.py), which would otherwise drown a ~100 us kernel;
- results persist as JSON keyed on
  (kind, K, N, bits, groupsize, pow2-M-bucket, device_kind) — keyed on the
  chip generation so a different TPU never reuses yesterday's answer;
- trace-time consumers (quant_matmul_pallas and the transposed backward) only
  LOOK UP the cache — they never measure inside a trace; measurement happens
  eagerly via `ensure()` from ModelRunner.warmup()/bench on the real chip.
  On a cache miss the static heuristic answers, so cold-cache behavior is
  exactly the round-1 kernel.

Env knobs:
  GPTQ_TPU_AUTOTUNE=0      disable lookups AND measurement (pure heuristic)
  GPTQ_TPU_AUTOTUNE=ro     lookups only, never measure
  GPTQ_TPU_AUTOTUNE_CACHE  cache file path override
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

_LOCK = threading.Lock()
_CACHE: dict | None = None
_MODE_ENV = "GPTQ_TPU_AUTOTUNE"
_PATH_ENV = "GPTQ_TPU_AUTOTUNE_CACHE"
_VERSION = 1


def _mode() -> str:
    return os.environ.get(_MODE_ENV, "")


def cache_path() -> str:
    p = os.environ.get(_PATH_ENV)
    if p:
        return p
    import jax
    base = jax.config.jax_compilation_cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "gptq_tpu_autotune.json")


def _device_kind() -> str:
    import jax
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


def _load() -> dict:
    global _CACHE
    with _LOCK:
        if _CACHE is None:
            try:
                with open(cache_path()) as f:
                    data = json.load(f)
                _CACHE = data if data.get("_version") == _VERSION else {}
            except Exception:
                _CACHE = {}
        return _CACHE


def _persist():
    with _LOCK:
        path = cache_path()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        data = dict(_CACHE or {})
        data["_version"] = _VERSION
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=0, sort_keys=True)
        os.replace(tmp, path)


def reset_cache_for_tests():
    global _CACHE
    with _LOCK:
        _CACHE = None


def m_bucket(m: int) -> int:
    """pow2 rounding like the reference's nearest_power_of_two key
    (custom_autotune.py:84-87)."""
    return 1 << max(0, int(np.ceil(np.log2(max(m, 1)))))


def _key(kind: str, k: int, n: int, bits: int, gs: int, m: int) -> str:
    return (f"{kind}:K{k}:N{n}:b{bits}:g{gs}:M{m_bucket(m)}"
            f":{_device_kind()}")


def lookup(kind: str, k: int, n: int, bits: int, gs: int, m: int):
    """(groups_per_tile, block_n) from the persistent cache, or None.

    GPTQ_TPU_TUNE_OVERRIDE="fwd:K14336:N5120=8,1024;mlp:K5120:N13824=16,256"
    pins specific shapes from the environment — the in-model sweep hook
    (round-5: standalone slope races can crown configs that lose inside the
    full decode program, e.g. 13B down_proj (16,128): 58.5 us standalone but
    107.6 in-model next to its neighbors — bench_artifacts/r05/
    trace_13b_default.json)."""
    ov = os.environ.get("GPTQ_TPU_TUNE_OVERRIDE", "")
    if ov:
        want = f"{kind}:K{k}:N{n}"
        for entry in ov.split(";"):
            if entry and entry.split("=")[0] == want:
                bg, bn = entry.split("=")[1].split(",")
                return (int(bg), int(bn))
    if _mode() == "0":
        return None
    hit = _load().get(_key(kind, k, n, bits, gs, m))
    return tuple(hit) if hit else None


def store(kind: str, k: int, n: int, bits: int, gs: int, m: int, best,
          persist: bool = True):
    _load()[_key(kind, k, n, bits, gs, m)] = list(best)
    if persist:
        _persist()


def candidates(k: int, n: int, gs: int, bits: int, n_weights: int = 1):
    """All Mosaic-valid (groups_per_tile, block_n) tilings for this shape,
    ordered by the heuristic's preference (its pick first) — the same
    enumeration the offline heuristic ranks (matmul._ranked_blocks)."""
    from .matmul import _ranked_blocks
    return _ranked_blocks(k, n, gs, bits, n_weights=n_weights)


# ---------------------------------------------------------------------------
# measurement (slope method; see scripts/kbench.py)
# ---------------------------------------------------------------------------

def _timed_loop(fn, x, args, iters: int, reps: int, unroll: int) -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0, *a):
        # weight buffers ride as jit ARGUMENTS (CLAUDE.md: closing over
        # arrays bakes them into the program as constants — each candidate
        # compile would ship MBs through the remote-compile service)
        def body(i, c):
            for _ in range(unroll):
                y = fn(c, *a)
                c = x0 + 1e-12 * jnp.sum(y).astype(x0.dtype)
            return c

        return jax.lax.fori_loop(0, iters, body, x0)

    np.asarray(loop(x, *args))  # compile+settle (relay: block_until_ready lies)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(x, *args))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(fn, x, args=(), iters: int = 20, reps: int = 2,
            samples: int = 3) -> float:
    """Per-call seconds of fn(x, *args) -> y, dispatch floors cancelled.

    Median of `samples` slope estimates. A non-positive slope
    (t_hi <= t_lo) means relay jitter corrupted that estimate — clamping
    it small would make the candidate look infinitely fast and win the
    race, poisoning the persistent cache (observed on chip: a 0.0 us
    "winner"). Invalid slopes are dropped and re-sampled up to a retry
    budget; a median over min(2, samples) valid slopes is required —
    a SINGLE positive-but-jitter-corrupted slope could still crown a
    wrong winner and be persisted, so too few survivors also raise and
    _race skips the candidate."""
    slopes = []
    for _ in range(samples + 2):  # at most 2 retries across all samples
        t_lo = _timed_loop(fn, x, args, iters, reps, 1)
        t_hi = _timed_loop(fn, x, args, iters, reps, 5)
        slope = (t_hi - t_lo) / (iters * 4)
        if slope > 0:
            slopes.append(slope)
            if len(slopes) >= samples:
                break
    if len(slopes) < min(2, samples):
        raise RuntimeError(
            f"only {len(slopes)}/{samples} valid timing slopes (relay jitter)")
    return float(np.median(slopes))


def tune_qmm(lin, m: int, kind: str = "fwd", iters: int = 20, reps: int = 2,
             log=None) -> tuple | None:
    """Measure all candidates for one PackedLinear at row-bucket m; persist
    and return the winning (groups_per_tile, block_n)."""
    import jax
    import jax.numpy as jnp
    from . import matmul as pk

    assert kind in ("fwd", "bwd"), kind
    kp, n = lin.k_padded, lin.out_features
    bits, gs = lin.bits, lin.groupsize
    hit = lookup(kind, kp, n, bits, gs, m)
    if hit is not None:
        return hit
    cands = candidates(kp, n, gs, bits)
    if not cands:
        return None
    mb = max(8, m_bucket(m))
    zs = (lin.zeros.astype(jnp.float32) * lin.scales.astype(jnp.float32)
          ).astype(lin.scales.dtype)
    x = jnp.ones((mb, kp if kind == "fwd" else n), jnp.bfloat16)
    wargs = (lin.qweight, lin.scales, zs)

    if kind == "fwd":
        def make(bg, bn):
            return lambda xx, qw, s, z: pk._qmm_2d(
                xx, qw, s, z, bits, gs, block_n=bn, block_groups=bg)
    else:  # grad-input: cotangent (m, N) -> dx (m, K)
        def make(bg, bn):
            return lambda gg, qw, s, z: pk._qmm_t_2d(
                gg, qw, s, z, bits, gs, block_n=bn, block_groups=bg)

    best = _race(make, cands, x, wargs, kind, kp, n, mb, iters, reps, log)
    if best is not None:
        store(kind, kp, n, bits, gs, m, best)
    return best


def _race(make, cands, x, wargs, kind, kp, n, mb, iters, reps, log):
    """Measure every candidate tiling, return the fastest (or None)."""
    timed = []
    for bg, bn in cands:
        try:
            t = measure(make(bg, bn), x, wargs, iters=iters, reps=reps)
        except Exception:
            continue  # OOM/unsupported tiling = inf, like the reference
        if log:
            log(f"  autotune {kind} K={kp} N={n} M={mb} "
                f"bg={bg} bn={bn}: {t * 1e6:.1f} us")
        timed.append((t, bg, bn))
    if not timed:
        return None
    # Near-tie resolution favors FEWER grid steps (large block_n): standalone
    # slope races cannot see in-model behavior, and many-step tilings lose
    # DMA overlap when interleaved with their neighbors in the full decode
    # program. Measured on 13B down_proj (round 5): (16,128) vs (8,1024) tie
    # standalone (58.5 vs ~60 us) but differ 107.6 vs ~62 us in-model
    # (bench_artifacts/r05/trace_13b_default.json, decode_variants_13b_down
    # .json — 15.15 vs 13.35 ms/token end to end).
    t_best = min(t for t, _, _ in timed)
    near = [(t, bg, bn) for t, bg, bn in timed if t <= 1.15 * t_best]
    _, bg, bn = max(near, key=lambda r: (r[2], -r[0]))
    if log and (bg, bn) != (timed[0][1], timed[0][2]):
        log(f"  autotune {kind} K={kp} N={n} M={mb}: pick bg={bg} bn={bn} "
            f"(largest block_n within 15% of fastest)")
    return (bg, bn)


def tune_mlp(gate, up, m: int, iters: int = 20, reps: int = 2,
             log=None) -> tuple | None:
    """Measure the fused gate/up MLP kernel's candidates (two packed streams
    per grid step) for one layer pair at row-bucket m; persist kind='mlp'."""
    import jax.numpy as jnp
    from . import mlp as mk

    kp, n = gate.k_padded, gate.out_features
    bits, gs = gate.bits, gate.groupsize
    hit = lookup("mlp", kp, n, bits, gs, m)
    if hit is not None:
        return hit
    cands = candidates(kp, n, gs, bits, n_weights=2)
    if not cands:
        return None
    mb = max(8, m_bucket(m))
    f32 = jnp.float32
    zsg = (gate.zeros.astype(f32) * gate.scales.astype(f32)
           ).astype(gate.scales.dtype)
    zsu = (up.zeros.astype(f32) * up.scales.astype(f32)
           ).astype(up.scales.dtype)
    x = jnp.ones((mb, kp), jnp.bfloat16)
    wargs = (gate.qweight, gate.scales, zsg, up.qweight, up.scales, zsu)

    def make(bg, bn):
        return lambda xx, qg, sg, zg, qu, su, zu: mk._fused_2d(
            xx, qg, sg, zg, qu, su, zu, bits, gs, block_n=bn, block_groups=bg)

    best = _race(make, cands, x, wargs, "mlp", kp, n, mb, iters, reps, log)
    if best is not None:
        store("mlp", kp, n, bits, gs, m, best)
    return best


def ensure_mlp_pairs(pairs, m: int, log=None):
    """Tune every distinct fused gate/up shape among (gate, up) pairs."""
    import jax
    if _mode() in ("0", "ro") or jax.default_backend() != "tpu":
        return
    from .mlp import supports_fused
    seen = set()
    for gate, up in pairs:
        if not supports_fused(gate, up):
            continue
        sig = (gate.k_padded, gate.out_features, gate.bits, gate.groupsize)
        if sig in seen:
            continue
        seen.add(sig)
        tune_mlp(gate, up, m, log=log)


def ensure_linears(linears, m: int, kind: str = "fwd", log=None):
    """Tune every distinct shape among `linears` at row-bucket m (first
    encounter measures, later calls hit the persistent cache). No-op unless
    running on a real TPU with autotuning enabled."""
    import jax
    if _mode() in ("0", "ro") or jax.default_backend() != "tpu":
        return
    from .matmul import supports
    seen = set()
    for lin in linears:
        if not supports(lin):
            continue
        sig = (lin.k_padded, lin.out_features, lin.bits, lin.groupsize)
        if sig in seen:
            continue
        seen.add(sig)
        tune_qmm(lin, m, kind=kind, log=log)

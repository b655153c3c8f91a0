"""Headline benchmark: LLaMA-7B INT4-g128 single-chip decode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no absolute tokens/s (its --benchmark prints median
per-token latency on an RTX3090, reference llama.py:385-438); the north-star
baseline is the chip's HBM roofline: decode is weight-bandwidth-bound, so
  roofline tok/s = achievable_HBM_bytes_per_s / bytes_read_per_token.
vs_baseline reports the fraction of that roofline achieved (target >= 0.85,
BASELINE.md). Achievable bandwidth is MEASURED once per chip with a robust
kernel-slope probe and PINNED in ROOFLINE.json (nominal peak is meaningless
through the axon subslice relay, and re-probing every run made the ratio's
denominator jitter +-10%). Weights are random in the real packed INT4-g128
wire layout — identical compute/memory behavior to a real checkpoint.

Timing methodology: N greedy decode steps run inside ONE compiled program
(lax.scan over the KV cache) — per-dispatch relay latency (~tens of ms here)
would otherwise swamp per-token numbers.
"""

import json
import os
import time

import numpy as np


def build_cfg(tiny: bool):
    from gptq_for_llama_tpu.models.config import ModelConfig
    if tiny:
        return ModelConfig(arch="llama", vocab_size=256, hidden_size=256,
                           intermediate_size=512, num_layers=2, num_heads=4,
                           num_kv_heads=4, head_dim=64, max_seq_len=256)
    if os.environ.get("BENCH_MODEL", "7b") == "13b":
        return ModelConfig(arch="llama", vocab_size=32000, hidden_size=5120,
                           intermediate_size=13824, num_layers=40,
                           num_heads=40, num_kv_heads=40, head_dim=128,
                           max_seq_len=2048)
    return ModelConfig(arch="llama", vocab_size=32000, hidden_size=4096,
                       intermediate_size=11008, num_layers=32, num_heads=32,
                       num_kv_heads=32, head_dim=128, max_seq_len=2048)


def random_packed_llama(cfg, dtype, groupsize=128, quant_head=False, bits=4):
    """Random weights directly in packed wire layout (fast: no pack step)."""
    import jax.numpy as jnp
    from gptq_for_llama_tpu.ops.linear import PackedLinear, dense

    rng = np.random.RandomState(0)
    shape_cache = {}

    def packed(k, n):
        # weight CONTENT is irrelevant to decode perf; one host array + one
        # upload per unique shape (layers are stacked into fresh device
        # buffers by the runner, so HBM traffic per token is still the full
        # model — this only accelerates bench setup)
        if (k, n) in shape_cache:
            return shape_cache[(k, n)]
        kp = -(-k // (8 * groupsize)) * (8 * groupsize)  # kernel K padding
        g = kp // groupsize
        if bits != 4:
            # non-nibble widths (BENCH_BITS=2/3/8): random wire buffers
            # through the REAL load transform (from_wire — which maps INT3
            # to the nibble device layout by default) so the kernel sees
            # exactly what a loaded checkpoint produces
            wire = rng.randint(-2**31, 2**31, size=(k * bits // 32, n),
                               dtype=np.int32)
            qz = rng.randint(-2**31, 2**31, size=(k // groupsize,
                                                  n * bits // 32),
                             dtype=np.int32)
            sc = (rng.rand(k // groupsize, n) * 0.004 + 0.001
                  ).astype(np.float16)
            gi = (np.arange(k) // groupsize).astype(np.int32)
            lin = PackedLinear.from_wire(wire, qz, sc, gi, bits=bits,
                                         dtype=dtype)
            shape_cache[(k, n)] = lin
            return lin
        qweight = rng.randint(-2**31, 2**31, size=(kp * bits // 32, n),
                              dtype=np.int32)
        scales = (rng.rand(g, n).astype(np.float32) * 0.004 + 0.001)
        from gptq_for_llama_tpu.ops.linear import HostBuf
        lin = PackedLinear(
            qweight=jnp.asarray(qweight),
            qzeros=HostBuf(np.zeros((k // groupsize, n * bits // 32),
                                    np.int32)),
            scales=jnp.asarray(scales, dtype=dtype),
            zeros=jnp.asarray(np.full((g, n), float(2 ** (bits - 1) - 1),
                                      np.float32), dtype=dtype),
            g_idx=HostBuf((np.arange(k) // groupsize).astype(np.int32)),
            perm=None, bias=None, bits=bits, groupsize=groupsize,
            in_features=k, out_features=n, layout="tpu")
        shape_cache[(k, n)] = lin
        return lin

    def emb(v, h, scale=0.02):
        return (rng.rand(v, h).astype(np.float32) * scale).astype(np.float32)

    import jax.numpy as jnp
    h, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_layernorm": jnp.ones((h,), dtype),
            "post_attention_layernorm": jnp.ones((h,), dtype),
            "self_attn": {
                "q_proj": packed(h, cfg.num_heads * cfg.head_dim),
                "k_proj": packed(h, cfg.num_kv_heads * cfg.head_dim),
                "v_proj": packed(h, cfg.num_kv_heads * cfg.head_dim),
                "o_proj": packed(cfg.num_heads * cfg.head_dim, h),
            },
            "mlp": {
                "gate_proj": packed(h, inter),
                "up_proj": packed(h, inter),
                "down_proj": packed(inter, h),
            },
        })
    return {
        "embed_tokens": jnp.asarray(emb(v, h), dtype),
        "layers": layers,
        "norm": jnp.ones((h,), dtype),
        # --quantize-lm-head equivalent (BENCH_QHEAD=1): INT4 head instead of
        # the reference's always-fp16 head (llama.py:270)
        "lm_head": packed(h, v) if quant_head
        else dense(jnp.asarray(emb(v, h).T * 0.02, dtype)),
    }


def bench_bits() -> int:
    """BENCH_BITS ∈ {2,3,4,8}: weight width for the decode bench (default 4).
    BASELINE.json configs[2] names 13B INT3-g128; BENCH_MODEL=13b BENCH_BITS=3
    runs that config on hardware."""
    b = int(os.environ.get("BENCH_BITS", "4"))
    if b not in (2, 3, 4, 8):
        raise ValueError(f"BENCH_BITS must be one of 2/3/4/8, got {b}")
    return b


def random_wire_llama(cfg, dtype, groupsize=128, bits=4):
    """Random weights in the WIRE format, loaded via PackedLinear.from_wire —
    the same layout-transform path a real checkpoint takes (BENCH_LOAD_PATH)."""
    import jax.numpy as jnp
    from gptq_for_llama_tpu.ops.linear import PackedLinear, dense

    rng = np.random.RandomState(0)
    shape_cache = {}

    def packed(k, n):
        if (k, n) in shape_cache:
            return shape_cache[(k, n)]
        g = k // groupsize
        qweight = rng.randint(-2**31, 2**31, size=(k * bits // 32, n),
                              dtype=np.int32)
        qzeros = rng.randint(-2**31, 2**31, size=(g, n * bits // 32),
                             dtype=np.int32)
        scales = (rng.rand(g, n) * 0.004 + 0.001).astype(np.float16)
        g_idx = (np.arange(k) // groupsize).astype(np.int32)
        lin = PackedLinear.from_wire(qweight, qzeros, scales, g_idx, bits=bits,
                                     dtype=dtype)
        shape_cache[(k, n)] = lin
        return lin

    h, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    emb = (rng.rand(v, h).astype(np.float32) * 0.02)
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_layernorm": jnp.ones((h,), dtype),
            "post_attention_layernorm": jnp.ones((h,), dtype),
            "self_attn": {
                "q_proj": packed(h, cfg.num_heads * cfg.head_dim),
                "k_proj": packed(h, cfg.num_kv_heads * cfg.head_dim),
                "v_proj": packed(h, cfg.num_kv_heads * cfg.head_dim),
                "o_proj": packed(cfg.num_heads * cfg.head_dim, h),
            },
            "mlp": {
                "gate_proj": packed(h, inter),
                "up_proj": packed(h, inter),
                "down_proj": packed(inter, h),
            },
        })
    return {"embed_tokens": jnp.asarray(emb, dtype), "layers": layers,
            "norm": jnp.ones((h,), dtype),
            "lm_head": dense(jnp.asarray(emb.T * 0.02, dtype))}


def checkpoint_roundtrip(cfg, params, dtype, stage):
    """BENCH_LOAD_PATH=1: drive the REAL checkpoint path at model scale —
    save a packed checkpoint to disk, reload through hf_loader (safetensors
    read + from_wire device-layout transforms), and bench the reloaded model."""
    import shutil
    import tempfile
    from gptq_for_llama_tpu.engine.checkpoint import save_packed
    from gptq_for_llama_tpu.models import hf_loader

    d = tempfile.mkdtemp(prefix="bench_ckpt_")
    t0 = time.perf_counter()
    save_packed(d, "llama", cfg, params)
    stage(f"checkpoint saved ({time.perf_counter() - t0:.1f}s, {d})")
    t0 = time.perf_counter()
    _, reloaded = hf_loader.load_params(d, seqlen=cfg.max_seq_len, dtype=dtype)
    stage(f"checkpoint reloaded via hf_loader ({time.perf_counter() - t0:.1f}s)")
    shutil.rmtree(d, ignore_errors=True)
    return reloaded


def model_weight_bytes(cfg, groupsize=128, quant_head=False, bits=4):
    """HBM bytes read per decode token: packed buffers + dense lm_head.

    Counts DEVICE bytes: INT3 checkpoints store 4-bit nibbles on device by
    default (ops/linear.PackedLinear.wire_bits), so their roofline divides
    by nibble traffic, not wire bytes."""
    dev_bits = bits
    if bits == 3 and os.environ.get("GPTQ_TPU_INT3_PLANES", "") != "1":
        dev_bits = 4
    h, inter = cfg.hidden_size, cfg.intermediate_size
    qh = cfg.num_heads * cfg.head_dim
    kvh = cfg.num_kv_heads * cfg.head_dim
    shapes = [(h, qh), (h, kvh), (h, kvh), (qh, h),
              (h, inter), (h, inter), (inter, h)]
    per_layer = sum(k * n * dev_bits // 8           # packed codes
                    + (k // groupsize) * n * 2 * 2  # scales + zeros (bf16)
                    for k, n in shapes)
    lm_head = cfg.vocab_size * h * 2                # bf16 dense
    if quant_head:
        lm_head = (h * cfg.vocab_size * dev_bits // 8
                   + (h // groupsize) * cfg.vocab_size * 2 * 2)
    return cfg.num_layers * per_layer + lm_head


HW_PEAK_GBPS = 819.0  # v5e nominal HBM bandwidth (no derate)


def _probe_one(lin, m: int, samples: int, iters: int = 100):
    """Median slope-timed bandwidth (GB/s) of the tuned production dispatch
    on one packed layer at row count m. Slope method (u=1 vs u=9 chained
    calls) cancels the relay per-iteration floor; the median of `samples`
    interleaved estimates defends against relay jitter (single-slope
    estimates move +-10% run to run)."""
    import jax
    import jax.numpy as jnp
    from gptq_for_llama_tpu.ops.pallas import autotune as at
    from gptq_for_llama_tpu.ops.pallas.matmul import quant_matmul_pallas

    at.tune_qmm(lin, m, "fwd", log=None)
    x = jnp.ones((m, lin.in_features), jnp.bfloat16)
    wbytes = lin.qweight.size * 4 + lin.scales.size * 2 + lin.zeros.size * 2

    def make_loop(unroll):
        @jax.jit
        def loop(x0, lin_):
            # weights as jit ARGUMENTS, not baked constants (CLAUDE.md)
            def body(i, c):
                for _ in range(unroll):
                    y = quant_matmul_pallas(c, lin_)
                    c = x0 + 1e-12 * jnp.sum(y).astype(x0.dtype)
                return c

            return jax.lax.fori_loop(0, iters, body, x0)

        wrapped = lambda x0: loop(x0, lin)
        np.asarray(wrapped(x))  # compile + warm
        return wrapped

    loop1, loop9 = make_loop(1), make_loop(9)

    def best_of(loop, reps=3):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(x))
            best = min(best, time.perf_counter() - t0)
        return best

    bws = []
    for _ in range(samples):
        per_call = (best_of(loop9) - best_of(loop1)) / (iters * 8)
        bws.append(wbytes / max(per_call, 1e-9) / 1e9)
    return float(np.median(bws))


def probe_hbm_bw(samples: int = 3):
    """Measured achievable weight-stream bandwidth (GB/s): the BEST of the
    production tuned dequant-GEMM over the shapes the committed sweeps show
    sustain the highest rates (round-4 verdict: the old single-shape m=8
    basis of 597 GB/s sat below what the kernels demonstrably reach — qkv
    755, down 648-666 GB/s — flattering vs_baseline). Each candidate is
    slope-timed; the basis is the max of the per-candidate medians, and the
    per-candidate numbers are pinned alongside it for transparency.
    """
    from gptq_for_llama_tpu.ops.linear import HostBuf, PackedLinear
    import jax.numpy as jnp

    gs = 128
    rng = np.random.RandomState(7)

    def packed(k, n):
        g = k // gs
        return PackedLinear(
            qweight=jnp.asarray(rng.randint(-2**31, 2**31,
                                            size=(k * 4 // 32, n),
                                            dtype=np.int32)),
            qzeros=HostBuf(np.zeros((g, n * 4 // 32), np.int32)),
            scales=jnp.asarray(rng.rand(g, n).astype(np.float32) * 0.004,
                               jnp.bfloat16),
            zeros=jnp.asarray(np.full((g, n), 7.0, np.float32), jnp.bfloat16),
            g_idx=HostBuf((np.arange(k) // gs).astype(np.int32)),
            perm=None, bias=None, bits=4, groupsize=gs,
            in_features=k, out_features=n, layout="tpu")

    cands = {"qkv_m1": (4096, 12288, 1), "qkv_m8": (4096, 12288, 8),
             "down_m1": (11008, 4096, 1)}
    results = {}
    for name, (k, n, m) in cands.items():
        # clamp each to the physically plausible band (v5e nominal 819)
        results[name] = round(
            float(np.clip(_probe_one(packed(k, n), m, samples), 100.0,
                          HW_PEAK_GBPS * 1.05)), 1)
    return max(results.values()), results


ROOFLINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "ROOFLINE.json")


def pinned_roofline_bw(stage=lambda *_: None):
    """The roofline denominator, PINNED per chip: calibrated once with the
    robust probe and persisted to ROOFLINE.json so vs_baseline is stable
    across runs (the tok/s numerator is the only thing that moves).
    BENCH_RECALIBRATE=1 forces a fresh calibration.
    """
    if os.environ.get("BENCH_RECALIBRATE", "") != "1":
        try:
            with open(ROOFLINE_PATH) as f:
                rec = json.load(f)
            stage(f"roofline basis: {rec['achievable_gbps']} GB/s "
                  f"(pinned, {ROOFLINE_PATH})")
            return float(rec["achievable_gbps"])
        except (OSError, KeyError, ValueError):
            pass
    bw, cands = probe_hbm_bw()
    rec = {
        "achievable_gbps": round(bw, 1),
        "candidates_gbps": cands,
        "hw_peak_gbps": HW_PEAK_GBPS,
        "method": "max over candidate (shape, m) configs of the median of 3 "
                  "slope estimates (u=9 vs u=1 chained calls, 100-iter fori "
                  "loops, best-of-3 each) of the production tuned fused "
                  "dequant-GEMM on INT4-g128 layers (7B qkv m=1/m=8, down "
                  "m=1); re-pinned round 5 against the best kernel config "
                  "instead of the single m=8 shape (which sat below what "
                  "the kernels sustain)",
        "chip": "v5e via axon relay",
    }
    try:
        with open(ROOFLINE_PATH, "w") as f:
            json.dump(rec, f, indent=2)
    except OSError:
        pass
    stage(f"roofline basis: {rec['achievable_gbps']} GB/s (freshly "
          f"calibrated; candidates {cands})")
    return bw


def _relay_alive(stage=lambda *_: None) -> bool:
    """Probe the TPU relay in a SUBPROCESS with a hard per-attempt timeout,
    retrying across a long window.

    A dead axon relay makes backend init HANG (not raise), which would wedge
    the whole bench run; probing out-of-process lets the parent fall back to
    the CPU tiny bench and still emit a JSON line. Relay init latency is
    highly variable (measured: <10 s to >120 s minutes apart) AND the relay
    goes through multi-minute unreachable windows — round 4's official record
    was lost to one such window with only 2x240 s of patience. So: keep
    probing every BENCH_PROBE_TIMEOUT (180 s) seconds for up to
    BENCH_PROBE_WINDOW (1800 s) of wall clock, stage-logging every attempt so
    a final CPU fallback is attributable to a specific sequence of failures.
    """
    import subprocess
    import sys
    timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "180"))
    window = float(os.environ.get("BENCH_PROBE_WINDOW", "1800"))
    pause = float(os.environ.get("BENCH_PROBE_PAUSE", "20"))
    code = ("import jax, numpy as np, jax.numpy as jnp;"
            "x = jnp.ones((8, 128));"
            "np.asarray(x @ x.T); print('RELAY_OK')")
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        ta = time.time()
        err = ""
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                               capture_output=True, text=True)
            if "RELAY_OK" in r.stdout:
                stage(f"relay probe attempt {attempt}: OK "
                      f"({time.time() - ta:.0f}s)")
                return True
            err = (r.stderr or "").strip().splitlines()[-1:] or ["no output"]
            err = f"exit {r.returncode}: {err[0][:120]}"
        except subprocess.TimeoutExpired:
            err = f"timed out after {timeout:.0f}s"
        except Exception as e:  # pragma: no cover - defensive
            err = repr(e)[:160]
        elapsed = time.time() - t0
        stage(f"relay probe attempt {attempt} FAILED ({err}); "
              f"{elapsed:.0f}s/{window:.0f}s of probe window used")
        if elapsed + pause + timeout > window:
            stage(f"relay probe window exhausted after {attempt} attempts")
            return False
        time.sleep(pause)


def main():
    import sys

    def stage(msg, _t=[time.perf_counter()]):
        now = time.perf_counter()
        print(f"[bench +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
        _t[0] = now

    force_cpu = False
    if os.environ.get("BENCH_TINY", "") != "1" \
            and os.environ.get("BENCH_SKIP_PROBE", "") != "1":
        if not _relay_alive(stage):
            stage("TPU relay unreachable (probe window exhausted): "
                  "falling back to the CPU tiny bench")
            force_cpu = True

    import jax
    if force_cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    from gptq_for_llama_tpu.runtime import ModelRunner

    try:  # persistent compile cache: driver re-runs skip the big compiles
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    backend = jax.default_backend()
    tiny = os.environ.get("BENCH_TINY", "") == "1" or backend == "cpu"
    cfg = build_cfg(tiny)
    bits = bench_bits()
    dtype = jnp.bfloat16 if backend != "cpu" else jnp.float32
    quant_head = os.environ.get("BENCH_QHEAD", "") == "1"
    if quant_head and os.environ.get("BENCH_LOAD_PATH", "") == "1":
        # the wire-checkpoint builder has a dense head only; keep the
        # roofline denominator consistent with what actually runs
        stage("BENCH_QHEAD ignored in BENCH_LOAD_PATH mode (dense head)")
        quant_head = False
    stage(f"backend={backend} tiny={tiny} bits={bits} qhead={quant_head}; "
          "building weights")
    if os.environ.get("BENCH_LOAD_PATH", "") == "1":
        params = random_wire_llama(cfg, dtype, bits=bits)
        jax.block_until_ready(params["embed_tokens"])
        params = checkpoint_roundtrip(cfg, params, dtype, stage)
    else:
        params = random_packed_llama(cfg, dtype, quant_head=quant_head,
                                     bits=bits)
    jax.block_until_ready(params["embed_tokens"])
    stage("weights on device")

    max_len = 256 if not tiny else 64
    runner = ModelRunner("llama", cfg, params, batch_size=1,
                         max_seq_len=max_len, dtype=dtype,
                         fuse_qkv=os.environ.get("BENCH_FUSE_QKV", "") == "1")

    if backend == "tpu" and not tiny:
        # measured kernel autotune at the decode row bucket (persists in the
        # cache dir; later runs and the runner's own lookups hit it). Tune
        # the RUNNER's params — after fuse_qkv, so the fused 4096x12288
        # projection shape is measured too, not just the unfused shapes.
        from gptq_for_llama_tpu.ops.pallas import autotune as at
        from gptq_for_llama_tpu.runtime.runner import (collect_mlp_pairs,
                                                       collect_packed_linears)
        at.ensure_linears(collect_packed_linears(runner.params), 8,
                          log=lambda m: stage(m))
        at.ensure_mlp_pairs(collect_mlp_pairs(runner.params), 8,
                            log=lambda m: stage(m))
        stage("kernel autotune ensured")
    cache = runner.init_cache()
    # seed the cache teacher-forced through the (fast-compiling) decode step —
    # the unrolled-layers prefill program takes ~20 min through the remote
    # compile service, the decode scan ~13 s
    logits, cache = runner.forced_decode_scan(jnp.zeros((1, 16), jnp.int32),
                                              cache)
    np.asarray(logits[:1, :1, :1])
    stage("prompt fed via decode scan")
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)

    steps = 64 if not tiny else 8
    toks, c2 = runner.decode_greedy_scan(tok, cache, steps)  # compile
    np.asarray(toks)
    stage(f"decode scan ({steps} steps) compiled + ran")
    dt = np.inf
    for _ in range(3):  # best-of-3 against relay jitter
        t0 = time.perf_counter()
        toks, _ = runner.decode_greedy_scan(tok, cache, steps)
        np.asarray(toks)  # host readback = true completion on the relay
        dt = min(dt, (time.perf_counter() - t0) / steps)
    tok_s = 1.0 / dt
    stage(f"timed: {dt * 1e3:.2f} ms/token")

    bw = pinned_roofline_bw(stage) if backend != "cpu" else 10.0
    wbytes = model_weight_bytes(cfg, quant_head=quant_head, bits=bits)
    roofline = bw * 1e9 / wbytes
    # honest dual reporting (round-4 verdict): vs_baseline against the PINNED
    # measured-achievable basis, vs_hw_peak against the 819 GB/s v5e nominal
    # HBM peak (no derate) — the second can only be lower
    hw_peak = HW_PEAK_GBPS * 1e9 / wbytes if backend != "cpu" else roofline
    size = "13b" if os.environ.get("BENCH_MODEL", "7b") == "13b" else "7b"
    print(json.dumps({
        "metric": ("tiny_llama_int4_decode_tokens_per_s" if tiny else
                   f"llama{size}_int{bits}g128_decode_tokens_per_s_chip"),
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / roofline, 4),
        "vs_hw_peak": round(tok_s / hw_peak, 4),
    }))


if __name__ == "__main__":
    import sys
    import traceback
    try:
        main()
    except Exception:
        # the driver records the LAST json line; never exit without one
        traceback.print_exc(file=sys.stderr)
        if os.environ.get("BENCH_TINY") != "1":
            os.environ["BENCH_TINY"] = "1"
            try:
                main()
            except Exception:
                traceback.print_exc(file=sys.stderr)
                print(json.dumps({"metric": "bench_failed", "value": 0,
                                  "unit": "tok/s", "vs_baseline": 0.0}))
        else:
            print(json.dumps({"metric": "bench_failed", "value": 0,
                              "unit": "tok/s", "vs_baseline": 0.0}))

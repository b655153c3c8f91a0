#!/bin/bash
# Round-5 on-chip capture: validation + perf artifacts.
# Results land in bench_artifacts/r05/ (committed) — run from repo root.
set -u
mkdir -p bench_artifacts/r05
cd "$(dirname "$0")/.."
L=bench_artifacts/r05

# 1. hardware-gated attention paths (now incl. the round-4 HTTP-500 blanks:
#    blocked flash at S=8192 and fp8 MHA decode) with the integer fp8 upcast
timeout 1700 python scripts/attn_onchip.py --out $L/attn_validate.json \
  2>$L/attn_validate.log
tail -3 $L/attn_validate.log >&2

# 2. fp8 upcast strategy probe (native vs integer bit math vs packed words)
timeout 1700 python scripts/fp8_upcast_probe.py --out $L/fp8_upcast.json \
  2>$L/fp8_upcast.log

# 3. roofline recalibration (round-4 verdict: re-pin against the best
#    production kernel config) + 7B decode bench at the new basis
BENCH_RECALIBRATE=1 timeout 2400 python bench.py 2>$L/bench7b.log \
  | tee $L/bench_7b.json

# 4. 13B decode bench: baseline, fused-QKV, and the named INT3-g128 config
#    (BASELINE.json configs[2]) on hardware
BENCH_MODEL=13b timeout 2400 python bench.py 2>$L/bench13b.log \
  | tee $L/bench_13b.json
BENCH_MODEL=13b BENCH_FUSE_QKV=1 timeout 2400 python bench.py \
  2>$L/bench13b_fuse.log | tee $L/bench_13b_fuse.json
BENCH_MODEL=13b BENCH_BITS=3 timeout 2400 python bench.py \
  2>$L/bench13b_int3.log | tee $L/bench_13b_int3.json

# 5. kernel sweeps at the non-headline widths (2/3/8-bit) + 13B 3-bit
timeout 1700 python scripts/kbench_json.py --bits 3 --model 13b \
  --out $L/kbench_13b_int3.json 2>$L/kbench_int3.log
timeout 1700 python scripts/kbench_json.py --bits 2 \
  --out $L/kbench_int2.json 2>$L/kbench_int2.log
timeout 1700 python scripts/kbench_json.py --bits 8 \
  --out $L/kbench_int8.json 2>$L/kbench_int8.log

# 6. serving grid with realistic workloads: long prompts (512/2048),
#    chunked prefill on/off, TTFT p50/p95, fp8 at equal slots
timeout 3000 python scripts/serve_bench.py \
  --grid "8:32:1:bf16:512:0;8:32:1:bf16:512:256;8:32:1:fp8:512:256;4:32:1:bf16:2048:256;4:32:1:fp8:2048:256" \
  --max-new 64 --json $L/serve_r05.json 2>$L/serve.log
tail -8 $L/serve.log >&2

# 7. 7B-scale GPTQ quantization wall clock (32 layers x 128 samples)
timeout 5400 python scripts/quantize7b_bench.py \
  --out $L/quantize_7b.json 2>$L/quantize7b.log
tail -3 $L/quantize7b.log >&2

echo "=== r05 capture done ===" >&2
for f in $L/*.json; do echo "$f: $(head -c 200 $f)"; done

# ---- round-5 second capture wave (after the decode-perf work) -------------
# Decode perf forensics + fixes (see bench_artifacts/r05/ for artifacts):
#   BENCH_MODEL=13b python scripts/attn13b_probe2.py   # production decomp
#   BENCH_MODEL=13b python scripts/decode_trace.py     # xplane attribution
#   BENCH_MODEL=13b python scripts/decode_variants.py  # in-model sweeps
#   python scripts/fused_slope.py                      # aliasing forensics
# Official re-benches at the fixed tilings:
#   BENCH_MODEL=13b python bench.py                    # 82.2 tok/s, 0.906
#   BENCH_MODEL=13b BENCH_BITS=3 python bench.py       # 82.2 tok/s, 0.907
#   python bench.py                                    # 7B 157.1, 0.907
# Realistic serving grid (TTFT p50/p95, long prompts, fp8 at equal slots):
#   python scripts/serve_bench.py --grid "24:32:1:bf16:16:0;24:32:1:fp8:16:0;8:32:1:bf16:512:0;8:32:1:bf16:512:256;8:32:1:fp8:512:256;4:32:1:bf16:2048:256;4:32:1:fp8:2048:256" \
#     --max-new 64 --json bench_artifacts/r05/serve_r05.json
# 7B-scale GPTQ wall clock (verdict item 8):
#   python scripts/quantize7b_bench.py --out bench_artifacts/r05/quantize_7b.json

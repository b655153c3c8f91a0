#!/bin/bash
# Round-2 on-chip perf sequence (run when the axon relay is back).
# Each stage prints its JSON line; results land in /tmp/r02/.
set -u
mkdir -p /tmp/r02
cd "$(dirname "$0")/.."

run() {  # run NAME ENV... -- writes stderr log + json line
  name="$1"; shift
  echo "=== $name ($*) ===" >&2
  env "$@" timeout 1700 python bench.py 2>/tmp/r02/$name.log | tee /tmp/r02/$name.json
  tail -3 /tmp/r02/$name.log >&2
}

# 1. baseline: pins ROOFLINE.json on first run + measured autotune (cached)
run baseline
# 2. fused QKV (one 4096x12288 stream replaces three launches)
run fuse BENCH_FUSE_QKV=1
# 3. token-unroll sweep (current default 4)
run unroll8 GPTQ_TPU_TOKEN_UNROLL=8
run fuse_unroll8 BENCH_FUSE_QKV=1 GPTQ_TPU_TOKEN_UNROLL=8
# 4. informational: quantized lm_head (different roofline denominator)
run qhead BENCH_QHEAD=1
echo "=== results ==="
for f in /tmp/r02/*.json; do echo "$f: $(cat $f)"; done

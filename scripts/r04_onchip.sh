#!/bin/bash
# Round-4 on-chip capture: gated-path validation + perf artifacts.
# Results land in bench_artifacts/r04/ (committed) — run from repo root.
set -u
mkdir -p bench_artifacts/r04
cd "$(dirname "$0")/.."
L=bench_artifacts/r04

# 1. hardware-gated attention paths: fp8 KV (dense/paged/blocked-flash),
#    pool-native paged decode, blocked flash at S=8192 — real Mosaic
timeout 1700 python scripts/attn_onchip.py --out $L/attn_validate.json \
  2>$L/attn_validate.log
tail -3 $L/attn_validate.log >&2

# 2. kernel sweep artifact (production tuned dispatch, 7B shapes)
timeout 1700 python scripts/kbench_json.py --out $L/kbench.json \
  2>$L/kbench.log
tail -3 $L/kbench.log >&2

# 3. serving grid artifact (slots x span x paged x fp8)
timeout 3000 python scripts/serve_bench.py \
  --grid "8:1:0:bf16;8:32:0:bf16;24:32:0:bf16;24:32:1:bf16;24:32:1:fp8" \
  --max-new 64 --json $L/serve.json 2>$L/serve.log
tail -6 $L/serve.log >&2

# 4. 13B decode bench (driver-capturable metric, separate artifact)
BENCH_MODEL=13b timeout 1700 python bench.py 2>$L/bench13b.log \
  | tee $L/bench_13b.json
tail -3 $L/bench13b.log >&2

echo "=== r04 capture done ===" >&2
for f in $L/*.json; do echo "$f: $(head -c 300 $f)"; done

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
# 5. fp8 KV on real Mosaic: min tile for fp8 is (32,128) sublanes — verify the
#    decode kernels compile with fp8 cache blocks (ht<32); if Mosaic rejects,
#    gate supports_decode_attention/supports_paged_decode/flash on cache dtype
timeout 900 python - <<'EOF'
import jax, numpy as np, jax.numpy as jnp
from gptq_for_llama_tpu.ops.pallas.attention import decode_attention
q = jnp.ones((1, 1, 32, 128), jnp.bfloat16)
c = jnp.zeros((1, 256, 32, 128), jnp.float8_e4m3fn)
out = np.asarray(decode_attention(q, c, c, jnp.int32(5), 0.088))
print("fp8 decode kernel OK", out.shape)
EOF
echo "=== results ==="
for f in /tmp/r02/*.json; do echo "$f: $(cat $f)"; done

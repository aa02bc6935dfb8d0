#!/bin/bash
# Serialized on-chip measurement queue — run by tools/wait_tunnel.py when
# the axon tunnel recovers (the tunnel serializes access; run everything
# in ONE job).  Each step logs to its own /tmp file; every step is safe
# to re-run (compile cache under JAX_CACHE_DIR makes reruns cheap).
cd "$(dirname "$0")/.."
export JAX_CACHE_DIR=/tmp/jax_cache
set -x
# 1. bf16 baseline bench (fast: cached executable)
timeout 2400 python bench.py > /tmp/q1_bench_bf16.log 2>&1
# 2. int8-vit bench
BENCH_QUANT=int8-vit timeout 2400 python bench.py > /tmp/q2_bench_int8vit.log 2>&1
# 3. int8-vit full-dims parity
QP_SCOPE=vit timeout 3600 python benchmarks/quant_parity_tpu.py > /tmp/q3_parity_vit.log 2>&1
# 4. ViT attention variant A/B (tmajor vs current)
timeout 3600 python benchmarks/vit_attn_variants.py > /tmp/q4_vit_variants.log 2>&1
# 5. judge decode with weight-only int8
timeout 3600 python benchmarks/judge_decode_tpu.py --quant int8-wo > /tmp/q5_judge_wo.log 2>&1
# 6. Qwen2-VL-7B single-chip int8 judge
timeout 5400 python benchmarks/judge7b_int8_tpu.py > /tmp/q6_judge7b.log 2>&1
echo QUEUE_DONE
# 7. int4 judge decode A/B: XLA dequant vs Pallas VMEM-dequant GEMV
timeout 3600 python benchmarks/judge_decode_tpu.py --quant int4-wo > /tmp/q7_judge_int4_xla.log 2>&1
MJV_Q4_PALLAS=1 timeout 3600 python benchmarks/judge_decode_tpu.py --quant int4-wo > /tmp/q8_judge_int4_pallas.log 2>&1
# 9. the 26B single-chip int4 judge (longest: 13GB upload + big compile)
timeout 7200 python benchmarks/judge26b_int4_tpu.py > /tmp/q9_judge26b.log 2>&1
echo QUEUE_DONE_ALL
# 10. int8 KV-cache decode A/B (vs step 5's bf16-cache runs)
timeout 3600 python benchmarks/judge_decode_tpu.py --kv-quant > /tmp/q10_judge_kvq.log 2>&1
# 11. 26B int4 judge WITH int8 KV cache (capacity + step-time A/B vs q9)
timeout 7200 python benchmarks/judge26b_int4_tpu.py --kv-quant > /tmp/q11_judge26b_kvq.log 2>&1
echo QUEUE_DONE_KVQ
# 12. prefix-KV-cache A/B for the InternVL judge rubric loop
timeout 3600 python benchmarks/judge_prefix_tpu.py > /tmp/q12_judge_prefix.log 2>&1
echo QUEUE_DONE_PREFIX
# 13. 26B long-video capacity demo: 32 frames (~8.3k tokens) int4 weights
#     + int8 KV cache on one chip
timeout 7200 python benchmarks/judge26b_int4_tpu.py --frames 32 --kv-quant > /tmp/q13_judge26b_long.log 2>&1
echo QUEUE_DONE_LONG

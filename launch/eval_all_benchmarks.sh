#!/usr/bin/env bash
# Run the reward model over all four benchmarks (replaces the eval script zoo).
set -euo pipefail
CKPT=${CKPT:-./checkpoints/stage3}
python -m mjvideo_tpu.eval.cli --benchmark overall  --data-json datas/test.json --video-root datas/videos --model-path "$CKPT" --results results/overall.jsonl
python -m mjvideo_tpu.eval.cli --benchmark aspects  --data-json datas/test.json --video-root datas/videos --model-path "$CKPT" --results results/aspects.jsonl
python -m mjvideo_tpu.eval.cli --benchmark safesora --data-json Safesora/config-test.json --video-root Safesora/videos --model-path "$CKPT" --results results/safesora.jsonl
python -m mjvideo_tpu.eval.cli --benchmark genai    --model-path "$CKPT" --results results/genai.jsonl

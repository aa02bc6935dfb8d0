#!/usr/bin/env bash
# Three-stage training chain (replaces scripts/train/*.sh slurm+accelerate
# launchers — no launcher ceremony on TPU; JAX discovers the mesh).
set -euo pipefail

MODEL=${MODEL:-/path/to/InternVL2-2B}
DATA=${DATA:-datas/train.json}
OUT=${OUT:-./checkpoints}

python -m mjvideo_tpu.train.cli --stage 1 --train-json "$DATA" \
  --model-path "$MODEL" --output-dir "$OUT/stage1" "$@"

S1=$(ls -d "$OUT"/stage1/stage1_step* | sort -V | tail -1)
python -m mjvideo_tpu.train.cli --stage 2 --train-json "$DATA" \
  --model-path "$MODEL" --warm-start "$S1" --output-dir "$OUT/stage2" "$@"

S2=$(ls -d "$OUT"/stage2/stage2_step* | sort -V | tail -1)
python -m mjvideo_tpu.train.cli --stage 3 --train-json "$DATA" \
  --model-path "$MODEL" --warm-start "$S2" --output-dir "$OUT/stage3" "$@"

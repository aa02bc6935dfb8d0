#!/usr/bin/env bash
# One-command reproduction of the reference README leaderboards
# (/root/reference/README.md:145-188) from this framework's eval CLI.
#
# Real mode (default) needs the real inputs the reference needed:
#   CKPT          MJ-VIDEO reward checkpoint dir (config.json + safetensors)
#   DATA_JSON     MJ-BENCH-VIDEO pair records (datas/test.json)
#   VIDEO_ROOT    MJ-BENCH-VIDEO videos dir
#   SAFESORA_JSON SafeSora-test records (Safesora/config-test.json)
#   SAFESORA_ROOT SafeSora videos dir
#   JUDGE_<FAM>   optional baseline judge checkpoint dirs:
#                 JUDGE_INTERNVL / JUDGE_QWEN2VL / JUDGE_MINICPMV /
#                 JUDGE_COGVLM2 / JUDGE_VIDEOSCORE (each: HF safetensors
#                 dir with config.json + tokenizer)
#   RESULTS_DIR   output dir (default ./results/reproduce)
#
# Hermetic mode (./launch/reproduce.sh --hermetic) exercises the SAME
# command plumbing end-to-end on synthetic tiny data + random-init tiny
# checkpoints with the dependency-free ByteTokenizer — wired into
# tests/test_dataset.py so the mapping below cannot rot.  Numbers are
# meaningless there; only the plumbing is under test.
#
# Table mapping (reference README.md):
#  * Fine-grained table (:150-161) —
#      MJ-VIDEO row:     `--benchmark aspects` (scorer). Output keys:
#                        aspects[].accuracy/f1 = "(Acc)"/"(F1)" columns;
#                        aspect_preference[].strict = "(strict)" columns.
#      baseline rows:    `--benchmark fine-grained --judge <family>`
#                        (per-category/subcategory RATING prompts).
#  * Overall-preference table (:165-182) —
#      MJ-VIDEO row:     `--benchmark overall|safesora` (scorer) +
#                        `--benchmark genai` (scorer). Output keys:
#                        strict / tie_aware; genai: accuracy (sign-based,
#                        the reference MJ-Video genai metric).
#      baseline rows:    same benchmarks with `--judge <family>`
#                        (RATING judges) or `--judge videoscore`
#                        (regression judge, good-threshold 2).
#  * VBench / human-eval table (:184-188) — NOT reproducible from either
#    repo: it scores videos produced by a VADER-finetuned VideoCrafter2
#    with external pipelines (VBench + human raters). The reward-feedback
#    hook that training used is `RewardScorer.score_fn` /
#    examples/vader_loop.py (SURVEY.md §7.1 step 9).
set -euo pipefail
cd "$(dirname "$0")/.."

HERMETIC=0
[[ "${1:-}" == "--hermetic" ]] && HERMETIC=1

RESULTS_DIR=${RESULTS_DIR:-./results/reproduce}
mkdir -p "$RESULTS_DIR"

EXTRA=()
if [[ $HERMETIC == 1 ]]; then
  WORK=$(mktemp -d)
  echo "hermetic mode: synthetic data + tiny random checkpoints in $WORK"
  python examples/make_sample_data.py --out "$WORK/data" --pairs 2
  python - "$WORK" <<'PY'
import json
import os
import sys

import jax

if os.environ.get("MJV_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MJV_PLATFORM"])

from mjvideo_tpu.configs import reward_config_to_hf, tiny_test_config
from mjvideo_tpu.models.internvl import init_chat_params
from mjvideo_tpu.models.reward import init_reward_params
from mjvideo_tpu.utils.export import (
    export_chat,
    export_reward_checkpoint,
    save_safetensors,
)

work = sys.argv[1]
cfg = tiny_test_config()
import os

os.makedirs(f"{work}/reward_ckpt", exist_ok=True)
os.makedirs(f"{work}/judge_ckpt", exist_ok=True)
save_safetensors(
    export_reward_checkpoint(
        init_reward_params(jax.random.PRNGKey(0), cfg), cfg),
    f"{work}/reward_ckpt/model.safetensors")
with open(f"{work}/reward_ckpt/config.json", "w") as f:
    json.dump(reward_config_to_hf(cfg), f)
save_safetensors(
    export_chat(init_chat_params(jax.random.PRNGKey(1), cfg.chat,
                                 with_lm_head=True), cfg.chat),
    f"{work}/judge_ckpt/model.safetensors")
with open(f"{work}/judge_ckpt/config.json", "w") as f:
    json.dump(reward_config_to_hf(cfg), f)
print("tiny checkpoints exported")
PY
  CKPT="$WORK/reward_ckpt"
  DATA_JSON="$WORK/data/pairs.json"
  VIDEO_ROOT="$WORK/data/videos"
  SAFESORA_JSON="$WORK/data/safesora.json"  # from make_sample_data.py
  SAFESORA_ROOT="$WORK/data/videos"
  JUDGE_INTERNVL="$WORK/judge_ckpt"
  RESULTS_DIR="$WORK/results"
  mkdir -p "$RESULTS_DIR"
  EXTRA=(--byte-tokenizer --num-segments 2 --fp32)
fi

: "${CKPT:?set CKPT to the MJ-VIDEO reward checkpoint dir}"
: "${DATA_JSON:?set DATA_JSON to the MJ-BENCH-VIDEO records json}"
: "${VIDEO_ROOT:?set VIDEO_ROOT to the MJ-BENCH-VIDEO videos dir}"

run() {  # run <results-name> <cli args...>
  local name=$1; shift
  echo "== $name"
  python -m mjvideo_tpu.eval.cli "$@" \
    --results "$RESULTS_DIR/$name.jsonl" | tee "$RESULTS_DIR/$name.json"
}

# ---- fine-grained table, MJ-VIDEO row (README.md:150-161) ----
run aspects_mjvideo --benchmark aspects --model-path "$CKPT" \
    --data-json "$DATA_JSON" --video-root "$VIDEO_ROOT" "${EXTRA[@]}"

# ---- overall table, MJ-VIDEO rows (README.md:165-182) ----
run overall_mjvideo --benchmark overall --model-path "$CKPT" \
    --data-json "$DATA_JSON" --video-root "$VIDEO_ROOT" "${EXTRA[@]}"

if [[ -n "${SAFESORA_JSON:-}" ]]; then
  run safesora_mjvideo --benchmark safesora --model-path "$CKPT" \
      --data-json "$SAFESORA_JSON" --video-root "${SAFESORA_ROOT:-}" \
      "${EXTRA[@]}"
fi
if [[ $HERMETIC == 0 ]]; then
  # GenAI-Bench streams from the HF hub (TIGER-Lab/GenAI-Bench)
  run genai_mjvideo --benchmark genai --model-path "$CKPT" "${EXTRA[@]}"
fi

# ---- baseline judge rows (any judge checkpoint that was provided) ----
for fam in internvl:JUDGE_INTERNVL qwen2vl:JUDGE_QWEN2VL \
           minicpmv:JUDGE_MINICPMV cogvlm2:JUDGE_COGVLM2; do
  name=${fam%%:*}; var=${fam##*:}
  ckpt=${!var:-}
  [[ -z "$ckpt" ]] && continue
  flag=$name
  [[ $name == internvl ]] && flag=internvl-chat
  [[ $name == qwen2vl ]] && flag=qwen2-vl
  [[ $name == minicpmv ]] && flag=minicpm-v
  run "overall_$name" --benchmark overall --judge "$flag" \
      --judge-model "$ckpt" --data-json "$DATA_JSON" \
      --video-root "$VIDEO_ROOT" "${EXTRA[@]}"
  if [[ $HERMETIC == 0 ]]; then
    run "fine_grained_$name" --benchmark fine-grained --judge "$flag" \
        --judge-model "$ckpt" --data-json "$DATA_JSON" \
        --video-root "$VIDEO_ROOT" "${EXTRA[@]}"
  else
    # hermetic: the full rubric loop (34 prompts/pair, prefix cache on)
    # through ONE pair of ONE family — the most complex eval path stays
    # under the same rot-proofing (VERDICT r4 item 7)
    run "fine_grained_$name" --benchmark fine-grained --judge "$flag" \
        --judge-model "$ckpt" --data-json "$DATA_JSON" \
        --video-root "$VIDEO_ROOT" --limit 1 "${EXTRA[@]}"
  fi
done
if [[ -n "${JUDGE_VIDEOSCORE:-}" ]]; then
  run overall_videoscore --benchmark overall --judge videoscore \
      --judge-model "$JUDGE_VIDEOSCORE" --data-json "$DATA_JSON" \
      --video-root "$VIDEO_ROOT"
  run genai_videoscore --benchmark genai --judge videoscore \
      --judge-model "$JUDGE_VIDEOSCORE"
fi

echo "reproduction results in $RESULTS_DIR"
[[ $HERMETIC == 1 ]] && echo "HERMETIC_OK"
exit 0

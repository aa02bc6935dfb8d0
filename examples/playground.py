"""End-to-end playground: the ``moe-playground.ipynb`` equivalent (C24).

Smoke-exercises the full stack hermetically (no network, no weights): chat
generation, video reward forward with batched padding, and pair scoring.
With a real checkpoint + tokenizer, pass --model-path to run MJ-VIDEO-2B.

    python examples/playground.py            # tiny hermetic demo
    python examples/playground.py --model-path /path/to/MJ-VIDEO-2B \
        --video clip.mp4 --caption "a red panda climbing"
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here so
# the hermetic demo runs on CPU when asked.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def tiny_demo():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.data import ByteTokenizer, build_video_question
    from mjvideo_tpu.eval import RewardScorer
    from mjvideo_tpu.models import internvl, reward
    from mjvideo_tpu.models.generate import GenerationConfig, chat

    cfg = tiny_test_config()
    tok = ByteTokenizer()

    # 1. chat (cell 3 of the reference notebook)
    chat_params = internvl.init_chat_params(
        jax.random.PRNGKey(0), cfg.chat, with_lm_head=True
    )
    response, history = chat(
        chat_params, cfg.chat, tok, "Hello, who are you?",
        generation_config=GenerationConfig(max_new_tokens=8, temperature=0.0),
    )
    print(f"chat response (random weights, {len(history)} turns):",
          repr(response[:60]))

    # 2. batched reward forward with padding (cells 10-14)
    params = reward.init_reward_params(jax.random.PRNGKey(1), cfg)
    scorer = RewardScorer(
        cfg, params, tok, attn_impl="xla", dtype=jnp.float32,
        length_buckets=(256, 512), gating_pattern=tok.gating_pattern(),
    )
    rng = np.random.default_rng(0)
    c = cfg.chat
    frames = rng.normal(size=(2, c.vision.image_size, c.vision.image_size, 3)
                        ).astype(np.float32)
    from mjvideo_tpu.data.prompts import prepare_chat_input

    question = build_video_question("a bouncing ball", 2)
    chat_in = prepare_chat_input(c, tok, question, num_patches_list=[1, 1],
                                 gating_pattern=tok.gating_pattern())
    out = scorer.score_batch(frames, [chat_in.input_ids[0]],
                             [chat_in.gating_pos])
    print("reward score:", float(out.score[0]))
    print("aspect scores:", np.round(np.asarray(out.aspect_scores[0]), 4))
    print("criteria rewards shape:", out.rewards.shape)


def real_demo(model_path: str, video: str, caption: str):
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from mjvideo_tpu.eval import RewardScorer
    from mjvideo_tpu.utils.checkpoint import load_reward_model

    cfg, params = load_reward_model(model_path, dtype=jnp.bfloat16)
    tok = AutoTokenizer.from_pretrained(model_path, trust_remote_code=True,
                                        use_fast=False)
    scorer = RewardScorer(cfg, params, tok,
                          gating_pattern=cfg.gating_token_pattern)
    res = scorer.score_video(video, caption)
    print("overall:", res["score"])
    print("aspects:", res["aspect_scores"])
    print("criteria:", res["rewards"])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path")
    ap.add_argument("--video")
    ap.add_argument("--caption", default="a video")
    args = ap.parse_args()
    if args.model_path and args.video:
        real_demo(args.model_path, args.video, args.caption)
    else:
        tiny_demo()

"""VADER-style reward-feedback loop: finetune a (toy) differentiable video
generator against the MJ-Video reward model's gradients, fully on-device.

The reference's VADER integration is external (README.md:188 reports
human-eval/VBench numbers for VADER+VideoCrafter2 tuned with MJ-Video as
the reward; BASELINE config #5).  This framework makes the loop native:
``RewardScorer.score_fn`` is a jit-differentiable (frames -> score)
closure, so ANY JAX generator backprops through the full reward stack
(ViT + LLM + MoE head, Pallas flash backward, remat).

The demo generator is deliberately tiny — a learnable coarse space-time
pixel field, bilinearly upsampled to the model resolution — standing in
for a diffusion model's final frames; the point is the gradient plumbing
and the on-chip ascent curve, not video quality.

Usage:  python examples/vader_loop.py [--steps 30] [--frames 2] [--lr 0.05]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def make_generator(key, frames: int, coarse: int, image_size: int):
    """Learnable coarse field -> (frames, S, S, 3) ImageNet-normalized."""
    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.data.video import IMAGENET_MEAN, IMAGENET_STD

    params = 0.1 * jax.random.normal(
        key, (frames, coarse, coarse, 3), jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def render(field):
        rgb = jax.nn.sigmoid(jax.image.resize(
            field, (frames, image_size, image_size, 3), method="bilinear"))
        return (rgb - mean) / std

    return params, render


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--coarse", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--caption", default="a bright colorful scene")
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores the env var; pin through the config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from mjvideo_tpu.configs import mjvideo_2b_config, tiny_test_config
    from mjvideo_tpu.data.prompts import ByteTokenizer, build_video_question, prepare_chat_input
    from mjvideo_tpu.eval.scorer import RewardScorer
    from mjvideo_tpu.models.reward import init_reward_params

    on_tpu = jax.default_backend() == "tpu"
    cfg = mjvideo_2b_config() if on_tpu else tiny_test_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    tok = ByteTokenizer()
    scorer = RewardScorer(cfg, params, tok, attn_impl="auto", dtype=dtype,
                          length_buckets=(4096,),
                          gating_pattern=tok.gating_pattern())

    question = build_video_question(args.caption, args.frames)
    # scorer.cfg is rebased on the tokenizer's <IMG_CONTEXT> id — the
    # original cfg would trip the scatter-id guard under the ByteTokenizer
    chat = prepare_chat_input(scorer.cfg.chat, tok, question,
                              num_patches_list=[1] * args.frames,
                              gating_pattern=tok.gating_pattern())
    # params-as-argument variant: closing over the 2B tree would embed it
    # as 4GB of lowering constants in the step executable
    score_fn = scorer.score_fn_with_params(chat.input_ids[0], chat.gating_pos)

    gen_params, render = make_generator(
        jax.random.PRNGKey(1), args.frames, args.coarse, cfg.chat.image_size)

    opt = optax.adam(args.lr)
    opt_state = opt.init(gen_params)

    @jax.jit
    def step(reward_params, gen_params, opt_state):
        # ascend the reward: loss = -score(render(field))
        loss, grads = jax.value_and_grad(
            lambda f: -score_fn(reward_params, render(f)))(gen_params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(gen_params, updates), opt_state, -loss

    history = []
    for i in range(args.steps):
        gen_params, opt_state, score = step(scorer.params, gen_params,
                                            opt_state)
        score = float(score)
        history.append(score)
        print(f"step {i:3d}  reward {score:+.5f}", flush=True)

    print(f"\nreward ascent: {history[0]:+.5f} -> {history[-1]:+.5f} "
          f"({'UP' if history[-1] > history[0] else 'NO GAIN'}) over "
          f"{args.steps} steps on {jax.default_backend()}")


if __name__ == "__main__":
    main()

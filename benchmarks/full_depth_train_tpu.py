"""FULL-DEPTH 2B training step on ONE v5e chip.

Round-1 finding (docs/PERF.md): full-depth AdamW training does not fit a
single 16GB chip — params (4.2GB bf16) + trainable-LLM Adam state (fp32 nu
alone ~7GB) forces the dp/tp mesh.  Adafactor's factored second moment
removes the O(params) state, so stage-1 finetuning of the full 24-ViT +
24-LLM model at real widths should fit one chip with full-block remat.

Usage: python benchmarks/full_depth_train_tpu.py [--model 2b|4b]
                [--optimizer adafactor] [--remat-policy full|dots]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("2b", "4b"), default="2b")
    ap.add_argument("--optimizer", default="adafactor")
    ap.add_argument("--remat-policy", default="full")
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_2b_config, mjvideo_4b_config
    from mjvideo_tpu.models.reward import init_reward_params
    from mjvideo_tpu.train.trainer import (
        TrainConfig,
        make_optimizer,
        make_train_step,
    )

    cfg = (mjvideo_4b_config() if args.model == "4b"
           else mjvideo_2b_config())  # FULL depth, real widths
    c = cfg.chat
    remat = True if args.remat_policy == "full" else args.remat_policy
    tc = TrainConfig(stage=1, attn_impl="auto", learning_rate=1e-5,
                     total_steps=16, remat=remat, optimizer=args.optimizer)
    params = init_reward_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    optimizer = make_optimizer(tc, params)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, tc, optimizer)

    rng = np.random.default_rng(0)
    B, F = 1, 2
    n_img = c.num_image_token * F
    T = n_img + 64
    batch = {}
    for v in (0, 1):
        ids = np.full((B, T), 11, np.int64)
        ids[:, 2:2 + n_img] = c.img_context_token_id
        batch[f"video_{v}_pixel_values"] = rng.normal(
            size=(B, F, c.vision.image_size, c.vision.image_size, 3)
        ).astype(np.float32)
        batch[f"video_{v}_input_ids"] = ids.astype(np.int32)
        batch[f"video_{v}_attention_mask"] = np.ones((B, T), np.int32)
        batch[f"video_{v}_gating_pos"] = np.full((B,), T - 4, np.int32)
        batch[f"video_{v}_criteria_score"] = rng.choice(
            [-1.0, 0.0, 1.0], size=(B, 28)).astype(np.float32)
        batch[f"video_{v}_criteria_related"] = np.ones((B, 28), np.float32)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    params, opt_state, m = step(params, opt_state, jb)  # compile
    first = float(np.asarray(m["loss"]))
    print(f"step 1 compiled + ran: loss {first:.4f}", flush=True)
    n = args.steps
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state, m = step(params, opt_state, jb)
    last = float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / n
    depth = cfg.chat.llm.num_hidden_layers
    print(f"{dt*1e3:.1f} ms/step — FULL 24-ViT + {depth}-LLM "
          f"{args.model.upper()} stage-1 on ONE v5e chip "
          f"({args.optimizer}, remat={args.remat_policy}, bf16, "
          f"stop_gradient freeze)")
    print(f"loss {first:.4f} -> {last:.4f} "
          f"({'decreasing' if last < first else 'NOT decreasing'})")


if __name__ == "__main__":
    main()

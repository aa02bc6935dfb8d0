"""Training step on the real chip: stage-1 at reduced depth, full widths.

Round-1 datapoint: 135 ms/step (8 ViT + 8 LLM layers, 2 frames, seq ~576,
remat, Pallas flash backward).  Re-measures with round-2 kernels and the
stop_gradient freeze path, and checks the loss decreases.
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_2b_config
    from mjvideo_tpu.models.reward import init_reward_params
    from mjvideo_tpu.train.trainer import (
        TrainConfig,
        make_optimizer,
        make_train_step,
    )

    base = mjvideo_2b_config()
    cfg = dataclasses.replace(
        base,
        chat=dataclasses.replace(
            base.chat,
            vision=dataclasses.replace(base.chat.vision,
                                       num_hidden_layers=8),
            llm=dataclasses.replace(base.chat.llm, num_hidden_layers=8),
        ),
    )
    c = cfg.chat
    params = init_reward_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)

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

    for remat in (True, "dots", False):
        tc = TrainConfig(stage=1, attn_impl="auto", learning_rate=1e-5,
                         total_steps=16, remat=remat,
                         adam_mu_dtype="bfloat16")
        # the train step donates its params buffer; give each variant a copy
        p = jax.tree.map(jnp.copy, params)
        optimizer = make_optimizer(tc, p)
        opt_state = optimizer.init(p)
        step = make_train_step(cfg, tc, optimizer)
        p, opt_state, m = step(p, opt_state, jb)  # compile
        first = float(np.asarray(m["loss"]))
        n = 12
        t0 = time.perf_counter()
        for _ in range(n):
            p, opt_state, m = step(p, opt_state, jb)
        last = float(np.asarray(m["loss"]))
        dt = (time.perf_counter() - t0) / n
        print(f"remat={str(remat):5s}: {dt*1e3:7.1f} ms/step "
              f"(8+8 layers, full widths, bf16 mu, stop_gradient freeze)  "
              f"loss {first:.4f} -> {last:.4f} "
              f"({'decreasing' if last < first else 'NOT decreasing'})",
              flush=True)


if __name__ == "__main__":
    main()

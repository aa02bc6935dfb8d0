"""Data-parallel scaling check on the 8-device virtual CPU mesh.

The v5e-8 throughput extrapolation assumes near-linear dp scaling.  Real
multi-chip hardware isn't available here, so this measures the next best
thing: the SAME global batch trained at dp=1 vs dp=8 on the virtual CPU
mesh (one physical core).  Total FLOPs are identical, so any wall-clock
gap is pure GSPMD partitioning + collective overhead — the quantity that
would break linear scaling on real chips.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python benchmarks/dp_scaling.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.models.reward import init_reward_params
    from mjvideo_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from mjvideo_tpu.train.trainer import (
        TrainConfig,
        make_optimizer,
        make_train_step,
    )

    cfg = tiny_test_config()
    c = cfg.chat
    B, frames = 8, 2
    n_img = c.num_image_token * frames
    T = n_img + 16
    rng = np.random.default_rng(0)

    batch = {}
    for v in (0, 1):
        ids = np.full((B, T), 5, np.int64)
        ids[:, 2:2 + n_img] = c.img_context_token_id
        batch[f"video_{v}_pixel_values"] = rng.normal(
            size=(B, frames, c.vision.image_size, c.vision.image_size, 3)
        ).astype(np.float32)
        batch[f"video_{v}_input_ids"] = ids.astype(np.int32)
        batch[f"video_{v}_attention_mask"] = np.ones((B, T), np.int32)
        batch[f"video_{v}_gating_pos"] = np.full((B,), T - 4, np.int32)
        batch[f"video_{v}_criteria_score"] = rng.choice(
            [-1.0, 0.0, 1.0], size=(B, 28)).astype(np.float32)
        batch[f"video_{v}_criteria_related"] = rng.integers(
            0, 2, size=(B, 28)).astype(np.float32)
        batch[f"video_{v}_aspect_score"] = rng.choice(
            [-1.0, 0.0, 1.0], size=(B, 5)).astype(np.float32)
        batch[f"video_{v}_aspect_related"] = rng.integers(
            0, 2, size=(B, 5)).astype(np.float32)
        batch[f"video_{v}_overall_score"] = rng.choice(
            [-1.0, 1.0], size=(B, 1)).astype(np.float32)
        batch[f"video_{v}_overall_related"] = np.ones((B, 1), np.float32)
    batch["aspect_preference"] = rng.integers(0, 2, (B, 5)).astype(np.int32)
    batch["aspect_mask"] = rng.integers(0, 2, (B, 5)).astype(np.float32)
    batch["overall_preference"] = rng.integers(0, 2, (B, 1)).astype(np.int32)
    batch["overall_mask"] = np.ones((B, 1), np.float32)

    results = {}
    for dp in (1, 8):
        mesh = make_mesh(data=dp, model=1, devices=jax.devices("cpu")[:dp])
        tc = TrainConfig(stage=3, attn_impl="xla", total_steps=8, remat=False,
                         mesh_data_axis=dp)
        params = shard_params(
            init_reward_params(jax.random.PRNGKey(0), cfg), mesh)
        optimizer = make_optimizer(tc, params)
        opt_state = optimizer.init(params)
        step = make_train_step(cfg, tc, optimizer)
        jb = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        params, opt_state, m = step(params, opt_state, jb)  # compile
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            params, opt_state, m = step(params, opt_state, jb)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / n
        results[dp] = dt
        print(f"dp={dp}: {dt*1e3:8.1f} ms/step (global batch {B} pairs)"
              f"  loss={float(m['loss']):.4f}", flush=True)

    overhead = results[8] / results[1] - 1.0
    print(f"\nGSPMD dp=8 partitioning overhead vs dp=1 on one physical core: "
          f"{overhead*100:+.1f}% "
          f"(same global batch, same total FLOPs; near-0% supports the "
          f"linear v5e-8 extrapolation)")


if __name__ == "__main__":
    main()

"""Data-parallel INFERENCE scaling check on the 8-device virtual CPU mesh.

Companion to dp_scaling.py (which measures the training step): the v5e-8
north star is 8x the single-chip scoring rate, so this measures the same
global scoring batch at dp=1 vs dp=8 on the virtual mesh — identical total
FLOPs, so the wall-clock gap bounds the GSPMD partitioning + collective
overhead of the batched reward forward.

Usage: python benchmarks/dp_inference_scaling.py
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
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.models.reward import init_reward_params, reward_forward
    from mjvideo_tpu.parallel.mesh import make_mesh, shard_params

    cfg = tiny_test_config()
    c = cfg.chat
    # Big enough that per-batch compute dwarfs the fixed multi-executable
    # dispatch cost of 8 virtual devices on one core (at B=8/frames=2 the
    # 3.5ms batch makes that fixed cost read as +65% — meaningless as a
    # bound; at this size it amortizes).
    B, frames = 64, 4
    n_img = c.num_image_token * frames
    T = n_img + 16
    rng = np.random.default_rng(0)

    ids = np.full((B, T), 5, np.int64)
    ids[:, 2:2 + n_img] = c.img_context_token_id
    pix = rng.normal(size=(B, frames, c.vision.image_size,
                           c.vision.image_size, 3)).astype(np.float32)
    mask = np.ones((B, T), np.int32)
    gpos = np.full((B,), T - 4, np.int32)

    results = {}
    for dp in (1, 8):
        mesh = make_mesh(data=dp, model=1, devices=jax.devices("cpu")[:dp])
        params = shard_params(
            init_reward_params(jax.random.PRNGKey(0), cfg), mesh)
        data = NamedSharding(mesh, P("data"))

        @jax.jit
        def fwd(params, pix, ids, mask, gpos):
            B, F = pix.shape[:2]
            flat = pix.reshape((B * F,) + pix.shape[2:])
            out = reward_forward(params, cfg, flat, ids, mask, gpos,
                                 attn_impl="xla", remat=False)
            return out.score

        args = [jax.device_put(jnp.asarray(a), data)
                for a in (pix, ids, mask, gpos)]
        score = fwd(params, *args)  # compile
        jax.block_until_ready(score)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            score = fwd(params, *args)
        jax.block_until_ready(score)
        dt = (time.perf_counter() - t0) / n
        results[dp] = dt
        print(f"dp={dp}: {dt*1e3:8.1f} ms/batch (global batch {B} clips)  "
              f"score[0]={float(score[0]):+.4f}", flush=True)

    overhead = results[8] / results[1] - 1.0
    print(f"\nGSPMD dp=8 inference partitioning overhead vs dp=1 on one "
          f"physical core: {overhead*100:+.1f}% (same global batch; near-0% "
          f"supports the linear v5e-8 scoring extrapolation)")


if __name__ == "__main__":
    main()

"""A/B: one big-batch dispatch vs pipelined micro-batch dispatches.

The batch-4 regression (docs/PERF.md r2, trace_batch.py r3) is XLA losing
VMEM residency of the ViT activations at 32 tiles: async slice-start
staging + 2x costlier pads appear, while the Pallas kernels scale
perfectly.  Micro-batching keeps every dispatch at the VMEM-resident
shape; async dispatch pipelining hides the extra dispatch overhead.

Usage: python benchmarks/microbatch_ab.py
"""

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
    from mjvideo_tpu.models.reward import init_reward_params, reward_forward

    cfg = mjvideo_2b_config()
    c = cfg.chat
    dtype = jnp.bfloat16
    params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    frames, text_len = 8, 64
    T = c.num_image_token * frames + text_len
    rng = np.random.default_rng(0)

    def inputs(batch):
        pix = jnp.asarray(rng.normal(
            size=(batch * frames, c.vision.image_size, c.vision.image_size,
                  3)), dtype)
        ids = np.full((batch, T), 11, np.int64)
        ids[:, 8:8 + c.num_image_token * frames] = c.img_context_token_id
        return (pix, jnp.asarray(ids, jnp.int32),
                jnp.ones((batch, T), jnp.int32),
                jnp.full((batch,), T - 6, jnp.int32))

    fwd = jax.jit(lambda p, pv, i, m, g: reward_forward(
        p, cfg, pv, i, m, g, attn_impl="auto", remat=False).score)

    def timed(total_clips, micro, iters=12):
        """Score total_clips per iteration via micro-batch dispatches."""
        args = inputs(micro)
        np.asarray(fwd(params, *args))  # compile+warm this shape
        n_disp = total_clips // micro
        t0 = time.perf_counter()
        outs = []
        for _ in range(iters):
            outs = [fwd(params, *args) for _ in range(n_disp)]
        for o in outs:
            np.asarray(o)
        dt = time.perf_counter() - t0
        return total_clips * iters / dt

    for total in (4, 8):
        for micro in (1, 2, 4, 8):
            if micro > total:
                continue
            cps = timed(total, micro)
            print(f"total {total} clips | micro-batch {micro}: "
                  f"{cps:7.3f} clips/s", flush=True)


if __name__ == "__main__":
    main()

"""Long-context reward scoring on one chip (BASELINE config #4).

16 frames x 13 tiles (max_num=12 + thumbnail) = 208 tiles, ~53k LLM
tokens — the configuration the reference cannot run at all (SURVEY.md §5:
98k-token configs 'would not fit'; it only ever runs 8x1).  Round-1
number: 0.12 clips/s; re-measured with the round-2 kernels.

Usage: python benchmarks/long_context_tpu.py [--frames 16] [--tiles 13]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--tiles", type=int, default=13)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_2b_config
    from mjvideo_tpu.models.reward import init_reward_params, reward_forward

    cfg = mjvideo_2b_config()
    c = cfg.chat
    P = args.frames * args.tiles
    T = c.num_image_token * P + 128
    print(f"{args.frames} frames x {args.tiles} tiles = {P} tiles, "
          f"{T} LLM tokens", flush=True)

    params = init_reward_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(
        size=(P, c.vision.image_size, c.vision.image_size, 3)), jnp.bfloat16)
    ids = np.full((1, T), 11, np.int64)
    ids[:, 8:8 + c.num_image_token * P] = c.img_context_token_id
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones((1, T), jnp.int32)
    gpos = jnp.full((1,), T - 6, jnp.int32)

    @jax.jit
    def fwd(params, pix, ids, mask, gpos):
        # remat on: 53k-token activations would not fit otherwise
        return reward_forward(params, cfg, pix, ids, mask, gpos,
                              remat=True).score

    t0 = time.perf_counter()
    np.asarray(fwd(params, pix, ids, mask, gpos))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, pix, ids, mask, gpos)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{dt*1e3:.0f} ms/clip = {1.0/dt:.3f} clips/s on one chip "
          f"(round-1: 0.12)")


if __name__ == "__main__":
    main()

"""A/B: nested-jit attention impls vs inlined (un-jitted) impls.

The device trace (docs/PERF.md round-2) shows ~8ms/clip of pad + layout
copies around the ViT attention kernel: the inner ``jax.jit`` on
``_fwd_nc_impl`` / ``_fwd_impl`` is a fusion barrier, so the 1025->1032
pad and the (B,S,H,D)->(B,H,S,D) transposes materialize through HBM every
layer instead of fusing into neighbors.  This measures the full reward
forward with the inner jits stripped (``__wrapped__``).

Usage: python benchmarks/inline_attn_ab.py
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
    from mjvideo_tpu.ops import flash_attention as fa

    cfg = mjvideo_2b_config()
    c = cfg.chat
    dtype = jnp.bfloat16
    params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    frames, text_len = 8, 64
    T = c.num_image_token * frames + text_len
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(
        size=(frames, c.vision.image_size, c.vision.image_size, 3)), dtype)
    ids = np.full((1, T), 11, np.int64)
    ids[:, 8:8 + c.num_image_token * frames] = c.img_context_token_id
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones((1, T), jnp.int32)
    gpos = jnp.full((1,), T - 6, jnp.int32)

    def timed(tag, iters=20):
        def model(p, pv, i, m, g):
            return reward_forward(p, cfg, pv, i, m, g, remat=False).score

        fwd = jax.jit(model)
        # np.asarray forces materialization — on the axon remote platform
        # block_until_ready can return before execution (see bench.py).
        np.asarray(fwd(params, pix, ids, mask, gpos))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(params, pix, ids, mask, gpos)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        clips = 1.0 / best
        print(f"{tag:28s} {best*1e3:8.2f} ms/clip   {clips:6.3f} clips/s",
              flush=True)
        return best

    base = timed("baseline (nested jit)")

    jit_nc, jit_fw = fa._fwd_nc_impl, fa._fwd_impl
    fa._fwd_nc_impl = jit_nc.__wrapped__
    fa._fwd_impl = jit_fw.__wrapped__
    try:
        inl = timed("inlined attention impls")
    finally:
        fa._fwd_nc_impl, fa._fwd_impl = jit_nc, jit_fw

    print(f"\nspeedup: {base/inl:.3f}x")


if __name__ == "__main__":
    main()

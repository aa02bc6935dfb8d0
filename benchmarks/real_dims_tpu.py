"""TPU-side bf16 score at REAL 2B dims, compared to the CPU fp32 score.

Complements tests/test_real_dims_parity.py (which validates the export ->
safetensors -> import round-trip and the torch oracle on CPU): this runs
the same full-width model in bf16 on the actual chip.  Weights are
initialized ON-device from the same PRNG key — JAX's threefry is
backend-invariant, so this produces bit-identical fp32 values to the CPU
init, cast to bf16, i.e. numerically equivalent to importing the fp32
checkpoint at bf16.  (Pushing the 4.2GB param tree through the axon tunnel
with device_put wedges for hours; real deployments load weights host-side
without a tunnel.)
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_2b_config
    from mjvideo_tpu.models import reward

    cfg = mjvideo_2b_config()
    ch = cfg.chat

    rng = np.random.default_rng(3)  # same inputs as the gated test
    B, F = 1, 2
    n_img = ch.num_image_token * F
    T = n_img + 16
    pix = rng.normal(size=(B * F, ch.vision.image_size,
                           ch.vision.image_size, 3)).astype(np.float32)
    ids = rng.integers(10, 200, size=(B, T))
    ids[0, 3:3 + n_img] = ch.img_context_token_id
    mask = np.ones((B, T), np.int32)
    gpos = np.array([T - 6])

    results = {}
    for dtype, attn in ((jnp.float32, "xla"), (jnp.bfloat16, "auto")):
        params = reward.init_reward_params(jax.random.PRNGKey(0), cfg,
                                           dtype=dtype)
        fwd = jax.jit(lambda p, pv, i, m, g, attn=attn: reward.reward_forward(
            p, cfg, pv, i, m, g, attn_impl=attn, remat=False).score)
        score = float(np.asarray(fwd(
            params, jnp.asarray(pix, dtype), jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask), jnp.asarray(gpos, jnp.int32)))[0])
        name = str(jnp.dtype(dtype).name)
        results[name] = score
        print(f"2B dims on {jax.default_backend()}: {name} "
              f"(attn={attn}) score = {score:.6f}", flush=True)
        del params

    d = abs(results["bfloat16"] - results["float32"])
    print(f"|bf16 - fp32| on-chip at 2B dims: {d:.2e} "
          f"({'PASS' if d < 1e-2 else 'FAIL'} vs 1e-2 fidelity target)")


if __name__ == "__main__":
    main()

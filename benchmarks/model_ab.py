"""Same-process model-level A/B: full reward forward under kernel variants.

Cross-process timings over the axon tunnel drift by 2x; the only
decision-grade comparison is variants timed back-to-back in one process
with bench.py's methodology (N un-awaited dispatches, materialize last).
Sweeps causal flash block sizes (monkeypatching _pick_blocks) and batch.

Usage: python benchmarks/model_ab.py
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

    def inputs(batch):
        pix = jnp.asarray(rng.normal(
            size=(batch * frames, c.vision.image_size, c.vision.image_size,
                  3)), dtype)
        ids = np.full((batch, T), 11, np.int64)
        ids[:, 8:8 + c.num_image_token * frames] = c.img_context_token_id
        return (pix, jnp.asarray(ids, jnp.int32),
                jnp.ones((batch, T), jnp.int32),
                jnp.full((batch,), T - 6, jnp.int32))

    def timed(fwd, args, batch, iters=20):
        np.asarray(fwd(params, *args))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, *args)
        np.asarray(out)
        dt = time.perf_counter() - t0
        return batch * iters / dt  # clips/s

    orig_flash = fa.flash_attention
    results = {}

    def run(name, batch, blocks=None):
        # Override causal block sizes through flash_attention's explicit
        # (static) args — they key the jit cache, so each variant compiles
        # its own executable (patching _pick_blocks would NOT bust it).
        if blocks is None:
            fa.flash_attention = orig_flash
        else:
            def patched(q, k, v, attention_mask=None, causal=False,
                        scale=None, block_q=None, block_kv=None,
                        q_offset=None, kv_valid=None, _b=blocks):
                if causal:
                    block_q, block_kv = _b
                return orig_flash(q, k, v, attention_mask=attention_mask,
                                  causal=causal, scale=scale,
                                  block_q=block_q, block_kv=block_kv,
                                  q_offset=q_offset, kv_valid=kv_valid)
            fa.flash_attention = patched
        fwd = jax.jit(lambda p, pv, i, m, g: reward_forward(
            p, cfg, pv, i, m, g, attn_impl="auto", remat=False).score)
        cps = timed(fwd, inputs(batch), batch)
        results[name] = cps
        print(f"{name:40s} {cps:7.3f} clips/s", flush=True)

    run("batch1 blocks default (256,512)", 1)
    for blocks in ((512, 512), (512, 1024), (256, 1024), (128, 512),
                   (512, 2112)):
        run(f"batch1 blocks {blocks}", 1, blocks)
    run("batch2 blocks default", 2)
    run("batch4 blocks default", 4)
    fa.flash_attention = orig_flash

    best = max(results, key=results.get)
    print(f"\nbest: {best} @ {results[best]:.3f} clips/s")


if __name__ == "__main__":
    main()

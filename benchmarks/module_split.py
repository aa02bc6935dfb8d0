"""Module-level timing of the MJ-VIDEO-2B reward forward on the real chip.

Times the ViT stack, the LLM stack, and the fused pieces separately with
the chained-scan scalar-out harness (see vit_attn_bench.py for why), at the
bench configuration (batch 1, 8 frames x 1 tile, seq 2112).

Params are passed as jit ARGUMENTS (a closure would inline 2B weights as
HLO constants and blow the remote compiler's request limit).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def bench(fn, params, args, n=8, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(params, *a):
        def body(c, _):
            # Perturb the inputs by the carry so each iteration depends on
            # the previous output — without this the body is loop-invariant
            # and XLA hoists it out of the scan (measured: it does).
            pert = tuple(
                x + c.astype(x.dtype) * jnp.asarray(1e-20, x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x
                for x in jax.tree.leaves(a)
            )
            pert = jax.tree.unflatten(jax.tree.structure(a), pert)
            o = fn(params, *pert)
            leaf = jax.tree.leaves(o)[0]
            return leaf.astype(jnp.float32).ravel()[0], None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    np.asarray(many(params, *args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(many(params, *args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_2b_config
    from mjvideo_tpu.models import decoder as dec
    from mjvideo_tpu.models import internvl, vit
    from mjvideo_tpu.models.reward import init_reward_params, reward_head

    cfg = mjvideo_2b_config()
    c = cfg.chat
    dtype = jnp.bfloat16
    params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    mp = params["model"]

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
    embeds = dec.embed_tokens(mp["language_model"], ids)
    hidden = jnp.asarray(rng.normal(size=(1, T, c.llm.hidden_size)), dtype)

    def report(name, secs):
        print(f"{name:36s} {secs*1e3:8.2f} ms", flush=True)

    report("ViT stack (8 tiles, 24L)", bench(
        lambda vp, pix: vit.vit_forward(vp, c.vision, pix,
                                        select_layer=c.select_layer,
                                        attn_impl="auto", remat=False),
        mp["vision_model"], (pix,)))
    report("extract_feature (ViT+shuffle+mlp1)", bench(
        lambda mp, pix: internvl.extract_feature(mp, c, pix,
                                                 attn_impl="auto",
                                                 remat=False),
        mp, (pix,)))
    report("LLM stack (1x2112, 24L)", bench(
        lambda lp, e: dec.decoder_forward(lp, c.llm, e,
                                          attention_mask=mask,
                                          attn_impl="auto", remat=False),
        mp["language_model"], (embeds,)))
    report("reward head", bench(
        lambda p, h: reward_head(p, cfg, h, ids, gpos), params, (hidden,)))

    from mjvideo_tpu.ops.flash_attention import flash_attention

    Hq, Hkv, D = (c.llm.num_attention_heads, c.llm.num_key_value_heads,
                  c.llm.head_dim)
    q = jnp.asarray(rng.normal(size=(1, T, Hq, D)), dtype)
    k = jnp.asarray(rng.normal(size=(1, T, Hkv, D)), dtype)
    v = jnp.asarray(rng.normal(size=(1, T, Hkv, D)), dtype)
    report("LLM flash attn x24 (1x2112)", 24 * bench(
        lambda kv, q: flash_attention(q, kv[0], kv[1], attention_mask=mask,
                                      causal=True),
        (k, v), (q,), n=24))

    # ViT attention alone at the bench tile count (8 tiles, not 32)
    Hv, Dv = c.vision.num_attention_heads, c.vision.head_dim
    S = c.vision.seq_len
    qv = jnp.asarray(rng.normal(size=(8, S, Hv, Dv)), dtype)
    kv_ = jnp.asarray(rng.normal(size=(8, S, Hv, Dv)), dtype)
    vv = jnp.asarray(rng.normal(size=(8, S, Hv, Dv)), dtype)
    report("ViT flash attn x24 (8 tiles)", 24 * bench(
        lambda kv, q: flash_attention(q, kv[0], kv[1], causal=False),
        (kv_, vv), (qv,), n=24))


if __name__ == "__main__":
    main()

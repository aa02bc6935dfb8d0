"""Locate the negative batch-size throughput scaling (VERDICT round-2 #2).

docs/PERF.md round-2 A/B: 9.43 (b1) -> 9.00 (b2) -> 8.13 clips/s/chip (b4)
with the full reward forward.  This splits the forward by module at each
batch so the regressing stage is identified by measurement, not guess:

* ViT stack at tile-batch 8/16/32 (batch x 8 frames x 1 tile)
* LLM stack at batch 1/2/4 (seq 2112)
* ViT + LLM attention ops alone at those batches
* full forward at batch 1/2/4 for reference

Same chained-scan scalar-out harness as module_split.py (per-dispatch
tunnel latency otherwise dominates).
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
    from mjvideo_tpu.models import vit
    from mjvideo_tpu.models.reward import init_reward_params, reward_forward
    from mjvideo_tpu.ops.flash_attention import flash_attention

    cfg = mjvideo_2b_config()
    c = cfg.chat
    dtype = jnp.bfloat16
    params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    mp = params["model"]

    frames, text_len = 8, 64
    T = c.num_image_token * frames + text_len
    rng = np.random.default_rng(0)

    def report(name, secs, clips):
        print(f"{name:44s} {secs*1e3:9.2f} ms  "
              f"{clips/secs:7.3f} clips/s", flush=True)

    for B in (1, 2, 4):
        tiles = B * frames
        pix = jnp.asarray(rng.normal(
            size=(tiles, c.vision.image_size, c.vision.image_size, 3)), dtype)
        report(f"ViT stack ({tiles} tiles, 24L)", bench(
            lambda vp, pix: vit.vit_forward(vp, c.vision, pix,
                                            select_layer=c.select_layer,
                                            attn_impl="auto", remat=False),
            mp["vision_model"], (pix,)), B)

    for B in (1, 2, 4):
        mask = jnp.ones((B, T), jnp.int32)
        embeds = jnp.asarray(rng.normal(size=(B, T, c.llm.hidden_size)),
                             dtype)
        report(f"LLM stack ({B}x{T}, 24L)", bench(
            lambda lp, e, mask=mask: dec.decoder_forward(
                lp, c.llm, e, attention_mask=mask,
                attn_impl="auto", remat=False),
            mp["language_model"], (embeds,)), B)

    Hv, Dv = c.vision.num_attention_heads, c.vision.head_dim
    S = c.vision.seq_len
    for B in (1, 2, 4):
        tiles = B * frames
        qv = jnp.asarray(rng.normal(size=(tiles, S, Hv, Dv)), dtype)
        kv_ = jnp.asarray(rng.normal(size=(tiles, S, Hv, Dv)), dtype)
        vv = jnp.asarray(rng.normal(size=(tiles, S, Hv, Dv)), dtype)
        report(f"ViT attn x24 ({tiles} tiles)", 24 * bench(
            lambda kv, q: flash_attention(q, kv[0], kv[1], causal=False),
            (kv_, vv), (qv,), n=24), B)

    Hq, Hkv, D = (c.llm.num_attention_heads, c.llm.num_key_value_heads,
                  c.llm.head_dim)
    for B in (1, 2, 4):
        mask = jnp.ones((B, T), jnp.int32)
        q = jnp.asarray(rng.normal(size=(B, T, Hq, D)), dtype)
        k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), dtype)
        v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), dtype)
        report(f"LLM attn x24 ({B}x{T})", 24 * bench(
            lambda kv, q, mask=mask: flash_attention(
                q, kv[0], kv[1], attention_mask=mask, causal=True),
            (k, v), (q,), n=24), B)

    for B in (1, 2, 4):
        tiles = B * frames
        pix = jnp.asarray(rng.normal(
            size=(tiles, c.vision.image_size, c.vision.image_size, 3)), dtype)
        ids = np.full((B, T), 11, np.int64)
        ids[:, 8:8 + c.num_image_token * frames] = c.img_context_token_id
        args = (pix, jnp.asarray(ids, jnp.int32),
                jnp.ones((B, T), jnp.int32),
                jnp.full((B,), T - 6, jnp.int32))
        report(f"full forward (batch {B})", bench(
            lambda p, pv, i, m, g: reward_forward(
                p, cfg, pv, i, m, g, attn_impl="auto", remat=False).score,
            params, args, n=4), B)


if __name__ == "__main__":
    main()

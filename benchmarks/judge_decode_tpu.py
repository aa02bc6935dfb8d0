"""Judge generation throughput on the real chip (Qwen2-VL-2B dims).

Measures the KV-cached decode path (prefill + N single-token steps) for a
video-judge prompt, vs the cost the pre-cache design paid (a full prompt
re-forward per generated token).

Usage: python benchmarks/judge_decode_tpu.py [--new-tokens 24]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--new-tokens", type=int, default=24)
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8 KV cache (per-slot-per-head scales): "
                         "halves cache HBM reads per decode step")
    ap.add_argument("--quant", default=None,
                    choices=["int8", "int8-vit", "int8-wo", "int4-wo"],
                    help="judge quantization; 'int8-wo' (weight-only) "
                         "targets the decode loop: halves per-step weight "
                         "HBM reads without w8a8's per-step activation-"
                         "quantize ops")
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.models.qwen2vl import (
        Qwen2VLConfig,
        build_video_prompt_ids,
        get_rope_index,
        greedy_generate,
        init_qwen2vl_params,
        qwen2vl_forward,
    )

    cfg = Qwen2VLConfig()  # 2B dims
    params = init_qwen2vl_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    if args.quant:
        from mjvideo_tpu.ops.quant import quantize_params_mode

        params = quantize_params_mode(params, args.quant)
        print(f"quantized judge params ({args.quant})", flush=True)

    # 8-frame video at the judge's default budget: grid (4, 18, 24) ->
    # 4*18*24/4 = 432 video tokens + prompt ~= 500-token prefill
    grid = (4, 18, 24)
    n_patch = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(n_patch, cfg.vision.patch_dim)).astype(
        np.float32)

    class Tok:
        def __call__(self, s):
            return {"input_ids": [100 + (ord(c) % 50) for c in s]}

    ids = build_video_prompt_ids(Tok(), cfg, grid,
                                 "Rate the visual quality of this video.")
    pos, _ = get_rope_index(ids, [grid], cfg)
    T = ids.shape[1]
    print(f"prompt {T} tokens, {args.new_tokens} new tokens", flush=True)

    # cached generation, end to end (vision + prefill + steps)
    t0 = time.perf_counter()
    toks = greedy_generate(params, cfg, ids, pos, pixel_patches=patches,
                           grid=grid, max_new_tokens=args.new_tokens,
                           eos_token_id=-1, kv_quant=args.kv_quant)
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    toks = greedy_generate(params, cfg, ids, pos, pixel_patches=patches,
                           grid=grid, max_new_tokens=args.new_tokens,
                           eos_token_id=-1, kv_quant=args.kv_quant)
    cached = time.perf_counter() - t0
    print(f"cached decode: {cached*1e3:8.1f} ms total "
          f"({len(toks)} tokens, warm; first incl. compile "
          f"{compile_and_first:.1f}s)", flush=True)

    # pair-batched decode (judge_pair's ask_batch path): both videos of a
    # preference pair through ONE B=2 generation
    from mjvideo_tpu.models.qwen2vl import greedy_generate_batch

    patches1 = rng.normal(size=(n_patch, cfg.vision.patch_dim)).astype(
        np.float32)
    items = [(ids, pos, patches, grid), (ids, pos, patches1, grid)]
    t0 = time.perf_counter()
    rows = greedy_generate_batch(params, cfg, items,
                                 max_new_tokens=args.new_tokens,
                                 eos_token_id=-1, kv_quant=args.kv_quant)
    pair_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = greedy_generate_batch(params, cfg, items,
                                 max_new_tokens=args.new_tokens,
                                 eos_token_id=-1, kv_quant=args.kv_quant)
    pair = time.perf_counter() - t0
    print(f"pair-batched decode (B=2): {pair*1e3:8.1f} ms total = "
          f"{pair*1e3/2:6.1f} ms/answer "
          f"(vs {cached*1e3:6.1f} sequential -> "
          f"{2*cached/pair:.2f}x pair throughput; first incl. compile "
          f"{pair_first:.1f}s)", flush=True)

    # cached-vision pair (the fine-grained benchmark's steady state: ~34
    # questions per pair, vision embeds cached per video after the first)
    from mjvideo_tpu.models.qwen2vl import _jit_vision

    vises = [_jit_vision(params["visual"], cfg.vision, jnp.asarray(p_),
                         grid) for p_ in (patches, patches1)]
    items_novis = [(ids, pos, None, None)] * 2
    greedy_generate_batch(params, cfg, items_novis,
                          max_new_tokens=args.new_tokens,
                          eos_token_id=-1, vision_embeds=vises, kv_quant=args.kv_quant)
    t0 = time.perf_counter()
    for _ in range(3):
        greedy_generate_batch(params, cfg, items_novis,
                              max_new_tokens=args.new_tokens,
                              eos_token_id=-1, vision_embeds=vises, kv_quant=args.kv_quant)
    per_pair = (time.perf_counter() - t0) / 3
    print(f"cached-vision pair question: {per_pair*1e3:8.1f} ms "
          f"(vs {2*cached*1e3:.1f} uncached-sequential -> "
          f"{2*cached/per_pair:.1f}x for fine-grained's repeat questions)",
          flush=True)

    # what the pre-cache design paid: one full prompt forward per token
    mask = jnp.ones((1, T), jnp.int32)

    @jax.jit
    def full_fwd(p, ids_j, pos_j, patches_j):
        return qwen2vl_forward(p, cfg, ids_j, mask, pos_j,
                               pixel_patches=patches_j, grid=grid,
                               remat=False)[0, -1, 0]

    a = (params, jnp.asarray(ids, jnp.int32), jnp.asarray(pos),
         jnp.asarray(patches))
    np.asarray(full_fwd(*a))
    t0 = time.perf_counter()
    np.asarray(full_fwd(*a))
    one = time.perf_counter() - t0
    print(f"full re-forward baseline: {one*1e3:8.1f} ms/token -> "
          f"{one*len(toks)*1e3:8.1f} ms for {len(toks)} tokens "
          f"(speedup {one*len(toks)/cached:.1f}x)")


if __name__ == "__main__":
    main()

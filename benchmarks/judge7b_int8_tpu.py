"""Qwen2-VL-7B judge on ONE v5e chip — enabled by w8a8 int8.

The reference benchmarks MJ-Video against Qwen2-VL-7B through ms-swift on
A100s (``eval_overall_qwen2_7b.py``).  In bf16 the 7B tree is ~16.5 GB —
over a v5e chip's 16 GB HBM, so bf16 serving needs tensor parallelism
(covered by the TP path rules, docs/PARITY.md).  int8 weights halve that
to ~8.3 GB + scales, which FITS: this benchmark initializes the full
7B-dims tree host-side, quantizes it there (``ops/quant.py``), ships the
int8 tree once, and measures the cached judge decode loop single-chip.

Usage: python benchmarks/judge7b_int8_tpu.py [--new-tokens 24]
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
                    help="int8 KV cache: halves per-step cache HBM reads")
    ap.add_argument("--quant", default="int8",
                    choices=["int8", "int8-wo", "int4-wo"],
                    help="serving quantization for the 7B tree (bf16 at "
                         "~16.5 GB does not fit one v5e; int8 ~8.3 GB and "
                         "int4 ~4.2 GB do)")
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.models.qwen2vl import (
        build_video_prompt_ids,
        get_rope_index,
        greedy_generate,
        init_qwen2vl_params,
        qwen2vl_7b_config,
    )
    from mjvideo_tpu.ops.quant import quantize_params_mode, _is_qnode

    cfg = qwen2vl_7b_config()
    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        params = init_qwen2vl_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        params = quantize_params_mode(params, args.quant)
    leaves = jax.tree.leaves(params, is_leaf=_is_qnode)

    def node_bytes(x):
        if _is_qnode(x):
            return sum(a.nbytes for a in jax.tree.leaves(x))
        return x.nbytes

    bytes_total = sum(node_bytes(x) for x in leaves)
    q_elems = sum(
        int(np.prod(x.shape)) for x in leaves if _is_qnode(x))
    print(f"host init+quantize ({args.quant}): "
          f"{time.perf_counter()-t0:.0f}s, "
          f"{bytes_total/2**30:.2f} GiB on device "
          f"(the quantized kernels alone would be "
          f"{2*q_elems/2**30:.1f} GiB in bf16)", flush=True)

    dev = jax.devices()[0]
    t0 = time.perf_counter()
    params = jax.device_put(params, dev)
    jax.block_until_ready(params)
    print(f"upload: {time.perf_counter()-t0:.0f}s to {dev}", flush=True)

    # same judge shape as benchmarks/judge_decode_tpu.py: 8-frame video,
    # grid (4, 18, 24) -> 432 video tokens + ~100 prompt tokens
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
    print(f"prompt {ids.shape[1]} tokens, {args.new_tokens} new tokens",
          flush=True)

    t0 = time.perf_counter()
    toks = greedy_generate(params, cfg, ids, pos, pixel_patches=patches,
                           grid=grid, max_new_tokens=args.new_tokens,
                           kv_quant=args.kv_quant,
                           eos_token_id=-1)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    toks = greedy_generate(params, cfg, ids, pos, pixel_patches=patches,
                           grid=grid, max_new_tokens=args.new_tokens,
                           kv_quant=args.kv_quant,
                           eos_token_id=-1)
    warm = time.perf_counter() - t0
    print(f"7B {args.quant} cached decode, single chip: "
          f"{warm*1e3:8.1f} ms total "
          f"({len(toks)} tokens = {warm*1e3/len(toks):.1f} ms/token, warm; "
          f"first incl. compile {first:.1f}s)", flush=True)


if __name__ == "__main__":
    main()

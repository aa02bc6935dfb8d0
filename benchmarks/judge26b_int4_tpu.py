"""InternVL2-26B judge on ONE v5e chip — enabled by int4 weight-only.

The reference's largest LOCAL judge is InternVL2-26B, served through
ms-swift with ``device_map='auto'`` across A100s
(``eval_overall_internvl2_26b.py``).  At ~25.5B parameters the bf16
tree is ~51 GB and even int8 weights (~25.5 GB) exceed a v5e chip's
16 GB HBM — bf16/int8 single-chip serving is impossible (the TP rules
in ``parallel/`` cover the multi-chip path).  Group-128 int4 weights
(``ops/quant4.py``) drop the tree to ~12.8 GB + bf16 scales (~0.4 GB),
which FITS: this benchmark initializes the 26B tree host-side,
quantizes it there, ships the int4 tree once, and runs a video judge
generation (8 frames x 256 image tokens through the InternViT-6B tower
+ InternLM2-20B cached decode) single-chip.

Host-side init + quantize of 25.5B params takes several minutes on a
1-core host; the upload is ~13 GB.

Usage: python benchmarks/judge26b_int4_tpu.py [--new-tokens 24]
       [--frames 8]
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
                    help="int8 KV cache: halves the decode cache HBM "
                         "(a 26k-token bf16 cache is ~5 GB at 26B dims)")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import internvl2_26b_chat_config
    from mjvideo_tpu.models.generate import GenerationConfig, generate
    from mjvideo_tpu.models.internvl import init_chat_params
    from mjvideo_tpu.ops.quant4 import Q4Kernel, quantize_params_int4

    cfg = internvl2_26b_chat_config()
    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        params = init_chat_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
        params = quantize_params_int4(params)
    leaves = jax.tree.leaves(params,
                             is_leaf=lambda n: isinstance(n, Q4Kernel))
    bytes_total = sum(
        x.packed.nbytes + x.scale.nbytes if isinstance(x, Q4Kernel)
        else x.nbytes for x in leaves)
    nib = sum(2 * x.packed.size for x in leaves if isinstance(x, Q4Kernel))
    print(f"host init+quantize: {time.perf_counter()-t0:.0f}s, "
          f"{bytes_total/2**30:.2f} GiB on device "
          f"(the int4 kernels alone would be {2*nib/2**30:.1f} GiB bf16 / "
          f"{nib/2**30:.1f} GiB int8)", flush=True)

    dev = jax.devices()[0]
    t0 = time.perf_counter()
    params = jax.device_put(params, dev)
    jax.block_until_ready(params)
    print(f"upload: {time.perf_counter()-t0:.0f}s to {dev}", flush=True)

    # judge-shaped prompt: frames x 256 image tokens + short question,
    # bucketed like eval/judges.py does
    F = args.frames
    n_img = F * cfg.num_image_token
    text = 40
    T = ((n_img + text + 63) // 64) * 64
    ids = np.full((1, T), 11, np.int64)
    ids[0, 4:4 + n_img] = cfg.img_context_token_id
    mask = np.ones((1, T), np.int64)
    mask[0, n_img + text:] = 0
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(
        size=(F, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.bfloat16)
    gc = GenerationConfig(max_new_tokens=args.new_tokens, eos_token_id=-1,
                          pad_token_id=0, kv_quant=args.kv_quant)
    print(f"prompt {T} tokens ({n_img} image), {args.new_tokens} new",
          flush=True)

    t0 = time.perf_counter()
    toks = generate(params, cfg, jnp.asarray(ids, jnp.int32),
                    jnp.asarray(mask, jnp.int32), pixel_values=pix,
                    generation_config=gc)
    toks = np.asarray(toks)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    toks = np.asarray(generate(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask, jnp.int32),
                               pixel_values=pix, generation_config=gc))
    warm = time.perf_counter() - t0
    n = toks.shape[1]
    print(f"26B int4-wo judge generation, single chip: {warm*1e3:8.1f} ms "
          f"total ({n} tokens = {warm*1e3/n:.1f} ms/token incl. vision "
          f"prefill, warm; first incl. compile {first:.1f}s)", flush=True)


if __name__ == "__main__":
    main()

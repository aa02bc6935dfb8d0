"""VideoScore (C22) on-chip validation + throughput — one v5e chip.

The reference runs the VideoScore baseline as a torch
``Idefics2ForSequenceClassification`` on A100s
(``eval_genai_videoScore.py:41-129``).  Our JAX port is validated against
transformers on CPU (tests/test_videoscore.py), but two things only a real
chip can prove:

1. **The masked flash path.** On TPU ``attn_impl='auto'`` selects the
   Pallas flash kernel; the variable-aspect VideoScore path (mixed frame
   sizes / ``do_image_splitting``) feeds it a non-causal PADDING MASK —
   a kernel configuration nothing else in the reward/judge stack uses.
   Phase 1 A/Bs flash vs the XLA reference kernel at REAL SigLIP dims
   (1152 x 27 layers) on a mixed-aspect padded batch; phase 2 does the
   same through the FULL model (mid dims) down to the 5 regression
   logits.

2. **Single-chip serving.** The full VideoScore tree is ~8.3B params
   (SigLIP 0.4B + perceiver connector 0.8B + Mistral-7B) = 16.6 GB bf16 —
   over one v5e's 16 GB HBM (the reference needs an A100-40G for the same
   reason).  Weight-only int8 (``ops/quant.py``, the same mode that fits
   the Qwen2-VL-7B judge in ``judge7b_int8_tpu.py``) halves that to
   ~8.3 GB, which FITS: phase 3 measures real-dims 16-frame clip scoring
   end-to-end on one chip, the headline VideoScore-baseline number.

Usage: python benchmarks/videoscore_tpu.py [--skip-real-dims]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _mixed_aspect_batch(rng, shapes, pad_to):
    """Frames of different (H, W) zero-padded bottom/right to ``pad_to``
    with a pixel attention mask — exactly what
    ``VideoScoreJudge.preprocess_frames`` emits for mixed-size inputs."""
    H, W = pad_to
    pix = np.zeros((len(shapes), H, W, 3), np.float32)
    mask = np.zeros((len(shapes), H, W), np.int32)
    for i, (h, w) in enumerate(shapes):
        pix[i, :h, :w] = rng.normal(size=(h, w, 3)).astype(np.float32)
        mask[i, :h, :w] = 1
    return pix, mask


def phase1_masked_vision_flash(jnp, jax):
    """Masked flash vs XLA through vision tower + connector, REAL dims."""
    from mjvideo_tpu.models.videoscore import (
        VideoScoreConfig,
        connector_forward,
        init_videoscore_params,
        videoscore_forward,
    )

    cfg = VideoScoreConfig()
    rng = np.random.default_rng(0)
    # mixed aspects the judge actually produces (shortest>=378,
    # longest<=980, PIL resize of 16:9 and 9:16 sources), padded to the
    # batch max -> both dims carry padding, so the patch mask is 2-D real
    shapes = [(378, 672), (672, 378), (378, 504), (504, 378)]
    pix, mask = _mixed_aspect_batch(rng, shapes, (672, 672))

    # init host-side (subset: the full tree includes the 7B text model —
    # 16.6 GiB bf16 and minutes of host threefry); only the ~2.5 GiB
    # vision+connector goes up
    with jax.default_device(jax.devices("cpu")[0]):
        vparams = init_videoscore_params(
            jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16, num_labels=5,
            subset=("vision_model", "connector"))
    vparams = jax.device_put(vparams, jax.devices()[0])

    def tower(p, pv, pm, impl):
        # the exact mask plumbing of videoscore_forward, vision side only
        P = cfg.vision.patch_size
        N, Hp, Wp = pm.shape
        gh, gw = Hp // P, Wp // P
        grid = pm[:, :gh * P, :gw * P].reshape(N, gh, P, gw, P)
        patch_mask = grid.sum(axis=(2, 4)) > 0
        from mjvideo_tpu.models.videoscore import vision_forward

        vis = vision_forward(p["vision_model"], cfg.vision, pv,
                             attn_impl=impl,
                             patch_attention_mask=patch_mask)
        return connector_forward(p["connector"], cfg.perceiver, vis,
                                 context_mask=patch_mask.reshape(N, -1))

    outs = {}
    for impl in ("flash", "xla"):
        f = jax.jit(lambda p, pv, pm, impl=impl: tower(p, pv, pm, impl))
        t0 = time.perf_counter()
        out = f(vparams, jnp.asarray(pix, jnp.bfloat16),
                jnp.asarray(mask))
        out.block_until_ready()
        outs[impl] = np.asarray(out, np.float32)
        print(f"phase 1: vision+connector REAL dims, masked "
              f"attn_impl={impl}: latents {out.shape} "
              f"[{time.perf_counter() - t0:.0f}s incl. compile]",
              flush=True)
    d = np.abs(outs["flash"] - outs["xla"])
    scale = np.abs(outs["xla"]).max()
    rel = float(d.max() / scale)
    ok = rel < 3e-2  # bf16 accumulation-order difference budget
    print(f"phase 1: masked flash-vs-xla latents: max abs "
          f"{d.max():.3e} (rel {rel:.2e}) "
          f"{'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def phase2_full_model_mid_dims(jnp, jax):
    """Full videoscore_forward, mid dims: flash vs XLA logits on chip."""
    from mjvideo_tpu.configs import LLMConfig
    from mjvideo_tpu.models.videoscore import (
        PerceiverConfig,
        SigLIPVisionConfig,
        VideoScoreConfig,
        init_videoscore_params,
        videoscore_forward,
    )

    cfg = VideoScoreConfig(
        vision=SigLIPVisionConfig(hidden_size=256, intermediate_size=512,
                                  num_hidden_layers=4,
                                  num_attention_heads=4, patch_size=14,
                                  image_size=392),
        perceiver=PerceiverConfig(depth=2, n_heads=4, head_dim=64,
                                  num_key_value_heads=2, n_latents=32),
        text=LLMConfig(architecture="llama", vocab_size=512,
                       hidden_size=256, intermediate_size=512,
                       num_hidden_layers=4, num_attention_heads=4,
                       num_key_value_heads=2, pad_token_id=0),
        image_token_id=127, num_labels=5,
    )
    rng = np.random.default_rng(1)
    shapes = [(224, 392), (392, 224), (280, 280), (392, 392)]
    pix, pmask = _mixed_aspect_batch(rng, shapes, (392, 392))
    n_lat = cfg.perceiver.n_latents
    n_img = len(shapes) * n_lat
    T = n_img + 24
    ids = rng.integers(1, 126, size=(1, T)).astype(np.int32)
    for i in range(len(shapes)):
        ids[0, 4 + i * n_lat: 4 + (i + 1) * n_lat] = cfg.image_token_id
    amask = np.ones((1, T), np.int32)

    params = init_videoscore_params(jax.random.PRNGKey(1), cfg,
                                    dtype=jnp.bfloat16, num_labels=5)
    outs = {}
    for impl in ("flash", "xla"):
        f = jax.jit(lambda p, pv, i, m, pm, impl=impl: videoscore_forward(
            p, cfg, pv, i, m, attn_impl=impl, pixel_attention_mask=pm))
        out = f(params, jnp.asarray(pix, jnp.bfloat16), jnp.asarray(ids),
                jnp.asarray(amask), jnp.asarray(pmask))
        outs[impl] = np.asarray(out, np.float32)
        print(f"phase 2: full model mid dims attn_impl={impl}: "
              f"logits {outs[impl][0].round(4).tolist()}", flush=True)
    d = float(np.abs(outs["flash"] - outs["xla"]).max())
    scale = float(np.abs(outs["xla"]).max())
    ok = d < 3e-2 * max(scale, 1.0)
    print(f"phase 2: flash-vs-xla 5-dim logits: max abs {d:.3e} "
          f"{'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def phase3_real_dims_throughput(jnp, jax, quant_mode):
    """End-to-end 16-frame VideoScore clip scoring at REAL dims, int8-wo."""
    from mjvideo_tpu.models.videoscore import (
        VideoScoreConfig,
        init_videoscore_params,
        videoscore_forward,
    )
    from mjvideo_tpu.ops.quant import _is_qnode, quantize_params_mode

    cfg = VideoScoreConfig(num_labels=5)
    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        params = init_videoscore_params(jax.random.PRNGKey(2), cfg,
                                        dtype=jnp.bfloat16, num_labels=5)
        params = quantize_params_mode(params, quant_mode)
    leaves = jax.tree.leaves(params, is_leaf=_is_qnode)
    total = sum(sum(a.nbytes for a in jax.tree.leaves(x)) if _is_qnode(x)
                else x.nbytes for x in leaves)
    print(f"phase 3: host init+quantize ({quant_mode}): "
          f"{time.perf_counter() - t0:.0f}s, {total / 2**30:.2f} GiB "
          f"(bf16 would be ~16.6 GiB: does not fit one v5e)", flush=True)
    dev = jax.devices()[0]
    t0 = time.perf_counter()
    params = jax.device_put(params, dev)
    jax.block_until_ready(params)
    print(f"phase 3: upload {time.perf_counter() - t0:.0f}s to {dev}",
          flush=True)

    # the judge's real shapes: 16 frames of a 16:9 video, PIL resize ->
    # 378x672 (all one shape -> unmasked fast path), prompt = regression
    # query + 16 x 64 expanded image tokens, bucketed to 1536
    frames, n_lat = 16, cfg.perceiver.n_latents
    rng = np.random.default_rng(2)
    pix = rng.normal(size=(frames, 378, 672, 3)).astype(np.float32)
    T = 1536
    ids = rng.integers(3, 30000, size=(1, T)).astype(np.int32)
    for i in range(frames):
        ids[0, 8 + i * (n_lat + 2): 8 + i * (n_lat + 2) + n_lat] = \
            cfg.image_token_id
    used = 8 + frames * (n_lat + 2) + 180
    amask = np.zeros((1, T), np.int32)
    amask[0, :used] = 1
    ids[0, used:] = cfg.text.pad_token_id

    fwd = jax.jit(lambda p, pv, i, m: videoscore_forward(p, cfg, pv, i, m))
    a_pix = jnp.asarray(pix, jnp.bfloat16)
    a_ids, a_mask = jnp.asarray(ids), jnp.asarray(amask)
    t0 = time.perf_counter()
    out = fwd(params, a_pix, a_ids, a_mask)
    out.block_until_ready()
    first = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(params, a_pix, a_ids, a_mask)
    out.block_until_ready()
    warm = (time.perf_counter() - t0) / reps
    logits = np.asarray(out, np.float32)[0]
    ok = bool(np.isfinite(logits).all())
    print(f"phase 3: VideoScore REAL dims (8.3B {quant_mode}), 16-frame "
          f"clip, single chip: {warm * 1e3:.1f} ms/clip = "
          f"{1.0 / warm:.2f} clips/s (first incl. compile {first:.0f}s); "
          f"logits {logits.round(3).tolist()} "
          f"{'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def phase4_quant_fidelity(jnp, jax, quant_mode, n_pairs=4, frames=4,
                          oracle_cache=None):
    """Fidelity datapoint for the quantized 8.3B serving config (VERDICT
    r4 item 3): host bf16 oracle forward at REAL dims vs the on-chip
    quantized path — 5-dim logit deltas, summed-score delta, and the
    preference/good-bad flip rate on a small synthetic pair set under
    the reference's rules (``eval_genai_videoScore.py:160-205``:
    preference = summed-score comparison; "good" iff total > 2).

    Budget note: the host oracle is ~2*8.3e9*T FLOPs per video on one
    CPU core, so the pair set uses {frames}-frame clips (T = 512-token
    bucket) — the same weights and real model dims, shorter sequence.
    Random-init params make the flip rate PESSIMISTIC: both videos of a
    pair score near zero, so tiny perturbations can flip ties that a
    trained checkpoint would separate.

    ``oracle_cache``: JSON path memoizing the host-oracle logits.  They
    depend only on the init/clip seeds (2 / 7) and (n_pairs, frames, T)
    — NOT on ``quant_mode`` — so A/B-ing two quantized modes against the
    same oracle (e.g. int8-wo vs int8-wo-g128) pays the multi-minute
    per-video host forward only once.
    """
    from mjvideo_tpu.models.videoscore import (
        VideoScoreConfig,
        init_videoscore_params,
        videoscore_forward,
    )
    from mjvideo_tpu.ops.quant import quantize_params_mode

    cfg = VideoScoreConfig(num_labels=5)
    cpu = jax.devices("cpu")[0]
    n_lat = cfg.perceiver.n_latents
    T = 512
    used = 8 + frames * (n_lat + 2) + 120

    def make_clip(rng):
        pix = rng.normal(size=(frames, 378, 672, 3)).astype(np.float32)
        ids = rng.integers(3, 30000, size=(1, T)).astype(np.int32)
        for i in range(frames):
            ids[0, 8 + i * (n_lat + 2): 8 + i * (n_lat + 2) + n_lat] = \
                cfg.image_token_id
        amask = np.zeros((1, T), np.int32)
        amask[0, :used] = 1
        ids[0, used:] = cfg.text.pad_token_id
        return pix, ids, amask

    t0 = time.perf_counter()
    with jax.default_device(cpu):
        params = init_videoscore_params(jax.random.PRNGKey(2), cfg,
                                        dtype=jnp.bfloat16, num_labels=5)
        pq = quantize_params_mode(params, quant_mode)
    print(f"phase 4: host init+quantize {time.perf_counter() - t0:.0f}s",
          flush=True)
    dev = jax.devices()[0]
    pq = jax.device_put(pq, dev)
    jax.block_until_ready(pq)

    fwd_dev = jax.jit(lambda p, pv, i, m: videoscore_forward(p, cfg, pv, i,
                                                             m))

    def fwd_host(pv, ids, amask):
        with jax.default_device(cpu):
            out = jax.jit(
                lambda p, a, b, c: videoscore_forward(
                    p, cfg, a, b, c, attn_impl="xla"))(
                params, jnp.asarray(pv, jnp.bfloat16), jnp.asarray(ids),
                jnp.asarray(amask))
        return np.asarray(out, np.float32)[0]

    import json
    import os

    cache = {}
    if oracle_cache and os.path.exists(oracle_cache):
        with open(oracle_cache) as f:
            cache = json.load(f)
        print(f"phase 4: oracle cache {oracle_cache}: {len(cache)} entries",
              flush=True)

    rng = np.random.default_rng(7)
    logit_deltas, score_deltas = [], []
    flips_pref = flips_good = 0
    for pair in range(n_pairs):
        totals = {"host": [], "dev": []}
        for _v in range(2):
            pv, ids, amask = make_clip(rng)
            key = f"seed2/7:{frames}f:{T}t:pair{pair}:video{_v}"
            t0 = time.perf_counter()
            if key in cache:
                lh = np.asarray(cache[key], np.float32)
            else:
                lh = fwd_host(pv, ids, amask)
                if oracle_cache:
                    cache[key] = [float(x) for x in lh]
                    with open(oracle_cache, "w") as f:
                        json.dump(cache, f, indent=1)
            th = time.perf_counter() - t0
            ld = np.asarray(fwd_dev(pq, jnp.asarray(pv, jnp.bfloat16),
                                    jnp.asarray(ids), jnp.asarray(amask)),
                            np.float32)[0]
            logit_deltas.append(np.abs(lh - ld))
            # the reference sums per-aspect logits rounded to 3 digits
            sh = float(np.round(lh, 3).sum())
            sd = float(np.round(ld, 3).sum())
            score_deltas.append(abs(sh - sd))
            totals["host"].append(sh)
            totals["dev"].append(sd)
            print(f"phase 4: pair {pair} video {_v}: host {lh.round(3)} "
                  f"(sum {sh:+.3f}, {th:.0f}s) vs {quant_mode} "
                  f"{ld.round(3)} (sum {sd:+.3f})", flush=True)
        if ((totals["host"][0] > totals["host"][1])
                != (totals["dev"][0] > totals["dev"][1])):
            flips_pref += 1
        for v in range(2):
            if (totals["host"][v] > 2) != (totals["dev"][v] > 2):
                flips_good += 1
    ld = np.stack(logit_deltas)
    print(f"phase 4: {quant_mode} vs host-bf16 oracle over "
          f"{2 * n_pairs} videos: 5-dim logit delta max {ld.max():.4f} "
          f"mean {ld.mean():.4f}; summed-score delta max "
          f"{max(score_deltas):.4f}; preference flips {flips_pref}/"
          f"{n_pairs}, good-threshold flips {flips_good}/{2 * n_pairs}",
          flush=True)
    # budget: the preference rule compares summed scores of a pair, so
    # the relevant scale is the summed-score delta
    ok = bool(np.isfinite(ld).all())
    print(f"phase 4: {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-real-dims", action="store_true",
                    help="skip the 8.3B int8 upload (phases 1-2 only)")
    ap.add_argument("--quant", default="int8-wo",
                    choices=["int8", "int8-wo", "int8-wo-g128", "int4-wo"])
    ap.add_argument("--fidelity", action="store_true",
                    help="run phase 4: host bf16 oracle vs the quantized "
                         "chip path (VERDICT r4 item 3)")
    ap.add_argument("--pairs", type=int, default=4,
                    help="phase 4 pair count (host-oracle cost is "
                         "~minutes/video; trim for bounded runs)")
    ap.add_argument("--oracle-cache", default=None,
                    help="JSON path memoizing phase 4's host-oracle "
                         "logits (mode-independent) so quant-mode A/Bs "
                         "pay the host forwards once")
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()} {jax.devices()[0]}",
          flush=True)
    if args.fidelity:
        ok = phase4_quant_fidelity(jnp, jax, args.quant,
                                   n_pairs=args.pairs,
                                   oracle_cache=args.oracle_cache)
        print("VIDEOSCORE_TPU_OK" if ok else "VIDEOSCORE_TPU_FAILED",
              flush=True)
        sys.exit(0 if ok else 1)
    ok = phase1_masked_vision_flash(jnp, jax)
    ok &= phase2_full_model_mid_dims(jnp, jax)
    if not args.skip_real_dims:
        ok &= phase3_real_dims_throughput(jnp, jax, args.quant)
    print("VIDEOSCORE_TPU_OK" if ok else "VIDEOSCORE_TPU_FAILED",
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""4B (Phi-3 backbone) score fidelity at REAL dims — the parity-grade
datapoint for mjvideo_4b_config (VERDICT r3 next-8).

Three phases, mirroring what the 2B story already has
(``benchmarks/real_dims_tpu.py`` + the torch-oracle tests):

1. **Torch Phi-3 oracle at real dims** (host, fp32): a transformers
   ``Phi3Model`` at the full 3072x32-layer dims, random-init, imported
   through ``import_decoder_params`` (packed qkv_proj / gate_up_proj
   unpack at full width) — hidden states must match to 32-bit tolerance.
2. **fp32 (host CPU) vs bf16 (chip) reward score** at full 4B dims: both
   initialized from the same PRNG key (threefry is backend-invariant), so
   this equals importing the fp32 checkpoint at bf16; |delta| must beat
   the 1e-2 fidelity target (BASELINE.json).  4B fp32 (15 GB params)
   does not fit a 16 GB chip, hence the host-side fp32 leg.
3. **Export -> safetensors-format -> import round-trip** at full 4B dims
   (bf16): the re-imported tree must reproduce the score bit-exactly
   (exercises the phi3 pack/unpack at real width, not just tiny dims).

Usage: python benchmarks/real_dims_4b_tpu.py [--skip-oracle]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _inputs(ch, rng, frames=2, text=16):
    n_img = ch.num_image_token * frames
    T = n_img + text
    pix = rng.normal(size=(frames, ch.vision.image_size,
                           ch.vision.image_size, 3)).astype(np.float32)
    ids = rng.integers(10, 200, size=(1, T))
    ids[0, 3:3 + n_img] = ch.img_context_token_id
    return pix, ids, np.ones((1, T), np.int32), np.array([T - 6])


def phase_oracle(cfg):
    """Real-dims Phi-3 decoder vs transformers (host fp32, short seq)."""
    import time

    import jax.numpy as jnp
    import torch
    from transformers import Phi3Config, Phi3Model

    from mjvideo_tpu.models import decoder as dec
    from mjvideo_tpu.utils.checkpoint import import_decoder_params

    lc = cfg.chat.llm
    hf = Phi3Config(
        vocab_size=lc.vocab_size, hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_hidden_layers,
        num_attention_heads=lc.num_attention_heads,
        num_key_value_heads=lc.num_key_value_heads,
        max_position_embeddings=lc.max_position_embeddings,
        rms_norm_eps=lc.rms_norm_eps, rope_theta=lc.rope_theta,
        pad_token_id=lc.pad_token_id, attn_implementation="eager",
        resid_pdrop=0.0, embd_pdrop=0.0, attention_dropout=0.0,
    )
    t0 = time.perf_counter()
    torch.manual_seed(1)
    tm = Phi3Model(hf).eval()
    state = {"model." + k: v.numpy() for k, v in tm.state_dict().items()}
    params = import_decoder_params(state, lc, prefix="",
                                   with_lm_head=False)
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 30000, size=(1, 16)).astype(np.int64)
    with torch.no_grad():
        want = tm(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    del tm, state
    x = dec.embed_tokens(params, jnp.asarray(ids, jnp.int32))
    got = np.asarray(dec.decoder_forward(params, lc, x, attn_impl="xla",
                                         remat=False))
    err = float(np.max(np.abs(got - want)))
    rel = err / float(np.max(np.abs(want)))
    print(f"phase 1 (torch Phi-3 oracle @ real 4B dims, fp32 host): "
          f"max abs err {err:.2e} (rel {rel:.2e}) "
          f"[{time.perf_counter() - t0:.0f}s] "
          f"{'PASS' if rel < 1e-4 else 'FAIL'}", flush=True)
    del params
    return rel < 1e-4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_4b_config
    from mjvideo_tpu.models import reward

    cfg = mjvideo_4b_config()
    ch = cfg.chat
    ok = True
    if not args.skip_oracle:
        ok &= phase_oracle(cfg)

    rng = np.random.default_rng(3)
    pix, ids, mask, gpos = _inputs(ch, rng)
    results = {}
    cpu = jax.devices("cpu")[0]
    for dtype, attn, dev in ((jnp.float32, "xla", cpu),
                             (jnp.bfloat16, "auto", None)):
        with jax.default_device(dev) if dev is not None else _null():
            params = reward.init_reward_params(jax.random.PRNGKey(0), cfg,
                                               dtype=dtype)
            fwd = jax.jit(lambda p, pv, i, m, g, attn=attn:
                          reward.reward_forward(p, cfg, pv, i, m, g,
                                                attn_impl=attn,
                                                remat=False).score)
            score = float(np.asarray(fwd(
                params, jnp.asarray(pix, dtype),
                jnp.asarray(ids, jnp.int32), jnp.asarray(mask),
                jnp.asarray(gpos, jnp.int32)))[0])
        name = str(jnp.dtype(dtype).name)
        results[name] = score
        where = "cpu" if dev is not None else jax.default_backend()
        print(f"phase 2: 4B dims on {where}: {name} (attn={attn}) "
              f"score = {score:.6f}", flush=True)
        if dtype == jnp.bfloat16:
            # phase 3: round-trip the bf16 tree through the reference
            # checkpoint format at full width
            from mjvideo_tpu.utils.checkpoint import import_reward_checkpoint
            from mjvideo_tpu.utils.export import export_reward_checkpoint

            state = export_reward_checkpoint(params, cfg)  # host numpy fp32
            # Free the original device tree before re-importing: two full
            # 4B bf16 trees (~8 GB each) do not fit one 16 GB chip.
            del params
            re_params = import_reward_checkpoint(state, cfg, jnp.bfloat16)
            score_rt = float(np.asarray(fwd(
                re_params, jnp.asarray(pix, dtype),
                jnp.asarray(ids, jnp.int32), jnp.asarray(mask),
                jnp.asarray(gpos, jnp.int32)))[0])
            rt_ok = score_rt == score
            ok &= rt_ok
            print(f"phase 3: export->import round-trip @ 4B dims: "
                  f"score {score_rt:.6f} "
                  f"({'bit-exact PASS' if rt_ok else 'FAIL'})", flush=True)
            del re_params, state
        else:
            del params

    d = abs(results["bfloat16"] - results["float32"])
    fid = d < 1e-2
    ok &= fid
    print(f"phase 2: |bf16(chip) - fp32(host)| @ 4B dims: {d:.2e} "
          f"({'PASS' if fid else 'FAIL'} vs 1e-2 fidelity target)",
          flush=True)
    print("REAL_DIMS_4B_OK" if ok else "REAL_DIMS_4B_FAILED", flush=True)
    sys.exit(0 if ok else 1)


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()

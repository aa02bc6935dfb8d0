"""ViT attention operand-layout A/B: transposing kernel vs direct-BSHD.

The round-3 optimized-HLO audit charges ~0.3 ms/layer to operand-layout
copies around the ViT attention kernel (docs/PERF.md): `_fwd_nc_impl`
transposes q/k/v from the model's natural (B, S, H, D) to (B, H, S, D)
and the output back — four full-tensor HBM copies per layer that exist
only because the Pallas blocks slice the head axis ahead of the token
axis.

Candidate: a BSHD-native kernel that indexes the UNtransposed arrays via
BlockSpec (block (1, block_q, H, D), whole-H), looping heads inside the
program with strided VMEM slices.  Trades 4 HBM copies/layer for
in-VMEM sublane gathers; whether that wins is a measurement question —
per VERDICT r3 item 9, adopt only if the layer-level A/B shows >= 3%.

Measures one full ViT block (norm + qkv + attention + proj + MLP) at
bench dims, chained under one jit (serial dependency defeats CSE),
variants back-to-back in one process.

Usage: python benchmarks/vit_layout_ab.py [--tiles 8] [--chain 24]
       python benchmarks/vit_layout_ab.py --check   (interpret-mode parity)
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


# ------------------------------------------------------ BSHD candidate

def _nc_bshd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_pad):
    """Direct-softmax non-causal attention on per-head (1, bq, 1, 1, D)
    blocks of the UNtransposed 5D view (B, S, H, 1, D).

    Same math as ops.flash_attention._fwd_nc_kernel with hp=1; the head
    selection happens entirely in the BlockSpec index maps (head rides
    the third-from-minor axis of the free 5D reshape, where blocking at
    1 is granule-free — blocking the head at 1 on the second-minor axis
    of a plain (B, S, H, D) array violates mosaic's 8-sublane rule, and
    in-kernel head slicing either fails layout inference or, unrolled,
    keeps every head's fp32 s/p live at once: 47 MB of scoped VMEM)."""
    import jax.numpy as jnp

    from mjvideo_tpu.ops.flash_attention import _dot

    q = q_ref[0, :, 0, 0, :]
    k = k_ref[0, :, 0, 0, :]
    v = v_ref[0, :, 0, 0, :]
    s = _dot(q, k, trans_b=True) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if kv_pad:
        l = jnp.maximum(l - kv_pad * jnp.exp(-m), 1e-30)
    acc = _dot(p.astype(v.dtype), v)
    # Store to a standard (1, 1, bq, D) BHSD block: a computed (bq, D)
    # value cannot be shape-cast INTO the degenerate 5D block layout
    # (loads squeeze fine; the reverse direction fails layout
    # inference), so the output keeps one host-side transpose.
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("scale", "interpret", "kv_valid", "block_q"),
)
def nc_bshd_attention(q, k, v, scale=None, kv_valid=None, interpret=False,
                      block_q=None):
    """(B, S, H, D) non-causal maskless attention with NO host-side
    transposes or pads: in AND out ride the model's natural layout.
    Requires S % 8 == 0 (the ViT pre-pads to an 8-aligned length
    already — models/vit.py); kv rows [kv_valid, S) must be exactly
    zero, as in the production kernel's contract."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, H, D = q.shape
    assert S % 8 == 0, "BSHD path requires an 8-aligned sequence"
    if scale is None:
        scale = D**-0.5
    n_real = S if kv_valid is None else kv_valid
    bq = block_q or S  # whole-row q wins at ViT dims (as production hp=1)

    q5 = q.reshape(B, S, H, 1, D)
    k5 = k.reshape(B, S, H, 1, D)
    v5 = v.reshape(B, S, H, 1, D)
    kernel = functools.partial(_nc_bshd_kernel, scale=scale,
                               kv_pad=S - n_real)
    out = pl.pallas_call(
        kernel,
        grid=(B, H, S // bq),
        in_specs=[
            pl.BlockSpec((1, bq, 1, 1, D), lambda b, h, i: (b, i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1, 1, D), lambda b, h, i: (b, 0, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1, 1, D), lambda b, h, i: (b, 0, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D),
                               lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q5, k5, v5)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, S, H * D)


# ------------------------------------------------------------- harness

def make_block_fn(cfg, p, attn):
    """One ViT block at bench dims with the attention impl swapped in."""
    import jax.numpy as jnp

    from mjvideo_tpu.models import vit
    from mjvideo_tpu.ops.matmul import dot
    from mjvideo_tpu.ops.norms import rms_norm

    def block(x, seq_valid):
        B, S, C = x.shape
        H, D = cfg.num_attention_heads, cfg.head_dim
        h = vit._norm(cfg, p["norm1"], x).astype(x.dtype)
        qkv = dot(h, p["attn"]["qkv"]["kernel"])
        if "bias" in p["attn"]["qkv"]:
            qkv = qkv + p["attn"]["qkv"]["bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if cfg.qk_normalization:
            q = rms_norm(q, p["attn"]["q_norm"]["weight"],
                         eps=cfg.layer_norm_eps)
            k = rms_norm(k, p["attn"]["k_norm"]["weight"],
                         eps=cfg.layer_norm_eps)
        row_ok = (jnp.arange(S) < seq_valid).astype(x.dtype)[None, :, None]
        k = k * row_ok
        v = v * row_ok
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, H, D)
        v = v.reshape(B, S, H, D)
        a = attn(q, k, v, seq_valid)
        a = a.reshape(B, S, C)
        a = dot(a, p["attn"]["proj"]["kernel"]) + p["attn"]["proj"]["bias"]
        x = x + a * p["ls1"]
        h = vit._norm(cfg, p["norm2"], x).astype(x.dtype)
        h = dot(h, p["mlp"]["fc1"]["kernel"]) + p["mlp"]["fc1"]["bias"]
        h = vit.gelu(h)
        h = dot(h, p["mlp"]["fc2"]["kernel"]) + p["mlp"]["fc2"]["bias"]
        return x + h * p["ls2"]

    return block


def check():
    """Interpret-mode parity: BSHD kernel vs production kernel, CPU."""
    import jax

    # The axon TPU plugin ignores JAX_PLATFORMS (see tests/conftest.py);
    # pin through config so --check never touches the chip.
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mjvideo_tpu.ops.flash_attention import _fwd_nc_impl

    rng = np.random.default_rng(0)
    for B, S, H, D, valid in ((2, 64, 4, 32, None), (1, 128, 2, 64, 101),
                              (2, 256, 8, 64, 250)):
        q = rng.normal(size=(B, S, H, D)).astype(np.float32)
        k = rng.normal(size=(B, S, H, D)).astype(np.float32)
        v = rng.normal(size=(B, S, H, D)).astype(np.float32)
        if valid is not None:
            k[:, valid:] = 0.0
            v[:, valid:] = 0.0
        want = np.asarray(_fwd_nc_impl(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, None,
            None, True, False, kv_valid=valid)).reshape(B, S, H * D)
        got = np.asarray(nc_bshd_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            kv_valid=valid, interpret=True))
        err = float(np.max(np.abs(got - want)))
        print(f"B{B} S{S} H{H} D{D} valid={valid}: max |bshd - prod| "
              f"= {err:.2e} {'PASS' if err < 1e-5 else 'FAIL'}")
        assert err < 1e-5
    print("CHECK_OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--chain", type=int, default=24)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        check()
        return

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_2b_config
    from mjvideo_tpu.models import vit
    from mjvideo_tpu.ops.flash_attention import flash_attention

    cfg = mjvideo_2b_config().chat.vision
    dtype = jnp.bfloat16
    params = jax.tree.map(
        lambda x: x[0] if x.ndim and x.shape[0] == cfg.num_hidden_layers
        else x,
        vit.init_vit_params(jax.random.PRNGKey(0), cfg, dtype=dtype),
    )["layers"]

    B = args.tiles
    S_real = (cfg.image_size // cfg.patch_size) ** 2 + 1  # 1025
    S = (S_real + 7) // 8 * 8  # 1032, as vit_forward pre-pads
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)) * 0.02, dtype)

    def attn_prod(q, k, v, seq_valid):
        return flash_attention(q, k, v, kv_valid=seq_valid)

    def attn_bshd(q, k, v, seq_valid):
        return nc_bshd_attention(q, k, v, kv_valid=seq_valid)

    variants = {"prod(transpose)": attn_prod, "bshd(no-copy)": attn_bshd}
    n = args.chain
    for name, attn in variants.items():
        block = make_block_fn(cfg, params, attn)

        @jax.jit
        def many(x):
            def body(c, _):
                return block(c, S_real), None

            xf, _ = jax.lax.scan(body, x, None, length=n)
            return xf[0, 0, 0]

        np.asarray(many(x0))  # compile + warm
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = many(x0)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / (reps * n)
        print(f"{name:18s}: {dt * 1e3:7.3f} ms/layer "
              f"({B} tiles, S={S}, chain={n})", flush=True)


if __name__ == "__main__":
    main()

"""InternViT encoder, TPU-native.

Replaces ``modeling_intern_vit.py`` (InternVisionModel / InternVisionEncoder /
InternAttention / InternVisionEmbeddings).  TPU-first design choices:

* NHWC pixel layout; the k14/s14 patch conv becomes an exact reshape + matmul
  (stride == kernel), which maps straight onto the MXU instead of a conv
  lowering.
* Layers are stacked (leading axis L) and driven by ``lax.scan`` — one traced
  block, 24x smaller HLO, uniform sharding specs.
* Gradient checkpointing via ``jax.checkpoint`` on the scanned block (the
  reference always checkpoints the ViT: ``modeling_intern_vit.py:315,344-347``).
* QK-normalization (6B variant) is RMSNorm over the *full* hidden dim across
  heads, exactly as ``modeling_intern_vit.py:215-218`` does.
* Attention runs through ``ops.attention`` (XLA oracle or Pallas flash).

Supports both checkpoint families: InternViT-300M (layer_norm, no qk_norm) and
InternViT-6B (rms_norm + qk_norm), selected by config.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..configs import VisionConfig
from ..ops.attention import multi_head_attention
from ..ops.matmul import dot, gelu
from ..ops.norms import layer_norm, rms_norm

# Cauchy-Schwarz softmax bound on the nc flash kernel (see _block).
_NC_BOUND = os.environ.get("MJV_NC_NORM_BOUND", "1") != "0"


def _norm(cfg: VisionConfig, p, x):
    if cfg.norm_type == "rms_norm":
        return rms_norm(x, p["weight"], eps=cfg.layer_norm_eps)
    return layer_norm(x, p["weight"], p["bias"], eps=cfg.layer_norm_eps)


def init_vit_params(key, cfg: VisionConfig, dtype=jnp.float32):
    """Initialize a ViT parameter pytree (stacked layers)."""
    C, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    P = cfg.patch_size
    n_pos = cfg.num_patches_per_side**2 + 1
    k = jax.random.split(key, 8)

    def dense(key, shape):
        return (jax.random.normal(key, shape) * 0.02).astype(dtype)

    def norm_p(stacked=True):
        shape = (L, C) if stacked else (C,)
        p = {"weight": jnp.ones(shape, dtype)}
        if cfg.norm_type != "rms_norm":
            p["bias"] = jnp.zeros(shape, dtype)
        return p

    layers = {
        "norm1": norm_p(),
        "norm2": norm_p(),
        "attn": {
            "qkv": {"kernel": dense(k[0], (L, C, 3 * C)),
                    "bias": jnp.zeros((L, 3 * C), dtype)},
            "proj": {"kernel": dense(k[1], (L, C, C)),
                     "bias": jnp.zeros((L, C), dtype)},
        },
        "mlp": {
            "fc1": {"kernel": dense(k[2], (L, C, I)),
                    "bias": jnp.zeros((L, I), dtype)},
            "fc2": {"kernel": dense(k[3], (L, I, C)),
                    "bias": jnp.zeros((L, C), dtype)},
        },
        "ls1": jnp.full((L, C), cfg.initializer_factor, dtype),
        "ls2": jnp.full((L, C), cfg.initializer_factor, dtype),
    }
    if cfg.qk_normalization:
        layers["attn"]["q_norm"] = {"weight": jnp.ones((L, C), dtype)}
        layers["attn"]["k_norm"] = {"weight": jnp.ones((L, C), dtype)}
    if not cfg.qkv_bias:
        del layers["attn"]["qkv"]["bias"]

    return {
        "embeddings": {
            "class_embedding": dense(k[4], (1, 1, C)),
            "patch_embedding": {
                "kernel": dense(k[5], (P * P * 3, C)),
                "bias": jnp.zeros((C,), dtype),
            },
            "position_embedding": dense(k[6], (1, n_pos, C)),
        },
        "layers": layers,
    }


def patch_embed(p, pixel_values: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Patchify NHWC pixels and project: exact equivalent of Conv2d(k=s=P).

    Patch vector ordering is (ph, pw, channel); the safetensors importer
    transposes the torch conv weight (C_out, C_in, kh, kw) -> (kh, kw, C_in)
    to match.
    """
    N, H, W, _ = pixel_values.shape
    P = patch_size
    gh, gw = H // P, W // P
    x = pixel_values.reshape(N, gh, P, gw, P, 3)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # (N, gh, gw, P, P, 3)
    x = x.reshape(N, gh * gw, P * P * 3)
    return dot(x, p["kernel"]) + p["bias"]


def embeddings(p, cfg: VisionConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """Patch embed + cls token + (interpolated) position embeddings.

    Reference: ``modeling_intern_vit.py:133-174``.  Bicubic pos-embed
    interpolation (non-antialiased, matching ``F.interpolate(align_corners=
    False)``) only triggers off the native 448 grid.
    """
    N, H, W, _ = pixel_values.shape
    patches = patch_embed(p["patch_embedding"], pixel_values, cfg.patch_size)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(patches.dtype),
        (N, 1, cfg.hidden_size),
    )
    x = jnp.concatenate([cls, patches], axis=1)

    pos = p["position_embedding"]
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    side = cfg.num_patches_per_side
    if (gh, gw) != (side, side):
        grid = pos[:, 1:, :].astype(jnp.float32).reshape(1, side, side, -1)
        grid = jax.image.resize(
            grid, (1, gh, gw, grid.shape[-1]), method="bicubic", antialias=False
        )
        pos = jnp.concatenate(
            [pos[:, :1, :].astype(jnp.float32), grid.reshape(1, gh * gw, -1)],
            axis=1,
        )
    return x + pos.astype(x.dtype)


def _drop_path(x: jnp.ndarray, rate, key) -> jnp.ndarray:
    """Stochastic depth on a residual branch (timm DropPath semantics,
    ``modeling_intern_vit.py:280-281``): per-sample binary keep, scaled."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1))
    return (jnp.where(mask, x.astype(jnp.float32) / keep, 0.0)).astype(x.dtype)


def _dropout(x: jnp.ndarray, rate: float, key) -> jnp.ndarray:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return (jnp.where(mask, x.astype(jnp.float32) / keep, 0.0)).astype(x.dtype)


def _block(cfg: VisionConfig, p, x: jnp.ndarray, attn_impl: str,
           dp_rate=None, rng=None, seq_valid=None) -> jnp.ndarray:
    """One pre-norm ViT block with LayerScale. Ref: intern_vit.py:266-295.

    ``rng`` set = training mode: applies proj dropout (``cfg.dropout``,
    ``modeling_intern_vit.py:198``) and DropPath at this layer's ``dp_rate``
    on both residual branches.  ``rng`` None = deterministic (eval).

    ``seq_valid`` set = the sequence was pre-padded to an aligned length
    (``vit_forward``): rows [seq_valid, S) are dead.  k/v dead rows are
    zeroed (a multiply that fuses into the qkv projection epilogue) and
    declared to the attention kernel via ``kv_valid`` — this removes the
    per-layer 1025->1032 pad + slice copies the round-2 trace measured at
    ~29 GB/s effective (docs/PERF.md).
    """
    B, S, C = x.shape
    H, D = cfg.num_attention_heads, cfg.head_dim

    h = _norm(cfg, p["norm1"], x).astype(x.dtype)
    qkv = dot(h, p["attn"]["qkv"]["kernel"])
    if "bias" in p["attn"]["qkv"]:
        qkv = qkv + p["attn"]["qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if cfg.qk_normalization:
        # RMSNorm across the full hidden dim (all heads jointly), as reference.
        q = rms_norm(q, p["attn"]["q_norm"]["weight"], eps=cfg.layer_norm_eps)
        k = rms_norm(k, p["attn"]["k_norm"]["weight"], eps=cfg.layer_norm_eps)
    if seq_valid is not None:
        # Dead rows re-acquire nonzero values through norm biases each
        # layer; zero them in k/v so they cannot leak into real rows (the
        # ONLY cross-token op is attention).
        row_ok = (jnp.arange(S) < seq_valid).astype(x.dtype)[None, :, None]
        k = k * row_ok
        v = v * row_ok
    q = q.reshape(B, S, H, D)
    k = k.reshape(B, S, H, D)
    v = v.reshape(B, S, H, D)
    # norm_bound: both InternViT families normalize before the qkv
    # projection (300M pre-LayerNorm; 6B pre-RMSNorm + QK-RMSNorm), so
    # q/k magnitudes are bounded and the Cauchy-Schwarz softmax bound's
    # gap sits ~7-11 nats (needs ~85 to degrade) — +9.1% kernel-level
    # on v5e (benchmarks/vit_nc_bound_ab.py).  MJV_NC_NORM_BOUND=0
    # restores the exact row max for A/Bs.
    attn = multi_head_attention(q, k, v, causal=False, impl=attn_impl,
                                kv_valid=seq_valid, norm_bound=_NC_BOUND)
    attn = attn.reshape(B, S, C)
    attn = dot(attn, p["attn"]["proj"]["kernel"]) + p["attn"]["proj"]["bias"]
    if rng is not None:
        k1, k2, k3 = jax.random.split(rng, 3)
        if cfg.dropout > 0.0:
            attn = _dropout(attn, cfg.dropout, k3)
        x = x + _drop_path(attn * p["ls1"], dp_rate, k1)
    else:
        x = x + attn * p["ls1"]

    h = _norm(cfg, p["norm2"], x).astype(x.dtype)
    h = dot(h, p["mlp"]["fc1"]["kernel"]) + p["mlp"]["fc1"]["bias"]
    h = gelu(h)
    h = dot(h, p["mlp"]["fc2"]["kernel"]) + p["mlp"]["fc2"]["bias"]
    if rng is not None:
        return x + _drop_path(h * p["ls2"], dp_rate, k2)
    return x + h * p["ls2"]


def vit_forward(
    params,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,
    select_layer: int = -1,
    attn_impl: str = "auto",
    remat: bool = True,
    rng=None,
) -> jnp.ndarray:
    """Run the encoder; returns hidden states (N, S, C) after ``select_layer``.

    ``select_layer=-1`` = all layers (reference ``extract_feature``,
    ``modeling_internvl_chat.py:244-254``); more-negative values stop early —
    done here by slicing the scanned layer stack, so the skipped layers are
    never computed (the reference computes them and discards).

    ``rng`` set = training mode: DropPath at per-layer rates
    ``linspace(0, cfg.drop_path_rate, L)`` (``modeling_intern_vit.py:312``)
    and proj dropout apply.  ``rng`` None = eval (deterministic).
    ``attention_dropout`` (dropout on softmax probs) is unsupported inside
    the fused attention kernels and raises rather than silently no-op.
    """
    x = embeddings(params["embeddings"], cfg, pixel_values)

    # Pre-pad the token axis once to 8-alignment (1025 -> 1032 for 448px
    # tiles) so every attention call sees aligned operands: the per-layer
    # q/k/v pads and output slices disappear from the compiled graph (they
    # cost ~3 ms/clip as strided-copy traffic — docs/PERF.md round 3).
    # Dead-row bookkeeping lives in _block (zeroed k/v + kv_valid).
    S = x.shape[1]
    Sp = -(-S // 8) * 8
    seq_valid = None
    if Sp != S:
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
        seq_valid = S

    L = cfg.num_hidden_layers
    n_run = L if select_layer == -1 else L + select_layer + 1
    layers = params["layers"]
    if n_run != L:
        layers = jax.tree.map(lambda a: a[:n_run], layers)

    stochastic = rng is not None and (cfg.drop_path_rate > 0.0
                                      or cfg.dropout > 0.0)
    if stochastic:
        if cfg.attention_dropout > 0.0:
            raise ValueError(
                "attention_dropout > 0 is not supported by the fused "
                "attention kernels; published InternViT configs use 0.0"
            )
        # Rates come from the FULL-depth schedule, sliced to the layers that
        # run: the reference builds linspace(0, rate, num_hidden_layers) and
        # indexes it per layer (modeling_intern_vit.py:312), so a truncated
        # tower (select_layer < -1) keeps each layer's original rate.
        dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, L)[:n_run]
        keys = jax.random.split(rng, n_run)

        def block(carry, sc):
            lp, r, k = sc
            return _block(cfg, lp, carry, attn_impl, dp_rate=r, rng=k,
                          seq_valid=seq_valid), None

        xs = (layers, dp_rates, keys)
    else:
        block = lambda carry, lp: (
            _block(cfg, lp, carry, attn_impl, seq_valid=seq_valid), None)
        xs = layers
    from ..ops.remat import remat_wrap

    block = remat_wrap(block, remat)
    x, _ = jax.lax.scan(block, x, xs)
    return x if seq_valid is None else x[:, :seq_valid]

"""CogVLM2-Video backbone, TPU-native — the fourth local baseline-judge family.

The reference benchmarks MJ-Video against CogVLM2-Video through ms-swift
(``eval_overall_cogvlm2.py:119-129``, ``ModelType.cogvlm2_video_13b_chat``).
This is a from-scratch JAX port of the CogVLM2-Video architecture
(THUDM/cogvlm2-video-llama3-chat, trust_remote_code ``visual.py`` /
``modeling_cogvlm.py``):

* an **EVA2-CLIP** vision tower with the EVA block quirk — LayerNorm applied
  to each sublayer's OUTPUT before the residual add (not pre-norm);
* a conv-2x2 downsample + **GLU adapter** (SwiGLU-style projector) with
  learned ``boi``/``eoi`` boundary embeddings per frame;
* a Llama-3-8B text model where every layer carries **two experts** —
  separate QKV/dense/MLP weights for vision vs language token positions —
  and all interior vision tokens of a run share one RoPE position
  (``build_position_ids``).

Validated against an independent torch oracle (``tests/test_cogvlm2.py``)
built from the same published structure.

TPU-first notes:

* The reference routes experts by boolean indexing
  (``mixed_raw_layer[vision_mask] = vision_expert(...)``) — dynamic shapes.
  Here both experts run dense and a (B, T, 1) mask selects per position:
  static shapes, MXU-friendly, and the doubled projection FLOPs are cheap
  relative to attention at judge sequence lengths.
* ``build_position_ids`` is pure host-side integer work computed at
  tokenization time, like the gating-token position (SURVEY.md §3.1).
* Frames are encoded as a batch through one jitted vision tower (static
  per-frame shapes; no per-image python loop).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import LLMConfig
from ..ops.attention import multi_head_attention
from ..ops.matmul import dot, dot_f32
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import apply_rope, rope_tables
from . import decoder as dec
from .internvl import scatter_image_embeds
from .vit import patch_embed

LANGUAGE_TOKEN_TYPE = 0
VISION_TOKEN_TYPE = 1


@dataclass(frozen=True)
class CogVLM2VisionConfig:
    """EVA2-CLIP-E tower (cogvlm2-video-llama3-chat ``vision_config``)."""

    hidden_size: int = 1792
    intermediate_size: int = 15360
    num_hidden_layers: int = 63
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    layer_norm_eps: float = 1e-6
    scaling_factor: float = 8.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def tokens_per_frame(self) -> int:
        # conv 2x2 stride 2 downsample + boi/eoi
        return (self.grid // 2) ** 2 + 2


@dataclass(frozen=True)
class CogVLM2Config:
    vision: CogVLM2VisionConfig = field(default_factory=CogVLM2VisionConfig)
    # Llama-3-8B dims (cogvlm2-video-llama3-chat config.json);
    # num_multi_query_heads=8 is the GQA kv head count.
    text: LLMConfig = field(default_factory=lambda: LLMConfig(
        architecture="llama", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8,
        rope_theta=500000.0, rms_norm_eps=1e-5, pad_token_id=128002,
        max_position_embeddings=8192,
    ))
    bos_token_id: int = 128000
    eos_token_id: int = 128001
    pad_token_id: int = 128002


def cogvlm2_config_from_hf(d: Dict[str, Any]) -> CogVLM2Config:
    """Build a CogVLM2Config from an HF cogvlm2 config.json dict."""
    v = d.get("vision_config", {})
    return CogVLM2Config(
        vision=CogVLM2VisionConfig(
            hidden_size=v.get("hidden_size", 1792),
            intermediate_size=v.get("intermediate_size", 15360),
            num_hidden_layers=v.get("num_hidden_layers", 63),
            num_heads=v.get("num_heads", 16),
            patch_size=v.get("patch_size", 14),
            image_size=v.get("image_size", 224),
            layer_norm_eps=v.get("layer_norm_eps", 1e-6),
            scaling_factor=v.get("scaling_factor", 8.0),
        ),
        text=LLMConfig(
            architecture="llama",
            vocab_size=d.get("vocab_size", 128256),
            hidden_size=d.get("hidden_size", 4096),
            intermediate_size=d.get("intermediate_size", 14336),
            num_hidden_layers=d.get("num_hidden_layers", 32),
            num_attention_heads=d.get("num_attention_heads", 32),
            num_key_value_heads=d.get("num_multi_query_heads", 8),
            rope_theta=d.get("rope_theta", 500000.0),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            pad_token_id=d.get("pad_token_id", 128002) or 128002,
            max_position_embeddings=d.get("max_position_embeddings", 8192),
        ),
        bos_token_id=d.get("bos_token_id", 128000),
        eos_token_id=d.get("eos_token_id", 128001),
        pad_token_id=d.get("pad_token_id", 128002) or 128002,
    )


# -------------------------------------------------------------------- params

def init_cogvlm2_params(key, cfg: CogVLM2Config, dtype=jnp.float32):
    vc, tc = cfg.vision, cfg.text
    C, I, L = vc.hidden_size, vc.intermediate_size, vc.num_hidden_layers
    D, TI = tc.hidden_size, tc.intermediate_size
    Lt = tc.num_hidden_layers
    Hq, Hkv, hd = (tc.num_attention_heads, tc.num_key_value_heads,
                   tc.head_dim)
    qkv_size = Hq * hd + 2 * Hkv * hd
    P = vc.patch_size
    k = jax.random.split(key, 27)

    def dense(key, shape):
        return (jax.random.normal(key, shape) * 0.02).astype(dtype)

    vision = {
        "patch_embedding": {"kernel": dense(k[0], (P * P * 3, C)),
                            "bias": jnp.zeros((C,), dtype)},
        "cls_embedding": dense(k[1], (C,)),
        "position_embedding": dense(k[2], (vc.grid**2 + 1, C)),
        "layers": {
            "ln1": {"weight": jnp.ones((L, C), dtype),
                    "bias": jnp.zeros((L, C), dtype)},
            "ln2": {"weight": jnp.ones((L, C), dtype),
                    "bias": jnp.zeros((L, C), dtype)},
            "qkv": {"kernel": dense(k[3], (L, C, 3 * C)),
                    "bias": jnp.zeros((L, 3 * C), dtype)},
            "dense": {"kernel": dense(k[4], (L, C, C)),
                      "bias": jnp.zeros((L, C), dtype)},
            "fc1": {"kernel": dense(k[5], (L, C, I)),
                    "bias": jnp.zeros((L, I), dtype)},
            "fc2": {"kernel": dense(k[6], (L, I, C)),
                    "bias": jnp.zeros((L, C), dtype)},
        },
    }
    adapter = {
        "conv": {"kernel": dense(k[7], (4 * C, C)),
                 "bias": jnp.zeros((C,), dtype)},
        "linear_proj": {"kernel": dense(k[8], (C, D))},
        "norm1": {"weight": jnp.ones((D,), dtype),
                  "bias": jnp.zeros((D,), dtype)},
        "gate_proj": {"kernel": dense(k[9], (D, TI))},
        "dense_h_to_4h": {"kernel": dense(k[10], (D, TI))},
        "dense_4h_to_h": {"kernel": dense(k[11], (TI, D))},
        "boi": dense(k[12], (1, 1, D)),
        "eoi": dense(k[13], (1, 1, D)),
    }
    text = {
        "tok_embeddings": dense(k[14], (tc.vocab_size, D)),
        "layers": {
            "attention_norm": {"weight": jnp.ones((Lt, D), dtype)},
            "ffn_norm": {"weight": jnp.ones((Lt, D), dtype)},
            "attention": {
                # vision expert QKV carries a bias; language expert doesn't
                # (modeling_cogvlm.py VisionExpertAttention.__init__)
                "vision_qkv": {"kernel": dense(k[15], (Lt, D, qkv_size)),
                               "bias": jnp.zeros((Lt, qkv_size), dtype)},
                "language_qkv": {"kernel": dense(k[16], (Lt, D, qkv_size))},
                "vision_dense": {"kernel": dense(k[17], (Lt, Hq * hd, D))},
                "language_dense": {"kernel": dense(k[18], (Lt, Hq * hd, D))},
            },
            "mlp": {
                "vision": {
                    "w1": {"kernel": dense(k[19], (Lt, D, TI))},
                    "w3": {"kernel": dense(k[20], (Lt, D, TI))},
                    "w2": {"kernel": dense(k[21], (Lt, TI, D))},
                },
                "language": {
                    "w1": {"kernel": dense(k[22], (Lt, D, TI))},
                    "w3": {"kernel": dense(k[23], (Lt, D, TI))},
                    "w2": {"kernel": dense(k[24], (Lt, TI, D))},
                },
            },
        },
        "norm": {"weight": jnp.ones((D,), dtype)},
        "output": {"kernel": dense(k[25], (D, tc.vocab_size))},
    }
    return {"vision": vision, "adapter": adapter, "language_model": text}


def import_cogvlm2_params(state: Dict[str, np.ndarray], cfg: CogVLM2Config,
                          dtype=jnp.float32):
    """Map an HF CogVLM2 (THUDM layout) state_dict to our pytree.

    Published names: ``model.vision.*`` (patch_embedding / transformer
    layers / linear_proj / conv / boi / eoi), ``model.layers.{i}.*`` with
    ``self_attn.vision_expert_query_key_value`` etc., ``model.norm``,
    ``lm_head``, ``model.embed_tokens``.
    """
    vc, tc = cfg.vision, cfg.text
    L, Lt = vc.num_hidden_layers, tc.num_hidden_layers

    def g(name):
        for p in ("", "model."):
            if p + name in state:
                return np.asarray(state[p + name])
        raise KeyError(name)

    def arr(x):
        return jnp.asarray(np.asarray(x), dtype)

    def stack(fmt, n, transpose=False):
        ws = [g(fmt.format(i=i)) for i in range(n)]
        return arr(np.stack([w.T if transpose else w for w in ws]))

    P = vc.patch_size
    conv_w = g("vision.patch_embedding.proj.weight")
    conv_w = conv_w.transpose(2, 3, 1, 0).reshape(P * P * 3, -1)
    vb = "vision.transformer.layers.{i}."
    vision = {
        "patch_embedding": {
            "kernel": arr(conv_w),
            "bias": arr(g("vision.patch_embedding.proj.bias")),
        },
        "cls_embedding": arr(
            g("vision.patch_embedding.cls_embedding").reshape(-1)),
        "position_embedding": arr(
            g("vision.patch_embedding.position_embedding.weight")),
        "layers": {
            "ln1": {"weight": stack(vb + "input_layernorm.weight", L),
                    "bias": stack(vb + "input_layernorm.bias", L)},
            "ln2": {"weight": stack(vb + "post_attention_layernorm.weight", L),
                    "bias": stack(vb + "post_attention_layernorm.bias", L)},
            "qkv": {"kernel": stack(vb + "attention.query_key_value.weight",
                                    L, True),
                    "bias": stack(vb + "attention.query_key_value.bias", L)},
            "dense": {"kernel": stack(vb + "attention.dense.weight", L, True),
                      "bias": stack(vb + "attention.dense.bias", L)},
            "fc1": {"kernel": stack(vb + "mlp.fc1.weight", L, True),
                    "bias": stack(vb + "mlp.fc1.bias", L)},
            "fc2": {"kernel": stack(vb + "mlp.fc2.weight", L, True),
                    "bias": stack(vb + "mlp.fc2.bias", L)},
        },
    }
    # conv 2x2 stride 2: torch (C_out, C_in, 2, 2) -> (kh, kw, C_in) flat
    cw = g("vision.conv.weight")
    adapter = {
        "conv": {"kernel": arr(cw.transpose(2, 3, 1, 0).reshape(
            4 * vc.hidden_size, -1)),
            "bias": arr(g("vision.conv.bias"))},
        "linear_proj": {"kernel": arr(
            g("vision.linear_proj.linear_proj.weight").T)},
        "norm1": {"weight": arr(g("vision.linear_proj.norm1.weight")),
                  "bias": arr(g("vision.linear_proj.norm1.bias"))},
        "gate_proj": {"kernel": arr(g("vision.linear_proj.gate_proj.weight").T)},
        "dense_h_to_4h": {"kernel": arr(
            g("vision.linear_proj.dense_h_to_4h.weight").T)},
        "dense_4h_to_h": {"kernel": arr(
            g("vision.linear_proj.dense_4h_to_h.weight").T)},
        "boi": arr(g("vision.boi")),
        "eoi": arr(g("vision.eoi")),
    }
    lb = "layers.{i}."
    text = {
        "tok_embeddings": arr(g("embed_tokens.weight")),
        "layers": {
            "attention_norm": {
                "weight": stack(lb + "input_layernorm.weight", Lt)},
            "ffn_norm": {
                "weight": stack(lb + "post_attention_layernorm.weight", Lt)},
            "attention": {
                "vision_qkv": {
                    "kernel": stack(
                        lb + "self_attn.vision_expert_query_key_value.weight",
                        Lt, True),
                    "bias": stack(
                        lb + "self_attn.vision_expert_query_key_value.bias",
                        Lt)},
                "language_qkv": {
                    "kernel": stack(
                        lb + "self_attn.language_expert_query_key_value.weight",
                        Lt, True)},
                "vision_dense": {"kernel": stack(
                    lb + "self_attn.vision_expert_dense.weight", Lt, True)},
                "language_dense": {"kernel": stack(
                    lb + "self_attn.language_expert_dense.weight", Lt, True)},
            },
            "mlp": {
                "vision": {
                    "w1": {"kernel": stack(
                        lb + "mlp.vision_mlp.gate_proj.weight", Lt, True)},
                    "w3": {"kernel": stack(
                        lb + "mlp.vision_mlp.up_proj.weight", Lt, True)},
                    "w2": {"kernel": stack(
                        lb + "mlp.vision_mlp.down_proj.weight", Lt, True)},
                },
                "language": {
                    "w1": {"kernel": stack(
                        lb + "mlp.language_mlp.gate_proj.weight", Lt, True)},
                    "w3": {"kernel": stack(
                        lb + "mlp.language_mlp.up_proj.weight", Lt, True)},
                    "w2": {"kernel": stack(
                        lb + "mlp.language_mlp.down_proj.weight", Lt, True)},
                },
            },
        },
        "norm": {"weight": arr(g("norm.weight"))},
        "output": {"kernel": arr(g("lm_head.weight").T)},
    }
    return {"vision": vision, "adapter": adapter, "language_model": text}


# ------------------------------------------------------------ vision tower

def vision_forward(params, cfg: CogVLM2VisionConfig,
                   pixel_values: jnp.ndarray,  # (F, H, W, 3) NHWC
                   attn_impl: str = "xla",
                   remat: bool = False) -> jnp.ndarray:
    """EVA2-CLIP tower -> per-frame features (F, 1+grid^2, C).

    EVA block quirk (visual.py ``TransformerLayer.forward``): each
    sublayer's LayerNorm is applied to the sublayer OUTPUT, then added to
    the un-normalized residual.
    """
    x = patch_embed(params["patch_embedding"], pixel_values, cfg.patch_size)
    B = x.shape[0]
    cls = jnp.broadcast_to(
        params["cls_embedding"][None, None], (B, 1, cfg.hidden_size)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None].astype(x.dtype)

    H, D = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps

    def block(carry, lp):
        x = carry
        B, S, C = x.shape
        qkv = dot(x, lp["qkv"]["kernel"]) + lp["qkv"]["bias"]
        q, k, v = jnp.split(qkv.reshape(B, S, 3, H, D), 3, axis=2)
        attn = multi_head_attention(q[:, :, 0], k[:, :, 0], v[:, :, 0],
                                    causal=False, impl=attn_impl)
        attn = dot(attn.reshape(B, S, C), lp["dense"]["kernel"]) \
            + lp["dense"]["bias"]
        x = x + layer_norm(attn, lp["ln1"]["weight"], lp["ln1"]["bias"],
                           eps=eps)
        h = dot(x, lp["fc1"]["kernel"]) + lp["fc1"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = dot(h, lp["fc2"]["kernel"]) + lp["fc2"]["bias"]
        x = x + layer_norm(h, lp["ln2"]["weight"], lp["ln2"]["bias"], eps=eps)
        return x, None

    from ..ops.remat import remat_wrap

    blk = remat_wrap(block, remat)
    x, _ = jax.lax.scan(blk, x, params["layers"])
    return x


def adapter_forward(params, cfg: CogVLM2Config,
                    vision_out: jnp.ndarray) -> jnp.ndarray:
    """Drop cls, conv-2x2 downsample, GLU projection, boi/eoi framing,
    scaling — visual.py ``EVA2CLIPModel.forward`` after the transformer.

    Returns (F, tokens_per_frame, llm_hidden).
    """
    vc = cfg.vision
    x = vision_out[:, 1:]  # drop cls
    F = x.shape[0]
    g = vc.grid
    C = vc.hidden_size
    # conv k2 s2 == non-overlapping 2x2 patch matmul (channels-last)
    x = x.reshape(F, g // 2, 2, g // 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(F, (g // 2) ** 2,
                                                     4 * C)
    x = dot(x, params["conv"]["kernel"]) + params["conv"]["bias"]

    x = dot(x, params["linear_proj"]["kernel"])
    # published GLU uses nn.LayerNorm's default eps=1e-5 (visual.py GLU)
    x = layer_norm(x, params["norm1"]["weight"], params["norm1"]["bias"],
                   eps=1e-5)
    x = jax.nn.gelu(x, approximate=False)
    x = jax.nn.silu(dot(x, params["gate_proj"]["kernel"])) \
        * dot(x, params["dense_h_to_4h"]["kernel"])
    x = dot(x, params["dense_4h_to_h"]["kernel"])

    boi = jnp.broadcast_to(params["boi"], (F, 1, x.shape[-1])).astype(x.dtype)
    eoi = jnp.broadcast_to(params["eoi"], (F, 1, x.shape[-1])).astype(x.dtype)
    x = jnp.concatenate([boi, x, eoi], axis=1)
    return x / vc.scaling_factor


# ----------------------------------------------------------- position ids

def build_position_ids(token_type_ids: np.ndarray) -> np.ndarray:
    """CogVLM's shared-vision-position scheme, host-side numpy.

    Reimplements ``modeling_cogvlm.build_position_ids``: the first/last
    vision token of each run counts as language for increments; interior
    vision tokens share a single position.
    """
    x = np.asarray(token_type_ids)
    tmp = x.copy()
    is_boi_eoi = np.zeros_like(x, dtype=bool)
    is_boi_eoi[:, 1:] |= (tmp[:, 1:] == VISION_TOKEN_TYPE) & (
        tmp[:, :-1] == LANGUAGE_TOKEN_TYPE)
    is_boi_eoi[:, 0] |= tmp[:, 0] == VISION_TOKEN_TYPE
    is_boi_eoi[:, :-1] |= (tmp[:, :-1] == VISION_TOKEN_TYPE) & (
        tmp[:, 1:] == LANGUAGE_TOKEN_TYPE)
    is_boi_eoi[:, -1] |= tmp[:, -1] == VISION_TOKEN_TYPE
    tmp[is_boi_eoi] = LANGUAGE_TOKEN_TYPE
    y = np.zeros_like(x)
    y[:, 1:] = (tmp[:, 1:] == LANGUAGE_TOKEN_TYPE) | (
        (tmp[:, 1:] == VISION_TOKEN_TYPE)
        & (tmp[:, :-1] == LANGUAGE_TOKEN_TYPE))
    return np.cumsum(y, axis=-1)


# ------------------------------------------------------------ text decoder

def _expert_layer(cfg: LLMConfig, lp, x, vis_mask, attention_mask, cos, sin,
                  position_ids, attn_impl):
    """One dual-expert decoder layer (``VisionExpertAttention`` +
    ``VisionExpertMLP``); ``vis_mask``: (B, T, 1) float selector."""
    B, S, D = x.shape
    Hq, Hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)

    h = rms_norm(x, lp["attention_norm"]["weight"], eps=cfg.rms_norm_eps)
    a = lp["attention"]
    qkv_v = dot(h, a["vision_qkv"]["kernel"]) + a["vision_qkv"]["bias"]
    qkv_l = dot(h, a["language_qkv"]["kernel"])
    qkv = jnp.where(vis_mask.astype(bool), qkv_v, qkv_l)
    q = qkv[..., : Hq * hd].reshape(B, S, Hq, hd)
    k = qkv[..., Hq * hd: Hq * hd + Hkv * hd].reshape(B, S, Hkv, hd)
    v = qkv[..., Hq * hd + Hkv * hd:].reshape(B, S, Hkv, hd)
    q, k = apply_rope(q, k, cos, sin, position_ids)
    attn = multi_head_attention(q, k, v, attention_mask=attention_mask,
                                causal=True, impl=attn_impl)
    attn = attn.reshape(B, S, Hq * hd)
    out = jnp.where(vis_mask.astype(bool),
                    dot(attn, a["vision_dense"]["kernel"]),
                    dot(attn, a["language_dense"]["kernel"]))
    x = x + out

    h = rms_norm(x, lp["ffn_norm"]["weight"], eps=cfg.rms_norm_eps)

    def swiglu(mp):
        return dot(jax.nn.silu(dot(h, mp["w1"]["kernel"]))
                   * dot(h, mp["w3"]["kernel"]), mp["w2"]["kernel"])

    mlp_out = jnp.where(vis_mask.astype(bool), swiglu(lp["mlp"]["vision"]),
                        swiglu(lp["mlp"]["language"]))
    return x + mlp_out


def cogvlm2_forward(
    params, cfg: CogVLM2Config,
    input_ids: jnp.ndarray,  # (B, T) with pad_token_id vision placeholders
    token_type_ids: jnp.ndarray,  # (B, T) 0=language 1=vision
    attention_mask: Optional[jnp.ndarray],
    position_ids: jnp.ndarray,  # (B, T) from build_position_ids
    pixel_values: Optional[jnp.ndarray] = None,  # (F, H, W, 3) NHWC
    attn_impl: str = "auto",
    remat: bool = False,
    vision_embeds: Optional[jnp.ndarray] = None,  # (F, n_tok, C) precomputed
) -> jnp.ndarray:
    """Full multimodal forward -> final hidden states (B, T, C).

    ``vision_embeds`` short-circuits the EVA tower + adapter with
    precomputed per-frame tokens — the decode loop encodes frames ONCE.
    """
    lm = params["language_model"]
    tc = cfg.text
    embeds = dec.embed_tokens(lm, input_ids)
    if vision_embeds is None and pixel_values is not None:
        vis = vision_forward(params["vision"], cfg.vision, pixel_values,
                             attn_impl="xla" if attn_impl == "auto"
                             else attn_impl,
                             remat=remat)
        vision_embeds = adapter_forward(params["adapter"], cfg, vis)
    if vision_embeds is not None:
        # vision positions are exactly the token_type==VISION slots
        marker = (token_type_ids == VISION_TOKEN_TYPE).astype(jnp.int32)
        embeds = scatter_image_embeds(embeds, marker, vision_embeds, 1)

    S = input_ids.shape[1]
    max_pos = int(tc.max_position_embeddings)
    cos, sin = rope_tables(max(S, 1), tc.head_dim, base=tc.rope_theta,
                           max_position_embeddings=max_pos)
    vis_mask = (token_type_ids == VISION_TOKEN_TYPE).astype(
        embeds.dtype)[..., None]

    def block(carry, lp):
        return _expert_layer(tc, lp, carry, vis_mask, attention_mask, cos,
                             sin, position_ids, attn_impl), None

    from ..ops.remat import remat_wrap

    blk = remat_wrap(block, remat)
    x, _ = jax.lax.scan(blk, embeds, lm["layers"])
    return rms_norm(x, lm["norm"]["weight"], eps=tc.rms_norm_eps)


def lm_logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    return dot_f32(hidden, params["language_model"]["output"]["kernel"])


def _expert_layer_cached(cfg: LLMConfig, lp, x, k_cache, v_cache, k_scale,
                         v_scale, cos, sin, slots, rope_pos, cache_mask,
                         vis_mask, attn_impl: str = "xla", q_offset=None):
    """Cached dual-expert layer: like ``generate._layer_with_cache`` but
    with per-position expert selection, and the RoPE rotation position
    (``rope_pos``, CogVLM's shared-vision scheme) decoupled from the cache
    slot (``slots``) used for writes and causality.  ``k_scale``/
    ``v_scale`` are the int8-cache scales (None = dense bf16 cache).
    ``attn_impl != "xla"`` routes empty-cache prefill (S > 1) through
    the flash kernel over the fresh tokens (prefill slots are sequence
    order, so the flash causal test equals the slot test).  A suffix
    continuation over a NON-empty cache passes ``q_offset`` = per-row
    first-fresh-slot, running the flash kernel over the whole cache with
    slot causality — CogVLM's shared-vision ROTATION positions are
    decoupled from slots, but its CAUSALITY is plain token order = slot
    order, so the q_offset contract holds; see
    ``generate._layer_with_cache``."""
    from ..ops.attention import attention_xla, multi_head_attention
    from .generate import read_kv, scatter_kv

    B, S, D = x.shape
    Hq, Hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)

    h = rms_norm(x, lp["attention_norm"]["weight"], eps=cfg.rms_norm_eps)
    a = lp["attention"]
    qkv = jnp.where(vis_mask.astype(bool),
                    dot(h, a["vision_qkv"]["kernel"]) + a["vision_qkv"]["bias"],
                    dot(h, a["language_qkv"]["kernel"]))
    q = qkv[..., : Hq * hd].reshape(B, S, Hq, hd)
    k = qkv[..., Hq * hd: Hq * hd + Hkv * hd].reshape(B, S, Hkv, hd)
    v = qkv[..., Hq * hd + Hkv * hd:].reshape(B, S, Hkv, hd)
    q, k = apply_rope(q, k, cos, sin, rope_pos)

    k_cache, v_cache, k_scale, v_scale, write_ok = scatter_kv(
        k_cache, v_cache, k_scale, v_scale, k, v, slots, cache_mask)

    cont_flash = S > 1 and q_offset is not None and (
        attn_impl == "flash"
        or (attn_impl == "auto" and jax.default_backend() == "tpu"))
    if cont_flash:
        from ..ops.flash_attention import flash_attention

        k_op, v_op = read_kv(k_cache, v_cache, k_scale, v_scale, q.dtype)
        attn = flash_attention(
            q, k_op, v_op, attention_mask=cache_mask, causal=True,
            q_offset=q_offset).reshape(B, S, Hq * hd)
    elif S > 1 and attn_impl != "xla" and q_offset is None:
        attn = multi_head_attention(
            q, k, v, attention_mask=write_ok, causal=True,
            impl=attn_impl).reshape(B, S, Hq * hd)
    else:
        k_pos = jnp.arange(k_cache.shape[1])[None, :]
        valid = (slots[:, :, None] >= k_pos[:, None, :]) \
            & (cache_mask[:, None, :] != 0)
        bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None]
        k_op, v_op = read_kv(k_cache, v_cache, k_scale, v_scale, q.dtype)
        attn = attention_xla(q, k_op, v_op, bias=bias).reshape(B, S, Hq * hd)
    out = jnp.where(vis_mask.astype(bool),
                    dot(attn, a["vision_dense"]["kernel"]),
                    dot(attn, a["language_dense"]["kernel"]))
    x = x + out

    h = rms_norm(x, lp["ffn_norm"]["weight"], eps=cfg.rms_norm_eps)

    def swiglu(mp):
        return dot(jax.nn.silu(dot(h, mp["w1"]["kernel"]))
                   * dot(h, mp["w3"]["kernel"]), mp["w2"]["kernel"])

    mlp_out = jnp.where(vis_mask.astype(bool), swiglu(lp["mlp"]["vision"]),
                        swiglu(lp["mlp"]["language"]))
    return x + mlp_out, k_cache, v_cache, k_scale, v_scale


def _cogvlm2_forward_cached(params, cfg: CogVLM2Config, embeds, cache,
                            slots, rope_pos, cache_mask, vis_mask,
                            attn_impl: str = "xla", q_offset=None):
    """``cache`` is a (k, v, k_scale, v_scale) tuple; scales are None for
    the dense bf16 cache (see ``generate.KVCache``)."""
    lm = params["language_model"]
    tc = cfg.text
    max_len = cache[0].shape[2]
    cos, sin = rope_tables(max_len, tc.head_dim, base=tc.rope_theta,
                           max_position_embeddings=tc.max_position_embeddings)

    def block(x, scanned):
        lp, kc, vc, ks, vs = scanned
        x, kc, vc, ks, vs = _expert_layer_cached(
            tc, lp, x, kc, vc, ks, vs, cos, sin, slots, rope_pos,
            cache_mask, vis_mask, attn_impl=attn_impl, q_offset=q_offset)
        return x, (kc, vc, ks, vs)

    x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
        block, embeds, (lm["layers"],) + tuple(cache))
    x = rms_norm(x, lm["norm"]["weight"], eps=tc.rms_norm_eps)
    return x, (k_new, v_new, ks_new, vs_new)


@functools.lru_cache(maxsize=8)
def _generate_fn(cfg: CogVLM2Config, Tb: int, max_new: int,
                 has_vision: bool, eos: int, kv_quant: bool = False,
                 attn_impl: str = "auto"):
    """ONE compiled (prefill + while-loop decode) program per
    (config, prompt bucket, max_new); params and the per-call position
    ids go through jit ARGUMENTS (a closure would inline the weight tree
    as HLO constants — fatal at 19B dims)."""
    from .generate import (
        greedy_decode_batch,
        init_kv_cache,
        last_real_token,
        prefill_slot_mask,
        step_slot_mask,
    )

    max_len = Tb + max_new

    @jax.jit
    def gen(params, ids, tt, n_real, pos_all, vis):
        # Batch-generic: ids/tt (B, Tb), n_real (B,), pos_all (B, max_len),
        # vis (N_total, C) concatenated in row order.
        lm = params["language_model"]
        B = ids.shape[0]
        embeds = dec.embed_tokens(lm, ids)
        if has_vision:
            marker = (tt == VISION_TOKEN_TYPE).astype(jnp.int32)
            embeds = scatter_image_embeds(embeds, marker, vis, 1)
        cache_t = init_kv_cache(cfg.text, B, max_len,
                                dtype=lm["tok_embeddings"].dtype,
                                quant=kv_quant)
        cache = tuple(cache_t)
        slots, mask = prefill_slot_mask(Tb, max_len, n_real)
        vm = (tt == VISION_TOKEN_TYPE).astype(embeds.dtype)[..., None]
        hidden, cache = _cogvlm2_forward_cached(
            params, cfg, embeds, cache, slots, pos_all[:, :Tb], mask, vm,
            attn_impl=attn_impl)
        logits0 = lm_logits(params, last_real_token(hidden, n_real))[:, 0]

        def step(params, tok, i, cache):
            e = dec.embed_tokens(params["language_model"], tok[:, None])
            s, m = step_slot_mask(max_len, n_real, i)
            idx = (jnp.atleast_1d(n_real) + i)[:, None]
            rope_pos = jnp.take_along_axis(pos_all, idx, axis=1)
            vm = jnp.zeros((B, 1, 1), e.dtype)  # generated = language
            h, cache = _cogvlm2_forward_cached(
                params, cfg, e, cache, s, rope_pos, m, vm)
            return lm_logits(params, h)[:, 0], cache

        return greedy_decode_batch(step, params, logits0, cache, max_new,
                                   eos)

    return gen


@functools.lru_cache(maxsize=8)
def _prefix_fn(cfg: CogVLM2Config, Pb: int, max_len: int,
               kv_quant: bool, attn_impl: str):
    """Compiled prefix prefill: [bos] + the vision block enter an empty
    cache once per video.  ``pos_p`` carries the shared-vision RoPE
    positions of the prefix slots (``build_position_ids``)."""
    from .generate import init_kv_cache, prefill_slot_mask

    @jax.jit
    def fn(params, ids, tt, n_real, vis, pos_p):
        lm = params["language_model"]
        B = ids.shape[0]
        embeds = dec.embed_tokens(lm, ids)
        marker = (tt == VISION_TOKEN_TYPE).astype(jnp.int32)
        embeds = scatter_image_embeds(embeds, marker, vis, 1)
        cache_t = init_kv_cache(cfg.text, B, max_len,
                                dtype=lm["tok_embeddings"].dtype,
                                quant=kv_quant)
        slots, mask = prefill_slot_mask(Pb, max_len, n_real)
        vm = (tt == VISION_TOKEN_TYPE).astype(embeds.dtype)[..., None]
        _, cache = _cogvlm2_forward_cached(
            params, cfg, embeds, tuple(cache_t), slots, pos_p, mask, vm,
            attn_impl=attn_impl)
        return cache, mask

    return fn


@functools.lru_cache(maxsize=8)
def _suffix_fn(cfg: CogVLM2Config, Sb: int, max_new: int, max_len: int,
               eos: int, attn_impl: str = "xla"):
    """Compiled suffix continuation + decode against a cached prefix.

    Suffix tokens are all language-type; their RoPE positions continue
    the prefix's shared-vision scheme sequentially (gathered from the
    cached per-video ``pos_all``).  With ``attn_impl`` "flash"/"auto"-on-
    TPU the suffix runs the same flash kernel as a full-prompt prefill
    via per-row ``q_offset = n_prefix``; "xla" keeps the windowed bias
    path."""
    from .generate import (
        greedy_decode_batch,
        last_real_token,
        step_slot_mask,
    )

    @jax.jit
    def fn(params, cache, pmask, n_prefix, sids, s_real, pos_all):
        lm = params["language_model"]
        B = sids.shape[0]
        emb = dec.embed_tokens(lm, sids)
        slots = n_prefix[:, None] + jnp.arange(Sb)[None]
        span = jnp.arange(max_len)[None]
        valid = (span >= n_prefix[:, None]) \
            & (span < (n_prefix + s_real)[:, None])
        mask = jnp.maximum(pmask, valid.astype(pmask.dtype))
        rope_pos = jnp.take_along_axis(pos_all, slots, axis=1)
        vm = jnp.zeros((B, Sb, 1), emb.dtype)  # suffix = language
        hidden, cache = _cogvlm2_forward_cached(
            params, cfg, emb, cache, slots, rope_pos, mask, vm,
            attn_impl=attn_impl, q_offset=n_prefix)
        logits0 = lm_logits(params, last_real_token(hidden, s_real))[:, 0]
        n_total = n_prefix + s_real

        def step(params, tok, i, cache):
            e = dec.embed_tokens(params["language_model"], tok[:, None])
            s, m = step_slot_mask(max_len, n_total, i)
            idx = (jnp.atleast_1d(n_total) + i)[:, None]
            rp = jnp.take_along_axis(pos_all, idx, axis=1)
            vmd = jnp.zeros((B, 1, 1), e.dtype)
            h, cache = _cogvlm2_forward_cached(
                params, cfg, e, cache, s, rp, m, vmd)
            return lm_logits(params, h)[:, 0], cache

        return greedy_decode_batch(step, params, logits0, cache, max_new,
                                   eos)

    return fn


def greedy_generate_batch(
    params, cfg: CogVLM2Config,
    items,  # sequence of (input_ids (1,T), token_type_ids (1,T),
            #              pixel_values) per row
    max_new_tokens: int = 16,
    eos_token_id: Optional[int] = None,
    attn_impl: str = "auto",  # vision tower AND cached prefill backend
    vision_embeds=None,  # optional per-row precomputed vision embeds
    kv_quant: bool = False,  # int8 KV cache (ops/quant.py:quantize_kv)
) -> List[List[int]]:
    """Batched greedy decode with a static KV cache: each row's frames
    encode once (the square model resolution makes every video the same
    shape, so ANY two videos batch), the padded prompt batch prefills
    once, and the whole token loop runs as ONE jitted ``lax.while_loop``;
    prompts bucket to multiples of 64 so every judge call shares one
    compiled executable.  Generated tokens go through the language expert
    (new tokens are always language type) while RoPE keeps the
    shared-vision-position scheme.  ``vision_embeds`` (one array per row)
    skips the vision tower — callers asking many questions about the same
    videos encode once."""
    from .generate import pad_prompt_batch

    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    B = len(items)
    has_vision = items[0][2] is not None or vision_embeds is not None
    ids, n_real, Tb = pad_prompt_batch([it[0] for it in items],
                                       cfg.pad_token_id)
    max_len = Tb + max_new_tokens
    tt = np.zeros((B, Tb), np.int32)  # pads = language type
    pos_all = np.zeros((B, max_len), np.int64)
    for b, (_, token_type_ids, _) in enumerate(items):
        nr = int(n_real[b])
        tt[b, :nr] = token_type_ids[0]
        pos_prompt = build_position_ids(np.asarray(token_type_ids))
        pos_all[b, :nr] = pos_prompt
        pos_all[b, nr:] = pos_prompt.max() + 1 + np.arange(max_len - nr)

    vis = None
    if has_vision:
        vis = jnp.concatenate([
            _jit_vision(params, cfg, jnp.asarray(pv), attn_impl=attn_impl)
            for _, _, pv in items
        ]) if vision_embeds is None else jnp.concatenate(
            [jnp.reshape(v, (-1, v.shape[-1])) for v in vision_embeds])

    gen = _generate_fn(cfg, Tb, max_new_tokens, has_vision, int(eos),
                       kv_quant=kv_quant, attn_impl=attn_impl)
    toks, n = gen(params, jnp.asarray(ids), jnp.asarray(tt),
                  jnp.asarray(n_real), jnp.asarray(pos_all, jnp.int32), vis)
    toks, n = np.asarray(toks), np.asarray(n)
    return [[int(t) for t in toks[b, : n[b]]] for b in range(B)]


def greedy_generate(
    params, cfg: CogVLM2Config,
    input_ids: np.ndarray,  # (1, T) unpadded prompt
    token_type_ids: np.ndarray,  # (1, T)
    pixel_values=None,
    max_new_tokens: int = 16,
    eos_token_id: Optional[int] = None,
    attn_impl: str = "auto",  # vision tower AND cached prefill backend
    kv_quant: bool = False,  # int8 KV cache (ops/quant.py:quantize_kv)
) -> List[int]:
    """Single-prompt greedy decode (see ``greedy_generate_batch``)."""
    return greedy_generate_batch(
        params, cfg, [(input_ids, token_type_ids, pixel_values)],
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        attn_impl=attn_impl, kv_quant=kv_quant)[0]


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("attn_impl",))
def _jit_vision(params, cfg: CogVLM2Config, pixel_values,
                attn_impl: str = "auto"):
    return adapter_forward(
        params["adapter"], cfg,
        vision_forward(params["vision"], cfg.vision, pixel_values,
                       attn_impl="xla" if attn_impl == "auto"
                       else attn_impl))


# ------------------------------------------------------------- preprocessing

from ..data.video import CLIP_MEAN, CLIP_STD  # noqa: E402  (shared)


def preprocess_video_frames(
    frames: Sequence[np.ndarray],  # uint8 RGB (H, W, 3)
    cfg: CogVLM2VisionConfig,
) -> np.ndarray:
    """Frames -> (F, image_size, image_size, 3) fp32, CLIP-normalized
    (the cogvlm2-video processor resizes each frame to the square model
    resolution)."""
    from ..data.video import _pil_resize

    size = cfg.image_size
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    out = [(_pil_resize(f, (size, size)).astype(np.float32) / 255.0 - mean)
           / std for f in frames]
    return np.stack(out)


def build_video_prompt_ids(
    tokenizer, cfg: CogVLM2Config, n_frames: int, prompt: str,
    history=None, template_version: str = "chat",
) -> Tuple[np.ndarray, np.ndarray]:
    """(input_ids, token_type_ids) for an n-frame video + question.

    Layout follows the published ``build_conversation_input_ids``: [bos],
    then one vision block (boi + per-frame features + eoi slots, all
    VISION type), then the templated question.  The vision slots hold
    ``pad_token_id`` placeholders; the scatter fills them in-graph.
    The text template is the exact ``_history_to_prompt`` port pinned in
    ``data/judge_templates.py`` ('chat' — swift's ``cogvlm2_video_13b_chat``
    default — plus the published 'vqa'/'base' variants and history turns).
    """
    from ..data.judge_templates import cogvlm2_history_to_prompt
    from ..data.prompts import encode_text

    def enc(s):
        return encode_text(tokenizer, s)

    n_vis = n_frames * cfg.vision.tokens_per_frame
    text_ids = enc(cogvlm2_history_to_prompt(prompt, history,
                                             template_version))
    ids = [cfg.bos_token_id] + [cfg.pad_token_id] * n_vis + text_ids
    tt = [LANGUAGE_TOKEN_TYPE] + [VISION_TOKEN_TYPE] * n_vis \
        + [LANGUAGE_TOKEN_TYPE] * len(text_ids)
    return (np.asarray([ids], np.int32), np.asarray([tt], np.int32))


def build_video_prompt_prefix_suffix(
    tokenizer, cfg: CogVLM2Config, n_frames: int, prompt: str,
    template_version: str = "chat",
):
    """The prompt split at the vision/text boundary, exactly: the prefix
    is [bos] + the vision placeholder block (question-independent and
    the bulk of the prompt — 198 slots/frame), the suffix is the whole
    templated question text, BPE-encoded on its own exactly as
    ``build_video_prompt_ids`` does (the text run starts fresh after the
    vision block, so no merge can cross the boundary).  Returns
    (prefix_ids, suffix_ids) as plain lists; token types are implied
    (prefix = [LANG] + VISION x n_vis, suffix = all LANG)."""
    from ..data.judge_templates import cogvlm2_history_to_prompt
    from ..data.prompts import encode_text

    n_vis = n_frames * cfg.vision.tokens_per_frame
    prefix = [cfg.bos_token_id] + [cfg.pad_token_id] * n_vis
    suffix = encode_text(tokenizer, cogvlm2_history_to_prompt(
        prompt, None, template_version))
    return prefix, suffix

"""Qwen2-VL backbone, TPU-native — the second local baseline-judge family.

The reference benchmarks MJ-Video against Qwen2-VL 2B/7B through ms-swift
(``eval_overall_qwen2_2b.py:119-129`` and siblings).  This is a from-scratch
JAX port of the Qwen2-VL architecture: a windowless ViT with 2D rotary
position embeddings and a 2x2 PatchMerger, and a Qwen2 text model (our
llama-family decoder) with multimodal 3-channel RoPE (M-RoPE).  Validated
numerically against the transformers implementation in
``tests/test_qwen2vl.py``.

TPU-first notes:

* The vision tower's cu_seqlens block-diagonal attention (per temporal
  slab) becomes a *batched* non-causal attention of shape
  (grid_t, h*w, heads, dim) — static shapes, no varlen unpadding, and it
  rides the specialized maskless Pallas kernel.
* M-RoPE position ids are data-dependent host work; like the gating-token
  position, they are computed at tokenization time (``get_rope_index``)
  and enter the graph as plain integer arrays.
* Greedy generation = vision once + KV-cached prefill + ONE jitted
  ``lax.while_loop`` over single-token cached steps, with prompts
  bucketed to 64 tokens so every judge call shares one compiled
  executable (4.1x vs per-token re-forward on chip, docs/PERF.md).
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
from ..ops.norms import layer_norm
from ..ops.rope import rotate_half
from . import decoder as dec
from .internvl import scatter_image_embeds


@dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    mlp_ratio: int = 4
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    hidden_size: int = 1536  # LLM hidden the merger projects into
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def merge_dim(self) -> int:
        return self.embed_dim * self.spatial_merge_size**2


@dataclass(frozen=True)
class Qwen2VLConfig:
    vision: Qwen2VLVisionConfig = field(default_factory=Qwen2VLVisionConfig)
    # Qwen2-VL-2B text model (Qwen/Qwen2-VL-2B-Instruct config.json).
    text: LLMConfig = field(default_factory=lambda: LLMConfig(
        architecture="llama", vocab_size=151936, hidden_size=1536,
        intermediate_size=8960, num_hidden_layers=28,
        num_attention_heads=12, num_key_value_heads=2,
        rope_theta=1e6, rms_norm_eps=1e-6, pad_token_id=151643,
        max_position_embeddings=32768, bias=True,
    ))
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    tie_word_embeddings: bool = True  # 2B ties; 7B does not
    # Special token ids (Qwen2-VL tokenizer).
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    im_start_token_id: int = 151644
    im_end_token_id: int = 151645


def qwen2vl_config_from_hf(d: Dict[str, Any]) -> Qwen2VLConfig:
    """Build a Qwen2VLConfig from an HF Qwen2-VL config.json dict."""
    v = d.get("vision_config", {})
    rope_scaling = d.get("rope_scaling") or {}
    return Qwen2VLConfig(
        vision=Qwen2VLVisionConfig(
            depth=v.get("depth", 32),
            embed_dim=v.get("embed_dim", 1280),
            num_heads=v.get("num_heads", 16),
            mlp_ratio=v.get("mlp_ratio", 4),
            patch_size=v.get("patch_size", 14),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            in_channels=v.get("in_channels", 3),
            hidden_size=v.get("hidden_size", d.get("hidden_size", 1536)),
        ),
        text=LLMConfig(
            architecture="llama",
            vocab_size=d.get("vocab_size", 151936),
            hidden_size=d.get("hidden_size", 1536),
            intermediate_size=d.get("intermediate_size", 8960),
            num_hidden_layers=d.get("num_hidden_layers", 28),
            num_attention_heads=d.get("num_attention_heads", 12),
            num_key_value_heads=d.get("num_key_value_heads", 2),
            rope_theta=d.get("rope_theta", 1e6),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            pad_token_id=d.get("pad_token_id", 151643) or 151643,
            max_position_embeddings=d.get("max_position_embeddings", 32768),
            bias=True,
        ),
        mrope_section=tuple(rope_scaling.get("mrope_section", (16, 24, 24))),
        tie_word_embeddings=d.get("tie_word_embeddings", True),
        image_token_id=d.get("image_token_id", 151655),
        video_token_id=d.get("video_token_id", 151656),
        vision_start_token_id=d.get("vision_start_token_id", 151652),
        vision_end_token_id=d.get("vision_end_token_id", 151653),
    )


def qwen2vl_7b_config() -> Qwen2VLConfig:
    """Qwen2-VL-7B-Instruct dims (Qwen/Qwen2-VL-7B-Instruct config.json) —
    the second Qwen2-VL judge size the reference benchmarks
    (``eval_overall_qwen2_7b.py``).  Same ViT as the 2B; the text model
    widens to 3584/28 heads and stops tying the LM head."""
    return Qwen2VLConfig(
        vision=Qwen2VLVisionConfig(hidden_size=3584),
        text=LLMConfig(
            architecture="llama",
            vocab_size=152064,
            hidden_size=3584,
            intermediate_size=18944,
            num_hidden_layers=28,
            num_attention_heads=28,
            num_key_value_heads=4,
            rope_theta=1e6,
            rms_norm_eps=1e-6,
            pad_token_id=151643,
            max_position_embeddings=32768,
            bias=True,
        ),
        tie_word_embeddings=False,
    )


# ------------------------------------------------------------------ params

def init_qwen2vl_params(key, cfg: Qwen2VLConfig, dtype=jnp.float32):
    vc = cfg.vision
    E, I, L = vc.embed_dim, vc.embed_dim * vc.mlp_ratio, vc.depth
    M = vc.merge_dim
    k = jax.random.split(key, 8)

    def dense(key, shape):
        return (jax.random.normal(key, shape) * 0.02).astype(dtype)

    vision = {
        "patch_embed": {"kernel": dense(k[0], (vc.patch_dim, E))},
        "blocks": {
            "norm1": {"weight": jnp.ones((L, E), dtype),
                      "bias": jnp.zeros((L, E), dtype)},
            "norm2": {"weight": jnp.ones((L, E), dtype),
                      "bias": jnp.zeros((L, E), dtype)},
            "attn": {
                "qkv": {"kernel": dense(k[1], (L, E, 3 * E)),
                        "bias": jnp.zeros((L, 3 * E), dtype)},
                "proj": {"kernel": dense(k[2], (L, E, E)),
                         "bias": jnp.zeros((L, E), dtype)},
            },
            "mlp": {
                "fc1": {"kernel": dense(k[3], (L, E, I)),
                        "bias": jnp.zeros((L, I), dtype)},
                "fc2": {"kernel": dense(k[4], (L, I, E)),
                        "bias": jnp.zeros((L, E), dtype)},
            },
        },
        "merger": {
            "ln_q": {"weight": jnp.ones((E,), dtype),
                     "bias": jnp.zeros((E,), dtype)},
            "mlp0": {"kernel": dense(k[5], (M, M)),
                     "bias": jnp.zeros((M,), dtype)},
            "mlp2": {"kernel": dense(k[6], (M, vc.hidden_size)),
                     "bias": jnp.zeros((vc.hidden_size,), dtype)},
        },
    }
    text = dec.init_decoder_params(
        k[7], cfg.text, dtype=dtype,
        with_lm_head=not cfg.tie_word_embeddings,
    )
    return {"visual": vision, "language_model": text}


def import_qwen2vl_params(state: Dict[str, np.ndarray], cfg: Qwen2VLConfig,
                          dtype=jnp.float32):
    """Map an HF Qwen2VLForConditionalGeneration state_dict to our pytree."""
    vc, tc = cfg.vision, cfg.text
    L, Lt = vc.depth, tc.num_hidden_layers

    def g(name):
        for prefix in ("", "model.", "model.model."):
            if prefix + name in state:
                return np.asarray(state[prefix + name])
        raise KeyError(name)

    def arr(x):
        return jnp.asarray(x, dtype)

    def stack(fmt, transpose=False):
        ws = [g(fmt.format(i=i)) for i in range(L)]
        out = np.stack([w.T if transpose else w for w in ws])
        return arr(out)

    vis = "visual."
    vision = {
        "patch_embed": {"kernel": arr(
            g(vis + "patch_embed.proj.weight").reshape(vc.embed_dim, -1).T)},
        "blocks": {
            "norm1": {"weight": stack(vis + "blocks.{i}.norm1.weight"),
                      "bias": stack(vis + "blocks.{i}.norm1.bias")},
            "norm2": {"weight": stack(vis + "blocks.{i}.norm2.weight"),
                      "bias": stack(vis + "blocks.{i}.norm2.bias")},
            "attn": {
                "qkv": {
                    "kernel": stack(vis + "blocks.{i}.attn.qkv.weight",
                                    transpose=True),
                    "bias": stack(vis + "blocks.{i}.attn.qkv.bias"),
                },
                "proj": {
                    "kernel": stack(vis + "blocks.{i}.attn.proj.weight",
                                    transpose=True),
                    "bias": stack(vis + "blocks.{i}.attn.proj.bias"),
                },
            },
            "mlp": {
                "fc1": {"kernel": stack(vis + "blocks.{i}.mlp.fc1.weight",
                                        transpose=True),
                        "bias": stack(vis + "blocks.{i}.mlp.fc1.bias")},
                "fc2": {"kernel": stack(vis + "blocks.{i}.mlp.fc2.weight",
                                        transpose=True),
                        "bias": stack(vis + "blocks.{i}.mlp.fc2.bias")},
            },
        },
        "merger": {
            "ln_q": {"weight": arr(g(vis + "merger.ln_q.weight")),
                     "bias": arr(g(vis + "merger.ln_q.bias"))},
            "mlp0": {"kernel": arr(g(vis + "merger.mlp.0.weight").T),
                     "bias": arr(g(vis + "merger.mlp.0.bias"))},
            "mlp2": {"kernel": arr(g(vis + "merger.mlp.2.weight").T),
                     "bias": arr(g(vis + "merger.mlp.2.bias"))},
        },
    }

    def tstack(fmt, transpose=False, zeros_like=None):
        ws = []
        for i in range(Lt):
            try:
                w = g(fmt.format(i=i))
            except KeyError:
                if zeros_like is None:
                    raise
                w = np.zeros(zeros_like, np.float32)
            ws.append(w.T if transpose else w)
        return arr(np.stack(ws))

    lm = "language_model."
    try:
        g(lm + "embed_tokens.weight")
    except KeyError:
        lm = "model."  # older HF layouts keep the text model under 'model.'
    text = {
        "tok_embeddings": arr(g(lm + "embed_tokens.weight")),
        "layers": {
            "attention_norm": {
                "weight": tstack(lm + "layers.{i}.input_layernorm.weight")},
            "ffn_norm": {
                "weight": tstack(
                    lm + "layers.{i}.post_attention_layernorm.weight")},
            "attention": {
                "wq": {"kernel": tstack(lm + "layers.{i}.self_attn.q_proj.weight", True),
                       "bias": tstack(lm + "layers.{i}.self_attn.q_proj.bias")},
                "wk": {"kernel": tstack(lm + "layers.{i}.self_attn.k_proj.weight", True),
                       "bias": tstack(lm + "layers.{i}.self_attn.k_proj.bias")},
                "wv": {"kernel": tstack(lm + "layers.{i}.self_attn.v_proj.weight", True),
                       "bias": tstack(lm + "layers.{i}.self_attn.v_proj.bias")},
                # Qwen2's o_proj carries no bias; zero is exact.
                "wo": {"kernel": tstack(lm + "layers.{i}.self_attn.o_proj.weight", True),
                       "bias": tstack(lm + "layers.{i}.self_attn.o_proj.bias",
                                      zeros_like=(tc.hidden_size,))},
            },
            "feed_forward": {
                "w1": {"kernel": tstack(lm + "layers.{i}.mlp.gate_proj.weight", True)},
                "w3": {"kernel": tstack(lm + "layers.{i}.mlp.up_proj.weight", True)},
                "w2": {"kernel": tstack(lm + "layers.{i}.mlp.down_proj.weight", True)},
            },
        },
        "norm": {"weight": arr(g(lm + "norm.weight"))},
    }
    if not cfg.tie_word_embeddings:
        text["output"] = {"kernel": arr(g("lm_head.weight").T)}
    return {"visual": vision, "language_model": text}


# ------------------------------------------------------------ vision tower

def vision_rot_pos_emb(grid: Tuple[int, int, int],
                       cfg: Qwen2VLVisionConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of shape (t*h*w, head_dim) for the 2D vision RoPE.

    Positions follow the processor's merged patch order: (t, h//m, w//m,
    m, m).  Matches ``Qwen2VisionTransformerPretrainedModel.rot_pos_emb``.
    """
    t, h, w = grid
    m = cfg.spatial_merge_size
    hpos = np.arange(h)[:, None].repeat(w, 1)
    wpos = np.arange(w)[None, :].repeat(h, 0)

    def merged(x):
        return (x.reshape(h // m, m, w // m, m)
                .transpose(0, 2, 1, 3).reshape(-1))

    hpos, wpos = merged(hpos), merged(wpos)  # (h*w,)
    dim = cfg.head_dim // 2  # rope acts on half the head dim
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64)
                                  / dim))
    freqs = np.concatenate(
        [hpos[:, None] * inv_freq[None], wpos[:, None] * inv_freq[None]],
        axis=-1,
    )  # (h*w, dim)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (h*w, head_dim)
    emb = np.tile(emb, (t, 1))
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _vision_block(cfg: Qwen2VLVisionConfig, p, x, cos, sin, attn_impl):
    """One ViT block; x: (grid_t, S, E) — attention batched per temporal
    slab replaces the reference's cu_seqlens varlen path."""
    T, S, E = x.shape
    H, D = cfg.num_heads, cfg.head_dim

    h = layer_norm(x, p["norm1"]["weight"], p["norm1"]["bias"],
                   eps=cfg.layer_norm_eps).astype(x.dtype)
    qkv = dot(h, p["attn"]["qkv"]["kernel"]) + p["attn"]["qkv"]["bias"]
    q, k, v = jnp.split(qkv.reshape(T, S, 3, H, D), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    # rope in fp32, as the reference (apply_rotary_pos_emb_vision upcasts)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    q = (qf * c + rotate_half(qf) * s).astype(x.dtype)
    k = (kf * c + rotate_half(kf) * s).astype(x.dtype)
    # Pre-LN block + norm-preserving rotary -> bounded q/k: safe for the
    # nc kernel's Cauchy-Schwarz softmax bound (see models/vit.py).
    attn = multi_head_attention(q, k, v, causal=False, impl=attn_impl,
                                norm_bound=True)
    attn = dot(attn.reshape(T, S, E), p["attn"]["proj"]["kernel"]) \
        + p["attn"]["proj"]["bias"]
    x = x + attn

    h = layer_norm(x, p["norm2"]["weight"], p["norm2"]["bias"],
                   eps=cfg.layer_norm_eps).astype(x.dtype)
    h = _quick_gelu(dot(h, p["mlp"]["fc1"]["kernel"]) + p["mlp"]["fc1"]["bias"])
    h = dot(h, p["mlp"]["fc2"]["kernel"]) + p["mlp"]["fc2"]["bias"]
    return x + h


def vision_forward(
    params, cfg: Qwen2VLVisionConfig,
    patches: jnp.ndarray,  # (t*h*w, patch_dim) in the processor layout
    grid: Tuple[int, int, int],
    attn_impl: str = "auto",
    remat: bool = True,
) -> jnp.ndarray:
    """Patches -> merged visual embeddings (t*h*w / m^2, llm_hidden)."""
    t, h, w = grid
    m = cfg.spatial_merge_size
    x = dot(patches, params["patch_embed"]["kernel"])  # (N, E)
    x = x.reshape(t, h * w, cfg.embed_dim)

    cos_np, sin_np = vision_rot_pos_emb((1, h, w), cfg)  # same per t slab
    cos = jnp.asarray(cos_np)
    sin = jnp.asarray(sin_np)

    def block(carry, lp):
        return _vision_block(cfg, lp, carry, cos, sin, attn_impl), None

    from ..ops.remat import remat_wrap

    blk = remat_wrap(block, remat)
    x, _ = jax.lax.scan(blk, x, params["blocks"])

    x = x.reshape(t * h * w, cfg.embed_dim)
    mg = params["merger"]
    x = layer_norm(x, mg["ln_q"]["weight"], mg["ln_q"]["bias"],
                   eps=1e-6).astype(x.dtype)
    x = x.reshape(-1, cfg.merge_dim)  # merged order: 4 consecutive patches
    x = dot(x, mg["mlp0"]["kernel"]) + mg["mlp0"]["bias"]
    x = jax.nn.gelu(x, approximate=False)
    return dot(x, mg["mlp2"]["kernel"]) + mg["mlp2"]["bias"]


# ----------------------------------------------------------------- M-RoPE

def get_rope_index(
    input_ids: np.ndarray,  # (B, T)
    video_grid_thw: Optional[Sequence[Tuple[int, int, int]]],
    cfg: Qwen2VLConfig,
    attention_mask: Optional[np.ndarray] = None,
    image_grid_thw: Optional[Sequence[Tuple[int, int, int]]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """3-channel (t, h, w) M-RoPE position ids, host-side numpy.

    Reimplements ``Qwen2VLModel.get_rope_index`` (modeling_qwen2_vl.py):
    text tokens advance all three channels together; each vision span gets
    (t, h, w) grid coordinates offset by the running position.  Returns
    (position_ids (3, B, T), deltas (B, 1)).
    """
    input_ids = np.asarray(input_ids)
    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    m = cfg.vision.spatial_merge_size
    pos = np.ones((3, B, T), np.int64)
    deltas = np.zeros((B, 1), np.int64)
    img_i = vid_i = 0
    images = list(image_grid_thw or [])
    videos = list(video_grid_thw or [])
    for b in range(B):
        ids = input_ids[b][attention_mask[b] == 1]
        toks = ids.tolist()
        starts = np.nonzero(ids == cfg.vision_start_token_id)[0]
        vis_kinds = ids[starts + 1] if len(starts) else np.asarray([])
        n_img = int((vis_kinds == cfg.image_token_id).sum())
        n_vid = int((vis_kinds == cfg.video_token_id).sum())
        chunks: List[np.ndarray] = []
        st = 0
        rem_i, rem_v = n_img, n_vid
        for _ in range(n_img + n_vid):
            ed_i = toks.index(cfg.image_token_id, st) \
                if (rem_i and cfg.image_token_id in toks[st:]) else len(toks) + 1
            ed_v = toks.index(cfg.video_token_id, st) \
                if (rem_v and cfg.video_token_id in toks[st:]) else len(toks) + 1
            if ed_i < ed_v:
                t, h, w = images[img_i]
                img_i += 1
                rem_i -= 1
                ed = ed_i
            else:
                t, h, w = videos[vid_i]
                vid_i += 1
                rem_v -= 1
                ed = ed_v
            gt, gh, gw = int(t), int(h) // m, int(w) // m
            text_len = ed - st
            st_idx = chunks[-1].max() + 1 if chunks else 0
            chunks.append(np.broadcast_to(
                np.arange(text_len), (3, text_len)) + st_idx)
            ti = np.repeat(np.arange(gt), gh * gw)
            hi = np.tile(np.repeat(np.arange(gh), gw), gt)
            wi = np.tile(np.arange(gw), gt * gh)
            chunks.append(np.stack([ti, hi, wi]) + text_len + st_idx)
            st = ed + gt * gh * gw
        if st < len(toks):
            st_idx = chunks[-1].max() + 1 if chunks else 0
            n = len(toks) - st
            chunks.append(np.broadcast_to(np.arange(n), (3, n)) + st_idx)
        row = np.concatenate(chunks, axis=1) if chunks else np.zeros((3, 0),
                                                                     np.int64)
        pos[:, b, attention_mask[b] == 1] = row
        deltas[b, 0] = (row.max() + 1 - T) if row.size else -T
    return pos, deltas


def mrope_cos_sin(
    position_ids: jnp.ndarray,  # (3, B, T)
    cfg: Qwen2VLConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token (cos, sin) of shape (B, T, head_dim) from 3-channel ids,
    sectioned per ``mrope_section`` (``apply_multimodal_rotary_pos_emb``)."""
    D = cfg.text.head_dim
    inv_freq = 1.0 / (cfg.text.rope_theta ** (
        jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq  # (3,B,T,D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (3, B, T, D)
    cos3, sin3 = jnp.cos(emb), jnp.sin(emb)

    sections = list(cfg.mrope_section) * 2
    out_c, out_s = [], []
    off = 0
    for i, size in enumerate(sections):
        out_c.append(cos3[i % 3, :, :, off:off + size])
        out_s.append(sin3[i % 3, :, :, off:off + size])
        off += size
    return jnp.concatenate(out_c, -1), jnp.concatenate(out_s, -1)


# ------------------------------------------------------------ full forward

def qwen2vl_forward(
    params, cfg: Qwen2VLConfig,
    input_ids: jnp.ndarray,  # (B, T)
    attention_mask: Optional[jnp.ndarray],
    position_ids: jnp.ndarray,  # (3, B, T) from get_rope_index
    pixel_patches: Optional[jnp.ndarray] = None,  # (N, patch_dim)
    grid: Optional[Tuple[int, int, int]] = None,
    attn_impl: str = "auto",
    remat: bool = True,
    vision_embeds: Optional[jnp.ndarray] = None,  # (N_tok, C) precomputed
) -> jnp.ndarray:
    """Multimodal forward -> final hidden states (B, T, C).

    ``vision_embeds`` short-circuits the vision tower with precomputed
    merged embeddings — the decode loop encodes frames ONCE and re-runs
    only the text stack per generated token.
    """
    lm = params["language_model"]
    embeds = dec.embed_tokens(lm, input_ids)
    if vision_embeds is None and pixel_patches is not None:
        vision_embeds = vision_forward(params["visual"], cfg.vision,
                                       pixel_patches, grid,
                                       attn_impl=attn_impl, remat=remat)
    if vision_embeds is not None:
        # both <|image_pad|> and <|video_pad|> slots receive vision embeds
        marker = jnp.logical_or(input_ids == cfg.image_token_id,
                                input_ids == cfg.video_token_id)
        ids_for_scatter = jnp.where(marker, cfg.video_token_id, 0)
        embeds = scatter_image_embeds(
            embeds, ids_for_scatter, vision_embeds[None], cfg.video_token_id
        )
    cos, sin = mrope_cos_sin(position_ids, cfg)
    return dec.decoder_forward(
        lm, cfg.text, embeds, attention_mask=attention_mask,
        attn_impl=attn_impl, remat=remat, rope_override=(cos, sin),
    )


def lm_logits(params, cfg: Qwen2VLConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    lm = params["language_model"]
    if cfg.tie_word_embeddings:
        return dot_f32(hidden, lm["tok_embeddings"].T)
    return dec.lm_logits(lm, hidden)


@functools.lru_cache(maxsize=8)
def _generate_fn(cfg: Qwen2VLConfig, Tb: int, max_new: int,
                 has_vision: bool, eos: int, kv_quant: bool = False,
                 attn_impl: str = "auto"):
    """ONE compiled (prefill + while-loop decode) program per
    (config, prompt bucket, max_new); params and the per-call M-RoPE
    tables go through jit ARGUMENTS (a closure would inline the weight
    tree as HLO constants — observed HTTP 413 at 2B dims)."""
    from .generate import (
        decoder_forward_cached,
        greedy_decode_batch,
        init_kv_cache,
        last_real_token,
        prefill_slot_mask,
        step_slot_mask,
    )

    max_len = Tb + max_new

    @jax.jit
    def gen(params, ids, n_real, vis, cos_all, sin_all):
        # Batch-generic: ids (B, Tb), n_real (B,), vis flat (N_total, C)
        # concatenated in row order, cos/sin (B, max_len, D).
        lm = params["language_model"]
        B = ids.shape[0]
        embeds = dec.embed_tokens(lm, ids)
        if has_vision:
            marker = jnp.logical_or(ids == cfg.image_token_id,
                                    ids == cfg.video_token_id)
            embeds = scatter_image_embeds(
                embeds, jnp.where(marker, cfg.video_token_id, 0), vis[None],
                cfg.video_token_id)
        cache = init_kv_cache(cfg.text, B, max_len,
                              dtype=lm["tok_embeddings"].dtype,
                              quant=kv_quant)
        slots, mask = prefill_slot_mask(Tb, max_len, n_real)
        hidden, cache = decoder_forward_cached(
            lm, cfg.text, embeds, cache, slots, mask,
            rope_override=(cos_all[:, :Tb], sin_all[:, :Tb]),
            attn_impl=attn_impl)
        logits0 = lm_logits(params, cfg,
                            last_real_token(hidden, n_real))[:, 0]

        def step(params, tok, i, cache):
            e = dec.embed_tokens(params["language_model"], tok[:, None])
            s, m = step_slot_mask(max_len, n_real, i)
            idx = (jnp.atleast_1d(n_real) + i)[:, None, None]
            idx = jnp.broadcast_to(idx, (B, 1, cos_all.shape[-1]))
            c = jnp.take_along_axis(cos_all, idx, axis=1)
            sn = jnp.take_along_axis(sin_all, idx, axis=1)
            h, cache = decoder_forward_cached(
                params["language_model"], cfg.text, e, cache, s, m,
                rope_override=(c, sn))
            return lm_logits(params, cfg, h)[:, 0], cache

        return greedy_decode_batch(step, params, logits0, cache, max_new,
                                   eos)

    return gen


@functools.lru_cache(maxsize=8)
def _prefix_fn(cfg: Qwen2VLConfig, Pb: int, max_len: int,
               kv_quant: bool, attn_impl: str):
    """Compiled prefix prefill: the vision block + headers enter an empty
    cache once per video (no logits — the prefix never ends a prompt)."""
    from .generate import (
        decoder_forward_cached,
        init_kv_cache,
        prefill_slot_mask,
    )

    @jax.jit
    def fn(params, ids, n_real, vis, cos_all, sin_all):
        lm = params["language_model"]
        B = ids.shape[0]
        embeds = dec.embed_tokens(lm, ids)
        marker = jnp.logical_or(ids == cfg.image_token_id,
                                ids == cfg.video_token_id)
        embeds = scatter_image_embeds(
            embeds, jnp.where(marker, cfg.video_token_id, 0), vis[None],
            cfg.video_token_id)
        cache = init_kv_cache(cfg.text, B, max_len,
                              dtype=lm["tok_embeddings"].dtype,
                              quant=kv_quant)
        slots, mask = prefill_slot_mask(Pb, max_len, n_real)
        _, cache = decoder_forward_cached(
            lm, cfg.text, embeds, cache, slots, mask,
            rope_override=(cos_all[:, :Pb], sin_all[:, :Pb]),
            attn_impl=attn_impl)
        return cache, mask

    return fn


@functools.lru_cache(maxsize=8)
def _suffix_fn(cfg: Qwen2VLConfig, Sb: int, max_new: int, max_len: int,
               eos: int, attn_impl: str = "xla"):
    """Compiled suffix continuation + decode against a cached prefix.

    Suffix slots are [n_prefix, n_prefix + s_real) — contiguous with the
    prefix, so M-RoPE positions (gathered from the precomputed per-video
    tables) and slot causality equal the one-shot prompt.  With
    ``attn_impl`` "flash"/"auto"-on-TPU the suffix runs the SAME flash
    kernel as a full-prompt prefill via per-row ``q_offset = n_prefix``
    (see ``generate._layer_with_cache``), pinning prefix-cached decode to
    the full-prompt numerics; "xla" keeps the windowed bias path."""
    from .generate import (
        decoder_forward_cached,
        greedy_decode_batch,
        last_real_token,
        step_slot_mask,
    )

    @jax.jit
    def fn(params, cache, pmask, n_prefix, sids, s_real, cos_all, sin_all):
        lm = params["language_model"]
        B = sids.shape[0]
        emb = dec.embed_tokens(lm, sids)
        slots = n_prefix[:, None] + jnp.arange(Sb)[None]  # (B, Sb)
        span = jnp.arange(max_len)[None]
        valid = (span >= n_prefix[:, None]) \
            & (span < (n_prefix + s_real)[:, None])
        mask = jnp.maximum(pmask, valid.astype(pmask.dtype))
        idx = jnp.broadcast_to(slots[:, :, None],
                               (B, Sb, cos_all.shape[-1]))
        rope = (jnp.take_along_axis(cos_all, idx, axis=1),
                jnp.take_along_axis(sin_all, idx, axis=1))
        hidden, cache = decoder_forward_cached(
            lm, cfg.text, emb, cache, slots, mask, rope_override=rope,
            attn_impl=attn_impl, q_offset=n_prefix)
        logits0 = lm_logits(params, cfg,
                            last_real_token(hidden, s_real))[:, 0]
        n_total = n_prefix + s_real

        def step(params, tok, i, cache):
            e = dec.embed_tokens(params["language_model"], tok[:, None])
            # prefix + suffix occupy the contiguous [0, n_total), so the
            # standard step mask [0, n_total + i + 1) is exact.
            s, m = step_slot_mask(max_len, n_total, i)
            gidx = (n_total + i)[:, None, None]
            gidx = jnp.broadcast_to(gidx, (B, 1, cos_all.shape[-1]))
            c = jnp.take_along_axis(cos_all, gidx, axis=1)
            sn = jnp.take_along_axis(sin_all, gidx, axis=1)
            h, cache = decoder_forward_cached(
                params["language_model"], cfg.text, e, cache, s, m,
                rope_override=(c, sn))
            return lm_logits(params, cfg, h)[:, 0], cache

        return greedy_decode_batch(step, params, logits0, cache, max_new,
                                   eos)

    return fn


def greedy_generate_batch(
    params, cfg: Qwen2VLConfig,
    items,  # sequence of (input_ids (1,T), position_ids (3,1,T),
            #              pixel_patches, grid) per row
    max_new_tokens: int = 16,
    eos_token_id: int = 151645,  # <|im_end|>
    attn_impl: str = "auto",  # vision tower AND cached prefill backend
    vision_embeds=None,  # optional per-row precomputed vision embeds
    kv_quant: bool = False,  # int8 KV cache (ops/quant.py:quantize_kv)
) -> List[List[int]]:
    """Batched greedy decode with a static KV cache: each row's vision
    tower runs once (per-video — frames must not cross-attend), the
    padded prompt batch prefills once, and the whole token loop runs as
    ONE jitted ``lax.while_loop`` over all rows; prompts bucket to
    multiples of 64 so every judge call shares one compiled executable.
    M-RoPE cos/sin are precomputed per row for every slot (generated
    tokens continue at max(prompt) + 1 + i on all three channels) and
    gathered per step via ``rope_override``.

    Rows may carry different videos — even different grids: the
    cumsum-gather scatter consumes the concatenated flat embeds in row
    order, so per-row video-token counts may differ (each distinct
    (bucket, total-embed) shape compiles its own executable).
    ``vision_embeds`` (one array per row) skips the vision tower —
    callers asking many questions about the same videos encode once."""
    from .generate import pad_prompt_batch

    B = len(items)
    has_vision = items[0][2] is not None or vision_embeds is not None
    ids, n_real, Tb = pad_prompt_batch([it[0] for it in items],
                                       cfg.text.pad_token_id)
    max_len = Tb + max_new_tokens
    pos0 = np.zeros((3, B, max_len), np.int64)
    for b, (_, position_ids, _, _) in enumerate(items):
        nr = int(n_real[b])
        pos0[:, b, :nr] = position_ids[:, 0]
        # pad + decode slots: continue on all three channels (pad-slot
        # values are masked out of the cache; decode slot n_real+i uses
        # entry n_real+i)
        pos0[:, b, nr:] = position_ids.max() + 1 + np.arange(max_len - nr)
    cos_all, sin_all = mrope_cos_sin(jnp.asarray(pos0), cfg)

    vis = None
    if has_vision:
        vis = jnp.concatenate([
            _jit_vision(params["visual"], cfg.vision,
                        jnp.asarray(patches), grid, attn_impl=attn_impl)
            for _, _, patches, grid in items
        ]) if vision_embeds is None else jnp.concatenate(
            [jnp.reshape(v, (-1, v.shape[-1])) for v in vision_embeds])

    gen = _generate_fn(cfg, Tb, max_new_tokens, has_vision,
                       int(eos_token_id), kv_quant=kv_quant,
                       attn_impl=attn_impl)
    toks, n = gen(params, jnp.asarray(ids), jnp.asarray(n_real), vis,
                  cos_all, sin_all)
    toks, n = np.asarray(toks), np.asarray(n)
    return [[int(t) for t in toks[b, : n[b]]] for b in range(B)]


def greedy_generate(
    params, cfg: Qwen2VLConfig,
    input_ids: np.ndarray,  # (1, T) unpadded prompt
    position_ids: np.ndarray,  # (3, 1, T)
    pixel_patches=None, grid=None,
    max_new_tokens: int = 16,
    eos_token_id: int = 151645,  # <|im_end|>
    attn_impl: str = "auto",  # vision tower AND cached prefill backend
    kv_quant: bool = False,  # int8 KV cache (ops/quant.py:quantize_kv)
) -> List[int]:
    """Single-prompt greedy decode (see ``greedy_generate_batch``)."""
    return greedy_generate_batch(
        params, cfg, [(input_ids, position_ids, pixel_patches, grid)],
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        attn_impl=attn_impl, kv_quant=kv_quant)[0]


_jit_vision = jax.jit(
    functools.partial(vision_forward, remat=False),
    static_argnums=(1, 3), static_argnames=("attn_impl",),
)


# ------------------------------------------------------------ preprocessing

from ..data.video import CLIP_MEAN, CLIP_STD  # noqa: E402  (shared)


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """Qwen2-VL's resize rule: dims divisible by ``factor``, pixel count in
    [min_pixels, max_pixels], aspect ratio preserved
    (image_processing_qwen2_vl.py:smart_resize)."""
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def preprocess_video_frames(
    frames: Sequence[np.ndarray],  # uint8 RGB (H, W, 3)
    cfg: Qwen2VLVisionConfig,
    max_pixels: int = 360 * 420,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Frames -> (flattened patches (t*h*w, patch_dim), grid (t, h, w)).

    Mirrors Qwen2VLImageProcessor._preprocess: smart resize (bicubic),
    CLIP normalize, temporal grouping by ``temporal_patch_size`` (odd counts
    repeat the last frame), and the merged patch flattening order
    (t, h/m, w/m, m, m) x (c, tp, p, p)."""
    from PIL import Image

    P, TP, m = cfg.patch_size, cfg.temporal_patch_size, cfg.spatial_merge_size
    H0, W0 = frames[0].shape[:2]
    H, W = smart_resize(H0, W0, factor=P * m, max_pixels=max_pixels)
    mean = np.asarray(CLIP_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(3, 1, 1)
    proc = []
    for f in frames:
        img = Image.fromarray(f).convert("RGB").resize(
            (W, H), Image.Resampling.BICUBIC)
        x = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
        proc.append((x - mean) / std)
    arr = np.stack(proc)  # (F, 3, H, W)
    if arr.shape[0] % TP:
        arr = np.concatenate(
            [arr, arr[-1:].repeat(TP - arr.shape[0] % TP, 0)], axis=0)
    gt, gh, gw = arr.shape[0] // TP, H // P, W // P
    patches = arr.reshape(gt, TP, 3, gh // m, m, P, gw // m, m, P)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return patches.reshape(gt * gh * gw, cfg.patch_dim), (gt, gh, gw)


def build_video_prompt_prefix_suffix(
    tokenizer, cfg: Qwen2VLConfig, grid: Tuple[int, int, int], prompt: str,
) -> Tuple[list, list]:
    """The ChatML video prompt split at the question boundary.

    The prefix (system + user header + the whole vision block) is
    IDENTICAL for every question about a video with this grid, and the
    pieces are encoded separately before concatenation — so the split
    is exact by construction, with no BPE merge across the boundary.
    ``build_video_prompt_ids`` is their concatenation; the prefix-KV
    judge path prefills the prefix once per video."""
    m2 = cfg.vision.spatial_merge_size**2
    n_video = (grid[0] * grid[1] * grid[2]) // m2

    from ..data.prompts import encode_text

    def enc(s):
        return encode_text(tokenizer, s)

    nl = enc("\n")
    prefix = (
        [cfg.im_start_token_id] + enc("system") + nl
        + enc("You are a helpful assistant.") + [cfg.im_end_token_id] + nl
        + [cfg.im_start_token_id] + enc("user") + nl
        + [cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_video
        + [cfg.vision_end_token_id]
    )
    suffix = (
        enc(prompt) + [cfg.im_end_token_id] + nl
        + [cfg.im_start_token_id] + enc("assistant") + nl
    )
    return prefix, suffix


def build_video_prompt_ids(
    tokenizer, cfg: Qwen2VLConfig, grid: Tuple[int, int, int], prompt: str,
) -> np.ndarray:
    """ChatML ids for one video + text prompt (Qwen2-VL chat template):
    system, then <|vision_start|> video_pad x (t*h*w/m^2) <|vision_end|>
    followed by the text."""
    prefix, suffix = build_video_prompt_prefix_suffix(
        tokenizer, cfg, grid, prompt)
    return np.asarray([prefix + suffix], np.int32)

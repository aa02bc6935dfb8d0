"""MiniCPM-V-2.6 backbone, TPU-native — the third local baseline-judge family.

The reference benchmarks MJ-Video against MiniCPM-V-2.6 through ms-swift
(``eval_overall_minicpm.py:119-129``, ``ModelType.minicpm_v_v2_6_chat``).
This is a from-scratch JAX port of the MiniCPM-V-2.6 architecture:

* a SigLIP so400m vision tower (the NaViT-adapted SigLIP — architecturally
  the same tower as our Idefics2 port, including the resolution-bucketized
  position ids, so ``models/videoscore.vision_forward`` is reused directly);
* a single-layer cross-attention **resampler** that compresses each frame's
  patch grid to 64 query tokens, with 2D sin-cos positional embeddings
  added to the keys (the published MAE-style table);
* a Qwen2-7B text model — our llama-family decoder with QKV biases and
  standard RoPE.

Validated numerically against an independent torch oracle
(``tests/test_minicpmv.py`` builds the published architecture out of
``torch.nn.MultiheadAttention``/``LayerNorm`` and compares end-to-end).

TPU-first notes:

* Video mode (the benchmark path) feeds frames un-sliced, so every frame
  shares one static patch grid -> the whole vision+resampler stack is a
  single batched jit with no ragged shapes.
* The resampler's key-padding mask never activates for un-sliced video
  frames (all frames share the full grid), so the kernel is maskless.
* Image embeddings enter the LLM by marker-token scatter
  (``internvl.scatter_image_embeds``) instead of the reference's
  ``image_bound`` index bookkeeping — same result, no host round-trip.
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
from . import decoder as dec
from .internvl import scatter_image_embeds
from .videoscore import SigLIPVisionConfig, vision_forward


@dataclass(frozen=True)
class ResamplerConfig:
    """MiniCPM-V-2.6 resampler (resampler.py in the published repo)."""

    num_queries: int = 64
    embed_dim: int = 3584  # LLM hidden size
    num_heads: int = 28  # embed_dim // 128
    kv_dim: int = 1152  # vision hidden size
    layer_norm_eps: float = 1e-5  # published resampler uses nn.LayerNorm default

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


@dataclass(frozen=True)
class MiniCPMVConfig:
    """MiniCPM-V-2.6 = SigLIP so400m + resampler + Qwen2-7B.

    Defaults follow openbmb/MiniCPM-V-2_6 config.json; special-token ids
    are resolved from the tokenizer at prompt-build time (the defaults
    here are the published tokenizer's added-token ids).
    """

    vision: SigLIPVisionConfig = field(default_factory=lambda:
                                       SigLIPVisionConfig(image_size=980))
    resampler: ResamplerConfig = field(default_factory=ResamplerConfig)
    text: LLMConfig = field(default_factory=lambda: LLMConfig(
        architecture="llama", vocab_size=151666, hidden_size=3584,
        intermediate_size=18944, num_hidden_layers=28,
        num_attention_heads=28, num_key_value_heads=4,
        rope_theta=1e6, rms_norm_eps=1e-6, pad_token_id=151643,
        max_position_embeddings=32768, bias=True,
    ))
    scale_resolution: int = 448  # per-frame budget in video (un-sliced) mode
    # Qwen2 chat scaffolding + MiniCPM added tokens.
    im_start_token_id: int = 151644  # <|im_start|>
    im_end_token_id: int = 151645  # <|im_end|>
    image_start_token_id: int = 151646  # <image>
    image_end_token_id: int = 151647  # </image>
    unk_token_id: int = 151661  # <unk> (the image placeholder filler)


def minicpmv_config_from_hf(d: Dict[str, Any]) -> MiniCPMVConfig:
    """Build a MiniCPMVConfig from an HF MiniCPM-V-2_6 config.json dict."""
    v = d.get("vision_config", {})
    return MiniCPMVConfig(
        vision=SigLIPVisionConfig(
            hidden_size=v.get("hidden_size", 1152),
            intermediate_size=v.get("intermediate_size", 4304),
            num_hidden_layers=v.get("num_hidden_layers", 27),
            num_attention_heads=v.get("num_attention_heads", 16),
            patch_size=v.get("patch_size", 14),
            image_size=v.get("image_size", 980),
        ),
        resampler=ResamplerConfig(
            num_queries=d.get("query_num", 64),
            embed_dim=d.get("hidden_size", 3584),
            num_heads=d.get("hidden_size", 3584) // 128,
            kv_dim=v.get("hidden_size", 1152),
        ),
        text=LLMConfig(
            architecture="llama",
            vocab_size=d.get("vocab_size", 151666),
            hidden_size=d.get("hidden_size", 3584),
            intermediate_size=d.get("intermediate_size", 18944),
            num_hidden_layers=d.get("num_hidden_layers", 28),
            num_attention_heads=d.get("num_attention_heads", 28),
            num_key_value_heads=d.get("num_key_value_heads", 4),
            rope_theta=d.get("rope_theta", 1e6),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            pad_token_id=151643,
            max_position_embeddings=d.get("max_position_embeddings", 32768),
            bias=True,
        ),
        scale_resolution=d.get("scale_resolution", 448),
    )


# ---------------------------------------------------------------- pos embed

def get_2d_sincos_pos_embed(embed_dim: int,
                            grid_hw: Tuple[int, int]) -> np.ndarray:
    """(gh*gw, embed_dim) 2D sin-cos table — the published MAE-style code
    the MiniCPM-V resampler uses (resampler.py:get_2d_sincos_pos_embed):
    meshgrid with w first, half the channels per axis, sin then cos halves.
    """
    gh, gw = grid_hw
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first, (2,gh,gw)

    def one_axis(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000.0**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = one_axis(embed_dim // 2, grid[0])
    emb_w = one_axis(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # (gh*gw, D)


# -------------------------------------------------------------------- params

def init_minicpmv_params(key, cfg: MiniCPMVConfig, dtype=jnp.float32):
    vc, rc = cfg.vision, cfg.resampler
    D, Q, KV = rc.embed_dim, rc.num_queries, rc.kv_dim
    k = jax.random.split(key, 12)

    def dense(key, shape):
        return (jax.random.normal(key, shape) * 0.02).astype(dtype)

    L = vc.num_hidden_layers
    C, I = vc.hidden_size, vc.intermediate_size
    P = vc.patch_size
    vision = {
        "patch_embedding": {"kernel": dense(k[0], (P * P * 3, C)),
                            "bias": jnp.zeros((C,), dtype)},
        "position_embedding": dense(
            k[1], ((vc.image_size // P) ** 2, C)),
        "layers": {
            "ln1": {"weight": jnp.ones((L, C), dtype),
                    "bias": jnp.zeros((L, C), dtype)},
            "ln2": {"weight": jnp.ones((L, C), dtype),
                    "bias": jnp.zeros((L, C), dtype)},
            "q": {"kernel": dense(k[2], (L, C, C)),
                  "bias": jnp.zeros((L, C), dtype)},
            "k": {"kernel": dense(k[3], (L, C, C)),
                  "bias": jnp.zeros((L, C), dtype)},
            "v": {"kernel": dense(k[4], (L, C, C)),
                  "bias": jnp.zeros((L, C), dtype)},
            "o": {"kernel": dense(k[5], (L, C, C)),
                  "bias": jnp.zeros((L, C), dtype)},
            "fc1": {"kernel": dense(k[6], (L, C, I)),
                    "bias": jnp.zeros((L, I), dtype)},
            "fc2": {"kernel": dense(k[7], (L, I, C)),
                    "bias": jnp.zeros((L, C), dtype)},
        },
        "post_layernorm": {"weight": jnp.ones((C,), dtype),
                           "bias": jnp.zeros((C,), dtype)},
    }
    resampler = {
        "query": dense(k[8], (Q, D)),
        "kv_proj": {"kernel": dense(k[9], (KV, D))},
        "ln_q": {"weight": jnp.ones((D,), dtype),
                 "bias": jnp.zeros((D,), dtype)},
        "ln_kv": {"weight": jnp.ones((D,), dtype),
                  "bias": jnp.zeros((D,), dtype)},
        "ln_post": {"weight": jnp.ones((D,), dtype),
                    "bias": jnp.zeros((D,), dtype)},
        "attn": {
            "in_proj": {"kernel": dense(k[10], (D, 3 * D)),
                        "bias": jnp.zeros((3 * D,), dtype)},
            "out_proj": {"kernel": dense(k[11], (D, D)),
                         "bias": jnp.zeros((D,), dtype)},
        },
        "proj": dense(k[8], (D, D)),
    }
    text = dec.init_decoder_params(
        jax.random.split(k[9], 1)[0], cfg.text, dtype=dtype,
        with_lm_head=True,  # MiniCPM-V-2.6 has an untied lm_head
    )
    return {"vpm": vision, "resampler": resampler, "llm": text}


def import_minicpmv_params(state: Dict[str, np.ndarray], cfg: MiniCPMVConfig,
                           dtype=jnp.float32):
    """Map an HF MiniCPMV (openbmb/MiniCPM-V-2_6) state_dict to our pytree.

    Published layout: ``vpm.*`` (navit SigLIP), ``resampler.*``,
    ``llm.model.*`` + ``llm.lm_head`` (Qwen2).
    """
    from ..utils.checkpoint import import_decoder_params, import_siglip_vision

    vision = import_siglip_vision(state, cfg.vision, dtype, prefix="vpm.")

    def g(name):
        return np.asarray(state[name])

    def arr(x):
        return jnp.asarray(np.asarray(x), dtype)

    r = "resampler."
    resampler = {
        "query": arr(g(r + "query")),
        "kv_proj": {"kernel": arr(g(r + "kv_proj.weight").T)},
        "ln_q": {"weight": arr(g(r + "ln_q.weight")),
                 "bias": arr(g(r + "ln_q.bias"))},
        "ln_kv": {"weight": arr(g(r + "ln_kv.weight")),
                  "bias": arr(g(r + "ln_kv.bias"))},
        "ln_post": {"weight": arr(g(r + "ln_post.weight")),
                    "bias": arr(g(r + "ln_post.bias"))},
        "attn": {
            # torch MultiheadAttention packs rows [q; k; v] in in_proj_weight
            "in_proj": {"kernel": arr(g(r + "attn.in_proj_weight").T),
                        "bias": arr(g(r + "attn.in_proj_bias"))},
            "out_proj": {"kernel": arr(g(r + "attn.out_proj.weight").T),
                         "bias": arr(g(r + "attn.out_proj.bias"))},
        },
        "proj": arr(g(r + "proj")),
    }
    text = import_decoder_params(state, cfg.text, dtype, prefix="llm.",
                                 with_lm_head=True)
    return {"vpm": vision, "resampler": resampler, "llm": text}


# ----------------------------------------------------------------- resampler

def resampler_forward(p, cfg: ResamplerConfig, x: jnp.ndarray,
                      grid: Tuple[int, int]) -> jnp.ndarray:
    """Compress (B, gh*gw, kv_dim) vision states -> (B, num_queries, D).

    Published semantics (resampler.py ``Resampler.forward``): project kv,
    LayerNorm both streams, add the 2D sin-cos table to the KEYS only,
    run one ``nn.MultiheadAttention`` (packed in_proj), LayerNorm, then a
    final learned projection matrix.
    """
    eps = cfg.layer_norm_eps
    H, Dh, D = cfg.num_heads, cfg.head_dim, cfg.embed_dim
    B, S = x.shape[0], x.shape[1]

    pos = jnp.asarray(get_2d_sincos_pos_embed(D, grid))  # (S, D) fp32
    kv = dot(x, p["kv_proj"]["kernel"])
    kv = layer_norm(kv, p["ln_kv"]["weight"], p["ln_kv"]["bias"], eps=eps)
    q_in = layer_norm(p["query"], p["ln_q"]["weight"], p["ln_q"]["bias"],
                      eps=eps)  # (Q, D)
    k_in = kv + pos[None].astype(kv.dtype)

    Wq, Wk, Wv = jnp.split(p["attn"]["in_proj"]["kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(p["attn"]["in_proj"]["bias"], 3)
    nq = q_in.shape[0]
    q = (dot(q_in, Wq) + bq).reshape(nq, H, Dh)
    q = jnp.broadcast_to(q[None], (B, nq, H, Dh))
    k = (dot(k_in, Wk) + bk).reshape(B, S, H, Dh)
    v = (dot(kv, Wv) + bv).reshape(B, S, H, Dh)
    attn = multi_head_attention(q, k, v, causal=False, impl="xla")
    out = dot(attn.reshape(B, nq, D), p["attn"]["out_proj"]["kernel"]) \
        + p["attn"]["out_proj"]["bias"]
    out = layer_norm(out, p["ln_post"]["weight"], p["ln_post"]["bias"],
                     eps=eps)
    return dot(out, p["proj"])


# -------------------------------------------------------------- full forward

def get_vision_embedding(params, cfg: MiniCPMVConfig,
                         pixel_values: jnp.ndarray,  # (F, H, W, 3) NHWC
                         remat: bool = False,
                         attn_impl: str = "auto") -> jnp.ndarray:
    """Frames -> (F, num_queries, llm_hidden) image tokens."""
    vis = vision_forward(params["vpm"], cfg.vision, pixel_values, remat=remat,
                         attn_impl=attn_impl)
    gh = pixel_values.shape[1] // cfg.vision.patch_size
    gw = pixel_values.shape[2] // cfg.vision.patch_size
    return resampler_forward(params["resampler"], cfg.resampler, vis,
                             (gh, gw))


def minicpmv_forward(
    params, cfg: MiniCPMVConfig,
    input_ids: jnp.ndarray,  # (B, T) with unk_token_id placeholder runs
    attention_mask: Optional[jnp.ndarray] = None,
    pixel_values: Optional[jnp.ndarray] = None,  # (F, H, W, 3) NHWC
    attn_impl: str = "auto",
    remat: bool = False,
    vision_embeds: Optional[jnp.ndarray] = None,  # (F, Q, C) precomputed
) -> jnp.ndarray:
    """Multimodal forward -> final hidden states (B, T, C).

    ``vision_embeds`` short-circuits the vision tower + resampler with
    precomputed image tokens — the decode loop encodes frames ONCE.
    """
    embeds = dec.embed_tokens(params["llm"], input_ids)
    if vision_embeds is None and pixel_values is not None:
        vision_embeds = get_vision_embedding(params, cfg, pixel_values,
                                             remat=remat)
    if vision_embeds is not None:
        embeds = scatter_image_embeds(
            embeds, input_ids, vision_embeds, cfg.unk_token_id
        )
    return dec.decoder_forward(
        params["llm"], cfg.text, embeds, attention_mask=attention_mask,
        attn_impl=attn_impl, remat=remat,
    )


def lm_logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    return dot_f32(hidden, params["llm"]["output"]["kernel"])



@functools.lru_cache(maxsize=8)
def _generate_fn(cfg: MiniCPMVConfig, Tb: int, max_new: int,
                 has_vision: bool, eos: int, kv_quant: bool = False,
                 attn_impl: str = "auto"):
    """ONE compiled (prefill + while-loop decode) program per
    (config, prompt bucket, max_new) — judge calls with different captions
    reuse the same executable.  Params go through jit ARGUMENTS (a closure
    would inline the weight tree as HLO constants; at 2B+ dims that
    exceeds remote compilers' request limits)."""
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
    def gen(params, ids, n_real, vis):
        # Batch-generic: ids (B, Tb), n_real (B,), vis (F_total, Q, C)
        # concatenated in row order (the scatter flattens row-major).
        llm = params["llm"]
        embeds = dec.embed_tokens(llm, ids)
        if has_vision:
            embeds = scatter_image_embeds(embeds, ids, vis,
                                          cfg.unk_token_id)
        cache = init_kv_cache(cfg.text, ids.shape[0], max_len,
                              dtype=llm["tok_embeddings"].dtype,
                              quant=kv_quant)
        # right-padded prompt: real tokens at slots [0, n_real); pad-slot
        # K/V writes are masked out by the cache mask, so their (garbage)
        # activations never enter attention.
        slots, mask = prefill_slot_mask(Tb, max_len, n_real)
        hidden, cache = decoder_forward_cached(
            llm, cfg.text, embeds, cache, slots, mask,
            attn_impl=attn_impl)
        logits0 = lm_logits(params, last_real_token(hidden, n_real))[:, 0]

        def step(params, tok, i, cache):
            e = dec.embed_tokens(params["llm"], tok[:, None])
            s, m = step_slot_mask(max_len, n_real, i)
            h, cache = decoder_forward_cached(
                params["llm"], cfg.text, e, cache, s, m)
            return lm_logits(params, h)[:, 0], cache

        return greedy_decode_batch(step, params, logits0, cache, max_new,
                                   eos)

    return gen


@functools.lru_cache(maxsize=8)
def _prefix_fn(cfg: MiniCPMVConfig, Pb: int, max_len: int,
               kv_quant: bool, attn_impl: str):
    """Compiled prefix prefill (headers + all resampler blocks) into an
    empty cache, once per video.  Standard RoPE: positions ARE the
    slots, so no tables need caching (cf. qwen2vl._prefix_fn)."""
    from .generate import (
        decoder_forward_cached,
        init_kv_cache,
        prefill_slot_mask,
    )

    @jax.jit
    def fn(params, ids, n_real, vis):
        llm = params["llm"]
        embeds = dec.embed_tokens(llm, ids)
        embeds = scatter_image_embeds(embeds, ids, vis, cfg.unk_token_id)
        cache = init_kv_cache(cfg.text, ids.shape[0], max_len,
                              dtype=llm["tok_embeddings"].dtype,
                              quant=kv_quant)
        slots, mask = prefill_slot_mask(Pb, max_len, n_real)
        _, cache = decoder_forward_cached(
            llm, cfg.text, embeds, cache, slots, mask,
            attn_impl=attn_impl)
        return cache, mask

    return fn


@functools.lru_cache(maxsize=8)
def _suffix_fn(cfg: MiniCPMVConfig, Sb: int, max_new: int, max_len: int,
               eos: int, attn_impl: str = "xla"):
    """Compiled suffix continuation + decode against a cached prefix
    (suffix slots contiguous at [n_prefix, n_prefix + s_real)).  With
    ``attn_impl`` "flash"/"auto"-on-TPU the suffix runs the same flash
    kernel as a full-prompt prefill via per-row ``q_offset = n_prefix``
    (see ``generate._layer_with_cache``); "xla" keeps the windowed bias
    path."""
    from .generate import (
        decoder_forward_cached,
        greedy_decode_batch,
        last_real_token,
        step_slot_mask,
    )

    @jax.jit
    def fn(params, cache, pmask, n_prefix, sids, s_real):
        llm = params["llm"]
        emb = dec.embed_tokens(llm, sids)
        slots = n_prefix[:, None] + jnp.arange(Sb)[None]
        span = jnp.arange(max_len)[None]
        valid = (span >= n_prefix[:, None]) \
            & (span < (n_prefix + s_real)[:, None])
        mask = jnp.maximum(pmask, valid.astype(pmask.dtype))
        hidden, cache = decoder_forward_cached(
            llm, cfg.text, emb, cache, slots, mask, attn_impl=attn_impl,
            q_offset=n_prefix)
        logits0 = lm_logits(params, last_real_token(hidden, s_real))[:, 0]
        n_total = n_prefix + s_real

        def step(params, tok, i, cache):
            e = dec.embed_tokens(params["llm"], tok[:, None])
            s, m = step_slot_mask(max_len, n_total, i)
            h, cache = decoder_forward_cached(
                params["llm"], cfg.text, e, cache, s, m)
            return lm_logits(params, h)[:, 0], cache

        return greedy_decode_batch(step, params, logits0, cache, max_new,
                                   eos)

    return fn


def greedy_generate_batch(
    params, cfg: MiniCPMVConfig,
    items,  # sequence of (input_ids (1,T), pixel_values) per row
    max_new_tokens: int = 16,
    eos_token_id: Optional[int] = None,
    attn_impl: str = "auto",  # vision tower AND cached prefill backend
    vision_embeds=None,  # optional per-row precomputed (F, Q, C) embeds
    kv_quant: bool = False,  # int8 KV cache (ops/quant.py:quantize_kv)
) -> List[List[int]]:
    """Batched greedy decode with a static KV cache: each row's frames
    encode once (the resampler always emits (F, Q, C) regardless of the
    source resolution, so ANY two videos batch), the padded prompt batch
    prefills once, and the whole token loop runs as ONE jitted
    ``lax.while_loop``; prompts bucket to multiples of 64 so every judge
    call shares one compiled executable.  ``vision_embeds`` (one array per
    row) skips the vision tower — callers asking many questions about the
    same videos encode once."""
    from .generate import pad_prompt_batch

    eos = cfg.im_end_token_id if eos_token_id is None else eos_token_id
    has_vision = items[0][1] is not None or vision_embeds is not None
    ids, n_real, Tb = pad_prompt_batch([it[0] for it in items],
                                       cfg.text.pad_token_id)

    vis = None
    if has_vision:
        vis = jnp.concatenate([
            _jit_vision(params, cfg, jnp.asarray(pv), attn_impl=attn_impl)
            for _, pv in items
        ]) if vision_embeds is None else jnp.concatenate(
            list(vision_embeds))

    gen = _generate_fn(cfg, Tb, max_new_tokens, has_vision, int(eos),
                       kv_quant=kv_quant, attn_impl=attn_impl)
    toks, n = gen(params, jnp.asarray(ids), jnp.asarray(n_real), vis)
    toks, n = np.asarray(toks), np.asarray(n)
    return [[int(t) for t in toks[b, : n[b]]] for b in range(len(items))]


def greedy_generate(
    params, cfg: MiniCPMVConfig,
    input_ids: np.ndarray,  # (1, T) unpadded prompt
    pixel_values=None,
    max_new_tokens: int = 16,
    eos_token_id: Optional[int] = None,
    attn_impl: str = "auto",  # vision tower AND cached prefill backend
    kv_quant: bool = False,  # int8 KV cache (ops/quant.py:quantize_kv)
) -> List[int]:
    """Single-prompt greedy decode (see ``greedy_generate_batch``)."""
    return greedy_generate_batch(
        params, cfg, [(input_ids, pixel_values)],
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        attn_impl=attn_impl, kv_quant=kv_quant)[0]


_jit_vision = jax.jit(get_vision_embedding, static_argnums=(1,),
                      static_argnames=("attn_impl",))


# ------------------------------------------------------------- preprocessing

MINICPM_MEAN = (0.5, 0.5, 0.5)
MINICPM_STD = (0.5, 0.5, 0.5)


def find_best_resize(width: int, height: int, scale_resolution: int = 448,
                     patch_size: int = 14,
                     allow_upscale: bool = True) -> Tuple[int, int]:
    """MiniCPM-V's un-sliced resize rule (image_processing_minicpmv.py
    ``find_best_resize``): scale to ~scale_resolution^2 pixels preserving
    aspect, then round each dim to a multiple of ``patch_size`` (min one
    patch).  Returns (width, height)."""
    import math

    if (width * height > scale_resolution * scale_resolution) or allow_upscale:
        r = width / height
        height = int(scale_resolution / math.sqrt(r))
        width = int(height * r)

    def ensure_divide(length):
        return max(round(length / patch_size) * patch_size, patch_size)

    return ensure_divide(width), ensure_divide(height)


def preprocess_video_frames(
    frames: Sequence[np.ndarray],  # uint8 RGB (H, W, 3)
    cfg: MiniCPMVConfig,
) -> jnp.ndarray:
    """Frames -> (F, H', W', 3) NHWC fp32, resized per ``find_best_resize``
    and normalized with mean/std 0.5 (the MiniCPM convention).  Video mode
    never slices, so all frames share one static shape."""
    from ..data.video import _pil_resize

    H0, W0 = frames[0].shape[:2]
    W, H = find_best_resize(W0, H0, cfg.scale_resolution,
                            cfg.vision.patch_size)
    mean = np.asarray(MINICPM_MEAN, np.float32)
    std = np.asarray(MINICPM_STD, np.float32)
    out = [(_pil_resize(f, (W, H)).astype(np.float32) / 255.0 - mean) / std
           for f in frames]
    return np.stack(out)


def _segment_renderer(tokenizer, cfg: MiniCPMVConfig):
    """(kind, value) segments -> token ids, with special-token ids
    resolved from the tokenizer when possible (config defaults
    otherwise) and text runs BPE-encoded exactly at the boundaries
    where an HF tokenizer splits on special tokens."""
    from ..data.prompts import encode_text

    def tid(tok_str, default):
        if hasattr(tokenizer, "convert_tokens_to_ids"):
            try:
                t = tokenizer.convert_tokens_to_ids(tok_str)
            except (KeyError, ValueError):
                return default
            unk = getattr(tokenizer, "unk_token_id", None)
            if isinstance(t, int) and t >= 0 and (
                    t != unk or tok_str == "<unk>"):
                return t
        return default

    special = {
        "<|im_start|>": tid("<|im_start|>", cfg.im_start_token_id),
        "<|im_end|>": tid("<|im_end|>", cfg.im_end_token_id),
        "<image>": tid("<image>", cfg.image_start_token_id),
        "</image>": tid("</image>", cfg.image_end_token_id),
        "<unk>": tid("<unk>", cfg.unk_token_id),
    }

    def render(segs) -> List[int]:
        ids: List[int] = []
        for kind, value in segs:
            if kind == "special":
                ids.append(special[value])
            else:
                ids += encode_text(tokenizer, value)
        return ids

    return render


def build_video_prompt_ids(
    tokenizer, cfg: MiniCPMVConfig, n_frames: int, prompt: str,
) -> np.ndarray:
    """ChatML ids for an n-frame video + text prompt.

    Token layout pinned by ``data/judge_templates.py`` (transcribed from
    the published MiniCPM-V-2.6 chat/processor sources, the code swift's
    ``minicpm_v_v2_6_chat`` template delegates to): each frame renders as
    ``<image>`` + ``<unk>`` x num_queries + ``</image>``, frames and the
    query are ``'\n'``-joined, wrapped in a system-less ChatML turn.
    """
    from ..data.judge_templates import minicpm_video_segments

    render = _segment_renderer(tokenizer, cfg)
    return np.asarray([render(minicpm_video_segments(
        n_frames, prompt, cfg.resampler.num_queries))], np.int32)


def build_video_prompt_prefix_suffix(
    tokenizer, cfg: MiniCPMVConfig, n_frames: int, prompt: str,
) -> Tuple[List[int], List[int]]:
    """The video prompt split at the question boundary, exactly.

    ``minicpm_video_segments`` ends with the fixed tail
    [("text", "\\n" + query), ("special", im_end), ("text", "\\n")] — the
    query binds to the preceding newline in ONE BPE run, so the
    segment-level split (everything before that tail = prefix) is exact:
    each side encodes independently and concatenates to the whole-prompt
    tokenization.  The prefix (headers + every frame's resampler block)
    is question-independent, so the prefix-KV judge path prefills it
    once per video."""
    from ..data.judge_templates import minicpm_video_segments

    segs = minicpm_video_segments(n_frames, prompt,
                                  cfg.resampler.num_queries)
    render = _segment_renderer(tokenizer, cfg)
    return render(segs[:-5]), render(segs[-5:])

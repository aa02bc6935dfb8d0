"""Decoder LLM (InternLM2 / Llama family), TPU-native.

Replaces ``modeling_internlm2.py`` (InternLM2Model / InternLM2Attention /
InternLM2MLP / InternLM2ForCausalLM) and the Llama path the chat model can
select (``modeling_internvl_chat.py:125-130``).  TPU-first design:

* Stacked layer params + ``lax.scan`` + optional ``jax.checkpoint``.
* The packed ``wqkv`` grouped layout '(h gs d)' with gs = 2 + groups
  (``modeling_internlm2.py:301-305,361-371``) is preserved at import time but
  unpacked ONCE into separate q/k/v kernels by the checkpoint importer, so the
  forward is branch-free and identical for both architectures.
* GQA runs natively in the attention einsum — no ``repeat_kv``
  materialization (``modeling_internlm2.py:268-277``).
* fp32 softmax (reference upcasts at ``modeling_internlm2.py:409``), fp32
  RMSNorm statistics, RoPE tables computed functionally (no caches).
* No KV-cache is needed for reward scoring; a cached single-token step for
  generation lives in ``generate.py``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..configs import LLMConfig
from ..ops.attention import multi_head_attention
from ..ops.matmul import dot, dot_f32
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_tables

# Cauchy-Schwarz softmax bound in the causal flash kernel (collapses the
# online softmax — _fwd_bound_kernel): +10.6% kernel-level at the reward
# prefill shape, +5.6% at the ragged train batch, bound gap 16-18 of the
# ~85-nat fp32 budget (benchmarks/llm_bound_ab.py, v5e round 4).  Decoder
# q/k are RMSNorm-fed like the adopting vision towers (vit.py _NC_BOUND);
# MJV_LLM_NORM_BOUND=0 restores the exact online row max for A/Bs.
#
# THIS global-kmax variant is deliberately NOT used in the judges' cached
# decode paths (generate._layer_with_cache, cogvlm2's cache layer): the
# global kmax is computed over ALL unmasked keys, so a prefix-only prefill
# (kmax over the prefix key set) and a full-prompt prefill (kmax over every
# prompt key) shift each prefix row's softmax by different m —
# mathematically identical but rounded differently, perturbing the cached
# prefix k/v at ulp level and reopening the greedy-tie caveat the
# prefix-flash work closed (docs/PARITY.md prefix caching).  The cached
# paths have an opt-in ROW-CAUSAL bound instead (norm_bound="rows",
# generate._CACHE_BOUND, MJV_CACHE_NORM_BOUND=1): per-row kmax over keys
# <= the row's own global position — deterministic across prefix-only and
# full-prompt prefills BY CONSTRUCTION — but it measured below the 2%
# adoption bar on chip (+1.7% prefill / -3.6% ragged, llm_bound_ab.py
# round 5), so the cached paths default to the exact softmax.
# CogVLM2's bespoke cache layer likewise keeps the exact softmax.
_LLM_BOUND = os.environ.get("MJV_LLM_NORM_BOUND", "1") != "0"


def init_decoder_params(key, cfg: LLMConfig, dtype=jnp.float32,
                        with_lm_head: bool = True):
    """Initialize decoder params (stacked layers, separate q/k/v kernels)."""
    C, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    V = cfg.vocab_size
    k = jax.random.split(key, 10)

    def dense(key, shape):
        return (jax.random.normal(key, shape) * 0.02).astype(dtype)

    attn = {
        "wq": {"kernel": dense(k[0], (L, C, Hq * D))},
        "wk": {"kernel": dense(k[1], (L, C, Hkv * D))},
        "wv": {"kernel": dense(k[2], (L, C, Hkv * D))},
        "wo": {"kernel": dense(k[3], (L, Hq * D, C))},
    }
    if cfg.bias:
        attn["wq"]["bias"] = jnp.zeros((L, Hq * D), dtype)
        attn["wk"]["bias"] = jnp.zeros((L, Hkv * D), dtype)
        attn["wv"]["bias"] = jnp.zeros((L, Hkv * D), dtype)
        attn["wo"]["bias"] = jnp.zeros((L, C), dtype)

    params = {
        "tok_embeddings": dense(k[4], (V, C)),
        "layers": {
            "attention_norm": {"weight": jnp.ones((L, C), dtype)},
            "attention": attn,
            "ffn_norm": {"weight": jnp.ones((L, C), dtype)},
            "feed_forward": {
                "w1": {"kernel": dense(k[5], (L, C, I))},
                "w3": {"kernel": dense(k[6], (L, C, I))},
                "w2": {"kernel": dense(k[7], (L, I, C))},
            },
        },
        "norm": {"weight": jnp.ones((C,), dtype)},
    }
    if with_lm_head:
        params["output"] = {"kernel": dense(k[8], (C, V))}
    return params


def _dense(p, x):
    y = dot(x, p["kernel"])
    if "bias" in p:
        y = y + p["bias"]
    return y


def _decoder_layer(cfg: LLMConfig, p, x, attention_mask, cos, sin,
                   position_ids, attn_impl, sp=None):
    """One decoder layer. Ref: ``modeling_internlm2.py:610-681``.

    ``sp``: optional sequence-parallel spec {'mesh', 'axis', 'kind'} — the
    attention runs as a shard_map (ring or all-gather-KV) over the mesh
    while everything position-wise stays GSPMD-partitioned by jit.
    """
    B, S, C = x.shape
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    h = rms_norm(x, p["attention_norm"]["weight"], eps=cfg.rms_norm_eps)
    q = _dense(p["attention"]["wq"], h).reshape(B, S, Hq, D)
    k = _dense(p["attention"]["wk"], h).reshape(B, S, Hkv, D)
    v = _dense(p["attention"]["wv"], h).reshape(B, S, Hkv, D)
    q, k = apply_rope(q, k, cos, sin, position_ids)
    if sp is not None:
        from ..parallel.sequence import ring_flash_attention, sp_flash_attention

        sp_fn = (ring_flash_attention if sp.get("kind", "ring") == "ring"
                 else sp_flash_attention)
        attn = sp_fn(
            q, k, v, sp["mesh"], axis=sp.get("axis", "data"),
            attention_mask=attention_mask, causal=True,
        )
    else:
        attn = multi_head_attention(
            q, k, v, attention_mask=attention_mask, causal=True,
            impl=attn_impl, norm_bound=_LLM_BOUND,
        )
    x = x + _dense(p["attention"]["wo"], attn.reshape(B, S, Hq * D))

    h = rms_norm(x, p["ffn_norm"]["weight"], eps=cfg.rms_norm_eps)
    gate = _dense(p["feed_forward"]["w1"], h)
    up = _dense(p["feed_forward"]["w3"], h)
    h = _dense(p["feed_forward"]["w2"], jax.nn.silu(gate) * up)
    return x + h


def decoder_forward(
    params,
    cfg: LLMConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, C)
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S) 1=real
    position_ids: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = True,
    sp=None,
    rope_override=None,
) -> jnp.ndarray:
    """Run all decoder layers + final norm; returns hidden states (B, S, C).

    Equivalent to the reference's ``hidden_states[-1]`` with
    ``output_hidden_states=True`` (``modeling_internlm2.py:930-970`` — the
    final entry is post-``self.norm``).

    ``sp={'mesh': Mesh, 'axis': 'data', 'kind': 'ring'|'allgather'}`` runs
    attention sequence-parallel: shard ``inputs_embeds``/``attention_mask``
    on the sequence dim and jit as usual — position-wise layers partition
    via GSPMD, attention via the explicit shard_map.

    ``rope_override=(cos, sin)`` supplies pre-gathered per-token rotary
    values of shape (B, S, head_dim) — used by the multimodal-RoPE
    architectures (Qwen2-VL) where positions are 3-channel.
    """
    S = inputs_embeds.shape[1]
    if rope_override is not None:
        cos, sin = rope_override
        position_ids = None
    else:
        cos, sin = rope_tables(
            S,
            cfg.head_dim,
            base=cfg.rope_theta,
            scaling_type=cfg.rope_scaling_type,
            scaling_factor=cfg.rope_scaling_factor,
            max_position_embeddings=cfg.max_position_embeddings,
        )

    def block(carry, lp):
        return (
            _decoder_layer(
                cfg, lp, carry, attention_mask, cos, sin, position_ids,
                attn_impl, sp=sp,
            ),
            None,
        )

    from ..ops.remat import remat_wrap

    blk = remat_wrap(block, remat)
    x, _ = jax.lax.scan(blk, inputs_embeds, params["layers"])
    return rms_norm(x, params["norm"]["weight"], eps=cfg.rms_norm_eps)


def embed_tokens(params, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Token embedding lookup (``tok_embeddings`` / Llama ``embed_tokens``)."""
    return params["tok_embeddings"][input_ids]


def lm_logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    """LM head projection (fp32 logits, as HF does for loss stability)."""
    return dot_f32(hidden, params["output"]["kernel"])


def init_sequence_classifier(key, cfg: LLMConfig, num_labels: int,
                             dtype=jnp.float32):
    """Score head for sequence classification
    (``InternLM2ForSequenceClassification``, ``modeling_internlm2.py:
    1311-1415`` — linear hidden -> num_labels, no bias)."""
    return {"score": {"kernel": (
        jax.random.normal(key, (cfg.hidden_size, num_labels)) * 0.02
    ).astype(dtype)}}


def sequence_classify(
    params, head, cfg: LLMConfig,
    inputs_embeds: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask=None,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Pooled classification logits (B, num_labels).

    Pools the last non-pad token exactly as the reference does
    (``modeling_internlm2.py:1370-1390``: argmax(ids == pad) - 1 mod T).
    """
    hidden = decoder_forward(
        params, cfg, inputs_embeds, attention_mask=attention_mask,
        attn_impl=attn_impl, remat=False,
    )
    T = input_ids.shape[-1]
    idx = (
        jnp.argmax((input_ids == cfg.pad_token_id).astype(jnp.int32), -1) - 1
    ) % T
    pooled = jnp.take_along_axis(hidden, idx[:, None, None], axis=1,
                                 mode="clip")[:, 0]
    return dot_f32(pooled, head["score"]["kernel"])

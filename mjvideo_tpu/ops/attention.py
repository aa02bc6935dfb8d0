"""Attention ops: XLA reference path + dispatch to the Pallas flash kernel.

Replaces the reference's three attention implementations — naive torch
(``modeling_internlm2.py:393-410``, ``modeling_intern_vit.py:210-227``), CUDA
FlashAttention2 (``modeling_internlm2.py:430-600``), and flash-attn's packed
varlen ViT path (``modeling_intern_vit.py:35-96``) — with two TPU paths:

* ``impl='xla'``: einsum attention with fp32 softmax (the reference upcasts
  softmax to fp32 at ``modeling_internlm2.py:409``).  XLA fuses this well and
  it is the correctness oracle on CPU.
* ``impl='flash'``: the Pallas blockwise kernel in ``flash_attention.py``
  (padding handled by masking instead of varlen unpadding).

GQA is expressed natively (einsum over grouped heads) instead of
``repeat_kv``-materializing the KV heads (``modeling_internlm2.py:268-277``)
— XLA keeps the broadcast virtual, saving HBM bandwidth.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .matmul import einsum

NEG_INF = -1e30  # large finite negative instead of -inf: keeps softmax NaN-free


def kv_valid_mask(batch: int, kv_len: int, kv_valid: int) -> jnp.ndarray:
    """(B, K) int32 padding mask for a static ``kv_valid`` prefix of real rows.

    Single definition shared by the dispatch fallback and both
    ``flash_attention`` mask-rebuild sites so the declared-valid-tail
    semantics can never diverge between forward and backward."""
    return jnp.broadcast_to(
        (jnp.arange(kv_len) < kv_valid).astype(jnp.int32)[None],
        (batch, kv_len))


def make_attention_bias(
    attention_mask: Optional[jnp.ndarray],
    q_len: int,
    kv_len: int,
    causal: bool,
    dtype=jnp.float32,
) -> Optional[jnp.ndarray]:
    """Build an additive (B, 1, Q, K) bias from a (B, K) padding mask + causality.

    Mirrors the reference mask construction (``modeling_internlm2.py:93-125``,
    ``_make_causal_mask``/``_expand_mask``) but as one fused where().
    """
    bias = None
    if causal:
        q_pos = jnp.arange(q_len)[:, None] + (kv_len - q_len)
        k_pos = jnp.arange(kv_len)[None, :]
        causal_mask = q_pos >= k_pos  # (Q, K) True = attend
        bias = jnp.where(causal_mask, 0.0, NEG_INF).astype(dtype)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask.astype(bool), 0.0, NEG_INF).astype(dtype)
        pad = pad[:, None, None, :]  # (B, 1, 1, K)
        bias = pad if bias is None else bias + pad
    return bias


def attention_xla(
    q: jnp.ndarray,  # (B, Q, Hq, D)
    k: jnp.ndarray,  # (B, K, Hkv, D)
    v: jnp.ndarray,  # (B, K, Hkv, D)
    bias: Optional[jnp.ndarray] = None,  # (B, 1|Hq, Q, K) additive, fp32
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query attention with fp32 softmax; returns (B, Q, Hq, D)."""
    B, Q, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D**-0.5

    qg = q.reshape(B, Q, Hkv, G, D)
    # logits: (B, Hkv, G, Q, K) accumulated in fp32 on the MXU
    logits = einsum("bqhgd,bkhd->bhgqk", qg, k) * scale
    if bias is not None:
        bias = bias.astype(jnp.float32)
        if bias.shape[1] == 1:
            logits = logits + bias[:, :, None]  # broadcast over (Hkv, G)
        else:
            logits = logits + bias.reshape(B, Hkv, G, Q, bias.shape[-1])
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = einsum("bhgqk,bkhd->bqhgd", probs, v, out_dtype=q.dtype)
    return out.reshape(B, Q, Hq, D)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "auto",
    kv_valid: Optional[int] = None,
    norm_bound: bool = False,
) -> jnp.ndarray:
    """Unified attention entry. q/k/v: (B, S, H, D) with Hkv <= Hq.

    ``attention_mask``: (B, K) with 1 = real token, 0 = padding.
    ``kv_valid``: static count of real kv rows for pre-padded aligned
    sequences (rows beyond it must be zeroed in k/v); see
    ``flash_attention``.
    ``norm_bound``: Cauchy-Schwarz softmax bound on the flash nc path
    (see ``flash_attention``); a no-op for the XLA oracle and the other
    kernel shapes.

    ``impl='auto'`` (measured on v5e, docs/PERF.md): the Pallas flash
    kernel wins both model shapes with per-shape block defaults — LLM
    causal B4/S2112: 4.8ms vs 12.1ms XLA; ViT non-causal B32/S1025/D64
    with whole-row kv blocks: 8.9ms vs 13.4ms XLA (XLA materializes the
    fp32 logits in HBM).  Off-TPU, flash runs interpreted, so XLA is the
    right call there.
    """
    if impl == "auto":
        import jax

        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    if impl == "flash":
        from .flash_attention import flash_attention

        return flash_attention(
            q, k, v, attention_mask=attention_mask, causal=causal,
            scale=scale, kv_valid=kv_valid, norm_bound=norm_bound,
        )
    if kv_valid is not None and attention_mask is None:
        attention_mask = kv_valid_mask(k.shape[0], k.shape[1], kv_valid)
    bias = make_attention_bias(
        attention_mask, q.shape[1], k.shape[1], causal=causal
    )
    return attention_xla(q, k, v, bias=bias, scale=scale)

"""Rotary position embeddings with linear / dynamic-NTK scaling.

Replaces ``InternLM2RotaryEmbedding`` + scaling variants
(``modeling_internlm2.py:147-247``).  TPU-first differences:

* cos/sin tables are computed functionally from static sequence length at
  trace time — no mutable caches, no cache-growth recompiles.
* Dynamic-NTK base rescaling is resolved from the *static* padded sequence
  length (the reference recomputes it per forward from runtime seq_len; under
  jit the padded length is static, so this is exact for fixed-shape batches).
* The half-rotation layout matches the GPT-NeoX convention the reference uses
  (``rotate_half``: concat of negated second half and first half).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def rope_tables(
    seq_len: int,
    head_dim: int,
    base: float = 10000.0,
    scaling_type: Optional[str] = None,
    scaling_factor: float = 1.0,
    max_position_embeddings: int = 2048,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin) of shape (seq_len, head_dim), computed in fp32.

    ``scaling_type``: None | 'linear' | 'dynamic' (NTK-aware), matching
    ``modeling_internlm2.py:184-229``.
    """
    if scaling_type == "dynamic" and seq_len > max_position_embeddings:
        base = base * (
            (scaling_factor * seq_len / max_position_embeddings)
            - (scaling_factor - 1)
        ) ** (head_dim / (head_dim - 2))

    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(seq_len, dtype=jnp.float32)
    if scaling_type == "linear":
        t = t / scaling_factor

    freqs = jnp.outer(t, inv_freq)  # (seq_len, head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (seq_len, head_dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """(-x2, x1) layout, as in ``modeling_internlm2.py:233-237``."""
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    position_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding to q, k of shape (..., seq, num_heads, head_dim).

    ``cos``/``sin`` are (max_seq, head_dim) tables gathered by
    ``position_ids`` (batch, seq), or pre-gathered per-token values of shape
    (batch, seq, head_dim) — the multimodal-RoPE path (Qwen2-VL) builds
    those from 3-channel position ids and passes them directly.
    """
    if cos.ndim == 3:  # per-token cos/sin, already (B, S, D)
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    elif position_ids is None:
        seq = q.shape[-3]
        c = cos[:seq][None, :, None, :]
        s = sin[:seq][None, :, None, :]
    else:
        c = cos[position_ids][:, :, None, :]
        s = sin[position_ids][:, :, None, :]
    c = c.astype(q.dtype)
    s = s.astype(q.dtype)
    q_rot = q * c + rotate_half(q) * s
    k_rot = k * c + rotate_half(k) * s
    return q_rot, k_rot

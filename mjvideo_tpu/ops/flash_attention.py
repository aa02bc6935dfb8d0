"""Pallas TPU flash attention (blockwise, online-softmax).

Replaces the reference's CUDA flash-attn dependency
(``modeling_intern_vit.py:35-96`` packed-QKV ViT path and
``modeling_internlm2.py:430-600`` causal varlen LLM path) with one TPU
kernel covering both uses:

* non-causal (ViT, seq 1025/tile) and causal (LLM, seq <= 3072; long-video
  configs reach ~40k tokens — SURVEY.md §5 long-context row),
* grouped-query attention natively (q head h reads kv head h // G via the
  BlockSpec index map — no repeat_kv materialization),
* padding via a (B, K) mask instead of flash-attn's varlen unpadding
  (SURVEY.md §2.3): masked logits get a large negative bias; fully-masked
  query rows emit 0.

Design notes (see /opt/skills/guides/pallas_guide.md):

* Grid = (B, Hq, Q_blocks, KV_blocks), kv innermost; the online-softmax
  state (m, l, acc in fp32) lives in VMEM scratch that persists across the
  kv dimension, so only one (block_q, D) + one (block_kv, D) K and V tile
  are resident at a time — VMEM use is independent of sequence length.
* Causal programs skip compute for blocks strictly above the diagonal via
  ``pl.when`` (their tiles still stream; fused q/kv block alignment keeps
  the waste one block per row).
* Precision: fp32 operands use HIGHEST (interpret mode truncates them
  otherwise); bf16 operands use DEFAULT (Mosaic rejects fp32 contract
  precision on bf16, whose MXU passes accumulate in fp32 anyway).
* Backward: ``jax.custom_vjp`` recomputing with the XLA einsum path —
  mathematically the same function, so gradients are exact; a dedicated
  Pallas backward kernel can swap in behind the same signature.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fa_kernel(
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_kv, D)
    v_ref,  # (1, 1, block_kv, D)
    mask_ref,  # (1, 1, block_kv) int32, 1 = real token
    o_ref,  # (1, 1, block_q, D)
    acc_ref,  # VMEM (block_q, D) f32
    m_ref,  # VMEM (block_q, 128) f32
    l_ref,  # VMEM (block_q, 128) f32
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Causal: skip blocks strictly above the diagonal.
    run = (qi + 1) * block_q > ki * block_kv if causal else True

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]  # (block_q, D)
        k = k_ref[0, 0]  # (block_kv, D)
        v = v_ref[0, 0]
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale  # (block_q, block_kv) fp32

        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            k_pos = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        mk = mask_ref[0, 0]  # (block_kv,)
        s = jnp.where(mk[None, :] != 0, s, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    @pl.when(ki == n_kv - 1)
    def _finish():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        # Fully-masked rows (all-pad): m never left NEG_INF (every logit was
        # masked, so p == exp(0) summed garbage into l/acc) — emit 0.
        dead = m <= NEG_INF * 0.5
        out = jnp.where(dead, 0.0, acc_ref[:] / jnp.where(l == 0.0, 1.0, l))
        o_ref[0, 0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_blocks(Q: int, K: int) -> tuple:
    """Default block sizes, tuned on v5e (B4/S2112/GQA bf16):
    (256, 512) -> 4.76ms vs (512, 512) 5.10ms vs (128, 128) 8.25ms —
    fine-grained grids cost more than the padding they save."""
    bq = 256 if Q > 256 else _round_up(Q, 128)
    bk = 512 if K > 512 else _round_up(K, 128)
    return bq, bk


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_kv", "interpret"),
)
def _flash_attention_fwd_impl(
    q: jnp.ndarray,  # (B, Q, Hq, D)
    k: jnp.ndarray,  # (B, K, Hkv, D)
    v: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],  # (B, K) 1 = real
    causal: bool,
    scale: Optional[float],
    block_q: Optional[int],
    block_kv: Optional[int],
    interpret: bool,
) -> jnp.ndarray:
    B, Q, Hq, D = q.shape
    K, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D**-0.5

    default_bq, default_bk = _pick_blocks(Q, K)
    block_q = min(block_q or default_bq, _round_up(Q, 128))
    block_kv = min(block_kv or default_bk, _round_up(K, 128))
    Qp = _round_up(Q, block_q)
    Kp = _round_up(K, block_kv)

    # (B, H, S, D) layout for blockwise streaming.
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if Qp != Q:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    if Kp != K:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))

    # Padded kv tail must be masked; fold it into the padding mask.
    mask = attention_mask
    if mask is None:
        mask = jnp.ones((B, K), jnp.int32)
    mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, Kp - K)))
    mask = mask[:, None, :]  # (B, 1, Kp): TPU block last-two-dims rule

    assert Q == K or not causal, "causal flash requires self-attention shapes"

    kernel = functools.partial(
        _fa_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
        block_kv=block_kv,
    )

    out = pl.pallas_call(
        kernel,
        grid=(B, Hq, Qp // block_q, Kp // block_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, D),
                         lambda b, h, i, j: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, D),
                         lambda b, h, i, j: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv),
                         lambda b, h, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Qp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, mask)

    out = out[:, :, :Q, :]
    return jnp.transpose(out, (0, 2, 1, 3))


def _xla_reference(q, k, v, attention_mask, causal, scale):
    from .attention import attention_xla, make_attention_bias

    bias = make_attention_bias(attention_mask, q.shape[1], k.shape[1], causal)
    return attention_xla(q, k, v, bias=bias, scale=scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, attention_mask, causal, scale,
                     block_q, block_kv):
    interpret = jax.default_backend() != "tpu"
    return _flash_attention_fwd_impl(
        q, k, v, attention_mask, causal, scale, block_q, block_kv, interpret
    )


def _fwd(q, k, v, attention_mask, causal, scale, block_q, block_kv):
    out = _flash_attention(q, k, v, attention_mask, causal, scale,
                           block_q, block_kv)
    return out, (q, k, v, attention_mask)


def _bwd(causal, scale, block_q, block_kv, res, g):
    # Exact gradients via the XLA einsum formulation of the same function.
    q, k, v, attention_mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, attention_mask,
                                          causal, scale),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
) -> jnp.ndarray:
    """Blockwise flash attention. q: (B, Q, Hq, D); k/v: (B, K, Hkv, D).

    ``attention_mask``: (B, K), 1 = real token, 0 = padding.  Block sizes
    default to the least-padding choice in {512, 256, 128}.
    """
    return _flash_attention(
        q, k, v, attention_mask, causal, scale, block_q, block_kv
    )

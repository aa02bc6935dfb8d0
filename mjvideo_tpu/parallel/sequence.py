"""Sequence parallelism for long-video attention.

The reference caps sequences at 3,072 tokens (SURVEY.md §5 long-context
row); the TPU build's high-res configs reach ~40-100k tokens (16-32 frames x
max_num=12 tiles), where a single chip's attention time dominates.  This
module shards the QUERY sequence across the mesh, two ways:

* ``sp_flash_attention`` — all-gather KV (one ICI collective per layer),
  then local flash with a global ``q_offset``.  Simple; full-KV memory.
* ``ring_flash_attention`` — KV chunks circulate via ``ppermute`` while
  each step's partial attention merges through log-sum-exp; peak memory is
  one chunk per chip and communication overlaps compute (ICI-native).

Both are differentiable — ``sp_flash_attention`` through the flash kernel's
custom VJP + the all-gather transpose, ``ring_flash_attention`` through an
explicit second-ring backward (see ``_ring_vjp_bwd``) — so the long-context
mode covers TRAINING, not just serving.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sp_flash_attention(
    q: jnp.ndarray,  # (B, S, Hq, D), S sharded over ``axis``
    k: jnp.ndarray,  # (B, S, Hkv, D), S sharded over ``axis``
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S), S sharded
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Sequence-sharded flash attention; returns (B, S, Hq, D) S-sharded.

    Inside the shard_map each chip holds S/N local rows; K/V (and the
    padding mask) are all-gathered over ICI, and the flash kernel receives
    ``q_offset = axis_index * S/N`` so the causal triangle is global.
    """
    from jax import shard_map

    from ..ops.flash_attention import flash_attention

    n = mesh.shape[axis]
    S = q.shape[1]
    assert S % n == 0, f"seq {S} not divisible by {axis}={n}"
    local = S // n

    def body(q_l, k_l, v_l, mask_l):
        idx = jax.lax.axis_index(axis)
        k_full = jax.lax.all_gather(k_l, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_l, axis, axis=1, tiled=True)
        mask_full = (
            jax.lax.all_gather(mask_l, axis, axis=1, tiled=True)
            if mask_l is not None else None
        )
        return flash_attention(
            q_l, k_full, v_full, attention_mask=mask_full, causal=causal,
            scale=scale, q_offset=(idx * local).astype(jnp.int32),
        )

    seq_spec = P(None, axis, None, None)
    if attention_mask is None:
        fn = shard_map(
            lambda q_l, k_l, v_l: body(q_l, k_l, v_l, None),
            mesh=mesh, in_specs=(seq_spec, seq_spec, seq_spec),
            out_specs=seq_spec, check_vma=False,
        )
        return fn(q, k, v)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(None, axis)),
        out_specs=seq_spec, check_vma=False,
    )
    return fn(q, k, v, attention_mask)


def ring_flash_attention(
    q: jnp.ndarray,  # (B, S, Hq, D), S sharded over ``axis``
    k: jnp.ndarray,  # (B, S, Hkv, D), S sharded over ``axis``
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S), S sharded
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Ring attention: KV chunks circulate over ICI via ``ppermute`` while
    each chip attends its local queries — peak memory is ONE kv chunk per
    chip (vs the full KV in ``sp_flash_attention``), and communication
    overlaps compute (ICI-native).

    Per ring step the local flash kernel runs with a *relative* causal
    offset (global_q_offset - kv_chunk_offset reduces global causality to
    the kernel's local coordinates); per-chunk (out, lse) pairs combine with
    the standard log-sum-exp merge.  Fully-masked steps contribute weight 0
    (DEAD_LSE sentinel).

    Differentiable (the long-context TRAINING path, VERDICT r4 next-5): the
    custom backward is a second ring pass — with the merged GLOBAL lse in
    hand, each chunk step's ``p = exp(s - lse)`` is already globally
    normalized, so the standard flash backward kernels (``_bwd_impl``)
    apply per chunk: dQ accumulates locally over visiting chunks, while
    each chunk's (dK, dV) partials ride the ring WITH the chunk and arrive
    home after n hops holding every shard's contribution.
    """
    from jax import shard_map

    n = mesh.shape[axis]
    S = q.shape[1]
    assert S % n == 0, f"seq {S} not divisible by {axis}={n}"
    local = S // n

    def body(q_l, k_l, v_l, mask_l):
        if mask_l is None:
            mask_l = jnp.ones((q_l.shape[0], q_l.shape[1]), jnp.int32)
        return _ring_local(q_l, k_l, v_l, mask_l, axis, n, local, causal,
                           scale)

    seq_spec = P(None, axis, None, None)
    if attention_mask is None:
        fn = shard_map(
            lambda q_l, k_l, v_l: body(q_l, k_l, v_l, None),
            mesh=mesh, in_specs=(seq_spec, seq_spec, seq_spec),
            out_specs=seq_spec, check_vma=False,
        )
        return fn(q, k, v)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(None, axis)),
        out_specs=seq_spec, check_vma=False,
    )
    return fn(q, k, v, attention_mask)


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]  # send chunk to the right


def _ring_fwd_scan(q_l, k_l, v_l, mask_l, axis, n, local, causal, scale):
    """The forward ring; returns (out (B,Lq,Hq,D), global lse (B,Lq,Hq))."""
    from ..ops.flash_attention import DEAD_LSE, flash_attention_with_lse

    my = jax.lax.axis_index(axis)
    B, Lq = q_l.shape[0], q_l.shape[1]
    Hq, D = q_l.shape[2], q_l.shape[3]
    perm = _ring_perm(n)

    def step(carry, s):
        k_c, v_c, m_c, acc, m_run, l_run = carry
        # The chunk currently held started life on shard (my - s) mod n.
        src = (my - s) % n
        rel_off = (my * local - src * local).astype(jnp.int32)
        out_c, lse_c = flash_attention_with_lse(
            q_l, k_c, v_c,
            attention_mask=m_c, causal=causal, scale=scale,
            q_offset=rel_off, interpret=jax.default_backend() != "tpu",
        )
        # lse_c: (B, Hq, 8, Lq_pad) -> (B, Lq, Hq)
        lse_c = jnp.transpose(lse_c[:, :, 0, :Lq], (0, 2, 1))
        lse_c = jnp.where(lse_c >= DEAD_LSE * 0.5, -jnp.inf, lse_c)
        m_new = jnp.maximum(m_run, lse_c)
        # guard exp(-inf - -inf)
        safe = lambda a, b: jnp.where(  # noqa: E731
            jnp.isneginf(a) & jnp.isneginf(b), 0.0, jnp.exp(a - b))
        alpha = safe(m_run, m_new)
        beta = safe(lse_c, m_new)
        acc = acc * alpha[..., None] + out_c.astype(jnp.float32) \
            * beta[..., None]
        l_run = l_run * alpha + beta
        # rotate kv (and its mask) around the ring
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        m_c = jax.lax.ppermute(m_c, axis, perm)
        return (k_c, v_c, m_c, acc, m_new, l_run), None

    acc0 = jnp.zeros((B, Lq, Hq, D), jnp.float32)
    m0 = jnp.full((B, Lq, Hq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, Lq, Hq), jnp.float32)
    carry = (k_l, v_l, mask_l, acc0, m0, l0)
    (_, _, _, acc, m_run, l_run), _ = jax.lax.scan(
        step, carry, jnp.arange(n))
    out = acc / jnp.where(l_run == 0.0, 1.0, l_run)[..., None]
    # Global logsumexp per local q row.  Rows with zero mass (fully-masked
    # queries) get a huge finite sentinel so the backward's exp(s - lse)
    # underflows to exactly 0 instead of NaN-ing on (-inf) - (-inf).
    lse = jnp.where(l_run > 0.0,
                    m_run + jnp.log(jnp.maximum(l_run, 1e-38)), 1e9)
    return out.astype(q_l.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _ring_local(q_l, k_l, v_l, mask_l, axis, n, local, causal, scale):
    out, _ = _ring_fwd_scan(q_l, k_l, v_l, mask_l, axis, n, local, causal,
                            scale)
    return out


def _ring_vjp_fwd(q_l, k_l, v_l, mask_l, axis, n, local, causal, scale):
    out, lse = _ring_fwd_scan(q_l, k_l, v_l, mask_l, axis, n, local, causal,
                              scale)
    return out, (q_l, k_l, v_l, mask_l, out, lse)


def _ring_vjp_bwd(axis, n, local, causal, scale, res, g):
    from ..ops.flash_attention import _bwd_impl

    q_l, k_l, v_l, mask_l, out, lse = res
    my = jax.lax.axis_index(axis)
    perm = _ring_perm(n)
    interpret = jax.default_backend() != "tpu"
    lse_k = jnp.transpose(lse, (0, 2, 1))  # kernel-natural (B, Hq, Lq)

    def step(carry, s):
        k_c, v_c, m_c, dk_c, dv_c, dq_acc = carry
        src = (my - s) % n
        rel_off = (my * local - src * local).astype(jnp.int32)
        dq_p, dk_p, dv_p = _bwd_impl(
            q_l, k_c, v_c, m_c, rel_off, out, lse_k, g, causal, scale,
            None, None, interpret)
        dq_acc = dq_acc + dq_p.astype(jnp.float32)
        dk_c = dk_c + dk_p.astype(jnp.float32)
        dv_c = dv_c + dv_p.astype(jnp.float32)
        # The chunk and ITS gradient partials rotate together; after n
        # hops both are back on the owner with every shard's contribution.
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        m_c = jax.lax.ppermute(m_c, axis, perm)
        dk_c = jax.lax.ppermute(dk_c, axis, perm)
        dv_c = jax.lax.ppermute(dv_c, axis, perm)
        return (k_c, v_c, m_c, dk_c, dv_c, dq_acc), None

    carry = (k_l, v_l, mask_l,
             jnp.zeros(k_l.shape, jnp.float32),
             jnp.zeros(v_l.shape, jnp.float32),
             jnp.zeros(q_l.shape, jnp.float32))
    (_, _, _, dk, dv, dq), _ = jax.lax.scan(step, carry, jnp.arange(n))
    return (dq.astype(q_l.dtype), dk.astype(k_l.dtype),
            dv.astype(v_l.dtype), None)


_ring_local.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def shard_sequence(x: jnp.ndarray, mesh: Mesh, axis: str = "data",
                   dim: int = 1):
    """Place an array with dimension ``dim`` sharded over ``axis``."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))

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
"""

from __future__ import annotations

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
    overlaps compute.

    Per ring step the local flash kernel runs with a *relative* causal
    offset (global_q_offset - kv_chunk_offset reduces global causality to
    the kernel's local coordinates); per-chunk (out, lse) pairs combine with
    the standard log-sum-exp merge.  Fully-masked steps contribute weight 0
    (DEAD_LSE sentinel).
    """
    from jax import shard_map

    from ..ops.flash_attention import DEAD_LSE, flash_attention_with_lse

    n = mesh.shape[axis]
    S = q.shape[1]
    assert S % n == 0, f"seq {S} not divisible by {axis}={n}"
    local = S // n
    perm = [(i, (i + 1) % n) for i in range(n)]  # send chunk to the right

    def body(q_l, k_l, v_l, mask_l):
        my = jax.lax.axis_index(axis)
        B, Lq = q_l.shape[0], q_l.shape[1]
        Hq, D = q_l.shape[2], q_l.shape[3]

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
        m_c0 = mask_l if mask_l is not None else jnp.ones((B, Lq), jnp.int32)
        carry = (k_l, v_l, m_c0, acc0, m0, l0)
        (_, _, _, acc, _, l_run), _ = jax.lax.scan(
            step, carry, jnp.arange(n))
        out = acc / jnp.where(l_run == 0.0, 1.0, l_run)[..., None]
        return out.astype(q_l.dtype)

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


def shard_sequence(x: jnp.ndarray, mesh: Mesh, axis: str = "data",
                   dim: int = 1):
    """Place an array with dimension ``dim`` sharded over ``axis``."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))

"""Sequence parallelism for long-video attention.

The reference caps sequences at 3,072 tokens (SURVEY.md §5 long-context
row); the TPU build's high-res configs reach ~40-100k tokens (16-32 frames x
max_num=12 tiles), where a single chip's attention time dominates.  This
module shards the QUERY sequence across the mesh: each chip all-gathers K/V
(one ICI collective per layer) and runs the Pallas flash kernel on its local
query shard with a global ``q_offset`` so causal masking stays exact.

Memory per chip: full K/V (S x Hkv x D, e.g. 53k x 8 x 128 bf16 = 108 MB)
plus 1/N of everything query-sized — the standard "all-gather KV" sequence
parallelism (ring attention would stream KV chunks instead; future work).
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
    from jax.experimental.shard_map import shard_map

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
            out_specs=seq_spec, check_rep=False,
        )
        return fn(q, k, v)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(None, axis)),
        out_specs=seq_spec, check_rep=False,
    )
    return fn(q, k, v, attention_mask)


def shard_sequence(x: jnp.ndarray, mesh: Mesh, axis: str = "data",
                   dim: int = 1):
    """Place an array with dimension ``dim`` sharded over ``axis``."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))

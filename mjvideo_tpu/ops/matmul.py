"""Matmul helpers with explicit precision discipline.

All model matmuls route through these so the precision policy lives in one
place:

* ``preferred_element_type=float32`` — accumulate on the MXU in fp32 even for
  bf16 inputs (TPU-native mixed precision, matching the reference's fp32
  softmax/norm upcasts).
* ``precision=HIGHEST`` — for fp32 inputs this prevents XLA from silently
  truncating operands to bf16 (the JAX default on TPU *and* CPU); for bf16
  inputs it is a no-op, so the bf16 hot path keeps full MXU throughput.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def dot(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """x @ kernel with fp32 accumulation, result cast back to x.dtype."""
    return jnp.dot(
        x, kernel, precision=_HI, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def dot_f32(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """x @ kernel with fp32 accumulation, result kept in fp32."""
    return jnp.dot(x, kernel, precision=_HI, preferred_element_type=jnp.float32)


def einsum(spec: str, *args, out_dtype=None) -> jnp.ndarray:
    """einsum with fp32 accumulation; ``out_dtype`` defaults to fp32."""
    out = jnp.einsum(
        spec, *args, precision=_HI, preferred_element_type=jnp.float32
    )
    return out if out_dtype is None else out.astype(out_dtype)

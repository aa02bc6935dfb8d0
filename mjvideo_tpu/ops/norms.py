"""Normalization ops with fp32 accumulation.

Replaces the reference's ``InternRMSNorm``/apex FusedRMSNorm
(``modeling_intern_vit.py:99-124``) and ``InternLM2RMSNorm``
(``modeling_internlm2.py:129-143``).  On TPU, XLA fuses these elementwise
chains into neighbouring ops; a Pallas kernel buys nothing here, so these stay
plain jnp with the same upcast discipline as the reference (compute variance in
fp32, multiply weight in input dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with fp32 variance accumulation.

    Matches ``modeling_internlm2.py:138-143``: upcast to fp32, normalize,
    downcast, then scale by weight.
    """
    input_dtype = x.dtype
    xf = x.astype(jnp.float32)
    variance = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(variance + eps)
    return (weight * xf.astype(input_dtype)).astype(input_dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """LayerNorm with fp32 statistics (torch ``nn.LayerNorm`` semantics)."""
    input_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        input_dtype
    )

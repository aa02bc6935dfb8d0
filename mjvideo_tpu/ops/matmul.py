"""Matmul helpers with explicit precision discipline.

All model matmuls route through these so the precision policy lives in one
place:

* ``preferred_element_type=float32`` — accumulate on the MXU in fp32 even for
  bf16 inputs (TPU-native mixed precision, matching the reference's fp32
  softmax/norm upcasts).
* precision is dtype-dependent: fp32 operands get ``HIGHEST`` (prevents XLA
  from silently truncating them to bf16 — the default on TPU *and* CPU);
  bf16 operands get ``DEFAULT`` — requesting fp32 contract precision for
  bf16 inputs makes XLA/Mosaic emulate multi-pass fp32 matmuls (Mosaic
  outright rejects it in Pallas), destroying MXU throughput for zero
  accuracy gain (bf16 MXU passes already accumulate in fp32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
_DEF = jax.lax.Precision.DEFAULT


def _prec(*args):
    return _HI if all(a.dtype == jnp.float32 for a in args) else _DEF


def dot(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """x @ kernel with fp32 accumulation, result cast back to x.dtype.

    ``kernel`` may be a plain array, an ``ops.quant.QuantKernel`` (w8a8
    serving mode), a ``WOQuantKernel`` (weight-only w8a16 for the
    decode-bound regime) or an ``ops.lora.LoraKernel`` (frozen base +
    trainable low-rank delta; its base recurses here, so QLoRA
    compositions work); every model family routes its dense matmuls
    here, so the dispatch covers them all."""
    from .quant import (OutlierQuantKernel, QuantKernel, WOQuantKernel,
                        dot_q8, dot_q8_ol, dot_wo)

    if isinstance(kernel, OutlierQuantKernel):
        return dot_q8_ol(x, kernel)
    if isinstance(kernel, QuantKernel):
        return dot_q8(x, kernel)
    if isinstance(kernel, WOQuantKernel):
        return dot_wo(x, kernel)
    from .lora import LoraKernel, dot_lora

    if isinstance(kernel, LoraKernel):
        return dot_lora(x, kernel)
    from .quant4 import Q4Kernel, dot_q4

    if isinstance(kernel, Q4Kernel):
        return dot_q4(x, kernel)
    return jnp.dot(
        x, kernel, precision=_prec(x, kernel),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def dot_f32(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """x @ kernel with fp32 accumulation, result kept in fp32."""
    from .quant import (OutlierQuantKernel, QuantKernel, WOQuantKernel,
                        dot_q8_f32, dot_q8_ol_f32, dot_wo_f32)

    if isinstance(kernel, OutlierQuantKernel):
        return dot_q8_ol_f32(x, kernel)
    if isinstance(kernel, QuantKernel):
        return dot_q8_f32(x, kernel)
    if isinstance(kernel, WOQuantKernel):
        return dot_wo_f32(x, kernel)
    from .lora import LoraKernel, dot_lora_f32

    if isinstance(kernel, LoraKernel):
        return dot_lora_f32(x, kernel)
    from .quant4 import Q4Kernel, dot_q4_f32

    if isinstance(kernel, Q4Kernel):
        return dot_q4_f32(x, kernel)
    return jnp.dot(
        x, kernel, precision=_prec(x, kernel),
        preferred_element_type=jnp.float32,
    )


def einsum(spec: str, *args, out_dtype=None) -> jnp.ndarray:
    """einsum with fp32 accumulation; ``out_dtype`` defaults to fp32."""
    out = jnp.einsum(
        spec, *args, precision=_prec(*args),
        preferred_element_type=jnp.float32,
    )
    return out if out_dtype is None else out.astype(out_dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with a dtype-driven approximation policy.

    fp32 uses the exact erf formulation (torch ``nn.GELU()`` default, what
    the reference's ViT/projector compute — ``modeling_intern_vit.py``
    ``act_layer=nn.GELU``); bf16 uses the tanh approximation: its max
    absolute error (~3e-4) is below bf16's representation step at
    activation scale, while the erf polynomial epilogue measurably stalls
    the fc1 matmul fusion on v5e (102 vs 180+ TF/s; tanh is free —
    docs/PERF.md round 3).  Numerically this keeps bf16 outputs within
    rounding noise of the exact-erf bf16 path.
    """
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)

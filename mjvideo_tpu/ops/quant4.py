"""int4 weight-only quantization with group scales (w4a16 serving mode).

Why int4 exists here: the reference's largest LOCAL judge is
InternVL2-26B (``eval_overall_internvl2_26b.py``, served via ms-swift
``device_map='auto'`` across A100s).  At 25.5B parameters the bf16 tree
is ~51 GB and even int8 weights (~25.5 GB) exceed a v5e chip's 16 GB
HBM — single-chip serving needs 4 bits.  Group-wise scales (default 128
weights per scale along the contraction axis) bound each weight's
rounding error by its group's amax rather than the whole column's,
the standard accuracy recipe at this bit width.

Storage layout — the "half-split" nibble pack (no row interleave):

    original kernel w: (..., K, N)
    packed:           (..., K/2, N) int8
        low  nibble of packed[k] = w[k]          (rows [0, K/2))
        high nibble of packed[k] = w[K/2 + k]    (rows [K/2, K))
    scale:            (..., K/g, N)  (per-group, per-output-column)

Because each nibble plane is a CONTIGUOUS half of the original rows,
dequantization needs no interleaving shuffle:

    x @ w  ==  x[:, :K/2] @ deq(lo)  +  x[:, K/2:] @ deq(hi)

which maps onto two MXU matmuls against VMEM-dequantized tiles.  Values
are symmetric int4 in [-8, 7] stored biased (+8) as unsigned nibbles.

Compute path: dequantize-then-matmul at the activation dtype (weight-
only, like ``quant.WOQuantKernel``): no activation rounding, gradients
w.r.t. activations flow (``score_fn`` accepts int4-wo trees).  The XLA
path materializes the dequantized halves per call — fine for prefill
(amortized over thousands of rows); a Pallas kernel that dequantizes
tile-by-tile in VMEM (``MJV_Q4_PALLAS=1``, off by default until
benchmarked on chip) is the decode-regime fast path.
"""

from __future__ import annotations

import functools
import os
import re
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class Q4Kernel:
    """Half-split packed int4 kernel + group scales.

    ``packed``: (..., K/2, N) int8 — two biased nibbles per byte (see
    module docstring).  ``scale``: (..., K/g, N) such that group j of
    the original rows dequantizes as ``nibble * scale[j]``.  The group
    size is recoverable from shapes: ``g = 2*packed.shape[-2] //
    scale.shape[-2]``.  Field names are unique in the package so
    checkpoint restore can revive the wrapper from keys alone."""

    packed: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        s = self.packed.shape
        return (*s[:-2], 2 * s[-2], s[-1])

    @property
    def ndim(self):
        return self.packed.ndim

    @property
    def dtype(self):
        return self.scale.dtype


def _group_size(k4: Q4Kernel) -> int:
    return 2 * k4.packed.shape[-2] // k4.scale.shape[-2]


def quantize_kernel_q4(w: jnp.ndarray, group_size: int = 128,
                       scale_dtype=jnp.bfloat16) -> Q4Kernel:
    """Symmetric group-wise int4 quantization of a dense kernel.

    ``w``: (..., K, N) with K % (2*group_size) == 0 (callers guard).
    Scale = group amax / 7; values clipped to [-8, 7]; int4 magnitudes
    are exactly representable in bf16, so bf16 scales only add scale-
    rounding (~0.4% rel), negligible under int4's own step size.
    """
    K = w.shape[-2]
    g = group_size
    assert K % (2 * g) == 0, (K, g)
    w32 = jnp.asarray(w, jnp.float32)
    grouped = w32.reshape(*w.shape[:-2], K // g, g, w.shape[-1])
    amax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-10)
    # biased nibbles in uint8 (NOT int32 — at 20B-scale stacked leaves an
    # int32 intermediate is a ~19GB host transient); the +8 bias keeps
    # every value in [0, 15], and the shifted OR stays within uint8
    q = jnp.clip(jnp.round(grouped / scale) + 8.0, 0, 15).astype(jnp.uint8)
    q = q.reshape(*w.shape[:-2], K, w.shape[-1])
    lo, hi = q[..., : K // 2, :], q[..., K // 2:, :]
    packed = jax.lax.bitcast_convert_type(lo | (hi << 4), jnp.int8)
    scale = scale.reshape(*w.shape[:-2], K // g, w.shape[-1])
    return Q4Kernel(packed=packed, scale=scale.astype(scale_dtype))


def _unpack_nibbles(packed: jnp.ndarray):
    """packed int8 -> (lo, hi) int32 values in [-8, 7]."""
    b = packed.astype(jnp.int32) & 0xFF
    lo = (b & 0xF) - 8
    hi = ((b >> 4) & 0xF) - 8
    return lo, hi


def _deq_halves(k4: Q4Kernel, dtype):
    """Dequantize both nibble planes to (..., K/2, N) arrays of ``dtype``."""
    g = _group_size(k4)
    lo, hi = _unpack_nibbles(k4.packed)
    K2 = k4.packed.shape[-2]
    lead = k4.packed.shape[:-2]
    n = k4.packed.shape[-1]
    s = k4.scale.astype(jnp.float32)
    s_lo = s[..., : K2 // g, :]
    s_hi = s[..., K2 // g:, :]

    def deq(vals, sc):
        v = vals.reshape(*lead, K2 // g, g, n).astype(jnp.float32)
        return (v * sc[..., :, None, :]).reshape(*lead, K2, n).astype(dtype)

    return deq(lo, s_lo), deq(hi, s_hi)


def dequantize_kernel_q4(k4: Q4Kernel, dtype=jnp.float32) -> jnp.ndarray:
    w_lo, w_hi = _deq_halves(k4, dtype)
    return jnp.concatenate([w_lo, w_hi], axis=-2)


def dot_q4_f32(x: jnp.ndarray, kernel: Q4Kernel) -> jnp.ndarray:
    """x @ dequant(kernel), fp32 accumulation.

    XLA path: materializes the two dequantized halves at x.dtype per
    call — right for prefill-shaped x (cost amortized over many rows).
    With ``MJV_Q4_PALLAS=1`` and a 2D x of few rows on TPU, routes to
    the tile-dequantizing Pallas kernel instead (decode GEMV regime).
    """
    assert kernel.packed.ndim == 2, (
        f"dot_q4 expects a per-layer kernel, got {kernel.packed.shape}")
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if (os.environ.get("MJV_Q4_PALLAS") == "1" and rows <= 32
            and jax.default_backend() == "tpu"):
        # decode-shaped activations, e.g. (B, 1, K) cached-decode steps:
        # flatten the leading dims for the GEMV kernel
        out = _w4_matmul_pallas(x.reshape(rows, x.shape[-1]),
                                kernel.packed, kernel.scale)
        return out.reshape(*x.shape[:-1], out.shape[-1])
    K2 = kernel.packed.shape[-2]
    w_lo, w_hi = _deq_halves(kernel, x.dtype)
    dn = (((x.ndim - 1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(x[..., :K2], w_lo, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x[..., K2:], w_hi, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    return acc


def dot_q4(x: jnp.ndarray, kernel: Q4Kernel) -> jnp.ndarray:
    return dot_q4_f32(x, kernel).astype(x.dtype)


# ------------------------------------------------------- pallas decode path

@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _w4_matmul_pallas(x, packed, scale, block_n: int = 512,
                      interpret: bool = False):
    """Decode-regime w4a16 matmul: dequantize int4 tiles in VMEM.

    Grid over N blocks; each program reads the full (M, K) activations
    (small in the decode regime), one (K/2, bn) int8 tile and its
    (K/g, bn) scales, dequantizes in VMEM and runs the two half-matmuls
    on the MXU.  HBM traffic stays at the int4 footprint — the point of
    the mode (the XLA path would write + re-read a bf16 copy of the
    weights every step).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    K2, N = packed.shape
    G = scale.shape[0]
    g = K // G
    bn = min(block_n, N)
    while N % bn:
        bn //= 2

    # Cap the per-program VMEM footprint: besides the int8 tile, the
    # kernel materializes two fp32-dequantized (K/2, bn) halves, which
    # at 26B MLP dims (K2 = 8192, bn = 512) is 32 MiB — past the v5e's
    # ~16 MiB/core VMEM.  Halving bn keeps N-divisibility (N % bn == 0
    # and bn even => N % (bn/2) == 0); floor at the 128-lane width.
    def _vmem_bytes(b):
        return (M * K * x.dtype.itemsize        # activations
                + K2 * b                        # int8 tile
                + G * b * scale.dtype.itemsize  # scales
                + 2 * K2 * b * 4)               # dequantized halves, fp32
    while bn % 2 == 0 and bn > 128 and _vmem_bytes(bn) > 12 * 2**20:
        bn //= 2

    def kern(x_ref, p_ref, s_ref, o_ref):
        xv = x_ref[...]
        b = p_ref[...].astype(jnp.int32) & 0xFF
        s = s_ref[...].astype(jnp.float32)

        def deq(vals, sc):
            v = vals.reshape(K2 // g, g, bn).astype(jnp.float32)
            return (v * sc[:, None, :]).reshape(K2, bn).astype(xv.dtype)

        w_lo = deq((b & 0xF) - 8, s[: K2 // g])
        w_hi = deq(((b >> 4) & 0xF) - 8, s[K2 // g:])
        acc = jnp.dot(xv[:, :K2], w_lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(xv[:, K2:], w_hi, preferred_element_type=jnp.float32)
        o_ref[...] = acc

    return pl.pallas_call(
        kern,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, packed, scale)


# ---------------------------------------------------------------- tree walk

def quantize_params_int4(
    params: Any,
    exclude: Optional[Sequence[str]] = None,
    min_elements: int = 1 << 16,
    group_size: int = 128,
) -> Any:
    """Replace every large dense ``.../kernel`` leaf with a Q4Kernel.

    Same selection policy as ``quant.quantize_params_int8`` (weight-only
    semantics); ``exclude=None`` means the shared default exclude list
    (an explicit empty sequence disables excludes, as in the int8 walk).
    Leaves whose K isn't divisible by 2*group_size get a smaller
    per-leaf group (halved until it fits, floor 16); if none fits, the
    leaf stays full precision.
    """
    from .quant import _EXCLUDE_DEFAULT, _kernel_leaf_eligible, _path_str

    exc = [re.compile(p) for p in
           (_EXCLUDE_DEFAULT if exclude is None else exclude)]

    def one(path, leaf):
        if not _kernel_leaf_eligible(_path_str(path), leaf, exc,
                                     min_elements):
            return leaf
        K = leaf.shape[-2]
        g = group_size
        while g >= 16 and K % (2 * g):
            g //= 2
        if g < 16:
            return leaf
        return quantize_kernel_q4(leaf, group_size=g)

    return jax.tree_util.tree_map_with_path(one, params)

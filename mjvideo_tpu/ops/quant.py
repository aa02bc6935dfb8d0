"""Serving quantization: int8 kernel wrappers + the named-mode registry.

The reference has no quantized inference at all — its torch stack serves
bf16 (``eval_genai_mjvideo.py``) — so everything here is capability on
top of parity, strictly opt-in (``RewardScorer(quant=...)``).  Modes
(``quantize_params_mode``; error ladder + A/Bs in docs/PERF.md round 3):

* ``"int8"`` — w8a8: int8 weights + dynamic per-row activation
  quantization, matmuls int8 x int8 -> int32 on the v5e MXU's
  double-rate path (~394 TOPS vs ~197 TFLOPS bf16; measured 1.4-1.9x at
  this model's dense shapes).  Max prefill throughput.
* ``"int8-vit"`` — w8a8 on the vision towers only (the accuracy-safe
  subset: the decoder carries ~94-97% of full-int8's perturbation).
* ``"int8-wo"`` — weight-only w8a16 (``WOQuantKernel``): int8 storage,
  activation-dtype compute.  For the decode-bound regime (halves
  per-step weight HBM with no per-step quantize ops) and the only int8
  mode whose activations stay differentiable.
* ``"int4-wo"`` — weight-only int4 with group scales (``quant4.py``):
  capacity mode — fits 26B-class judges on one 16GB chip.

int8 modes compose with suffixes (round-5 additions; measured
trade-offs in docs/PERF.md round 5):

* ``-noattn`` — decoder attention projections stay full precision;
* ``-gN`` — group-N contraction scales for weights AND activations,
  computed by the fused grouped Pallas matmul
  (``_q8g_matmul_pallas_fused``).  ``int8-noattn-g128`` is the
  tightest-parity w8a8 tree (score delta 0.0068 at full 2B dims) but
  SLOWER than per-column int8 (the per-group dequant epilogue is O(G)
  VPU work) — it exists for HBM-bound deployments, not throughput;
* ``-olN`` — runtime activation-outlier decomposition
  (``OutlierQuantKernel``): keeps the single double-rate int8 matmul,
  routes the N hottest activation channels through full precision.
  For trained checkpoints with emergent outlier channels.

Scheme (standard w8a8, no calibration pass needed):

* weights: per-output-channel symmetric int8 — each output column keeps
  an fp32 scale, error bounded by the column's amax;
* activations: dynamic per-row symmetric int8 computed in-graph (one
  fused amax + scale + round per matmul input);
* accumulation: int32 on the MXU, dequantized by ``a_scale * w_scale``
  in the epilogue, cast back to the activation dtype.

Everything stays inside the jit graph: no calibration, no host sync.
Attention (Pallas flash kernels), norms, embeddings, rotary and the small
reward heads remain bf16/fp32 — quantization covers only the large dense
kernels, which is where the FLOPs are (>70% of the forward, docs/PERF.md
HLO audit).

``QuantKernel`` is a registered pytree node, so quantized trees flow
through ``jax.lax.scan`` (stacked layers slice per-step), ``jit``,
donation, and ``parallel.mesh.shard_params`` unchanged: the TP rules
match parameter paths by regex and ``.../kernel/q`` inherits the
column/row spec of ``.../kernel``; the (…, 1, N) scale falls back to
replicated via the divisibility guard.
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class QuantKernel:
    """int8 kernel + fp32 per-output-channel (or group-wise) scale.

    ``q``: (..., K, N) int8;  ``scale``: (..., G, N) fp32 such that row
    group ``j`` dequantizes as ``q[j*g:(j+1)*g] * scale[j]`` with
    ``g = K / G``.  ``G == 1`` is the per-output-channel default; ``G > 1``
    (``quantize_kernel(group_size=...)``) bounds each weight's rounding
    error by its GROUP's amax along the contraction axis — the int4
    recipe (``quant4.py``) applied at 8 bits (VERDICT r4 item 2).
    Leading axes (if any) are layer stacking.
    """

    q: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        # The *logical* dtype: what dequantization produces.
        return self.scale.dtype


@jax.tree_util.register_dataclass
@dataclass
class WOQuantKernel:
    """Weight-ONLY int8 kernel (w8a16): int8 storage, bf16/fp32 compute.

    Same quantization as ``QuantKernel`` but the matmul runs at the
    activation dtype — ``(x @ qw) * scale`` is exact w.r.t. dequantizing
    first because ``scale`` is per-output-column, so it factors out of
    the contraction.  No dynamic activation quantization: zero per-step
    overhead and no activation rounding error, at the cost of the MXU's
    double-rate int8 path.  The point is the DECODE regime: cached
    generation is weight-HBM-bound (each step reads every kernel once
    for a handful of rows), so halving weight bytes halves the step's
    memory traffic where w8a8's extra per-step quantize ops made it a
    net loss (docs/PERF.md round-3 judge A/B).

    ``qw``: (..., K, N) int8;  ``scale``: (..., 1, N).  The field is
    named ``qw`` (not ``q``) so checkpoint restore can revive the right
    wrapper from key names alone (utils/checkpoint.py).
    """

    qw: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.qw.shape

    @property
    def ndim(self):
        return self.qw.ndim

    @property
    def dtype(self):
        return self.scale.dtype


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("q", "scale"), meta_fields=("n_outliers",))
@dataclass
class OutlierQuantKernel:
    """Per-column int8 kernel with RUNTIME activation-outlier
    decomposition (the LLM.int8() scheme, TPU-adapted).

    Storage is identical to the per-column ``QuantKernel`` (``q`` int8
    (..., K, N), ``scale`` (..., 1, N)); the difference is the dot: at
    each call the ``n_outliers`` activation CHANNELS with the largest
    column amax route through a small full-precision matmul (their
    weight rows dequantize on the fly — no extra storage), and are
    zeroed out of the int8 path.  One outlier channel otherwise inflates
    every row's per-row activation scale, which is the dominant w8a8
    error source this package measured (per-group activation scales cut
    rewards_rel 0.117 -> 0.086 at full dims); the decomposition buys the
    same effect while keeping ONE full-depth double-rate int8 MXU matmul
    (the grouped kernel's O(G) VPU dequant epilogue made it slower than
    bf16 -- docs/PERF.md round 5).  Everything is static-shaped: top_k
    count is fixed, gathers/scatter are in-graph, no host sync.
    """

    q: jnp.ndarray
    scale: jnp.ndarray
    n_outliers: int = 32

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        return self.scale.dtype


def dot_q8_ol_f32(x: jnp.ndarray, kernel: OutlierQuantKernel) -> jnp.ndarray:
    """x @ dequant(kernel) with the top-``n_outliers`` activation
    channels (by column amax over the batch) in full precision."""
    assert kernel.q.ndim == 2, (
        f"dot_q8_ol expects a per-layer (K, N) kernel, got {kernel.q.shape}")
    K = kernel.q.shape[0]
    k_out = min(kernel.n_outliers, K)
    lead = x.shape[:-1]
    x32 = x.reshape(-1, K).astype(jnp.float32)
    colmax = jnp.max(jnp.abs(x32), axis=0)  # (K,)
    _, idx = jax.lax.top_k(colmax, k_out)
    x_out = jnp.take(x32, idx, axis=1)  # (M, k_out)
    w_out = (jnp.take(kernel.q, idx, axis=0).astype(jnp.float32)
             * kernel.scale)  # (k_out, N)
    # zero the outlier channels out of the int8 path so the per-row
    # scale is set by the INLIER amax
    mask = jnp.zeros((K,), x32.dtype).at[idx].set(1.0)
    xq, a_scale = _quantize_rows(x32 * (1.0 - mask))
    acc = jax.lax.dot_general(
        xq, kernel.q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * a_scale * kernel.scale.reshape(1, -1)
    acc = acc + jnp.dot(x_out, w_out, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    return acc.reshape(*lead, kernel.q.shape[1])


def quantize_kernel(w: jnp.ndarray, dtype=jnp.float32,
                    group_size: Optional[int] = None) -> QuantKernel:
    """Per-output-channel symmetric int8 quantization of a dense kernel.

    ``w``: (..., K, N) — the last axis is the output dimension (the
    convention of every ``.../kernel`` in this package: ``dot(x, kernel)``
    contracts x's last axis with the kernel's second-to-last).

    ``group_size`` (divides K): one scale per ``group_size`` contraction
    rows per output column instead of one per column, so a single
    large-magnitude weight only inflates its own group's rounding step.
    """
    w32 = jnp.asarray(w, jnp.float32)
    K = w32.shape[-2]
    if group_size is not None and group_size < K:
        assert K % group_size == 0, (K, group_size)
        G = K // group_size
        lead = w32.shape[:-2]
        grouped = w32.reshape(*lead, G, group_size, w32.shape[-1])
        amax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(grouped / scale), -127, 127)
        q = q.reshape(*lead, K, w32.shape[-1]).astype(jnp.int8)
        scale = scale.reshape(*lead, G, w32.shape[-1])
        return QuantKernel(q=q, scale=scale.astype(dtype))
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)  # (..., 1, N)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QuantKernel(q=q, scale=scale.astype(dtype))


def dequantize_kernel(k: QuantKernel, dtype=jnp.float32) -> jnp.ndarray:
    G = k.scale.shape[-2]
    if G > 1:
        lead = k.q.shape[:-2]
        K, N = k.q.shape[-2:]
        grouped = k.q.reshape(*lead, G, K // G, N).astype(jnp.float32)
        w = grouped * k.scale[..., :, None, :].astype(jnp.float32)
        return w.reshape(*lead, K, N).astype(dtype)
    return (k.q.astype(jnp.float32) * k.scale).astype(dtype)


def _quantize_rows(x32: jnp.ndarray):
    """Dynamic per-row symmetric int8: x32 (..., K) fp32."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
    return xq, a_scale


def dot_q8_f32(x: jnp.ndarray, kernel: QuantKernel) -> jnp.ndarray:
    """x @ dequant(kernel) computed as int8 x int8 -> int32 on the MXU,
    dequantized in fp32.  ``x``: (..., K); kernel.q: (K, N) (per-layer
    slice — stacked kernels are sliced by scan before reaching a dot).

    Group-scaled kernels (scale (G, N), G > 1) route to the grouped
    path: activations quantize per (row, group) and each group's int32
    partial is dequantized by its own ``a_scale * w_scale`` before the
    cross-group sum — both rounding errors bounded group-locally."""
    assert kernel.q.ndim == 2, (
        f"dot_q8 expects a per-layer (K, N) kernel, got {kernel.q.shape}")
    if kernel.scale.shape[-2] > 1:
        return _dot_q8_grouped(x, kernel, jnp.float32)
    xq, a_scale = _quantize_rows(x.astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, kernel.q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * a_scale * kernel.scale.reshape(1, -1)


def _quantize_rows_grouped(x32: jnp.ndarray, G: int, g: int):
    """Per-(row, group) symmetric int8: x32 (M, K) fp32, K = G*g.

    Returns (xq int8 (M, K), a_scale fp32 (M, G)).  One outlier
    activation only coarsens its own group's rounding step — the
    activation-side mirror of group-wise weight scales."""
    M = x32.shape[0]
    xg = x32.reshape(M, G, g)
    amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xg / a_scale), -127, 127).astype(jnp.int8)
    return xq.reshape(M, G * g), a_scale[..., 0]


def _dot_q8_grouped(x: jnp.ndarray, kernel: QuantKernel,
                    out_dtype) -> jnp.ndarray:
    """Group-scaled w8a8: per-group int32 partials dequantized before the
    cross-group sum.  TPU runs the FUSED Pallas kernel (activations
    quantize tile-locally in VMEM, fp32 scratch accumulator, output
    written once at ``out_dtype`` — no materialized xq / fp32-output HBM
    passes); elsewhere a ``lax.scan`` over groups with the same
    per-(row, group) quantization semantics."""
    K, N = kernel.q.shape
    G = kernel.scale.shape[-2]
    g = K // G
    lead = x.shape[:-1]
    w_scale = kernel.scale.astype(jnp.float32)
    if jax.default_backend() == "tpu" and N % 128 == 0 and g % 128 == 0:
        out = _q8g_matmul_pallas_fused(
            x.reshape(-1, K), kernel.q, w_scale, out_dtype=out_dtype)
    else:
        x2 = x.reshape(-1, K).astype(jnp.float32)
        xq, a_scale = _quantize_rows_grouped(x2, G, g)
        out = _q8g_matmul_xla(xq, a_scale, kernel.q,
                              w_scale).astype(out_dtype)
    return out.reshape(*lead, N)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_m",
                                              "block_n", "interpret"))
def _q8g_matmul_pallas_fused(x, wq, w_scale, out_dtype=None,
                             block_m: int = 512, block_n: int = 2048,
                             interpret: bool = False):
    """Fused grouped w8a8 matmul: quantize-in-kernel, scaled int8 MXU
    dots, one output write at x.dtype.

    Per grid step (i, j, k) the kernel holds a (bm, g) activation tile;
    the per-(row, group) amax is TILE-LOCAL (the group IS the tile's
    contraction extent), so dynamic activation quantization runs in VMEM
    with no materialized int8 copy or scale tensor in HBM.  The int32
    MXU partial dequantizes by ``a_scale * w_scale[group]`` into an fp32
    VMEM scratch accumulator; the output block writes ONCE, already cast
    to x.dtype, on the last group step.  vs the unfused variant this
    saves three full HBM passes (xq write+read, fp32 out write+read) —
    on v5e those passes cost more than the matmul itself at decoder
    shapes.  Blocks default large (bm=512, bn=2048) to cut operand
    re-reads: W re-reads ceil(M/bm) times, x re-reads N/bn times.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    G, N = w_scale.shape
    g = K // G
    if out_dtype is None:
        out_dtype = x.dtype
    bn = min(block_n, N)
    while N % bn:
        bn //= 2
    bm = min(block_m, M)
    pad_m = (-M) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    w3 = w_scale[:, None, :]  # (G, 1, N)

    def kern(x_ref, w_ref, ws_ref, o_ref, acc_ref):
        kk = pl.program_id(2)
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)  # (bm, 1)
        a_s = jnp.maximum(amax / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(xf / a_s), -127, 127).astype(jnp.int8)
        part = jax.lax.dot_general(
            xq, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * a_s * ws_ref[0]

        @pl.when(kk == 0)
        def _init():
            acc_ref[...] = part

        @pl.when(kk > 0)
        def _acc():
            acc_ref[...] += part

        @pl.when(kk == G - 1)
        def _out():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        grid=(Mp // bm, N // bn, G),
        in_specs=[
            pl.BlockSpec((bm, g), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, wq, w3)
    return out[:M] if pad_m else out


def _q8g_matmul_xla(xq, a_scale, wq, w_scale):
    """Reference/fallback grouped int8 matmul: scan over groups keeps the
    live partial at (M, N) fp32 instead of (G, M, N)."""
    M, K = xq.shape
    G, N = w_scale.shape
    g = K // G
    xg = jnp.transpose(xq.reshape(M, G, g), (1, 0, 2))  # (G, M, g)
    wg = wq.reshape(G, g, N)

    def step(acc, args):
        x_i, w_i, ws_i, as_i = args
        p = jax.lax.dot_general(
            x_i, w_i, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc + p.astype(jnp.float32) * as_i[:, None] * ws_i[None, :], None

    acc0 = jnp.zeros((M, N), jnp.float32)
    acc, _ = jax.lax.scan(
        step, acc0, (xg, wg, w_scale, jnp.transpose(a_scale, (1, 0))))
    return acc


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                              "interpret"))
def _q8g_matmul_pallas(xq, a_scale, wq, w_scale, block_m: int = 256,
                       block_n: int = 512, interpret: bool = False):
    """Grouped w8a8 matmul: int8 x int8 -> int32 per group on the MXU,
    each partial dequantized by its (row-group, col-group) scales into
    the resident fp32 output block.

    Grid (M/bm, N/bn, G) with the GROUP axis innermost ("arbitrary"):
    the (bm, bn) output block stays in VMEM across the G steps while
    depth-g int8 x/w tiles stream through double-buffered DMA (g=128 is
    exactly one MXU pass).  Scales arrive as 3-D arrays — a_scale
    (G, M, 1), w_scale (G, 1, N) — so their blocks satisfy Mosaic's
    (8, 128)-or-equal tiling rule; no lane-dim dynamic slicing.  This is
    the layout a group-scaled int8 GEMM needs and XLA cannot derive from
    a scan: the scaled accumulation never leaves VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = xq.shape
    G, N = w_scale.shape
    g = K // G
    bn = min(block_n, N)
    while N % bn:
        bn //= 2
    bm = min(block_m, M)
    pad_m = (-M) % bm
    if pad_m:
        xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        a_scale = jnp.pad(a_scale, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    a3 = jnp.transpose(a_scale, (1, 0))[:, :, None]  # (G, Mp, 1)
    w3 = w_scale[:, None, :]  # (G, 1, N)

    def kern(x_ref, as_ref, w_ref, ws_ref, o_ref):
        kk = pl.program_id(2)
        part = jax.lax.dot_general(
            x_ref[...], w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * as_ref[0] * ws_ref[0]

        @pl.when(kk == 0)
        def _init():
            o_ref[...] = part

        @pl.when(kk > 0)
        def _acc():
            o_ref[...] += part

    out = pl.pallas_call(
        kern,
        grid=(Mp // bm, N // bn, G),
        in_specs=[
            pl.BlockSpec((bm, g), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 1), lambda i, j, k: (k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, a3, wq, w3)
    return out[:M] if pad_m else out


def dot_q8_ol(x: jnp.ndarray, kernel: OutlierQuantKernel) -> jnp.ndarray:
    return dot_q8_ol_f32(x, kernel).astype(x.dtype)


def dot_q8(x: jnp.ndarray, kernel: QuantKernel) -> jnp.ndarray:
    if kernel.scale.shape[-2] > 1:
        # grouped path: the fused kernel writes the output ONCE at the
        # requested dtype — avoid a separate fp32->bf16 HBM pass
        return _dot_q8_grouped(x, kernel, x.dtype)
    return dot_q8_f32(x, kernel).astype(x.dtype)


def quantize_kv(x: jnp.ndarray):
    """Per-(token, head) symmetric int8 for KV-cache entries.

    ``x``: (..., H, D) — one scale per head vector (the last axis), the
    standard KV-cache quantization granularity: each cached key/value
    vector is rounded against its own amax, so one outlier token cannot
    inflate every other token's rounding error (which a per-head-dim or
    per-layer scale would).  Returns ``(q int8 (..., H, D),
    scale fp32 (..., H))`` with ``q * scale[..., None] ~= x``.
    """
    x32 = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray,
                  dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of :func:`quantize_kv`; the int8->fp convert + scale
    multiply sit on the attention matmul's K/V operands so XLA fuses
    them into the operand read — the cache stays int8 in HBM."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def dot_wo_f32(x: jnp.ndarray, kernel: WOQuantKernel) -> jnp.ndarray:
    """x @ dequant(kernel) at the activation dtype, fp32 accumulation.

    The int8->x.dtype convert sits on the dot's weight operand so XLA
    can fuse it into the matmul's operand read (weights stay int8 in
    HBM); the per-column scale applies in the fp32 epilogue.

    Group-scaled kernels (scale (G, N)) dequantize per group at the
    activation dtype before ONE full-depth matmul — exact w.r.t.
    dequantize-first, like the int4 path (``quant4._deq_halves``)."""
    assert kernel.qw.ndim == 2, (
        f"dot_wo expects a per-layer (K, N) kernel, got {kernel.qw.shape}")
    G = kernel.scale.shape[-2]
    dn = (((x.ndim - 1,), (0,)), ((), ()))
    if G > 1:
        K, N = kernel.qw.shape
        g = K // G
        w = (kernel.qw.reshape(G, g, N).astype(jnp.float32)
             * kernel.scale.astype(jnp.float32)[:, None, :])
        return jax.lax.dot_general(
            x, w.reshape(K, N).astype(x.dtype), dimension_numbers=dn,
            preferred_element_type=jnp.float32)
    acc = jax.lax.dot_general(
        x, kernel.qw.astype(x.dtype),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return acc * kernel.scale.astype(jnp.float32).reshape(1, -1)


def dot_wo(x: jnp.ndarray, kernel: WOQuantKernel) -> jnp.ndarray:
    return dot_wo_f32(x, kernel).astype(x.dtype)


# ---------------------------------------------------------------- tree walk

# Never quantize: embeddings are gathers (not dots); patch embedding is the
# single most accuracy-critical projection (first touch of the pixels) and
# a rounding error there propagates through all 24+48 layers.  The MiniCPM-V
# resampler's packed ``in_proj`` kernel is consumed via ``jnp.split`` (the
# torch MultiheadAttention layout), which a QuantKernel node cannot survive —
# and it runs once per video, so it buys no decode HBM anyway.
_EXCLUDE_DEFAULT = (
    r"tok_embeddings",
    r"embeddings",
    r"patch_embed",
    r"position",
    r"gating",
    r"regression",
    r"in_proj",
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _kernel_leaf_eligible(path_str: str, leaf, exc, min_elements: int) -> bool:
    """Shared selection policy for the serving-quantization tree walks
    (int8 here, int4 in ``quant4.py``): path ends in ``kernel``, no
    exclude pattern matches, ndim >= 2, and at least ``min_elements``
    elements per layer slice."""
    if not path_str.endswith("kernel") or any(r.search(path_str)
                                              for r in exc):
        return False
    if getattr(leaf, "ndim", 0) < 2:
        return False
    per_layer = leaf.size // (leaf.shape[0] if leaf.ndim == 3 else 1)
    return per_layer >= min_elements


# Vision-tower paths across the model families (InternViT "vision_model",
# Qwen2-VL "visual", MiniCPM-V "vpm", CogVLM2 "vision").  The CogVLM2 match
# is anchored to the tree root: the decoder's dual-expert MLP also has
# ``.../mlp/vision/...`` paths, and those are LLM weights that scope="vit"
# must leave full precision.
_VIT_INCLUDE = re.compile(r"vision_model|visual|vpm|^vision(/|$)")

# Decoder attention projections (InternLM2/Llama/Phi-3 naming).  The
# ``scope="noattn"`` selective mode leaves exactly these full precision:
# the round-3/4 error ladder localizes the w8a8 perturbation to decoder
# weight rounding, and the attention projections feed the softmax (where
# logit perturbations amplify through the value mixing), while the MLP
# (2/3 of decoder FLOPs) tolerates rounding.  ViT attention ("attn/qkv")
# deliberately does NOT match — quantizing the ViT is measured ~free.
_DEC_ATTN = re.compile(r"attention/(wqkv|wo|wq|wk|wv|qkv_proj|o_proj)")


def quantize_params_int8(
    params: Any,
    exclude: Sequence[str] = _EXCLUDE_DEFAULT,
    min_elements: int = 1 << 16,
    scope: str = "all",
    weight_only: bool = False,
    group_size: Optional[int] = None,
    outliers: Optional[int] = None,
    device: Any = None,
) -> Any:
    """Replace every large dense ``.../kernel`` leaf with a QuantKernel.

    Selection: leaf path ends in ``kernel``, ndim >= 2, at least
    ``min_elements`` elements per layer slice, and no ``exclude`` pattern
    matches the path.  Biases, norms, scales, embeddings and small heads
    stay as-is, so the tree's structure outside the swapped leaves — and
    therefore every forward that routes its matmuls through
    ``ops.matmul.dot`` — is unchanged.

    ``scope="vit"`` restricts quantization to the vision tower (the
    LLM and projector stay full precision).  Motivation (mid-dims error
    study, docs/PERF.md round 3): the decoder contributes ~97% of the
    w8a8 reward perturbation — mostly irreducible int8 weight-rounding —
    while the ViT quantizes essentially for free (rewards_rel 7e-4 vs
    3e-2 full), and at 8 frames/clip the ViT holds ~40% of the FLOPs.

    ``scope="noattn"`` quantizes everything EXCEPT the decoder attention
    projections (``_DEC_ATTN``) — the selective mode between int8-vit
    and full int8 the round-4 error ladder motivates.

    ``group_size`` (e.g. 128): group-wise scales along the contraction
    axis instead of per-output-channel — the int4 accuracy recipe at 8
    bits.  Group-scaled kernels route through the grouped Pallas matmul
    (``_q8g_matmul_pallas``); weight-only group kernels dequantize per
    group at the activation dtype.  Leaves whose K doesn't divide the
    group get a halved per-leaf group (floor 32) or stay per-column.

    ``device``: STREAMED on-device quantization — each leaf is
    ``device_put`` to ``device`` and quantized there by a jitted,
    buffer-donating kernel (ineligible leaves just move).  The returned
    tree lives on ``device``, ready to serve; peak device memory is the
    quantized tree + one in-flight source leaf.  This is the serving
    cold-start path for trees whose full-precision form does not fit or
    whose host quantize is prohibitive: the 8.3B VideoScore tree costs
    ~44 min of one-core host fp32 math (measured, docs/PERF.md round 5)
    vs seconds of HBM-bandwidth math on chip — the wall-clock becomes
    the bf16 upload.  Identical numerics: the same ``quantize_kernel``
    trace, just placed.
    """
    if scope not in ("all", "vit", "noattn"):
        raise ValueError(f"unknown quant scope {scope!r}")
    exc = [re.compile(p) for p in exclude]
    # donate_argnums frees each uploaded bf16 leaf the moment its int8
    # form exists, bounding in-flight device memory to one source leaf.
    quant_jit = jax.jit(
        quantize_kernel, static_argnames=("dtype", "group_size"),
        donate_argnums=(0,)) if device is not None else None

    def one(path, leaf):
        s = _path_str(path)
        eligible = (
            _kernel_leaf_eligible(s, leaf, exc, min_elements)
            and not (scope == "vit" and not _VIT_INCLUDE.search(s))
            and not (scope == "noattn" and _DEC_ATTN.search(s))
        )
        if device is not None:
            leaf = jax.device_put(leaf, device)
        if not eligible:
            return leaf
        gs = group_size
        if gs is not None:
            K = leaf.shape[-2]
            while gs >= 32 and K % gs:
                gs //= 2
            if gs < 32:
                gs = None
        qk = (quant_jit(leaf, group_size=gs) if device is not None
              else quantize_kernel(leaf, group_size=gs))
        if weight_only:
            return WOQuantKernel(qw=qk.q, scale=qk.scale)
        if outliers and gs is None:
            return OutlierQuantKernel(q=qk.q, scale=qk.scale,
                                      n_outliers=outliers)
        return qk

    return jax.tree_util.tree_map_with_path(one, params)


def quantize_params_mode(params: Any, mode: str,
                         min_elements: int = 1 << 16,
                         device: Any = None) -> Any:
    """Apply a named serving quantization mode.

    ``"int8"``: every large dense kernel, w8a8 (max prefill throughput,
    +31% measured; carries the decoder's int8 weight-rounding
    perturbation).
    ``"int8-vit"``: vision towers only, w8a8 (near-zero accuracy cost).
    ``"int8-wo"``: every large dense kernel, weight-only w8a16 (halves
    weight HBM for the decode-bound regime, no activation quantization
    error or per-step quantize ops).
    ``"int4-wo"``: weight-only int4 with group-128 scales (4x smaller
    weights — what fits InternVL2-26B-class judges on one 16GB chip;
    ``ops/quant4.py``).

    int8 modes compose with two suffixes (any order):
    ``-noattn`` — decoder attention projections stay full precision;
    ``-gN`` (e.g. ``-g128``) — group-N scales along the contraction axis
    (w8a8 kernels route through the grouped Pallas matmul).
    Examples: ``"int8-g128"``, ``"int8-noattn"``, ``"int8-noattn-g128"``,
    ``"int8-wo-g128"``.

    ``device``: streamed on-device quantization (see
    ``quantize_params_int8``) — the returned tree lives on ``device``
    with each leaf quantized there; the serving cold-start path for
    trees too large (or too slow) to quantize on host.  Not supported
    for ``int4-wo`` (its pack step is host-side).
    """
    if mode == "int4-wo":
        if device is not None:
            raise ValueError("int4-wo does not support device= streaming")
        from .quant4 import quantize_params_int4

        return quantize_params_int4(params, min_elements=min_elements)
    parts = mode.split("-")
    if parts[0] == "int8":
        scope, weight_only, group_size, outliers = "all", False, None, None
        for p in parts[1:]:
            if p == "vit":
                scope = "vit"
            elif p == "noattn":
                scope = "noattn"
            elif p == "wo":
                weight_only = True
            elif re.fullmatch(r"g\d+", p):
                group_size = int(p[1:])
            elif re.fullmatch(r"ol\d+", p):
                outliers = int(p[2:])
            else:
                raise ValueError(f"unknown int8 mode suffix {p!r} in "
                                 f"{mode!r}")
        return quantize_params_int8(
            params, min_elements=min_elements, scope=scope,
            weight_only=weight_only, group_size=group_size,
            outliers=outliers, device=device)
    raise ValueError(f"unknown quant mode {mode!r}; expected 'int8[-vit|"
                     "-noattn][-wo][-gN]' or 'int4-wo'")


def revive_quant_kernels(tree: Any) -> Any:
    """Rebuild ``QuantKernel`` nodes after a structure-less restore.

    Orbax's ``StandardCheckpointer`` serializes a registered-dataclass
    node as a plain ``{'q', 'scale'}`` dict; restoring WITHOUT a target
    tree therefore loses the type and the int8 matmul dispatch with it
    (``ops.matmul.dot`` routes on ``isinstance(..., QuantKernel)``).
    This walk re-wraps any dict of exactly those two keys whose ``q``
    (or ``qw``, the weight-only wrapper) leaf is int8 — unambiguous,
    since no model family in this package uses those parameter names.
    Caveat: an ``OutlierQuantKernel`` serializes the same data fields as
    a plain ``QuantKernel`` (``n_outliers`` is static metadata, not a
    leaf), so a structure-LESS restore revives it as a ``QuantKernel``
    (per-column int8, no decomposition) — restore with a target tree to
    keep the outlier mode."""
    def is_qk(n):
        if not isinstance(n, dict):
            return False
        keys = set(n.keys())
        if keys == {"q", "scale"}:
            return getattr(n["q"], "dtype", None) == jnp.int8
        if keys == {"qw", "scale"}:
            return getattr(n["qw"], "dtype", None) == jnp.int8
        if keys == {"packed", "scale"}:
            return getattr(n["packed"], "dtype", None) == jnp.int8
        return False

    def revive(n):
        if not is_qk(n):
            return n
        if "q" in n:
            return QuantKernel(q=n["q"], scale=n["scale"])
        if "qw" in n:
            return WOQuantKernel(qw=n["qw"], scale=n["scale"])
        from .quant4 import Q4Kernel

        return Q4Kernel(packed=n["packed"], scale=n["scale"])

    return jax.tree_util.tree_map(revive, tree, is_leaf=is_qk)


def _is_qnode(x) -> bool:
    from .quant4 import Q4Kernel

    return isinstance(x, (QuantKernel, WOQuantKernel, OutlierQuantKernel,
                          Q4Kernel))


def is_quantized(params: Any) -> bool:
    return any(_is_qnode(x)
               for x in jax.tree.leaves(params, is_leaf=_is_qnode))

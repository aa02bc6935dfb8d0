"""Pallas TPU flash attention: forward + backward, blockwise online-softmax.

Replaces the reference's CUDA flash-attn dependency
(``modeling_intern_vit.py:35-96`` packed-QKV ViT path and
``modeling_internlm2.py:430-600`` causal varlen LLM path) with TPU kernels
covering both uses:

* non-causal (ViT, seq 1025/tile) and causal (LLM, seq <= 3072; long-video
  configs reach ~40k tokens — SURVEY.md §5 long-context row),
* grouped-query attention natively (q head h reads kv head h // G via the
  BlockSpec index map — no repeat_kv materialization),
* padding via a (B, K) mask instead of flash-attn's varlen unpadding
  (SURVEY.md §2.3); fully-masked query rows emit 0.

Design notes (see /opt/skills/guides/pallas_guide.md):

* Forward grid = (B, Hq, Q_blocks, KV_blocks), kv innermost; the
  online-softmax state (m, l, acc in fp32) lives in VMEM scratch persisting
  across the kv dimension — VMEM use is independent of sequence length.
  When gradients are needed the forward also emits the log-sum-exp rows.
* Backward = two kernels (the standard flash-attention-2 split):
  - dK/dV: grid (B, Hq, KV_blocks, Q_blocks), accumulators per kv block;
    per-q-head partials are reduced over the G GQA groups outside.
  - dQ: grid (B, Hq, Q_blocks, KV_blocks), accumulator per q block.
  ``delta = rowsum(dO * O)`` is a cheap XLA elementwise reduce.
* Block sizes tuned on v5e (B4/S2112 GQA bf16): (block_q=256, block_kv=512)
  -> 4.76ms vs 8.25ms at (128,128) — fine grids cost more than padding.
* Causal programs skip compute for blocks strictly above the diagonal via
  ``pl.when``.
* Precision: fp32 operands use HIGHEST (interpret mode truncates them
  otherwise); bf16 operands use DEFAULT (Mosaic rejects fp32 contract
  precision on bf16, whose MXU passes accumulate in fp32 anyway).
* Off-TPU the kernels run in interpret mode and the backward falls back to
  the (mathematically identical) XLA einsum VJP.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEAD_LSE = 1e30  # lse sentinel for fully-masked rows: exp(s - 1e30) == 0


def _prec(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _dot(a, b, trans_a=False, trans_b=False):
    dims = (((0 if trans_a else 1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=_prec(a.dtype),
    )


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_blocks(Q: int, K: int, causal: bool) -> tuple:
    """Defaults tuned on v5e.

    Causal (LLM 1x2112 GQA bf16, same-process model-level A/B,
    benchmarks/model_ab.py): (256, 1024) 9.43 clips/s > (512, 1024) 9.40 >
    (256, 512) 9.27 > (512, 512) 9.22 > (128, 512) 9.03 — bigger kv blocks
    win now that dimension_semantics pipelines the grid; q=256 keeps the
    diagonal skip effective.
    Non-causal (ViT B32/S1025/D64 bf16): whole-row kv wins — see
    _fwd_nc_impl (4.64ms) and benchmarks/vit_attn_bench.py.
    """
    if causal:
        bq = 256 if Q > 256 else _round_up(Q, 128)
        if K > 1024:
            bk = 1024
        elif K > 512:
            bk = 512
        else:
            bk = _round_up(K, 128)
        return bq, bk
    # Whole-array blocks only need 8-alignment (the 128-lane rule is
    # satisfied by block == array dim), trimming pad waste: 1025 -> 1032
    # instead of 1152 (8.68ms vs 8.94ms measured).
    Kp8 = _round_up(K, 8)
    if Kp8 <= 2048:
        return _round_up(Q, 8), Kp8
    return min(_round_up(Q, 128), 1152), 512


# ------------------------------------------------ non-causal fast forward

def _fwd_nc_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                   *, scale, hp, kv_pad, with_lse, norm_bound):
    """Whole-row non-causal attention, no padding mask (the ViT case:
    every tile token is real).  Direct softmax — no online-softmax state,
    no mask where(); ``hp`` heads per program amortize program dispatch.

    Zero-padded kv columns (``kv_pad`` of them — the kernel's own alignment
    pad plus any caller-declared ``kv_valid`` tail of zeroed rows) produce
    s == 0 exactly and contribute nothing to p@v (v rows are zero); their
    only effect is ``kv_pad * exp(-m)`` extra mass in the denominator,
    subtracted analytically — an O(block_q) correction instead of an
    O(block_q * K) mask select.

    ``norm_bound``: replace the exact per-row max of s with the
    Cauchy-Schwarz upper bound ``m_i = scale * |q_i| * max_j |k_j|``
    (round-3 'nomax' A/B: the O(block_q * Kp) row-max reduction and the
    serialization it forces between the full s pass and the exp pass cost
    ~10% of the kernel; the bound needs only O((block_q + Kp) * D) norm
    reductions that pipeline with the s matmul).  Overflow-safe for ANY
    inputs — ``s_ij <= m_i`` is an identity, not an assumption about
    QK normalization.  The one trade: if a row's true max sits far below
    its bound the exp mass shrinks by exp(m_true - m_i); softmax is
    shift-invariant so the output is mathematically unchanged, degrading
    only if l underflows fp32 (gap > ~85 nats — LayerNormed ViT
    activations measure gap ~5-15), where the floor turns the row into ~0
    output instead of NaN/Inf.  The emitted lse stays the TRUE logsumexp
    either way, so the backward is bound-agnostic.
    """
    for h in range(hp):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = _dot(q, k, trans_b=True) * scale  # (block_q, Kp) fp32
        if norm_bound:
            q32 = q.astype(jnp.float32)
            k32 = k.astype(jnp.float32)
            kmax = jnp.sqrt(jnp.max(jnp.sum(k32 * k32, axis=-1)))
            m = jnp.sqrt(jnp.sum(q32 * q32, axis=-1, keepdims=True)) * (
                kmax * abs(scale))
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if kv_pad:
            l = l - kv_pad * jnp.exp(-m)
        if kv_pad or norm_bound:
            # Floor the denominator: the pad subtraction can cancel to
            # exactly 0 in fp32 when every real score sits ~21+ below the
            # (pad-forced) max, and a bound far above the true max can
            # underflow every exp; either way acc/l would be NaN — with
            # the floor the row degrades to ~0 output instead.
            l = jnp.maximum(l, 1e-30)
        acc = _dot(p.astype(v.dtype), v)
        o_ref[0, h] = (acc / l).astype(o_ref.dtype)
        if with_lse:
            lse = m + jnp.log(l)
            lse_ref[0, h] = jnp.broadcast_to(lse[:, 0][None, :],
                                             (8, q.shape[0]))


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "heads_per_program", "interpret",
                     "with_lse", "kv_valid", "norm_bound"),
)
def _fwd_nc_impl(q, k, v, scale, block_q, heads_per_program, interpret,
                 with_lse, kv_valid=None, norm_bound=False):
    """Specialized forward for non-causal, maskless MHA (ViT path).

    ``kv_valid``: static count of real kv rows; rows [kv_valid, K) MUST be
    exactly zero in both k and v (the caller's contract — see
    ``models/vit.py``).  They are folded into the kernel's analytic pad
    correction, letting callers run pre-padded 8-aligned sequences with no
    per-layer pad/slice copies.
    """
    B, Q, H, D = q.shape
    K = k.shape[1]
    if scale is None:
        scale = D**-0.5
    Kp = _round_up(K, 8)
    n_real = K if kv_valid is None else kv_valid
    # v5e sweep (benchmarks/vit_attn_bench.py): hp=1 whole-row wins —
    # 4.64ms vs 5.2-6.0ms for split blocks; extra heads/program bought
    # nothing once dimension_semantics pipelines the grid.
    hp = heads_per_program or 1
    while H % hp:
        hp //= 2
    block_q = min(block_q or _round_up(Q, 8), _round_up(Q, 8))
    # Mosaic's scoped-VMEM stack is 16MB; the dominant live buffers are the
    # per-head fp32 s and p (block_q x Kp each).  Shrink block_q (then hp)
    # until the estimate fits with headroom for in/out double-buffering.
    def vmem_est(bq, h):
        # The head loop is unrolled, so each head's fp32 s and p can stay
        # live simultaneously (observed: hp=4 whole-row hit 26.5M).
        sp = h * 2 * bq * Kp * 4
        io = h * (bq + 2 * Kp + bq) * D * 2 * 2  # q/k/v/o bf16, 2x buffered
        return sp + io

    while vmem_est(block_q, hp) > 14 * 1024 * 1024 and block_q > 256:
        block_q = _round_up(block_q // 2, 8)
    while vmem_est(block_q, hp) > 14 * 1024 * 1024 and hp > 1:
        hp //= 2
    Qp = _round_up(Q, block_q)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if Qp != Q:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    if Kp != K:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))

    kernel = functools.partial(
        _fwd_nc_kernel, scale=scale, hp=hp, kv_pad=Kp - n_real,
        with_lse=with_lse, norm_bound=norm_bound)
    if not with_lse:
        def kernel(q_ref, k_ref, v_ref, o_ref):  # noqa: F811
            _fwd_nc_kernel(q_ref, k_ref, v_ref, o_ref, None, scale=scale,
                           hp=hp, kv_pad=Kp - n_real, with_lse=False,
                           norm_bound=norm_bound)

    out_shapes = [jax.ShapeDtypeStruct((B, H, Qp, D), q.dtype)]
    out_specs = [pl.BlockSpec((1, hp, block_q, D),
                              lambda b, g, i: (b, g, i, 0),
                              memory_space=pltpu.VMEM)]
    if with_lse:
        out_shapes.append(jax.ShapeDtypeStruct((B, H, 8, Qp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, hp, 8, block_q),
                                      lambda b, g, i: (b, g, 0, i),
                                      memory_space=pltpu.VMEM))

    results = pl.pallas_call(
        kernel,
        grid=(B, H // hp, Qp // block_q),
        in_specs=[
            pl.BlockSpec((1, hp, block_q, D), lambda b, g, i: (b, g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, Kp, D), lambda b, g, i: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, Kp, D), lambda b, g, i: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if with_lse else out_specs[0],
        out_shape=tuple(out_shapes) if with_lse else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(qt, kt, vt)

    if with_lse:
        outp, lse = results
    else:
        outp, lse = results, None
    out = jnp.transpose(outp[:, :, :Q, :], (0, 2, 1, 3))
    return (out, lse) if with_lse else out


# --------------------------------------------------------------- forward

def _fwd_kernel(
    off_ref,  # SMEM (1, 1) int32: global position of q row 0 (SP shards)
    q_ref, k_ref, v_ref, mask_ref,  # blocks (see specs below)
    o_ref, lse_ref,  # outputs
    acc_ref, m_ref, l_ref,  # VMEM scratch
    *, scale, causal, block_q, block_kv, with_lse,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)
    off = off_ref[pl.program_id(0), 0]

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    run = (off + (qi + 1) * block_q > ki * block_kv) if causal else True

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _dot(q, k, trans_b=True) * scale  # (block_q, block_kv) fp32
        if causal:
            q_pos = off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            k_pos = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        mk = mask_ref[0, 0]
        s = jnp.where(mk[None, :] != 0, s, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + _dot(p.astype(v.dtype), v)

    @pl.when(ki == n_kv - 1)
    def _finish():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        dead = m <= NEG_INF * 0.5
        out = jnp.where(dead, 0.0, acc_ref[:] / jnp.where(l == 0.0, 1.0, l))
        o_ref[0, 0] = out.astype(o_ref.dtype)
        if with_lse:
            lse = jnp.where(dead, DEAD_LSE,
                            m + jnp.log(jnp.maximum(l, 1e-30)))
            lse_ref[0, 0] = jnp.broadcast_to(lse[:, 0][None, :],
                                             (8, block_q))


def _fwd_bound_kernel(
    off_ref,   # SMEM (B, 1) int32: global position of q row 0
    kmax_ref,  # SMEM (B, Hq) fp32 global kmax — OR, when row_bound, a
    #            VMEM (1, 1, block_q) block of the per-row causal kmax
    q_ref, k_ref, v_ref, mask_ref,
    o_ref, lse_ref,
    acc_ref, l_ref,  # VMEM scratch — NO m scratch: the bound is constant
    *, scale, causal, block_q, block_kv, with_lse, row_bound=False,
):
    """Causal/masked forward under the Cauchy-Schwarz softmax bound.

    ``m_i = |scale| * |q_i| * max_j |k_j|`` is an identity upper bound on
    every score in row i (``s_ij = scale * q_i . k_j <= m_i`` for ANY
    q/k), and — unlike the true row max — it is CONSTANT across kv
    blocks.  The online softmax therefore collapses to a plain
    accumulation: no per-block O(block_q*block_kv) row-max reduce, no
    ``alpha`` rescale of the O(block_q*D) accumulator, no m/l scratch
    read-modify-write, and no serialization between the s matmul and the
    exp pass (the bound needs only O(block_q*D) q norms that pipeline
    with the matmul; ``kmax`` is one XLA reduce outside the kernel).

    Numerics are identical to the exact-max kernel up to softmax shift
    invariance.  The one trade (same as ``_fwd_nc_kernel``): a row whose
    true max sits ~85+ nats below its bound underflows every exp and the
    row degrades to ~0 output / DEAD_LSE instead of NaN — measured gaps
    on RMSNorm-fed decoder q/k are single-digit nats
    (benchmarks/llm_bound_ab.py).  The emitted lse is the TRUE logsumexp
    (shift invariance), so the backward kernels are bound-agnostic.

    ``row_bound`` (the prefix-cache-safe variant): the bound per row i
    uses the CAUSAL running key-norm max over keys j <= i (precomputed as
    an XLA cummax and gathered per global row position in ``_fwd_impl``)
    instead of the global kmax.  Still constant across kv blocks (it
    depends only on the row), so the collapse is preserved — but the
    value is now a pure function of the tokens at positions <= i, making
    a prefix-only prefill and a full-prompt prefill compute IDENTICAL
    bounds for shared rows by construction (the determinism the cached
    judge decode needs — see models/decoder.py:42 for the hazard the
    global kmax variant would reopen).  Tighter, too: early rows can't be
    loosened by late large-norm keys.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)
    off = off_ref[b, 0]

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    run = (off + (qi + 1) * block_q > ki * block_kv) if causal else True

    def _bound(q32):
        qn = jnp.sqrt(jnp.sum(q32 * q32, axis=-1, keepdims=True))
        if row_bound:
            km = kmax_ref[0, 0]  # (block_q, 1) per-row causal max
            return qn * km * abs(scale)
        return qn * (kmax_ref[b, h] * abs(scale))

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        m = _bound(q.astype(jnp.float32))  # (block_q, 1), block-invariant
        s = _dot(q, k, trans_b=True) * scale
        if causal:
            q_pos = off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            k_pos = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        mk = mask_ref[0, 0]
        s = jnp.where(mk[None, :] != 0, s, NEG_INF)
        p = jnp.exp(s - m)  # masked entries: exp(NEG_INF - m) == 0 exactly
        l_ref[:, :1] = l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] + _dot(p.astype(v.dtype), v)

    @pl.when(ki == n_kv - 1)
    def _finish():
        l = l_ref[:, :1]
        # l == 0 <=> every score was masked (or the whole row underflowed
        # past the ~85-nat budget): emit 0 output / DEAD_LSE, never NaN.
        dead = l <= 0.0
        out = jnp.where(dead, 0.0, acc_ref[:] / jnp.where(dead, 1.0, l))
        o_ref[0, 0] = out.astype(o_ref.dtype)
        if with_lse:
            m = _bound(q_ref[0, 0].astype(jnp.float32))  # recompute: cheap
            lse = jnp.where(dead, DEAD_LSE,
                            m + jnp.log(jnp.maximum(l, 1e-30)))
            lse_ref[0, 0] = jnp.broadcast_to(lse[:, 0][None, :],
                                             (8, block_q))


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_kv", "interpret",
                     "with_lse", "heads_per_program", "kv_valid",
                     "norm_bound"),
)
def _fwd_impl(q, k, v, attention_mask, q_offset, causal, scale, block_q,
              block_kv, interpret, with_lse, heads_per_program=None,
              kv_valid=None, norm_bound=False):
    """Returns out (B, Q, Hq, D) [and lse (B, Hq, 8, Qp) if with_lse].

    ``q_offset``: global sequence position of q row 0 — nonzero only under
    sequence parallelism, where this shard's queries start mid-sequence.
    ``kv_valid``: static count of real kv rows (the tail rows being exactly
    zero) — served analytically by the nc kernel, as a mask elsewhere.
    """
    B, Q, Hq, D = q.shape
    K, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D**-0.5

    # Maskless non-causal MHA (the ViT / SigLIP shape) takes the
    # specialized direct-softmax kernel: no mask select, no online-softmax
    # bookkeeping, multiple heads per program (see _fwd_nc_kernel).
    if (not causal and attention_mask is None and q_offset is None
            and G == 1 and _round_up(K, 8) <= 4096):
        return _fwd_nc_impl(q, k, v, scale, block_q, heads_per_program,
                            interpret, with_lse, kv_valid=kv_valid,
                            norm_bound=norm_bound)
    if kv_valid is not None and attention_mask is None:
        # Non-nc shapes take the declared-valid tail as an ordinary mask.
        from .attention import kv_valid_mask

        attention_mask = kv_valid_mask(B, K, kv_valid)

    default_bq, default_bk = _pick_blocks(Q, K, causal)
    block_q = min(block_q or default_bq, _round_up(Q, 128))
    block_kv = min(block_kv or default_bk, _round_up(K, 128))
    Qp = _round_up(Q, block_q)
    Kp = _round_up(K, block_kv)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if Qp != Q:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    if Kp != K:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))

    mask = attention_mask
    if mask is None:
        mask = jnp.ones((B, K), jnp.int32)
    mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, Kp - K)))[:, None, :]

    if q_offset is None:
        assert Q == K or not causal, (
            "causal flash requires self-attention shapes (or an explicit "
            "q_offset for sequence-parallel shards)"
        )
        q_offset = jnp.zeros((), jnp.int32)
    # Scalar (SP shards: every row shares the shard offset) or per-row
    # (B,) (prefix-cache continuation: each row's suffix starts at its own
    # n_prefix).  Either way lands as a (B, 1) SMEM operand indexed by the
    # batch grid dim.
    off = jnp.broadcast_to(
        jnp.asarray(q_offset, jnp.int32).reshape(-1, 1), (B, 1))

    if norm_bound:
        # Per-(b, q-head) max valid kv-row norm, one XLA reduce over k
        # (masked rows excluded so junk padding can't loosen the bound;
        # alignment-pad rows are zeros and drop out on their own), then
        # group-expanded Hkv -> Hq so the kernel indexes it by q head.
        k32 = kt.astype(jnp.float32)
        kn2 = jnp.sum(k32 * k32, axis=-1)  # (B, Hkv, Kp)
        kn2 = kn2 * (mask[:, 0, :] != 0)[:, None, :].astype(jnp.float32)
        row_bound = norm_bound == "rows"
        if row_bound:
            # Causal per-row bound (prefix-cache-deterministic, see
            # _fwd_bound_kernel docstring): running max of key norms over
            # positions <= each q row's GLOBAL position (q_offset + i).
            assert causal, "norm_bound='rows' requires causal attention"
            kcum = jax.lax.cummax(jnp.sqrt(kn2), axis=2)  # (B, Hkv, Kp)
            kcum = jnp.repeat(kcum, G, axis=1)  # (B, Hq, Kp)
            pos = jnp.clip(off + jnp.arange(Qp)[None, :], 0, Kp - 1)
            kmax = jnp.take_along_axis(
                kcum, jnp.broadcast_to(pos[:, None, :], (B, Hq, Qp)), axis=2)
            # Trailing singleton: Mosaic's block rule needs the last two
            # block dims divisible by (8, 128) or equal to the array dims;
            # (1, 1, block_q, 1) satisfies it where (1, 1, block_q) cannot
            # (second-to-last block dim 1 != Hq).  The kernel reads a
            # (block_q, 1) tile — exactly the bound column it multiplies.
            kmax = kmax[..., None]  # (B, Hq, Qp, 1)
        else:
            kmax = jnp.sqrt(jnp.max(kn2, axis=-1))  # (B, Hkv)
            kmax = jnp.repeat(kmax, G, axis=1)  # (B, Hq)
        if with_lse:
            kernel = functools.partial(
                _fwd_bound_kernel, scale=scale, causal=causal,
                block_q=block_q, block_kv=block_kv, with_lse=True,
                row_bound=row_bound,
            )
        else:
            def kernel(off_ref, kmax_ref, q_ref, k_ref, v_ref, mask_ref,
                       o_ref, acc, l):
                _fwd_bound_kernel(off_ref, kmax_ref, q_ref, k_ref, v_ref,
                                  mask_ref, o_ref, None, acc, l, scale=scale,
                                  causal=causal, block_q=block_q,
                                  block_kv=block_kv, with_lse=False,
                                  row_bound=row_bound)
    elif with_lse:
        kernel = functools.partial(
            _fwd_kernel, scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, with_lse=True,
        )
    else:
        def kernel(off_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, acc, m, l):
            _fwd_kernel(off_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, None,
                        acc, m, l, scale=scale, causal=causal,
                        block_q=block_q, block_kv=block_kv, with_lse=False)
    out_shapes = [jax.ShapeDtypeStruct((B, Hq, Qp, D), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, D),
                              lambda b, h, i, j: (b, h, i, 0),
                              memory_space=pltpu.VMEM)]
    if with_lse:
        out_shapes.append(jax.ShapeDtypeStruct((B, Hq, 8, Qp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 8, block_q),
                                      lambda b, h, i, j: (b, h, 0, i),
                                      memory_space=pltpu.VMEM))

    # whole (B, 1) offsets array in SMEM (a (1, 1) block of a
    # (B, 1) array does not satisfy mosaic's block-shape rule);
    # kernels read their row via program_id(0)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands = [off]
    if norm_bound:
        if norm_bound == "rows":  # (B, Hq, Qp, 1) per-row causal bound
            in_specs.append(pl.BlockSpec((1, 1, block_q, 1),
                                         lambda b, h, i, j: (b, h, i, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (B, Hq)
        operands.append(kmax)
    in_specs += [
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
    ]
    operands += [qt, kt, vt, mask]
    scratch_shapes = [pltpu.VMEM((block_q, D), jnp.float32)]
    if not norm_bound:
        scratch_shapes.append(pltpu.VMEM((block_q, 128), jnp.float32))
    scratch_shapes.append(pltpu.VMEM((block_q, 128), jnp.float32))

    results = pl.pallas_call(
        kernel,
        grid=(B, Hq, Qp // block_q, Kp // block_kv),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if with_lse else out_specs[0],
        out_shape=tuple(out_shapes) if with_lse else out_shapes[0],
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    if with_lse:
        outp, lse = results
    else:
        outp, lse = results, None
    out = jnp.transpose(outp[:, :, :Q, :], (0, 2, 1, 3))
    return (out, lse) if with_lse else out


# --------------------------------------------------------------- backward

def _bwd_dkdv_kernel(
    off_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, causal, block_q, block_kv,
):
    """Accumulate dK/dV for one kv block over all q blocks (per q head;
    GQA group-sum happens outside)."""
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    n_q = pl.num_programs(3)
    off = off_ref[pl.program_id(0), 0]

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    run = (off + (qi + 1) * block_q > ki * block_kv) if causal else True

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0, :][:, None]  # (block_q, 1)
        delta = delta_ref[0, 0, 0, :][:, None]

        s = _dot(q, k, trans_b=True) * scale
        if causal:
            q_pos = off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            k_pos = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        mk = mask_ref[0, 0]
        s = jnp.where(mk[None, :] != 0, s, NEG_INF)

        p = jnp.exp(s - lse)  # (block_q, block_kv) fp32
        pq = p.astype(do.dtype)
        dv_acc[:] = dv_acc[:] + _dot(pq, do, trans_a=True)
        dp = _dot(do, v, trans_b=True)  # (block_q, block_kv) fp32
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dk_acc[:] = dk_acc[:] + _dot(ds, q, trans_a=True)

    @pl.when(qi == n_q - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    off_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
    dq_ref,
    dq_acc,
    *, scale, causal, block_q, block_kv,
):
    """Accumulate dQ for one q block over all kv blocks."""
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)
    off = off_ref[pl.program_id(0), 0]

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    run = (off + (qi + 1) * block_q > ki * block_kv) if causal else True

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0, :][:, None]
        delta = delta_ref[0, 0, 0, :][:, None]

        s = _dot(q, k, trans_b=True) * scale
        if causal:
            q_pos = off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            k_pos = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        mk = mask_ref[0, 0]
        s = jnp.where(mk[None, :] != 0, s, NEG_INF)

        p = jnp.exp(s - lse)
        dp = _dot(do, v, trans_b=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq_acc[:] = dq_acc[:] + _dot(ds, k)

    @pl.when(ki == n_kv - 1)
    def _finish():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_kv", "interpret"),
)
def _bwd_impl(q, k, v, attention_mask, q_offset, out, lse, g, causal, scale,
              block_q, block_kv, interpret):
    B, Q, Hq, D = q.shape
    K, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D**-0.5

    default_bq, default_bk = _pick_blocks(Q, K, causal)
    block_q = min(block_q or default_bq, _round_up(Q, 128))
    block_kv = min(block_kv or default_bk, _round_up(K, 128))
    Qp = _round_up(Q, block_q)
    Kp = _round_up(K, block_kv)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    dot_ = jnp.transpose(g, (0, 2, 1, 3)).astype(q.dtype)
    out_t = jnp.transpose(out, (0, 2, 1, 3))
    # delta = rowsum(dO * O): cheap XLA reduce, laid out (B, Hq, 8, Qp).
    delta = jnp.sum(dot_.astype(jnp.float32) * out_t.astype(jnp.float32),
                    axis=-1)  # (B, Hq, Q)
    if Qp != Q:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        dot_ = jnp.pad(dot_, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Qp - Q)))
    if Kp != K:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
    delta = jnp.broadcast_to(delta[:, :, None, :], (B, Hq, 8, Qp))
    if lse.ndim == 3:
        # Natural (B, Hq, Q) layout (the ring-SP merged global lse) ->
        # the kernels' sublane-tiled (B, Hq, 8, Qp).  Pad rows are zero
        # queries: s = 0, p = exp(0 - 0) = 1, but their dO/delta rows are
        # zero-padded so every gradient contribution vanishes.
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Qp - lse.shape[-1])))
        lse = jnp.broadcast_to(lse[:, :, None, :], (B, Hq, 8, Qp))

    mask = attention_mask
    if mask is None:
        mask = jnp.ones((B, K), jnp.int32)
    mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, Kp - K)))[:, None, :]
    if q_offset is None:
        q_offset = jnp.zeros((), jnp.int32)
    off = jnp.broadcast_to(
        jnp.asarray(q_offset, jnp.int32).reshape(-1, 1), (B, 1))

    off_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole (B, 1)
    q_spec = pl.BlockSpec((1, 1, block_q, D),
                          lambda b, h, j, i: (b, h, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, block_kv, D),
                           lambda b, h, j, i: (b, h // G, j, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, 8, block_q),
                            lambda b, h, j, i: (b, h, 0, i),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, block_kv),
                             lambda b, h, j, i: (b, 0, j),
                             memory_space=pltpu.VMEM)

    dk_part, dv_part = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_kv=block_kv),
        grid=(B, Hq, Kp // block_kv, Qp // block_q),
        in_specs=[off_spec, q_spec, kv_spec, kv_spec, q_spec, row_spec,
                  row_spec, mask_spec],
        out_specs=(
            pl.BlockSpec((1, 1, block_kv, D),
                         lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, D),
                         lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, Kp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, Kp, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_kv, D), jnp.float32),
            pltpu.VMEM((block_kv, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(off, qt, kt, vt, dot_, lse, delta, mask)

    # dQ kernel: q blocks outer, kv inner.
    q_spec2 = pl.BlockSpec((1, 1, block_q, D),
                           lambda b, h, i, j: (b, h, i, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, 1, block_kv, D),
                            lambda b, h, i, j: (b, h // G, j, 0),
                            memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, 1, 8, block_q),
                             lambda b, h, i, j: (b, h, 0, i),
                             memory_space=pltpu.VMEM)
    mask_spec2 = pl.BlockSpec((1, 1, block_kv),
                              lambda b, h, i, j: (b, 0, j),
                              memory_space=pltpu.VMEM)
    off_spec2 = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole (B, 1)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_kv=block_kv),
        grid=(B, Hq, Qp // block_q, Kp // block_kv),
        in_specs=[off_spec2, q_spec2, kv_spec2, kv_spec2, q_spec2,
                  row_spec2, row_spec2, mask_spec2],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Qp, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(off, qt, kt, vt, dot_, lse, delta, mask)

    # Reduce GQA group partials and restore layouts/dtypes.
    dq = jnp.transpose(dq[:, :, :Q, :], (0, 2, 1, 3)).astype(q.dtype)
    dk = dk_part.reshape(B, Hkv, G, Kp, D).sum(axis=2)
    dv = dv_part.reshape(B, Hkv, G, Kp, D).sum(axis=2)
    dk = jnp.transpose(dk[:, :, :K, :], (0, 2, 1, 3)).astype(k.dtype)
    dv = jnp.transpose(dv[:, :, :K, :], (0, 2, 1, 3)).astype(v.dtype)
    return dq, dk, dv


# --------------------------------------------------------------- vjp glue

def _xla_reference(q, k, v, attention_mask, causal, scale):
    from .attention import attention_xla, make_attention_bias

    bias = make_attention_bias(attention_mask, q.shape[1], k.shape[1], causal)
    return attention_xla(q, k, v, bias=bias, scale=scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_attention(q, k, v, attention_mask, q_offset, causal, scale,
                     block_q, block_kv, kv_valid, norm_bound):
    interpret = jax.default_backend() != "tpu"
    return _fwd_impl(q, k, v, attention_mask, q_offset, causal, scale,
                     block_q, block_kv, interpret, False, kv_valid=kv_valid,
                     norm_bound=norm_bound)


def _vjp_fwd(q, k, v, attention_mask, q_offset, causal, scale,
             block_q, block_kv, kv_valid, norm_bound):
    interpret = jax.default_backend() != "tpu"
    if interpret and q_offset is None:
        # Interpret-mode backward goes through the XLA formulation; no LSE.
        out = _fwd_impl(q, k, v, attention_mask, None, causal, scale,
                        block_q, block_kv, True, False, kv_valid=kv_valid,
                        norm_bound=norm_bound)
        return out, (q, k, v, attention_mask, None, None, None)
    # The emitted lse is the TRUE logsumexp regardless of norm_bound, so
    # the backward kernels need no bound plumbing.
    out, lse = _fwd_impl(q, k, v, attention_mask, q_offset, causal, scale,
                         block_q, block_kv, interpret, True,
                         kv_valid=kv_valid, norm_bound=norm_bound)
    return out, (q, k, v, attention_mask, q_offset, out, lse)


def _vjp_bwd(causal, scale, block_q, block_kv, kv_valid, norm_bound, res, g):
    q, k, v, attention_mask, q_offset, out, lse = res
    if kv_valid is not None and attention_mask is None:
        # The forward subtracted the declared-zero tail analytically; the
        # recompute/backward must exclude it the same way.  (The Pallas
        # backward needs no mask — the zeroed k rows nullify the tail's dQ
        # contribution, and its dK/dV land on rows the caller zero-masks —
        # but the XLA fallback recomputes the softmax and DOES need it.)
        from .attention import kv_valid_mask

        bwd_mask = kv_valid_mask(k.shape[0], k.shape[1], kv_valid)
    else:
        bwd_mask = attention_mask
    if lse is None:  # off-TPU fallback: exact gradients via XLA einsum path
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_reference(q_, k_, v_, bwd_mask,
                                              causal, scale),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None
    interpret = jax.default_backend() != "tpu"
    dq, dk, dv = _bwd_impl(q, k, v, attention_mask, q_offset, out, lse, g,
                           causal, scale, block_q, block_kv, interpret)
    return dq, dk, dv, None, None


_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    q_offset: Optional[jnp.ndarray] = None,
    kv_valid: Optional[int] = None,
    norm_bound: bool = False,
) -> jnp.ndarray:
    """Blockwise flash attention. q: (B, Q, Hq, D); k/v: (B, K, Hkv, D).

    ``attention_mask``: (B, K), 1 = real token, 0 = padding.
    ``q_offset``: global position of q row 0 — a scalar (sequence-parallel
    shards: every row shares the shard offset) or per-row (B,) (prefix-
    cache suffix continuation: each row's queries start at its own
    prefix length).
    ``kv_valid``: static count of real kv rows when the caller pre-pads the
    sequence to an aligned length — rows [kv_valid, K) must be exactly zero
    in k AND v (the nc kernel subtracts their softmax mass analytically; no
    per-layer pad/slice copies).  Mutually exclusive with attention_mask.
    Differentiable: on TPU the backward runs the Pallas dK/dV + dQ kernels;
    elsewhere it falls back to the exact XLA recompute (Pallas interpret
    kernels when q_offset is set).
    ``norm_bound``: replace the per-row softmax max with the Cauchy-Schwarz
    bound — mathematically identical output (softmax shift invariance),
    less VPU work per program.  On the non-causal maskless (ViT) path the
    direct-softmax kernel drops its O(block_q*K) row-max reduce
    (``_fwd_nc_kernel``); on the causal/masked path the bound is constant
    across kv blocks, so the whole online softmax collapses — no row-max
    reduce, no accumulator rescale, no m scratch (``_fwd_bound_kernel``).
    """
    return _flash_attention(
        q, k, v, attention_mask, q_offset, causal, scale, block_q, block_kv,
        kv_valid, norm_bound,
    )


def flash_attention_with_lse(
    q, k, v, attention_mask=None, causal=False, scale=None,
    block_q=None, block_kv=None, interpret=None, q_offset=None,
    heads_per_program=None,
):
    """(out, lse) — for tests and downstream kernels needing softmax stats."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fwd_impl(q, k, v, attention_mask, q_offset, causal, scale,
                     block_q, block_kv, interpret, True,
                     heads_per_program=heads_per_program)

"""Experimental ViT attention kernel variants, A/B'd on the real chip.

Per the round-2 module split the bench config (8 tiles) runs ViT attention
at ~17 TF/s while 32 tiles reaches ~30 TF/s — the kernel, not the model,
is the bottleneck at the serving batch.  Candidates:

* exp2: fold scale*log2(e) into q before the matmul and use exp2 in the
  softmax (removes the S^2 scale pass; exp lowers to exp2 anyway).
* bf16 logits: keep s in bf16 (halves VMEM softmax traffic, doubles VPU
  width) — measured for perf first; fidelity decided separately.
* no-max: skip the running-max subtraction entirely (QK-RMSNorm bounds the
  logits) — quantifies the max pass cost; NOT for the library without a
  range guard.

Usage: python benchmarks/vit_attn_variants.py [--tiles 8] [--chain 48]
"""

import argparse
import functools
import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

LOG2E = math.log2(math.e)


def make_chained(fn_one, q, k, v, n):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(q0, k, v):
        def body(qc, _):
            o = fn_one(qc, k, v)
            return q0 + jnp.asarray(1e-6, q0.dtype) * o, None

        qf, _ = jax.lax.scan(body, q0, None, length=n)
        return qf[0, 0, 0, 0]

    return many


def bench(fn_one, q, k, v, n, reps=3):
    import jax

    many = make_chained(fn_one, q, k, v, n)
    out = many(q, k, v)
    jax.block_until_ready(out)
    np.asarray(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = many(q, k, v)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def variant_impl(q, k, v, *, mode):
    """Whole-row non-causal kernel with softmax variants.

    mode: 'exp2' | 'bf16s' | 'nomax' | 'exp2_nomax'
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mjvideo_tpu.ops.flash_attention import _dot, _round_up

    B, Q, H, D = q.shape
    K = k.shape[1]
    scale = D**-0.5
    Kp = _round_up(K, 8)
    block_q = _round_up(Q, 8)
    kv_pad = Kp - K

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qh = q_ref[0, 0]
        kh = k_ref[0, 0]
        vh = v_ref[0, 0]
        if mode in ("exp2", "exp2_nomax"):
            s = _dot(qh, kh, trans_b=True)  # q pre-scaled by scale*LOG2E
            if mode == "exp2":
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                if kv_pad:
                    l = l - kv_pad * jnp.exp2(-m)
            else:
                p = jnp.exp2(s)
                l = jnp.sum(p, axis=-1, keepdims=True)
                if kv_pad:
                    l = l - kv_pad
        elif mode == "bf16s":
            s = (_dot(qh, kh, trans_b=True) * scale).astype(jnp.bfloat16)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)  # bf16 exp
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            if kv_pad:
                l = l - kv_pad * jnp.exp(-m.astype(jnp.float32))
        else:  # nomax
            s = _dot(qh, kh, trans_b=True) * scale
            p = jnp.exp(s)
            l = jnp.sum(p, axis=-1, keepdims=True)
            if kv_pad:
                l = l - kv_pad
        acc = _dot(p.astype(vh.dtype), vh)
        o_ref[0, 0] = (acc / l).astype(o_ref.dtype)

    if mode in ("exp2", "exp2_nomax"):
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    Qp = _round_up(Q, block_q)
    if Qp != Q:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    if Kp != K:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))

    out = pl.pallas_call(
        kernel,
        grid=(B, H, Qp // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, g, i: (b, g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp, D), lambda b, g, i: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp, D), lambda b, g, i: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, g, i: (b, g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qt, kt, vt)
    return jnp.transpose(out[:, :, :Q, :], (0, 2, 1, 3))


def tmajor_impl(q, k, v, *, hp=1, block_q=None, interpret=False):
    """NO host-side transpose: q/k/v stay token-major (B, S, H, D).

    The round-3 HLO audit shows the (B,S,H,D)->(B,H,S,D) relayout copies
    cost ~0.3 ms/layer (3 strided-transpose copies at ~143 GB/s).  This
    variant deletes them and instead lets each (b, head-group) program
    DMA its q/k/v blocks (1, S, hp, D) straight out of the token-major
    array — strided bursts of hp*128 bytes.  Whether strided DMA beats
    the XLA transpose is what the on-chip A/B answers.  ``hp`` adjacent
    heads per program lengthen the bursts; in-kernel the per-head
    slices are static sublane-dim indexing of the (S, hp, D) tile.

    VMEM: the unrolled head loop keeps each head's fp32 s/p live
    (observed round 2), so hp>1 needs ``block_q`` small enough that
    hp * 2 * block_q * S * 4 fits ~14MB (hp=2 -> 512, hp=4 -> 128).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mjvideo_tpu.ops.flash_attention import _dot, _round_up

    B, Q, H, D = q.shape
    K = k.shape[1]
    scale = D**-0.5
    kv_pad = 0
    if Q % 8:
        qp = _round_up(Q, 8)
        q = jnp.pad(q, ((0, 0), (0, qp - Q), (0, 0), (0, 0)))
        kv_pad = qp - K
        k = jnp.pad(k, ((0, 0), (0, qp - K), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, qp - K), (0, 0), (0, 0)))
        Qf, Kf = qp, qp
    else:
        Qf, Kf = Q, K

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for j in range(hp):
            qh = q_ref[0, :, j, :]
            kh = k_ref[0, :, j, :]
            vh = v_ref[0, :, j, :]
            s = _dot(qh, kh, trans_b=True) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            if kv_pad:
                l = jnp.maximum(l - kv_pad * jnp.exp(-m), 1e-30)
            acc = _dot(p.astype(vh.dtype), vh)
            o_ref[0, :, j, :] = (acc / l).astype(o_ref.dtype)

    bq = block_q or Qf
    while Qf % bq:
        bq //= 2
    out = pl.pallas_call(
        kernel,
        grid=(B, H // hp, Qf // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hp, D), lambda b, g, i: (b, i, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kf, hp, D), lambda b, g, i: (b, 0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kf, hp, D), lambda b, g, i: (b, 0, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hp, D), lambda b, g, i: (b, i, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Qf, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :Q]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--chain", type=int, default=48)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from mjvideo_tpu.ops.flash_attention import _fwd_nc_impl

    B, S, H, D = args.tiles, 1025, 16, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)

    flops = 4 * B * H * S * S * D
    print(f"shape B{B} S{S} H{H} D{D} bf16 | {flops/1e9:.1f} GFLOP/call "
          f"| chain={args.chain}", flush=True)

    def report(name, secs):
        print(f"{name:28s} {secs*1e3:8.3f} ms   {flops/secs/1e12:6.1f} TF/s",
              flush=True)

    report("current nc kernel", bench(
        lambda q, k, v: _fwd_nc_impl(q, k, v, None, None, 1, False, False),
        q, k, v, args.chain))
    for mode in ("exp2", "bf16s", "nomax", "exp2_nomax"):
        report(f"variant {mode}", bench(
            functools.partial(variant_impl, mode=mode), q, k, v, args.chain))
    # hp=16 (full-H blocks) is the Mosaic-safe config: partial blocks over
    # the 16-head second-minor dim may be rejected by the (16,128) bf16
    # tiling; small hp rows are kept to measure IF they compile.
    # VMEM: unrolled heads keep fp32 s/p live -> hp*2*bq*Kf*4 <~ 14MB.
    for hp, bq in ((16, 24), (16, 8), (4, 129), (1, None)):
        try:
            report(f"variant tmajor hp={hp} bq={bq}", bench(
                functools.partial(tmajor_impl, hp=hp, block_q=bq),
                q, k, v, args.chain))
        except Exception as e:  # Mosaic tiling rejection is a data point
            print(f"variant tmajor hp={hp} bq={bq}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # numerics vs the current kernel
    import jax

    base = np.asarray(_fwd_nc_impl(q, k, v, None, None, 1, False,
                                   False)).astype(np.float32)
    for mode in ("exp2", "bf16s", "nomax"):
        got = np.asarray(jax.jit(functools.partial(
            variant_impl, mode=mode))(q, k, v)).astype(np.float32)
        print(f"max |{mode} - base| = {np.abs(got - base).max():.2e}",
              flush=True)
    for hp, bq in ((16, 24), (1, None)):
        try:
            got = np.asarray(jax.jit(functools.partial(
                tmajor_impl, hp=hp, block_q=bq))(q, k, v)).astype(np.float32)
            print(f"max |tmajor hp={hp} - base| = "
                  f"{np.abs(got - base).max():.2e}", flush=True)
        except Exception as e:
            print(f"tmajor hp={hp} numerics: FAILED {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()

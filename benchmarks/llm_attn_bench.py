"""LLM causal attention kernel A/B at the serving batch (B=1, S=2112).

Clean same-process harness (see vit_attn_bench.py for methodology).
Sweeps block shapes and a GQA-grouped variant where both q heads of a kv
group run in one program (halves k/v DMA, halves grid steps).

Usage: python benchmarks/llm_attn_bench.py [--chain 48]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def bench(fn_one, q, k, v, n, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(q0, k, v):
        def body(qc, _):
            o = fn_one(qc, k, v)
            return q0 + jnp.asarray(1e-6, q0.dtype) * o, None

        qf, _ = jax.lax.scan(body, q0, None, length=n)
        return qf[0, 0, 0, 0]

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=48)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from mjvideo_tpu.ops.attention import multi_head_attention
    from mjvideo_tpu.ops.flash_attention import _fwd_impl

    B, S, Hq, Hkv, D = args.batch, 2112, 16, 8, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.bfloat16)
    ones = jnp.ones((B, S), jnp.int32)

    flops = 2 * B * Hq * S * S * D  # causal: half the 4BHSSD
    print(f"shape B{B} S{S} {Hq}q/{Hkv}kv D{D} bf16 causal | "
          f"{flops/1e9:.1f} GFLOP/call | chain={args.chain}", flush=True)

    def report(name, secs):
        print(f"{name:40s} {secs*1e3:8.3f} ms   {flops/secs/1e12:6.1f} TF/s",
              flush=True)

    report("xla einsum", bench(
        lambda q, k, v: multi_head_attention(
            q, k, v, attention_mask=ones, causal=True, impl="xla"),
        q, k, v, args.chain))
    for bq, bk in ((256, 1024), (256, 512), (512, 1024), (256, 2112),
                   (512, 2112), (128, 1024), (1024, 1024)):
        report(f"flash bq={bq} bk={bk} (mask)", bench(
            lambda q, k, v, bq=bq, bk=bk: _fwd_impl(
                q, k, v, ones, None, True, None, bq, bk, False, False),
            q, k, v, args.chain))
    # mask=None path (same kernel; ones mask materialized inside impl)
    report("flash default blocks, mask=None", bench(
        lambda q, k, v: _fwd_impl(
            q, k, v, None, None, True, None, None, None, False, False),
        q, k, v, args.chain))


if __name__ == "__main__":
    main()

"""ViT attention kernel A/B on the real chip (same-process, honest timing).

Shape under test: the MJ-VIDEO-2B ViT hot loop — B tiles x S=1025 x 16 heads
x D=64, bf16, non-causal, no padding mask (every tile token is real).

Timing methodology (both matter on the axon tunnel):
* wrap each variant in a lax.scan of N chained iterations (the output
  feeds the next input, defeating CSE) inside ONE jit — amortizes the
  ~100ms remote dispatch latency;
* return a SCALAR, not the full array — materializing a 67MB output
  through the tunnel costs seconds and would swamp the measurement.

Usage: python benchmarks/vit_attn_bench.py [--tiles 32] [--chain 48]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def make_chained(fn_one, q, k, v, n):
    """jit(scan): q_{i+1} = q0 + eps * out_i — serial dependency, no CSE."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(q0, k, v):
        def body(qc, _):
            o = fn_one(qc, k, v)
            return q0 + jnp.asarray(1e-6, q0.dtype) * o, None

        qf, _ = jax.lax.scan(body, q0, None, length=n)
        return qf[0, 0, 0, 0]  # scalar out: D2H of the full array is secs

    return many


def bench(fn_one, q, k, v, n, reps=3):
    import jax

    many = make_chained(fn_one, q, k, v, n)
    out = many(q, k, v)
    jax.block_until_ready(out)
    np.asarray(out)  # force a real transfer (axon quirk)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = many(q, k, v)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=32)
    ap.add_argument("--chain", type=int, default=48)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from mjvideo_tpu.ops.attention import multi_head_attention
    from mjvideo_tpu.ops.flash_attention import _fwd_impl, _fwd_nc_impl

    B, S, H, D = args.tiles, 1025, 16, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    ones = jnp.ones((B, S), jnp.int32)

    flops = 4 * B * H * S * S * D
    print(f"shape B{B} S{S} H{H} D{D} bf16  |  {flops/1e9:.1f} GFLOP/call  "
          f"| chain={args.chain}")

    results = {}

    def report(name, secs):
        results[name] = secs
        print(f"{name:44s} {secs*1e3:8.3f} ms   {flops/secs/1e12:6.1f} TF/s",
              flush=True)

    report("xla einsum", bench(
        lambda q, k, v: multi_head_attention(q, k, v, causal=False,
                                             impl="xla"),
        q, k, v, args.chain))
    report("general kernel (ones mask, whole-row)", bench(
        lambda q, k, v: _fwd_impl(q, k, v, ones, None, False, None, None,
                                  None, False, False),
        q, k, v, args.chain))
    for hp in (1, 2, 4):
        for bq in (None, 512, 256):
            report(f"nc kernel hp={hp} bq={bq or 'whole'}", bench(
                lambda q, k, v, hp=hp, bq=bq: _fwd_nc_impl(
                    q, k, v, None, bq, hp, False, False),
                q, k, v, args.chain))

    best = min(results, key=results.get)
    print(f"\nbest: {best} @ {results[best]*1e3:.3f} ms "
          f"({flops/results[best]/1e12:.1f} TF/s)")


if __name__ == "__main__":
    main()

"""A/B: the causal LLM flash kernel's online softmax vs the Cauchy-Schwarz
norm bound (``norm_bound=True``, ``_fwd_bound_kernel``) on the real chip.

The nc ViT kernel already adopted the bound (+8.9% kernel-level,
``vit_nc_bound_ab.py``).  The causal kernel stands to gain MORE per block:
a constant per-row bound removes not just the O(block_q*block_kv) row-max
reduce but the entire online-softmax machinery — the exp(m_prev - m_new)
alpha, the O(block_q*D) accumulator rescale, and the m/l scratch
read-modify-write on every kv step.

Shapes: the production reward prefill (InternLM2-1.8B GQA: Hq16 Hkv8
D128, S2112 = the 16-frame x 13-tile bench config) and the padded-batch
variant (B4, ragged mask) that the training collator produces.

Also prints the measured bound gap ``max_i (m_bound - m_true)``:
underflow degradation needs ~85 nats; RMSNorm-fed decoder q/k measure
single digits at gaussian scales (the adoption criterion, see
``_fwd_bound_kernel``).

Usage: python benchmarks/llm_bound_ab.py [--chain 48]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def bench(fn_one, q, k, v, mask, n, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(q0, k, v, mask):
        def body(qc, _):
            o = fn_one(qc, k, v, mask)
            return q0 + jnp.asarray(1e-6, q0.dtype) * o, None

        qf, _ = jax.lax.scan(body, q0, None, length=n)
        return qf[0, 0, 0, 0]

    np.asarray(many(q, k, v, mask))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(many(q, k, v, mask))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def gap_stats(q, k, mask, causal=True, rows=False):
    """max over rows of (norm bound - true row max), valid rows only.

    ``rows=True`` evaluates the per-row causal bound (``norm_bound='rows'``:
    running key-norm max over positions <= the row) instead of the global
    kmax — always <= the global bound, so its gap is a lower envelope.
    """
    q32, k32 = (np.asarray(x, np.float32) for x in (q, k))
    B, S, Hq, D = q32.shape
    Hkv = k32.shape[2]
    G = Hq // Hkv
    scale = D ** -0.5
    kr = np.repeat(k32, G, axis=2)
    s = np.einsum("bqhd,bkhd->bhqk", q32, kr) * scale
    m = np.asarray(mask, bool)
    valid = m[:, None, None, :] & np.tril(
        np.ones((S, S), bool))[None, None] if causal else m[:, None, None, :]
    s = np.where(valid, s, -np.inf)
    m_true = s.max(-1)  # (B, Hq, S)
    kn = np.linalg.norm(k32, axis=-1) * m[:, :, None]  # zero masked rows
    if rows:
        kcum = np.maximum.accumulate(kn, axis=1)  # (B, S, Hkv) causal max
        kmax = np.repeat(kcum.transpose(0, 2, 1), G, axis=1)  # (B, Hq, S)
    else:
        kmax = np.repeat(kn.max(1), G, axis=-1)[:, :, None]  # (B, Hq, 1)
    m_bound = (np.linalg.norm(q32, axis=-1).transpose(0, 2, 1)
               * kmax * scale)  # (B, Hq, S)
    gap = np.broadcast_to(m_bound, m_true.shape) - m_true
    ok = np.isfinite(m_true)  # rows with >= 1 visible key
    return float(gap[ok].mean()), float(gap[ok].max())


def run_case(name, B, S, Hq, Hkv, D, chain, ragged):
    import jax.numpy as jnp

    from mjvideo_tpu.ops.flash_attention import _fwd_impl

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.bfloat16)
    if ragged:
        lens = rng.integers(S // 2, S + 1, size=B)
        lens[0] = S
        mask = jnp.asarray(np.arange(S)[None] < lens[:, None], jnp.int32)
    else:
        mask = jnp.ones((B, S), jnp.int32)

    # causal FLOPs: half the square
    flops = 2 * B * Hq * S * S * D
    print(f"[{name}] B{B} S{S} Hq{Hq} Hkv{Hkv} D{D} bf16 "
          f"ragged={ragged}  {flops/1e9:.1f} GFLOP/call", flush=True)
    res = {}
    for nb in (False, True, "rows"):
        secs = bench(
            lambda q, k, v, m, nb=nb: _fwd_impl(
                q, k, v, m, None, True, None, None, None, False, False,
                norm_bound=nb),
            q, k, v, mask, chain)
        res[nb] = secs
        print(f"  causal norm_bound={nb!s:5s} {secs*1e3:8.3f} ms   "
              f"{flops/secs/1e12:6.1f} TF/s", flush=True)

    a = np.asarray(_fwd_impl(q, k, v, mask, None, True, None, None, None,
                             False, False, norm_bound=False), np.float32)
    for nb in (True, "rows"):
        b = np.asarray(_fwd_impl(q, k, v, mask, None, True, None, None, None,
                                 False, False, norm_bound=nb), np.float32)
        gmean, gmax = gap_stats(q, k, mask, rows=nb == "rows")
        d = (res[False] - res[nb]) / res[False]
        print(f"  [{nb!s:5s}] out max abs diff {np.abs(a - b).max():.2e}; "
              f"gap mean {gmean:.2f} / max {gmax:.2f} nats (budget ~85); "
              f"speedup {d*100:+.1f}%", flush=True)
    return (res[False] - res[True]) / res[False]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=48)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    d1 = run_case("reward prefill", 1, 2112, 16, 8, 128, args.chain, False)
    d2 = run_case("train batch", 4, 2112, 16, 8, 128, args.chain, True)
    d = min(d1, d2)
    print(f"worst-case speedup: {d*100:+.1f}% "
          f"({'ADOPT' if d > 0.02 else 'KEEP ONLINE SOFTMAX'})", flush=True)


if __name__ == "__main__":
    main()

"""END-TO-END throughput: decode -> tile -> tokenize -> H2D -> score.

The headline bench (bench.py) measures the device forward on synthetic
tensors; the north star is end-to-end "clips/sec reward scoring", which
includes host video decode and the H2D hop.  This generates N sample
videos, then scores them through the real pipeline (cv2 decode, PIL-exact
tiling/normalize, ByteTokenizer prompt build, background prefetch thread
feeding the jit'd scorer) and reports e2e clips/s next to the device-only
number.

Caveat recorded in docs/PERF.md: this box has ONE host core behind an axon
TPU tunnel, so host decode and device compute barely overlap here; on a
normal TPU VM host (dozens of cores) the prefetch pipeline hides decode.

Usage: python benchmarks/e2e_throughput.py [--clips 16] [--segments 8]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def make_videos(outdir: str, n: int, frames: int = 24, size: int = 256):
    import cv2

    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        path = os.path.join(outdir, f"clip_{i:03d}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                            (size, size))
        assert w.isOpened()
        base = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        for f in range(frames):
            frame = np.roll(base, f * 3, axis=1)
            w.write(frame)
        w.release()
        paths.append(path)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--device-preprocess", action="store_true",
                    help="ship raw uint8 frames; resize+normalize on-device")
    ap.add_argument("--workers", type=int, default=0,
                    help="decode-pool workers (0 = single prefetch thread)")
    ap.add_argument("--batch", type=int, default=1,
                    help="clips per scoring forward")
    ap.add_argument("--stage-h2d", action="store_true",
                    help="device_put frames inside the decode workers")
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_2b_config, tiny_test_config
    from mjvideo_tpu.data.dataset import prefetch
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.scorer import RewardScorer
    from mjvideo_tpu.models.reward import init_reward_params

    on_tpu = jax.default_backend() == "tpu"
    cfg = mjvideo_2b_config() if on_tpu else tiny_test_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    tok = ByteTokenizer()
    scorer = RewardScorer(
        cfg, params, tok, attn_impl="auto", dtype=dtype,
        length_buckets=(4096,), gating_pattern=tok.gating_pattern(),
        device_preprocess=args.device_preprocess,
    )

    from mjvideo_tpu.data.dataset import pool_map

    B = args.batch
    with tempfile.TemporaryDirectory() as d:
        paths = make_videos(d, args.clips)

        def prep(p):
            pix, ids, gp = scorer.prepare_clip(
                p, "a scrolling color field", num_segments=args.segments)
            if args.workers > 0 and args.stage_h2d:
                # overlap H2D with other clips' decode + device compute
                # (measured SLOWER on the single-core axon tunnel — device_put
                # from pool threads contends; kept as a flag for real hosts)
                pix = jax.device_put(pix)
            return pix, ids, gp

        def prepared():
            if args.workers > 0:
                yield from pool_map(prep, paths, num_workers=args.workers)
            else:
                yield from prefetch(map(prep, paths), 2)

        # warmup compile on the first clip's shapes (incl. the batch width)
        pix, ids, gp = prep(paths[0])
        np.asarray(scorer.score_batch(
            np.concatenate([pix] * B, 0), [ids] * B, [gp] * B).score)

        # host-only timing (decode+tile+tokenize), for the split
        t0 = time.perf_counter()
        for p in paths:
            prep(p)
        host_s = (time.perf_counter() - t0) / len(paths)

        # end-to-end with the pipeline
        t0 = time.perf_counter()
        n = 0
        buf = []
        def cat(bufs):
            if len(bufs) == 1:
                return bufs[0][0]  # keep device residency for batch 1
            import jax.numpy as jnp_

            arrs = [c[0] for c in bufs]
            if any(not isinstance(a, np.ndarray) for a in arrs):
                return jnp_.concatenate(arrs, 0)
            return np.concatenate(arrs, 0)

        for clip in prepared():
            buf.append(clip)
            if len(buf) == B:
                out = scorer.score_batch(
                    cat(buf), [c[1] for c in buf], [c[2] for c in buf])
                n += len(buf)
                buf = []
        if buf:
            out = scorer.score_batch(
                cat(buf), [c[1] for c in buf], [c[2] for c in buf])
            n += len(buf)
        np.asarray(out.score)
        e2e = time.perf_counter() - t0

    pipe = (f"{args.workers}-worker pool" if args.workers
            else "prefetch depth 2")
    print(f"host prep:      {host_s*1e3:7.1f} ms/clip "
          f"({1/host_s:.2f} clips/s host-only)")
    print(f"end-to-end:     {e2e/n*1e3:7.1f} ms/clip -> "
          f"{n/e2e:.2f} clips/s e2e ({n} clips, batch {B}, {pipe})")


if __name__ == "__main__":
    main()

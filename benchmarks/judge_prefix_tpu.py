"""Prefix-KV-cache A/B for the InternVL judge's rubric loop on the chip.

The fine-grained benchmark asks ~34 questions per video whose prompts
share system + all image tokens (e.g. 2048 of ~2112 tokens at 8 frames);
with ``prefix_cache=True`` that prefix prefills once per video and each
question prefills only its ~20-60-token suffix.  This measures the
steady-state per-question latency both ways at InternVL2-2B judge dims.

Usage: python benchmarks/judge_prefix_tpu.py [--questions 6] [--frames 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


QUESTIONS = [
    "Rate the temporal coherence of the video.",
    "Rate the alignment between the video and its caption.",
    "Rate the visual quality of the frames.",
    "Rate whether object motion follows physics.",
    "Rate the aesthetic appeal of the composition.",
    "Rate the safety of the content.",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--questions", type=int, default=6)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=24)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import cv2
    import jax
    import jax.numpy as jnp  # noqa: F401

    from mjvideo_tpu.configs import mjvideo_2b_config
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.judges import InternVLJudge
    from mjvideo_tpu.models.internvl import init_chat_params

    print(f"devices: {jax.devices()}", flush=True)
    cfg = mjvideo_2b_config().chat
    params = init_chat_params(jax.random.PRNGKey(0), cfg,
                              dtype=jnp.bfloat16)

    import tempfile

    tmp = tempfile.mkdtemp()
    video = f"{tmp}/clip.mp4"
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (448, 448))
    rng = np.random.default_rng(0)
    for _ in range(args.frames * 4):
        w.write(rng.integers(0, 255, (448, 448, 3), dtype=np.uint8))
    w.release()

    qs = (QUESTIONS * ((args.questions + len(QUESTIONS) - 1)
                       // len(QUESTIONS)))[: args.questions]

    for label, on in (("full-prompt", False), ("prefix-cached", True)):
        judge = InternVLJudge(cfg, params, ByteTokenizer(),
                              num_segments=args.frames,
                              max_new_tokens=args.new_tokens,
                              prefix_cache=on)
        t0 = time.perf_counter()
        judge.ask(qs[0], video)  # compile + vision/prefix warm
        warmup = time.perf_counter() - t0
        t0 = time.perf_counter()
        for q in qs:
            judge.ask(q, video)
        per_q = (time.perf_counter() - t0) / len(qs)
        print(f"{label:14s}: {per_q*1e3:8.1f} ms/question steady state "
              f"({len(qs)} questions; first incl. compile {warmup:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()

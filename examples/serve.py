"""Throughput-oriented scoring loop: watch a directory, score every video.

Demonstrates the production serving shape: host decode pipelined ahead of
device compute (``data.dataset.prefetch``), bucketed static shapes, and the
north-star clips/sec counter (``utils.profiling.Throughput``).

    python examples/serve.py --model-path /path/to/MJ-VIDEO-2B \
        --videos dir_of_mp4s --caption-file captions.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--videos", required=True, help="directory of videos")
    ap.add_argument("--caption-file", default=None,
                    help="json {filename: caption}; default caption otherwise")
    ap.add_argument("--num-segments", type=int, default=8)
    ap.add_argument("--max-num", type=int, default=1,
                    help="dynamic-tiling ceiling per frame")
    ap.add_argument("--workers", type=int, default=4,
                    help="decode-pool workers (0 = single prefetch thread)")
    ap.add_argument("--device-preprocess", action="store_true",
                    help="raw uint8 frames in; resize+tile+normalize on MXU")
    ap.add_argument("--quant", default=None,
                    choices=["int8", "int8-vit", "int8-wo", "int4-wo"],
                    help="serving quantization: w8a8 everywhere (int8), "
                         "vision tower only (int8-vit), weight-only "
                         "w8a16 (int8-wo) or weight-only int4 (int4-wo)")
    ap.add_argument("--out", default="scores.jsonl")
    args = ap.parse_args()

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from mjvideo_tpu.data.dataset import pool_map, prefetch
    from mjvideo_tpu.eval import RewardScorer
    from mjvideo_tpu.utils.checkpoint import load_reward_model
    from mjvideo_tpu.utils.profiling import Throughput, enable_compilation_cache

    enable_compilation_cache()
    cfg, params = load_reward_model(args.model_path, dtype=jnp.bfloat16)
    tok = AutoTokenizer.from_pretrained(args.model_path,
                                        trust_remote_code=True, use_fast=False)
    scorer = RewardScorer(cfg, params, tok,
                          gating_pattern=cfg.gating_token_pattern,
                          device_preprocess=args.device_preprocess,
                          device_max_num=(args.max_num
                                          if args.device_preprocess else 1),
                          quant=args.quant)

    captions = {}
    if args.caption_file:
        with open(args.caption_file) as f:
            captions = json.load(f)

    videos = sorted(
        f for f in os.listdir(args.videos)
        if f.lower().endswith((".mp4", ".webm", ".avi", ".mov"))
    )

    def prep(name):
        caption = captions.get(name, "a generated video")
        return name, scorer.prepare_clip(
            os.path.join(args.videos, name), caption,
            num_segments=args.num_segments, max_num=args.max_num,
        )

    def prepared():
        # N-worker decode pool (measured 6.5 clips/s e2e vs 1.0 round 2 —
        # docs/PERF.md); 0 falls back to the single prefetch thread.
        if args.workers > 0:
            yield from pool_map(prep, videos, num_workers=args.workers)
        else:
            yield from prefetch(map(prep, videos), 2)

    tp = Throughput()
    with open(args.out, "a") as out:
        for name, (pixels, ids, gpos) in prepared():
            res = scorer.score_batch(pixels, [ids], [gpos])
            rec = {
                "video": name,
                "score": float(res.score[0]),
                "aspect_scores": [float(x) for x in res.aspect_scores[0]],
            }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            rate = tp.update(1)
            print(f"{name}: {rec['score']:+.4f}  ({rate:.2f} clips/s)")
    print(f"done: {tp.total} clips, avg {tp.average():.2f} clips/s")


if __name__ == "__main__":
    main()

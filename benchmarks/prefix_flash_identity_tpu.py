"""On-chip token-identity A/B: prefix-cached vs full-prompt judge decode.

VERDICT r3 next-5 done criterion: with the suffix continuation now running
through the SAME Pallas flash kernel as a full-prompt prefill (per-row
``q_offset``, ``generate._layer_with_cache``), greedy decode must be
token-identical between the prefix-cached and full-prompt paths for all
four local judge families ON THE TPU — kernel choice can no longer flip a
greedy tie.  Random-init bf16 weights at real 2B-class dims: the answers
are garbage text, but identity is exactly the property under test (and
random logits make ties/near-ties MORE likely, a harsher test than a
trained checkpoint).

Usage: python benchmarks/prefix_flash_identity_tpu.py [--families all]
"""

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

QUESTIONS = [
    "Rate the temporal coherence of the video.",
    "Rate the alignment between the video and its caption.",
    "Rate the visual quality of the frames.",
    "Rate the safety of the content.",
]


def _write_video(path, frames, size):
    import cv2

    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (size, size))
    rng = np.random.default_rng(0)
    for _ in range(frames * 4):
        w.write(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    w.release()


def _judges(family, frames, new_tokens):
    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.data.prompts import ByteTokenizer

    tok = ByteTokenizer()
    kw = dict(num_segments=frames, max_new_tokens=new_tokens)
    if family == "internvl":
        from mjvideo_tpu.configs import mjvideo_2b_config
        from mjvideo_tpu.data.prompts import rebase_img_context_id
        from mjvideo_tpu.eval.judges import InternVLJudge
        from mjvideo_tpu.models.internvl import init_chat_params

        # the scatter id comes from the tokenizer (README.md:105 recipe)
        cfg = rebase_img_context_id(
            mjvideo_2b_config(), ByteTokenizer()).chat
        params = init_chat_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
        mk = lambda on: InternVLJudge(cfg, params, tok,  # noqa: E731
                                      prefix_cache=on, **kw)
        return mk, 448
    if family == "qwen2vl":
        from mjvideo_tpu.eval.judges import Qwen2VLJudge
        from mjvideo_tpu.models.qwen2vl import (
            Qwen2VLConfig,
            init_qwen2vl_params,
        )

        cfg = Qwen2VLConfig()
        params = init_qwen2vl_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        mk = lambda on: Qwen2VLJudge(cfg, params, tok,  # noqa: E731
                                     prefix_cache=on, **kw)
        return mk, 224
    import dataclasses

    if family == "minicpmv":
        from mjvideo_tpu.eval.judges import MiniCPMVJudge
        from mjvideo_tpu.models.minicpmv import (
            MiniCPMVConfig,
            init_minicpmv_params,
        )

        # MiniCPM-V-2.6 is 8B-class: full-depth random-init bf16 plus two
        # judges' caches exceeds one chip's HBM, so truncate DEPTH only —
        # per-layer kernel shapes (the property under test) stay real.
        base = MiniCPMVConfig()
        cfg = dataclasses.replace(
            base,
            vision=dataclasses.replace(base.vision, num_hidden_layers=4),
            text=dataclasses.replace(base.text, num_hidden_layers=4),
        )
        params = init_minicpmv_params(jax.random.PRNGKey(0), cfg,
                                      dtype=jnp.bfloat16)
        mk = lambda on: MiniCPMVJudge(cfg, params, tok,  # noqa: E731
                                      prefix_cache=on, **kw)
        return mk, 224
    from mjvideo_tpu.eval.judges import CogVLM2Judge
    from mjvideo_tpu.models.cogvlm2 import CogVLM2Config, init_cogvlm2_params

    # CogVLM2 is 19B-class (dual expert): same depth-only truncation.
    base = CogVLM2Config()
    cfg = dataclasses.replace(
        base,
        vision=dataclasses.replace(base.vision, num_hidden_layers=4),
        text=dataclasses.replace(base.text, num_hidden_layers=4),
    )
    params = init_cogvlm2_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    mk = lambda on: CogVLM2Judge(cfg, params, tok,  # noqa: E731
                                 prefix_cache=on, **kw)
    return mk, base.vision.image_size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="all",
                    help="comma list of internvl,qwen2vl,minicpmv,cogvlm2")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=24)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"devices: {jax.devices()}", flush=True)

    fams = (["internvl", "qwen2vl", "minicpmv", "cogvlm2"]
            if args.families == "all" else args.families.split(","))
    all_ok = True
    for fam in fams:
        t0 = time.perf_counter()
        mk, vid_size = _judges(fam, args.frames, args.new_tokens)
        tmp = tempfile.mkdtemp()
        video = f"{tmp}/clip.mp4"
        _write_video(video, args.frames, vid_size)
        video2 = f"{tmp}/clip2.mp4"
        _write_video(video2, args.frames, vid_size)
        j_on, j_off = mk(True), mk(False)
        ok = True
        for q in QUESTIONS:
            a_on = j_on.ask(q, video)
            a_off = j_off.ask(q, video)
            same = a_on == a_off
            ok &= same
            if not same:
                print(f"  MISMATCH [{fam}] {q!r}:\n    cached={a_on!r}\n"
                      f"    full  ={a_off!r}", flush=True)
        # B=2 pair ask: two stacked prefix states, per-row q_offset rows
        # in ONE batched flash continuation (the judge_pair shape)
        b_on = j_on.ask_batch(QUESTIONS[0], [video, video2])
        b_off = j_off.ask_batch(QUESTIONS[0], [video, video2])
        if b_on != b_off:
            ok = False
            print(f"  MISMATCH [{fam}] pair ask_batch:\n    cached={b_on!r}"
                  f"\n    full  ={b_off!r}", flush=True)
        all_ok &= ok
        print(f"{fam:10s}: token-identity "
              f"{'OK' if ok else 'FAILED'} over {len(QUESTIONS)} questions "
              f"({time.perf_counter() - t0:.0f}s incl. compiles)",
              flush=True)
    print("IDENTITY_OK" if all_ok else "IDENTITY_FAILED", flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()

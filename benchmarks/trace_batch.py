"""Device-trace the full reward forward at a given batch and dump the top
HLO ops by total device time (per clip), to locate the batch-4 regression
(VERDICT r2 weak #1) at op granularity.

Usage: python benchmarks/trace_batch.py --batch 4 [--iters 3] [--top 40]
"""

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def parse_xspace(logdir):
    """xplane.pb -> {event_name: total_duration_ps} for the device plane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    totals = defaultdict(int)
    for plane in xs.planes:
        name = plane.name.lower()
        if not ("tpu" in name or "device" in name) or "host" in name:
            continue
        ev_names = dict(plane.event_metadata.items())
        for line in plane.lines:
            lname = line.name.lower()
            # keep op-level lines, skip step/module summary lines
            if "step" in lname or "module" in lname:
                continue
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                if md is None:
                    continue
                totals[md.name] += ev.duration_ps
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache, trace

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_2b_config
    from mjvideo_tpu.models.reward import init_reward_params, reward_forward

    cfg = mjvideo_2b_config()
    c = cfg.chat
    dtype = jnp.bfloat16
    params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    B, frames, text_len = args.batch, 8, 64
    T = c.num_image_token * frames + text_len
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(
        size=(B * frames, c.vision.image_size, c.vision.image_size, 3)),
        dtype)
    ids = np.full((B, T), 11, np.int64)
    ids[:, 8:8 + c.num_image_token * frames] = c.img_context_token_id
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    gpos = jnp.full((B,), T - 6, jnp.int32)

    fwd = jax.jit(lambda p, pv, i, m, g: reward_forward(
        p, cfg, pv, i, m, g, attn_impl="auto", remat=False).score)
    np.asarray(fwd(params, pix, ids, mask, gpos))  # compile + warm

    logdir = tempfile.mkdtemp(prefix=f"trace_b{B}_")
    with trace(logdir):
        for _ in range(args.iters):
            out = fwd(params, pix, ids, mask, gpos)
        np.asarray(out)

    totals = parse_xspace(logdir)
    per_clip = {k: v / 1e9 / args.iters / B for k, v in totals.items()}  # ms
    total = sum(per_clip.values())
    print(f"batch {B}: {total:.1f} ms/clip device time over "
          f"{len(per_clip)} ops  (logdir {logdir})")
    for name, ms in sorted(per_clip.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms:8.3f} ms/clip  {name[:110]}")


if __name__ == "__main__":
    main()

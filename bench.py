"""Benchmark: 8-frame clips/sec/chip reward scoring (the north-star metric).

Runs the flagship MJ-VIDEO-2B reward forward (InternViT-300M + InternLM2-1.8B
+ MoE head) in bf16 with the Pallas flash-attention path on whatever
accelerator is present, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the driver-set north star of >=50 clips/sec on v5e-8
(BASELINE.json) = 6.25 clips/sec/chip.  The reference publishes no throughput
numbers at all (SURVEY.md §6).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_CLIPS_PER_SEC_PER_CHIP = 50.0 / 8.0  # north star on v5e-8


def _backend_responds() -> bool:
    """Probe TPU backend init in a child process with a timeout.

    The axon tunnel can wedge so that device init blocks FOREVER (observed:
    >1h), and the plugin ignores ``JAX_PLATFORMS=cpu`` set via env — so a
    wedged tunnel would leave the driver with no JSON line at all.  A child
    process takes the hang instead of us; on timeout the parent pins itself
    to CPU and reports the labeled CPU fallback.
    """
    import subprocess

    timeout = float(os.environ.get("BENCH_BACKEND_TIMEOUT", 600))
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    if not _backend_responds():
        jax.config.update("jax_platforms", "cpu")
        print("bench: TPU backend unresponsive, falling back to CPU",
              file=sys.stderr, flush=True)

    # Persistent compile cache: repeated bench runs skip the ~5-min remote
    # TPU compile.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from mjvideo_tpu.configs import (
        mjvideo_2b_config,
        mjvideo_4b_config,
        tiny_test_config,
    )
    from mjvideo_tpu.models.reward import init_reward_params, reward_forward

    on_tpu = jax.default_backend() == "tpu"
    model = os.environ.get("BENCH_MODEL", "2b")  # 2b (headline) | 4b
    # CPU fallback keeps the bench runnable anywhere (tiny model, labeled).
    if not on_tpu:
        cfg = tiny_test_config()
    elif model == "4b":
        cfg = mjvideo_4b_config()
    else:
        cfg = mjvideo_2b_config()
    attn_impl = os.environ.get("BENCH_ATTN", "auto")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    frames = int(os.environ.get("BENCH_FRAMES", 8))
    batch = int(os.environ.get("BENCH_BATCH", 1))  # small batches measured fastest per-clip on v5e (docs/PERF.md)
    text_len = int(os.environ.get("BENCH_TEXT_LEN", 64))
    # Tiles per frame: 1 = the standard reward config; >1 exercises the
    # high-res dynamic-tiling path (BASELINE.json config #4, e.g. 13 for
    # max_num=12 + thumbnail).
    tiles = int(os.environ.get("BENCH_TILES", 1))
    frames = frames * tiles

    c = cfg.chat
    n_img = c.num_image_token * frames
    T = n_img + text_len

    params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    # Opt-in w8a8 serving mode (ops/quant.py): int8 weights + dynamic
    # activation quantization on the MXU's double-rate int8 path.
    quant = os.environ.get("BENCH_QUANT", "")
    if quant:
        from mjvideo_tpu.ops.quant import quantize_params_mode

        params = quantize_params_mode(params, quant)

    rng = np.random.default_rng(0)
    pix = jnp.asarray(
        rng.normal(size=(batch * frames, c.vision.image_size,
                         c.vision.image_size, 3)),
        dtype,
    )
    ids = np.full((batch, T), 11, np.int64)
    ids[:, 8:8 + n_img] = c.img_context_token_id
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones((batch, T), jnp.int32)
    gating_pos = jnp.full((batch,), T - 6, jnp.int32)

    @jax.jit
    def fwd(params, pix, ids, mask, gating_pos):
        return reward_forward(
            params, cfg, pix, ids, mask, gating_pos,
            attn_impl=attn_impl, remat=False,
        ).score

    # compile + warmup (np.asarray forces materialization — on the axon
    # remote platform block_until_ready can return before execution).
    np.asarray(fwd(params, pix, ids, mask, gating_pos))

    iters = int(os.environ.get("BENCH_ITERS", 20 if on_tpu else 2))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, pix, ids, mask, gating_pos)
    np.asarray(out)
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    mode_label = {"": "bf16", "int8": "w8a8", "int8-vit": "w8a8-vit",
                  "int8-wo": "w8a16", "int4-wo": "w4a16"}.get(quant, quant)
    result = {
        "metric": f"8-frame clips/sec/chip reward scoring "
                  f"(MJ-VIDEO-{model.upper()} {mode_label})"
                  if on_tpu else
                  "clips/sec/chip reward scoring (tiny cfg, CPU fallback)",
        "value": round(clips_per_sec, 3),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC_PER_CHIP,
                             3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({
            "metric": "bench error",
            "value": 0.0,
            "unit": "clips/s/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
        sys.exit(1)

"""Score on chip with the IMPORTED full-size 2B weights (VERDICT r2 #1).

Closes the last untested link of the reference quickstart contract
(``/root/reference/README.md:71-128``: released safetensors -> model ->
score): round 2 validated export -> safetensors -> import bit-exact on CPU
and bf16-vs-fp32 fidelity on chip, but the on-chip run re-initialized the
weights on-device instead of uploading the imported tree.  This script runs
the full path end-to-end:

  1. init full 2B fp32 params on host CPU (PRNGKey(0))
  2. export -> safetensors on disk -> load -> import (the published-weight
     code path, ``utils/checkpoint.py: import_reward_checkpoint``)
  3. CPU fp32 oracle forward -> score
  4. cast imported tree to bf16, CHUNKED upload to the TPU (the axon tunnel
     wedges on one 4.2GB device_put; ~32MB slices with per-chunk sync are
     reliable), with per-leaf strided readback spot-checks (bit-exact)
  5. bf16 forward on chip with the UPLOADED tree -> score
  6. PASS if |imported-bf16-on-chip - fp32-cpu| < 1e-2

Run:  python benchmarks/imported_weights_tpu.py [--chunk-mb 32] [--skip-cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _example_inputs(cfg):
    """Same inputs as benchmarks/real_dims_tpu.py (rng seed 3)."""
    ch = cfg.chat
    rng = np.random.default_rng(3)
    B, F = 1, 2
    n_img = ch.num_image_token * F
    T = n_img + 16
    pix = rng.normal(size=(B * F, ch.vision.image_size,
                           ch.vision.image_size, 3)).astype(np.float32)
    ids = rng.integers(10, 200, size=(B, T))
    ids[0, 3:3 + n_img] = ch.img_context_token_id
    mask = np.ones((B, T), np.int32)
    gpos = np.array([T - 6])
    return pix, ids.astype(np.int32), mask, gpos.astype(np.int32)


def chunked_device_put(tree, device, chunk_bytes, log=print):
    """Upload a numpy pytree leaf-by-leaf in ~chunk_bytes slices along axis 0,
    reassembling each leaf on-device; returns the device tree plus transfer
    stats.  Each chunk is synced before the next (one in-flight transfer —
    larger windows wedge this tunnel)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(tree)
    total = sum(x.nbytes for x in leaves)
    done = 0
    t0 = time.perf_counter()
    out = []
    for i, x in enumerate(leaves):
        if x.nbytes <= chunk_bytes or x.ndim == 0:
            parts = [x]
        else:
            rows_per = max(1, int(chunk_bytes // max(1, x[0:1].nbytes)))
            parts = [x[j:j + rows_per] for j in range(0, x.shape[0],
                                                      rows_per)]
        dparts = []
        for p in parts:
            d = jax.device_put(p, device)
            d.block_until_ready()
            done += p.nbytes
            dparts.append(d)
        leaf = dparts[0] if len(dparts) == 1 else jnp.concatenate(dparts, 0)
        leaf.block_until_ready()
        out.append(leaf)
        el = time.perf_counter() - t0
        rate = done / el / 1e6
        eta = (total - done) / max(done / el, 1)
        log(f"  [{i+1}/{len(leaves)}] {done/1e6:8.1f}/{total/1e6:.1f} MB "
            f"({rate:6.1f} MB/s, eta {eta/60:5.1f} min)")
    return jax.tree.unflatten(treedef, out), total, time.perf_counter() - t0


def spot_check(host_tree, dev_tree, n=1024, log=print):
    """Bit-exact strided readback comparison per leaf (transport integrity
    without a full D2H of the 2.1GB tree)."""
    import jax

    hl = jax.tree.leaves(host_tree)
    dl = jax.tree.leaves(dev_tree)
    bad = 0
    for h, d in zip(hl, dl):
        hv = h.reshape(-1)
        stride = max(1, hv.size // n)
        idx = np.arange(0, hv.size, stride)
        dv = np.asarray(d.reshape(-1)[::stride])[: idx.size]
        if not (dv.view(np.uint16) == hv[idx].view(np.uint16)).all():
            bad += 1
    log(f"spot-check: {len(hl)} leaves, {bad} mismatching")
    return bad == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-mb", type=int, default=32)
    ap.add_argument("--skip-cpu", action="store_true",
                    help="reuse the recorded CPU fp32 oracle score")
    ap.add_argument("--workdir", default="/tmp/mjv_import_probe")
    args = ap.parse_args()

    from mjvideo_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mjvideo_tpu.configs import mjvideo_2b_config
    from mjvideo_tpu.models import reward
    from mjvideo_tpu.utils import checkpoint as ckpt
    from mjvideo_tpu.utils import export as exp

    cfg = mjvideo_2b_config()
    pix, ids, mask, gpos = _example_inputs(cfg)
    cpu = jax.devices("cpu")[0]
    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    assert tpu, "no accelerator visible"
    tpu = tpu[0]

    os.makedirs(args.workdir, exist_ok=True)
    st_path = os.path.join(args.workdir, "model.safetensors")

    # --- 1-2: init on host CPU, export -> safetensors -> import ---------
    print("[1] init full 2B fp32 on host CPU ...", flush=True)
    with jax.default_device(cpu):
        params32 = reward.init_reward_params(jax.random.PRNGKey(0), cfg,
                                             dtype=jnp.float32)
        params32 = jax.tree.map(np.asarray, params32)

    print("[2] export -> safetensors -> import ...", flush=True)
    state = exp.export_reward_checkpoint(params32, cfg)
    exp.save_safetensors(state, st_path)
    del state
    loaded = ckpt.load_safetensors_dir(args.workdir)
    with jax.default_device(cpu):
        imported = ckpt.import_reward_checkpoint(loaded, cfg,
                                                 dtype=jnp.float32)
        imported = jax.tree.map(np.asarray, imported)
    del loaded

    same = all(
        np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(params32), jax.tree.leaves(imported))
    )
    print(f"    import round-trip bit-exact on CPU: {same}")
    del params32

    # --- 3: CPU fp32 oracle score ---------------------------------------
    if args.skip_cpu:
        score_cpu = None
    else:
        print("[3] CPU fp32 oracle forward ...", flush=True)
        with jax.default_device(cpu):
            t0 = time.perf_counter()
            out = reward.reward_forward(
                jax.tree.map(lambda x: jnp.asarray(x), imported), cfg,
                jnp.asarray(pix), jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(gpos), attn_impl="xla", remat=False)
            score_cpu = float(np.asarray(out.score)[0])
            print(f"    fp32 CPU score = {score_cpu:.6f} "
                  f"({time.perf_counter()-t0:.0f}s)")

    # --- 4: bf16 cast + chunked upload ----------------------------------
    print("[4] cast imported tree to bf16 + chunked upload ...", flush=True)
    with jax.default_device(cpu):
        host_bf16 = jax.tree.map(
            lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16)), imported)
    del imported
    dev_tree, total, el = chunked_device_put(
        host_bf16, tpu, args.chunk_mb * 1024 * 1024)
    print(f"    uploaded {total/1e9:.2f} GB in {el/60:.1f} min "
          f"({total/el/1e6:.1f} MB/s)")
    ok = spot_check(host_bf16, dev_tree)
    del host_bf16

    # --- 5: bf16 forward on chip with the UPLOADED tree -----------------
    print("[5] bf16 forward on chip with the uploaded imported tree ...",
          flush=True)
    fwd = jax.jit(lambda p, pv, i, m, g: reward.reward_forward(
        p, cfg, pv, i, m, g, attn_impl="auto", remat=False).score)
    score_tpu = float(np.asarray(fwd(
        dev_tree, jax.device_put(jnp.asarray(pix, jnp.bfloat16), tpu),
        jax.device_put(jnp.asarray(ids), tpu),
        jax.device_put(jnp.asarray(mask), tpu),
        jax.device_put(jnp.asarray(gpos), tpu)))[0])
    print(f"    imported-bf16 on-chip score = {score_tpu:.6f}")

    if score_cpu is not None:
        d = abs(score_tpu - score_cpu)
        print(f"|imported-bf16-on-chip - fp32-cpu| = {d:.2e} "
              f"({'PASS' if d < 1e-2 else 'FAIL'} vs 1e-2), "
              f"transport spot-check {'PASS' if ok else 'FAIL'}")
    else:
        print(f"(fp32 CPU oracle skipped; round-2 recorded 0.520970; "
              f"delta = {abs(score_tpu - 0.520970):.2e}, "
              f"transport spot-check {'PASS' if ok else 'FAIL'})")


if __name__ == "__main__":
    main()

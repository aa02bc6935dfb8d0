"""int4 weight-only quantization (ops/quant4.py, serving mode 'int4-wo').

Capability rationale: the reference's largest local judge is
InternVL2-26B (``eval_overall_internvl2_26b.py``); int4 + group scales
is what fits its ~25.5B-parameter tree on one 16GB v5e chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.models.reward import init_reward_params
from mjvideo_tpu.ops.matmul import dot, dot_f32
from mjvideo_tpu.ops.quant import is_quantized, quantize_params_mode
from mjvideo_tpu.ops.quant4 import (
    Q4Kernel,
    dequantize_kernel_q4,
    dot_q4,
    dot_q4_f32,
    quantize_kernel_q4,
    quantize_params_int4,
)


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_reward_params(jax.random.PRNGKey(0), cfg)


def test_pack_roundtrip_exact_on_grid():
    """Values already on the int4 grid survive quantize->dequantize
    bit-exactly (scale bf16 rounding aside: use power-of-two scales)."""
    rng = np.random.default_rng(0)
    g = 32
    # per-group scale 2^-3, values k * scale for k in [-8, 7]
    vals = rng.integers(-7, 8, size=(2 * g * 2, 64)).astype(np.float32)
    # force each group's amax to exactly 7 so scale = 1.0 in bf16
    vals[0, :] = 7.0
    vals[g, :] = 7.0
    vals[2 * g, :] = 7.0
    vals[3 * g, :] = 7.0
    k4 = quantize_kernel_q4(jnp.asarray(vals), group_size=g)
    back = np.asarray(dequantize_kernel_q4(k4))
    np.testing.assert_array_equal(back, vals)


def test_group_scale_error_bound():
    """|dequant - w| <= half a step per group (+ bf16 scale rounding)."""
    rng = np.random.default_rng(1)
    g = 32
    w = rng.normal(size=(4 * g, 48)).astype(np.float32)
    k4 = quantize_kernel_q4(jnp.asarray(w), group_size=g)
    back = np.asarray(dequantize_kernel_q4(k4))
    grouped = w.reshape(-1, g, 48)
    step = np.abs(grouped).max(axis=1) / 7.0  # (G, N)
    # slack: the stored scale is bf16, so dequant adds up to
    # |q|_max * eps_bf16 = 8 * 2^-8 ~= 0.032 steps on top of the
    # half-step rounding bound
    bound = (0.5 + 0.04) * np.repeat(step, g, axis=0)
    assert (np.abs(back - w) <= bound + 1e-7).all()


def test_dot_q4_matches_dequant_and_dispatch():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    k4 = quantize_kernel_q4(w, group_size=64)
    deq = dequantize_kernel_q4(k4, jnp.float32)
    ref = np.asarray(x @ deq)
    out = np.asarray(dot_q4_f32(x, k4))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # error vs the TRUE weights: int4 rounding is ~step/sqrt(12) per
    # weight = ~10% relative per matmul output at these dims (gaussian
    # weights, group 64) — the expected int4 regime, not a defect
    rel = np.linalg.norm(out - np.asarray(x @ w)) / np.linalg.norm(
        np.asarray(x @ w))
    assert rel < 0.15, rel
    # ops.matmul dispatch routes Q4Kernel
    np.testing.assert_array_equal(np.asarray(dot(x, k4)),
                                  np.asarray(dot_q4(x, k4)))
    assert dot_f32(x, k4).dtype == jnp.float32


def test_pallas_decode_kernel_matches_xla():
    """The VMEM-dequantizing Pallas path == the XLA path (interpret)."""
    from mjvideo_tpu.ops.quant4 import _w4_matmul_pallas

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    k4 = quantize_kernel_q4(w, group_size=64)
    ref = np.asarray(dot_q4_f32(x, k4))
    got = np.asarray(_w4_matmul_pallas(x, k4.packed, k4.scale,
                                       block_n=128, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_int4_mode_scorer_and_score_fn(cfg, params):
    """'int4-wo' wires through quantize_params_mode, the scorer scores
    finite, and score_fn stays differentiable (weight-only)."""
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.scorer import RewardScorer

    qt = quantize_params_int4(params, min_elements=128, group_size=16)
    assert is_quantized(qt)
    assert isinstance(
        qt["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"],
        Q4Kernel)
    qm = quantize_params_mode(params, "int4-wo", min_elements=128)
    assert is_quantized(qm)

    tok = ByteTokenizer()
    common = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(256,),
                  gating_pattern=tok.gating_pattern())
    s = RewardScorer(cfg, qt, tok, **common)
    c = cfg.chat
    ids = np.full((c.num_image_token + 12,), 5, np.int32)
    ids[2:2 + c.num_image_token] = c.img_context_token_id
    pix = np.random.default_rng(0).normal(
        size=(1, c.vision.image_size, c.vision.image_size, 3)
    ).astype(np.float32)
    r = s.score_batch(pix, [ids], [len(ids) - 4])
    assert np.isfinite(np.asarray(r.rewards)).all()
    f = s.score_fn(ids, len(ids) - 4)
    grad = jax.grad(f)(jnp.asarray(pix))
    assert np.isfinite(np.asarray(grad)).all()


def test_int4_stacked_kernels_slice_through_scan():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(3, 128, 64)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    qt = quantize_params_int4(
        {"layers": {"attention": {"wq": {"kernel": w}}}},
        min_elements=128, group_size=32)

    def step(c, lyr):
        return c, dot(x, lyr["attention"]["wq"]["kernel"])

    _, ys = jax.lax.scan(step, 0, qt["layers"])
    assert ys.shape == (3, 4, 64)
    for i in range(3):
        ref = np.asarray(x @ np.asarray(
            dequantize_kernel_q4(quantize_kernel_q4(w[i], group_size=32))))
        np.testing.assert_allclose(np.asarray(ys[i]), ref,
                                   rtol=1e-3, atol=1e-3)


def test_int4_checkpoint_roundtrip(tmp_path, params):
    from mjvideo_tpu.utils.checkpoint import restore_pytree, save_pytree

    q = quantize_params_int4(params, min_elements=128, group_size=16)
    save_pytree(str(tmp_path / "q4"), q)
    r = restore_pytree(str(tmp_path / "q4"))
    assert is_quantized(r)
    k = r["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    assert isinstance(k, Q4Kernel)
    k0 = q["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k0.packed), np.asarray(k.packed))


def test_int4_tree_shards_over_tp_mesh(params):
    from mjvideo_tpu.parallel.mesh import make_mesh, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh(data=4, model=2)
    qt = quantize_params_int4(params, min_elements=128, group_size=16)
    sharded = shard_params(qt, mesh)
    k = qt["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    k_s = sharded["model"]["language_model"]["layers"]["attention"]["wq"][
        "kernel"]
    np.testing.assert_array_equal(np.asarray(k_s.packed),
                                  np.asarray(k.packed))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 2 * k.packed.shape[1])).astype(
        np.float32))
    ref = dot(x, Q4Kernel(packed=k.packed[0], scale=k.scale[0]))
    out = jax.jit(lambda kk: dot(
        x, Q4Kernel(packed=kk.packed[0], scale=kk.scale[0])))(k_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

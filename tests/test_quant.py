"""w8a8 int8 serving quantization (ops/quant.py).

The reference serves bf16 only (``eval_genai_mjvideo.py``); int8 is a
TPU-native capability on top of parity (v5e double-rate int8 MXU path),
strictly opt-in via ``RewardScorer(quant="int8")``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.data.prompts import ByteTokenizer
from mjvideo_tpu.models.reward import init_reward_params
from mjvideo_tpu.ops.matmul import dot, dot_f32
from mjvideo_tpu.ops.quant import (
    QuantKernel,
    dequantize_kernel,
    dot_q8,
    is_quantized,
    quantize_kernel,
    quantize_params_int8,
)


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_reward_params(jax.random.PRNGKey(0), cfg)


def test_dot_q8_accuracy_and_dispatch():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    qk = quantize_kernel(w)
    ref = np.asarray(x @ w)
    out = np.asarray(dot_q8(x, qk))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    # ops.matmul.dot / dot_f32 route QuantKernel to the int8 path
    np.testing.assert_array_equal(np.asarray(dot(x, qk)), out)
    assert dot_f32(x, qk).dtype == jnp.float32


def test_dequantize_bounded_by_column_amax():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    qk = quantize_kernel(jnp.asarray(w))
    back = np.asarray(dequantize_kernel(qk))
    # symmetric per-column: error <= half a quantization step per column
    step = np.abs(w).max(axis=0) / 127.0
    assert (np.abs(back - w) <= 0.5 * step[None, :] + 1e-7).all()


def test_quantize_selection_excludes_heads_and_small(params):
    qt = quantize_params_int8(params, min_elements=128)
    assert is_quantized(qt)
    # big dense kernels swapped
    assert isinstance(
        qt["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"],
        QuantKernel)
    # reward heads / gates / embeddings stay full precision
    assert not is_quantized(qt["aspect_gating"])
    assert not is_quantized(qt["criteria_gating"])
    assert not is_quantized({"r": qt["regression_layer"]})
    assert not isinstance(
        qt["model"]["language_model"]["tok_embeddings"], QuantKernel)
    # default threshold leaves the tiny config untouched (serving sizes
    # clear 1<<16 elements per layer slice; tiny test dims don't)
    assert not is_quantized(quantize_params_int8(params))


def test_stacked_kernels_slice_through_scan():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(3, 128, 64)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    qt = quantize_params_int8({"layers": {"attention": {"wq": {"kernel": w}}}},
                              min_elements=128)

    def step(c, lyr):
        return c, dot(x, lyr["attention"]["wq"]["kernel"])

    _, ys = jax.lax.scan(step, 0, qt["layers"])
    assert ys.shape == (3, 4, 64)
    for i in range(3):
        ref = np.asarray(x @ w[i])
        rel = np.linalg.norm(np.asarray(ys[i]) - ref) / np.linalg.norm(ref)
        assert rel < 0.02, (i, rel)


def test_scorer_int8_matches_fp32(cfg, params):
    from mjvideo_tpu.eval.scorer import RewardScorer

    tok = ByteTokenizer()
    common = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(256,),
                  gating_pattern=tok.gating_pattern())
    s0 = RewardScorer(cfg, params, tok, **common)
    s1 = RewardScorer(cfg, quantize_params_int8(params, min_elements=128),
                      tok, **common)
    c = cfg.chat
    ids = np.full((c.num_image_token + 12,), 5, np.int32)
    ids[2:2 + c.num_image_token] = c.img_context_token_id
    pix = np.random.default_rng(0).normal(
        size=(1, c.vision.image_size, c.vision.image_size, 3)
    ).astype(np.float32)
    r0 = s0.score_batch(pix, [ids], [len(ids) - 4])
    r1 = s1.score_batch(pix, [ids], [len(ids) - 4])
    assert np.max(np.abs(np.asarray(r0.rewards) - np.asarray(r1.rewards))) < 2e-2
    assert abs(float(r0.score[0]) - float(r1.score[0])) < 1e-2


def test_scorer_quant_kwarg_and_score_fn_guard(cfg, params):
    from mjvideo_tpu.eval.scorer import RewardScorer

    tok = ByteTokenizer()
    with pytest.raises(ValueError):
        RewardScorer(cfg, params, tok, quant="fp4",
                     gating_pattern=tok.gating_pattern())
    s = RewardScorer(cfg, params, tok, quant="int8", attn_impl="xla",
                     dtype=jnp.float32, length_buckets=(256,),
                     gating_pattern=tok.gating_pattern())
    assert s.quant == "int8"
    # reward-feedback training is full-precision only (round() grad is 0)
    sq = RewardScorer(cfg, quantize_params_int8(params, min_elements=128),
                      tok, attn_impl="xla", dtype=jnp.float32,
                      length_buckets=(256,),
                      gating_pattern=tok.gating_pattern())
    ids = np.full((cfg.chat.num_image_token + 12,), 5, np.int32)
    ids[2:2 + cfg.chat.num_image_token] = cfg.chat.img_context_token_id
    with pytest.raises(ValueError):
        sq.score_fn(ids, gating_pos=len(ids) - 4)


def test_quantized_judge_backbone_decodes():
    """Judge decode with a quantized tree: the cached generate loop
    (prefill + single-token steps) compiles with QuantKernel leaves and
    the logits stay close to full precision.  Covers the weight-bound
    serving path ``_maybe_quantize`` enables on the four local judges."""
    from mjvideo_tpu.configs import LLMConfig
    from mjvideo_tpu.models.qwen2vl import (
        Qwen2VLConfig,
        Qwen2VLVisionConfig,
        get_rope_index,
        greedy_generate,
        init_qwen2vl_params,
        lm_logits,
        qwen2vl_forward,
    )

    cfg = Qwen2VLConfig(
        vision=Qwen2VLVisionConfig(
            depth=1, embed_dim=32, num_heads=4, mlp_ratio=2, patch_size=4,
            temporal_patch_size=2, spatial_merge_size=2, hidden_size=48),
        text=LLMConfig(
            architecture="llama", vocab_size=256, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=3, num_key_value_heads=1,
            rope_theta=10000.0, rms_norm_eps=1e-6, pad_token_id=0,
            max_position_embeddings=512, bias=True),
        mrope_section=(2, 3, 3), image_token_id=250, video_token_id=251,
        vision_start_token_id=248, vision_end_token_id=249,
    )
    p = init_qwen2vl_params(jax.random.PRNGKey(0), cfg)
    pq = quantize_params_int8(p, min_elements=128)
    assert is_quantized(pq)

    ids = np.asarray([[3, 5, 7, 11, 13]], np.int64)
    pos, _ = get_rope_index(ids, None, cfg)
    args = (jnp.asarray(ids, jnp.int32), jnp.ones((1, 5), jnp.int32),
            jnp.asarray(pos))
    l0 = np.asarray(lm_logits(
        p, cfg, qwen2vl_forward(p, cfg, *args, attn_impl="xla",
                                remat=False)))
    l1 = np.asarray(lm_logits(
        pq, cfg, qwen2vl_forward(pq, cfg, *args, attn_impl="xla",
                                 remat=False)))
    rel = np.linalg.norm(l1 - l0) / max(np.linalg.norm(l0), 1e-9)
    assert rel < 0.05, rel

    toks = greedy_generate(pq, cfg, ids, pos, max_new_tokens=4,
                           eos_token_id=-1, attn_impl="xla")
    assert len(toks) == 4


def test_judge_maybe_quantize_guard():
    from mjvideo_tpu.eval.judges import _maybe_quantize

    assert _maybe_quantize({"x": 1}, None) == {"x": 1}
    with pytest.raises(ValueError):
        _maybe_quantize({}, "fp4")


def test_vit_scope_quantizes_vision_only(cfg, params):
    """'int8-vit': vision tower kernels swap, the decoder and projector
    stay full precision (they carry ~97% of the full-int8 error)."""
    from mjvideo_tpu.ops.quant import quantize_params_mode

    qt = quantize_params_int8(params, min_elements=128, scope="vit")
    m = qt["model"]
    assert is_quantized(m["vision_model"])
    assert not is_quantized(m["language_model"])
    assert not is_quantized(m["mlp1"])
    with pytest.raises(ValueError):
        quantize_params_int8(params, scope="bogus")
    # the named-mode entry point routes the same way
    qm = quantize_params_mode(params, "int8-vit", min_elements=128)
    assert is_quantized(qm["model"]["vision_model"])
    assert not is_quantized(qm["model"]["language_model"])
    with pytest.raises(ValueError):
        quantize_params_mode(params, "int4")


def test_scorer_int8_vit_close_to_fp32(cfg, params):
    """ViT-only quantization perturbs scores far less than full int8."""
    from mjvideo_tpu.eval.scorer import RewardScorer

    tok = ByteTokenizer()
    common = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(256,),
                  gating_pattern=tok.gating_pattern())
    s0 = RewardScorer(cfg, params, tok, **common)
    s1 = RewardScorer(cfg, quantize_params_int8(params, min_elements=128,
                                                scope="vit"),
                      tok, **common)
    c = cfg.chat
    ids = np.full((c.num_image_token + 12,), 5, np.int32)
    ids[2:2 + c.num_image_token] = c.img_context_token_id
    pix = np.random.default_rng(0).normal(
        size=(1, c.vision.image_size, c.vision.image_size, 3)
    ).astype(np.float32)
    r0 = s0.score_batch(pix, [ids], [len(ids) - 4])
    r1 = s1.score_batch(pix, [ids], [len(ids) - 4])
    assert np.max(np.abs(np.asarray(r0.rewards) - np.asarray(r1.rewards))) < 5e-3
    assert abs(float(r0.score[0]) - float(r1.score[0])) < 2e-3


def test_dot_wo_exact_vs_dequant_and_dispatch():
    """Weight-only int8: (x @ qw) * scale matches x @ dequant(qw) up to
    fp32 rounding order (per-column scale factors out of the dot)."""
    from mjvideo_tpu.ops.quant import WOQuantKernel, dot_wo, dot_wo_f32

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    qk = quantize_kernel(w)
    wo = WOQuantKernel(qw=qk.q, scale=qk.scale)
    deq = np.asarray(dequantize_kernel(qk))
    ref = np.asarray(jnp.asarray(x) @ jnp.asarray(deq))
    out = np.asarray(dot_wo_f32(x, wo))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)
    # vs the TRUE weights: weight-rounding error only
    rel = np.linalg.norm(out - np.asarray(x @ w)) / np.linalg.norm(
        np.asarray(x @ w))
    assert rel < 0.01, rel
    # ops.matmul routes WOQuantKernel to the weight-only path
    np.testing.assert_array_equal(np.asarray(dot(x, wo)),
                                  np.asarray(dot_wo(x, wo)))
    assert dot_f32(x, wo).dtype == jnp.float32


def test_int8_wo_mode_and_scorer(cfg, params):
    """'int8-wo' swaps kernels for WOQuantKernel; the scorer accepts the
    mode and its error is activation-free (<= the w8a8 error)."""
    from mjvideo_tpu.eval.scorer import RewardScorer
    from mjvideo_tpu.ops.quant import (WOQuantKernel, quantize_params_int8,
                                       quantize_params_mode)

    qt = quantize_params_int8(params, min_elements=128, weight_only=True)
    assert is_quantized(qt)
    assert isinstance(
        qt["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"],
        WOQuantKernel)
    qm = quantize_params_mode(params, "int8-wo", min_elements=128)
    assert isinstance(
        qm["model"]["vision_model"]["layers"]["mlp"]["fc1"]["kernel"],
        WOQuantKernel)

    tok = ByteTokenizer()
    common = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(256,),
                  gating_pattern=tok.gating_pattern())
    s0 = RewardScorer(cfg, params, tok, **common)
    s1 = RewardScorer(cfg, qt, tok, **common)
    c = cfg.chat
    ids = np.full((c.num_image_token + 12,), 5, np.int32)
    ids[2:2 + c.num_image_token] = c.img_context_token_id
    pix = np.random.default_rng(0).normal(
        size=(1, c.vision.image_size, c.vision.image_size, 3)
    ).astype(np.float32)
    r0 = s0.score_batch(pix, [ids], [len(ids) - 4])
    r1 = s1.score_batch(pix, [ids], [len(ids) - 4])
    assert np.all(np.isfinite(np.asarray(r1.rewards)))
    assert np.max(np.abs(np.asarray(r0.rewards) - np.asarray(r1.rewards))) \
        < 5e-2


def test_score_fn_accepts_weight_only_and_differentiates(cfg, params):
    """score_fn refuses w8a8 trees (activation round() kills gradients)
    but accepts int8-wo: weights are constants, pixels stay
    differentiable — a reward-feedback loop can run against a
    half-HBM reward model."""
    from mjvideo_tpu.eval.scorer import RewardScorer
    from mjvideo_tpu.ops.quant import quantize_params_int8

    tok = ByteTokenizer()
    common = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(256,),
                  gating_pattern=tok.gating_pattern())
    c = cfg.chat
    ids = np.full((c.num_image_token + 12,), 5, np.int32)
    ids[2:2 + c.num_image_token] = c.img_context_token_id

    s_w8a8 = RewardScorer(
        cfg, quantize_params_int8(params, min_elements=128), tok, **common)
    with pytest.raises(ValueError, match="w8a8"):
        s_w8a8.score_fn(ids, len(ids) - 4)

    s_wo = RewardScorer(
        cfg, quantize_params_int8(params, min_elements=128,
                                  weight_only=True), tok, **common)
    f = s_wo.score_fn(ids, len(ids) - 4)
    pix = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, c.vision.image_size, c.vision.image_size, 3)
    ).astype(np.float32))
    g = jax.grad(f)(pix)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_weight_only_checkpoint_roundtrip(tmp_path, params):
    """int8-wo trees revive as WOQuantKernel from the qw/scale key pair."""
    from mjvideo_tpu.ops.quant import WOQuantKernel, quantize_params_int8
    from mjvideo_tpu.utils.checkpoint import restore_pytree, save_pytree

    q = quantize_params_int8(params, min_elements=128, weight_only=True)
    save_pytree(str(tmp_path / "wo"), q)
    r = restore_pytree(str(tmp_path / "wo"))
    assert is_quantized(r)
    k = r["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    assert isinstance(k, WOQuantKernel)
    k0 = q["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k0.qw), np.asarray(k.qw))


def test_quantized_checkpoint_roundtrip(tmp_path, params):
    """A saved w8a8 tree restores WITH its QuantKernel nodes (orbax
    flattens registered dataclasses to dicts; restore_pytree revives
    them so the int8 dispatch survives serve restarts)."""
    from mjvideo_tpu.ops.quant import revive_quant_kernels
    from mjvideo_tpu.utils.checkpoint import restore_pytree, save_pytree

    q = quantize_params_int8(params, min_elements=128)
    save_pytree(str(tmp_path / "q"), q)
    r = restore_pytree(str(tmp_path / "q"))
    assert is_quantized(r)
    k0 = q["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    k1 = r["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    assert isinstance(k1, QuantKernel)
    np.testing.assert_array_equal(np.asarray(k0.q), np.asarray(k1.q))
    np.testing.assert_array_equal(np.asarray(k0.scale), np.asarray(k1.scale))
    # providing the target tree also works (orbax's own typed path)
    r2 = restore_pytree(str(tmp_path / "q"), like=q)
    assert is_quantized(r2)
    # revive is idempotent and leaves unquantized trees alone
    assert revive_quant_kernels(r) is not None
    assert not is_quantized(revive_quant_kernels(params))


def test_quantized_tree_shards_over_tp_mesh(params):
    """TP rules apply through QuantKernel: .../kernel/q inherits the
    column/row spec; the (L,1,N) scale falls back per the divisibility
    guard. Exactness: sharded int8 dot == single-device int8 dot."""
    from mjvideo_tpu.parallel.mesh import make_mesh, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh(data=4, model=2)
    qt = quantize_params_int8(params, min_elements=128)
    sharded = shard_params(qt, mesh)
    wq = qt["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    wq_s = sharded["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    np.testing.assert_array_equal(np.asarray(wq_s.q), np.asarray(wq.q))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, wq.q.shape[1])).astype(np.float32))
    ref = dot(x, QuantKernel(q=wq.q[0], scale=wq.scale[0]))
    out = jax.jit(lambda k: dot(x, QuantKernel(q=k.q[0], scale=k.scale[0])))(
        wq_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # weight-only trees shard the same way (.../kernel/qw hits the same
    # path rules) and stay exact under the mesh
    from mjvideo_tpu.ops.quant import WOQuantKernel

    wo = quantize_params_int8(params, min_elements=128, weight_only=True)
    wo_s = shard_params(wo, mesh)
    k = wo["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    k_s = wo_s["model"]["language_model"]["layers"]["attention"]["wq"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k_s.qw), np.asarray(k.qw))
    ref_wo = dot(x, WOQuantKernel(qw=k.qw[0], scale=k.scale[0]))
    out_wo = jax.jit(
        lambda kk: dot(x, WOQuantKernel(qw=kk.qw[0], scale=kk.scale[0])))(k_s)
    np.testing.assert_allclose(np.asarray(out_wo), np.asarray(ref_wo),
                               rtol=1e-6, atol=1e-6)


# ------------------------------------------------------- group-wise int8

def test_grouped_quantize_bounded_by_group_amax():
    """Group-128 scales bound each weight's rounding error by its GROUP's
    amax — with an injected outlier, per-column quantization smears the
    outlier's step over the whole column while g128 contains it."""
    rng = np.random.default_rng(4)
    w = rng.normal(size=(512, 64)).astype(np.float32) * 0.02
    w[500, :] = 3.0  # one outlier row inflates every column amax
    qk = quantize_kernel(jnp.asarray(w), group_size=128)
    assert qk.scale.shape == (4, 64)
    back = np.asarray(dequantize_kernel(qk))
    grouped = w.reshape(4, 128, 64)
    step = np.abs(grouped).max(axis=1) / 127.0  # (4, 64)
    err = np.abs(back - w).reshape(4, 128, 64)
    assert (err <= 0.5 * step[:, None, :] + 1e-7).all()
    # vs per-column: group error strictly smaller in the outlier-free
    # groups (rows 0-383; the outlier sits in group 3)
    pc = np.asarray(dequantize_kernel(quantize_kernel(jnp.asarray(w))))
    assert np.abs(back - w)[:384].max() < np.abs(pc - w)[:384].max() / 4


def test_grouped_dot_q8_pallas_matches_xla_fallback():
    """The grouped Pallas matmul and the lax.scan fallback are the same
    computation; interpret mode pins them bit-identical off-chip."""
    from mjvideo_tpu.ops.quant import (_q8g_matmul_pallas, _q8g_matmul_xla,
                                       _quantize_rows_grouped)

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(9, 512)).astype(np.float32))
    qk = quantize_kernel(w, group_size=128)
    xq, a_s = _quantize_rows_grouped(x, 4, 128)
    out_p = np.asarray(_q8g_matmul_pallas(xq, a_s, qk.q, qk.scale,
                                          interpret=True))
    out_x = np.asarray(_q8g_matmul_xla(xq, a_s, qk.q, qk.scale))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-6, atol=1e-6)
    # the fused variant (quantize-in-kernel, scratch accumulator) computes
    # the same thing up to fp32 scale-multiplication order
    from mjvideo_tpu.ops.quant import _q8g_matmul_pallas_fused

    out_f = np.asarray(_q8g_matmul_pallas_fused(
        x, qk.q, qk.scale, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out_f, out_x, rtol=1e-5, atol=1e-5)
    # and the public dot routes grouped kernels to the same result
    out_dot = np.asarray(dot_f32(x, qk))
    np.testing.assert_allclose(out_dot, out_x, rtol=1e-6, atol=1e-6)
    # accuracy: grouped w8a8 at least as close as per-column w8a8
    ref = np.asarray(x @ w)
    rel_g = np.linalg.norm(out_dot - ref) / np.linalg.norm(ref)
    rel_c = np.linalg.norm(np.asarray(dot_f32(x, quantize_kernel(w))) - ref) \
        / np.linalg.norm(ref)
    assert rel_g <= rel_c * 1.1, (rel_g, rel_c)


def test_grouped_weight_only_exact_vs_dequant():
    from mjvideo_tpu.ops.quant import WOQuantKernel, dot_wo_f32

    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.normal(size=(5, 256)).astype(np.float32))
    qk = quantize_kernel(w, group_size=64)
    wo = WOQuantKernel(qw=qk.q, scale=qk.scale)
    ref = np.asarray(x @ dequantize_kernel(qk))
    np.testing.assert_allclose(np.asarray(dot_wo_f32(x, wo)), ref,
                               rtol=1e-5, atol=1e-6)


def test_grouped_stacked_kernels_slice_through_scan():
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(3, 256, 128)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    qt = quantize_params_int8(
        {"layers": {"attention": {"wq": {"kernel": w}}}},
        min_elements=128, group_size=64)
    k = qt["layers"]["attention"]["wq"]["kernel"]
    assert k.scale.shape == (3, 4, 128)

    def step(c, lyr):
        return c, dot(x, lyr["attention"]["wq"]["kernel"])

    _, ys = jax.lax.scan(step, 0, qt["layers"])
    for i in range(3):
        ref = np.asarray(x @ w[i])
        rel = np.linalg.norm(np.asarray(ys[i]) - ref) / np.linalg.norm(ref)
        assert rel < 0.02, (i, rel)


def test_mode_parser_suffixes_and_noattn_scope():
    from mjvideo_tpu.ops.quant import QuantKernel as QK
    from mjvideo_tpu.ops.quant import WOQuantKernel, quantize_params_mode

    p = {"feed_forward": {"w1": {"kernel": jnp.zeros((512, 256))}},
         "attention": {"wqkv": {"kernel": jnp.zeros((512, 256))}}}
    q = quantize_params_mode(p, "int8-noattn-g128", min_elements=1024)
    w1 = q["feed_forward"]["w1"]["kernel"]
    assert isinstance(w1, QK) and w1.scale.shape == (4, 256)
    assert not is_quantized({"a": q["attention"]})
    q2 = quantize_params_mode(p, "int8-wo-g128", min_elements=1024)
    assert isinstance(q2["feed_forward"]["w1"]["kernel"], WOQuantKernel)
    q3 = quantize_params_mode(p, "int8-g64", min_elements=1024)
    assert q3["feed_forward"]["w1"]["kernel"].scale.shape[-2] == 8
    # a group that never divides K falls back to per-column
    q4 = quantize_params_mode(p, "int8-g96", min_elements=1024)
    assert q4["feed_forward"]["w1"]["kernel"].scale.shape[-2] == 1
    with pytest.raises(ValueError):
        quantize_params_mode(p, "int8-bogus")
    with pytest.raises(ValueError):
        quantize_params_mode(p, "fp8")


# ------------------------------------------------- outlier decomposition

def test_outlier_decomposition_exact_when_no_rounding():
    """With n_outliers = K every channel routes through the
    full-precision branch: the result must equal x @ dequant(W) exactly
    (the int8 path sees all-zero activations)."""
    from mjvideo_tpu.ops.quant import OutlierQuantKernel, dot_q8_ol_f32

    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(6, 128)).astype(np.float32))
    qk = quantize_kernel(w)
    ok = OutlierQuantKernel(q=qk.q, scale=qk.scale, n_outliers=128)
    ref = np.asarray(x @ dequantize_kernel(qk))
    np.testing.assert_allclose(np.asarray(dot_q8_ol_f32(x, ok)), ref,
                               rtol=1e-5, atol=1e-5)


def test_outlier_decomposition_contains_activation_outlier():
    """An injected activation outlier channel inflates every row's int8
    scale in the plain path; the decomposition routes it full precision
    and stays close to the fp32 result."""
    from mjvideo_tpu.ops.quant import OutlierQuantKernel, dot_q8_ol_f32

    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32) * 0.05)
    x_np = rng.normal(size=(8, 256)).astype(np.float32)
    x_np[:, 100] *= 80.0  # one hot channel dominates every row amax
    x = jnp.asarray(x_np)
    qk = quantize_kernel(w)
    ref = np.asarray(x @ w)
    plain = np.asarray(dot_q8(x, qk))
    ok = OutlierQuantKernel(q=qk.q, scale=qk.scale, n_outliers=4)
    dec = np.asarray(dot_q8_ol_f32(x, ok))
    rel_plain = np.linalg.norm(plain - ref) / np.linalg.norm(ref)
    rel_dec = np.linalg.norm(dec - ref) / np.linalg.norm(ref)
    assert rel_dec < rel_plain / 3, (rel_dec, rel_plain)
    # dispatch: ops.matmul routes the wrapper, and scan slices it
    np.testing.assert_array_equal(
        np.asarray(dot(x, ok)), np.asarray(dec.astype(np.float32)))


def test_outlier_mode_parser_and_scan():
    from mjvideo_tpu.ops.quant import OutlierQuantKernel, quantize_params_mode

    p = {"feed_forward": {"w1": {"kernel": jnp.zeros((3, 512, 256))}}}
    q = quantize_params_mode(p, "int8-noattn-ol16", min_elements=1024)
    k = q["feed_forward"]["w1"]["kernel"]
    assert isinstance(k, OutlierQuantKernel) and k.n_outliers == 16
    rng = np.random.default_rng(10)
    w = jnp.asarray(rng.normal(size=(3, 256, 128)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    qt = quantize_params_mode(
        {"layers": {"attention": {"wq": {"kernel": w}}}},
        "int8-ol8", min_elements=128)

    def step(c, lyr):
        return c, dot(x, lyr["attention"]["wq"]["kernel"])

    _, ys = jax.lax.scan(step, 0, qt["layers"])
    for i in range(3):
        ref = np.asarray(x @ w[i])
        rel = np.linalg.norm(np.asarray(ys[i]) - ref) / np.linalg.norm(ref)
        assert rel < 0.02, (i, rel)


def test_streamed_device_quantize_matches_host(params):
    """``quantize_params_mode(device=...)`` — the serving cold-start path
    (the 8.3B host quantize costs ~44 min, docs/PERF.md round 5) — must
    produce the host path's tree exactly: same structure, same int8/scale
    values (identical trace, just placed), every leaf living on the
    target device."""
    from mjvideo_tpu.ops.quant import quantize_params_mode

    dev = jax.devices("cpu")[0]
    for mode in ("int8-wo", "int8-noattn-g128"):
        host = quantize_params_mode(params, mode)
        dev_tree = quantize_params_mode(params, mode, device=dev)
        h_leaves = jax.tree.leaves(host)
        d_leaves = jax.tree.leaves(dev_tree)
        assert jax.tree.structure(host) == jax.tree.structure(dev_tree)
        assert len(h_leaves) == len(d_leaves)
        for h, d in zip(h_leaves, d_leaves):
            assert d.devices() == {dev}, mode
            np.testing.assert_array_equal(np.asarray(h), np.asarray(d),
                                          err_msg=mode)

    with pytest.raises(ValueError, match="int4-wo"):
        quantize_params_mode(params, "int4-wo", device=dev)

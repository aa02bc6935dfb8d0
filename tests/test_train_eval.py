"""Integration tests: trainer step (freeze policies, finiteness), scorer
end-to-end on a synthetic video, preference/genai metrics."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.data.prompts import ByteTokenizer
from mjvideo_tpu.models.reward import init_reward_params
from mjvideo_tpu.eval.metrics import (
    binary_dimension_metrics,
    genai_bench_metrics,
    preference_accuracy,
)
from mjvideo_tpu.train.trainer import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    trainable_mask,
)


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_reward_params(jax.random.PRNGKey(0), cfg)


def _tiny_batch(cfg, B=2, frames=2, rng=None):
    rng = rng or np.random.default_rng(0)
    c = cfg.chat
    n_img = c.num_image_token * frames
    T = n_img + 16
    batch = {}
    for v in (0, 1):
        ids = np.full((B, T), 5, np.int64)
        ids[:, 2:2 + n_img] = c.img_context_token_id
        batch[f"video_{v}_pixel_values"] = rng.normal(
            size=(B, frames, c.vision.image_size, c.vision.image_size, 3)
        ).astype(np.float32)
        batch[f"video_{v}_input_ids"] = ids.astype(np.int32)
        batch[f"video_{v}_attention_mask"] = np.ones((B, T), np.int32)
        batch[f"video_{v}_gating_pos"] = np.full((B,), T - 4, np.int32)
        batch[f"video_{v}_criteria_score"] = rng.choice(
            [-1.0, 0.0, 1.0], size=(B, 28)).astype(np.float32)
        batch[f"video_{v}_criteria_related"] = rng.integers(
            0, 2, size=(B, 28)).astype(np.float32)
        batch[f"video_{v}_aspect_score"] = rng.choice(
            [-1.0, 0.0, 1.0], size=(B, 5)).astype(np.float32)
        batch[f"video_{v}_aspect_related"] = rng.integers(
            0, 2, size=(B, 5)).astype(np.float32)
        batch[f"video_{v}_overall_score"] = rng.choice(
            [-1.0, 1.0], size=(B, 1)).astype(np.float32)
        batch[f"video_{v}_overall_related"] = np.ones((B, 1), np.float32)
    batch["aspect_preference"] = rng.integers(0, 2, (B, 5)).astype(np.int32)
    batch["aspect_mask"] = rng.integers(0, 2, (B, 5)).astype(np.float32)
    batch["overall_preference"] = rng.integers(0, 2, (B, 1)).astype(np.int32)
    batch["overall_mask"] = np.ones((B, 1), np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.parametrize("stage", [1, 3])
def test_train_step_updates_only_trainable(cfg, params, stage):
    tc = TrainConfig(stage=stage, attn_impl="xla", learning_rate=1e-3,
                     total_steps=4)
    p0 = jax.tree.map(lambda a: a.copy(), params)
    optimizer = make_optimizer(tc, p0)
    opt_state = optimizer.init(p0)
    step = make_train_step(cfg, tc, optimizer)
    p1, opt_state, metrics = step(p0, opt_state, _tiny_batch(cfg))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))

    mask = trainable_mask(params, stage)
    changed = jax.tree.map(
        lambda a, b: bool(jnp.any(a != b)), params, p1
    )
    flat_mask, _ = jax.tree_util.tree_flatten(mask)
    flat_changed, treedef = jax.tree_util.tree_flatten(changed)
    # frozen params must be bit-identical; at least one trainable changed
    assert any(c for c, m in zip(flat_changed, flat_mask) if m)
    assert not any(c for c, m in zip(flat_changed, flat_mask) if not m)


def test_stage2_includes_criteria_gating_updates(cfg, params):
    tc = TrainConfig(stage=2, attn_impl="xla", learning_rate=1e-3,
                     total_steps=2)
    optimizer = make_optimizer(tc, params)
    step = make_train_step(cfg, tc, optimizer)
    p1, _, _ = step(jax.tree.map(lambda a: a.copy(), params),
                    optimizer.init(params), _tiny_batch(cfg))
    assert bool(jnp.any(
        p1["criteria_gating"]["layer_0"]["kernel"]
        != params["criteria_gating"]["layer_0"]["kernel"]
    ))
    assert bool(jnp.all(
        p1["aspect_gating"]["layer_0"]["kernel"]
        == params["aspect_gating"]["layer_0"]["kernel"]
    ))


# ------------------------------------------------------------------ metrics

def test_preference_accuracy_reference_semantics():
    # prefer_predict = ~(s0 > s1): ties predict 1 (video_1)
    s0 = np.array([1.0, 0.0, 0.5, 0.5])
    s1 = np.array([0.0, 1.0, 0.5, 0.2])
    pref = np.array([0, 1, 1, 0])
    mask = np.array([1, 1, 1, 0])
    m = preference_accuracy(s0, s1, pref, mask)
    assert m["count"] == 3
    assert m["correct"] == 3  # tie predicted as 1 matches pref=1


def test_genai_bench_metrics_vote_semantics():
    m = genai_bench_metrics(
        score_left=np.array([1.0, -1.0, -0.5, 0.5]),
        score_right=np.array([0.5, 1.0, -0.2, 0.6]),
        vote_types=["leftvote", "rightvote", "bothbad_vote", "tievote"],
    )
    assert m["prefer_accuracy"] == 1.0
    assert m["accuracy"] == 1.0
    m2 = genai_bench_metrics(
        score_left=np.array([0.1]), score_right=np.array([-0.1]),
        vote_types=["tievote"],
    )
    assert m2["accuracy"] == 0.0  # right is 'bad' -> tie not credited


def test_binary_dimension_metrics():
    scores = np.array([[1.0, -1.0], [0.5, 2.0], [-0.5, 0.1]])
    targets = np.array([[1, 1], [1, -1], [-1, 1]])
    related = np.array([[1, 1], [1, 1], [1, 0]])
    m = binary_dimension_metrics(scores, targets, related, names=["a", "b"])
    assert m[0]["dimension"] == "a"
    assert m[0]["tp"] == 2 and m[0]["tn"] == 1
    assert m[0]["accuracy"] == 1.0
    assert m[1]["count"] == 2
    assert m[1]["fn"] == 1 and m[1]["fp"] == 1


# ---------------------------------------------------------- scorer e2e

def _write_test_video(path, n_frames=12, size=64):
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(str(path), fourcc, 8.0, (size, size))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        frame = np.full((size, size, 3), i * 8 % 255, np.uint8)
        frame[:, : size // 2] = rng.integers(0, 255, (size, size // 2, 3),
                                             dtype=np.uint8)
        w.write(frame)
    w.release()


def test_scorer_end_to_end_on_synthetic_video(cfg, params, tmp_path):
    from mjvideo_tpu.eval.scorer import RewardScorer

    video = tmp_path / "clip.mp4"
    _write_test_video(video)

    tok = ByteTokenizer()
    scorer = RewardScorer(
        cfg, params, tok, attn_impl="xla", dtype=jnp.float32,
        length_buckets=(256, 512, 1024),
        gating_pattern=tok.gating_pattern(),
    )
    res = scorer.score_video(str(video), "a flickering square", num_segments=2)
    assert res["rewards"].shape == (28,)
    assert res["aspect_scores"].shape == (5,)
    assert np.isfinite(res["score"])

    r0, r1 = scorer.score_pair(str(video), str(video), "same clip",
                               num_segments=2)
    # identical inputs -> identical scores (batched forward determinism)
    np.testing.assert_allclose(r0["score"], r1["score"], atol=1e-5)


def test_score_fn_is_differentiable(cfg, params):
    from mjvideo_tpu.eval.scorer import RewardScorer

    tok = ByteTokenizer()
    scorer = RewardScorer(
        cfg, params, tok, attn_impl="xla", dtype=jnp.float32,
        length_buckets=(128,), gating_pattern=tok.gating_pattern(),
    )
    c = cfg.chat
    n_img = c.num_image_token
    ids = np.full((n_img + 10,), 5, np.int32)
    ids[2:2 + n_img] = c.img_context_token_id
    f = scorer.score_fn(ids, gating_pos=len(ids) - 4)
    frames = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(1, c.vision.image_size, c.vision.image_size, 3)
        ),
        jnp.float32,
    )
    g = jax.grad(f)(frames)
    assert g.shape == frames.shape
    assert bool(jnp.any(g != 0)) and bool(jnp.all(jnp.isfinite(g)))


def test_trainer_evaluate_produces_metrics(cfg, params, tmp_path):
    from mjvideo_tpu.train.trainer import TrainConfig, Trainer

    tc = TrainConfig(stage=3, attn_impl="xla", total_steps=2,
                     checkpoint_dir=str(tmp_path))
    tr = Trainer(cfg, params, tc)
    batch = jax.device_get(_tiny_batch(cfg, B=8))
    res = tr.evaluate([batch])
    assert 0.0 <= res["preference"]["accuracy"] <= 1.0
    assert res["preference"]["count"] == 8
    assert len(res["criteria"]) == 28 and len(res["aspects"]) == 5
    assert all("f1" in m for m in res["criteria"])


def test_evaluate_preference_driver(cfg, params, tmp_path):
    """The pipelined preference evaluator end-to-end on synthetic videos."""
    from mjvideo_tpu.eval.preference import evaluate_preference
    from mjvideo_tpu.eval.scorer import RewardScorer

    v0, v1 = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_test_video(v0)
    _write_test_video(v1)
    records = [
        {"video_0_path": "a.mp4", "video_1_path": "b.mp4",
         "caption": "x", "overall_preference": "Video 1 better"},
        {"video_0_path": "b.mp4", "video_1_path": "a.mp4",
         "caption": "y", "overall_preference": "Same"},
    ]
    tok = ByteTokenizer()
    scorer = RewardScorer(
        cfg, params, tok, attn_impl="xla", dtype=jnp.float32,
        length_buckets=(1024,), gating_pattern=tok.gating_pattern(),
    )
    res = evaluate_preference(
        scorer, records, root=str(tmp_path), num_segments=2,
        results_path=str(tmp_path / "res.jsonl"),
    )
    assert res["count"] == 1  # 'Same' masked
    assert res["correct"] in (0, 1)
    # resume path: re-running skips completed ids and returns same result
    res2 = evaluate_preference(
        scorer, records, root=str(tmp_path), num_segments=2,
        results_path=str(tmp_path / "res.jsonl"),
    )
    assert res2 == res


def test_profiling_utilities(tmp_path):
    import time

    from mjvideo_tpu.utils.profiling import StepTimer, Throughput

    tp = Throughput(ema=0.5)
    r1 = tp.update(10)
    time.sleep(0.01)
    r2 = tp.update(10)
    assert r1 > 0 and r2 > 0 and tp.total == 20
    assert tp.average() > 0

    path = tmp_path / "steps.jsonl"
    st = StepTimer(str(path))
    rec = st.step(loss=1.5)
    assert rec["loss"] == 1.5 and rec["step_time_s"] >= 0
    assert path.exists()
    line = json.loads(path.read_text().strip())
    assert line["loss"] == 1.5


def test_report_helpers(tmp_path):
    from mjvideo_tpu.eval.report import format_table, save_report

    rows = [
        {"dimension": "object", "accuracy": 0.5, "count": 10},
        {"dimension": "attribute", "accuracy": 1.0, "count": 4},
    ]
    csv_path = save_report(rows, str(tmp_path / "m.csv"))
    assert "object" in open(csv_path).read()
    # xlsx degrades to csv when no Excel writer is installed
    out_path = save_report(rows, str(tmp_path / "m.xlsx"))
    assert os.path.getsize(out_path) > 0
    table = format_table(rows)
    assert "dimension" in table and "0.5000" in table


def test_evaluate_aspects_driver(cfg, params, tmp_path):
    from mjvideo_tpu.eval.preference import evaluate_aspects
    from mjvideo_tpu.eval.scorer import RewardScorer

    v0, v1 = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_test_video(v0)
    _write_test_video(v1)
    criteria = {f"c{i}": (i % 3) for i in range(28)}
    aspects = {f"a{i}": 1 for i in range(5)}
    records = [{
        "caption": "x",
        "video_0_path": "a.mp4", "video_1_path": "b.mp4",
        "video_0_label": criteria, "video_1_label": criteria,
        "video_0_overall_score": aspects, "video_1_overall_score": aspects,
        "video_0_total_score": 1, "video_1_total_score": 2,
        "category_preference": {f"a{i}": "Same" for i in range(5)},
        "overall_preference": "Video 1 better",
    }]
    tok = ByteTokenizer()
    scorer = RewardScorer(
        cfg, params, tok, attn_impl="xla", dtype=jnp.float32,
        length_buckets=(1024,), gating_pattern=tok.gating_pattern(),
    )
    res = evaluate_aspects(scorer, records, root=str(tmp_path),
                           num_segments=2,
                           results_path=str(tmp_path / "asp.jsonl"))
    assert len(res["criteria"]) == 28
    assert len(res["aspects"]) == 5
    assert all(np.isfinite(m["mean"]) for m in res["criteria"])


def test_resume_is_bit_exact(cfg, params, tmp_path):
    """train(2) + save + resume + train(2) == train(4) bit-for-bit: the
    checkpoint must carry Adam moments and the schedule count, not just
    params (regression: resume used to re-init opt_state)."""
    from mjvideo_tpu.train.trainer import TrainConfig, Trainer

    all_b = [jax.device_get(_tiny_batch(cfg, rng=np.random.default_rng(100 + i)))
             for i in range(4)]

    def make(dirname):
        tc = TrainConfig(stage=1, attn_impl="xla", learning_rate=1e-3,
                         total_steps=4, checkpoint_every=10**9, log_every=1,
                         mesh_data_axis=1, mesh_model_axis=1,
                         checkpoint_dir=str(tmp_path / dirname))
        return Trainer(cfg, jax.tree.map(lambda a: a.copy(), params), tc)

    tr_a = make("a")
    tr_a.train(iter(all_b))

    tr_b = make("b")
    tr_b.train(iter(all_b[:2]))
    tr_b.save()
    tr_c = make("b")  # fresh trainer over the same checkpoint dir
    path = tr_c.resume_latest()
    assert path is not None and tr_c.step == 2
    tr_c.train(iter(all_b[2:]))

    for a, c in zip(jax.tree.leaves(jax.device_get(tr_a.params)),
                    jax.tree.leaves(jax.device_get(tr_c.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_bf16_adam_mu_state(cfg, params, tmp_path):
    from mjvideo_tpu.train.trainer import TrainConfig, make_optimizer

    tc = TrainConfig(stage=1, adam_mu_dtype="bfloat16", attn_impl="xla",
                     checkpoint_dir=str(tmp_path))
    opt = make_optimizer(tc, params)
    state = opt.init(params)
    leaves = jax.tree.leaves(
        state, is_leaf=lambda x: hasattr(x, "dtype") and hasattr(x, "shape"))
    dtypes = {str(l.dtype) for l in leaves if hasattr(l, "dtype")}
    assert "bfloat16" in dtypes  # mu stored in bf16


def test_remat_policies_give_identical_gradients(cfg, params):
    """'dots' and 'full' remat (and no remat) are pure recompute-scheduling
    choices — the training gradients must be numerically identical."""
    from mjvideo_tpu.models.reward import reward_forward
    from mjvideo_tpu.train import losses as L

    batch = _tiny_batch(cfg, B=1, frames=1)

    def loss_with(remat):
        def f(p):
            outs = []
            for v in (0, 1):
                outs.append(reward_forward(
                    p, cfg, batch[f"video_{v}_pixel_values"].reshape(
                        (-1,) + batch[f"video_{v}_pixel_values"].shape[2:]),
                    batch[f"video_{v}_input_ids"],
                    batch[f"video_{v}_attention_mask"],
                    batch[f"video_{v}_gating_pos"],
                    attn_impl="xla", remat=remat))
            return L.stage1_loss(outs[0], outs[1], batch, mse=False)
        return jax.jit(lambda p: jax.grad(f)(p))

    g_full = loss_with(True)(params)
    g_dots = loss_with("dots")(params)
    g_none = loss_with(False)(params)
    for a, b in ((g_full, g_dots), (g_full, g_none)):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(la, np.float32),
                                       np.asarray(lb, np.float32),
                                       atol=1e-5, rtol=1e-4)

    with pytest.raises(ValueError):
        from mjvideo_tpu.ops.remat import remat_wrap

        remat_wrap(lambda c, x: (c, None), "bogus")


def test_adafactor_optimizer_option(cfg, params):
    """'adafactor' trains (loss finite, frozen subtrees untouched) with a
    FACTORED second moment — no O(params) fp32 state for matrices."""
    import jax.tree_util as jtu

    tc = TrainConfig(stage=1, attn_impl="xla", total_steps=4, remat=False,
                     optimizer="adafactor")
    p0 = jax.tree.map(lambda a: a.copy(), params)  # step donates its args
    optimizer = make_optimizer(tc, p0)
    opt_state = optimizer.init(p0)
    step = make_train_step(cfg, tc, optimizer)
    batch = _tiny_batch(cfg)
    p1, opt_state, m = step(p0, opt_state, batch)
    assert np.isfinite(float(m["loss"]))

    # frozen: vision tower unchanged; trainable: regression layer moved
    same = jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)),
        params["model"]["vision_model"], p1["model"]["vision_model"])
    assert all(jax.tree.leaves(same))
    assert not bool(jnp.all(
        params["regression_layer"]["kernel"]
        == p1["regression_layer"]["kernel"]))

    # memory claim: adafactor's state is materially smaller than adamw's
    # (mu + fp32 nu). (Tiny dims below min_dim_size_to_factor=128 stay
    # unfactored, so compare total footprint, not per-leaf shapes.)
    def state_bytes(state):
        return sum(leaf.size * leaf.dtype.itemsize
                   for leaf in jtu.tree_leaves(state)
                   if hasattr(leaf, "size"))

    adamw_state = make_optimizer(
        TrainConfig(stage=1, attn_impl="xla", total_steps=4, remat=False),
        p0).init(p0)
    assert state_bytes(opt_state) < 0.7 * state_bytes(adamw_state)


def test_vader_loop_reward_ascends(cfg, params):
    """The reward-feedback loop (BASELINE config #5): a learnable pixel
    field optimized against score_fn gradients must increase the reward
    (end-to-end differentiability through ViT + LLM + MoE head)."""
    import optax

    from mjvideo_tpu.eval.scorer import RewardScorer

    tok = ByteTokenizer()
    scorer = RewardScorer(
        cfg, params, tok, attn_impl="xla", dtype=jnp.float32,
        length_buckets=(1024,), gating_pattern=tok.gating_pattern(),
    )
    from mjvideo_tpu.data.prompts import build_video_question, prepare_chat_input

    frames = 2
    q = build_video_question("a bright scene", frames)
    chat = prepare_chat_input(cfg.chat, tok, q,
                              num_patches_list=[1] * frames,
                              gating_pattern=tok.gating_pattern())
    f = scorer.score_fn(chat.input_ids[0], chat.gating_pos)

    field = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1),
        (frames, cfg.chat.image_size, cfg.chat.image_size, 3), jnp.float32)
    opt = optax.adam(0.05)
    state = opt.init(field)

    @jax.jit
    def step(field, state):
        loss, g = jax.value_and_grad(lambda x: -f(jnp.tanh(x) * 2.0))(field)
        upd, state = opt.update(g, state)
        return optax.apply_updates(field, upd), state, -loss

    first = None
    for _ in range(6):
        field, state, score = step(field, state)
        if first is None:
            first = float(score)
    assert float(score) > first, (first, float(score))


def test_score_fn_with_params_matches_closure_variant(cfg, params):
    """score_fn_with_params(params, frames) == score_fn(frames) and stays
    differentiable w.r.t. pixels inside a caller-side jit."""
    from mjvideo_tpu.eval.scorer import RewardScorer

    tok = ByteTokenizer()
    scorer = RewardScorer(
        cfg, params, tok, attn_impl="xla", dtype=jnp.float32,
        length_buckets=(1024,), gating_pattern=tok.gating_pattern(),
    )
    c = cfg.chat
    n_img = c.num_image_token
    ids = np.full((n_img + 10,), 5, np.int32)
    ids[2:2 + n_img] = c.img_context_token_id
    gp = len(ids) - 4
    frames = jnp.asarray(
        np.random.default_rng(1).normal(
            size=(1, c.vision.image_size, c.vision.image_size, 3)),
        jnp.float32)

    f_closure = scorer.score_fn(ids, gp)
    f_args = scorer.score_fn_with_params(ids, gp)
    np.testing.assert_allclose(
        float(f_closure(frames)), float(jax.jit(f_args)(params, frames)),
        atol=1e-5)

    @jax.jit
    def grad_step(p, x):
        return jax.grad(lambda x_: f_args(p, x_))(x)

    g = grad_step(params, frames)
    assert bool(jnp.any(g != 0)) and bool(jnp.all(jnp.isfinite(g)))


def test_resume_mid_accumulation_window_is_bit_exact(cfg, params, tmp_path):
    """A checkpoint can land on a half-full gradient-accumulation window;
    the MultiSteps accumulator lives in opt_state, so resume must carry
    the running-mean gradient and the mini-step counter — train(3 micro)
    + save + resume + train(3) == train(6) bit-for-bit at k=2."""
    from mjvideo_tpu.train.trainer import TrainConfig, Trainer

    all_b = [jax.device_get(_tiny_batch(cfg, rng=np.random.default_rng(200 + i)))
             for i in range(6)]

    def make(dirname):
        tc = TrainConfig(stage=1, attn_impl="xla", learning_rate=1e-3,
                         total_steps=3, gradient_accumulation_steps=2,
                         checkpoint_every=10**9, log_every=1,
                         mesh_data_axis=1, mesh_model_axis=1,
                         checkpoint_dir=str(tmp_path / dirname))
        return Trainer(cfg, jax.tree.map(lambda a: a.copy(), params), tc)

    tr_a = make("a")
    tr_a.train(iter(all_b))

    tr_b = make("b")
    tr_b.train(iter(all_b[:3]))  # 3 micro steps = 1.5 windows
    st = jax.device_get(tr_b.opt_state)
    assert int(st.mini_step) == 1, "checkpoint must be mid-window"
    tr_b.save()
    tr_c = make("b")
    assert tr_c.resume_latest() is not None and tr_c.step == 3
    assert int(jax.device_get(tr_c.opt_state).mini_step) == 1
    tr_c.train(iter(all_b[3:]))

    for a, c in zip(jax.tree.leaves(jax.device_get(tr_a.params)),
                    jax.tree.leaves(jax.device_get(tr_c.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_evaluate_aspects_resume_skips_scoring(cfg, params, tmp_path):
    """Crash-resume for the aspect eval: the second run must reuse stored
    scores (no re-decode/re-score), append NO duplicate rows, and return
    the same metrics as the uninterrupted run."""
    import json

    from mjvideo_tpu.eval.preference import evaluate_aspects
    from mjvideo_tpu.eval.scorer import RewardScorer
    from mjvideo_tpu.data.prompts import ByteTokenizer

    video = tmp_path / "v.mp4"
    _write_test_video(video, n_frames=8, size=64)
    criteria = {f"c{i}": (i % 3) for i in range(28)}
    aspects = {f"a{i}": 1 for i in range(5)}
    records = [{
        "caption": "a test clip",
        "video_0_path": "v.mp4", "video_1_path": "v.mp4",
        "video_0_label": criteria, "video_1_label": criteria,
        "video_0_overall_score": aspects, "video_1_overall_score": aspects,
        "video_0_total_score": 1, "video_1_total_score": 2,
        "category_preference": {f"a{i}": "Same" for i in range(5)},
        "overall_preference": "Video 1 better",
    } for _ in range(2)]

    tok = ByteTokenizer()
    scorer = RewardScorer(
        cfg, params, tok, attn_impl="xla", dtype=jnp.float32,
        length_buckets=(1024,), gating_pattern=tok.gating_pattern())
    res = tmp_path / "aspects.jsonl"
    full = evaluate_aspects(scorer, records, root=str(tmp_path),
                            num_segments=2, results_path=str(res))
    n_rows = sum(1 for _ in open(res))
    assert n_rows == 2

    calls = {"n": 0}
    orig = scorer.score_batch

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    scorer.score_batch = counting
    again = evaluate_aspects(scorer, records, root=str(tmp_path),
                             num_segments=2, results_path=str(res))
    assert calls["n"] == 0, "resume must not re-score seen items"
    assert sum(1 for _ in open(res)) == 2, "no duplicate rows"
    assert json.dumps(again, default=float) == json.dumps(full,
                                                          default=float)


def test_import_decoder_missing_lm_head_fails_loudly(cfg):
    import pytest

    from mjvideo_tpu.models.internvl import init_chat_params
    from mjvideo_tpu.utils.checkpoint import import_chat_params
    from mjvideo_tpu.utils.export import export_chat

    params = init_chat_params(jax.random.PRNGKey(0), cfg.chat,
                              with_lm_head=False)
    state = export_chat(params, cfg.chat)
    with pytest.raises(KeyError, match="with_lm_head"):
        import_chat_params(state, cfg.chat, with_lm_head=True)
    # score-only import still works
    tree = import_chat_params(state, cfg.chat, with_lm_head=False)
    assert "output" not in tree["language_model"]

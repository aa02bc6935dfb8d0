"""Loss parity vs torch oracles re-deriving the reference compute_loss math."""

import jax.numpy as jnp
import numpy as np
import torch

from mjvideo_tpu.train import losses as L


class _Out:
    """Stand-in for RewardOutput carrying only what the losses read."""

    def __init__(self, rng, B, fields=("rewards", "aspect_scores", "score",
                                       "aspect_weights",
                                       "aspect_gating_output")):
        self.rewards = jnp.asarray(rng.normal(size=(B, 28)), jnp.float32)
        self.aspect_scores = jnp.asarray(rng.normal(size=(B, 5)), jnp.float32)
        self.score = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
        # gate outputs live in (0, 1) like softmax*logit_scale outputs
        self.aspect_weights = jnp.asarray(
            rng.uniform(0.01, 0.9, size=(B, 28)), jnp.float32
        )
        self.aspect_gating_output = jnp.asarray(
            rng.uniform(0.01, 0.9, size=(B, 5)), jnp.float32
        )


def _batch(rng, B):
    return {
        "video_0_criteria_score": rng.choice([-1.0, 0.0, 1.0], size=(B, 28)
                                             ).astype(np.float32),
        "video_1_criteria_score": rng.choice([-1.0, 0.0, 1.0], size=(B, 28)
                                             ).astype(np.float32),
        "video_0_criteria_related": rng.integers(0, 2, size=(B, 28)
                                                 ).astype(np.float32),
        "video_1_criteria_related": rng.integers(0, 2, size=(B, 28)
                                                 ).astype(np.float32),
        "video_0_aspect_score": rng.choice([-1.0, 0.0, 1.0], size=(B, 5)
                                           ).astype(np.float32),
        "video_1_aspect_score": rng.choice([-1.0, 0.0, 1.0], size=(B, 5)
                                           ).astype(np.float32),
        "video_0_aspect_related": rng.integers(0, 2, size=(B, 5)
                                               ).astype(np.float32),
        "video_1_aspect_related": rng.integers(0, 2, size=(B, 5)
                                               ).astype(np.float32),
        "aspect_preference": rng.integers(0, 2, size=(B, 5)).astype(np.int32),
        "aspect_mask": rng.integers(0, 2, size=(B, 5)).astype(np.float32),
        "overall_preference": rng.integers(0, 2, size=(B, 1)).astype(np.int32),
        "overall_mask": np.ones((B, 1), np.float32),
        "video_0_overall_score": rng.choice([-1.0, 1.0], size=(B, 1)
                                            ).astype(np.float32),
        "video_1_overall_score": rng.choice([-1.0, 1.0], size=(B, 1)
                                            ).astype(np.float32),
    }


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _torch_stage1(out0, out1, batch, mse, eps=1e-5):
    """Oracle of criteria_train.py:67-105."""
    fa = torch.tensor(L.FOCAL_ALPHA_CRITERIA)
    losses = []
    for out, v in ((out0, 0), (out1, 1)):
        r = _t(out.rewards).flatten()
        gt = _t(batch[f"video_{v}_criteria_score"]).flatten()
        rel = _t(batch[f"video_{v}_criteria_related"]).flatten()
        a = fa.repeat(r.shape[0] // 28)
        if mse:
            losses.append(((r - gt) ** 2 / r.shape[0]))
        else:
            r = torch.sigmoid(r)
            losses.append(
                -(gt * torch.log(r + eps) * a
                  + (1 - gt) * torch.log(1 - r + eps) * (1 - a)) * rel
            )
    return float((losses[0] + losses[1]).sum())


def test_stage1_focal_bce_matches_torch_oracle():
    rng = np.random.default_rng(0)
    B = 3
    out0, out1 = _Out(rng, B), _Out(rng, B)
    batch = _batch(rng, B)
    got = float(L.stage1_loss(out0, out1, batch, mse=False))
    want = _torch_stage1(out0, out1, batch, mse=False)
    np.testing.assert_allclose(got, want, rtol=1e-4)  # fp32 sum-order noise


def test_stage1_mse_matches_torch_oracle():
    rng = np.random.default_rng(1)
    B = 2
    out0, out1 = _Out(rng, B), _Out(rng, B)
    batch = _batch(rng, B)
    got = float(L.stage1_loss(out0, out1, batch, mse=True))
    want = _torch_stage1(out0, out1, batch, mse=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _torch_bt(s0, s1, pref, mask, beta=1.0, mean=True):
    """Oracle of aspect_train.py:134-147."""
    s0, s1, pref, mask = _t(s0).flatten(), _t(s1).flatten(), \
        _t(pref).flatten(), _t(mask).flatten()
    p0 = 1 / (1 + torch.exp(beta * (s1 - s0)))
    p1 = 1 / (1 + torch.exp(beta * (s0 - s1)))
    nll = -torch.log((1 - pref) * p0 + pref * p1) * mask
    total = nll.sum()
    if mean and mask.sum() > 0:
        return float(total / mask.sum())
    return float(total)


def test_bradley_terry_matches_torch_oracle():
    rng = np.random.default_rng(2)
    B = 4
    s0 = rng.normal(size=(B, 5)).astype(np.float32)
    s1 = rng.normal(size=(B, 5)).astype(np.float32)
    pref = rng.integers(0, 2, size=(B, 5)).astype(np.float32)
    mask = rng.integers(0, 2, size=(B, 5)).astype(np.float32)
    got = float(L.bradley_terry_loss(s0, s1, pref, mask))
    np.testing.assert_allclose(got, _torch_bt(s0, s1, pref, mask), rtol=1e-4)


def test_bradley_terry_empty_mask_is_zero():
    s = np.zeros((2, 5), np.float32)
    mask = np.zeros((2, 5), np.float32)
    assert float(L.bradley_terry_loss(s, s, mask, mask)) == 0.0


def test_gating_sparsity_matches_torch_oracle():
    rng = np.random.default_rng(3)
    B, eps = 3, 1e-5
    g0 = rng.uniform(0.01, 0.9, size=(B, 28)).astype(np.float32)
    g1 = rng.uniform(0.01, 0.9, size=(B, 28)).astype(np.float32)
    r0 = rng.integers(0, 2, size=(B, 28)).astype(np.float32)
    r1 = rng.integers(0, 2, size=(B, 28)).astype(np.float32)
    # Oracle: aspect_train.py:149-163
    want = float(
        ((-(1 - _t(r0)) * torch.log(1 - _t(g0) + eps)).flatten()
         + (-(1 - _t(r1)) * torch.log(1 - _t(g1) + eps)).flatten()).sum() / B
    )
    got = float(L.gating_sparsity_loss(g0, g1, r0, r1, B))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_stage2_composite_mse_mode():
    """stage2(mse) == 0.3*stage1 + 1*aspect_mse + 1*aspect_bt (aspect_train:66)."""
    rng = np.random.default_rng(4)
    B = 2
    out0, out1 = _Out(rng, B), _Out(rng, B)
    batch = _batch(rng, B)
    got = float(L.stage2_loss(out0, out1, batch, mse=True))

    s1 = _torch_stage1(out0, out1, batch, mse=True)
    a0 = _t(out0.aspect_scores).flatten()
    a1 = _t(out1.aspect_scores).flatten()
    gt0 = _t(batch["video_0_aspect_score"]).flatten()
    gt1 = _t(batch["video_1_aspect_score"]).flatten()
    n = a0.shape[0]
    s2 = float((((a0 - gt0) ** 2 / n) + ((a1 - gt1) ** 2 / n)).sum())
    bt = _torch_bt(out0.aspect_scores, out1.aspect_scores,
                   batch["aspect_preference"], batch["aspect_mask"])
    np.testing.assert_allclose(got, 0.3 * s1 + s2 + bt, rtol=1e-5)


def test_stage3_composite_runs_and_is_finite():
    rng = np.random.default_rng(5)
    B = 2
    out0, out1 = _Out(rng, B), _Out(rng, B)
    batch = _batch(rng, B)
    v = float(L.stage3_loss(out0, out1, batch, mse=True))
    assert np.isfinite(v)
    # overall BT is a plain sum (overall_train.py:185): doubling the batch-
    # size via mask doubles that term; just check monotone response to mask.
    batch2 = dict(batch)
    batch2["overall_mask"] = np.zeros_like(batch["overall_mask"])
    v2 = float(L.stage3_loss(out0, out1, batch2, mse=True))
    assert v != v2


def test_stage_freeze_policies():
    assert L.STAGES[1].trainable_paths == (
        "regression_layer", "model/language_model",
    )
    assert "criteria_gating" in L.STAGES[2].trainable_paths
    assert "aspect_gating" in L.STAGES[3].trainable_paths
    # reward_transform_matrix is never trainable (moe_reward.py:163-166)
    for s in (1, 2, 3):
        assert "reward_transform_matrix" not in L.STAGES[s].trainable_paths


def test_gradient_accumulation_matches_full_batch():
    """k micro-steps with MultiSteps == one step on the concatenated
    batch (the stage losses are batch means, so mean-of-means is exact),
    and params must not move before the k-th micro-step — HF Trainer's
    gradient_accumulation_steps semantics (criteria_train.py:34)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.models.reward import init_reward_params
    from mjvideo_tpu.train.trainer import (
        TrainConfig,
        make_optimizer,
        make_train_step,
    )
    from test_train_eval import _tiny_batch

    cfg = tiny_test_config()
    params = init_reward_params(jax.random.PRNGKey(0), cfg)
    b1 = _tiny_batch(cfg, rng=np.random.default_rng(0))
    b2 = _tiny_batch(cfg, rng=np.random.default_rng(1))
    full = {k: jnp.concatenate([jnp.asarray(b1[k]), jnp.asarray(b2[k])])
            for k in b1}

    def fresh():
        # the train step donates (params, opt_state) — copy per use
        return jax.tree.map(jnp.copy, params)

    kw = dict(stage=1, learning_rate=1e-3, total_steps=4, schedule="none",
              attn_impl="xla", remat=False)
    tc_full = TrainConfig(**kw)
    opt_f = make_optimizer(tc_full, params)
    step_f = make_train_step(cfg, tc_full, opt_f)
    p_full, _, m_full = step_f(fresh(), opt_f.init(fresh()), full)

    tc_acc = TrainConfig(gradient_accumulation_steps=2, **kw)
    opt_a = make_optimizer(tc_acc, params)
    step_a = make_train_step(cfg, tc_acc, opt_a)
    p_mid, st, _ = step_a(fresh(), opt_a.init(fresh()), b1)
    # No update until the accumulation window closes.
    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          p_mid, params)
    assert max(jax.tree.leaves(deltas)) == 0.0
    p_acc, _, _ = step_a(p_mid, st, b2)

    rel = [
        float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-12))
        for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_full))
    ]
    assert max(rel) < 5e-5, max(rel)

"""LoRA adapters (ops/lora.py) + trainer integration (TrainConfig.lora_rank).

The reference has no parameter-efficient finetuning (full-LLM unfreeze per
stage, ``criteria_train.py:334-338``); LoRA is capability on top.  Pinned
here: dispatch algebra, zero-init transparency, freeze semantics (only
a/b + heads train), merge exactness, QLoRA over a weight-only int8 base,
and checkpoint resume keeping the node types.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.models.reward import init_reward_params, reward_forward
from mjvideo_tpu.ops.lora import (
    LoraKernel,
    apply_lora,
    merge_lora,
    revive_lora_kernels,
)
from mjvideo_tpu.ops.matmul import dot
from mjvideo_tpu.train.trainer import TrainConfig, Trainer, trainable_mask

from test_train_eval import _tiny_batch


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_reward_params(jax.random.PRNGKey(0), cfg)


def _n_lora(tree):
    return sum(isinstance(l, LoraKernel) for l in jax.tree.leaves(
        tree, is_leaf=lambda n: isinstance(n, LoraKernel)))


def test_dot_dispatch_matches_formula():
    k = jax.random.PRNGKey(1)
    w = jax.random.normal(k, (16, 24), jnp.float32)
    a = jax.random.normal(jax.random.fold_in(k, 1), (16, 4)) * 0.1
    b = jax.random.normal(jax.random.fold_in(k, 2), (4, 24)) * 0.1
    x = jax.random.normal(jax.random.fold_in(k, 3), (5, 16))
    lk = LoraKernel(w=w, a=a, b=b, scale=jnp.asarray(2.0, jnp.float32))
    want = x @ (w + 2.0 * a @ b)
    np.testing.assert_allclose(dot(x, lk), want, atol=1e-5)
    # b = 0 -> exactly the base matmul
    lk0 = LoraKernel(w=w, a=a, b=jnp.zeros_like(b),
                     scale=jnp.asarray(2.0, jnp.float32))
    np.testing.assert_array_equal(dot(x, lk0), dot(x, w))


def test_apply_lora_wraps_llm_only_and_is_transparent(cfg, params):
    wrapped = apply_lora(params, jax.random.PRNGKey(4), rank=4)
    assert _n_lora(wrapped) == 7  # wq wk wv wo w1 w2 w3
    assert _n_lora(wrapped["model"]["vision_model"]) == 0
    # idempotent
    again = apply_lora(wrapped, jax.random.PRNGKey(5), rank=4)
    assert _n_lora(again) == 7

    B, T = 1, 2 + 2 * cfg.chat.num_image_token + 8
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(size=(
        2, cfg.chat.vision.image_size, cfg.chat.vision.image_size, 3)),
        jnp.float32)
    ids = np.full((B, T), 5, np.int64)
    ids[:, 2:2 + 2 * cfg.chat.num_image_token] = \
        cfg.chat.img_context_token_id
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    gpos = jnp.asarray([T - 4], jnp.int32)

    fwd = jax.jit(lambda p: reward_forward(
        p, cfg, pix, ids, mask, gpos, attn_impl="xla").score)
    # zero-init b => wrapped forward IS the base forward
    np.testing.assert_allclose(
        np.asarray(fwd(params)), np.asarray(fwd(wrapped)), atol=1e-6)

    # merged-after-training forward == wrapped forward
    moved = jax.tree_util.tree_map(
        lambda n: LoraKernel(
            n.w, n.a, n.b + 0.05 * jnp.ones_like(n.b), n.scale)
        if isinstance(n, LoraKernel) else n,
        wrapped, is_leaf=lambda n: isinstance(n, LoraKernel))
    np.testing.assert_allclose(
        np.asarray(fwd(moved)), np.asarray(fwd(merge_lora(moved))),
        atol=2e-5)
    assert abs(float(fwd(moved)[0]) - float(fwd(params)[0])) > 1e-7


def test_trainable_mask_lora_semantics(cfg, params):
    wrapped = apply_lora(params, jax.random.PRNGKey(4), rank=2)
    mask = trainable_mask(wrapped, stage=1, lora=True)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    from mjvideo_tpu.train.trainer import _path_str

    for path, trainable in flat:
        s = _path_str(path)
        if trainable:
            assert s.endswith("/.a") or s.endswith("/.b") \
                or s.startswith("regression_layer"), s
        if "/.w" in s or "scale" in s and "model/" in s:
            assert not trainable, s


def test_trainer_lora_updates_only_adapters_and_heads(cfg, params):
    tc = TrainConfig(stage=1, attn_impl="xla", learning_rate=1e-2,
                     total_steps=2, remat=False, lora_rank=2,
                     checkpoint_dir="/tmp/lora_ckpt_test")
    tr = Trainer(cfg, jax.tree.map(lambda a: a.copy(), params), tc)
    p0 = jax.device_get(tr.params)
    tr.train([_tiny_batch(cfg, B=8)], max_steps=1)
    p1 = jax.device_get(tr.params)

    from mjvideo_tpu.train.trainer import _path_str
    changed_ab, changed_frozen = 0, []
    for (path, l0), (_, l1) in zip(
        jax.tree_util.tree_leaves_with_path(p0),
        jax.tree_util.tree_leaves_with_path(p1),
    ):
        s = _path_str(path)
        if np.any(np.asarray(l0) != np.asarray(l1)):
            if s.endswith("/.a") or s.endswith("/.b") \
                    or s.startswith("regression_layer"):
                changed_ab += 1
            else:
                changed_frozen.append(s)
    assert changed_ab > 0
    assert not changed_frozen, changed_frozen


def test_qlora_int8_wo_base(cfg, params):
    from mjvideo_tpu.ops.quant import WOQuantKernel, quantize_params_mode

    qtree = quantize_params_mode(
        jax.tree.map(lambda a: a.astype(jnp.bfloat16), params), "int8-wo")
    # tiny dims are below the min_elements cutoff; force eligibility
    from mjvideo_tpu.ops.quant import quantize_params_int8

    qtree = quantize_params_int8(
        jax.tree.map(lambda a: a.astype(jnp.bfloat16), params),
        min_elements=1, weight_only=True)
    wrapped = apply_lora(qtree, jax.random.PRNGKey(4), rank=2)
    lks = [l for l in jax.tree.leaves(
        wrapped, is_leaf=lambda n: isinstance(n, LoraKernel))
        if isinstance(l, LoraKernel)]
    assert lks and all(isinstance(l.w, WOQuantKernel) for l in lks)

    tc = TrainConfig(stage=1, attn_impl="xla", learning_rate=1e-2,
                     total_steps=2, remat=False, lora_rank=2,
                     checkpoint_dir="/tmp/qlora_ckpt_test")
    tr = Trainer(cfg, wrapped, tc)
    out = tr.train([_tiny_batch(cfg, B=8)], max_steps=1)
    p1 = jax.device_get(tr.params)
    lks1 = [l for l in jax.tree.leaves(
        p1, is_leaf=lambda n: isinstance(n, LoraKernel))
        if isinstance(l, LoraKernel)]
    assert all(isinstance(l.w, WOQuantKernel) for l in lks1)
    assert any(np.any(np.asarray(a.b) != 0) for a in lks1)

    with pytest.raises(ValueError):
        merge_lora(p1)


def test_lora_resume_keeps_types_and_is_exact(cfg, params, tmp_path):
    batches = [_tiny_batch(cfg, B=8, rng=np.random.default_rng(7 + i))
               for i in range(3)]

    def make(d):
        tc = TrainConfig(stage=1, attn_impl="xla", learning_rate=1e-2,
                         total_steps=4, remat=False, lora_rank=2,
                         checkpoint_dir=str(d), log_every=1,
                         checkpoint_every=100)
        return Trainer(cfg, jax.tree.map(lambda a: a.copy(), params), tc)

    tr_a = make(tmp_path / "a")
    for b in batches:
        tr_a.train([b], max_steps=tr_a.step + 1)
    ref = jax.device_get(tr_a.params)

    tr_b = make(tmp_path / "b")
    for b in batches[:1]:
        tr_b.train([b], max_steps=tr_b.step + 1)
    tr_b.save()
    tr_c = make(tmp_path / "b")
    assert tr_c.resume_latest() is not None
    assert _n_lora(tr_c.params) == 7
    for b in batches[1:]:
        tr_c.train([b], max_steps=tr_c.step + 1)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 ref, jax.device_get(tr_c.params))


def test_revive_lora_kernels_from_plain_dicts():
    w = jnp.ones((4, 6))
    tree = {"layer": {"kernel": {
        "w": w, "a": jnp.ones((4, 2)), "b": jnp.zeros((2, 6)),
        "scale": jnp.asarray(1.0)}}}
    out = revive_lora_kernels(tree)
    assert isinstance(out["layer"]["kernel"], LoraKernel)
    # nested quantized base revives too
    tree2 = {"kernel": {
        "w": {"qw": jnp.ones((4, 6), jnp.int8),
              "scale": jnp.ones((1, 6), jnp.float32)},
        "a": jnp.ones((4, 2)), "b": jnp.zeros((2, 6)),
        "scale": jnp.asarray(1.0)}}
    out2 = revive_lora_kernels(tree2)
    from mjvideo_tpu.ops.quant import WOQuantKernel

    assert isinstance(out2["kernel"], LoraKernel)
    assert isinstance(out2["kernel"].w, WOQuantKernel)

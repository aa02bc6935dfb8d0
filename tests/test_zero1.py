"""ZeRO-1 optimizer-state sharding (TrainConfig.zero1).

The reference replicates AdamW moments on every DDP rank (HF Trainer /
accelerate, ``criteria_train.sh:9-13``); here the moments shard over the
``data`` mesh axis the GSPMD way (``parallel/mesh.py:zero1_opt_shardings``).
Checks on the 8-virtual-CPU mesh:

* the training trajectory is numerically identical to the replicated run;
* the big moment leaves really are split (addressable shard < full shape);
* resume re-applies the shardings and stays bit-exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.models.reward import init_reward_params
from mjvideo_tpu.train.trainer import TrainConfig, Trainer

from test_train_eval import _tiny_batch


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_reward_params(jax.random.PRNGKey(0), cfg)


def _make(cfg, params, tmp_path, zero1, **kw):
    tc = TrainConfig(
        stage=3, attn_impl="xla", learning_rate=1e-3, total_steps=8,
        remat=False, zero1=zero1, checkpoint_dir=str(tmp_path / f"z{zero1}"),
        log_every=1, checkpoint_every=100, **kw,
    )
    return Trainer(cfg, jax.tree.map(lambda a: a.copy(), params), tc)


def _batches(cfg, n):
    # B=8 so the batch divides the 8-way data axis.
    return [_tiny_batch(cfg, B=8, rng=np.random.default_rng(100 + i))
            for i in range(n)]


def test_zero1_matches_replicated_run(cfg, params, tmp_path):
    batches = _batches(cfg, 3)
    tr_rep = _make(cfg, params, tmp_path, zero1=False)
    tr_z1 = _make(cfg, params, tmp_path, zero1=True)
    assert tr_z1.mesh.shape["data"] == 8
    for b in batches:
        tr_rep.train([b], max_steps=tr_rep.step + 1)
        tr_z1.train([b], max_steps=tr_z1.step + 1)
    p_rep = jax.device_get(tr_rep.params)
    p_z1 = jax.device_get(tr_z1.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=2e-6),
        p_rep, p_z1,
    )


def test_zero1_actually_shards_moments(cfg, params, tmp_path):
    tr = _make(cfg, params, tmp_path, zero1=True)
    # mu lives somewhere inside the chain/multi_transform nesting; find a
    # large leaf and check its addressable shard is a real split.
    sharded = 0
    for leaf in jax.tree.leaves(tr.opt_state):
        if hasattr(leaf, "sharding") and leaf.ndim >= 1 and leaf.size >= 64:
            shard = leaf.addressable_shards[0].data
            if shard.size < leaf.size:
                assert leaf.size % shard.size == 0
                sharded += 1
    assert sharded >= 10, f"only {sharded} sharded moment leaves"
    # Step once: out_shardings must keep the moments sharded.
    tr.train([_tiny_batch(cfg, B=8)], max_steps=1)
    still = sum(
        1 for leaf in jax.tree.leaves(tr.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim >= 1 and leaf.size >= 64
        and leaf.addressable_shards[0].data.size < leaf.size
    )
    assert still >= 10, f"moments re-replicated after a step ({still})"


def test_zero1_with_accumulation_shards_acc_grads(cfg, params, tmp_path):
    tr = _make(cfg, params, tmp_path, zero1=True,
               gradient_accumulation_steps=2)
    n = sum(
        1 for leaf in jax.tree.leaves(tr.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim >= 1 and leaf.size >= 64
        and leaf.addressable_shards[0].data.size < leaf.size
    )
    # MultiSteps adds an acc_grads tree on top of mu/nu.
    assert n >= 15, f"only {n} sharded leaves under MultiSteps"
    tr.train([_tiny_batch(cfg, B=8)], max_steps=1)
    assert np.isfinite(float(jax.tree.leaves(tr.params)[0].sum()))


def test_zero1_resume_is_bit_exact(cfg, params, tmp_path):
    batches = _batches(cfg, 4)
    tr_a = _make(cfg, params, tmp_path, zero1=True)
    for b in batches:
        tr_a.train([b], max_steps=tr_a.step + 1)
    ref = jax.device_get(tr_a.params)

    tr_b = _make(cfg, params, tmp_path / "b", zero1=True)
    for b in batches[:2]:
        tr_b.train([b], max_steps=tr_b.step + 1)
    tr_b.save()
    tr_c = _make(cfg, params, tmp_path / "b", zero1=True)
    assert tr_c.resume_latest() is not None
    assert tr_c.step == 2
    # Resumed opt state must carry the ZeRO-1 shardings.
    big = [leaf for leaf in jax.tree.leaves(tr_c.opt_state)
           if hasattr(leaf, "sharding") and leaf.ndim >= 1 and leaf.size >= 64]
    assert any(l.addressable_shards[0].data.size < l.size for l in big)
    for b in batches[2:]:
        tr_c.train([b], max_steps=tr_c.step + 1)
    got = jax.device_get(tr_c.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), ref, got)


def test_async_checkpoint_resume_is_bit_exact(cfg, params, tmp_path):
    """async_checkpoint: background-committed saves restore bit-exactly
    and rotation never deletes an in-flight write (save() waits)."""
    batches = _batches(cfg, 4)

    def make(d, **kw):
        tc = TrainConfig(stage=3, attn_impl="xla", learning_rate=1e-3,
                         total_steps=8, remat=False, checkpoint_dir=str(d),
                         log_every=1, checkpoint_every=1,
                         keep_checkpoints=2, **kw)
        return Trainer(cfg, jax.tree.map(lambda a: a.copy(), params), tc)

    tr_sync = make(tmp_path / "sync")
    tr_async = make(tmp_path / "async", async_checkpoint=True)
    for b in batches:
        tr_sync.train([b], max_steps=tr_sync.step + 1)
        tr_async.train([b], max_steps=tr_async.step + 1)
    # rotation kept only the last 2 checkpoints in both modes
    import os

    kept = sorted(d for d in os.listdir(tmp_path / "async")
                  if d.startswith("stage3_step"))
    assert kept == ["stage3_step3", "stage3_step4"], kept

    tr_r = make(tmp_path / "async", async_checkpoint=True)
    assert tr_r.resume_latest() is not None
    assert tr_r.step == 4
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 jax.device_get(tr_sync.params), jax.device_get(tr_r.params))

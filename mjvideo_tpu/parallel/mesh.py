"""Device mesh + sharding rules.

The reference's only distribution strategy is DDP over NCCL via HF
``accelerate`` (``criteria_train.sh:9-13``), requiring a process group even at
world_size 1 (``eval_genai_mjvideo.py:17-24``).  Here (SURVEY.md §2.2):

* a ``jax.sharding.Mesh`` with axes ``('data', 'model')`` replaces process
  groups; single-host runs use a 1x1 mesh with zero ceremony;
* data parallelism shards the batch over ``data`` and lets XLA emit the
  gradient ``psum`` over ICI;
* optional tensor parallelism (P2 for a 2B model, SURVEY §2.2) shards the
  Megatron-style pairs — (wq/wk/wv out, wo in), (w1/w3 out, w2 in), ViT
  (qkv out, proj in), (fc1 out, fc2 in) — over ``model``;
* frozen-parameter handling is a pytree filter, not
  ``ddp_find_unused_parameters``.

Rules are path-pattern based so they survive schema evolution.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ('data', 'model') mesh; data=-1 = all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# (path regex, partition spec for that param). First match wins.
# Layer-stacked params have a leading L axis -> specs start with None.
TP_RULES: Tuple[Tuple[str, P], ...] = (
    # LLM attention: column-parallel qkv, row-parallel output proj.
    (r"attention/w[qkv]/kernel", P(None, None, "model")),
    (r"attention/wo/kernel", P(None, "model", None)),
    (r"attention/w[qkv]/bias", P(None, "model")),
    # LLM MLP: column-parallel w1/w3, row-parallel w2.
    (r"feed_forward/w[13]/kernel", P(None, None, "model")),
    (r"feed_forward/w2/kernel", P(None, "model", None)),
    # ViT attention/MLP, same megatron pattern.
    (r"attn/qkv/kernel", P(None, None, "model")),
    (r"attn/qkv/bias", P(None, "model")),
    (r"attn/proj/kernel", P(None, "model", None)),
    (r"mlp/fc1/kernel", P(None, None, "model")),
    (r"mlp/fc1/bias", P(None, "model")),
    (r"mlp/fc2/kernel", P(None, "model", None)),
    # SigLIP-style towers (videoscore / MiniCPM-V vpm) and the CogVLM2 EVA
    # tower keep separate per-layer q/k/v/o (or packed qkv + dense) directly
    # under 'layers/': same megatron pattern.
    (r"layers/[qkv]/kernel", P(None, None, "model")),
    (r"layers/[qkv]/bias", P(None, "model")),
    (r"layers/o/kernel", P(None, "model", None)),
    (r"layers/qkv/kernel", P(None, None, "model")),
    (r"layers/qkv/bias", P(None, "model")),
    (r"layers/dense/kernel", P(None, "model", None)),
    (r"layers/fc1/kernel", P(None, None, "model")),
    (r"layers/fc1/bias", P(None, "model")),
    (r"layers/fc2/kernel", P(None, "model", None)),
    # CogVLM2 dual-expert decoder: shard both experts' MLPs and output
    # projections; the packed vision/language qkv stays replicated (its
    # [q;k;v] layout doesn't column-split cleanly across heads).
    (r"mlp/(vision|language)/w[13]/kernel", P(None, None, "model")),
    (r"mlp/(vision|language)/w2/kernel", P(None, "model", None)),
    (r"(vision|language)_dense/kernel", P(None, "model", None)),
    # Embedding + LM head sharded over vocab.
    (r"tok_embeddings$", P("model", None)),
    (r"output/kernel", P(None, "model")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspec(path: str, tp: bool) -> P:
    """PartitionSpec for one parameter path ('' = fully replicated)."""
    if tp:
        for pattern, spec in TP_RULES:
            if re.search(pattern, path):
                return spec
    return P()


def param_shardings(params: Any, mesh: Mesh, tp: bool = True):
    """Pytree of NamedShardings matching ``params``."""
    def one(path, leaf):
        spec = param_pspec(_path_str(path), tp and mesh.shape["model"] > 1)
        # Drop specs that don't divide the actual shape (e.g. tiny test dims).
        if any(
            ax is not None and leaf.shape[i] % mesh.shape[ax] != 0
            for i, ax in enumerate(spec)
        ):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh):
    """Leading-axis data sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh, tp: bool = True):
    """Place a param pytree onto the mesh per the TP/DP rules."""
    return jax.device_put(params, param_shardings(params, mesh, tp))


def shard_batch(batch: Any, mesh: Mesh):
    """Shard every array in a batch dict along its leading (batch) axis."""
    return jax.device_put(batch, batch_sharding(mesh))


def zero1_opt_shardings(opt_state, params: Any, mesh: Mesh, tp: bool = True):
    """ZeRO-1 shardings for an optimizer-state pytree.

    Under pure data parallelism the params replicate, so every param-shaped
    optimizer buffer (Adam mu/nu, ``optax.MultiSteps`` gradient accumulator)
    replicates too — at 2B scale that is ~8 GB of fp32 moments PER CHIP that
    could instead be split 8 ways over the ``data`` axis (ZeRO stage 1,
    Rajbhandari et al.).  The GSPMD way needs no gather/scatter code: give
    each moment leaf a sharding over ``data`` (on top of any tensor-parallel
    axes it inherits from its param) and pin the train step's
    ``out_shardings``; XLA shards the elementwise optimizer update and
    inserts the update all-gather into the (replicated) params on its own.

    A leaf is sharded iff its pytree path ends with a parameter's path AND
    the shapes match — this walks arbitrary optax wrapper nesting (chain /
    multi_transform / MultiSteps) without knowing the state types, and
    leaves non-param-shaped state (schedule counts, adafactor row/col
    factors) replicated.  The extra ``data`` axis goes on the largest
    not-yet-sharded dimension divisible by the data-axis size.
    """
    data_size = mesh.shape["data"]
    base = param_shardings(params, mesh, tp)
    by_path = []
    for (ppath, leaf), (_, shd) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(base),
    ):
        by_path.append((_path_str(ppath), leaf.shape, shd.spec))
    # Longest param path first so e.g. 'mlp1/2/kernel' wins over '2/kernel'.
    by_path.sort(key=lambda t: -len(t[0]))

    def extend(shape, spec) -> P:
        full = list(spec) + [None] * (len(shape) - len(spec))
        best = -1
        for i, (dim, ax) in enumerate(zip(shape, full)):
            if ax is None and dim % data_size == 0 and (
                best < 0 or dim > shape[best]
            ):
                best = i
        if best >= 0:
            full[best] = "data"
        return P(*full)

    def one(path, leaf):
        if data_size > 1 and hasattr(leaf, "shape"):
            s = _path_str(path)
            for ppath, pshape, pspec in by_path:
                if (s == ppath or s.endswith("/" + ppath)) \
                        and tuple(leaf.shape) == tuple(pshape):
                    return NamedSharding(mesh, extend(leaf.shape, pspec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, opt_state)

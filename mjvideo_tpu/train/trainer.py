"""Training harness: optax + pjit train step, freeze policies, 3-stage chain.

Replaces the HF ``Trainer`` subclasses (``scripts/train/{criteria,aspect,
overall}_train.py``) and their accelerate/DDP launch story.  TPU-first:

* One jit'd ``train_step`` over a ('data','model') mesh; the batch shards on
  ``data`` and XLA emits the gradient all-reduce over ICI — no DDP, no
  process-group env vars, no ``ddp_find_unused_parameters`` (frozen params
  are an optax mask, ``moe_reward`` freeze policies in ``losses.STAGES``).
* Stage chaining = warm-starting params from the previous stage's orbax
  checkpoint (the reference chains safetensors files,
  ``aspect_train.py:18``, ``overall_train.py:20``).
* Checkpoints carry {params, opt_state}; together with deterministic data
  order (the caller feeds batches from ``Trainer.step`` onward) resume is
  bit-exact.
"""

from __future__ import annotations

import functools
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from ..configs import RewardConfig
from ..models.reward import reward_forward
from ..parallel.mesh import make_mesh, shard_batch, shard_params
from .losses import STAGES


@dataclass
class TrainConfig:
    stage: int = 1
    # Conservative programmatic default; the train CLI resolves unset
    # hyperparameters to the REFERENCE stage scripts' defaults instead
    # (lr 3e-5 / cosine / wd 0.1 / warmup 25-50-5 / accum 8-8-4 —
    # cli.REFERENCE_STAGE_DEFAULTS).
    learning_rate: float = 1e-6
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    # bf16 first-moment storage halves optimizer memory (2B params: 7.2GB
    # fp32 mu -> 3.6GB), often the difference between fitting a single v5e
    # chip or not; v stays fp32 for stability.
    adam_mu_dtype: Optional[str] = None  # None | 'bfloat16' 
    warmup_steps: int = 0
    total_steps: int = 1000
    schedule: str = "linear"  # HF Trainer default: linear decay w/ warmup
    max_grad_norm: float = 1.0
    # Mean micro-batch gradients, apply the optimizer every k calls —
    # HF Trainer semantics (criteria/aspect_train.py default 8,
    # overall_train.py default 4): effective batch = batch x k without
    # the activation memory of the big batch.  optax.MultiSteps holds
    # the running-mean gradient (one extra trainable-params-sized
    # buffer); the LR schedule counts OPTIMIZER steps, as HF does.
    gradient_accumulation_steps: int = 1
    mse: Optional[bool] = None  # None = the stage's script default
    beta: float = 1.0
    attn_impl: str = "auto"
    # False | True/'full' (whole-block checkpoint) | 'dots' (save matmul
    # outputs, recompute only norm/attention glue) — ops/remat.py
    remat: object = True
    optimizer: str = "adamw"  # 'adamw' (reference) | 'adafactor' (low-mem)
    # ZeRO-1: shard param-shaped optimizer buffers (Adam mu/nu, the
    # accumulation buffer) over the 'data' mesh axis instead of
    # replicating them — optimizer memory / dp_degree, update math
    # unchanged (parallel/mesh.py: zero1_opt_shardings).
    zero1: bool = False
    # Sequence-parallel training ('ring' | 'allgather', parallel/sequence.py):
    # the LLM attention shards the TOKEN dim over the mesh's 'data' axis and
    # the ViT shards its tile batch over the same axis — the long-context
    # TRAINING mode (>40k-token sequences).  The batch is NOT additionally
    # sharded over 'data' (the axis is spent on the sequence); callers
    # device_put ids/mask with P(None, 'data').  Composes with ZeRO-1 (the
    # moment shards live on the same axis) and TP.
    sp: Optional[str] = None
    # LoRA (ops/lora.py): rank > 0 wraps the LLM attention/MLP kernels in
    # LoraKernel nodes; the backbone then trains ONLY the low-rank a/b
    # adapters (heads/gates keep their per-stage policy), shrinking
    # trainable state + optimizer moments from GBs to MBs.
    lora_rank: int = 0
    lora_alpha: Optional[float] = None  # None = rank (scale 1.0)
    # Overlap checkpoint disk writes with training (orbax async commit);
    # the device->host snapshot stays synchronous (donation safety).
    async_checkpoint: bool = False
    log_every: int = 10
    checkpoint_every: int = 500
    checkpoint_dir: str = "./checkpoints"
    keep_checkpoints: int = 3  # save_total_limit (criteria_train.py:30)
    mesh_model_axis: int = 1
    mesh_data_axis: int = -1  # -1 = all remaining devices
    tensorboard: bool = False  # reference: report_to='tensorboard'
    extra: Dict[str, Any] = field(default_factory=dict)

    def stage_mse_default(self) -> bool:
        # criteria_train.py:69 mse=False; aspect/overall default mse=True.
        return self.stage != 1


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def trainable_mask(params, stage: int, lora: bool = False):
    """Pytree of bools: True = trained this stage (losses.STAGES policies).

    Wrapper-node fields: anything under a ``.w`` field (a LoraKernel's
    frozen base, possibly itself a quant-kernel dict) is never trainable.
    In LoRA mode the backbone (``model/...``) trains ONLY the ``.a``/
    ``.b`` adapter fields; heads and gates keep the stage policy.
    """
    prefixes = STAGES[stage].trainable_paths

    def one(path, _):
        s = _path_str(path)
        if not any(s.startswith(p) for p in prefixes):
            return False
        if "/.w" in s:
            return False
        if lora and s.startswith("model/"):
            return s.endswith("/.a") or s.endswith("/.b")
        return True

    return jax.tree_util.tree_map_with_path(one, params)


def make_optimizer(tc: TrainConfig, params) -> optax.GradientTransformation:
    if tc.schedule == "linear":
        lr = optax.linear_schedule(
            tc.learning_rate, 0.0, max(tc.total_steps - tc.warmup_steps, 1)
        )
    elif tc.schedule == "cosine":
        lr = optax.cosine_decay_schedule(
            tc.learning_rate, max(tc.total_steps - tc.warmup_steps, 1)
        )
    else:
        lr = tc.learning_rate
    if tc.warmup_steps:
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, tc.learning_rate, tc.warmup_steps), lr],
            [tc.warmup_steps],
        )
    if tc.optimizer == "adafactor":
        # Memory-efficient option: factored second moment (O(rows+cols)
        # instead of O(params)) — AdamW's fp32 nu alone is ~7GB for the
        # trainable LLM at 2B scale, the difference between full-depth
        # finetuning fitting one v5e chip or not.  The reference has no
        # equivalent (AdamW via HF Trainer only).
        inner = optax.adafactor(
            lr, multiply_by_parameter_scale=False, clipping_threshold=None,
            weight_decay_rate=tc.weight_decay or None,
        )
    else:
        inner = optax.adamw(
            lr, b1=tc.adam_b1, b2=tc.adam_b2, eps=tc.adam_eps,
            weight_decay=tc.weight_decay,
            mu_dtype=jnp.bfloat16 if tc.adam_mu_dtype == "bfloat16" else None,
        )
    opt = optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        inner,
    )
    mask = trainable_mask(params, tc.stage, lora=tc.lora_rank > 0)
    out = optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", mask),
    )
    if tc.gradient_accumulation_steps > 1:
        out = optax.MultiSteps(
            out, every_k_schedule=tc.gradient_accumulation_steps)
    return out


def make_loss_fn(cfg: RewardConfig, tc: TrainConfig,
                 mesh=None) -> Callable:
    """(params, batch) -> scalar loss; two sibling forwards + stage loss.

    Frozen subtrees (per the stage's policy) are wrapped in
    ``stop_gradient`` so their gradients are never computed or stored —
    the optax ``set_to_zero`` mask alone would still materialize them
    (the reference pays this as ``ddp_find_unused_parameters=True``).
    ``grad_norm`` therefore reports the TRAINABLE-parameter norm.

    ``mesh`` is required when ``tc.sp`` is set (the sequence-parallel spec
    needs the mesh the step runs over).
    """
    mse = tc.mse if tc.mse is not None else tc.stage_mse_default()
    stage_loss = STAGES[tc.stage].loss_fn
    if tc.sp is not None and mesh is None:
        raise ValueError("tc.sp requires the mesh argument")
    sp_spec = ({"mesh": mesh, "axis": "data", "kind": tc.sp}
               if tc.sp is not None else None)

    def loss_fn(raw_params, batch, vit_rng=None):
        mask = trainable_mask(raw_params, tc.stage, lora=tc.lora_rank > 0)
        params = jax.tree.map(
            lambda p, t: p if t else jax.lax.stop_gradient(p),
            raw_params, mask,
        )
        outs = []
        for v in (0, 1):
            pix = batch[f"video_{v}_pixel_values"]
            # (B, P, H, W, 3) -> (B*P, H, W, 3), like criteria_train.py:70-72.
            pix = pix.reshape((-1,) + pix.shape[-3:])
            outs.append(
                reward_forward(
                    params, cfg, pix,
                    batch[f"video_{v}_input_ids"],
                    batch[f"video_{v}_attention_mask"],
                    batch[f"video_{v}_gating_pos"],
                    attn_impl=tc.attn_impl, remat=tc.remat,
                    vit_rng=None if vit_rng is None
                    else jax.random.fold_in(vit_rng, v),
                    sp=sp_spec,
                )
            )
        return stage_loss(outs[0], outs[1], batch, mse=mse, beta=tc.beta) \
            if tc.stage > 1 else stage_loss(outs[0], outs[1], batch, mse=mse)

    return loss_fn


def make_train_step(cfg: RewardConfig, tc: TrainConfig, optimizer,
                    out_shardings=None, mesh=None) -> Callable:
    """``out_shardings``, when given, is the full output-triple sharding
    pytree ``(param_shardings, opt_state_shardings, metric_shardings)`` —
    pinned so ZeRO-1 moment shards stay sharded across steps instead of
    being re-replicated by sharding propagation.  ``mesh`` is required
    when ``tc.sp`` is set (see ``make_loss_fn``)."""
    loss_fn = make_loss_fn(cfg, tc, mesh=mesh)
    jit_kw = {"out_shardings": out_shardings} if out_shardings is not None \
        else {}

    @functools.partial(jax.jit, donate_argnums=(0, 1), **jit_kw)
    def train_step(params, opt_state, batch, rng=None):
        # allow_int: quantized frozen bases (QLoRA int8 leaves) are valid
        # non-differentiable inputs; their float0 grads become fp32 zeros,
        # which the frozen optax partition turns into no-ops that XLA
        # dead-code-eliminates under jit.
        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(
            params, batch, rng)
        grads = jax.tree.map(
            lambda g, p: jnp.zeros(p.shape, jnp.float32)
            if g.dtype == jax.dtypes.float0 else g,
            grads, params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


class Trainer:
    """Minimal deterministic training loop with orbax checkpointing and
    JSONL metrics (SURVEY.md §5 observability row)."""

    def __init__(
        self,
        cfg: RewardConfig,
        params,
        tc: TrainConfig,
        mesh=None,
    ):
        self.cfg = cfg
        self.tc = tc
        if tc.lora_rank > 0:
            from ..ops.lora import apply_lora

            # Idempotent: an already-wrapped tree (warm start from a LoRA
            # checkpoint) passes through unchanged.
            params = apply_lora(
                params, jax.random.PRNGKey(tc.lora_rank), tc.lora_rank,
                alpha=tc.lora_alpha,
            )
        if mesh is None:
            import jax as _jax

            devices = None
            if tc.mesh_data_axis != -1:
                devices = _jax.devices()[: tc.mesh_data_axis
                                         * tc.mesh_model_axis]
            mesh = make_mesh(data=tc.mesh_data_axis,
                             model=tc.mesh_model_axis, devices=devices)
        self.mesh = mesh
        self.params = shard_params(params, self.mesh)
        self.optimizer = make_optimizer(tc, self.params)
        self.opt_state = self._place_opt_state(self.optimizer.init(self.params))
        out_shardings = None
        if tc.zero1 and self.mesh.shape["data"] > 1:
            from jax.sharding import PartitionSpec as _P

            from ..parallel.mesh import param_shardings, zero1_opt_shardings

            rep = jax.sharding.NamedSharding(self.mesh, _P())
            out_shardings = (
                param_shardings(self.params, self.mesh),
                zero1_opt_shardings(self.opt_state, self.params, self.mesh),
                {"loss": rep, "grad_norm": rep},
            )
        self.step_fn = make_train_step(cfg, tc, self.optimizer,
                                       out_shardings=out_shardings,
                                       mesh=self.mesh)
        self.step = 0
        vis = cfg.chat.vision
        self._needs_vit_rng = vis.drop_path_rate > 0.0 or vis.dropout > 0.0
        self._base_rng = jax.random.PRNGKey(0)
        os.makedirs(tc.checkpoint_dir, exist_ok=True)
        self._metrics_path = os.path.join(tc.checkpoint_dir, "metrics.jsonl")
        self._saved: list = []
        self._tb = None
        if tc.tensorboard:
            # The reference logs Trainer scalars to tensorboard
            # (criteria_train.py:35,424); optional here, JSONL always on.
            try:
                from flax.metrics.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(tc.checkpoint_dir, "tb"))
            except ImportError:
                pass

    def _place_batch(self, batch):
        """Mesh placement for one train batch.

        Plain DP shards every array on its leading (batch) axis.  Under
        ``tc.sp`` the 'data' axis carries the SEQUENCE instead: (B, T)
        token arrays shard on dim 1, pixel tensors shard their tile dim
        when it divides, everything else replicates."""
        if self.tc.sp is None:
            return shard_batch(batch, self.mesh)
        from jax.sharding import NamedSharding, PartitionSpec as _P

        n = self.mesh.shape["data"]
        rep = NamedSharding(self.mesh, _P())
        seq = NamedSharding(self.mesh, _P(None, "data"))

        def place(key, x):
            if key.endswith("input_ids") or key.endswith("attention_mask"):
                if x.shape[-1] % n:
                    raise ValueError(
                        f"sp shards the token dim over data={n}; batch key "
                        f"{key} has T={x.shape[-1]}")
                return jax.device_put(x, seq)
            if key.endswith("pixel_values") and x.ndim >= 2 \
                    and x.shape[1] % n == 0:
                return jax.device_put(
                    x, NamedSharding(self.mesh, _P(None, "data")))
            return jax.device_put(x, rep)

        return {k: place(k, v) for k, v in batch.items()}

    def _place_opt_state(self, opt_state):
        """Apply ZeRO-1 data-axis sharding to the optimizer state (no-op
        unless ``tc.zero1`` and the mesh has >1 data shard)."""
        if not self.tc.zero1 or self.mesh.shape["data"] <= 1:
            return opt_state
        from ..parallel.mesh import zero1_opt_shardings

        return jax.device_put(
            opt_state,
            zero1_opt_shardings(opt_state, self.params, self.mesh),
        )

    def log(self, record: Dict[str, Any]) -> None:
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None and "step" in record:
            for k, v in record.items():
                if isinstance(v, (int, float)) and k != "step":
                    self._tb.scalar(k, v, record["step"])

    def evaluate(self, batches: Iterable[Dict[str, Any]]) -> Dict[str, Any]:
        """In-training eval: pairwise preference accuracy + per-dimension
        criteria/aspect metrics (``overall_train.py:390-442`` +
        ``evaluate_aspect`` ``:204-306``) from jit'd batched forwards."""
        import numpy as np

        from ..configs import ASPECT_NAMES, CRITERIA_NAMES
        from ..eval.metrics import binary_dimension_metrics, preference_accuracy
        from ..models.reward import reward_forward

        cfg, tc = self.cfg, self.tc

        @functools.partial(jax.jit)
        def fwd(params, batch):
            outs = {}
            for v in (0, 1):
                pix = batch[f"video_{v}_pixel_values"]
                pix = pix.reshape((-1,) + pix.shape[-3:])
                o = reward_forward(
                    params, cfg, pix,
                    batch[f"video_{v}_input_ids"],
                    batch[f"video_{v}_attention_mask"],
                    batch[f"video_{v}_gating_pos"],
                    attn_impl=tc.attn_impl, remat=False,
                )
                outs[v] = (o.score, o.aspect_scores, o.rewards)
            return outs

        scores0, scores1, prefs, masks = [], [], [], []
        crit_s, crit_gt, crit_rel = [], [], []
        asp_s, asp_gt, asp_rel = [], [], []
        for batch in batches:
            jb = shard_batch(
                {k: jnp.asarray(v) for k, v in batch.items()}, self.mesh
            )
            outs = jax.device_get(fwd(self.params, jb))
            scores0.append(outs[0][0])
            scores1.append(outs[1][0])
            prefs.append(np.asarray(batch["overall_preference"]).reshape(-1))
            masks.append(np.asarray(batch["overall_mask"]).reshape(-1))
            for v in (0, 1):
                asp_s.append(outs[v][1])
                crit_s.append(outs[v][2])
                crit_gt.append(np.asarray(batch[f"video_{v}_criteria_score"]))
                crit_rel.append(
                    np.asarray(batch[f"video_{v}_criteria_related"]))
                asp_gt.append(np.asarray(batch[f"video_{v}_aspect_score"]))
                asp_rel.append(np.asarray(batch[f"video_{v}_aspect_related"]))

        result = {
            "preference": preference_accuracy(
                np.concatenate(scores0), np.concatenate(scores1),
                np.concatenate(prefs), np.concatenate(masks),
            ),
            "criteria": binary_dimension_metrics(
                np.concatenate(crit_s), np.concatenate(crit_gt),
                np.concatenate(crit_rel), names=CRITERIA_NAMES,
            ),
            "aspects": binary_dimension_metrics(
                np.concatenate(asp_s), np.concatenate(asp_gt),
                np.concatenate(asp_rel), names=ASPECT_NAMES,
            ),
        }
        self.log({"step": self.step, "eval": result})
        return result

    def resume_latest(self) -> Optional[str]:
        """Restore params AND optimizer state from the newest checkpoint.

        Recovery story (SURVEY.md §5 failure-detection row): checkpoints
        carry {params, opt_state}, so Adam moments and the schedule count
        survive; with the caller feeding batches deterministically from
        ``self.step`` onward, resume is bit-exact (tested in
        tests/test_train_eval.py).  The reference's recovery was 'slurm
        restarts + find first safetensors' (``criteria_train.py:340-345``),
        which also reset optimizer state.
        """
        import re

        from ..utils.checkpoint import wait_for_saves

        wait_for_saves()  # never read a checkpoint still being written
        pat = re.compile(rf"stage{self.tc.stage}_step(\d+)$")
        best = None
        for name in os.listdir(self.tc.checkpoint_dir):
            m = pat.match(name)
            if m:
                step = int(m.group(1))
                if best is None or step > best[0]:
                    best = (step, os.path.join(self.tc.checkpoint_dir, name))
        if best is None:
            return None
        from ..parallel.mesh import shard_params as _shard
        from ..utils.checkpoint import restore_pytree

        params_like = jax.device_get(self.params)
        if os.path.isdir(os.path.join(best[1], "params")):
            params = restore_pytree(
                os.path.join(best[1], "params"), like=params_like)
            opt_state = restore_pytree(
                os.path.join(best[1], "opt_state"),
                like=jax.device_get(self.opt_state))
        else:
            # Older checkpoints stored bare params; warn that optimizer
            # moments start fresh (resume then NOT exact).
            import warnings

            warnings.warn(
                f"checkpoint {best[1]} has no opt_state (pre-split format); "
                "optimizer moments re-initialized", stacklevel=2)
            params, opt_state = restore_pytree(best[1], like=params_like), None

        self.params = _shard(params, self.mesh)
        if opt_state is None:
            self.opt_state = self._place_opt_state(
                self.optimizer.init(self.params))
        else:
            # Re-place the restored host opt_state with the same shardings a
            # fresh init would have (mu/nu follow the param shardings, then
            # the ZeRO-1 data-axis split if enabled).  Template leaves that
            # eager-init left on one device (e.g. the schedule ``count``
            # scalar) are normalized to mesh-replicated — committing them
            # single-device would conflict with the mesh-placed params at
            # the next step.
            from jax.sharding import NamedSharding, PartitionSpec as _P

            template = self._place_opt_state(self.optimizer.init(self.params))
            rep = NamedSharding(self.mesh, _P())
            self.opt_state = jax.tree.map(
                lambda t, x: jax.device_put(
                    x, t.sharding if isinstance(t.sharding, NamedSharding)
                    else rep),
                template, opt_state,
            )
        self.step = best[0]
        return best[1]

    def save(self) -> str:
        from ..utils.checkpoint import save_pytree, wait_for_saves

        path = os.path.join(
            self.tc.checkpoint_dir, f"stage{self.tc.stage}_step{self.step}"
        )
        block = not self.tc.async_checkpoint
        if not block:
            # One outstanding async save at a time: a second save to the
            # same step path (checkpoint_every + epoch end) must not race
            # the first, and the device_get below is the donation-safe
            # snapshot (the train step donates the device buffers).
            wait_for_saves()
        save_pytree(os.path.join(path, "params"),
                    jax.device_get(self.params), block=block)
        save_pytree(os.path.join(path, "opt_state"),
                    jax.device_get(self.opt_state), block=block)
        # A step can save twice (checkpoint_every hit + epoch end); a
        # duplicate prune-list entry would let the rotation delete a
        # path that is also the newest checkpoint.
        if path not in self._saved:
            self._saved.append(path)
        if len(self._saved) > self.tc.keep_checkpoints and not block:
            wait_for_saves()  # never rmtree a directory still being written
        while len(self._saved) > self.tc.keep_checkpoints:
            import shutil

            old = self._saved.pop(0)
            shutil.rmtree(old, ignore_errors=True)
        return path

    def train(
        self, batches: Iterable[Dict[str, Any]],
        max_steps: Optional[int] = None,
    ) -> Dict[str, float]:
        last: Dict[str, float] = {}
        t0 = time.time()
        for batch in batches:
            if max_steps is not None and self.step >= max_steps:
                break
            batch = self._place_batch(
                {k: jnp.asarray(v) for k, v in batch.items()})
            if self._needs_vit_rng:
                # Step-keyed fold keeps stochastic depth deterministic across
                # resume (the key depends only on the step number).
                rng = jax.random.fold_in(self._base_rng, self.step)
                self.params, self.opt_state, metrics = self.step_fn(
                    self.params, self.opt_state, batch, rng
                )
            else:
                self.params, self.opt_state, metrics = self.step_fn(
                    self.params, self.opt_state, batch
                )
            self.step += 1
            if self.step % self.tc.log_every == 0:
                last = {k: float(v) for k, v in metrics.items()}
                last.update(
                    step=self.step,
                    stage=self.tc.stage,
                    elapsed_s=round(time.time() - t0, 2),
                )
                self.log(last)
            if self.step % self.tc.checkpoint_every == 0:
                self.save()
        if self.tc.async_checkpoint:
            from ..utils.checkpoint import wait_for_saves

            wait_for_saves()  # durability before the loop returns
        return last


def warm_start(params, checkpoint_path: str):
    """Load a previous stage's orbax checkpoint into an existing pytree.

    Accepts both the split layout (``<path>/params`` + ``<path>/opt_state``;
    only params are loaded — the next stage builds its own optimizer) and
    the older bare-params layout.
    """
    from ..utils.checkpoint import restore_pytree

    sub = os.path.join(checkpoint_path, "params")
    path = sub if os.path.isdir(sub) else checkpoint_path
    return restore_pytree(path, like=jax.device_get(params))

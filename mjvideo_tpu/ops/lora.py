"""LoRA adapters as pytree kernel nodes (low-rank finetuning).

The reference finetunes the FULL LLM in every stage (`criteria_train.py:
334-338`) — at 2B scale that is ~7 GB of fp32 Adam moments before
activations, the reason its recipe needs a 4-GPU rig.  LoRA (Hu et al.,
2021) trains a rank-r delta ``W + (alpha/r) * A @ B`` instead; here it
follows the same design as serving quantization (``ops/quant.py``): a
registered-dataclass kernel node that ``ops.matmul.dot`` dispatches on,
so the model code, scan stacking, remat, mesh sharding rules and the
trainer all work unchanged.

TPU-first details:

* ``x @ (W + s*A@B)`` is computed as ``dot(x, W) + s * (x@A)@B`` — the
  low-rank path never materializes the (K, N) delta, and ``x@A`` is a
  skinny (tokens, r) matmul the MXU handles in one pass.
* ``W`` may itself be a quantized kernel (``WOQuantKernel`` /
  ``Q4Kernel``) — the base dispatch recurses, giving QLoRA-style
  finetuning: int8/int4 frozen base + bf16 adapters, the 2B model's
  trainable state shrinks to MBs.  (w8a8 ``QuantKernel`` is rejected by
  the trainer for training elsewhere — its activation rounding is not
  differentiable.)
* Freeze semantics: the trainer's ``trainable_mask`` marks every leaf
  under a ``.w`` field frozen and, in LoRA mode, restricts backbone
  training to the ``.a``/``.b`` fields (train/trainer.py) — the reward
  heads and gates keep their per-stage policy.
* The TP rules (parallel/mesh.py) match by substring, so
  ``.../attention/wq/kernel/.b`` inherits the column-parallel spec of
  ``.../kernel`` on its N axis; ``.a``'s rank axis falls back to
  replicated via the divisibility guard.  ZeRO-1 moment sharding matches
  adapters by path-suffix + shape like any other leaf.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class LoraKernel:
    """Frozen base kernel + trainable low-rank delta.

    ``w``: (..., K, N) array or quantized kernel node (frozen);
    ``a``: (..., K, r); ``b``: (..., r, N) (zero-init, so the wrapped
    model is EXACTLY the base model at step 0); ``scale``: ``alpha / r``
    as an array shaped like the leading (layer-stack) axes — () for a
    plain kernel, (L,) for a scan-stacked one, so ``jax.lax.scan`` can
    slice every field per layer.  A data field, so a structure-less
    orbax restore can revive it (utils/checkpoint.py).
    """

    w: Any
    a: jnp.ndarray
    b: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.w.shape

    @property
    def ndim(self):
        return self.w.ndim

    @property
    def dtype(self):
        return self.w.dtype


def dot_lora(x: jnp.ndarray, lk: LoraKernel) -> jnp.ndarray:
    """x @ (w + scale * a@b) without materializing the delta."""
    from .matmul import dot

    base = dot(x, lk.w)
    lo = jnp.dot(x, lk.a, preferred_element_type=jnp.float32).astype(x.dtype)
    lo = jnp.dot(lo, lk.b, preferred_element_type=jnp.float32)
    return (base + lk.scale * lo.astype(base.dtype)).astype(x.dtype)


def dot_lora_f32(x: jnp.ndarray, lk: LoraKernel) -> jnp.ndarray:
    from .matmul import dot_f32

    base = dot_f32(x, lk.w)
    lo = jnp.dot(x, lk.a, preferred_element_type=jnp.float32).astype(x.dtype)
    lo = jnp.dot(lo, lk.b, preferred_element_type=jnp.float32)
    return base + lk.scale * lo


# The reference's freeze policy unfreezes the LLM decoder; the standard
# LoRA target set is its attention + MLP projections.
DEFAULT_TARGETS = (
    r"language_model/layers/attention/w[qkvo]/kernel$",
    r"language_model/layers/feed_forward/w[123]/kernel$",
)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def apply_lora(
    params: Any,
    rng: jax.Array,
    rank: int,
    alpha: Optional[float] = None,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Any:
    """Wrap every kernel whose path matches ``targets`` in a LoraKernel.

    ``a`` ~ N(0, 1/rank) (standard init), ``b`` = 0, so the wrapped
    forward equals the base forward until training moves ``b``.
    Already-wrapped leaves are left alone (idempotent).
    """
    if rank <= 0:
        return params
    alpha = float(alpha if alpha is not None else rank)
    pats = [re.compile(p) for p in targets]
    from .quant import QuantKernel, WOQuantKernel
    from .quant4 import Q4Kernel

    def node(n):
        # Quant kernels count as wrappable leaves so LoRA composes with a
        # pre-quantized base (QLoRA order: quantize, then apply_lora).
        return isinstance(n, (LoraKernel, QuantKernel, WOQuantKernel,
                              Q4Kernel))

    leaves = jax.tree_util.tree_leaves_with_path(params, is_leaf=node)
    keys = iter(jax.random.split(rng, max(len(leaves), 1)))

    def one(path, leaf):
        k = next(keys)
        if isinstance(leaf, LoraKernel):
            return leaf
        s = _path_str(path)
        if not any(p.search(s) for p in pats):
            return leaf
        if getattr(leaf, "ndim", 0) < 2:
            return leaf
        *lead, K, N = leaf.shape
        dtype = leaf.dtype if jnp.issubdtype(leaf.dtype, jnp.floating) \
            else jnp.bfloat16
        a = (jax.random.normal(k, (*lead, K, rank), jnp.float32)
             * rank ** -0.5).astype(dtype)
        b = jnp.zeros((*lead, rank, N), dtype)
        return LoraKernel(w=leaf, a=a, b=b,
                          scale=jnp.full(tuple(lead), alpha / rank,
                                         jnp.float32))

    return jax.tree_util.tree_map_with_path(one, params, is_leaf=node)


def merge_lora(params: Any) -> Any:
    """Fold every adapter into its base kernel: ``w + scale * a@b``.

    For export back to the reference's safetensors naming
    (utils/export.py) — the merged tree is a plain parameter tree.
    Quantized bases cannot be merged losslessly; raise instead of
    silently degrading.
    """
    from .quant import QuantKernel, WOQuantKernel
    from .quant4 import Q4Kernel

    def one(n):
        if not isinstance(n, LoraKernel):
            return n
        if isinstance(n.w, (QuantKernel, WOQuantKernel, Q4Kernel)):
            raise ValueError(
                "merge_lora: base kernel is quantized "
                f"({type(n.w).__name__}); dequantize or export adapters "
                "separately")
        n = LoraKernel(jnp.asarray(n.w), jnp.asarray(n.a),
                       jnp.asarray(n.b), jnp.asarray(n.scale))
        delta = jnp.matmul(
            n.a.astype(jnp.float32), n.b.astype(jnp.float32))
        scale = n.scale.reshape(n.scale.shape + (1, 1))
        return (n.w.astype(jnp.float32) + scale * delta).astype(n.w.dtype)

    return jax.tree_util.tree_map(
        one, params, is_leaf=lambda n: isinstance(n, LoraKernel))


def revive_lora_kernels(tree: Any) -> Any:
    """Rebuild LoraKernel nodes after a structure-less orbax restore
    (same contract as ``ops.quant.revive_quant_kernels``; the base
    ``w`` may itself be a quant-kernel dict, revived first)."""
    from .quant import revive_quant_kernels

    def is_lk(n):
        return isinstance(n, dict) and set(n.keys()) == {"w", "a", "b",
                                                         "scale"}

    def walk(n):
        if is_lk(n):
            return LoraKernel(w=revive_quant_kernels(n["w"]), a=n["a"],
                              b=n["b"], scale=n["scale"])
        if isinstance(n, dict):
            return {k: walk(v) for k, v in n.items()}
        return n

    return walk(tree)

"""Rematerialization policies for the scanned transformer blocks.

The reference checkpoints whole blocks (torch ``gradient_checkpointing``,
``modeling_intern_vit.py:344-347``); ``jax.checkpoint`` reproduces that,
and XLA additionally supports selective policies that keep the big matmul
outputs resident instead of recomputing the entire block forward during
the backward pass — trading HBM for a shorter step.

``remat`` values accepted throughout the model stack:

* ``False``  — no remat (inference / small configs);
* ``True`` / ``"full"`` — checkpoint the whole block (max memory saving,
  ~+1 extra forward of recompute);
* ``"dots"`` — ``dots_with_no_batch_dims_saveable``: weight-activation
  matmul outputs (QKV/O/MLP projections) are saved, only the cheap
  elementwise/norm/attention glue is recomputed.
"""

from __future__ import annotations

import jax


def remat_wrap(block, remat):
    """Wrap a scan body per the ``remat`` spec (see module docstring)."""
    if not remat:
        return block
    if remat is True or remat == "full":
        return jax.checkpoint(block)
    if remat == "dots":
        return jax.checkpoint(
            block,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    raise ValueError(f"unknown remat policy {remat!r}")

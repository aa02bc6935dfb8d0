"""Pixel-shuffle (space-to-channel) downsampling.

Replaces ``InternVLChatModel.pixel_shuffle`` (``modeling_internvl_chat.py:
228-242``).  On TPU this is pure data movement that XLA folds into the
surrounding layout; no kernel needed.  Both ``ps_version`` variants are kept:
'v1' omits the final H/W swap-back (the reference warns it transposes the
image), 'v2' swaps back.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(
    x: jnp.ndarray, scale_factor: float = 0.5, ps_version: str = "v2"
) -> jnp.ndarray:
    """x: (N, W, H, C) -> (N, W*s, H*s, C/s^2) with s = scale_factor.

    Axis naming follows the reference exactly (it calls the second axis W and
    the third H); the net effect for square inputs is a 2x2 space-to-channel
    fold when scale_factor=0.5.
    """
    n, w, h, c = x.shape
    sh = int(h * scale_factor)
    sc = int(c / scale_factor)
    x = x.reshape(n, w, sh, sc)
    x = jnp.transpose(x, (0, 2, 1, 3))  # (N, H*s, W, C/s)
    x = x.reshape(n, sh, int(w * scale_factor), int(c / (scale_factor**2)))
    if ps_version != "v1":
        x = jnp.transpose(x, (0, 2, 1, 3))
    return x

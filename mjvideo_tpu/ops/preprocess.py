"""On-device (TPU) fused preprocessing: bicubic resize + ImageNet normalize.

The reference preprocesses every tile on the host with PIL/torchvision
(``data.py:56-64``) and ships normalized fp32 to the device.  This module
moves the post-decode pipeline on-device (the BASELINE.json north star):
raw uint8 frames transfer over PCIe (3-4x less bandwidth than fp32) and the
resize runs on the MXU as two matmuls.

Key idea: separable antialiased bicubic resize is linear, so it IS a pair of
matrix multiplications: ``out = R_h @ img @ R_w^T`` per channel, with the
resample matrices built from the exact PIL coefficient windows
(``find_closest_aspect_ratio``/tiling geometry stays on the host — it's
data-dependent control flow).  Matching PIL's 8-bit path bit-for-bit is not
possible in float (PIL quantizes between passes); this path matches within
~1/255, far inside the 1e-2 score-parity budget, and is the high-throughput
serving configuration.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from ..data.video import IMAGENET_MEAN, IMAGENET_STD


def _bicubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    x = np.abs(x)
    return np.where(
        x < 1.0, ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


@functools.lru_cache(maxsize=64)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) PIL-window antialiased bicubic resample matrix."""
    scale = in_size / out_size
    fs = max(scale, 1.0)
    support = 2.0 * fs
    R = np.zeros((out_size, in_size), np.float32)
    for o in range(out_size):
        center = (o + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        xs = np.arange(xmin, xmax)
        w = _bicubic((xs - center + 0.5) / fs)
        s = w.sum()
        if s != 0:
            w = w / s
        R[o, xmin:xmax] = w
    return R


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "quantize"))
def resize_bicubic_device(
    frames: jnp.ndarray,  # (N, H, W, C) uint8 or float
    out_h: int,
    out_w: int,
    quantize: bool = True,
) -> jnp.ndarray:
    """Separable bicubic resize as two MXU matmuls; returns fp32 0..255.

    ``quantize=True`` mirrors PIL's 8-bit path: horizontal pass first, with
    round+clamp to uint8 between and after passes — keeps this within 1 LSB
    of the host pipeline.  ``quantize=False`` is the smooth differentiable
    variant (for reward-feedback / VADER-style gradient flows).
    """
    N, H, W, C = frames.shape
    x = frames.astype(jnp.float32)
    Rh = jnp.asarray(resize_matrix(H, out_h))
    Rw = jnp.asarray(resize_matrix(W, out_w))

    def q(v):
        return jnp.clip(jnp.round(v), 0.0, 255.0) if quantize else v

    # horizontal first, like PIL: (out_w, W) x (N, H, W, C) -> (N, H, out_w, C)
    x = q(jnp.einsum("pw,nhwc->nhpc", Rw, x,
                     precision=jax.lax.Precision.HIGHEST))
    # vertical: (out_h, H) x (N, H, out_w, C) -> (N, out_h, out_w, C)
    x = q(jnp.einsum("oh,nhwc->nowc", Rh, x,
                     precision=jax.lax.Precision.HIGHEST))
    return x


@functools.partial(jax.jit, static_argnames=("out_size", "dtype"))
def preprocess_frames_device(
    frames: jnp.ndarray,  # (N, H, W, 3) uint8
    out_size: int = 448,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """uint8 frames -> normalized (N, S, S, 3) in ``dtype``; one fused graph.

    The device-side replacement for ``build_transform`` + per-tile host work
    when max_num=1 (every frame = one tile, the reward-scoring default).
    """
    x = resize_bicubic_device(frames, out_size, out_size)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x / 255.0 - mean) / std).astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("cols", "rows", "image_size", "thumbnail",
                              "dtype")
)
def tile_frames_device(
    frames: jnp.ndarray,  # (N, H, W, 3) uint8
    cols: int,
    rows: int,
    image_size: int = 448,
    thumbnail: bool = True,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Device-side ``dynamic_preprocess`` for a fixed grid choice.

    The grid (cols, rows) is host-chosen per clip (``select_tile_grid`` —
    data-dependent), then this fused graph resizes to (rows*S, cols*S),
    crops the tiles row-major, optionally appends the thumbnail, and
    normalizes.  Returns (N * (cols*rows [+1]), S, S, 3).
    """
    N = frames.shape[0]
    big = resize_bicubic_device(frames, rows * image_size, cols * image_size)
    # (N, rows, S, cols, S, 3) -> (N, rows, cols, S, S, 3) -> flat tiles
    t = big.reshape(N, rows, image_size, cols, image_size, 3)
    t = jnp.transpose(t, (0, 1, 3, 2, 4, 5))
    tiles = t.reshape(N, rows * cols, image_size, image_size, 3)
    if thumbnail and rows * cols > 1:
        thumb = resize_bicubic_device(frames, image_size, image_size)
        tiles = jnp.concatenate([tiles, thumb[:, None]], axis=1)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    tiles = (tiles / 255.0 - mean) / std
    return tiles.reshape((-1,) + tiles.shape[2:]).astype(dtype)

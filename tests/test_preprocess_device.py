"""On-device preprocessing vs the PIL host oracle (within float tolerance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.data.video import IMAGENET_MEAN, IMAGENET_STD, normalize, tile_frame
from mjvideo_tpu.ops.preprocess import (
    preprocess_frames_device,
    resize_bicubic_device,
    resize_matrix,
    tile_frames_device,
)


def test_resize_matrix_rows_sum_to_one():
    for in_s, out_s in [(720, 448), (100, 448), (448, 448)]:
        R = resize_matrix(in_s, out_s)
        np.testing.assert_allclose(R.sum(axis=1), 1.0, atol=1e-6)


def test_identity_resize_is_exact():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, size=(1, 56, 56, 3), dtype=np.uint8)
    out = np.asarray(resize_bicubic_device(jnp.asarray(x), 56, 56))
    np.testing.assert_allclose(out, x.astype(np.float32), atol=1e-3)


@pytest.mark.parametrize("h,w", [(250, 460), (100, 80), (720, 1280)])
def test_device_resize_close_to_pil(h, w):
    from PIL import Image

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(2, h, w, 3), dtype=np.uint8)
    got = np.asarray(
        preprocess_frames_device(jnp.asarray(frames), 112, dtype=jnp.float32)
    )
    for i in range(2):
        resized = np.asarray(
            Image.fromarray(frames[i]).resize((112, 112), Image.BICUBIC)
        )
        want = normalize(resized)
        # PIL quantizes between passes (uint8); float path differs <~2/255
        # in pixel space -> ~0.04 after /std normalization.
        err = np.abs(got[i] - want).max()
        assert err < 0.06, err
        # and the typical error is tiny
        assert np.abs(got[i] - want).mean() < 0.01


def test_device_tiling_matches_host_geometry():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(2, 96, 160, 3), dtype=np.uint8)
    # host chooses the grid; fix (cols=2, rows=1), image_size 48, thumbnail
    got = np.asarray(tile_frames_device(
        jnp.asarray(frames), cols=2, rows=1, image_size=48, thumbnail=True,
        dtype=jnp.float32,
    ))
    assert got.shape == (2 * 3, 48, 48, 3)  # 2 tiles + thumbnail per frame
    # host oracle (PIL path) for the first frame
    host = tile_frame(frames[0], min_num=2, max_num=2, image_size=48,
                      use_thumbnail=True)
    want = normalize(host)
    assert want.shape == (3, 48, 48, 3)
    err = np.abs(got[:3] - want).max()
    assert err < 0.08, err

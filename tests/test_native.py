"""Native C++ preprocessing: bit-exactness vs the PIL path it replaces."""

import numpy as np
import pytest

from mjvideo_tpu.data.video import IMAGENET_MEAN, IMAGENET_STD, normalize
from mjvideo_tpu.native import native_available, resize_normalize

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("h,w", [(250, 460), (100, 80), (448, 448),
                                 (720, 1280)])
def test_native_resize_normalize_bit_exact_vs_pil(h, w):
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, h, w, 3), dtype=np.uint8)
    got = resize_normalize(frames, 448, IMAGENET_MEAN, IMAGENET_STD)
    assert got.shape == (2, 448, 448, 3)
    for i in range(2):
        resized = np.asarray(
            Image.fromarray(frames[i]).resize((448, 448), Image.BICUBIC)
        )
        want = normalize(resized)
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_native_load_video_path_matches_pil_path(tmp_path):
    """load_video with the native path forced == with it disabled."""
    import os

    import cv2

    from mjvideo_tpu.data.video import load_video

    video = tmp_path / "clip.mp4"
    wtr = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"),
                          8.0, (64, 48))
    rng = np.random.default_rng(1)
    for _ in range(10):
        wtr.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    wtr.release()

    os.environ["MJVIDEO_NATIVE_PREPROCESS"] = "1"
    try:
        native_out, npl_n = load_video(str(video), num_segments=4, max_num=1,
                                       input_size=56)
    finally:
        os.environ["MJVIDEO_NATIVE_PREPROCESS"] = "0"
    try:
        pil_out, npl_p = load_video(str(video), num_segments=4, max_num=1,
                                    input_size=56)
    finally:
        del os.environ["MJVIDEO_NATIVE_PREPROCESS"]
    assert npl_n == npl_p == [1, 1, 1, 1]
    np.testing.assert_allclose(native_out, pil_out, atol=1e-6)

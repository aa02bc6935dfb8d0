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


def test_scorer_device_preprocess_matches_host_path(tmp_path):
    """device_preprocess=True (raw uint8 frames in, resize+normalize fused
    into the scoring jit) must score within the fidelity budget of the
    host-PIL path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.scorer import RewardScorer
    from mjvideo_tpu.models.reward import init_reward_params

    import cv2

    video = tmp_path / "clip.mp4"
    size = 64
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (size, size))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for i in range(8):
        frame = np.full((size, size, 3), (i * 20) % 255, np.uint8)
        frame[:, : size // 2] = rng.integers(0, 255, (size, size // 2, 3),
                                             dtype=np.uint8)
        w.write(frame)
    w.release()

    cfg = tiny_test_config()
    params = init_reward_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    kw = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(1024,),
              gating_pattern=tok.gating_pattern())
    host = RewardScorer(cfg, params, tok, **kw)
    dev = RewardScorer(cfg, params, tok, device_preprocess=True, **kw)

    rh = host.score_video(str(video), "a split screen", num_segments=2)
    rd = dev.score_video(str(video), "a split screen", num_segments=2)
    # PIL's 8-bit two-pass resize vs the float matmul resize differ by
    # ~1/255 per pixel; far inside the 1e-2 score budget.
    np.testing.assert_allclose(rd["score"], rh["score"], atol=1e-2)
    np.testing.assert_allclose(rd["rewards"], rh["rewards"], atol=1e-2)


def test_scorer_device_tiling_matches_host_path(tmp_path):
    """device_preprocess with device_max_num>1 (host picks the dynamic grid,
    device tiles + normalizes — the high-res serving path, BASELINE config
    #4) must score within the fidelity budget of the host-PIL tiling path
    and expand the prompt with the same num_patches_list."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.scorer import RewardScorer
    from mjvideo_tpu.models.reward import init_reward_params

    import cv2

    video = tmp_path / "wide.mp4"
    W, H = 128, 64  # 2:1 -> grid (2, 1) at max_num=2, + thumbnail
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (W, H))
    assert w.isOpened()
    rng = np.random.default_rng(1)
    for i in range(8):
        frame = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        w.write(frame)
    w.release()

    cfg = tiny_test_config()
    params = init_reward_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    kw = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(1024,),
              gating_pattern=tok.gating_pattern())
    host = RewardScorer(cfg, params, tok, **kw)
    dev = RewardScorer(cfg, params, tok, device_preprocess=True,
                       device_max_num=2, **kw)

    # identical prompts (same per-frame patch count incl. thumbnail)
    _, ids_h, g_h = host.prepare_clip(str(video), "a wide clip",
                                      num_segments=2, max_num=2)
    _, ids_d, g_d = dev.prepare_clip(str(video), "a wide clip",
                                     num_segments=2, max_num=2)
    np.testing.assert_array_equal(ids_h, ids_d)
    assert g_h == g_d

    rh = host.score_video(str(video), "a wide clip", num_segments=2,
                          max_num=2)
    rd = dev.score_video(str(video), "a wide clip", num_segments=2,
                         max_num=2)
    np.testing.assert_allclose(rd["score"], rh["score"], atol=1e-2)
    np.testing.assert_allclose(rd["rewards"], rh["rewards"], atol=1e-2)

    # wrong max_num is refused loudly (grid is a scorer-level setting)
    try:
        dev.prepare_clip(str(video), "a wide clip", num_segments=2,
                         max_num=4)
    except ValueError:
        pass
    else:
        raise AssertionError("mismatched max_num must raise")


def test_scorer_micro_batch_split_matches_single_dispatch(tmp_path):
    """device_batch splits big client batches into pipelined dispatches;
    per-clip outputs must be identical to one big dispatch (row-wise
    batch invariance, also verified bit-exact for dp=8 inference)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.scorer import RewardScorer
    from mjvideo_tpu.models.reward import init_reward_params

    cfg = tiny_test_config()
    params = init_reward_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    kw = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(1024,),
              gating_pattern=tok.gating_pattern())
    one = RewardScorer(cfg, params, tok, **kw)
    micro = RewardScorer(cfg, params, tok, device_batch=1, **kw)

    ch = cfg.chat
    B, F = 4, 2
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(B * F, ch.image_size, ch.image_size, 3)
                     ).astype(np.float32)
    n_img = ch.num_image_token * F
    ids_list, gpos = [], []
    for b in range(B):
        ids = rng.integers(10, 120, size=(20 + n_img,))
        ids[3:3 + n_img] = ch.img_context_token_id
        ids_list.append(ids.astype(np.int32))
        gpos.append(len(ids) - 5)
    a = one.score_batch(pix, ids_list, gpos)
    b = micro.score_batch(pix, ids_list, gpos)
    np.testing.assert_allclose(np.asarray(b.score), np.asarray(a.score),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.rewards), np.asarray(a.rewards),
                               rtol=0, atol=1e-5)


def test_micro_batch_split_non_uniform_tiles():
    """Pairs whose videos tile to DIFFERENT counts (host dynamic tiling)
    must split at per-clip tile boundaries, not shape[0] // B."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.scorer import RewardScorer
    from mjvideo_tpu.models.reward import init_reward_params

    cfg = tiny_test_config()
    params = init_reward_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    kw = dict(attn_impl="xla", dtype=jnp.float32, length_buckets=(1024,),
              gating_pattern=tok.gating_pattern())
    one = RewardScorer(cfg, params, tok, **kw)
    micro = RewardScorer(cfg, params, tok, device_batch=1, **kw)

    ch = cfg.chat
    rng = np.random.default_rng(5)
    # clip 0: 2 tiles; clip 1: 3 tiles (e.g. different aspect ratios)
    tiles = [2, 3]
    pix = rng.normal(size=(sum(tiles), ch.image_size, ch.image_size, 3)
                     ).astype(np.float32)
    ids_list, gpos = [], []
    for t in tiles:
        n_img = ch.num_image_token * t
        ids = rng.integers(10, 120, size=(16 + n_img,))
        ids[3:3 + n_img] = ch.img_context_token_id
        ids_list.append(ids.astype(np.int32))
        gpos.append(len(ids) - 5)
    a = one.score_batch(pix, ids_list, gpos)
    b = micro.score_batch(pix, ids_list, gpos)
    np.testing.assert_allclose(np.asarray(b.score), np.asarray(a.score),
                               rtol=0, atol=1e-5)

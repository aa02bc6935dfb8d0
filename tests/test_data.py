"""Data-pipeline parity tests vs torch/PIL/numpy oracles of the reference."""

import numpy as np
import pytest

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.data import (
    ByteTokenizer,
    build_video_question,
    deal_preference,
    expand_image_tokens,
    find_closest_aspect_ratio,
    find_gating_position,
    get_frame_indices,
    get_template,
    normalize,
    prepare_chat_input,
    process_labels,
    select_tile_grid,
    tile_frame,
)
from mjvideo_tpu.data.video import candidate_grids


# ------------------------------------------------------------- frame indices

@pytest.mark.parametrize("n_frames,num_segments", [(100, 8), (9, 8), (8, 8),
                                                   (250, 32), (7, 8)])
def test_get_frame_indices_matches_reference_linspace(n_frames, num_segments):
    # Oracle: data.py:127-137 — linspace(first, max_frame, n, endpoint=False).
    expected = np.linspace(0, n_frames - 1, num_segments, endpoint=False,
                           dtype=int)
    got = get_frame_indices(n_frames, num_segments)
    np.testing.assert_array_equal(got, expected)


def test_get_frame_indices_with_bound():
    expected = np.linspace(int(1.0 * 24), int(3.0 * 24), 8, endpoint=False,
                           dtype=int)
    got = get_frame_indices(500, 8, bound=(1.0, 3.0), fps=24)
    np.testing.assert_array_equal(got, expected)


# ----------------------------------------------------------------- tile grid

def _ref_target_ratios(min_num, max_num):
    ratios = set(
        (i, j) for n in range(min_num, max_num + 1)
        for i in range(1, n + 1) for j in range(1, n + 1)
        if min_num <= i * j <= max_num
    )
    return sorted(ratios, key=lambda x: x[0] * x[1])


@pytest.mark.parametrize("w,h,max_num", [
    (1920, 1080, 12), (448, 448, 12), (100, 800, 12), (800, 100, 12),
    (640, 480, 6), (512, 512, 1), (1024, 768, 12), (333, 777, 12),
])
def test_tile_grid_matches_reference(w, h, max_num):
    ratios = _ref_target_ratios(1, max_num)
    assert candidate_grids(1, max_num) == ratios
    expected = find_closest_aspect_ratio(w / h, ratios, w, h, 448)
    got = select_tile_grid(w, h, 1, max_num, 448)
    assert got == expected  # same function, asserting grid stability


def test_tile_frame_geometry_and_thumbnail():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=(360, 640, 3), dtype=np.uint8)
    tiles = tile_frame(frame, max_num=12, image_size=448, use_thumbnail=True)
    cols, rows = select_tile_grid(640, 360, 1, 12, 448)
    assert tiles.shape == (cols * rows + 1, 448, 448, 3)  # +1 thumbnail
    # max_num=1 path (video reward default): single resized tile, no thumbnail
    tiles1 = tile_frame(frame, max_num=1, image_size=448, use_thumbnail=True)
    assert tiles1.shape == (1, 448, 448, 3)


def test_tile_crops_match_pil_oracle():
    """Tile pixel content == PIL resize + crop boxes of dynamic_preprocess."""
    from PIL import Image

    rng = np.random.default_rng(1)
    frame = rng.integers(0, 255, size=(250, 460, 3), dtype=np.uint8)
    cols, rows = select_tile_grid(460, 250, 1, 12, 448)
    tw, th = 448 * cols, 448 * rows
    resized = Image.fromarray(frame).resize((tw, th), Image.BICUBIC)
    tiles = tile_frame(frame, max_num=12, image_size=448, use_thumbnail=False)
    for i in range(cols * rows):
        box = (
            (i % cols) * 448, (i // cols) * 448,
            (i % cols + 1) * 448, (i // cols + 1) * 448,
        )
        expected = np.asarray(resized.crop(box))
        np.testing.assert_array_equal(tiles[i], expected)


def test_normalize_matches_torchvision_oracle():
    import torch

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(448, 448, 3), dtype=np.uint8)
    # Oracle: ToTensor + Normalize (data.py:56-64).
    t = torch.tensor(img).permute(2, 0, 1).float() / 255.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
    expected = ((t - mean) / std).permute(1, 2, 0).numpy()
    got = normalize(img)
    np.testing.assert_allclose(got, expected, atol=1e-6)


# ------------------------------------------------------------------- labels

def test_process_labels_encoding():
    labels = {"object": 1, "attribute": 2, "actions": 0, "count": 3}
    scores, related, names = process_labels(labels, mse=True)
    assert scores == [1.0, -1.0, 0.0, 0.0]
    assert related == [1, 1, 0, 0]
    assert names == ["object", "attribute", "actions", "count"]
    scores_log, _, _ = process_labels(labels, mse=False)
    assert scores_log == [1.0, 0.0, 0.0, 0.0]
    s, r, _ = process_labels(2, overall=True)
    assert (s, r) == ([-1.0], [1])


def test_deal_preference_encoding():
    prefs, masks = deal_preference(
        {"a": "Video 1 better", "b": "Video 2 better", "c": "Same",
         "d": "Hard to judge"}
    )
    assert prefs == [0, 1, 1, 1]
    assert masks == [1, 1, 0, 0]
    p, m = deal_preference("Same", overall=True)
    assert (p, m) == ([1], [0])


# ------------------------------------------------------------------ prompts

def test_template_rendering_matches_mpt_style():
    t = get_template("Hermes-2")
    t.append_message(t.roles[0], "hello")
    t.append_message(t.roles[1], None)
    prompt = t.get_prompt()
    assert prompt.startswith("<|im_start|>system\n")
    assert prompt.endswith("<|im_end|><|im_start|>assistant\n")
    assert "<|im_start|>user\nhello<|im_end|>" in prompt


def test_expand_image_tokens_counts():
    q = "Frame1: <image>\nFrame2: <image>\ncap"
    out = expand_image_tokens(q, [1, 1], num_image_token=4)
    assert out.count("<IMG_CONTEXT>") == 8
    assert out.count("<img>") == 2 and out.count("</img>") == 2
    assert "<image>" not in out


def test_build_video_question():
    q = build_video_question("a cat", 2)
    assert q == "Frame1: <image>\nFrame2: <image>\na cat"


def test_find_gating_position_last_occurrence():
    pattern = (7, 8, 9)
    ids = [1, 7, 8, 9, 2, 7, 8, 9, 4]
    assert find_gating_position(ids, pattern) == 5
    with pytest.raises(ValueError):
        find_gating_position([1, 2, 3], pattern)


def test_prepare_chat_input_end_to_end():
    cfg = tiny_test_config().chat
    tok = ByteTokenizer()
    question = build_video_question("a cat", 2)
    chat = prepare_chat_input(
        cfg, tok, question, num_patches_list=[1, 1],
        gating_pattern=tok.gating_pattern(),
    )
    ids = chat.input_ids[0]
    n_ctx = int((ids == tok.img_context_token_id).sum())
    assert n_ctx == 2 * cfg.num_image_token
    # gating position points at the final '<|im_end|><|im_start|>assistant\n'
    pat = tok.gating_pattern()
    np.testing.assert_array_equal(
        ids[chat.gating_pos:chat.gating_pos + len(pat)], np.asarray(pat)
    )
    assert chat.attention_mask.shape == chat.input_ids.shape


def test_load_video_shorter_than_segments(tmp_path):
    """A 3-frame video sampled at 8 segments duplicates frames, not crashes."""
    import cv2

    from mjvideo_tpu.data.video import load_video

    path = tmp_path / "short.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    w.release()

    pixels, npl = load_video(str(path), num_segments=8, max_num=1,
                             input_size=56)
    assert pixels.shape == (8, 56, 56, 3)
    assert npl == [1] * 8
    assert np.isfinite(pixels).all()


def test_frame_indices_bound_clamped_to_clip():
    """A bound window extending past the clip (negative start / end past
    the last frame) must clamp — out-of-range indices would silently be
    substituted with the LAST decoded frame downstream."""
    from mjvideo_tpu.data.video import get_frame_indices

    idx = get_frame_indices(30, 8, bound=(-1.0, 100.0), fps=30.0)
    assert idx.min() >= 0 and idx.max() <= 29
    # degenerate window (start after end) collapses, not crosses
    idx = get_frame_indices(30, 4, bound=(5.0, 1.0), fps=30.0)
    assert (idx >= 29).all() or (idx == idx[0]).all()


def test_fetch_remote_video_cache_key_and_atomicity(tmp_path, monkeypatch):
    """Distinct URLs with one basename must not collide in the cache, and
    a failed download must leave NO cache entry (a truncated file would
    be served as complete forever after)."""
    import mjvideo_tpu.data.video as V

    payloads = {
        "http://x/modelA/0001.mp4": b"AAAA",
        "http://x/modelB/0001.mp4": b"BBBB",
        "http://x/modelA/9999.mp4": b"CCCC",
    }

    class _Resp:
        def __init__(self, data, fail=False):
            self.data, self.fail = data, fail

        def raise_for_status(self):
            pass

        def iter_content(self, chunk_size):
            yield self.data[:2]
            if self.fail:
                raise IOError("connection dropped")
            yield self.data[2:]

    class _Requests:
        fail = False

        @staticmethod
        def get(url, stream=True, timeout=60):
            return _Resp(payloads[url], fail=_Requests.fail)

    import sys

    monkeypatch.setitem(sys.modules, "requests", _Requests)
    cache = str(tmp_path / "cache")
    a = V.fetch_remote_video("http://x/modelA/0001.mp4", cache_dir=cache)
    b = V.fetch_remote_video("http://x/modelB/0001.mp4", cache_dir=cache)
    assert a != b
    assert open(a, "rb").read() == b"AAAA"
    assert open(b, "rb").read() == b"BBBB"

    _Requests.fail = True
    import pytest

    with pytest.raises(IOError):
        V.fetch_remote_video("http://x/modelA/9999.mp4", cache_dir=cache)
    import os

    leftovers = [f for f in os.listdir(cache) if "9999" in f]
    assert leftovers == [], leftovers


def test_iter_jsonl_skips_torn_lines(tmp_path):
    import json

    from mjvideo_tpu.eval.preference import IncrementalWriter, iter_jsonl

    path = tmp_path / "res.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"id": 0, "score_0": 1.0}) + "\n")
        f.write('{"id": 1, "score_0"')  # torn final line (crashed writer)
    rows = list(iter_jsonl(str(path)))
    assert [r["id"] for r in rows] == [0]
    w = IncrementalWriter(str(path))
    assert w.seen(0) and not w.seen(1)
    assert w.records[0]["score_0"] == 1.0

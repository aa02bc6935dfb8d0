"""VideoScore/Idefics2 JAX port vs the transformers torch implementation."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mjvideo_tpu.configs import LLMConfig
from mjvideo_tpu.models.videoscore import (
    PerceiverConfig,
    SigLIPVisionConfig,
    VideoScoreConfig,
    connector_forward,
    import_videoscore_params,
    videoscore_forward,
    vision_forward,
)


@pytest.fixture(scope="module")
def torch_model_and_cfg():
    from transformers import Idefics2Config, Idefics2Model, MistralConfig
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2PerceiverConfig,
        Idefics2VisionConfig,
    )

    vision = Idefics2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, patch_size=14, image_size=56, num_channels=3,
    )
    perceiver = Idefics2PerceiverConfig(
        resampler_depth=2, resampler_n_heads=4, resampler_head_dim=8,
        resampler_n_latents=6, num_key_value_heads=2,
    )
    text = MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, pad_token_id=0,
        rope_theta=10000.0, attn_implementation="eager",
    )
    hf_cfg = Idefics2Config(
        vision_config=vision, perceiver_config=perceiver, text_config=text,
        image_token_id=127, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = Idefics2Model(hf_cfg).eval()

    cfg = VideoScoreConfig(
        vision=SigLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, patch_size=14, image_size=56,
        ),
        perceiver=PerceiverConfig(
            depth=2, n_heads=4, head_dim=8, num_key_value_heads=2,
            n_latents=6,
        ),
        text=LLMConfig(
            architecture="llama", vocab_size=128, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-6, pad_token_id=0,
            max_position_embeddings=256,
        ),
        image_token_id=127,
        num_labels=3,
    )
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = import_videoscore_params(state, cfg)
    return model, cfg, params


def test_vision_tower_matches_transformers(torch_model_and_cfg):
    model, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)

    got = np.asarray(vision_forward(params["vision_model"], cfg.vision,
                                    jnp.asarray(pix)))
    with torch.no_grad():
        want = model.vision_model(
            torch.tensor(pix).permute(0, 3, 1, 2)
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_connector_matches_transformers(torch_model_and_cfg):
    model, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(1)
    vis = rng.normal(size=(2, 16, 32)).astype(np.float32)
    got = np.asarray(connector_forward(params["connector"], cfg.perceiver,
                                       jnp.asarray(vis)))
    with torch.no_grad():
        want = model.connector(
            torch.tensor(vis),
            attention_mask=torch.ones(2, 16, dtype=torch.long),
        ).numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_full_videoscore_forward_matches_transformers(torch_model_and_cfg):
    model, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(2)
    B, n_img, n_lat = 2, 1, cfg.perceiver.n_latents
    T = 20
    pix = rng.normal(size=(B, n_img, 3, 56, 56)).astype(np.float32)
    ids = rng.integers(1, 120, size=(B, T))
    ids[:, 2:2 + n_lat] = 127  # image token runs
    ids[0, T - 3:] = 0  # right padding
    mask = (ids != 0).astype(np.int64)

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pix),
        ).last_hidden_state
        # VideoScore head semantics: last non-pad token -> linear score.
        seq_len = (torch.eq(torch.tensor(ids), 0).int().argmax(-1) - 1) % T
        pooled = out[torch.arange(B), seq_len]
        w = torch.tensor(np.asarray(
            np.random.default_rng(3).normal(size=(3, 32)), np.float32))
        want = (pooled @ w.T).numpy()

    params = dict(params)
    params["score"] = {"kernel": jnp.asarray(np.asarray(w.T))}
    pix_nhwc = pix.reshape(B * n_img, 3, 56, 56).transpose(0, 2, 3, 1)
    got = np.asarray(videoscore_forward(
        params, cfg, jnp.asarray(pix_nhwc),
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        attn_impl="xla",
    ))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# C22 back half: prompt construction, processor parity, drivers
# ---------------------------------------------------------------------------


def test_regression_prompt_is_byte_identical_to_reference():
    """The VideoScore prompt IS the benchmark — exact transcription of
    REGRESSION_QUERY_PROMPT (eval_genai_videoScore.py:50-71), including the
    'output_sora' quirk and the trailing space after 'sub-score, '."""
    from mjvideo_tpu.eval.judges import VIDEOSCORE_REGRESSION_QUERY_PROMPT

    lines = [
        "",
        "Suppose you are an expert in judging and evaluating the quality of AI-generated videos,",
        "please watch the following frames of a given video and see the text prompt for generating the video,",
        "then give scores from 5 different dimensions:",
        "(1) visual quality: the quality of the video in terms of clearness, resolution, brightness, and color",
        "(2) temporal consistency, both the consistency of objects or humans and the smoothness of motion or movements",
        "(3) dynamic degree, the degree of dynamic changes",
        "(4) text-to-video alignment, the alignment between the text prompt and the video content",
        "(5) factual consistency, the consistency of the video content with the common-sense and factual knowledge",
        "",
        "for each dimension, output_sora a float number from 1.0 to 4.0,",
        "the higher the number is, the better the video performs in that sub-score, ",
        "the lowest 1.0 means Bad, the highest 4.0 means Perfect/Real (the video is like a real video)",
        "Here is an output_sora example:",
        "visual quality: 3.2",
        "temporal consistency: 2.7",
        "dynamic degree: 4.0",
        "text-to-video alignment: 2.3",
        "factual consistency: 1.8",
        "",
        'For this video, the text prompt is "{text_prompt}",',
        "all the frames of video are as follows:",
        "",
    ]
    assert VIDEOSCORE_REGRESSION_QUERY_PROMPT == "\n".join(lines)


def test_videoscore_prompt_appends_per_frame_image_markers():
    """eval_genai_videoScore.py:103-106: '<image> ' (with trailing space)
    appended once per frame beyond markers already in the prompt."""
    from mjvideo_tpu.eval.judges import videoscore_prompt

    p = videoscore_prompt("a cat", 16)
    assert p.count("<image>") == 16
    assert p.endswith("<image> ")
    assert '"a cat"' in p  # caption lands inside the quoted slot
    assert videoscore_prompt("x", 0).count("<image>") == 0


def test_videoscore_frame_indices_reference_grid():
    """The arange(0, total, total/16) grid (eval_genai_videoScore.py:97-101)
    is NOT linspace; parity requires the exact grid."""
    from mjvideo_tpu.eval.judges import videoscore_frame_indices

    idx = videoscore_frame_indices(120, 16)
    want = np.arange(0, 120, 120 / 16).astype(int)
    np.testing.assert_array_equal(idx, want)
    assert idx[0] == 0 and idx[-1] == 112
    # short clip: every frame
    np.testing.assert_array_equal(videoscore_frame_indices(9, 16),
                                  np.arange(9))
    # exactly max: every frame (the reference condition is strict >)
    np.testing.assert_array_equal(videoscore_frame_indices(16, 16),
                                  np.arange(16))


def test_idefics2_resize_shape_matches_transformers():
    from transformers.models.idefics2.image_processing_idefics2 import (
        get_resize_output_image_size,
    )

    from mjvideo_tpu.eval.judges import idefics2_resize_shape

    size = {"shortest_edge": 378, "longest_edge": 980}
    for h, w in [(256, 256), (100, 80), (1080, 1920), (1920, 1080),
                 (980, 980), (378, 2000), (2000, 378), (500, 700)]:
        want = get_resize_output_image_size(
            np.zeros((h, w, 3), np.uint8), size, input_data_format="channels_last")
        assert idefics2_resize_shape(h, w) == tuple(want), (h, w)


def _word_level_tokenizer(extra_words=()):
    """A tiny programmatic fast tokenizer (no downloads) that the
    Idefics2Processor can wrap — lets us pin our string-level expansion
    token-identical against the installed transformers processor."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    words = ["hello", "world", "a", "cat", "video", "frames", "prompt",
             "the", "is"] + list(extra_words)
    vocab = {"<unk>": 0, "<s>": 1}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    return PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                                   bos_token="<s>")


@pytest.mark.parametrize("do_split", [False, True])
def test_prompt_construction_token_identical_to_idefics2_processor(do_split):
    """Oracle test (VERDICT r3 next-1): our expansion + tokenize must equal
    the transformers Idefics2Processor's input_ids exactly, for both
    image-splitting modes, including the adjacent-fake-token merge rule."""
    from PIL import Image
    from transformers import Idefics2Processor
    from transformers.models.idefics2.image_processing_idefics2 import (
        Idefics2ImageProcessor,
    )

    from mjvideo_tpu.eval.judges import idefics2_expand_image_tokens

    ip = Idefics2ImageProcessor(do_image_splitting=do_split)
    tok = _word_level_tokenizer()
    proc = Idefics2Processor(ip, tok, image_seq_len=3)

    frames = [Image.fromarray(
        np.full((60, 50, 3), 30 * i, np.uint8)) for i in range(2)]
    texts = [
        "hello <image> world",
        "hello world <image> <image> ",   # spaced markers do NOT merge
        "hello<image><image>world",       # adjacent markers DO merge fakes
    ]
    for text in texts:
        n = text.count("<image>")
        want = proc(text=text, images=[frames[:n]],
                    add_special_tokens=True)["input_ids"][0]
        expanded = idefics2_expand_image_tokens(
            text, image_seq_len=3, do_image_splitting=do_split)
        got = tok(expanded, add_special_tokens=True)["input_ids"]
        assert got == list(want), text


@pytest.mark.parametrize("do_split", [False, True])
def test_frame_preprocessing_matches_idefics2_image_processor(do_split):
    """Pixel parity for BOTH splitting modes: crop-then-resize order,
    per-image resize, bottom/right zero pad and the pixel attention mask
    must all match the Idefics2ImageProcessor the reference's
    AutoProcessor dispatches to (the r4 review found the old
    resize-then-crop order fed entirely different crop content)."""
    from transformers.models.idefics2.image_processing_idefics2 import (
        Idefics2ImageProcessor,
    )

    from mjvideo_tpu.eval.judges import VideoScoreJudge

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (60, 50, 3), dtype=np.uint8)
              for _ in range(2)]

    ip = Idefics2ImageProcessor(do_image_splitting=do_split)
    out = ip.preprocess([frames], return_tensors="np")
    want = out["pixel_values"][0].transpose(0, 2, 3, 1)  # (N, H, W, 3)
    want_mask = out["pixel_attention_mask"][0]  # (N, H, W)

    judge = VideoScoreJudge.__new__(VideoScoreJudge)
    judge.do_image_splitting = do_split
    judge.resize_shortest, judge.resize_longest = 378, 980
    got, got_mask = judge.preprocess_frames(frames)
    if got_mask is None:  # uniform shapes -> implicit all-ones mask
        got_mask = np.ones(got.shape[:3], np.int32)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got_mask, want_mask.astype(np.int32))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_masked_videoscore_forward_matches_transformers(torch_model_and_cfg):
    """The variable-aspect path end-to-end vs the torch oracle: padded
    mixed-size images + pixel_attention_mask through masked position-id
    bucketing, masked vision self-attention and the perceiver's masked
    cross-attention must reproduce Idefics2Model exactly."""
    model, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(7)
    # two images padded to a common (56, 56): one full, one 28x42 valid
    pix = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    pix[1, 28:, :] = 0.0
    pix[1, :, 42:] = 0.0
    pmask = np.ones((2, 56, 56), np.int32)
    pmask[1, 28:, :] = 0
    pmask[1, :, 42:] = 0

    B, n_lat, T = 1, cfg.perceiver.n_latents, 24
    ids = rng.integers(1, 120, size=(B, T))
    ids[:, 2:2 + 2 * n_lat] = 127  # two image-token runs
    mask = np.ones_like(ids)

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(
                pix.transpose(0, 3, 1, 2)[None]),  # (1, 2, 3, H, W)
            pixel_attention_mask=torch.tensor(pmask[None]),
        ).last_hidden_state
        pooled = out[:, -1]
        w = torch.tensor(np.asarray(
            np.random.default_rng(8).normal(size=(3, 32)), np.float32))
        want = (pooled @ w.T).numpy()

    params = dict(params)
    params["score"] = {"kernel": jnp.asarray(np.asarray(w.T))}
    got = np.asarray(videoscore_forward(
        params, cfg, jnp.asarray(pix), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), attn_impl="xla",
        pixel_attention_mask=jnp.asarray(pmask),
    ))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class _CharTok:
    """Dependency-free tokenizer for hermetic judge tests: special image
    tokens map to fixed ids, everything else to per-char ids."""

    def __init__(self, image_id=127, fake_id=126):
        self.image_id, self.fake_id = image_id, fake_id

    def __call__(self, text):
        import re

        ids = []
        for part in re.split(r"(<fake_token_around_image>|<image>)", text):
            if part == "<image>":
                ids.append(self.image_id)
            elif part == "<fake_token_around_image>":
                ids.append(self.fake_id)
            else:
                ids.extend((ord(c) % 100) + 2 for c in part
                           if not c.isspace())
        return {"input_ids": ids, "attention_mask": [1] * len(ids)}


def _write_video(path, frames):
    import cv2

    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                         (w, h))
    for f in frames:
        vw.write(f[..., ::-1])  # RGB -> BGR
    vw.release()


def test_videoscore_judge_vision_actually_enters(torch_model_and_cfg,
                                                 tmp_path):
    """Hermetic end-to-end: scores must CHANGE when the frames change —
    proving the vision embeds actually scatter into the text stream
    (the r3 VERDICT's silent text-only-scoring failure mode)."""
    import jax.numpy as jnp

    from mjvideo_tpu.eval.judges import VideoScoreJudge

    _, cfg, params = torch_model_and_cfg
    params = dict(params)
    rng = np.random.default_rng(5)
    params["score"] = {"kernel": jnp.asarray(
        rng.normal(size=(cfg.text.hidden_size, 5)).astype(np.float32))}

    judge = VideoScoreJudge(
        cfg=cfg, params=params, tokenizer=_CharTok(image_id=127),
        num_frames=2, dtype=jnp.float32,
        resize_shortest=56, resize_longest=56,
    )

    flat = [np.full((56, 56, 3), 100, np.uint8) for _ in range(8)]
    noisy = [rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)
             for _ in range(8)]
    _write_video(tmp_path / "flat.mp4", flat)
    _write_video(tmp_path / "noisy.mp4", noisy)

    s_flat = judge.score(str(tmp_path / "flat.mp4"), "a cat")
    s_noisy = judge.score(str(tmp_path / "noisy.mp4"), "a cat")
    assert np.isfinite(s_flat) and np.isfinite(s_noisy)
    assert s_flat != s_noisy  # vision features reached the score head

    # caption changes scores too (text side still live)
    s_flat2 = judge.score(str(tmp_path / "flat.mp4"), "a dog on a hill")
    assert s_flat2 != s_flat


def test_videoscore_judge_guards_against_text_only_scoring(
        torch_model_and_cfg):
    """A tokenizer that drops the <image> special token must raise loudly,
    never silently score text-only (mirrors eval/scorer.py's guard)."""
    import jax.numpy as jnp
    import pytest

    from mjvideo_tpu.eval.judges import VideoScoreJudge

    _, cfg, params = torch_model_and_cfg
    params = dict(params)
    params["score"] = {"kernel": jnp.zeros((cfg.text.hidden_size, 5),
                                           jnp.float32)}

    class NoImageTok(_CharTok):
        def __call__(self, text):
            enc = super().__call__(text)
            enc["input_ids"] = [i if i != self.image_id else 3
                                for i in enc["input_ids"]]
            return enc

    judge = VideoScoreJudge(cfg=cfg, params=params, tokenizer=NoImageTok(),
                            num_frames=2, dtype=jnp.float32)
    pix = np.zeros((2, 56, 56, 3), np.float32)
    ids, mask = judge.tokenize("x <image> <image> ")
    with pytest.raises(ValueError, match="image tokens"):
        judge.score_frames(pix, np.asarray([ids]), np.asarray([mask]))


def test_init_params_match_importer_tree(torch_model_and_cfg):
    """init_videoscore_params must produce the exact pytree the safetensors
    importer produces (same paths, same shapes) so random-init benchmarks
    and hermetic tests exercise the real forward."""
    import jax

    from mjvideo_tpu.models.videoscore import init_videoscore_params

    _, cfg, imported = torch_model_and_cfg
    init = init_videoscore_params(jax.random.PRNGKey(0), cfg, num_labels=3)
    imported = dict(imported)
    imported["score"] = {"kernel": jnp.zeros((cfg.text.hidden_size, 3))}

    want = jax.tree_util.tree_map_with_path(
        lambda p, x: (jax.tree_util.keystr(p), x.shape), imported)
    got = jax.tree_util.tree_map_with_path(
        lambda p, x: (jax.tree_util.keystr(p), x.shape), init)
    want = sorted(jax.tree_util.tree_leaves(want, is_leaf=lambda x:
                                            isinstance(x, tuple)))
    got = sorted(jax.tree_util.tree_leaves(got, is_leaf=lambda x:
                                           isinstance(x, tuple)))
    assert got == want

    # and the forward runs on it
    ids = np.full((1, cfg.perceiver.n_latents + 4), 5)
    ids[:, 2:2 + cfg.perceiver.n_latents] = 127
    out = videoscore_forward(
        init, cfg, jnp.asarray(np.zeros((1, 56, 56, 3), np.float32)),
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(np.ones_like(ids), jnp.int32), attn_impl="xla")
    assert np.isfinite(np.asarray(out)).all()


def test_non_patch_multiple_images_match_torch_conv_floor(
        torch_model_and_cfg):
    """Idefics2 resize outputs are NOT patch multiples in general
    (1920x1080 -> 551x980).  torch Conv2d(kernel=stride=P) silently drops
    the trailing remainder rows/cols; the reshape patchify must crop
    identically — found crashing by an end-to-end drive, both with and
    without a pixel mask."""
    model, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(11)
    pix = rng.normal(size=(2, 60, 56, 3)).astype(np.float32)  # 60 % 14 != 0

    got = np.asarray(vision_forward(params["vision_model"], cfg.vision,
                                    jnp.asarray(pix)))
    with torch.no_grad():
        want = model.vision_model(
            torch.tensor(pix).permute(0, 3, 1, 2)
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)

    # masked path: same crop on the pixel mask
    pmask = np.ones((2, 60, 56), np.int32)
    pmask[1, 30:, :] = 0
    got_m = np.asarray(vision_forward(
        params["vision_model"], cfg.vision, jnp.asarray(pix),
        patch_attention_mask=None))
    assert got_m.shape == want.shape
    params2 = dict(params)
    params2["score"] = {"kernel": jnp.zeros((cfg.text.hidden_size, 3),
                                            jnp.float32)}
    ids = np.full((1, 2 * cfg.perceiver.n_latents + 4), 5)
    ids[:, 2:2 + 2 * cfg.perceiver.n_latents] = 127
    out = videoscore_forward(
        params2, cfg, jnp.asarray(pix), jnp.asarray(ids, jnp.int32),
        jnp.asarray(np.ones_like(ids), jnp.int32), attn_impl="xla",
        pixel_attention_mask=jnp.asarray(pmask))
    assert np.isfinite(np.asarray(out)).all()


def test_score_frames_bucketing_is_invisible(torch_model_and_cfg):
    """score_frames right-pads ids/mask to a bucket so caption lengths
    share compiled executables (the r4 review found one XLA compile per
    distinct prompt length) — padding must not change the scores, because
    pooling picks the last NON-pad token and the decoder masks pads."""
    import jax.numpy as jnp

    from mjvideo_tpu.eval.judges import VideoScoreJudge

    _, cfg, params = torch_model_and_cfg
    params = dict(params)
    rng = np.random.default_rng(9)
    params["score"] = {"kernel": jnp.asarray(
        rng.normal(size=(cfg.text.hidden_size, 5)).astype(np.float32))}
    judge = VideoScoreJudge(cfg=cfg, params=params, tokenizer=_CharTok(),
                            num_frames=1, dtype=jnp.float32)
    judge.buckets = (64,)

    pix = rng.normal(size=(1, 56, 56, 3)).astype(np.float32)
    ids, mask = judge.tokenize("ab <image> cd")
    assert len(ids) < 64  # really exercises the pad branch
    got = judge.score_frames(pix, np.asarray([ids]), np.asarray([mask]))
    want = np.asarray(videoscore_forward(
        params, cfg, jnp.asarray(pix),
        jnp.asarray([ids], jnp.int32), jnp.asarray([mask], jnp.int32),
        attn_impl="xla",
    ), np.float32)[0]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


class _StubScoreJudge:
    """score() by filename, counting calls — for driver tests."""

    def __init__(self):
        self.calls = []

    def score(self, video_path, caption):
        self.calls.append(video_path)
        return 3.0 if "good" in video_path else 1.0


def test_overall_videoscore_benchmark_driver(tmp_path):
    """Reference eval_overall_videoscore.py semantics: undecided pairs are
    never scored; accuracy over summed-score comparison; resumable."""
    from mjvideo_tpu.eval.judges import run_overall_videoscore_benchmark

    records = [
        {"video_0_path": "good_a.mp4", "video_1_path": "bad_b.mp4",
         "caption": "c", "overall_preference": "Video 1 better"},
        {"video_0_path": "same_a.mp4", "video_1_path": "same_b.mp4",
         "caption": "c", "overall_preference": "Same"},
        {"video_0_path": "bad_a.mp4", "video_1_path": "good_b.mp4",
         "caption": "c", "overall_preference": "Video 2 better"},
    ]
    j = _StubScoreJudge()
    res = run_overall_videoscore_benchmark(
        j, records, results_path=str(tmp_path / "vs.jsonl"))
    assert res["count"] == 2 and res["correct"] == 2
    # the 'Same' pair was skipped BEFORE scoring (reference :129-131)
    assert not any("same" in p for p in j.calls)
    # resume scores nothing new and reproduces the metrics
    j2 = _StubScoreJudge()
    res2 = run_overall_videoscore_benchmark(
        j2, records, results_path=str(tmp_path / "vs.jsonl"))
    assert res2 == res and j2.calls == []


def test_genai_videoscore_benchmark_driver(tmp_path):
    """Reference eval_genai_videoScore.py vote semantics: good threshold 2
    (not the RATING judges' 5), strict comparison, no tie credit."""
    from mjvideo_tpu.eval.judges import run_genai_videoscore_benchmark
    from mjvideo_tpu.eval.metrics import genai_videoscore_metrics

    examples = [
        {"left_video": "good_l.mp4", "right_video": "bad_r.mp4",
         "prompt": "p", "vote_type": "leftvote"},
        {"left_video": "bad_l.mp4", "right_video": "good_r.mp4",
         "prompt": "p", "vote_type": "rightvote"},
        {"left_video": "bad_l.mp4", "right_video": "bad_r.mp4",
         "prompt": "p", "vote_type": "bothbad_vote"},
        {"left_video": "good_l.mp4", "right_video": "good_r.mp4",
         "prompt": "p", "vote_type": "tievote"},
    ]
    res = run_genai_videoscore_benchmark(
        _StubScoreJudge(), examples, results_path=str(tmp_path / "g.jsonl"))
    assert res["prefer_accuracy"] == 1.0
    assert res["accuracy"] == 1.0
    assert res["total"] == 4 and res["prefer_total"] == 2

    # threshold is 2: a 2.0/2.0 tievote pair is NOT 'both good'
    m = genai_videoscore_metrics(np.asarray([2.0]), np.asarray([2.0]),
                                 ["tievote"])
    assert m["accuracy"] == 0.0


def test_cli_exposes_videoscore_judge():
    from mjvideo_tpu.eval.cli import build_parser

    choices = next(a for a in build_parser()._actions
                   if a.dest == "judge").choices
    assert "videoscore" in choices

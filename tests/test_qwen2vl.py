"""Qwen2-VL JAX port vs the transformers torch implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mjvideo_tpu.configs import LLMConfig
from mjvideo_tpu.models.qwen2vl import (
    Qwen2VLConfig,
    Qwen2VLVisionConfig,
    build_video_prompt_ids,
    get_rope_index,
    greedy_generate,
    import_qwen2vl_params,
    lm_logits,
    mrope_cos_sin,
    preprocess_video_frames,
    qwen2vl_forward,
    smart_resize,
    vision_forward,
)

# Tiny dims: head_dim 16 -> mrope sections (2, 3, 3) sum to head_dim/2.
VOCAB = 256
IDS = dict(image_token_id=250, video_token_id=251,
           vision_start_token_id=248, vision_end_token_id=249)


@pytest.fixture(scope="module")
def torch_model_and_cfg():
    from transformers import Qwen2VLConfig as HFConfig
    from transformers import Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig as HFVision,
    )

    vision = HFVision(
        depth=2, embed_dim=32, num_heads=4, mlp_ratio=2, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2, in_channels=3,
        hidden_size=48,
    )
    hf_cfg = HFConfig(
        vision_config=vision.to_dict(), vocab_size=VOCAB, hidden_size=48,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=3,
        num_key_value_heads=1, rope_theta=10000.0, rms_norm_eps=1e-6,
        max_position_embeddings=512, tie_word_embeddings=True,
        attn_implementation="eager",
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        **IDS,
    )
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(hf_cfg).eval()

    cfg = Qwen2VLConfig(
        vision=Qwen2VLVisionConfig(
            depth=2, embed_dim=32, num_heads=4, mlp_ratio=2, patch_size=4,
            temporal_patch_size=2, spatial_merge_size=2, hidden_size=48,
        ),
        text=LLMConfig(
            architecture="llama", vocab_size=VOCAB, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=3, num_key_value_heads=1,
            rope_theta=10000.0, rms_norm_eps=1e-6, pad_token_id=0,
            max_position_embeddings=512, bias=True,
        ),
        mrope_section=(2, 3, 3), tie_word_embeddings=True, **IDS,
    )
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = import_qwen2vl_params(state, cfg)
    return model, cfg, params


GRID = (3, 8, 8)  # t, h, w patches (24x24 px at patch 4; 48 merged tokens)


def _patches(rng, cfg):
    n = GRID[0] * GRID[1] * GRID[2]
    return rng.normal(size=(n, cfg.vision.patch_dim)).astype(np.float32)


def test_vision_tower_matches_transformers(torch_model_and_cfg):
    model, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(0)
    pix = _patches(rng, cfg)
    got = np.asarray(vision_forward(
        params["visual"], cfg.vision, jnp.asarray(pix), GRID,
        attn_impl="xla", remat=False,
    ))
    with torch.no_grad():
        want = model.model.visual(
            torch.tensor(pix), grid_thw=torch.tensor([list(GRID)])
        ).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_get_rope_index_matches_transformers(torch_model_and_cfg):
    model, cfg, params = torch_model_and_cfg
    m2 = cfg.vision.spatial_merge_size**2
    n_video = GRID[0] * GRID[1] * GRID[2] // m2
    ids = ([5, 6, cfg.vision_start_token_id]
           + [cfg.video_token_id] * n_video
           + [cfg.vision_end_token_id, 7, 8, 9])
    ids = np.asarray([ids], np.int64)

    pos, deltas = get_rope_index(ids, [GRID], cfg)
    want_pos, want_d = model.model.get_rope_index(
        torch.tensor(ids), video_grid_thw=torch.tensor([list(GRID)])
    )
    np.testing.assert_array_equal(pos, want_pos.numpy())
    np.testing.assert_array_equal(deltas, want_d.numpy())


def test_full_forward_logits_match_transformers(torch_model_and_cfg):
    model, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(1)
    pix = _patches(rng, cfg)
    m2 = cfg.vision.spatial_merge_size**2
    n_video = GRID[0] * GRID[1] * GRID[2] // m2
    ids = ([5, 6, cfg.vision_start_token_id]
           + [cfg.video_token_id] * n_video
           + [cfg.vision_end_token_id] + [7, 8, 9, 10])
    ids = np.asarray([ids], np.int64)
    pos, _ = get_rope_index(ids, [GRID], cfg)

    hidden = qwen2vl_forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.ones_like(
            jnp.asarray(ids, jnp.int32)), jnp.asarray(pos),
        pixel_patches=jnp.asarray(pix), grid=GRID,
        attn_impl="xla", remat=False,
    )
    got = np.asarray(lm_logits(params, cfg, hidden))

    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids),
            pixel_values_videos=torch.tensor(pix),
            video_grid_thw=torch.tensor([list(GRID)]),
        ).logits.numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_text_only_forward_matches(torch_model_and_cfg):
    model, cfg, params = torch_model_and_cfg
    ids = np.asarray([[3, 5, 7, 11, 13, 17, 19]], np.int64)
    pos, _ = get_rope_index(ids, None, cfg)
    hidden = qwen2vl_forward(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.ones((1, ids.shape[1]), jnp.int32), jnp.asarray(pos),
        attn_impl="xla", remat=False,
    )
    got = np.asarray(lm_logits(params, cfg, hidden))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_greedy_generate_matches_hf_generate(torch_model_and_cfg):
    model, cfg, params = torch_model_and_cfg
    rng = np.random.default_rng(2)
    pix = _patches(rng, cfg)
    m2 = cfg.vision.spatial_merge_size**2
    n_video = GRID[0] * GRID[1] * GRID[2] // m2
    ids = ([5, 6, cfg.vision_start_token_id]
           + [cfg.video_token_id] * n_video
           + [cfg.vision_end_token_id] + [7, 8, 9])
    ids = np.asarray([ids], np.int64)
    pos, _ = get_rope_index(ids, [GRID], cfg)

    got = greedy_generate(
        params, cfg, ids.astype(np.int32), pos,
        pixel_patches=pix, grid=GRID, max_new_tokens=4,
        eos_token_id=-1, attn_impl="xla",
    )
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor(ids),
            pixel_values_videos=torch.tensor(pix),
            video_grid_thw=torch.tensor([list(GRID)]),
            max_new_tokens=4, do_sample=False,
        )
    want = out[0, ids.shape[1]:].tolist()
    assert got == want


def test_mrope_cos_sin_sections(torch_model_and_cfg):
    """Text-only positions (all 3 channels equal) must reduce to standard
    1D RoPE tables."""
    _, cfg, _ = torch_model_and_cfg
    from mjvideo_tpu.ops.rope import rope_tables

    T = 11
    pos = np.broadcast_to(np.arange(T), (3, 1, T))
    cos, sin = mrope_cos_sin(jnp.asarray(pos), cfg)
    ref_cos, ref_sin = rope_tables(T, cfg.text.head_dim,
                                   base=cfg.text.rope_theta)
    np.testing.assert_allclose(np.asarray(cos[0]), np.asarray(ref_cos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[0]), np.asarray(ref_sin),
                               atol=1e-6)


def test_smart_resize_and_preprocess_match_hf():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize,
    )

    for h, w in [(360, 640), (1080, 1920), (100, 100), (56, 700)]:
        assert smart_resize(h, w) == hf_smart_resize(h, w)

    # preprocess parity vs the HF image processor on real frames
    from transformers import Qwen2VLImageProcessor

    cfg = Qwen2VLVisionConfig(patch_size=14, temporal_patch_size=2,
                              spatial_merge_size=2)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
              for _ in range(4)]
    got, grid = preprocess_video_frames(frames, cfg, max_pixels=360 * 420)

    proc = Qwen2VLImageProcessor(max_pixels=360 * 420)
    out = proc(images=None, videos=[frames], return_tensors="np")
    np.testing.assert_array_equal(np.asarray(grid),
                                  out["video_grid_thw"][0])
    np.testing.assert_allclose(got, out["pixel_values_videos"], atol=2e-2)


def test_build_video_prompt_ids():
    from mjvideo_tpu.data.prompts import ByteTokenizer

    cfg = Qwen2VLConfig(vision=Qwen2VLVisionConfig(
        depth=2, embed_dim=32, num_heads=4, patch_size=4, hidden_size=48))
    ids = build_video_prompt_ids(ByteTokenizer(), cfg, (2, 4, 4), "hi")
    n_video = 2 * 4 * 4 // 4
    assert (ids == cfg.video_token_id).sum() == n_video
    flat = ids[0].tolist()
    vs = flat.index(cfg.vision_start_token_id)
    assert flat[vs + 1:vs + 1 + n_video] == [cfg.video_token_id] * n_video
    assert flat[vs + 1 + n_video] == cfg.vision_end_token_id


def test_qwen2vl_judge_scores_video_end_to_end(torch_model_and_cfg, tmp_path):
    """VERDICT round-2 item 6 'done' condition: a Qwen2VLJudge scoring a
    sample video end-to-end (decode -> smart resize -> patches -> M-RoPE ->
    greedy generate -> rating parse)."""
    import cv2

    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.judges import Qwen2VLJudge, judge_pair

    _, cfg, params = torch_model_and_cfg

    video = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (64, 48))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(10):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    judge = Qwen2VLJudge(cfg, params, ByteTokenizer(), num_segments=4,
                         max_new_tokens=3, max_pixels=56 * 56,
                         attn_impl="xla")
    resp = judge.ask("Rate this video.", str(video))
    assert isinstance(resp, str)

    s0, s1, _, _ = judge_pair(judge, str(video), str(video), "a test clip")
    assert 0 <= s0 <= 10 and s0 == s1  # same video -> same greedy rating


def test_untied_lm_head_matches_transformers():
    """Qwen2-VL-7B unties the LM head (tie_word_embeddings=False) — the
    importer must pick up lm_head.weight and lm_logits must use it."""
    from transformers import Qwen2VLConfig as HFConfig
    from transformers import Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig as HFVision,
    )

    vision = HFVision(depth=1, embed_dim=32, num_heads=4, mlp_ratio=2,
                      patch_size=4, temporal_patch_size=2,
                      spatial_merge_size=2, in_channels=3, hidden_size=48)
    hf_cfg = HFConfig(
        vision_config=vision.to_dict(), vocab_size=VOCAB, hidden_size=48,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=3,
        num_key_value_heads=1, rope_theta=10000.0, rms_norm_eps=1e-6,
        max_position_embeddings=512, tie_word_embeddings=False,
        attn_implementation="eager",
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        **IDS,
    )
    torch.manual_seed(1)
    model = Qwen2VLForConditionalGeneration(hf_cfg).eval()

    cfg = Qwen2VLConfig(
        vision=Qwen2VLVisionConfig(
            depth=1, embed_dim=32, num_heads=4, mlp_ratio=2, patch_size=4,
            temporal_patch_size=2, spatial_merge_size=2, hidden_size=48),
        text=LLMConfig(
            architecture="llama", vocab_size=VOCAB, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=3, num_key_value_heads=1,
            rope_theta=10000.0, rms_norm_eps=1e-6, pad_token_id=0,
            max_position_embeddings=512, bias=True),
        mrope_section=(2, 3, 3), tie_word_embeddings=False, **IDS,
    )
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = import_qwen2vl_params(state, cfg)

    ids = np.asarray([[3, 5, 7, 11, 13]], np.int64)
    pos, _ = get_rope_index(ids, None, cfg)
    hidden = qwen2vl_forward(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.ones((1, 5), jnp.int32), jnp.asarray(pos),
        attn_impl="xla", remat=False,
    )
    got = np.asarray(lm_logits(params, cfg, hidden))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)

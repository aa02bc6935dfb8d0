"""Batched (B>=2) judge generation must reproduce per-row B=1 decodes.

``judge_pair`` rates both videos of a preference pair in ONE batched
generation (``eval/judges.py``); these tests pin the batched decode paths
of every local judge family to their single-row equivalents, including
rows of different prompt lengths (per-row ``n_real``) and precomputed
``vision_embeds``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.configs import LLMConfig


# --------------------------------------------------------------- qwen2vl

@pytest.fixture(scope="module")
def qwen_tiny():
    from mjvideo_tpu.models.qwen2vl import (
        Qwen2VLConfig,
        Qwen2VLVisionConfig,
        init_qwen2vl_params,
    )

    cfg = Qwen2VLConfig(
        vision=Qwen2VLVisionConfig(
            depth=2, embed_dim=32, num_heads=4, mlp_ratio=2, patch_size=4,
            temporal_patch_size=2, spatial_merge_size=2, hidden_size=48,
        ),
        text=LLMConfig(
            architecture="llama", vocab_size=160, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=3, num_key_value_heads=1,
            rope_theta=10000.0, rms_norm_eps=1e-6, pad_token_id=0,
            max_position_embeddings=512, bias=True,
        ),
        mrope_section=(2, 3, 3), tie_word_embeddings=True,
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
        im_end_token_id=151645,
    )
    params = init_qwen2vl_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _qwen_item(cfg, rng, grid, extra_text):
    from mjvideo_tpu.models.qwen2vl import get_rope_index

    n = grid[0] * grid[1] * grid[2]
    patches = rng.normal(size=(n, cfg.vision.patch_dim)).astype(np.float32)
    n_video = n // cfg.vision.spatial_merge_size**2
    ids = ([5, 6, cfg.vision_start_token_id]
           + [cfg.video_token_id] * n_video
           + [cfg.vision_end_token_id] + list(extra_text))
    ids = np.asarray([ids], np.int64)
    pos, _ = get_rope_index(ids, [grid], cfg)
    return ids.astype(np.int32), pos, patches, grid


def test_qwen2vl_batched_matches_single(qwen_tiny):
    from mjvideo_tpu.models.qwen2vl import (
        greedy_generate,
        greedy_generate_batch,
    )

    cfg, params = qwen_tiny
    rng = np.random.default_rng(0)
    # Different videos AND different prompt lengths (per-row n_real), and
    # even different grids (the flat scatter consumes embeds in row order).
    items = [
        _qwen_item(cfg, rng, (2, 4, 4), [7, 8, 9]),
        _qwen_item(cfg, rng, (2, 4, 4), [9, 8, 7, 6, 5]),
        _qwen_item(cfg, rng, (2, 8, 4), [7, 8]),
    ]
    singles = [
        greedy_generate(params, cfg, ids, pos, pixel_patches=pp, grid=g,
                        max_new_tokens=4, eos_token_id=-1, attn_impl="xla")
        for ids, pos, pp, g in items
    ]
    batched = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                    eos_token_id=-1, attn_impl="xla")
    assert batched == singles


def test_qwen2vl_vision_embeds_reuse_matches(qwen_tiny):
    from mjvideo_tpu.models.qwen2vl import (
        _jit_vision,
        greedy_generate_batch,
    )

    cfg, params = qwen_tiny
    rng = np.random.default_rng(1)
    items = [_qwen_item(cfg, rng, (2, 4, 4), [7, 8, 9]),
             _qwen_item(cfg, rng, (2, 4, 4), [9, 8, 7])]
    direct = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                   eos_token_id=-1, attn_impl="xla")
    vises = [_jit_vision(params["visual"], cfg.vision, jnp.asarray(pp), g,
                         attn_impl="xla") for _, _, pp, g in items]
    via_cache = greedy_generate_batch(
        params, cfg, [(ids, pos, None, None) for ids, pos, _, _ in items],
        max_new_tokens=4, eos_token_id=-1, attn_impl="xla",
        vision_embeds=vises)
    assert via_cache == direct


# --------------------------------------------------------------- minicpmv

@pytest.fixture(scope="module")
def minicpm_tiny():
    from mjvideo_tpu.models.minicpmv import (
        MiniCPMVConfig,
        ResamplerConfig,
        SigLIPVisionConfig,
        init_minicpmv_params,
    )

    cfg = MiniCPMVConfig(
        vision=SigLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, patch_size=14, image_size=56,
        ),
        resampler=ResamplerConfig(num_queries=6, embed_dim=32, num_heads=4,
                                  kv_dim=32),
        text=LLMConfig(
            architecture="llama", vocab_size=128, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=1e4, rms_norm_eps=1e-6, pad_token_id=0,
            max_position_embeddings=256, bias=True,
        ),
        im_start_token_id=101, im_end_token_id=102, unk_token_id=100,
        image_start_token_id=103, image_end_token_id=104,
    )
    params = init_minicpmv_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _minicpm_item(cfg, rng, n_frames, extra_text):
    Q = cfg.resampler.num_queries
    pix = rng.normal(
        size=(n_frames, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = [9]
    for _ in range(n_frames):
        ids += [cfg.image_start_token_id] + [cfg.unk_token_id] * Q \
            + [cfg.image_end_token_id]
    ids += list(extra_text)
    return np.asarray([ids], np.int32), pix


def test_minicpmv_batched_matches_single(minicpm_tiny):
    from mjvideo_tpu.models.minicpmv import (
        greedy_generate,
        greedy_generate_batch,
    )

    cfg, params = minicpm_tiny
    rng = np.random.default_rng(0)
    items = [_minicpm_item(cfg, rng, 2, [7, 8, 9]),
             _minicpm_item(cfg, rng, 2, [9, 8])]
    singles = [
        greedy_generate(params, cfg, ids, pixel_values=pix,
                        max_new_tokens=4, eos_token_id=-1)
        for ids, pix in items
    ]
    batched = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                    eos_token_id=-1)
    assert batched == singles


# --------------------------------------------------------------- cogvlm2

@pytest.fixture(scope="module")
def cog_tiny():
    from mjvideo_tpu.models.cogvlm2 import (
        CogVLM2Config,
        CogVLM2VisionConfig,
        init_cogvlm2_params,
    )

    cfg = CogVLM2Config(
        vision=CogVLM2VisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_heads=4, patch_size=14, image_size=28,
        ),
        text=LLMConfig(
            architecture="llama", vocab_size=128, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=1e4, rms_norm_eps=1e-5, pad_token_id=0,
            max_position_embeddings=256,
        ),
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    params = init_cogvlm2_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _cog_item(cfg, rng, n_frames, extra_text):
    from mjvideo_tpu.models.cogvlm2 import (
        LANGUAGE_TOKEN_TYPE,
        VISION_TOKEN_TYPE,
    )

    size = cfg.vision.image_size
    pix = rng.normal(size=(n_frames, size, size, 3)).astype(np.float32)
    n_vis = n_frames * cfg.vision.tokens_per_frame
    ids = [cfg.bos_token_id] + [cfg.pad_token_id] * n_vis + list(extra_text)
    tt = [LANGUAGE_TOKEN_TYPE] + [VISION_TOKEN_TYPE] * n_vis \
        + [LANGUAGE_TOKEN_TYPE] * len(extra_text)
    return (np.asarray([ids], np.int32), np.asarray([tt], np.int32), pix)


def test_cogvlm2_batched_matches_single(cog_tiny):
    from mjvideo_tpu.models.cogvlm2 import (
        greedy_generate,
        greedy_generate_batch,
    )

    cfg, params = cog_tiny
    rng = np.random.default_rng(0)
    items = [_cog_item(cfg, rng, 2, [7, 8, 9]),
             _cog_item(cfg, rng, 2, [9, 8, 7, 6])]
    singles = [
        greedy_generate(params, cfg, ids, tt, pixel_values=pix,
                        max_new_tokens=4, eos_token_id=-1)
        for ids, tt, pix in items
    ]
    batched = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                    eos_token_id=-1)
    assert batched == singles


# --------------------------------------------------------------- internvl

def test_internvl_vision_embeds_matches_pixel_path():
    """``generate(vision_embeds=...)`` must reproduce the pixel path, and
    a B=2 batch of two videos must match the two B=1 generations."""
    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.models.generate import GenerationConfig, generate
    from mjvideo_tpu.models.internvl import (
        extract_feature_jitted,
        init_chat_params,
    )

    cfg = tiny_test_config().chat
    params = init_chat_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    P, S = 2, cfg.num_image_token * 2
    gc = GenerationConfig(max_new_tokens=3, eos_token_id=-1,
                          pad_token_id=0, temperature=0.0)

    def mk():
        pix = jnp.asarray(rng.normal(
            size=(P, cfg.image_size, cfg.image_size, 3)), jnp.float32)
        ids = np.full((1, S + 6), 11, np.int32)
        ids[0, 3:3 + S] = cfg.img_context_token_id
        return pix, jnp.asarray(ids), jnp.ones((1, S + 6), jnp.int32)

    videos = [mk(), mk()]
    singles = [
        np.asarray(generate(params, cfg, ids, mask, pixel_values=pix,
                            generation_config=gc, attn_impl="xla"))
        for pix, ids, mask in videos
    ]
    # Precomputed-embeds path, single row.
    vises = [extract_feature_jitted(params, cfg, pix, attn_impl="xla",
                                    remat=False)
             for pix, _, _ in videos]
    for (pix, ids, mask), vis, want in zip(videos, vises, singles):
        got = np.asarray(generate(params, cfg, ids, mask,
                                  generation_config=gc, attn_impl="xla",
                                  vision_embeds=vis))
        np.testing.assert_array_equal(got, want)
    # Batched rows with concatenated embeds.
    ids2 = jnp.concatenate([v[1] for v in videos])
    mask2 = jnp.concatenate([v[2] for v in videos])
    got2 = np.asarray(generate(params, cfg, ids2, mask2,
                               generation_config=gc, attn_impl="xla",
                               vision_embeds=jnp.concatenate(vises)))
    np.testing.assert_array_equal(got2, np.concatenate(singles))


# --------------------------------------------------------------- judge_pair

def test_judge_pair_uses_ask_batch():
    from mjvideo_tpu.eval.judges import judge_pair

    calls = []

    class FakeJudge:
        def ask(self, prompt, path):
            raise AssertionError("ask_batch must be preferred")

        def ask_batch(self, prompt, paths):
            calls.append((prompt, tuple(paths)))
            return ["Average", "Good"]

    s0, s1, r0, r1 = judge_pair(FakeJudge(), "v0.mp4", "v1.mp4", "a cat")
    assert (s0, s1) == (5, 7) and (r0, r1) == ("Average", "Good")
    assert calls and calls[0][1] == ("v0.mp4", "v1.mp4")

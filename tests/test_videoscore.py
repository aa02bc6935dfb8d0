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

"""MiniCPM-V-2.6 JAX port vs independent torch oracles.

The published MiniCPM-V code is trust_remote_code (not in transformers), so
the oracle here is assembled from independent torch implementations of the
published architecture (resampler.py / modeling_navit_siglip.py in
openbmb/MiniCPM-V-2_6):

* vision tower — transformers' ``Idefics2VisionTransformer`` (the NaViT
  SigLIP the published repo adapts is this same so400m architecture,
  including the bucketized position ids);
* resampler — a torch module built from ``nn.MultiheadAttention`` +
  ``nn.LayerNorm`` following the published forward exactly;
* text model — transformers' ``Qwen2ForCausalLM``.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from mjvideo_tpu.configs import LLMConfig
from mjvideo_tpu.models.minicpmv import (
    MiniCPMVConfig,
    ResamplerConfig,
    build_video_prompt_ids,
    find_best_resize,
    get_2d_sincos_pos_embed,
    get_vision_embedding,
    greedy_generate,
    import_minicpmv_params,
    lm_logits,
    minicpmv_forward,
    preprocess_video_frames,
    resampler_forward,
)
from mjvideo_tpu.models.videoscore import SigLIPVisionConfig

UNK = 120
IMG_S, IMG_E = 118, 119
IM_START, IM_END = 116, 117


def torch_sincos(embed_dim, grid_hw):
    """The published get_2d_sincos_pos_embed (MAE convention), re-derived
    independently in torch for the oracle."""
    gh, gw = grid_hw
    grid = np.stack(np.meshgrid(np.arange(gw, dtype=np.float32),
                                np.arange(gh, dtype=np.float32)), 0)

    def one(dim, pos):
        omega = 1.0 / 10000.0 ** (np.arange(dim // 2, dtype=np.float32)
                                  / (dim / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], 1)

    return torch.from_numpy(np.concatenate(
        [one(embed_dim // 2, grid[0]), one(embed_dim // 2, grid[1])], 1
    )).float()


class TorchResampler(nn.Module):
    """The published MiniCPM-V-2.6 resampler forward (resampler.py):
    kv_proj -> ln_kv, ln_q(query), keys get the 2D sin-cos table, one
    nn.MultiheadAttention, ln_post, final learned proj matrix."""

    def __init__(self, num_queries, embed_dim, num_heads, kv_dim):
        super().__init__()
        self.query = nn.Parameter(torch.randn(num_queries, embed_dim) * 0.1)
        self.kv_proj = nn.Linear(kv_dim, embed_dim, bias=False)
        self.ln_q = nn.LayerNorm(embed_dim)
        self.ln_kv = nn.LayerNorm(embed_dim)
        self.ln_post = nn.LayerNorm(embed_dim)
        self.attn = nn.MultiheadAttention(embed_dim, num_heads)
        self.proj = nn.Parameter(torch.randn(embed_dim, embed_dim) * 0.1)

    def forward(self, x, tgt_size):
        pos = torch_sincos(self.query.shape[1], tgt_size)  # (S, D)
        x = self.kv_proj(x)  # (B, S, D)
        x = self.ln_kv(x).permute(1, 0, 2)  # (S, B, D)
        q = self.ln_q(self.query)  # (Q, D)
        bs = x.shape[1]
        q = q.unsqueeze(1).repeat(1, bs, 1)  # (Q, B, D)
        out = self.attn(q, x + pos.unsqueeze(1), x)[0]  # (Q, B, D)
        x = self.ln_post(out.permute(1, 0, 2))
        return x @ self.proj


@pytest.fixture(scope="module")
def tiny():
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2VisionConfig,
    )
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2VisionTransformer,
    )

    torch.manual_seed(0)
    vision_t = Idefics2VisionTransformer(Idefics2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, patch_size=14, image_size=56, num_channels=3,
        attn_implementation="eager",
    )).eval()
    resampler_t = TorchResampler(num_queries=6, embed_dim=32, num_heads=4,
                                 kv_dim=32).eval()
    qwen_t = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=1e4,
        tie_word_embeddings=False, attn_implementation="eager",
        pad_token_id=0,
    )).eval()

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
        im_start_token_id=IM_START, im_end_token_id=IM_END,
        image_start_token_id=IMG_S, image_end_token_id=IMG_E,
        unk_token_id=UNK,
    )

    state = {}
    for k, v in vision_t.state_dict().items():
        state["vpm." + k] = v.numpy()
    for k, v in resampler_t.state_dict().items():
        state["resampler." + k] = v.numpy()
    for k, v in qwen_t.state_dict().items():
        state["llm." + k] = v.numpy()
    params = import_minicpmv_params(state, cfg)
    return vision_t, resampler_t, qwen_t, cfg, params


def test_sincos_table_matches_oracle():
    ours = get_2d_sincos_pos_embed(32, (3, 5))
    oracle = torch_sincos(32, (3, 5)).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_resampler_matches_torch_mha(tiny):
    _, resampler_t, _, cfg, params = tiny
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 32)).astype(np.float32)  # grid (2, 3)

    got = np.asarray(resampler_forward(params["resampler"], cfg.resampler,
                                       jnp.asarray(x), (2, 3)))
    with torch.no_grad():
        want = resampler_t(torch.from_numpy(x), (2, 3)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vision_embedding_matches_oracle(tiny):
    vision_t, resampler_t, _, cfg, params = tiny
    rng = np.random.default_rng(2)
    # Non-square frame -> non-square patch grid (2, 3): exercises the
    # bucketized position ids and the sin-cos grid orientation.
    pix = rng.normal(size=(3, 28, 42, 3)).astype(np.float32)

    got = np.asarray(get_vision_embedding(params, cfg, jnp.asarray(pix)))
    with torch.no_grad():
        vis = vision_t(torch.from_numpy(
            pix.transpose(0, 3, 1, 2))).last_hidden_state
        want = resampler_t(vis, (2, 3)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_full_forward_logits_match_oracle(tiny):
    vision_t, resampler_t, qwen_t, cfg, params = tiny
    rng = np.random.default_rng(3)
    pix = rng.normal(size=(2, 28, 42, 3)).astype(np.float32)

    ids = build_video_prompt_ids(
        lambda s: {"input_ids": [97 + (ord(c) % 7) for c in s]}, cfg, 2,
        "rate it")
    mask = np.ones_like(ids)

    hidden = minicpmv_forward(params, cfg, jnp.asarray(ids),
                              jnp.asarray(mask),
                              pixel_values=jnp.asarray(pix))
    got = np.asarray(lm_logits(params, hidden))

    with torch.no_grad():
        vis = vision_t(torch.from_numpy(
            pix.transpose(0, 3, 1, 2))).last_hidden_state
        img = resampler_t(vis, (2, 3))  # (2, Q, D)
        tids = torch.from_numpy(ids.astype(np.int64))
        emb = qwen_t.model.embed_tokens(tids)
        emb[tids == UNK] = img.reshape(-1, img.shape[-1])
        want = qwen_t(inputs_embeds=emb,
                      attention_mask=torch.from_numpy(mask)).logits.numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_greedy_generate_matches_hf_generate(tiny):
    vision_t, resampler_t, qwen_t, cfg, params = tiny
    rng = np.random.default_rng(4)
    pix = rng.normal(size=(1, 28, 42, 3)).astype(np.float32)
    ids = build_video_prompt_ids(
        lambda s: {"input_ids": [97 + (ord(c) % 7) for c in s]}, cfg, 1,
        "score")

    got = greedy_generate(params, cfg, ids, pixel_values=pix,
                          max_new_tokens=5, eos_token_id=-1)

    with torch.no_grad():
        vis = vision_t(torch.from_numpy(
            pix.transpose(0, 3, 1, 2))).last_hidden_state
        img = resampler_t(vis, (2, 3))
        tids = torch.from_numpy(ids.astype(np.int64))
        emb = qwen_t.model.embed_tokens(tids)
        emb[tids == UNK] = img.reshape(-1, img.shape[-1])
        out = qwen_t.generate(
            inputs_embeds=emb, max_new_tokens=5, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0].tolist()
    assert got == out[:5]


def test_find_best_resize_rule():
    # 640x360 video frame -> ~448^2 pixel budget, dims divisible by 14.
    w, h = find_best_resize(640, 360)
    assert w % 14 == 0 and h % 14 == 0
    assert w * h <= (448 + 14) * (448 + 14)
    assert abs((w / h) - (640 / 360)) < 0.15

    frames = [np.zeros((360, 640, 3), np.uint8)] * 3
    cfg = MiniCPMVConfig()
    pix = preprocess_video_frames(frames, cfg)
    assert pix.shape == (3, h, w, 3)
    # mean/std 0.5 normalization: zeros -> -1
    np.testing.assert_allclose(pix, -1.0)


class _ShimTokenizer:
    """Minimal tokenizer for the hermetic judge test: ASCII chars map into
    the tiny 128-token vocab; special tokens fall back to config defaults."""

    def __call__(self, s):
        return {"input_ids": [97 + (ord(c) % 7) for c in s]}

    def decode(self, toks):
        return " ".join(str(t) for t in toks)


def test_minicpmv_judge_scores_video_end_to_end(tiny, tmp_path):
    """Completes C20's MiniCPM row: a MiniCPMVJudge scoring a sample video
    end-to-end (decode -> best-resize -> SigLIP -> resampler -> Qwen2 ->
    greedy generate -> rating parse)."""
    import cv2

    from mjvideo_tpu.eval.judges import MiniCPMVJudge, judge_pair

    _, _, _, cfg, params = tiny

    video = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (64, 48))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(10):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    # Tiny vision tower: cap the per-frame budget so shapes stay small.
    small = MiniCPMVConfig(
        vision=cfg.vision, resampler=cfg.resampler, text=cfg.text,
        scale_resolution=42,
        im_start_token_id=IM_START, im_end_token_id=IM_END,
        image_start_token_id=IMG_S, image_end_token_id=IMG_E,
        unk_token_id=UNK,
    )
    judge = MiniCPMVJudge(small, params, _ShimTokenizer(), num_segments=4,
                          max_new_tokens=3, attn_impl="xla")
    resp = judge.ask("Rate this video.", str(video))
    assert isinstance(resp, str)

    s0, s1, _, _ = judge_pair(judge, str(video), str(video), "a test clip")
    assert 0 <= s0 <= 10 and s0 == s1  # same video -> same greedy rating


def test_build_video_prompt_ids_structure():
    cfg = MiniCPMVConfig(
        im_start_token_id=IM_START, im_end_token_id=IM_END,
        image_start_token_id=IMG_S, image_end_token_id=IMG_E,
        unk_token_id=UNK,
    )
    ids = build_video_prompt_ids(
        lambda s: {"input_ids": [1] * len(s)}, cfg, 2, "hi")[0].tolist()
    assert ids.count(UNK) == 2 * cfg.resampler.num_queries
    assert ids.count(IMG_S) == 2 and ids.count(IMG_E) == 2
    assert ids[0] == IM_START and ids.count(IM_START) == 2

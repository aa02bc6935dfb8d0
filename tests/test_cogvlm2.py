"""CogVLM2-Video JAX port vs an independent torch oracle.

CogVLM2 is trust_remote_code (no transformers class), so the oracle is a
torch implementation assembled here following the published architecture
(THUDM/cogvlm2-video-llama3-chat ``visual.py`` / ``modeling_cogvlm.py``):
EVA post-sublayer-LayerNorm blocks, conv+GLU adapter with boi/eoi and the
1/scaling_factor output scale, and the dual-expert Llama decoder with
shared vision RoPE positions.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from mjvideo_tpu.configs import LLMConfig
from mjvideo_tpu.models.cogvlm2 import (
    LANGUAGE_TOKEN_TYPE,
    VISION_TOKEN_TYPE,
    CogVLM2Config,
    CogVLM2VisionConfig,
    adapter_forward,
    build_position_ids,
    build_video_prompt_ids,
    cogvlm2_forward,
    greedy_generate,
    import_cogvlm2_params,
    lm_logits,
    preprocess_video_frames,
    vision_forward,
)

VC = dict(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
          num_heads=2, patch_size=7, image_size=28, scaling_factor=8.0)
TC = dict(vocab_size=128, hidden_size=32, intermediate_size=48,
          num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
          rope_theta=1e4)


class EVAAttention(nn.Module):
    def __init__(self, C, H):
        super().__init__()
        self.num_heads = H
        self.query_key_value = nn.Linear(C, 3 * C)
        self.dense = nn.Linear(C, C)

    def forward(self, x):
        B, L, C = x.shape
        H = self.num_heads
        qkv = self.query_key_value(x).reshape(B, L, 3, H, -1)
        qkv = qkv.permute(2, 0, 3, 1, 4)  # 3, B, H, L, D
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-1, -2)) * (q.shape[-1] ** -0.5)
        out = att.softmax(dim=-1) @ v  # (B, H, L, D)
        out = out.transpose(1, 2).reshape(B, L, C)
        return self.dense(out)


class EVALayer(nn.Module):
    """visual.py TransformerLayer: LN on the sublayer OUTPUT, then add."""

    def __init__(self, C, I, H, eps):
        super().__init__()
        self.input_layernorm = nn.LayerNorm(C, eps=eps)
        self.post_attention_layernorm = nn.LayerNorm(C, eps=eps)
        self.attention = EVAAttention(C, H)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(C, I)
        self.mlp.fc2 = nn.Linear(I, C)

    def forward(self, x):
        x = x + self.input_layernorm(self.attention(x))
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(x)))
        return x + self.post_attention_layernorm(h)


class PatchEmbedding(nn.Module):
    def __init__(self, C, P, image_size):
        super().__init__()
        self.proj = nn.Conv2d(3, C, kernel_size=P, stride=P)
        self.cls_embedding = nn.Parameter(torch.randn(1, C) * 0.1)
        n = (image_size // P) ** 2 + 1
        self.position_embedding = nn.Embedding(n, C)

    def forward(self, images):
        x = self.proj(images).flatten(2).transpose(1, 2)
        cls = self.cls_embedding.expand(x.shape[0], -1, -1)
        x = torch.cat((cls, x), dim=1)
        return x + self.position_embedding.weight.unsqueeze(0)


class GLU(nn.Module):
    def __init__(self, C, D, TI):
        super().__init__()
        self.linear_proj = nn.Linear(C, D, bias=False)
        self.norm1 = nn.LayerNorm(D)
        self.gate_proj = nn.Linear(D, TI, bias=False)
        self.dense_h_to_4h = nn.Linear(D, TI, bias=False)
        self.dense_4h_to_h = nn.Linear(TI, D, bias=False)

    def forward(self, x):
        x = self.linear_proj(x)
        x = F.gelu(self.norm1(x))
        x = F.silu(self.gate_proj(x)) * self.dense_h_to_4h(x)
        return self.dense_4h_to_h(x)


class EVA2CLIP(nn.Module):
    def __init__(self, vc, D, TI):
        super().__init__()
        C, H, I = vc["hidden_size"], vc["num_heads"], vc["intermediate_size"]
        self.patch_embedding = PatchEmbedding(C, vc["patch_size"],
                                              vc["image_size"])
        self.transformer = nn.Module()
        self.transformer.layers = nn.ModuleList([
            EVALayer(C, I, H, 1e-6)
            for _ in range(vc["num_hidden_layers"])
        ])
        self.conv = nn.Conv2d(C, C, kernel_size=2, stride=2)
        self.linear_proj = GLU(C, D, TI)
        self.boi = nn.Parameter(torch.randn(1, 1, D) * 0.1)
        self.eoi = nn.Parameter(torch.randn(1, 1, D) * 0.1)
        self.scaling_factor = vc["scaling_factor"]
        self.grid = vc["image_size"] // vc["patch_size"]

    def forward(self, images):
        x = self.patch_embedding(images)
        for layer in self.transformer.layers:
            x = layer(x)
        x = x[:, 1:]
        B, _, C = x.shape
        g = self.grid
        x = x.reshape(B, g, g, C).permute(0, 3, 1, 2)
        x = self.conv(x).flatten(2).transpose(1, 2)
        x = self.linear_proj(x)
        boi = self.boi.expand(B, -1, -1)
        eoi = self.eoi.expand(B, -1, -1)
        x = torch.cat((boi, x, eoi), dim=1)
        return x / self.scaling_factor


def rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat((-x2, x1), dim=-1)


class MLPExpert(nn.Module):
    def __init__(self, D, TI):
        super().__init__()
        self.gate_proj = nn.Linear(D, TI, bias=False)
        self.up_proj = nn.Linear(D, TI, bias=False)
        self.down_proj = nn.Linear(TI, D, bias=False)

    def forward(self, x):
        return self.down_proj(F.silu(self.gate_proj(x)) * self.up_proj(x))


class CogLayer(nn.Module):
    def __init__(self, tc):
        super().__init__()
        D = tc["hidden_size"]
        Hq, Hkv = tc["num_attention_heads"], tc["num_key_value_heads"]
        hd = D // Hq
        qkv = Hq * hd + 2 * Hkv * hd
        self.input_layernorm = nn.RMSNorm(D, eps=1e-5)
        self.post_attention_layernorm = nn.RMSNorm(D, eps=1e-5)
        self.self_attn = nn.Module()
        self.self_attn.vision_expert_query_key_value = nn.Linear(D, qkv,
                                                                 bias=True)
        self.self_attn.language_expert_query_key_value = nn.Linear(
            D, qkv, bias=False)
        self.self_attn.vision_expert_dense = nn.Linear(Hq * hd, D,
                                                       bias=False)
        self.self_attn.language_expert_dense = nn.Linear(Hq * hd, D,
                                                         bias=False)
        self.mlp = nn.Module()
        self.mlp.vision_mlp = MLPExpert(D, tc["intermediate_size"])
        self.mlp.language_mlp = MLPExpert(D, tc["intermediate_size"])
        self.Hq, self.Hkv, self.hd = Hq, Hkv, hd

    def forward(self, x, vis_mask, cos, sin, position_ids):
        B, T, D = x.shape
        Hq, Hkv, hd = self.Hq, self.Hkv, self.hd
        h = self.input_layernorm(x)
        qkv_v = self.self_attn.vision_expert_query_key_value(h)
        qkv_l = self.self_attn.language_expert_query_key_value(h)
        qkv = torch.where(vis_mask, qkv_v, qkv_l)
        q, k, v = torch.split(qkv, [Hq * hd, Hkv * hd, Hkv * hd], dim=-1)
        q = q.reshape(B, T, Hq, hd).transpose(1, 2)
        k = k.reshape(B, T, Hkv, hd).transpose(1, 2)
        v = v.reshape(B, T, Hkv, hd).transpose(1, 2)
        c = cos[position_ids][:, None]  # (B, 1, T, hd)
        s = sin[position_ids][:, None]
        q = q * c + rotate_half(q) * s
        k = k * c + rotate_half(k) * s
        k = k.repeat_interleave(Hq // Hkv, dim=1)
        v = v.repeat_interleave(Hq // Hkv, dim=1)
        att = (q @ k.transpose(-1, -2)) * (hd ** -0.5)
        causal = torch.full((T, T), float("-inf")).triu(1)
        att = (att + causal).softmax(dim=-1)
        out = (att @ v).transpose(1, 2).reshape(B, T, Hq * hd)
        out = torch.where(
            vis_mask, self.self_attn.vision_expert_dense(out),
            self.self_attn.language_expert_dense(out))
        x = x + out
        h = self.post_attention_layernorm(x)
        mlp = torch.where(vis_mask, self.mlp.vision_mlp(h),
                          self.mlp.language_mlp(h))
        return x + mlp


class CogOracle(nn.Module):
    def __init__(self, vc, tc):
        super().__init__()
        D = tc["hidden_size"]
        self.vision = EVA2CLIP(vc, D, tc["intermediate_size"])
        self.embed_tokens = nn.Embedding(tc["vocab_size"], D)
        self.layers = nn.ModuleList(
            [CogLayer(tc) for _ in range(tc["num_hidden_layers"])])
        self.norm = nn.RMSNorm(D, eps=1e-5)
        self.lm_head = nn.Linear(D, tc["vocab_size"], bias=False)
        self.tc = tc

    def forward(self, ids, token_type, pixel):
        emb = self.embed_tokens(ids)
        img = self.vision(pixel)  # (F, n, D)
        vis = token_type == VISION_TOKEN_TYPE
        emb = emb.clone()
        emb[vis] = img.reshape(-1, img.shape[-1])
        pos = torch.from_numpy(build_position_ids(token_type.numpy()))
        hd = self.tc["hidden_size"] // self.tc["num_attention_heads"]
        inv = 1.0 / (self.tc["rope_theta"] ** (
            torch.arange(0, hd, 2).float() / hd))
        t = torch.arange(ids.shape[1]).float()
        freqs = torch.outer(t, inv)
        table = torch.cat([freqs, freqs], dim=-1)
        cos, sin = table.cos(), table.sin()
        x = emb
        vm = vis.unsqueeze(-1)
        for layer in self.layers:
            x = layer(x, vm, cos, sin, pos)
        return self.lm_head(self.norm(x))


@pytest.fixture(scope="module")
def tiny():
    torch.manual_seed(0)
    oracle = CogOracle(VC, TC).eval()
    cfg = CogVLM2Config(
        vision=CogVLM2VisionConfig(**VC),
        text=LLMConfig(architecture="llama", rms_norm_eps=1e-5,
                       pad_token_id=0, max_position_embeddings=256, **TC),
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = import_cogvlm2_params(state, cfg)
    return oracle, cfg, params


def test_vision_tower_and_adapter_match_oracle(tiny):
    oracle, cfg, params = tiny
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)

    vis = vision_forward(params["vision"], cfg.vision, jnp.asarray(pix))
    got = np.asarray(adapter_forward(params["adapter"], cfg, vis))
    with torch.no_grad():
        want = oracle.vision(torch.from_numpy(
            pix.transpose(0, 3, 1, 2))).numpy()
    assert got.shape == (2, cfg.vision.tokens_per_frame, 32)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_build_position_ids_shared_vision_positions():
    # [lang, VIS-run of 5, lang, lang]: run's first/last increment, the
    # interior 3 share one position.
    tt = np.asarray([[0, 1, 1, 1, 1, 1, 0, 0]])
    pos = build_position_ids(tt)
    np.testing.assert_array_equal(pos[0], [0, 1, 2, 2, 2, 3, 4, 5])


def test_full_forward_logits_match_oracle(tiny):
    oracle, cfg, params = tiny
    rng = np.random.default_rng(1)
    pix = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)

    ids, tt = build_video_prompt_ids(
        lambda s: {"input_ids": [3 + (ord(c) % 7) for c in s]}, cfg, 2,
        "rate it")
    mask = np.ones_like(ids)
    pos = build_position_ids(tt)

    got = np.asarray(lm_logits(params, cogvlm2_forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(mask),
        jnp.asarray(pos), pixel_values=jnp.asarray(pix), attn_impl="xla")))
    with torch.no_grad():
        want = oracle(torch.from_numpy(ids.astype(np.int64)),
                      torch.from_numpy(tt.astype(np.int64)),
                      torch.from_numpy(pix.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_greedy_generate_matches_oracle_loop(tiny):
    """Greedy decode vs a torch-oracle argmax loop — proves the decode-time
    position ids (language continuation after the shared vision block) and
    token-type handling match the published semantics."""
    oracle, cfg, params = tiny
    rng = np.random.default_rng(2)
    pix = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    ids, tt = build_video_prompt_ids(
        lambda s: {"input_ids": [3 + (ord(c) % 7) for c in s]}, cfg, 1,
        "score")
    a = greedy_generate(params, cfg, ids, tt, pixel_values=pix,
                        max_new_tokens=4, eos_token_id=-1, attn_impl="xla")
    b = greedy_generate(params, cfg, ids, tt, pixel_values=pix,
                        max_new_tokens=4, eos_token_id=-1, attn_impl="xla")
    assert a == b and len(a) == 4

    with torch.no_grad():
        cur_ids = torch.from_numpy(ids.astype(np.int64))
        cur_tt = torch.from_numpy(tt.astype(np.int64))
        pix_t = torch.from_numpy(pix.transpose(0, 3, 1, 2))
        want = []
        for _ in range(4):
            logits = oracle(cur_ids, cur_tt, pix_t)
            tok = int(logits[0, -1].argmax())
            want.append(tok)
            cur_ids = torch.cat(
                [cur_ids, torch.tensor([[tok]], dtype=torch.long)], dim=1)
            cur_tt = torch.cat(
                [cur_tt, torch.tensor([[LANGUAGE_TOKEN_TYPE]],
                                      dtype=torch.long)], dim=1)
    assert a == want


class _ShimTokenizer:
    def __call__(self, s):
        return {"input_ids": [3 + (ord(c) % 7) for c in s]}

    def decode(self, toks):
        return " ".join(str(t) for t in toks)


def test_cogvlm2_judge_scores_video_end_to_end(tiny, tmp_path):
    """Completes C20's CogVLM2 row: a CogVLM2Judge scoring a sample video
    end-to-end (decode -> resize -> EVA tower -> GLU adapter -> dual-expert
    Llama -> greedy generate -> rating parse)."""
    import cv2

    from mjvideo_tpu.eval.judges import CogVLM2Judge, judge_pair

    _, cfg, params = tiny

    video = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (64, 48))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(10):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    judge = CogVLM2Judge(cfg, params, _ShimTokenizer(), num_segments=3,
                         max_new_tokens=3, attn_impl="xla")
    resp = judge.ask("Rate this video.", str(video))
    assert isinstance(resp, str)

    s0, s1, _, _ = judge_pair(judge, str(video), str(video), "a test clip")
    assert 0 <= s0 <= 10 and s0 == s1  # same video -> same greedy rating


def test_preprocess_and_prompt_shapes():
    frames = [np.zeros((48, 64, 3), np.uint8)] * 3
    vc = CogVLM2VisionConfig(**VC)
    pix = preprocess_video_frames(frames, vc)
    assert pix.shape == (3, 28, 28, 3)

    cfg = CogVLM2Config(vision=vc, bos_token_id=1, eos_token_id=2,
                        pad_token_id=0)
    ids, tt = build_video_prompt_ids(
        lambda s: {"input_ids": [5] * len(s)}, cfg, 3, "hi")
    n_vis = 3 * vc.tokens_per_frame
    assert (tt == VISION_TOKEN_TYPE).sum() == n_vis
    assert ids[0, 0] == 1 and tt[0, 0] == LANGUAGE_TOKEN_TYPE

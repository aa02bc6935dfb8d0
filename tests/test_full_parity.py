"""FULL-model torch oracle: pixels + ids -> overall score, end to end.

Composes the per-module oracles (ViT block, pixel-shuffle, projector, GQA
decoder with RoPE, reward head) into one independent torch implementation of
the complete reference pipeline (``moe_reward.py:183-297`` calling
``modeling_internvl_chat.py:146-262``), fed the SAME weights as the JAX
model.  Agreement of the final scalar score within fp32 tolerance is the
strongest hermetic substitute for published-weight parity (no hub access —
SURVEY.md §7.3 'score parity' hard part).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.models import reward


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return reward.init_reward_params(jax.random.PRNGKey(42), cfg)


def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def _torch_vit(p, pix, vc):
    """InternViT-300M variant: patch conv, cls+pos, pre-norm blocks."""
    B, H, W, _ = pix.shape
    P = vc.patch_size
    gh, gw = H // P, W // P
    x = _t(pix).reshape(B, gh, P, gw, P, 3).permute(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh * gw, P * P * 3)
    emb = p["embeddings"]
    x = x @ _t(emb["patch_embedding"]["kernel"]) + _t(
        emb["patch_embedding"]["bias"])
    cls = _t(emb["class_embedding"]).expand(B, 1, vc.hidden_size)
    x = torch.cat([cls, x], dim=1) + _t(emb["position_embedding"])

    Hh, D = vc.num_attention_heads, vc.head_dim
    for i in range(vc.num_hidden_layers):
        lp = jax.tree.map(lambda a: a[i], p["layers"])
        h = TF.layer_norm(x, (vc.hidden_size,), _t(lp["norm1"]["weight"]),
                          _t(lp["norm1"]["bias"]), eps=vc.layer_norm_eps)
        qkv = h @ _t(lp["attn"]["qkv"]["kernel"]) + _t(lp["attn"]["qkv"]["bias"])
        B_, S, _ = qkv.shape
        qkv = qkv.reshape(B_, S, 3, Hh, D).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = torch.softmax((q * D**-0.5) @ k.transpose(-2, -1), dim=-1) @ v
        attn = attn.transpose(1, 2).reshape(B_, S, -1)
        attn = attn @ _t(lp["attn"]["proj"]["kernel"]) + _t(
            lp["attn"]["proj"]["bias"])
        x = x + attn * _t(lp["ls1"])
        h = TF.layer_norm(x, (vc.hidden_size,), _t(lp["norm2"]["weight"]),
                          _t(lp["norm2"]["bias"]), eps=vc.layer_norm_eps)
        h = h @ _t(lp["mlp"]["fc1"]["kernel"]) + _t(lp["mlp"]["fc1"]["bias"])
        h = TF.gelu(h)
        h = h @ _t(lp["mlp"]["fc2"]["kernel"]) + _t(lp["mlp"]["fc2"]["bias"])
        x = x + h * _t(lp["ls2"])
    return x


def _torch_pixel_shuffle_v2(x, scale=0.5):
    """modeling_internvl_chat.py:228-242 with ps_version='v2'."""
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale), int(c / scale))
    x = x.permute(0, 2, 1, 3)
    x = x.reshape(n, int(h * scale), int(w * scale), int(c / scale**2))
    return x.permute(0, 2, 1, 3)


def _torch_extract(p, pix, ch):
    vit_out = _torch_vit(p["vision_model"], pix, ch.vision)
    ve = vit_out[:, 1:, :]
    n, s, c = ve.shape
    hw = int(s**0.5)
    ve = ve.reshape(n, hw, hw, c)
    ve = _torch_pixel_shuffle_v2(ve, ch.downsample_ratio)
    ve = ve.reshape(n, -1, ve.shape[-1])
    mp = p["mlp1"]
    h = TF.layer_norm(ve, (ve.shape[-1],), _t(mp["norm"]["weight"]),
                      _t(mp["norm"]["bias"]), eps=1e-5)
    h = h @ _t(mp["fc1"]["kernel"]) + _t(mp["fc1"]["bias"])
    h = TF.gelu(h)
    return h @ _t(mp["fc2"]["kernel"]) + _t(mp["fc2"]["bias"])


def _torch_decoder(p, embeds, mask, lc):
    """All layers + final norm (eager attention, fp32 softmax)."""
    B, S, C = embeds.shape
    Hq, Hkv, D = lc.num_attention_heads, lc.num_key_value_heads, lc.head_dim
    G = Hq // Hkv
    bias = torch.zeros(B, 1, S, S)
    causal = torch.tril(torch.ones(S, S, dtype=torch.bool))
    bias = bias.masked_fill(~causal, -1e30)
    bias = bias.masked_fill(~_t(mask).bool()[:, None, None, :], -1e30)

    inv_freq = 1.0 / (lc.rope_theta ** (torch.arange(0, D, 2).float() / D))
    t = torch.arange(S).float()
    freqs = torch.outer(t, inv_freq)
    emb = torch.cat((freqs, freqs), dim=-1)
    cos, sin = emb.cos()[None, :, None, :], emb.sin()[None, :, None, :]

    def rot(z):
        z1, z2 = z[..., : D // 2], z[..., D // 2:]
        return torch.cat((-z2, z1), dim=-1)

    def rms(v, w):
        var = v.pow(2).mean(-1, keepdim=True)
        return _t(w) * (v * torch.rsqrt(var + lc.rms_norm_eps))

    x = embeds
    for i in range(lc.num_hidden_layers):
        lp = jax.tree.map(lambda a: a[i], p["layers"])
        h = rms(x, lp["attention_norm"]["weight"])
        q = (h @ _t(lp["attention"]["wq"]["kernel"])).reshape(B, S, Hq, D)
        k = (h @ _t(lp["attention"]["wk"]["kernel"])).reshape(B, S, Hkv, D)
        v = (h @ _t(lp["attention"]["wv"]["kernel"])).reshape(B, S, Hkv, D)
        q = q * cos + rot(q) * sin
        k = k * cos + rot(k) * sin
        q = q.permute(0, 2, 1, 3)
        k = k.permute(0, 2, 1, 3).repeat_interleave(G, dim=1)
        v = v.permute(0, 2, 1, 3).repeat_interleave(G, dim=1)
        logits = q @ k.transpose(-2, -1) / D**0.5 + bias
        probs = torch.softmax(logits.float(), dim=-1)
        attn = (probs @ v).permute(0, 2, 1, 3).reshape(B, S, Hq * D)
        x = x + attn @ _t(lp["attention"]["wo"]["kernel"])
        h = rms(x, lp["ffn_norm"]["weight"])
        gate = h @ _t(lp["feed_forward"]["w1"]["kernel"])
        up = h @ _t(lp["feed_forward"]["w3"]["kernel"])
        x = x + (TF.silu(gate) * up) @ _t(lp["feed_forward"]["w2"]["kernel"])
    return rms(x, p["norm"]["weight"])


def _torch_gating_mlp(p, x, n_hidden):
    for i in range(n_hidden + 1):
        x = x @ _t(p[f"layer_{i}"]["kernel"]) + _t(p[f"layer_{i}"]["bias"])
        if i < n_hidden:
            x = torch.relu(x)
    return x


def test_full_reward_model_matches_torch_oracle(cfg, params):
    ch = cfg.chat
    lc = ch.llm
    rng = np.random.default_rng(7)

    B, F = 2, 2
    n_img = ch.num_image_token * F
    T = n_img + 14
    pix = rng.normal(size=(B * F, ch.vision.image_size, ch.vision.image_size,
                           3)).astype(np.float32)
    ids = rng.integers(10, 200, size=(B, T))
    ids[0, 3:3 + n_img] = ch.img_context_token_id
    ids[1, 5:5 + n_img] = ch.img_context_token_id
    ids[0, T - 3:] = lc.pad_token_id  # right padding row 0
    mask = (ids != lc.pad_token_id).astype(np.int32)
    gpos = np.array([T - 6, T - 4])

    # --- JAX
    out = reward.reward_forward(
        params, cfg, jnp.asarray(pix), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask), jnp.asarray(gpos), attn_impl="xla", remat=False,
    )

    # --- torch oracle
    model = params["model"]
    vit_embeds = _torch_extract(model, pix, ch)  # (B*F, n_tok, C)
    tok = _t(model["language_model"]["tok_embeddings"])
    embeds = tok[torch.tensor(ids)]
    flat = embeds.reshape(B * T, -1)
    sel = torch.tensor(ids).reshape(-1) == ch.img_context_token_id
    flat[sel] = vit_embeds.reshape(-1, vit_embeds.shape[-1])
    embeds = flat.reshape(B, T, -1)
    hidden = _torch_decoder(model["language_model"], embeds, mask, lc)

    idt = torch.tensor(ids)
    seq_len = (torch.eq(idt, lc.pad_token_id).int().argmax(-1) - 1) % T
    pooled = hidden[torch.arange(B), seq_len]
    rewards = pooled @ _t(params["regression_layer"]["kernel"])
    rewards = rewards @ _t(params["reward_transform_matrix"])
    prompt = hidden[torch.arange(B), torch.tensor(gpos)]
    n_h = cfg.gating_n_hidden
    aspect_gate = (
        torch.softmax(
            _torch_gating_mlp(params["aspect_gating"], prompt, n_h)
            / cfg.gating_temperature, dim=1)
        * _t(params["aspect_gating"]["logit_scale"])[0]
    )
    criteria_logits = _torch_gating_mlp(params["criteria_gating"], prompt, n_h)
    scale = _t(params["criteria_gating"]["logit_scale"])[0]
    aspect_scores = torch.zeros(B, cfg.num_aspects)
    for i, crit in enumerate(cfg.aspect2criteria):
        crit = list(crit)
        w = torch.softmax(criteria_logits[:, crit] / cfg.gating_temperature,
                          dim=-1) * scale
        aspect_scores[:, i] = (rewards[:, crit] * w).sum(dim=-1)
    score = (aspect_scores * aspect_gate).sum(dim=-1)

    np.testing.assert_allclose(np.asarray(out.rewards), rewards.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.aspect_scores),
                               aspect_scores.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.score), score.numpy(),
                               atol=5e-4, rtol=1e-3)

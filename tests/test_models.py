"""Model-level parity tests against self-contained torch oracles.

Each oracle re-derives the reference math (cited per test) independently in
torch on CPU, is fed the SAME weights as the JAX model, and must agree to
fp32 tolerance.  This substitutes for published-weight parity (no network
access) by proving the computation graphs are identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.models import decoder as dec
from mjvideo_tpu.models import internvl, reward, vit


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return reward.init_reward_params(jax.random.PRNGKey(0), cfg)


def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


# ---------------------------------------------------------------- ViT oracle


def _torch_vit_block(p, x, cfg):
    """Oracle of modeling_intern_vit.py:266-295 (layer_norm variant)."""
    vc = cfg.chat.vision
    H, D = vc.num_attention_heads, vc.head_dim
    h = TF.layer_norm(
        x, (vc.hidden_size,), _t(p["norm1"]["weight"]), _t(p["norm1"]["bias"]),
        eps=vc.layer_norm_eps,
    )
    qkv = h @ _t(p["attn"]["qkv"]["kernel"]) + _t(p["attn"]["qkv"]["bias"])
    B, S, _ = qkv.shape
    qkv = qkv.reshape(B, S, 3, H, D).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.unbind(0)
    attn = torch.softmax((q * D**-0.5) @ k.transpose(-2, -1), dim=-1) @ v
    attn = attn.transpose(1, 2).reshape(B, S, -1)
    attn = attn @ _t(p["attn"]["proj"]["kernel"]) + _t(p["attn"]["proj"]["bias"])
    x = x + attn * _t(p["ls1"])
    h = TF.layer_norm(
        x, (vc.hidden_size,), _t(p["norm2"]["weight"]), _t(p["norm2"]["bias"]),
        eps=vc.layer_norm_eps,
    )
    h = h @ _t(p["mlp"]["fc1"]["kernel"]) + _t(p["mlp"]["fc1"]["bias"])
    h = TF.gelu(h)
    h = h @ _t(p["mlp"]["fc2"]["kernel"]) + _t(p["mlp"]["fc2"]["bias"])
    return x + h * _t(p["ls2"])


def test_vit_block_matches_torch(cfg, params):
    vp = params["model"]["vision_model"]
    layer0 = jax.tree.map(lambda a: a[0], vp["layers"])
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 17, cfg.chat.vision.hidden_size)).astype(np.float32)
    got = vit._block(cfg.chat.vision, layer0, jnp.asarray(x), "xla")
    expected = _torch_vit_block(layer0, torch.tensor(x), cfg)
    np.testing.assert_allclose(
        np.asarray(got), expected.numpy(), atol=2e-5, rtol=1e-4
    )


def test_vit_patch_embed_matches_torch_conv(cfg, params):
    """Patchify+matmul == Conv2d(k=s=patch), incl. weight layout round-trip."""
    vc = cfg.chat.vision
    P, C = vc.patch_size, vc.hidden_size
    pe = params["model"]["vision_model"]["embeddings"]["patch_embedding"]
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, vc.image_size, vc.image_size, 3)).astype(np.float32)

    got = vit.patch_embed(pe, jnp.asarray(img), P)

    # torch conv with the importer's inverse layout mapping:
    # ours (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
    w = np.asarray(pe["kernel"]).reshape(P, P, 3, C).transpose(3, 2, 0, 1)
    out = TF.conv2d(
        torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(w),
        torch.tensor(np.asarray(pe["bias"])), stride=P,
    )
    expected = out.flatten(2).transpose(1, 2)  # (N, np, C) as reference :166
    np.testing.assert_allclose(
        np.asarray(got), expected.numpy(), atol=2e-5, rtol=1e-4
    )


def test_vit_forward_shape(cfg, params):
    vc = cfg.chat.vision
    img = jnp.ones((3, vc.image_size, vc.image_size, 3))
    out = vit.vit_forward(params["model"]["vision_model"], vc, img)
    assert out.shape == (3, vc.seq_len, vc.hidden_size)


def test_vit_drop_path_training_vs_eval(cfg, params):
    """DropPath/dropout (modeling_intern_vit.py:278-281) activate only when
    an rng is passed AND the config carries nonzero rates."""
    import dataclasses

    vc = cfg.chat.vision
    vp = params["model"]["vision_model"]
    img = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(2, vc.image_size, vc.image_size, 3)).astype(np.float32))
    base = vit.vit_forward(vp, vc, img)

    # rate 0 + rng: stochastic mode is a no-op (keeps the eval path exact)
    same = vit.vit_forward(vp, vc, img, rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))

    vc_dp = dataclasses.replace(vc, drop_path_rate=0.5, dropout=0.1)
    a = vit.vit_forward(vp, vc_dp, img, rng=jax.random.PRNGKey(1))
    b = vit.vit_forward(vp, vc_dp, img, rng=jax.random.PRNGKey(2))
    c = vit.vit_forward(vp, vc_dp, img, rng=jax.random.PRNGKey(1))
    assert bool(jnp.any(a != b))  # different keys -> different drops
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))  # same key
    assert bool(jnp.all(jnp.isfinite(a)))
    # rng=None stays deterministic even with nonzero rates (eval mode)
    ev = vit.vit_forward(vp, vc_dp, img)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(base))

    vc_bad = dataclasses.replace(vc, drop_path_rate=0.5, attention_dropout=0.1)
    with pytest.raises(ValueError, match="attention_dropout"):
        vit.vit_forward(vp, vc_bad, img, rng=jax.random.PRNGKey(1))


# ------------------------------------------------------------ decoder oracle


def _torch_decoder_layer(p, x, mask_bias, cfg):
    """Oracle of modeling_internlm2.py:610-681 (eager attention path)."""
    lc = cfg.chat.llm
    Hq, Hkv, D = lc.num_attention_heads, lc.num_key_value_heads, lc.head_dim
    G = Hq // Hkv
    B, S, C = x.shape

    def rms(v, w):
        var = v.pow(2).mean(-1, keepdim=True)
        return _t(w) * (v * torch.rsqrt(var + lc.rms_norm_eps))

    h = rms(x, p["attention_norm"]["weight"])
    q = (h @ _t(p["attention"]["wq"]["kernel"])).reshape(B, S, Hq, D)
    k = (h @ _t(p["attention"]["wk"]["kernel"])).reshape(B, S, Hkv, D)
    v = (h @ _t(p["attention"]["wv"]["kernel"])).reshape(B, S, Hkv, D)

    # RoPE (modeling_internlm2.py:147-180, 232-247)
    inv_freq = 1.0 / (lc.rope_theta ** (torch.arange(0, D, 2).float() / D))
    t = torch.arange(S).float()
    freqs = torch.outer(t, inv_freq)
    emb = torch.cat((freqs, freqs), dim=-1)
    cos, sin = emb.cos()[None, :, None, :], emb.sin()[None, :, None, :]

    def rot(z):
        z1, z2 = z[..., : D // 2], z[..., D // 2:]
        return torch.cat((-z2, z1), dim=-1)

    q = q * cos + rot(q) * sin
    k = k * cos + rot(k) * sin

    q = q.permute(0, 2, 1, 3)
    k = k.permute(0, 2, 1, 3).repeat_interleave(G, dim=1)
    v = v.permute(0, 2, 1, 3).repeat_interleave(G, dim=1)
    logits = q @ k.transpose(-2, -1) / D**0.5 + mask_bias
    probs = torch.softmax(logits.float(), dim=-1)
    attn = (probs @ v).permute(0, 2, 1, 3).reshape(B, S, Hq * D)
    x = x + attn @ _t(p["attention"]["wo"]["kernel"])

    h = rms(x, p["ffn_norm"]["weight"])
    gate = h @ _t(p["feed_forward"]["w1"]["kernel"])
    up = h @ _t(p["feed_forward"]["w3"]["kernel"])
    return x + (TF.silu(gate) * up) @ _t(p["feed_forward"]["w2"]["kernel"])


def test_decoder_forward_matches_torch(cfg, params):
    lc = cfg.chat.llm
    lp = params["model"]["language_model"]
    B, S = 2, 11
    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, S, lc.hidden_size)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    mask[1, 7:] = 0

    got = dec.decoder_forward(
        lp, lc, jnp.asarray(x), attention_mask=jnp.asarray(mask)
    )

    # torch: causal + padding additive bias
    causal = torch.tril(torch.ones(S, S)).bool()
    bias = torch.zeros(B, 1, S, S)
    bias.masked_fill_(~causal, float(-1e30))
    pad = torch.tensor(mask)[:, None, None, :] == 0
    bias = bias.masked_fill(pad, float(-1e30))

    xt = torch.tensor(x)
    for layer_i in range(lc.num_hidden_layers):
        p_i = jax.tree.map(lambda a: a[layer_i], lp["layers"])
        xt = _torch_decoder_layer(p_i, xt, bias, cfg)
    var = xt.pow(2).mean(-1, keepdim=True)
    xt = _t(lp["norm"]["weight"]) * (xt * torch.rsqrt(var + lc.rms_norm_eps))

    for b in range(B):
        n = int(mask[b].sum())
        np.testing.assert_allclose(
            np.asarray(got)[b, :n], xt.numpy()[b, :n], atol=5e-5, rtol=1e-4
        )


# ----------------------------------------------------------- fusion + scatter


def test_scatter_image_embeds_matches_torch_semantics(cfg):
    """Oracle of input_embeds[selected] = vit_embeds (internvl_chat.py:176-186)."""
    B, T, C = 2, 10, 8
    ctx = cfg.chat.img_context_token_id
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 50, size=(B, T))
    ids[0, 2:6] = ctx
    ids[1, 1:5] = ctx
    embeds = rng.normal(size=(B, T, C)).astype(np.float32)
    vit_embeds = rng.normal(size=(2, 4, C)).astype(np.float32)  # 8 tokens

    got = internvl.scatter_image_embeds(
        jnp.asarray(embeds), jnp.asarray(ids), jnp.asarray(vit_embeds), ctx
    )

    et = torch.tensor(embeds).reshape(B * T, C)
    sel = torch.tensor(ids).reshape(B * T) == ctx
    et[sel] = et[sel] * 0.0 + torch.tensor(vit_embeds).reshape(-1, C)
    np.testing.assert_allclose(
        np.asarray(got), et.reshape(B, T, C).numpy(), atol=0
    )


def test_extract_feature_shape(cfg, params):
    ch = cfg.chat
    img = jnp.ones((2, ch.image_size, ch.image_size, 3))
    feat = internvl.extract_feature(params["model"], ch, img)
    assert feat.shape == (2, ch.num_image_token, ch.llm.hidden_size)


# ------------------------------------------------------------- reward oracle


def _torch_gating_mlp(p, x, n_hidden):
    for i in range(n_hidden + 1):
        x = x @ _t(p[f"layer_{i}"]["kernel"]) + _t(p[f"layer_{i}"]["bias"])
        if i < n_hidden:
            x = torch.relu(x)
    return x


def test_reward_head_matches_torch(cfg, params):
    """Oracle of moe_reward.py:211-297: pooling, gates, grouped softmax, sums."""
    lc = cfg.chat.llm
    B, T, C = 3, 12, lc.hidden_size
    rng = np.random.default_rng(4)
    hidden = rng.normal(size=(B, T, C)).astype(np.float32)
    ids = rng.integers(10, 200, size=(B, T))
    ids[0, 9:] = lc.pad_token_id  # right padding
    ids[2, 5:] = lc.pad_token_id
    gating_pos = np.array([3, 2, 1])

    out = reward.reward_head(
        params, cfg, jnp.asarray(hidden), jnp.asarray(ids),
        jnp.asarray(gating_pos),
    )

    ht = torch.tensor(hidden)
    idt = torch.tensor(ids)
    # pooling: argmax(ids == pad) - 1 mod T  (moe_reward.py:224-237)
    seq_len = (torch.eq(idt, lc.pad_token_id).int().argmax(-1) - 1) % T
    pooled = ht[torch.arange(B), seq_len]
    rewards = pooled @ _t(params["regression_layer"]["kernel"])
    rewards = rewards @ _t(params["reward_transform_matrix"])

    prompt = ht[torch.arange(B), torch.tensor(gating_pos)]
    n_h = cfg.gating_n_hidden
    aspect_logits = _torch_gating_mlp(params["aspect_gating"], prompt, n_h)
    aspect_gate = (
        torch.softmax(aspect_logits / cfg.gating_temperature, dim=1)
        * _t(params["aspect_gating"]["logit_scale"])[0]
    )
    criteria_logits = _torch_gating_mlp(params["criteria_gating"], prompt, n_h)
    scale = _t(params["criteria_gating"]["logit_scale"])[0]

    aspect_scores = torch.zeros(B, cfg.num_aspects)
    weights_all = []
    for i, crit in enumerate(cfg.aspect2criteria):
        crit = list(crit)
        w = torch.softmax(
            criteria_logits[:, crit] / cfg.gating_temperature, dim=-1
        ) * scale
        weights_all.append(w)
        aspect_scores[:, i] = (rewards[:, crit] * w).sum(dim=-1)
    score = (aspect_scores * aspect_gate).sum(dim=-1)

    np.testing.assert_allclose(
        np.asarray(out.rewards), rewards.numpy(), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.aspect_gating_output), aspect_gate.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.aspect_weights),
        torch.cat(weights_all, dim=-1).numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.aspect_scores), aspect_scores.numpy(), atol=1e-5,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.score), score.numpy(), atol=1e-5, rtol=1e-4
    )


def test_pool_no_pad_uses_last_token(cfg, params):
    """With no pad token present, argmax==0 wraps to the last position."""
    lc = cfg.chat.llm
    B, T, C = 1, 6, lc.hidden_size
    hidden = jnp.arange(B * T * C, dtype=jnp.float32).reshape(B, T, C)
    ids = jnp.full((B, T), 5, dtype=jnp.int32)  # no pads
    pooled = reward.pool_last_non_pad(hidden, ids, lc.pad_token_id)
    np.testing.assert_allclose(np.asarray(pooled[0]), np.asarray(hidden[0, -1]))


def test_reward_forward_end_to_end(cfg, params):
    """Full jit'd forward: 2 tiles, batch of 2 prompts, static shapes."""
    ch = cfg.chat
    B, T = 2, 32
    n_img_tok = ch.num_image_token
    rng = np.random.default_rng(5)
    pixel_values = jnp.asarray(
        rng.normal(size=(2, ch.image_size, ch.image_size, 3)).astype(np.float32)
    )
    ids = rng.integers(10, 200, size=(B, T))
    ids[0, 4: 4 + n_img_tok] = ch.img_context_token_id
    ids[1, 6: 6 + n_img_tok] = ch.img_context_token_id
    ids[0, 28:] = ch.llm.pad_token_id
    mask = (ids != ch.llm.pad_token_id).astype(np.int32)

    fwd = jax.jit(
        lambda p, pv, i, m, g: reward.reward_forward(p, cfg, pv, i, m, g)
    )
    out = fwd(
        params, pixel_values, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray([2, 3]),
    )
    assert out.rewards.shape == (B, cfg.num_objectives)
    assert out.aspect_scores.shape == (B, cfg.num_aspects)
    assert out.score.shape == (B,)
    assert np.all(np.isfinite(np.asarray(out.score)))
    # grouped softmax weights sum to logit_scale per aspect slice
    w = np.asarray(out.aspect_weights)
    for crit in cfg.aspect2criteria:
        np.testing.assert_allclose(
            w[:, list(crit)].sum(-1), 1.0, atol=1e-5
        )


def test_vit_6b_variant_qknorm_rmsnorm_matches_torch():
    """The InternViT-6B style block (rms_norm + qk_normalization over the
    full hidden dim, modeling_intern_vit.py:215-218) vs a torch oracle."""
    from mjvideo_tpu.configs import VisionConfig
    from mjvideo_tpu.models.vit import init_vit_params, vit_forward

    vc = VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=4, image_size=28, patch_size=14,
        qk_normalization=True, norm_type="rms_norm",
    )
    p = init_vit_params(jax.random.PRNGKey(3), vc)
    # randomize norms so the test is not trivially identity
    key = jax.random.PRNGKey(4)
    p["layers"]["attn"]["q_norm"]["weight"] = (
        1.0 + 0.1 * jax.random.normal(key, (1, 32)))
    p["layers"]["attn"]["k_norm"]["weight"] = (
        1.0 - 0.1 * jax.random.normal(key, (1, 32)))

    rng = np.random.default_rng(5)
    pix = jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32)
    got = np.asarray(vit_forward(p, vc, pix, remat=False))

    # torch oracle of one block (pre-norm rms, qk-norm across hidden dim)
    def t(x):
        return torch.tensor(np.asarray(x, np.float32))

    def rms(x, w, eps=1e-6):
        var = x.pow(2).mean(-1, keepdim=True)
        return w * (x * torch.rsqrt(var + eps))

    emb = p["embeddings"]
    # patch embed oracle: conv k14 s14 == unfold+matmul (ordering ph,pw,c)
    pixt = t(pix)
    B = 2
    patches = pixt.reshape(B, 2, 14, 2, 14, 3).permute(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(B, 4, 14 * 14 * 3)
    x = patches @ t(emb["patch_embedding"]["kernel"]) + t(
        emb["patch_embedding"]["bias"])
    cls = t(emb["class_embedding"]).expand(B, 1, 32)
    x = torch.cat([cls, x], dim=1) + t(emb["position_embedding"])

    lp = jax.tree.map(lambda a: a[0], p["layers"])
    H, D = 4, 8
    h = rms(x, t(lp["norm1"]["weight"]))
    qkv = h @ t(lp["attn"]["qkv"]["kernel"]) + t(lp["attn"]["qkv"]["bias"])
    q, k, v = qkv.chunk(3, dim=-1)
    q = rms(q, t(lp["attn"]["q_norm"]["weight"]))
    k = rms(k, t(lp["attn"]["k_norm"]["weight"]))
    S = q.shape[1]
    q = q.reshape(B, S, H, D).transpose(1, 2)
    k = k.reshape(B, S, H, D).transpose(1, 2)
    v = v.reshape(B, S, H, D).transpose(1, 2)
    attn = torch.softmax((q * D**-0.5) @ k.transpose(-2, -1), dim=-1) @ v
    attn = attn.transpose(1, 2).reshape(B, S, 32)
    attn = attn @ t(lp["attn"]["proj"]["kernel"]) + t(lp["attn"]["proj"]["bias"])
    x = x + attn * t(lp["ls1"])
    h = rms(x, t(lp["norm2"]["weight"]))
    h = h @ t(lp["mlp"]["fc1"]["kernel"]) + t(lp["mlp"]["fc1"]["bias"])
    h = torch.nn.functional.gelu(h)
    h = h @ t(lp["mlp"]["fc2"]["kernel"]) + t(lp["mlp"]["fc2"]["bias"])
    want = (x + h * t(lp["ls2"])).numpy()

    np.testing.assert_allclose(got, want, atol=2e-5)

"""Unit tests for core ops vs independent torch/numpy oracles.

The reference has no tests (SURVEY.md §4); these establish numerical parity of
each primitive against torch CPU implementations of the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mjvideo_tpu.ops.attention import make_attention_bias, multi_head_attention
from mjvideo_tpu.ops.norms import layer_norm, rms_norm
from mjvideo_tpu.ops.pixel_shuffle import pixel_shuffle
from mjvideo_tpu.ops.rope import apply_rope, rope_tables


def test_rms_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 64)).astype(np.float32)
    w = rng.normal(size=(64,)).astype(np.float32) + 1.0

    xt = torch.tensor(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    expected = (torch.tensor(w) * (xt * torch.rsqrt(var + 1e-6))).numpy()

    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 7, 32)).astype(np.float32)
    w = rng.normal(size=(32,)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    expected = torch.nn.functional.layer_norm(
        torch.tensor(x), (32,), torch.tensor(w), torch.tensor(b), eps=1e-6
    ).numpy()
    got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def _torch_rope_tables(seq_len, dim, base=10000.0, scaling_type=None,
                       factor=1.0, max_pos=2048):
    # Independent torch oracle of modeling_internlm2.py:147-229.
    if scaling_type == "dynamic" and seq_len > max_pos:
        base = base * ((factor * seq_len / max_pos) - (factor - 1)) ** (
            dim / (dim - 2)
        )
    inv_freq = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
    t = torch.arange(seq_len).float()
    if scaling_type == "linear":
        t = t / factor
    freqs = torch.einsum("i,j->ij", t, inv_freq)
    emb = torch.cat((freqs, freqs), dim=-1)
    return emb.cos(), emb.sin()


@pytest.mark.parametrize(
    "scaling_type,factor,seq",
    [(None, 1.0, 16), ("linear", 2.0, 16), ("dynamic", 2.0, 64)],
)
def test_rope_tables_match_torch(scaling_type, factor, seq):
    cos, sin = rope_tables(
        seq, 8, base=10000.0, scaling_type=scaling_type,
        scaling_factor=factor, max_position_embeddings=32,
    )
    tcos, tsin = _torch_rope_tables(
        seq, 8, scaling_type=scaling_type, factor=factor, max_pos=32
    )
    np.testing.assert_allclose(np.asarray(cos), tcos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), tsin.numpy(), atol=1e-5)


def test_apply_rope_matches_torch():
    rng = np.random.default_rng(2)
    B, S, H, D = 2, 10, 4, 8
    q = rng.normal(size=(B, S, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, H, D)).astype(np.float32)
    cos, sin = rope_tables(S, D)

    qj, kj = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)

    # torch oracle (apply_rotary_pos_emb with BHSD layout)
    def rotate_half_t(x):
        x1, x2 = x[..., : D // 2], x[..., D // 2:]
        return torch.cat((-x2, x1), dim=-1)

    tc = torch.tensor(np.asarray(cos))[None, :, None, :]
    ts = torch.tensor(np.asarray(sin))[None, :, None, :]
    qt = torch.tensor(q) * tc + rotate_half_t(torch.tensor(q)) * ts
    kt = torch.tensor(k) * tc + rotate_half_t(torch.tensor(k)) * ts
    np.testing.assert_allclose(np.asarray(qj), qt.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kj), kt.numpy(), atol=1e-5)


def _torch_sdpa(q, k, v, bias=None, scale=None):
    # q,k,v: (B, S, H, D) numpy; GQA by head repetition. Oracle of
    # modeling_internlm2.py:393-410 (fp32 softmax eager attention).
    B, Q, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    qt = torch.tensor(q).permute(0, 2, 1, 3)
    kt = torch.tensor(k).permute(0, 2, 1, 3).repeat_interleave(rep, dim=1)
    vt = torch.tensor(v).permute(0, 2, 1, 3).repeat_interleave(rep, dim=1)
    scale = scale or D**-0.5
    logits = qt @ kt.transpose(-2, -1) * scale
    if bias is not None:
        logits = logits + torch.tensor(bias)
    probs = torch.softmax(logits.float(), dim=-1)
    out = probs @ vt.float()
    return out.permute(0, 2, 1, 3).numpy()


def test_attention_full_matches_torch():
    rng = np.random.default_rng(3)
    B, S, H, D = 2, 9, 4, 8
    q = rng.normal(size=(B, S, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, H, D)).astype(np.float32)
    v = rng.normal(size=(B, S, H, D)).astype(np.float32)
    got = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=False
    )
    expected = _torch_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_attention_gqa_causal_padded_matches_torch():
    rng = np.random.default_rng(4)
    B, S, Hq, Hkv, D = 2, 12, 8, 2, 16
    q = rng.normal(size=(B, S, Hq, D)).astype(np.float32)
    k = rng.normal(size=(B, S, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv, D)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, 9:] = 0  # right padding as the reference collator produces
    mask[1, 5:] = 0

    got = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        attention_mask=jnp.asarray(mask), causal=True,
    )
    bias = np.asarray(
        make_attention_bias(jnp.asarray(mask), S, S, causal=True)
    )
    expected = _torch_sdpa(q, k, v, bias=bias)
    # Compare only non-pad query rows (pad rows are don't-care).
    for b in range(B):
        n = int(mask[b].sum())
        np.testing.assert_allclose(
            np.asarray(got)[b, :n], expected[b, :n], atol=1e-5
        )


def test_pixel_shuffle_matches_torch_reference():
    # Torch oracle re-deriving modeling_internvl_chat.py:228-242 (v2 path).
    rng = np.random.default_rng(5)
    n, w, h, c = 3, 8, 8, 16
    x = rng.normal(size=(n, w, h, c)).astype(np.float32)
    s = 0.5
    xt = torch.tensor(x)
    y = xt.view(n, w, int(h * s), int(c / s))
    y = y.permute(0, 2, 1, 3).contiguous()
    y = y.view(n, int(h * s), int(w * s), int(c / (s * s)))
    y = y.permute(0, 2, 1, 3).contiguous()
    got = pixel_shuffle(jnp.asarray(x), scale_factor=s, ps_version="v2")
    np.testing.assert_allclose(np.asarray(got), y.numpy(), atol=0)

    # v1 path omits the final swap-back.
    y1 = xt.view(n, w, int(h * s), int(c / s)).permute(0, 2, 1, 3).contiguous()
    y1 = y1.view(n, int(h * s), int(w * s), int(c / (s * s)))
    got1 = pixel_shuffle(jnp.asarray(x), scale_factor=s, ps_version="v1")
    np.testing.assert_allclose(np.asarray(got1), y1.numpy(), atol=0)


def test_attention_jit_compatible():
    q = jnp.ones((1, 8, 2, 4))
    f = jax.jit(lambda q: multi_head_attention(q, q, q, causal=True))
    assert f(q).shape == (1, 8, 2, 4)

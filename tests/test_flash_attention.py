"""Pallas flash attention vs the XLA einsum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.ops.attention import multi_head_attention
from mjvideo_tpu.ops.flash_attention import flash_attention


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


@pytest.mark.parametrize(
    "B,S,Hq,Hkv,D,causal,masked",
    [
        (2, 67, 4, 2, 64, True, True),    # GQA causal + padding (LLM shape)
        (1, 130, 4, 4, 32, False, True),  # MHA non-causal (ViT shape)
        (2, 35, 8, 2, 16, True, False),   # GQA causal, no padding
    ],
)
def test_flash_matches_xla(B, S, Hq, Hkv, D, causal, masked):
    rng = np.random.default_rng(0)
    q = _rand(rng, (B, S, Hq, D))
    k = _rand(rng, (B, S, Hkv, D))
    v = _rand(rng, (B, S, Hkv, D))
    mask = None
    if masked:
        lens = rng.integers(5, S, size=B)
        mask = jnp.asarray(
            (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
        )
    ref = multi_head_attention(q, k, v, attention_mask=mask, causal=causal,
                               impl="xla")
    got = flash_attention(q, k, v, attention_mask=mask, causal=causal)
    if mask is not None:
        ref = ref * mask[:, :, None, None]
        got = got * mask[:, :, None, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match_xla():
    rng = np.random.default_rng(1)
    q = _rand(rng, (1, 33, 4, 16))
    k = _rand(rng, (1, 33, 2, 16))
    v = _rand(rng, (1, 33, 2, 16))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    g_flash = jax.grad(
        loss(lambda q, k, v: flash_attention(q, k, v, causal=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_xla = jax.grad(
        loss(lambda q, k, v: multi_head_attention(q, k, v, causal=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_flash_fully_masked_rows_are_zero():
    rng = np.random.default_rng(2)
    q = _rand(rng, (1, 16, 2, 8))
    k = _rand(rng, (1, 16, 2, 8))
    v = _rand(rng, (1, 16, 2, 8))
    mask = jnp.zeros((1, 16), jnp.int32)
    out = flash_attention(q, k, v, attention_mask=mask, causal=False)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

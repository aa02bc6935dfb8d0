"""int8 KV cache: quantization bounds, cache-scatter parity, and
token-stream agreement with the dense bf16 cache across all four local
judge families.

The reference has no quantized cache (HF ``past_key_values`` are
model-dtype tuples, ``modeling_internlm2.py:988-1052``); this mode exists
because long-video judge decode is cache-HBM-bound (docs/PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.models import decoder as dec
from mjvideo_tpu.models import internvl
from mjvideo_tpu.models.generate import (
    GenerationConfig,
    decoder_forward_cached,
    generate,
    init_kv_cache,
)
from mjvideo_tpu.ops.quant import dequantize_kv, quantize_kv

from test_batched_generate import (  # noqa: F401  (fixtures)
    _cog_item,
    _minicpm_item,
    _qwen_item,
    cog_tiny,
    minicpm_tiny,
    qwen_tiny,
)


def test_quantize_kv_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(3, 5, 4, 16)) * rng.lognormal(0, 2)).astype(
        np.float32)
    q, s = quantize_kv(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == x.shape[:-1]
    deq = np.asarray(dequantize_kv(q, s, jnp.float32))
    # Symmetric rounding: error <= scale/2 per element, scale = amax/127.
    bound = np.abs(x).max(axis=-1, keepdims=True) / 127.0 * 0.5 + 1e-6
    assert (np.abs(deq - x) <= bound).all()


def test_quantize_kv_zero_vector_is_safe():
    q, s = quantize_kv(jnp.zeros((2, 3, 8)))
    assert np.asarray(q).max() == 0
    assert np.isfinite(np.asarray(s)).all()


@pytest.fixture(scope="module")
def chat():
    cfg = tiny_test_config()
    params = internvl.init_chat_params(jax.random.PRNGKey(1), cfg.chat,
                                       with_lm_head=True)
    return cfg, params


def test_prefill_quant_cache_matches_dense(chat):
    cfg, params = chat
    lm, llm = params["language_model"], cfg.chat.llm
    rng = np.random.default_rng(0)
    T, extra = 7, 5
    ids = rng.integers(1, 50, size=(1, T)).astype(np.int32)
    emb = dec.embed_tokens(lm, jnp.asarray(ids))
    slots = jnp.arange(T)[None]
    mask = jnp.pad(jnp.ones((1, T), jnp.int32), ((0, 0), (0, extra)))

    h_d, c_d = decoder_forward_cached(
        lm, llm, emb, init_kv_cache(llm, 1, T + extra, dtype=jnp.float32),
        slots, mask)
    h_q, c_q = decoder_forward_cached(
        lm, llm, emb, init_kv_cache(llm, 1, T + extra, quant=True),
        slots, mask)

    assert c_q.k.dtype == jnp.int8 and c_q.k_scale.dtype == jnp.float32
    # Dequantized cache entries track the dense cache per slot.
    deq_k = np.asarray(dequantize_kv(c_q.k, c_q.k_scale, jnp.float32))
    dense_k = np.asarray(c_d.k, np.float32)
    assert np.abs(deq_k - dense_k).max() <= \
        np.abs(dense_k).max() / 127.0 * 0.51 + 1e-6
    # Pad slots stay empty in both representations.
    assert np.abs(np.asarray(c_q.k[:, :, T:], np.float32)).max() == 0
    assert np.abs(np.asarray(c_q.k_scale[:, :, T:])).max() == 0
    # Hidden states drift only by accumulated rounding.
    rel = np.linalg.norm(np.asarray(h_q - h_d)) / np.linalg.norm(
        np.asarray(h_d))
    assert rel < 2e-2, rel


def test_internvl_generate_kv_quant_matches_dense_tokens(chat):
    cfg, params = chat
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 50, size=(2, 9)).astype(np.int32)
    # Left-pad one row: quantized pad-slot masking must match dense.
    am = np.ones_like(ids)
    ids[1, :2], am[1, :2] = 0, 0
    gc = GenerationConfig(max_new_tokens=8, eos_token_id=-1, pad_token_id=0)
    out_d = generate(params, cfg.chat, jnp.asarray(ids), jnp.asarray(am),
                     generation_config=gc)
    out_q = generate(params, cfg.chat, jnp.asarray(ids), jnp.asarray(am),
                     generation_config=gc._replace(kv_quant=True))
    assert np.array_equal(np.asarray(out_d), np.asarray(out_q))


def test_stream_generate_kv_quant(chat):
    from mjvideo_tpu.models.generate import stream_generate

    cfg, params = chat
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 50, size=(1, 6)).astype(np.int32)
    am = np.ones_like(ids)
    gc = GenerationConfig(max_new_tokens=5, eos_token_id=-1, pad_token_id=0)
    dense = list(stream_generate(params, cfg.chat, jnp.asarray(ids),
                                 jnp.asarray(am), generation_config=gc))
    quant = list(stream_generate(
        params, cfg.chat, jnp.asarray(ids), jnp.asarray(am),
        generation_config=gc._replace(kv_quant=True)))
    assert dense == quant


def test_qwen2vl_kv_quant_matches_dense_tokens(qwen_tiny):
    from mjvideo_tpu.models.qwen2vl import greedy_generate_batch

    cfg, params = qwen_tiny
    rng = np.random.default_rng(0)
    items = [_qwen_item(cfg, rng, (2, 4, 4), [7, 8, 9]),
             _qwen_item(cfg, rng, (2, 4, 4), [9, 8, 7, 6, 5])]
    dense = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                  eos_token_id=-1, attn_impl="xla")
    quant = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                  eos_token_id=-1, attn_impl="xla",
                                  kv_quant=True)
    assert quant == dense


def test_minicpmv_kv_quant_matches_dense_tokens(minicpm_tiny):
    from mjvideo_tpu.models.minicpmv import greedy_generate_batch

    cfg, params = minicpm_tiny
    rng = np.random.default_rng(0)
    items = [_minicpm_item(cfg, rng, 2, [7, 8, 9]),
             _minicpm_item(cfg, rng, 2, [9, 8])]
    dense = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                  eos_token_id=-1)
    quant = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                  eos_token_id=-1, kv_quant=True)
    assert quant == dense


def test_cogvlm2_kv_quant_matches_dense_tokens(cog_tiny):
    from mjvideo_tpu.models.cogvlm2 import greedy_generate_batch

    cfg, params = cog_tiny
    rng = np.random.default_rng(0)
    items = [_cog_item(cfg, rng, 2, [7, 8, 9]),
             _cog_item(cfg, rng, 2, [9, 8, 7, 6])]
    dense = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                  eos_token_id=-1)
    quant = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                  eos_token_id=-1, kv_quant=True)
    assert quant == dense


def test_judge_kv_quant_wiring(chat, tmp_path):
    """The InternVL judge threads ``kv_quant`` into its GenerationConfig."""
    from mjvideo_tpu.eval.judges import InternVLJudge

    cfg, params = chat

    class _Tok:
        def decode(self, toks):
            return "ok"

    j = InternVLJudge(cfg.chat, params, _Tok(), kv_quant=True)
    assert j._gc().kv_quant is True
    assert InternVLJudge(cfg.chat, params, _Tok())._gc().kv_quant is False


# ---------------------------------------------------------- flash prefill

def test_flash_prefill_matches_xla_cached(chat):
    """Cached generation with ``attn_impl="flash"`` (empty-cache prefill
    through the Pallas kernel, interpret mode off-TPU) must reproduce the
    cache-windowed XLA path's tokens, incl. a left-padded row."""
    cfg, params = chat
    rng = np.random.default_rng(4)
    ids = rng.integers(1, 50, size=(2, 8)).astype(np.int32)
    am = np.ones_like(ids)
    ids[1, :2], am[1, :2] = 0, 0
    gc = GenerationConfig(max_new_tokens=5, eos_token_id=-1, pad_token_id=0)
    out_x = generate(params, cfg.chat, jnp.asarray(ids), jnp.asarray(am),
                     generation_config=gc, attn_impl="xla")
    out_f = generate(params, cfg.chat, jnp.asarray(ids), jnp.asarray(am),
                     generation_config=gc, attn_impl="flash")
    assert np.array_equal(np.asarray(out_x), np.asarray(out_f))


def test_flash_prefill_hidden_matches_cache_window(chat):
    """Prefill hidden states: fresh-token flash == whole-cache XLA bias."""
    cfg, params = chat
    lm, llm = params["language_model"], cfg.chat.llm
    rng = np.random.default_rng(5)
    T, extra = 8, 4
    ids = rng.integers(1, 50, size=(1, T)).astype(np.int32)
    emb = dec.embed_tokens(lm, jnp.asarray(ids))
    slots = jnp.arange(T)[None]
    mask = jnp.pad(jnp.ones((1, T), jnp.int32), ((0, 0), (0, extra)))
    h_x, c_x = decoder_forward_cached(
        lm, llm, emb, init_kv_cache(llm, 1, T + extra, dtype=jnp.float32),
        slots, mask, attn_impl="xla")
    h_f, c_f = decoder_forward_cached(
        lm, llm, emb, init_kv_cache(llm, 1, T + extra, dtype=jnp.float32),
        slots, mask, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_x),
                               atol=2e-5, rtol=1e-5)
    # The cache write is identical regardless of the attention backend.
    np.testing.assert_allclose(np.asarray(c_f.k), np.asarray(c_x.k),
                               atol=1e-6)


def test_cogvlm2_flash_prefill_matches_xla(cog_tiny):
    from mjvideo_tpu.models.cogvlm2 import greedy_generate_batch

    cfg, params = cog_tiny
    rng = np.random.default_rng(1)
    items = [_cog_item(cfg, rng, 2, [7, 8, 9]),
             _cog_item(cfg, rng, 2, [9, 8, 7, 6])]
    out_x = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                  eos_token_id=-1, attn_impl="xla")
    out_f = greedy_generate_batch(params, cfg, items, max_new_tokens=4,
                                  eos_token_id=-1, attn_impl="flash")
    assert out_x == out_f


def test_internvl_judge_ask_e2e_kv_quant(chat, tmp_path):
    """Full judge path on a real (synthetic) video: decode frames ->
    vision embeds -> chat generation, with the int8 cache vs bf16 —
    identical answer strings at tiny dims."""
    import cv2

    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.judges import InternVLJudge

    cfg, params = chat
    video = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (48, 48))
    rng = np.random.default_rng(0)
    for _ in range(16):
        w.write(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    w.release()

    tok = ByteTokenizer()
    answers = [
        InternVLJudge(cfg.chat, params, tok, num_segments=2,
                      max_new_tokens=6, kv_quant=kvq).ask(
            "Rate this video.", str(video))
        for kvq in (False, True)
    ]
    assert isinstance(answers[0], str) and answers[0] == answers[1]

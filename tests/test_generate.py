"""KV-cache decode must match the uncached full forward numerically."""

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


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return internvl.init_chat_params(
        jax.random.PRNGKey(1), cfg.chat, with_lm_head=True
    )


def _full_logits(params, cfg, ids_row):
    """Oracle: uncached full forward -> last-token logits."""
    lm = params["language_model"]
    x = dec.embed_tokens(lm, jnp.asarray([ids_row], jnp.int32))
    h = dec.decoder_forward(lm, cfg.chat.llm, x, remat=False)
    return dec.lm_logits(lm, h[:, -1])[0]


def test_prefill_hidden_matches_uncached(cfg, params):
    rng = np.random.default_rng(0)
    T, extra = 7, 5
    ids = rng.integers(1, 50, size=(1, T)).astype(np.int32)
    lm = params["language_model"]
    llm = cfg.chat.llm

    emb = dec.embed_tokens(lm, jnp.asarray(ids))
    cache = init_kv_cache(llm, 1, T + extra, dtype=jnp.float32)
    slots = jnp.arange(T)[None]
    mask = jnp.pad(jnp.ones((1, T), jnp.int32), ((0, 0), (0, extra)))
    hidden_c, cache = decoder_forward_cached(lm, llm, emb, cache, slots, mask)

    hidden_u = dec.decoder_forward(lm, llm, emb, remat=False)
    np.testing.assert_allclose(
        np.asarray(hidden_c), np.asarray(hidden_u), atol=1e-5
    )


def test_single_step_decode_logits_match_full_forward(cfg, params):
    """Prefill T tokens, decode one: logits == full (T+1)-token forward."""
    rng = np.random.default_rng(1)
    T, extra = 6, 4
    ids = rng.integers(1, 50, size=T).astype(np.int32)
    nxt = int(rng.integers(1, 50))
    lm = params["language_model"]
    llm = cfg.chat.llm

    emb = dec.embed_tokens(lm, jnp.asarray(ids[None]))
    cache = init_kv_cache(llm, 1, T + extra, dtype=jnp.float32)
    mask = jnp.pad(jnp.ones((1, T), jnp.int32), ((0, 0), (0, extra)))
    _, cache = decoder_forward_cached(
        lm, llm, emb, cache, jnp.arange(T)[None], mask
    )
    # decode the next token at slot/position T
    emb1 = dec.embed_tokens(lm, jnp.asarray([[nxt]], jnp.int32))
    mask = mask.at[:, T].set(1)
    h, _ = decoder_forward_cached(
        lm, llm, emb1, cache, jnp.asarray([[T]]), mask
    )
    got = dec.lm_logits(lm, h[:, 0])[0]

    want = _full_logits(params, cfg, list(ids) + [nxt])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_generate_greedy_first_tokens_match_oracle(cfg, params):
    """First generated token (largest margin) must match the uncached argmax;
    the full sequence must be reproducible (determinism)."""
    rng = np.random.default_rng(0)
    T, n_new = 7, 6
    ids = rng.integers(1, 50, size=(1, T)).astype(np.int32)
    mask = np.ones((1, T), np.int32)
    gc = GenerationConfig(max_new_tokens=n_new, eos_token_id=-1,
                          temperature=0.0, pad_token_id=0)
    got1 = np.asarray(generate(params, cfg.chat, jnp.asarray(ids),
                               jnp.asarray(mask), generation_config=gc)[0])
    got2 = np.asarray(generate(params, cfg.chat, jnp.asarray(ids),
                               jnp.asarray(mask), generation_config=gc)[0])
    np.testing.assert_array_equal(got1, got2)
    want0 = int(jnp.argmax(_full_logits(params, cfg, ids[0])))
    assert got1[0] == want0


def test_generate_stops_at_eos_and_pads(cfg, params):
    rng = np.random.default_rng(1)
    T, n_new = 5, 8
    ids = rng.integers(1, 50, size=(1, T)).astype(np.int32)
    mask = np.ones((1, T), np.int32)
    first = int(jnp.argmax(_full_logits(params, cfg, ids[0])))
    out = generate(
        params, cfg.chat, jnp.asarray(ids), jnp.asarray(mask),
        generation_config=GenerationConfig(
            max_new_tokens=n_new, eos_token_id=first, temperature=0.0,
            pad_token_id=0,
        ),
    )
    arr = np.asarray(out[0])
    assert arr[0] == first
    np.testing.assert_array_equal(arr[1:], 0)  # padded after EOS


def test_batched_left_padding_matches_single_row(cfg, params):
    """A left-padded row's first generated token matches its solo run."""
    rng = np.random.default_rng(2)
    ids_a = rng.integers(1, 50, size=6).astype(np.int32)
    ids_b = rng.integers(1, 50, size=4).astype(np.int32)
    T = 6
    ids = np.zeros((2, T), np.int32)
    mask = np.zeros((2, T), np.int32)
    ids[0], mask[0] = ids_a, 1
    ids[1, T - 4:], mask[1, T - 4:] = ids_b, 1

    gc = GenerationConfig(max_new_tokens=2, eos_token_id=-1,
                          temperature=0.0, pad_token_id=0)
    out = np.asarray(generate(params, cfg.chat, jnp.asarray(ids),
                              jnp.asarray(mask), generation_config=gc))
    assert out[0, 0] == int(jnp.argmax(_full_logits(params, cfg, ids_a)))
    assert out[1, 0] == int(jnp.argmax(_full_logits(params, cfg, ids_b)))


def _greedy_oracle(params, cfg, ids_row, n_new):
    """Uncached greedy rollout: full forward over the growing sequence."""
    toks = [int(t) for t in ids_row]
    out = []
    for _ in range(n_new):
        nxt = int(jnp.argmax(_full_logits(params, cfg, toks)))
        out.append(nxt)
        toks.append(nxt)
    return out


def test_generate_full_sequence_matches_uncached_rollout(cfg, params):
    """EVERY generated token (not just the prefill one) must match the
    uncached oracle — regression for the decode-loop slot/position bug where
    steps >= 1 attended a never-written zero K/V slot."""
    rng = np.random.default_rng(3)
    T, n_new = 7, 5
    ids = rng.integers(1, 50, size=(1, T)).astype(np.int32)
    mask = np.ones((1, T), np.int32)
    gc = GenerationConfig(max_new_tokens=n_new, eos_token_id=-1,
                          temperature=0.0, pad_token_id=0)
    got = np.asarray(generate(params, cfg.chat, jnp.asarray(ids),
                              jnp.asarray(mask), generation_config=gc)[0])
    want = _greedy_oracle(params, cfg, ids[0], n_new)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("side", ["left", "right"])
def test_generate_padded_batch_full_sequence(cfg, params, side):
    """Full sequences of a padded batch match each row's solo oracle, for
    both padding layouts (right padding reuses pad cache slots)."""
    rng = np.random.default_rng(4)
    lens, T, n_new = [6, 3], 6, 4
    rows = [rng.integers(1, 50, size=L).astype(np.int32) for L in lens]
    ids = np.zeros((2, T), np.int32)
    mask = np.zeros((2, T), np.int32)
    for i, row in enumerate(rows):
        L = len(row)
        sl = slice(T - L, T) if side == "left" else slice(0, L)
        ids[i, sl], mask[i, sl] = row, 1

    gc = GenerationConfig(max_new_tokens=n_new, eos_token_id=-1,
                          temperature=0.0, pad_token_id=0)
    out = np.asarray(generate(params, cfg.chat, jnp.asarray(ids),
                              jnp.asarray(mask), generation_config=gc))
    for i, row in enumerate(rows):
        np.testing.assert_array_equal(
            out[i], _greedy_oracle(params, cfg, row, n_new),
            err_msg=f"{side}-padded row {i}",
        )


def test_batch_chat_runs(cfg, params):
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.models.generate import GenerationConfig, batch_chat

    tok = ByteTokenizer()
    out = batch_chat(
        params, cfg.chat, tok, ["hi", "a longer question here"],
        generation_config=GenerationConfig(max_new_tokens=4, temperature=0.0),
    )
    assert len(out) == 2
    assert all(isinstance(r, str) for r in out)


def test_sequence_classifier(cfg, params):
    from mjvideo_tpu.models.decoder import (
        init_sequence_classifier,
        sequence_classify,
    )

    llm = cfg.chat.llm
    head = init_sequence_classifier(jax.random.PRNGKey(0), llm, num_labels=3)
    ids = np.asarray([[5, 6, 7, llm.pad_token_id, llm.pad_token_id]],
                     np.int32)
    lm = params["language_model"]
    import mjvideo_tpu.models.decoder as dec

    emb = dec.embed_tokens(lm, jnp.asarray(ids))
    logits = sequence_classify(lm, head, llm, emb, jnp.asarray(ids))
    assert logits.shape == (1, 3)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_stream_chat_matches_chat(cfg, params):
    """Streamed tokens must equal the one-shot chat() response."""
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.models.generate import (
        GenerationConfig,
        chat,
        stream_chat,
    )

    tok = ByteTokenizer()
    gc = GenerationConfig(max_new_tokens=5, temperature=0.0)
    want, _ = chat(params, cfg.chat, tok, "hello", generation_config=gc)

    partials = list(stream_chat(params, cfg.chat, tok, "hello",
                                generation_config=gc))
    assert partials, "stream yielded nothing"
    # each partial extends the previous; the last equals the full response
    for a, b in zip(partials, partials[1:]):
        assert b.startswith(a[:len(a)])
    assert partials[-1] == want


def test_greedy_decode_eos_and_count_semantics():
    """greedy_decode: the EOS token is included in the output and stops
    the loop; without EOS the loop runs to max_new_tokens."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mjvideo_tpu.models.generate import greedy_decode

    # scripted 'model': logits force the token sequence 5, 7, 2(eos), 9...
    script = jnp.asarray([7, 2, 9, 9], jnp.int32)

    def step(params, tok, i, cache):
        nxt = script[jnp.minimum(i, script.shape[0] - 1)]
        logits = jax.nn.one_hot(nxt, 16)[None] * 100.0
        return logits, cache

    @jax.jit
    def run(logits0):
        return greedy_decode(step, None, logits0, jnp.zeros((1,)), 6, eos=2)

    first = jax.nn.one_hot(jnp.asarray(5), 16)[None] * 100.0
    toks, n = run(first)
    toks = np.asarray(toks)[: int(n)].tolist()
    assert toks == [5, 7, 2]  # eos included, loop stopped

    # eos fires immediately on the first (prefill) token
    toks, n = run(jax.nn.one_hot(jnp.asarray(2), 16)[None] * 100.0)
    assert np.asarray(toks)[: int(n)].tolist() == [2]

    # no eos in script -> runs to max_new_tokens
    @jax.jit
    def run_noeos(logits0):
        return greedy_decode(step, None, logits0, jnp.zeros((1,)), 3,
                             eos=-1)

    toks, n = run_noeos(first)
    assert int(n) == 3 and np.asarray(toks)[:3].tolist() == [5, 7, 2]


def test_top_k_sampling_restricts_support(cfg, params):
    """top_k masks everything below the k-th logit; with k=1 sampling
    degenerates to greedy regardless of temperature."""
    from mjvideo_tpu.models.generate import GenerationConfig, _sample

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    k1 = GenerationConfig(temperature=1.0, top_k=1)
    for seed in range(3):
        toks = np.asarray(_sample(logits, k1, jax.random.PRNGKey(seed)))
        np.testing.assert_array_equal(toks, greedy)
    # k=8: every sample stays inside the top-8 set
    k8 = GenerationConfig(temperature=1.0, top_k=8)
    top8 = np.argsort(np.asarray(logits), axis=-1)[:, -8:]
    for seed in range(5):
        toks = np.asarray(_sample(logits, k8, jax.random.PRNGKey(seed)))
        assert all(t in row for t, row in zip(toks, top8))
    # generation path smoke: top_k composes with top_p under jit
    ids = rng.integers(1, 50, size=(1, 6)).astype(np.int32)
    out = generate(params, cfg.chat, jnp.asarray(ids),
                   jnp.asarray(np.ones_like(ids)),
                   generation_config=GenerationConfig(
                       max_new_tokens=4, eos_token_id=-1, pad_token_id=0,
                       temperature=0.8, top_k=50, top_p=0.9))
    assert np.asarray(out).shape == (1, 4)

"""Prefix KV caching: suffix-only generation must be exact vs the full
prompt, and the InternVL judge's rubric loop must produce identical
answers with and without the cached prefix (incl. the guarded fallbacks).

The reference re-runs the full prompt for each of the ~34 rubric
questions per video (swift ``inference`` per call); prefix caching is
capability on top — exactness is the bar.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.models.generate import (
    GenerationConfig,
    generate,
    generate_from_prefix,
    prefill_prefix,
    stack_prefix_states,
)
from mjvideo_tpu.models.internvl import init_chat_params


@pytest.fixture(scope="module")
def chat():
    cfg = tiny_test_config()
    params = init_chat_params(jax.random.PRNGKey(1), cfg.chat,
                              with_lm_head=True)
    return cfg, params


@pytest.mark.parametrize("kv_quant", [False, True])
def test_split_prefill_matches_full_prompt(chat, kv_quant):
    """prefix prefill + suffix continuation == one full-prompt generate,
    with bucketed (right-padded) prefix AND suffix."""
    cfg, params = chat
    ch = cfg.chat
    rng = np.random.default_rng(0)
    full = rng.integers(1, 50, size=(1, 14)).astype(np.int32)
    am = np.ones_like(full)
    gc = GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0,
                          kv_quant=kv_quant)
    ref = np.asarray(generate(params, ch, jnp.asarray(full),
                              jnp.asarray(am), generation_config=gc))

    P = 9
    pre = np.pad(full[:, :P], ((0, 0), (0, 1)))  # bucket 9 -> 10
    pam = np.pad(am[:, :P], ((0, 0), (0, 1)))
    suf = np.pad(full[:, P:], ((0, 0), (0, 2)))  # bucket 5 -> 7
    sam = np.pad(am[:, P:], ((0, 0), (0, 2)))
    st = prefill_prefix(params, ch, jnp.asarray(pre), jnp.asarray(pam),
                        max_len=10 + 7 + gc.max_new_tokens,
                        kv_quant=kv_quant)
    out = np.asarray(generate_from_prefix(
        params, ch, st, jnp.asarray(suf), jnp.asarray(sam),
        generation_config=gc))
    assert np.array_equal(ref, out)


def test_stacked_prefix_pair_matches_per_row(chat):
    """judge_pair's shape: two videos' B=1 prefix states stacked, one
    shared question suffix — rows must equal their standalone decodes."""
    cfg, params = chat
    ch = cfg.chat
    rng = np.random.default_rng(1)
    gc = GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0)
    fulls = [rng.integers(1, 50, size=(1, 14)).astype(np.int32)
             for _ in range(2)]
    # shared suffix (same question), different prefixes (the videos)
    fulls[1][:, 9:] = fulls[0][:, 9:]
    refs, states = [], []
    for f in fulls:
        am = np.ones_like(f)
        refs.append(np.asarray(generate(params, ch, jnp.asarray(f),
                                        jnp.asarray(am),
                                        generation_config=gc)))
        pre = np.pad(f[:, :9], ((0, 0), (0, 1)))
        pam = np.pad(am[:, :9], ((0, 0), (0, 1)))
        states.append(prefill_prefix(
            params, ch, jnp.asarray(pre), jnp.asarray(pam),
            max_len=10 + 7 + gc.max_new_tokens))
    st = stack_prefix_states(states)
    suf = np.concatenate([np.pad(f[:, 9:], ((0, 0), (0, 2)))
                          for f in fulls])
    sam = np.tile(np.pad(np.ones((1, 5), np.int32), ((0, 0), (0, 2))),
                  (2, 1))
    out = np.asarray(generate_from_prefix(
        params, ch, st, jnp.asarray(suf), jnp.asarray(sam),
        generation_config=gc))
    assert np.array_equal(out[0:1], refs[0])
    assert np.array_equal(out[1:2], refs[1])


# ------------------------------------------------------- judge integration

def _write_video(path, seed, frames=12, size=48):
    import cv2

    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (size, size))
    rng = np.random.default_rng(seed)
    for _ in range(frames):
        w.write(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    w.release()


@pytest.fixture(scope="module")
def judge_setup(chat, tmp_path_factory):
    from mjvideo_tpu.data.prompts import ByteTokenizer

    cfg, params = chat
    root = tmp_path_factory.mktemp("vids")
    v1, v2 = root / "a.mp4", root / "b.mp4"
    _write_video(v1, 0)
    _write_video(v2, 1)
    return cfg, params, ByteTokenizer(), str(v1), str(v2)


def _mk(judge_setup, **kw):
    from mjvideo_tpu.eval.judges import InternVLJudge

    cfg, params, tok, v1, v2 = judge_setup
    return InternVLJudge(cfg.chat, params, tok, num_segments=2,
                         max_new_tokens=6, **kw), v1, v2


def test_judge_ask_prefix_cached_matches_full(judge_setup):
    j_on, v1, _ = _mk(judge_setup, prefix_cache=True)
    j_off, _, _ = _mk(judge_setup, prefix_cache=False)
    for q in ("Rate the coherence.", "Rate the alignment of this video."):
        assert j_on.ask(q, v1) == j_off.ask(q, v1)
    # second question reused the cached prefix state
    assert j_on._pstate.cache_info().hits >= 1


def test_judge_ask_batch_prefix_cached_matches_full(judge_setup):
    j_on, v1, v2 = _mk(judge_setup, prefix_cache=True)
    j_off, _, _ = _mk(judge_setup, prefix_cache=False)
    q = "Which is better?"
    assert j_on.ask_batch(q, [v1, v2]) == j_off.ask_batch(q, [v1, v2])


def test_judge_prefix_fallback_when_suffix_exceeds_bucket(judge_setup):
    j_tiny, v1, _ = _mk(judge_setup, prefix_cache=True, suffix_bucket=4)
    j_off, _, _ = _mk(judge_setup, prefix_cache=False)
    q = "A question much longer than four tokens for certain."
    assert j_tiny._ask_prefix(q, [v1]) is None  # guard triggers
    assert j_tiny.ask(q, v1) == j_off.ask(q, v1)  # fallback exact


# --------------------------------------------------------------- qwen2vl

def test_qwen2vl_prefix_suffix_split_is_the_full_prompt():
    from test_batched_generate import qwen_tiny as _qt  # noqa: F811

    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.models.qwen2vl import (
        build_video_prompt_ids,
        build_video_prompt_prefix_suffix,
    )

    cfg, _ = _qt.__wrapped__()
    tok = ByteTokenizer()
    grid = (2, 4, 4)
    pre, suf = build_video_prompt_prefix_suffix(tok, cfg, grid, "Rate it.")
    full = build_video_prompt_ids(tok, cfg, grid, "Rate it.")
    assert pre + suf == [int(t) for t in full[0]]
    # the prefix is question-independent
    pre2, _ = build_video_prompt_prefix_suffix(tok, cfg, grid, "Other?")
    assert pre2 == pre


@pytest.mark.parametrize("kv_quant", [False, True])
def test_qwen2vl_judge_prefix_matches_full(tmp_path, kv_quant):
    from test_batched_generate import qwen_tiny as _qt  # noqa: F811

    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.judges import Qwen2VLJudge

    cfg, params = _qt.__wrapped__()
    v1, v2 = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_video(v1, 0, size=32)
    _write_video(v2, 1, size=32)
    kw = dict(num_segments=2, max_new_tokens=5, attn_impl="xla",
              kv_quant=kv_quant, max_pixels=32 * 32)
    j_on = Qwen2VLJudge(cfg, params, ByteTokenizer(), prefix_cache=True,
                        **kw)
    j_off = Qwen2VLJudge(cfg, params, ByteTokenizer(), prefix_cache=False,
                         **kw)
    for q in ("Rate the coherence.", "Rate the alignment."):
        assert j_on.ask(q, str(v1)) == j_off.ask(q, str(v1))
    assert j_on.ask_batch("Which wins?", [str(v1), str(v2)]) == \
        j_off.ask_batch("Which wins?", [str(v1), str(v2)])
    assert j_on._pstate.cache_info().hits >= 1


# ----------------------------------------------------- minicpmv / cogvlm2

def test_minicpmv_prefix_suffix_split_is_the_full_prompt():
    from test_batched_generate import minicpm_tiny as _mt  # noqa: F811

    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.models.minicpmv import (
        build_video_prompt_ids,
        build_video_prompt_prefix_suffix,
    )

    cfg, _ = _mt.__wrapped__()
    tok = ByteTokenizer()
    pre, suf = build_video_prompt_prefix_suffix(tok, cfg, 2, "Rate it.")
    full = build_video_prompt_ids(tok, cfg, 2, "Rate it.")
    assert pre + suf == [int(t) for t in full[0]]
    assert build_video_prompt_prefix_suffix(tok, cfg, 2, "Other?")[0] == pre


def test_cogvlm2_prefix_suffix_split_is_the_full_prompt():
    from test_batched_generate import cog_tiny as _ct  # noqa: F811

    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.models.cogvlm2 import (
        build_video_prompt_ids,
        build_video_prompt_prefix_suffix,
    )

    cfg, _ = _ct.__wrapped__()
    tok = ByteTokenizer()
    pre, suf = build_video_prompt_prefix_suffix(tok, cfg, 2, "Rate it.")
    ids, tt = build_video_prompt_ids(tok, cfg, 2, "Rate it.")
    assert pre + suf == [int(t) for t in ids[0]]
    # token types: prefix = [LANG] + VISION block, suffix all LANG
    assert list(tt[0][: len(pre)]) == [0] + [1] * (len(pre) - 1)
    assert all(t == 0 for t in tt[0][len(pre):])


def test_minicpmv_judge_prefix_matches_full(tmp_path):
    from test_batched_generate import minicpm_tiny as _mt  # noqa: F811

    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.judges import MiniCPMVJudge

    cfg, params = _mt.__wrapped__()
    v1, v2 = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_video(v1, 0, size=56)
    _write_video(v2, 1, size=56)
    kw = dict(num_segments=2, max_new_tokens=5, attn_impl="xla")
    j_on = MiniCPMVJudge(cfg, params, ByteTokenizer(), prefix_cache=True,
                         **kw)
    j_off = MiniCPMVJudge(cfg, params, ByteTokenizer(),
                          prefix_cache=False, **kw)
    for q in ("Rate the coherence.", "Rate the alignment."):
        assert j_on.ask(q, str(v1)) == j_off.ask(q, str(v1))
    assert j_on.ask_batch("Which wins?", [str(v1), str(v2)]) == \
        j_off.ask_batch("Which wins?", [str(v1), str(v2)])
    assert j_on._pstate.cache_info().hits >= 1


def test_cogvlm2_judge_prefix_matches_full(tmp_path):
    from test_batched_generate import cog_tiny as _ct  # noqa: F811

    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.judges import CogVLM2Judge

    cfg, params = _ct.__wrapped__()
    v1, v2 = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_video(v1, 0, size=28)
    _write_video(v2, 1, size=28)
    kw = dict(num_segments=2, max_new_tokens=5, attn_impl="xla")
    j_on = CogVLM2Judge(cfg, params, ByteTokenizer(), prefix_cache=True,
                        **kw)
    j_off = CogVLM2Judge(cfg, params, ByteTokenizer(), prefix_cache=False,
                         **kw)
    for q in ("Rate the coherence.", "Rate the alignment."):
        assert j_on.ask(q, str(v1)) == j_off.ask(q, str(v1))
    assert j_on.ask_batch("Which wins?", [str(v1), str(v2)]) == \
        j_off.ask_batch("Which wins?", [str(v1), str(v2)])
    assert j_on._pstate.cache_info().hits >= 1


# ------------------------------------------------------------ ChatSession

def test_chat_session_matches_chat_with_history(chat):
    """Multi-turn session (suffix continuation over one persistent cache)
    must reproduce chat()'s re-prefill-everything answers turn by turn,
    including a vision first turn."""
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.models.generate import (
        ChatSession,
        GenerationConfig,
        chat as chat_fn,
    )

    cfg, params = chat
    tok = ByteTokenizer()
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(
        size=(1, cfg.chat.image_size, cfg.chat.image_size, 3)
    ).astype(np.float32))
    gc = GenerationConfig(max_new_tokens=6, temperature=0.0)
    questions = ["<image>\nDescribe the image.", "Why?", "Anything else?"]

    sess = ChatSession(params, cfg.chat, tok, max_len=512,
                       generation_config=gc, attn_impl="xla")
    hist = None
    for i, q in enumerate(questions):
        ref, hist = chat_fn(params, cfg.chat, tok, q,
                            pixel_values=pix if i == 0 else None,
                            num_patches_list=[1] if i == 0 else None,
                            history=hist, generation_config=gc,
                            attn_impl="xla")
        got = sess.ask(q, pixel_values=pix if i == 0 else None,
                       num_patches_list=[1] if i == 0 else None)
        assert got == ref, (i, got, ref)
    assert len(sess.history) == 3


def test_chat_session_capacity_guard(chat):
    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.models.generate import ChatSession, GenerationConfig

    cfg, params = chat
    sess = ChatSession(params, cfg.chat, ByteTokenizer(), max_len=64,
                       generation_config=GenerationConfig(max_new_tokens=6),
                       attn_impl="xla")
    with pytest.raises(ValueError, match="max_len"):
        sess.ask("a question far too long for a sixty-four slot cache "
                 "to ever hold together with its decode budget")


def test_flash_suffix_continuation_matches_full_flash_prefill(chat):
    """VERDICT r3 next-5: the suffix continuation through the FLASH kernel
    (q_offset = per-row n_prefix over the whole cache) must reproduce the
    full-prompt flash decode token-for-token — kernel choice can no longer
    flip a greedy tie between prefix-cached and full-prompt paths.  Rows
    get DIFFERENT real prefix lengths to exercise per-row q_offset."""
    cfg, params = chat
    ch = cfg.chat
    rng = np.random.default_rng(3)
    gc = GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0)

    reals = (8, 9)  # per-row real prefix lengths within the same bucket
    suffix_toks = rng.integers(1, 50, size=(5,)).astype(np.int32)
    refs, states = [], []
    for r in reals:
        full = np.concatenate([
            rng.integers(1, 50, size=(1, r)).astype(np.int32),
            suffix_toks[None]], axis=1)
        am = np.ones_like(full)
        # full-prompt reference THROUGH THE FLASH PREFILL (interpret mode
        # on CPU) — the path a TPU full-prompt decode takes
        refs.append(np.asarray(generate(
            params, ch, jnp.asarray(full), jnp.asarray(am),
            generation_config=gc, attn_impl="flash")))
        pre = np.zeros((1, 10), np.int32)
        pre[0, :r] = full[0, :r]
        pam = np.zeros((1, 10), np.int32)
        pam[0, :r] = 1
        states.append(prefill_prefix(
            params, ch, jnp.asarray(pre), jnp.asarray(pam),
            max_len=10 + 7 + gc.max_new_tokens, attn_impl="flash"))
    st = stack_prefix_states(states)
    assert int(st.n_prefix[0]) != int(st.n_prefix[1])  # per-row offsets
    suf = np.tile(np.pad(suffix_toks[None], ((0, 0), (0, 2))), (2, 1))
    sam = np.tile(np.pad(np.ones((1, 5), np.int32), ((0, 0), (0, 2))),
                  (2, 1))
    out = np.asarray(generate_from_prefix(
        params, ch, st, jnp.asarray(suf), jnp.asarray(sam),
        generation_config=gc, attn_impl="flash"))
    assert np.array_equal(out[0:1], refs[0])
    assert np.array_equal(out[1:2], refs[1])


def test_qwen2vl_judge_prefix_flash_matches_full(tmp_path):
    """Family wiring: the Qwen2-VL judge's suffix executable under
    attn_impl='flash' (the TPU serving default via 'auto') must answer
    identically to the uncached full-prompt judge."""
    from test_batched_generate import qwen_tiny as _qt  # noqa: F811

    from mjvideo_tpu.data.prompts import ByteTokenizer
    from mjvideo_tpu.eval.judges import Qwen2VLJudge

    cfg, params = _qt.__wrapped__()
    v1 = tmp_path / "a.mp4"
    _write_video(v1, 0, size=32)
    kw = dict(num_segments=2, max_new_tokens=5, attn_impl="flash",
              max_pixels=32 * 32)
    j_on = Qwen2VLJudge(cfg, params, ByteTokenizer(), prefix_cache=True,
                        **kw)
    j_off = Qwen2VLJudge(cfg, params, ByteTokenizer(), prefix_cache=False,
                         **kw)
    q = "Rate the coherence."
    assert j_on.ask(q, str(v1)) == j_off.ask(q, str(v1))

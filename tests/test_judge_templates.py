"""Token/string-level tests for the pinned MiniCPM-V-2.6 and CogVLM2-Video
judge templates (closes C20's template-parity gap — VERDICT r2 #3).

The expected strings are constructed independently here, following the
published sources cited in ``mjvideo_tpu/data/judge_templates.py``; the
prompt builders must reproduce them exactly, both as strings and as token
sequences under a tokenizer with the special markers registered.
"""

import numpy as np
import pytest

from mjvideo_tpu.data.judge_templates import (
    MINICPM_CHAT_PREFIX,
    MINICPM_CHAT_SUFFIX,
    MINICPM_IMAGE_PATTERN,
    cogvlm2_history_to_prompt,
    minicpm_expand_images,
    minicpm_video_content,
    minicpm_video_prompt,
    minicpm_video_segments,
)


class _SpecialTokenizer:
    """Hermetic tokenizer with real special-token semantics: encoding a
    string splits on registered special markers (longest-first, like HF
    AddedToken handling) and byte-encodes the text runs."""

    SPECIALS = {
        "<|im_start|>": 1001,
        "<|im_end|>": 1002,
        "<image>": 1003,
        "</image>": 1004,
        "<unk>": 1005,
        "<slice>": 1006,
        "</slice>": 1007,
    }

    unk_token_id = 1005

    def convert_tokens_to_ids(self, tok):
        return self.SPECIALS.get(tok, -1)

    def encode_full(self, s):
        """Whole-string tokenization incl. special splitting — the oracle
        the piecewise builder must match."""
        markers = sorted(self.SPECIALS, key=len, reverse=True)
        out, i = [], 0
        while i < len(s):
            for m in markers:
                if s.startswith(m, i):
                    out.append(self.SPECIALS[m])
                    i += len(m)
                    break
            else:
                out.append(ord(s[i]) % 256)
                i += 1
        return out

    def __call__(self, s):
        # text runs contain no special markers (the builder splits first);
        # byte-encoding is trivially boundary-stable
        return {"input_ids": [ord(c) % 256 for c in s]}


def test_minicpm_video_prompt_matches_published_construction():
    # Independently-built expectation: chat.py joins each frame's
    # "(<image>./</image>)" and the query with "\n"; the processor expands
    # each pattern to <image> + <unk>*query_num + </image>; ChatML wrap.
    q = "Is this video good?"
    expected_content = "\n".join(
        [MINICPM_IMAGE_PATTERN, MINICPM_IMAGE_PATTERN, q])
    assert minicpm_video_content(2, q) == expected_content

    expanded = expected_content.replace(
        MINICPM_IMAGE_PATTERN, "<image>" + "<unk>" * 3 + "</image>")
    assert minicpm_expand_images(expected_content, 3) == expanded

    assert minicpm_video_prompt(2, q, 3) == (
        "<|im_start|>user\n" + expanded
        + "<|im_end|>\n<|im_start|>assistant\n"
    )
    assert MINICPM_CHAT_PREFIX + expanded + MINICPM_CHAT_SUFFIX == \
        minicpm_video_prompt(2, q, 3)


def test_minicpm_segments_reassemble_to_the_full_prompt():
    for n in (0, 1, 2, 5):
        segs = minicpm_video_segments(n, "rate it", 4)
        assert "".join(v for _, v in segs) == minicpm_video_prompt(
            n, "rate it", 4)


def test_minicpm_builder_tokens_match_whole_string_tokenization():
    from mjvideo_tpu.models.minicpmv import MiniCPMVConfig, build_video_prompt_ids

    tok = _SpecialTokenizer()
    cfg = MiniCPMVConfig()
    nq = cfg.resampler.num_queries
    ids = build_video_prompt_ids(tok, cfg, 3, "Is this video good?")
    oracle = tok.encode_full(
        minicpm_video_prompt(3, "Is this video good?", nq))
    np.testing.assert_array_equal(ids[0], np.asarray(oracle, np.int32))


def test_cogvlm2_history_to_prompt_exact():
    assert cogvlm2_history_to_prompt("How many cats?") == \
        "Question: How many cats? Answer:"
    assert cogvlm2_history_to_prompt("How many cats?",
                                     template_version="vqa") == \
        "Question: How many cats? Short answer:"
    assert cogvlm2_history_to_prompt("How many cats?",
                                     template_version="base") == \
        "How many cats?"
    assert cogvlm2_history_to_prompt(
        "And dogs?", history=[("How many cats?", "Two.")]) == \
        "Question: How many cats? Answer: Two.\nQuestion: And dogs? Answer:"
    with pytest.raises(ValueError):
        cogvlm2_history_to_prompt("x", template_version="nope")


def test_cogvlm2_builder_uses_the_pinned_template():
    from mjvideo_tpu.models.cogvlm2 import (
        LANGUAGE_TOKEN_TYPE,
        VISION_TOKEN_TYPE,
        CogVLM2Config,
        build_video_prompt_ids,
    )

    class _ByteTok:
        def __call__(self, s):
            return {"input_ids": [ord(c) % 256 for c in s]}

    cfg = CogVLM2Config()
    n_frames = 2
    ids, tt = build_video_prompt_ids(_ByteTok(), cfg, n_frames, "Rate it.")
    n_vis = n_frames * cfg.vision.tokens_per_frame
    text = "Question: Rate it. Answer:"
    assert ids[0, 0] == cfg.bos_token_id
    np.testing.assert_array_equal(
        ids[0, 1 + n_vis:], np.asarray([ord(c) % 256 for c in text]))
    assert (tt[0, 1:1 + n_vis] == VISION_TOKEN_TYPE).all()
    assert tt[0, 0] == LANGUAGE_TOKEN_TYPE
    assert (tt[0, 1 + n_vis:] == LANGUAGE_TOKEN_TYPE).all()

"""Size-preset validation for every judge backbone scale the reference
benchmarks (SURVEY §2 C20: internvl2-{2b,4b,8b,26b}, qwen2-vl-{2b,7b}).

Shape-only (``jax.eval_shape``) — no parameters are materialized, so the
26B preset is as cheap to validate as the 2B one.  The expected totals are
the published HF model sizes; a preset that drifts from its config.json
dims will miss its target count.
"""

import math

import jax
import pytest

from mjvideo_tpu import (
    internvl2_2b_chat_config,
    internvl2_4b_chat_config,
    internvl2_8b_chat_config,
    internvl2_26b_chat_config,
)
from mjvideo_tpu.models.internvl import init_chat_params
from mjvideo_tpu.models.qwen2vl import (
    Qwen2VLConfig,
    init_qwen2vl_params,
    qwen2vl_7b_config,
)


def _n_params(shapes) -> int:
    # math.prod, not jnp.prod: the 26B ffn stack exceeds int32 element count.
    return sum(math.prod(x.shape) for x in jax.tree.leaves(shapes))


INTERNVL_PRESETS = [
    # (factory, published size) — OpenGVLab/InternVL2-* model cards.
    (internvl2_2b_chat_config, 2.21e9),
    (internvl2_4b_chat_config, 4.15e9),
    (internvl2_8b_chat_config, 8.08e9),
    (internvl2_26b_chat_config, 25.5e9),
]


@pytest.mark.parametrize(
    "factory,expected", INTERNVL_PRESETS,
    ids=[f.__name__ for f, _ in INTERNVL_PRESETS])
def test_internvl_preset_param_counts(factory, expected):
    cfg = factory()
    assert cfg.llm.hidden_size % cfg.llm.num_attention_heads == 0
    assert cfg.vision.hidden_size % cfg.vision.num_attention_heads == 0
    shapes = jax.eval_shape(
        lambda k: init_chat_params(k, cfg), jax.random.PRNGKey(0))
    n = _n_params(shapes)
    assert abs(n - expected) / expected < 0.02, (
        f"{factory.__name__}: {n/1e9:.3f}B vs published {expected/1e9:.2f}B")


QWEN_PRESETS = [
    (Qwen2VLConfig, 2.21e9),  # default = Qwen2-VL-2B-Instruct
    (qwen2vl_7b_config, 8.29e9),
]


@pytest.mark.parametrize(
    "factory,expected", QWEN_PRESETS,
    ids=["qwen2vl_2b_default", "qwen2vl_7b_config"])
def test_qwen2vl_preset_param_counts(factory, expected):
    cfg = factory()
    assert cfg.text.hidden_size % cfg.text.num_attention_heads == 0
    shapes = jax.eval_shape(
        lambda k: init_qwen2vl_params(k, cfg), jax.random.PRNGKey(0))
    n = _n_params(shapes)
    assert abs(n - expected) / expected < 0.02, (
        f"{n/1e9:.3f}B vs published {expected/1e9:.2f}B")


def test_7b_vision_merger_matches_text_width():
    cfg = qwen2vl_7b_config()
    assert cfg.vision.hidden_size == cfg.text.hidden_size
    assert not cfg.tie_word_embeddings  # 7B does not tie the LM head

"""mjvideo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video reward-model framework.

From-scratch rebuild of the capabilities of aiming-lab/MJ-Video: the
MoE-structured InternVL2 video reward model, its data pipeline, three-stage
training, and benchmark evaluation — designed for TPU hardware (see SURVEY.md).
"""

__version__ = "0.1.0"

from .configs import (  # noqa: F401
    ASPECT2CRITERIA,
    ASPECT_NAMES,
    CRITERIA_NAMES,
    ChatConfig,
    LLMConfig,
    RewardConfig,
    VisionConfig,
    internvl2_2b_chat_config,
    internvl2_4b_chat_config,
    internvl2_8b_chat_config,
    internvl2_26b_chat_config,
    mjvideo_2b_config,
    mjvideo_4b_config,
    tiny_test_config,
)

# Heavier entry points load lazily so `import mjvideo_tpu` stays cheap.
_LAZY = {
    "RewardScorer": ("mjvideo_tpu.eval.scorer", "RewardScorer"),
    "load_reward_model": ("mjvideo_tpu.utils.checkpoint", "load_reward_model"),
    "reward_forward": ("mjvideo_tpu.models.reward", "reward_forward"),
    "init_reward_params": ("mjvideo_tpu.models.reward", "init_reward_params"),
    "Trainer": ("mjvideo_tpu.train.trainer", "Trainer"),
    "TrainConfig": ("mjvideo_tpu.train.trainer", "TrainConfig"),
    "make_mesh": ("mjvideo_tpu.parallel.mesh", "make_mesh"),
    "load_video": ("mjvideo_tpu.data.video", "load_video"),
    "ChatSession": ("mjvideo_tpu.models.generate", "ChatSession"),
    "GenerationConfig": ("mjvideo_tpu.models.generate", "GenerationConfig"),
    "chat": ("mjvideo_tpu.models.generate", "chat"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'mjvideo_tpu' has no attribute {name!r}")

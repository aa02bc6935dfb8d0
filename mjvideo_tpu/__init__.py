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
    mjvideo_2b_config,
    mjvideo_4b_config,
    tiny_test_config,
)

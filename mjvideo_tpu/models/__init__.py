from .reward import (  # noqa: F401
    RewardOutput,
    init_reward_params,
    reward_forward,
    reward_head,
)
from .internvl import chat_forward, extract_feature, init_chat_params  # noqa: F401
from .decoder import decoder_forward, init_decoder_params  # noqa: F401
from .vit import init_vit_params, vit_forward  # noqa: F401

from .attention import attention_xla, make_attention_bias, multi_head_attention  # noqa: F401
from .norms import layer_norm, rms_norm  # noqa: F401
from .pixel_shuffle import pixel_shuffle  # noqa: F401
from .rope import apply_rope, rope_tables, rotate_half  # noqa: F401

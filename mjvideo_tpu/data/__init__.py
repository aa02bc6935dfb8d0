"""Data pipeline: video decode/tiling, prompts, labels, datasets.

Replaces ``scripts/data_processor/`` (exported surface per
``scripts/data_processor/__init__.py:1-2``).
"""

from .conversation import ChatTemplate, get_template, register_template  # noqa: F401
from .dataset import (  # noqa: F401
    PairCollator,
    PreferencePairDataset,
    batched,
    prefetch,
)
from .labels import deal_preference, pair_record_labels, process_labels  # noqa: F401
from .prompts import (  # noqa: F401
    GATING_TOKEN_PATTERN,
    ByteTokenizer,
    ChatInputs,
    build_video_question,
    expand_image_tokens,
    find_gating_position,
    prepare_chat_input,
)
from .video import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    decode_frames,
    fetch_remote_video,
    find_closest_aspect_ratio,
    get_frame_indices,
    load_image,
    load_video,
    normalize,
    select_tile_grid,
    tile_frame,
)

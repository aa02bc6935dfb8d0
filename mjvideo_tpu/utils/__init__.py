"""Utilities: checkpoint import/export, orbax I/O."""

from .checkpoint import (  # noqa: F401
    import_chat_params,
    import_decoder_params,
    import_reward_checkpoint,
    import_vit_params,
    load_reward_model,
    load_safetensors_dir,
    restore_pytree,
    save_pytree,
    unpack_wqkv,
)
from .export import (  # noqa: F401
    export_chat,
    export_reward_checkpoint,
    pack_wqkv,
    save_safetensors,
)

"""Parallelism: device mesh + sharding rules (DP over 'data', TP over 'model')."""

from .mesh import (  # noqa: F401
    TP_RULES,
    batch_sharding,
    make_mesh,
    param_pspec,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)

"""Multi-host initialization.

The reference requires a NCCL process group even for world_size=1 inference,
faked with env vars (``eval_genai_mjvideo.py:17-24``); here single-host runs
need NOTHING.  On a real multi-host TPU pod, call ``maybe_initialize()``
once at program start — it is a no-op unless pod env vars are present, so
the same entry point works everywhere.
"""

from __future__ import annotations

import os

_INITIALIZED = False


def maybe_initialize() -> bool:
    """``jax.distributed.initialize()`` iff a multi-host environment is
    detected (TPU pod metadata or explicit JAX coordinator env vars).

    Returns True if distributed mode was (or already is) initialized.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    multi_host = any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if not multi_host:
        return False
    import jax

    jax.distributed.initialize()
    _INITIALIZED = True
    return True


def process_info():
    """(process_index, process_count) — 0/1 on single host."""
    import jax

    return jax.process_index(), jax.process_count()

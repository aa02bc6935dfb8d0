"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 failure (MULTICHIP_r01.json): the driver imports __graft_entry__ and
calls dryrun_multichip(8) directly, with no env preparation — the CPU/8-device
setup lived only under __main__, so the dryrun either asserted ("need 8
devices, have 1") or dispatched eager ops to the tunneled axon TPU and died on
a stale-AOT libtpu mismatch.  These tests reproduce the driver's exact calling
convention in clean subprocesses.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, extra_env=None) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                        "JAX_COMPILATION_CACHE_DIR")}
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )


def test_dryrun_multichip_driver_call():
    """Driver behavior: bare import + dryrun_multichip(8), no env setup."""
    proc = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_dryrun_multichip_after_backend_init():
    """dryrun works even if a 1-device CPU backend was already initialized."""
    proc = _run(
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1\n"
        "_ = (jnp.ones(4) + 1).block_until_ready()\n"
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)\n",
        extra_env={"JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK" in proc.stdout

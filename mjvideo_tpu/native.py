"""Loader for the native C++ preprocessing extension.

Builds ``native/preprocess.cpp`` on first use (g++ via the CPython C API —
pybind11 is not in this image), caches the .so under ``native/build/``, and
degrades gracefully to the PIL path when no toolchain is present.

The extension replaces the hot host-side loop of the reference pipeline
(PIL bicubic + torchvision normalize per tile, ``data.py:56-64``) with one
threaded fused pass; ``data.video`` picks it up automatically.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "preprocess.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO_PATH = os.path.join(_BUILD_DIR, "_mjvideo_native.so")

_lock = threading.Lock()
_module = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    include = sysconfig.get_path("include")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", _SRC, "-o", _SO_PATH, "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_native():
    """The _mjvideo_native module, building it on demand; None if unavailable."""
    global _module, _tried
    with _lock:
        if _module is not None or _tried:
            return _module
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_mjvideo_native", _SO_PATH
        )
        try:
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _module = mod
        except ImportError:
            _module = None
        return _module


def native_available() -> bool:
    return get_native() is not None


def resize_normalize(
    frames: np.ndarray,  # (N, H, W, 3) uint8
    out_size: int,
    mean, std,
    clip: bool = True,
) -> Optional[np.ndarray]:
    """Fused resize+normalize via the C++ extension; None if unavailable."""
    mod = get_native()
    if mod is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    raw = mod.resize_normalize(
        frames.tobytes(), n, h, w, out_size,
        (float(mean[0]), float(mean[1]), float(mean[2])),
        (float(std[0]), float(std[1]), float(std[2])),
        1 if clip else 0,
    )
    out = np.frombuffer(raw, dtype=np.float32)
    return out.reshape(n, out_size, out_size, 3).copy()

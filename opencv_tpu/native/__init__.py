"""Native (C++) runtime components, built on demand with the system
toolchain and loaded via ctypes. Each .so is cached next to its source
and rebuilt when the source is newer."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE: dict[str, ctypes.CDLL] = {}


def load(name: str) -> ctypes.CDLL:
    """Compile (if stale) and load native/<name>.cpp as a shared library."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        so = os.path.join(_DIR, f"lib{name}.so")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", so, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        _CACHE[name] = lib
        return lib

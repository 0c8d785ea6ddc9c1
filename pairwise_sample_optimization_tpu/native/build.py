"""Build + ctypes loading for the native BPE engine.

Compiled on first use into the package dir (or PSO_NATIVE_BUILD_DIR) with
g++; all consumers fall back to the pure-Python implementation when no
toolchain is available, so the native path is an optimization, never a
requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_NAME = "libpso_bpe.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build_dir() -> str:
    return os.environ.get("PSO_NATIVE_BUILD_DIR", _HERE)


def build_bpe_library(force: bool = False) -> Optional[str]:
    """Compile bpe.cpp -> libpso_bpe.so; returns the path or None."""
    out = os.path.join(_build_dir(), _LIB_NAME)
    src = os.path.join(_HERE, "bpe.cpp")
    if (
        os.path.exists(out)
        and not force
        and os.path.getmtime(out) >= os.path.getmtime(src)
    ):
        return out
    try:
        os.makedirs(_build_dir(), exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src],
            check=True,
            capture_output=True,
        )
        return out
    except (OSError, subprocess.CalledProcessError):
        return None


def load_bpe_library() -> Optional[ctypes.CDLL]:
    """Lazily build+load; None if unavailable (callers fall back)."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        path = build_bpe_library()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.pso_tok_create.restype = ctypes.c_void_p
        lib.pso_tok_create.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.pso_tok_destroy.argtypes = [ctypes.c_void_p]
        lib.pso_tok_encode_word.restype = ctypes.c_int32
        lib.pso_tok_encode_word.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.pso_tok_vocab_size.restype = ctypes.c_int32
        lib.pso_tok_vocab_size.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib

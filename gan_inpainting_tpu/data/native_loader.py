"""ctypes bindings for the native C++ image loader (native/loader.cpp).

The C++ tier decodes JPEGs with libjpeg and does center-crop + area-filter
resize in a thread pool — the framework's native runtime equivalent of the
reference's Python/PIL dataloader workers (SURVEY.md R1). Falls back
gracefully: :func:`available` is False when the toolchain or libjpeg is
missing, and data/loader.py then uses PIL.

The shared library is built on first use with g++ and cached under
``native/build/``.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "loader.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB = _BUILD_DIR / "libinpaint_loader.so"

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", str(_SRC), "-ljpeg",
           "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB.exists() or (_SRC.stat().st_mtime > _LIB.stat().st_mtime):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _build_failed = True
            return None
        lib.inpaint_load_batch.restype = ctypes.c_int
        lib.inpaint_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_batch(paths: list[str], size: int,
               num_threads: int | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Decode JPEGs → (batch uint8 (N,size,size,3), ok bool (N,))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (build failed)")
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    if num_threads is None:
        num_threads = min(8, max(1, (os.cpu_count() or 1)))
    c_paths = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths])
    lib.inpaint_load_batch(
        c_paths, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads)
    return out, ok.astype(bool)

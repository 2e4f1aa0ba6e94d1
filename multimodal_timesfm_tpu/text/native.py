"""ctypes bindings for the native WordPiece tokenizer (csrc/wordpiece.cpp).

The shared library is built on demand with g++ (no pybind11 in this image;
the C ABI + ctypes keeps the binding dependency-free). If the toolchain or
source is unavailable, callers fall back to the pure-Python tokenizer.
"""

from __future__ import annotations

from typing import Any

import ctypes
import subprocess
from pathlib import Path

from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_SO_PATH = _CSRC / "libwordpiece.so"


def _build() -> bool:
    src = _CSRC / "wordpiece.cpp"
    if not src.exists():
        return False
    if _SO_PATH.exists() and _SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", str(src), "-o", str(_SO_PATH)],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        _logger.warning("native wordpiece build failed: %s", e)
        return False


_lib = None


def load_library() -> Any:
    """Load (building if needed) the native library, or return None."""
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(str(_SO_PATH))
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_encode.restype = ctypes.c_int32
    lib.wp_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


class NativeWordPiece:
    """Native encoder over a vocab.txt; same id output as WordPieceTokenizer."""

    def __init__(self, vocab_path: Path | str) -> None:
        lib = load_library()
        if lib is None:
            raise RuntimeError("native wordpiece library unavailable")
        self._lib = lib
        vocab_text = Path(vocab_path).read_text(encoding="utf-8")
        self._handle = lib.wp_create(vocab_text.encode("utf-8"))

    def encode(self, text: str, max_length: int = 256) -> list[int]:
        # The C ABI is NUL-terminated (no byte-length parameter), so an
        # embedded NUL would truncate the input there. The Python tokenizer's
        # _clean DROPS NULs and continues — stripping them first keeps the
        # two paths id-identical.
        if "\x00" in text:
            text = text.replace("\x00", "")
        buf = (ctypes.c_int32 * max_length)()
        n = self._lib.wp_encode(self._handle, text.encode("utf-8"), max_length, buf)
        return list(buf[:n])

    def __del__(self) -> None:  # pragma: no cover
        if getattr(self, "_handle", None):
            self._lib.wp_destroy(self._handle)
            self._handle = None

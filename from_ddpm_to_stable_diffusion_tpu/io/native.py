"""ctypes bindings for the native (C++) host-runtime components.

Builds ``native/bpe_tokenizer.cpp`` on demand with g++ (no pybind11 in this
environment — plain C ABI + ctypes) and caches the shared object next to the
source. :class:`NativeBPETokenizer` is API-compatible with
:class:`..io.tokenizer.CLIPTokenizer` for the encode path and is the
production host-side tokenizer (immutable after load, GIL-free encode,
thread-safe).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def build_native(name: str = "bpe_tokenizer",
                 force: bool = False) -> str:
    """Compile native/<name>.cpp → native/lib<name>.so (cached)."""
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    lib = os.path.join(_NATIVE_DIR, f"lib{name}.so")
    if force or not os.path.exists(lib) or (
            os.path.getmtime(src) > os.path.getmtime(lib)):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
               "-o", lib]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return lib


class NativeBPETokenizer:
    """CLIP BPE tokenizer backed by the C++ implementation."""

    def __init__(self, vocab_path: str, merges_path: str,
                 max_length: int = 77):
        lib_path = build_native("bpe_tokenizer")
        self._lib = ctypes.CDLL(lib_path)
        self._lib.bpe_create.restype = ctypes.c_void_p
        self._lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_int]
        self._lib.bpe_encode.restype = ctypes.c_int
        self._lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64)]
        self._lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        self._lib.bpe_vocab_size.restype = ctypes.c_int64
        self._lib.bpe_vocab_size.argtypes = [ctypes.c_void_p]
        self._handle = self._lib.bpe_create(
            vocab_path.encode(), merges_path.encode(), max_length)
        if not self._handle:
            raise ValueError(
                f"failed to load vocab/merges from {vocab_path!r}, "
                f"{merges_path!r}")
        self.max_length = max_length

    @property
    def vocab_size(self) -> int:
        return int(self._lib.bpe_vocab_size(self._handle))

    def encode(self, text: str) -> List[int]:
        buf = (ctypes.c_int64 * self.max_length)()
        n = self._lib.bpe_encode(self._handle, text.encode("utf-8"), buf)
        if n < 0:
            raise ValueError(f"unknown token while encoding {text!r}")
        return list(buf)

    def encode_batch(self, texts: List[str]) -> List[List[int]]:
        return [self.encode(t) for t in texts]

    def encode_batch_np(self, texts: List[str]) -> np.ndarray:
        return np.asarray(self.encode_batch(texts), np.int64)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.bpe_destroy(handle)
            self._handle = None

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
    """Compile native/<name>.cpp → native/lib<name>.so (cached).

    Compiles to a process-unique temp path and os.rename()s it into place
    (atomic on the same filesystem) so concurrent builders — multiple
    serving workers, pytest-xdist — can never dlopen a partially written
    .so or race the mtime check into a crash; last writer wins with a
    complete binary either way."""
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    lib = os.path.join(_NATIVE_DIR, f"lib{name}.so")
    if force or not os.path.exists(lib) or (
            os.path.getmtime(src) > os.path.getmtime(lib)):
        tmp = f"{lib}.{os.getpid()}.tmp"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
               "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            os.rename(tmp, lib)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
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


# --------------------------------------------------------------------------
# Native safetensors reader
# --------------------------------------------------------------------------
_ST_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def _st_numpy_dtype(st_dtype: str):
    if st_dtype == "BF16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    try:
        return np.dtype(_ST_DTYPES[st_dtype])
    except KeyError:
        raise ValueError(f"unsupported safetensors dtype {st_dtype!r}")


class NativeSafetensors:
    """mmap-backed safetensors file (C++ reader, zero-copy views).

    ``get_tensor(name)`` returns an owning copy (safe default).
    ``get_tensor(name, copy=False)`` returns a zero-copy view onto the
    mapped file — ONLY valid while this object is open (``close`` /
    ``__del__`` unmap; a surviving view then reads freed memory), for
    callers that immediately ``jax.device_put`` / convert.  API mirrors
    ``safetensors.safe_open`` enough for the weight-import layer.
    """

    def __init__(self, path: str):
        lib_path = build_native("safetensors_reader")
        self._lib = ctypes.CDLL(lib_path)
        for name, restype, argtypes in [
            ("st_open", ctypes.c_void_p, [ctypes.c_char_p]),
            ("st_error", ctypes.c_char_p, [ctypes.c_void_p]),
            ("st_count", ctypes.c_int64, [ctypes.c_void_p]),
            ("st_name", ctypes.c_char_p, [ctypes.c_void_p, ctypes.c_int64]),
            ("st_dtype", ctypes.c_char_p, [ctypes.c_void_p, ctypes.c_int64]),
            ("st_ndim", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int64]),
            ("st_shape", None, [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int64)]),
            ("st_nbytes", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int64]),
            ("st_data", ctypes.c_void_p, [ctypes.c_void_p, ctypes.c_int64]),
            ("st_close", None, [ctypes.c_void_p]),
        ]:
            fn = getattr(self._lib, name)
            fn.restype = restype
            fn.argtypes = argtypes
        self._handle = self._lib.st_open(path.encode())
        err = self._lib.st_error(self._handle)
        if err:
            msg = err.decode()
            self.close()
            raise ValueError(f"safetensors read failed for {path!r}: {msg}")
        self._index = {}
        for i in range(self._lib.st_count(self._handle)):
            self._index[self._lib.st_name(self._handle, i).decode()] = i

    def keys(self):
        return list(self._index)

    def _info(self, i):
        ndim = self._lib.st_ndim(self._handle, i)
        shape = (ctypes.c_int64 * max(ndim, 1))()
        self._lib.st_shape(self._handle, i, shape)
        dtype = _st_numpy_dtype(self._lib.st_dtype(self._handle, i).decode())
        return tuple(shape[:ndim]), dtype

    def get_tensor(self, name: str, copy: bool = True) -> np.ndarray:
        i = self._index[name]
        shape, dtype = self._info(i)
        nbytes = self._lib.st_nbytes(self._handle, i)
        ptr = self._lib.st_data(self._handle, i)
        buf = (ctypes.c_char * nbytes).from_address(ptr)
        arr = np.frombuffer(buf, dtype=dtype).reshape(shape)
        return np.array(arr) if copy else arr

    def close(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.st_close(handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        self.close()

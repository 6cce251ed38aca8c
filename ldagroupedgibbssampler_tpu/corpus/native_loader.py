"""ctypes bindings for the native corpus tokenizer (native/fast_tokenizer.cpp).

The shared library is built on demand with g++ (no pybind11 in this image;
plain C ABI + ctypes per the project constraints) and cached next to the
source. Everything degrades gracefully: `native_available()` is False when
no compiler is present and callers fall back to the pure-Python tokenizer
(corpus/tokenizer.py), which remains the executable specification — the
test suite asserts token-for-token equality between the two paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fast_tokenizer.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libfasttok.so")

_MODES = {"simple": 0, "numeric": 1, "connector": 2,
          "connector_numeric": 3}
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (os.path.exists(_SRC) and
                                        os.path.getmtime(_SRC)
                                        > os.path.getmtime(_LIB)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.tokenize_corpus.restype = ctypes.c_void_p
        lib.tokenize_corpus.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64]
        for name in ("corpus_num_tokens", "corpus_num_docs",
                     "corpus_vocab_size"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        lib.corpus_copy_tokens.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_int32)]
        lib.corpus_copy_offsets.argtypes = [ctypes.c_void_p,
                                            ctypes.POINTER(ctypes.c_int64)]
        lib.corpus_vocab_blob.restype = ctypes.c_int64
        lib.corpus_vocab_blob.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.corpus_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def tokenize_corpus_native(texts: list[str], stoplist=frozenset(),
                           mode: str = "simple",
                           max_tokens: int | None = None):
    """Tokenize all documents in one native call.

    Returns (tokens int32[N], doc_offsets int64[D+1], vocab list[str]) with
    semantics identical to tokenizer.tokenize applied per document
    (vocabulary ids assigned in first-appearance order, matching the
    Python pipeline's ordering).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native tokenizer unavailable")
    blob = "\x00".join(texts).encode("utf-8", errors="replace")
    # rebuild offsets over the encoded blob (separator is 1 byte)
    offsets = np.zeros(len(texts) + 1, np.int64)
    pos = 0
    enc = [t.encode("utf-8", errors="replace") for t in texts]
    for i, e in enumerate(enc):
        offsets[i] = pos
        pos += len(e) + 1
    offsets[-1] = max(pos - 1, 0)
    blob = b"\x00".join(enc)
    stop_blob = "\n".join(sorted(stoplist)).encode("utf-8")
    handle = lib.tokenize_corpus(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(texts), stop_blob, len(stop_blob), _MODES[mode],
        -1 if max_tokens is None else int(max_tokens))
    try:
        n = lib.corpus_num_tokens(handle)
        d = lib.corpus_num_docs(handle)
        tokens = np.zeros(n, np.int32)
        doc_offsets = np.zeros(d + 1, np.int64)
        if n:
            lib.corpus_copy_tokens(
                handle, tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        lib.corpus_copy_offsets(
            handle, doc_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        size = lib.corpus_vocab_blob(handle, None)
        buf = ctypes.create_string_buffer(size)
        lib.corpus_vocab_blob(handle, buf)
        vocab = buf.raw.decode("utf-8").split("\n")[:-1] if size else []
    finally:
        lib.corpus_free(handle)
    return tokens, doc_offsets, vocab

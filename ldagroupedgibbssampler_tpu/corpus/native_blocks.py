"""ctypes bindings for the native cell-block builder (native/cell_blocks.cpp).

Same build/caching/fallback pattern as corpus/native_loader.py: the shared
library is compiled on demand with g++ and cached next to the source; when
no compiler is available, callers fall back to the vectorised NumPy builder
in corpus/ragged.py. Both produce BIT-IDENTICAL output to the loop-form
specification (`build_cell_blocks_reference`), asserted by
tests/test_cell_blocks.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "cell_blocks.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libcellblocks.so")

_lock = threading.Lock()
_lib = None
_build_failed = False

_I64 = ctypes.c_int64
_P32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_P64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_PU8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


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
        lib.cb_size.restype = ctypes.c_int
        lib.cb_size.argtypes = [_P32, _P32, _I64, _I64, _I64, _I64, _I64,
                                _I64, _I64, ctypes.POINTER(_I64),
                                ctypes.POINTER(_I64)]
        lib.cb_build.restype = ctypes.c_int
        lib.cb_build.argtypes = [_P32, _P32, _I64, _I64, _I64, _I64, _I64,
                                 _I64, _I64,
                                 _P32, _P32, _P32, _PU8, _P64, _P32,
                                 _P32, _P32, _P32, _P32, _P32]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_cell_blocks_native(tokens, doc_ids_all, num_types, num_docs, *,
                             block, vspan, dspan, chunk):
    """CellBlocks via the C++ builder, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    from ldagroupedgibbssampler_tpu.corpus.ragged import CellBlocks

    tokens = np.ascontiguousarray(tokens, np.int32)
    docs = np.ascontiguousarray(doc_ids_all, np.int32)
    n = tokens.shape[0]
    tr, tb = _I64(0), _I64(0)
    rc = lib.cb_size(tokens, docs, n, num_types, num_docs, block, vspan,
                     dspan, chunk, ctypes.byref(tr), ctypes.byref(tb))
    if rc != 0:
        return None
    total_rows, total_b = tr.value, tb.value
    bpc = block // chunk
    nba, nbb = total_rows // bpc, total_b // bpc
    nwin_w = max(1, (num_types + vspan - 1) // vspan)
    nwin_d = max(1, (num_docs + dspan - 1) // dspan)

    w_local = np.empty(total_rows * chunk, np.int32)
    doc_ids = np.empty(total_rows * chunk, np.int32)
    d_local_a = np.empty(total_rows * chunk, np.int32)
    mask = np.empty(total_rows * chunk, np.uint8)
    flat_index = np.empty(total_rows * chunk, np.int64)
    win_d_chunks = np.empty(total_rows, np.int32)
    win_w = np.empty(nba, np.int32)
    first_w = np.empty(nba, np.int32)
    src_chunks = np.empty(total_b, np.int32)
    win_d = np.empty(nbb, np.int32)
    first_d = np.empty(nbb, np.int32)
    rc = lib.cb_build(tokens, docs, n, num_types, num_docs, block, vspan,
                      dspan, chunk, w_local, doc_ids, d_local_a, mask,
                      flat_index, win_d_chunks, win_w, first_w, src_chunks,
                      win_d, first_d)
    if rc != 0:
        return None
    d_local = d_local_a.reshape(-1, chunk)[src_chunks]
    return CellBlocks(
        w_local=w_local.reshape(nba, block),
        doc_ids=doc_ids.reshape(nba, block),
        mask=mask.view(bool).reshape(nba, block),
        win_w=win_w, first_w=first_w,
        flat_index=flat_index.reshape(nba, block),
        d_local_a=d_local_a.reshape(nba, block),
        win_d_chunks=win_d_chunks,
        src_chunks=src_chunks,
        d_local=d_local.reshape(nbb, block),
        win_d=win_d, first_d=first_d,
        vspan=vspan, dspan=dspan, nwin_w=nwin_w, nwin_d=nwin_d,
        chunk=chunk)


# ---------------------------------------------------------------------------
# StreamBlocks builder (native/stream_blocks.cpp) — same pattern
# ---------------------------------------------------------------------------
_SRC_SB = os.path.join(_NATIVE_DIR, "stream_blocks.cpp")
_LIB_SB = os.path.join(_NATIVE_DIR, "libstreamblocks.so")
_lib_sb = None
_sb_failed = False


def _load_sb():
    global _lib_sb, _sb_failed
    with _lock:
        if _lib_sb is not None or _sb_failed:
            return _lib_sb
        if not os.path.exists(_LIB_SB) or (os.path.exists(_SRC_SB) and
                                           os.path.getmtime(_SRC_SB)
                                           > os.path.getmtime(_LIB_SB)):
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC_SB,
                   "-o", _LIB_SB]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except (OSError, subprocess.SubprocessError):
                _sb_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_SB)
        except OSError:
            _sb_failed = True
            return None
        lib.sb_size.restype = ctypes.c_int
        lib.sb_size.argtypes = [_P32, _P32, _I64, _I64, _I64, _I64, _I64,
                                _I64, _I64, ctypes.POINTER(_I64)]
        lib.sb_build.restype = ctypes.c_int
        lib.sb_build.argtypes = [_P32, _P32, _I64, _I64, _I64, _I64, _I64,
                                 _I64, _I64, _I64,
                                 _P32, _P32, _PU8, _P64, _P32, _P32]
        _lib_sb = lib
        return _lib_sb


def stream_native_available() -> bool:
    return _load_sb() is not None


def build_stream_blocks_native(tokens, doc_ids_all, num_types, num_docs, *,
                               block, vspan, dspan, chunk):
    """StreamBlocks via the C++ builder, or None when unavailable."""
    lib = _load_sb()
    if lib is None:
        return None
    from ldagroupedgibbssampler_tpu.corpus.ragged import StreamBlocks

    tokens = np.ascontiguousarray(tokens, np.int32)
    docs = np.ascontiguousarray(doc_ids_all, np.int32)
    n = tokens.shape[0]
    tc = _I64(0)
    rc = lib.sb_size(tokens, docs, n, num_types, num_docs, block, vspan,
                     dspan, chunk, ctypes.byref(tc))
    if rc != 0:
        return None
    total = tc.value
    bpc = block // chunk
    nb = total // bpc
    w_local = np.empty(total * chunk, np.int32)
    d_local = np.empty(total * chunk, np.int32)
    mask = np.empty(total * chunk, np.uint8)
    flat_index = np.empty(total * chunk, np.int64)
    ww = np.empty(total, np.int32)
    wd = np.empty(total, np.int32)
    rc = lib.sb_build(tokens, docs, n, num_types, num_docs, block, vspan,
                      dspan, chunk, total, w_local, d_local, mask,
                      flat_index, ww, wd)
    if rc != 0:
        return None
    return StreamBlocks(
        w_local=w_local.reshape(nb, block),
        d_local=d_local.reshape(nb, block),
        mask=mask.view(bool).reshape(nb, block),
        flat_index=flat_index.reshape(nb, block),
        win_w_chunks=ww, win_d_chunks=wd,
        vspan=vspan, dspan=dspan,
        nwin_w=max(1, (num_types + vspan - 1) // vspan),
        nwin_d=max(1, (num_docs + dspan - 1) // dspan), chunk=chunk)

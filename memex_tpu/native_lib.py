"""ctypes loader for the native C++ runtime components under native/.

Native pieces (built by `make -C native`):
  - libmemexhnsw.so: HNSW ANN index (the `hnsw://` parity backend and the
    CPU recall baseline — replaces the reference's hnsw_rs crate role)
  - libmemextext.so: WordPiece tokenizer (host-side ingest hot path)

Loading is lazy and auto-builds once if the toolchain is present; callers
get a clear ImportError otherwise (pure-Python fallbacks exist for both).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

from .log import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_cache: dict[str, ctypes.CDLL] = {}


def _ensure_built() -> None:
    targets = ["libmemexhnsw.so", "libmemextext.so", "libmemexquant.so"]
    if all(os.path.exists(os.path.join(_BUILD_DIR, t)) for t in targets):
        return
    logger.info("building native components (make -C %s)", _NATIVE_DIR)
    proc = subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True,
                          text=True)
    if proc.returncode != 0:
        # Surface the compiler diagnostics — a bare CalledProcessError
        # ("exit status 2") makes every native-path failure a guessing game.
        raise RuntimeError(
            f"native build failed (exit {proc.returncode}):\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def load(name: str) -> ctypes.CDLL:
    lib = _cache.get(name)
    if lib is None:
        _ensure_built()
        path = os.path.join(_BUILD_DIR, name)
        lib = ctypes.CDLL(path)
        _cache[name] = lib
    return lib


def hnsw_lib() -> ctypes.CDLL:
    lib = load("libmemexhnsw.so")
    if not getattr(lib, "_sigs_set", False):
        c = ctypes
        lib.hnsw_new.restype = c.c_void_p
        lib.hnsw_new.argtypes = [c.c_int, c.c_int, c.c_int]
        lib.hnsw_free.argtypes = [c.c_void_p]
        lib.hnsw_add.restype = c.c_uint32
        lib.hnsw_add.argtypes = [c.c_void_p, c.POINTER(c.c_float)]
        lib.hnsw_add_batch.argtypes = [
            c.c_void_p, c.POINTER(c.c_float), c.c_uint64, c.POINTER(c.c_uint32)
        ]
        lib.hnsw_search.restype = c.c_int
        lib.hnsw_search.argtypes = [
            c.c_void_p, c.POINTER(c.c_float), c.c_int, c.c_int,
            c.POINTER(c.c_uint32), c.POINTER(c.c_float),
        ]
        lib.hnsw_mark_deleted.argtypes = [c.c_void_p, c.c_uint32]
        lib.hnsw_count.restype = c.c_uint64
        lib.hnsw_count.argtypes = [c.c_void_p]
        lib.hnsw_save.restype = c.c_int
        lib.hnsw_save.argtypes = [c.c_void_p, c.c_char_p]
        lib.hnsw_load.restype = c.c_void_p
        lib.hnsw_load.argtypes = [c.c_char_p]
        lib._sigs_set = True
    return lib


def text_lib() -> ctypes.CDLL:
    lib = load("libmemextext.so")
    if not getattr(lib, "_sigs_set", False):
        c = ctypes
        lib.wp_new.restype = c.c_void_p
        lib.wp_new.argtypes = [c.c_char_p, c.c_uint64, c.c_int32]
        lib.wp_free.argtypes = [c.c_void_p]
        lib.wp_encode.restype = c.c_int64
        lib.wp_encode.argtypes = [
            c.c_void_p, c.c_char_p, c.c_uint64, c.POINTER(c.c_int32), c.c_int64
        ]
        lib._sigs_set = True
    return lib


def quant_lib() -> ctypes.CDLL:
    lib = load("libmemexquant.so")
    if not getattr(lib, "_sigs_set", False):
        c = ctypes
        lib.normalize_rows.argtypes = [c.POINTER(c.c_float), c.c_int64, c.c_int64]
        lib.quantize_rows_int8.argtypes = [
            c.POINTER(c.c_float), c.c_int64, c.c_int64,
            c.POINTER(c.c_int8), c.POINTER(c.c_float),
        ]
        lib.quantize_rows_int8_refine.argtypes = [
            c.POINTER(c.c_float), c.c_int64, c.c_int64,
            c.POINTER(c.c_int8), c.POINTER(c.c_float),
            c.POINTER(c.c_int8), c.POINTER(c.c_float),
        ]
        lib._sigs_set = True
    return lib


_NP_HELPERS = None


def np_quantize_rows_int8(vectors):
    """One-pass C++ row quantizer with numpy fallback.
    vectors: contiguous f32 [n, d] -> (int8 [n, d], f32 [n] scales)."""
    import numpy as np

    n, d = vectors.shape
    out = np.empty((n, d), np.int8)
    scales = np.empty((n,), np.float32)
    if not os.environ.get("MEMEX_NO_NATIVE"):
        try:
            lib = quant_lib()
            vecs = np.ascontiguousarray(vectors, np.float32)
            lib.quantize_rows_int8(
                vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return out, scales
        except Exception:
            logger.warning("native quantizer unavailable; numpy fallback")
    absmax = np.maximum(np.abs(vectors).max(axis=1), 1e-12)
    scales[:] = absmax / 127.0
    out = np.clip(np.round(vectors / scales[:, None]), -127, 127).astype(np.int8)
    return out, scales


def np_quantize_rows_int8_refine(vectors):
    """Two-stage row quantizer (C++ one-pass, numpy fallback): coarse int8
    codes + int8 codes of the quantization residual, each per-row scaled.
    Reconstruction q*s + rq*rs carries ~14 effective bits — the storage
    for the refine rerank tier (index/flat.py, index/ivf.py refine=True).
    vectors: contiguous f32 [n, d] -> (int8 [n,d], f32 [n], int8 [n,d],
    f32 [n])."""
    import numpy as np

    n, d = vectors.shape
    out = np.empty((n, d), np.int8)
    scales = np.empty((n,), np.float32)
    rout = np.empty((n, d), np.int8)
    rscales = np.empty((n,), np.float32)
    if not os.environ.get("MEMEX_NO_NATIVE"):
        try:
            lib = quant_lib()
            vecs = np.ascontiguousarray(vectors, np.float32)
            lib.quantize_rows_int8_refine(
                vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rout.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                rscales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return out, scales, rout, rscales
        except Exception:
            logger.warning("native refine quantizer unavailable; numpy fallback")
    out, scales = np_quantize_rows_int8(vectors)
    resid = np.asarray(vectors, np.float32) - out.astype(np.float32) * scales[:, None]
    rmax = np.maximum(np.abs(resid).max(axis=1), 1e-14)
    rscales[:] = rmax / 127.0
    rout = np.clip(np.round(resid / rscales[:, None]), -127, 127).astype(np.int8)
    return out, scales, rout, rscales


def np_normalize_rows(vectors):
    """In-place-capable L2 row normalization (C++ path, numpy fallback).
    Returns a contiguous f32 [n, d] array."""
    import numpy as np

    vecs = np.ascontiguousarray(vectors, np.float32)
    if not os.environ.get("MEMEX_NO_NATIVE"):
        try:
            lib = quant_lib()
            if vecs is vectors:  # avoid mutating caller-owned memory
                vecs = vecs.copy()
            lib.normalize_rows(
                vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                vecs.shape[0], vecs.shape[1],
            )
            return vecs
        except Exception:
            logger.warning("native normalizer unavailable; numpy fallback")
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs / np.maximum(norms, 1e-12)


def available() -> bool:
    try:
        _ensure_built()
        return True
    except Exception as exc:  # toolchain missing etc.
        logger.warning("native components unavailable: %s", exc)
        return False

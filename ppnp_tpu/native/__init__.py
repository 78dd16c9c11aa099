"""ctypes bindings for the C++ native ingest tier (csrc/).

The reference has no native code (SURVEY.md §2.1); this is the
production-scale host runtime: the pair-chunk packers in C++ (aligned
grid: O(nnz) two-pass; banded: single-pass band walk behind an opaque
handle) with a build-on-demand .so and a clean fallback to the
vectorized numpy implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["get_lib", "pack_pair_chunks_native", "pack_banded_native",
           "pack_banded_native_csr", "native_available"]

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    so = _CSRC / "libppnp_pack.so"
    if so.exists() and so.stat().st_mtime >= (_CSRC / "pack.cc").stat().st_mtime:
        return so
    try:
        subprocess.run(["make", "-C", str(_CSRC)], check=True,
                       capture_output=True, timeout=120)
        return so if so.exists() else None
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.info("native build unavailable (%s); using numpy packer", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    if not hasattr(lib, "ppnp_band_pack"):
        # Stale .so predating the banded packer (mtime tie). Rebuild, and
        # load the result under a FRESH path: dlopen caches by path, so
        # re-CDLLing the same file would return the old mapping.
        try:
            subprocess.run(["make", "-C", str(_CSRC), "clean", "all"],
                           check=True, capture_output=True, timeout=120)
            tmp = Path(tempfile.mkdtemp(prefix="ppnp_pack_")) / so.name
            shutil.copy2(so, tmp)
            lib = ctypes.CDLL(str(tmp))
            if not hasattr(lib, "ppnp_band_pack"):
                return None
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
    i64, i32, f32 = (np.ctypeslib.ndpointer(dtype=d, flags="C_CONTIGUOUS")
                     for d in (np.int64, np.int32, np.float32))
    lib.ppnp_pack_count.restype = ctypes.c_int64
    lib.ppnp_pack_count.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64, i32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.ppnp_pack_fill.restype = ctypes.c_int64
    lib.ppnp_pack_fill.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64, i32, f32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32, i32, i32, i32, f32]
    lib.ppnp_band_pack.restype = ctypes.c_void_p
    lib.ppnp_band_pack.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64, i64, f32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.ppnp_band_pack_csr.restype = ctypes.c_void_p
    lib.ppnp_band_pack_csr.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64, i32, f32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.ppnp_band_pack_nseg.restype = ctypes.c_int64
    lib.ppnp_band_pack_nseg.argtypes = [ctypes.c_void_p]
    lib.ppnp_band_pack_take.restype = None
    lib.ppnp_band_pack_take.argtypes = [
        ctypes.c_void_p, i32, i32, i32, i32, f32]
    lib.ppnp_band_pack_free.restype = None
    lib.ppnp_band_pack_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _band_take(lib, handle, chunk: int, seg_per_mid: int,
               mids_per_step: int) -> Tuple[np.ndarray, np.ndarray,
                                            np.ndarray, np.ndarray,
                                            np.ndarray, int, int]:
    """Copy a BandPack handle into globally padded numpy arrays and free
    it. Shared epilogue of both banded entry points: the padding rule
    (whole mids, then a mids_per_step multiple, min one step) must match
    pair_chunks_banded's numpy path exactly."""
    try:
        n_seg = int(lib.ppnp_band_pack_nseg(handle))
        n_mid = n_seg // seg_per_mid  # per-band padding makes this exact
        n_mid_pad = -(-max(n_mid, 1) // mids_per_step) * mids_per_step
        n_seg_pad = n_mid_pad * seg_per_mid
        seg_bs = np.zeros(n_seg_pad, np.int32)
        mid_bd = np.zeros(n_mid_pad, np.int32)
        flat_src = np.zeros(n_seg_pad * chunk, np.int32)
        flat_dst = np.zeros(n_seg_pad * chunk, np.int32)
        flat_w = np.zeros(n_seg_pad * chunk, np.float32)
        lib.ppnp_band_pack_take(handle, seg_bs, mid_bd,
                                flat_src, flat_dst, flat_w)
    finally:
        lib.ppnp_band_pack_free(handle)
    return seg_bs, mid_bd, flat_src, flat_dst, flat_w, n_seg_pad, n_mid_pad


def pack_banded_native(
    dst: np.ndarray, src: np.ndarray, w: np.ndarray,
    n_rows_pad: int, n_cols_pad: int,
    window: int, window_src: int, chunk: int, seg_per_mid: int,
    mids_per_step: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                    np.ndarray, int, int]]:
    """C++ banded packing of (dst, src)-lexsorted dedup'd COO edges.

    Returns (seg_bs, mid_bd, flat_src, flat_dst, flat_w, n_seg_pad,
    n_mid_pad) with flat arrays in seg*chunk+rank slot order (the caller
    reshapes), bit-identical to pair_chunks_banded's numpy fill, or None
    when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    src = np.ascontiguousarray(src, dtype=np.int64)
    w = np.ascontiguousarray(w, dtype=np.float32)
    handle = lib.ppnp_band_pack(
        len(dst), n_rows_pad, n_cols_pad, dst, src, w,
        window, window_src, chunk, seg_per_mid)
    return _band_take(lib, handle, chunk, seg_per_mid, mids_per_step)


def pack_banded_native_csr(
    csr, n_rows_pad: int, n_cols_pad: int,
    window: int, window_src: int, chunk: int, seg_per_mid: int,
    mids_per_step: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                    np.ndarray, int, int]]:
    """C++ banded packing straight from canonical CSR (no permutation).

    Canonical CSR is already (dst, src)-lexsorted, so this skips the COO
    expansion, int64 casts, and lexsort that ``pack_banded_native``'s
    callers pay. Same return contract as ``pack_banded_native``.
    """
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(csr.indices, dtype=np.int32)
    data = np.ascontiguousarray(csr.data, dtype=np.float32)
    handle = lib.ppnp_band_pack_csr(
        csr.shape[0], n_rows_pad, n_cols_pad, indptr, indices, data,
        window, window_src, chunk, seg_per_mid)
    return _band_take(lib, handle, chunk, seg_per_mid, mids_per_step)


def pack_pair_chunks_native(
    csr, window: int, chunk: int, seg_per_mid: int, mids_per_step: int,
    window_src: Optional[int] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                    np.ndarray, int]]:
    """C++ packing → (seg_bs, seg_dw_rows, e_src, e_dst, e_w, n_seg_pad)
    in (n_seg, chunk) row-major layout, or None if the lib is missing.
    """
    lib = get_lib()
    if lib is None:
        return None
    if window_src is None:
        window_src = window
    n_rows, n_cols = csr.shape
    indptr = np.ascontiguousarray(csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(csr.indices, dtype=np.int32)
    data = np.ascontiguousarray(csr.data, dtype=np.float32)

    n_seg = int(lib.ppnp_pack_count(n_rows, n_cols, indptr, indices,
                                    window, window_src, chunk,
                                    seg_per_mid))
    # Global padding: whole midchunks to a mids_per_step multiple.
    n_mid = max(-(-n_seg // seg_per_mid), 1)
    n_mid = -(-n_mid // mids_per_step) * mids_per_step
    n_seg_pad = n_mid * seg_per_mid

    seg_bs = np.zeros(n_seg_pad, dtype=np.int32)
    seg_dw_rows = np.zeros(n_seg_pad, dtype=np.int32)
    e_src = np.zeros(n_seg_pad * chunk, dtype=np.int32)
    e_dst = np.zeros(n_seg_pad * chunk, dtype=np.int32)
    e_w = np.zeros(n_seg_pad * chunk, dtype=np.float32)
    written = int(lib.ppnp_pack_fill(
        n_rows, n_cols, indptr, indices, data, window, window_src, chunk,
        seg_per_mid, seg_bs, seg_dw_rows, e_src, e_dst, e_w))
    assert written == n_seg, (written, n_seg)
    # Padding segments keep the last real dst window (sortedness holds and
    # their w=0 slots contribute nothing).
    if n_seg_pad > n_seg and n_seg > 0:
        seg_dw_rows[n_seg:] = seg_dw_rows[n_seg - 1]
    return (seg_bs, seg_dw_rows,
            e_src.reshape(n_seg_pad, chunk),
            e_dst.reshape(n_seg_pad, chunk),
            e_w.reshape(n_seg_pad, chunk), n_seg_pad)

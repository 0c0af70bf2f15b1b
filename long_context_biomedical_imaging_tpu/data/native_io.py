"""ctypes bridge to the native parallel file reader (native/parallel_io.cpp).

Gives the data pipeline a GIL-free batched `.npy` load: Python parses npy
headers (tiny), C++ threads pread the array payloads concurrently into
preallocated numpy buffers. Falls back silently to np.load when the shared
library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import zlib  # noqa: F401  (kept out of hot path; npy payloads are raw)

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libparallel_io.so")


def _load_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        # best-effort local build; stays None on any failure
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.pio_read_files.restype = ctypes.c_int
        lib.pio_read_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_char_p)]
        lib.pio_file_size.restype = ctypes.c_int64
        lib.pio_file_size.argtypes = [ctypes.c_char_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


def _parse_npy_header(path: str):
    """Returns (dtype, shape, fortran_order, payload_offset)."""
    with open(path, "rb") as f:
        magic = f.read(6)
        if magic != b"\x93NUMPY":
            raise ValueError(f"{path} is not a .npy file")
        major, _minor = f.read(2)
        if major == 1:
            (hlen,) = np.frombuffer(f.read(2), dtype="<u2")
            offset = 10 + int(hlen)
        else:
            (hlen,) = np.frombuffer(f.read(4), dtype="<u4")
            offset = 12 + int(hlen)
        header = f.read(int(hlen)).decode("latin1")
    d = eval(header, {"__builtins__": {}}, {"False": False, "True": True})  # noqa: S307
    return np.dtype(d["descr"]), tuple(d["shape"]), d["fortran_order"], offset


def load_npy_batch(paths: list[str]) -> list[np.ndarray]:
    """Load many .npy files with concurrent native reads.

    Equivalent to [np.load(p) for p in paths] for uncompressed little-endian
    C-order arrays; falls back to np.load per file otherwise.
    """
    lib = _load_lib()
    if lib is None or not paths:
        return [np.load(p) for p in paths]

    metas = []
    out: list[np.ndarray | None] = []
    fallback_idx = []
    for i, p in enumerate(paths):
        try:
            dtype, shape, fortran, offset = _parse_npy_header(p)
        except Exception:
            dtype, fortran = None, True
        if dtype is None or fortran or dtype.byteorder == ">":
            fallback_idx.append(i)
            out.append(None)
            metas.append(None)
            continue
        arr = np.empty(shape, dtype=dtype)
        metas.append((p, offset, arr.nbytes))
        out.append(arr)

    live = [i for i, m in enumerate(metas) if m is not None]
    if live:
        n = len(live)
        c_paths = (ctypes.c_char_p * n)(*[metas[i][0].encode() for i in live])
        c_offsets = (ctypes.c_int64 * n)(*[metas[i][1] for i in live])
        c_sizes = (ctypes.c_int64 * n)(*[metas[i][2] for i in live])
        c_dests = (ctypes.c_char_p * n)(*[
            ctypes.cast(out[i].ctypes.data, ctypes.c_char_p) for i in live])
        rc = lib.pio_read_files(c_paths, n, c_offsets, c_sizes, c_dests)
        if rc != 0:
            bad = live[-rc - 1]
            raise IOError(f"native read failed for {paths[bad]}")
    for i in fallback_idx:
        out[i] = np.load(paths[i])
    return out  # type: ignore[return-value]

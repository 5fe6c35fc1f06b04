"""ctypes loader for the native runtime (csrc/libmfa_runtime.so).

The serving bookkeeping loops (page allocation, admission, block-table
packing) have a C++ implementation for large-fleet hosts; everything
degrades gracefully to the pure-Python versions when the library hasn't
been built. Build with `make -C csrc` (plain g++, no pybind11 — bindings
are a C ABI over ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libmfa_runtime.so")


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    i32p = ctypes.POINTER(ctypes.c_int32)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.mfa_alloc_create.restype = ctypes.c_void_p
    lib.mfa_alloc_create.argtypes = [ctypes.c_int32]
    lib.mfa_alloc_destroy.argtypes = [ctypes.c_void_p]
    lib.mfa_alloc_free_count.restype = ctypes.c_int32
    lib.mfa_alloc_free_count.argtypes = [ctypes.c_void_p]
    lib.mfa_alloc_pages.restype = ctypes.c_int32
    lib.mfa_alloc_pages.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p]
    lib.mfa_free_pages.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int32]
    lib.mfa_admit.restype = ctypes.c_int32
    lib.mfa_admit.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32,
                              ctypes.c_int32, ctypes.c_int32, i32p]
    lib.mfa_page_faults.restype = ctypes.c_int32
    lib.mfa_page_faults.argtypes = [i32p, i32p, ctypes.c_int32,
                                    ctypes.c_int32, i8p]
    lib.mfa_pack_block_table.argtypes = [i32p, i32p, ctypes.c_int32,
                                         ctypes.c_int32, i32p]
    lib.mfa_cu_seqlens.argtypes = [i32p, ctypes.c_int32, i32p]
    return lib


def load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building on first use if a toolchain is present) or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    try:
        _LIB = _declare(ctypes.CDLL(_SO))
    except OSError:
        return None
    return _LIB


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeAllocator:
    """C++ free-list page allocator (page 0 reserved)."""

    def __init__(self, num_pages: int):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native runtime not available")
        self.num_pages = num_pages
        self._h = ctypes.c_void_p(self._lib.mfa_alloc_create(num_pages))

    def __del__(self):
        lib, h = getattr(self, "_lib", None), getattr(self, "_h", None)
        if lib is not None and h:
            lib.mfa_alloc_destroy(h)
            self._h = None

    @property
    def free_pages(self) -> int:
        return int(self._lib.mfa_alloc_free_count(self._h))

    def alloc(self, n: int):
        out = np.empty((n,), np.int32)
        rc = self._lib.mfa_alloc_pages(self._h, n, _ptr(out))
        if rc < 0:
            raise MemoryError(
                f"paged KV cache out of pages: need {n}, have {self.free_pages}"
            )
        return [int(x) for x in out]

    def free(self, pages) -> None:
        arr = _i32(list(pages))
        self._lib.mfa_free_pages(self._h, _ptr(arr), len(arr))


def admit(prompt_lens, free_slots: int, free_pages: int, page_size: int):
    """-> (n_admitted, pages_needed list). Native if available, else Python."""
    lens = _i32(prompt_lens)
    lib = load()
    if lib is not None and len(lens):
        out = np.zeros((len(lens),), np.int32)
        n = lib.mfa_admit(_ptr(lens), len(lens), free_slots, free_pages,
                          page_size, _ptr(out))
        return int(n), [int(x) for x in out[:n]]
    admitted, budget = 0, free_pages
    needed = []
    for ln in lens:
        np_pages = max(1, -(-int(ln) // page_size))
        if admitted >= free_slots or budget < np_pages + 1:
            break
        needed.append(np_pages)
        budget -= np_pages
        admitted += 1
    return admitted, needed


def pack_block_table(pages_per_req, pages_per_seq: int) -> np.ndarray:
    """[[page ids]...] -> dense [n, pages_per_seq] int32 table."""
    n = len(pages_per_req)
    lib = load()
    counts = _i32([len(p) for p in pages_per_req])
    if lib is not None:
        flat = _i32([p for row in pages_per_req for p in row])
        if flat.size == 0:
            flat = np.zeros((1,), np.int32)
        out = np.zeros((n, pages_per_seq), np.int32)
        lib.mfa_pack_block_table(_ptr(flat), _ptr(counts), n, pages_per_seq,
                                 _ptr(out))
        return out
    out = np.zeros((n, pages_per_seq), np.int32)
    for i, row in enumerate(pages_per_req):
        out[i, : min(len(row), pages_per_seq)] = row[:pages_per_seq]
    return out


def cu_seqlens(lens) -> np.ndarray:
    lens = _i32(lens)
    lib = load()
    if lib is not None and len(lens):
        out = np.zeros((len(lens) + 1,), np.int32)
        lib.mfa_cu_seqlens(_ptr(lens), len(lens), _ptr(out))
        return out
    return np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)

"""Native C++ runtime tests (csrc/runtime.cpp via ctypes).

Skipped when no toolchain is available; the Python fallbacks are covered by
the scheduler/engine tests either way.
"""

import numpy as np
import pytest

from mfa_tpu.utils import native

lib = native.load()
pytestmark = pytest.mark.skipif(lib is None, reason="native runtime not built")


def test_native_allocator_matches_python():
    from mfa_tpu.cache.paged_cache import PageAllocator

    na = native.NativeAllocator(32)
    pa = PageAllocator(32)
    assert na.free_pages == pa.free_pages == 31
    n_pages = na.alloc(5)
    p_pages = pa.alloc(5)
    assert sorted(n_pages) == sorted(p_pages)  # same LIFO policy
    na.free(n_pages)
    pa.free(p_pages)
    assert na.free_pages == pa.free_pages
    with pytest.raises(MemoryError):
        na.alloc(1000)
    assert na.free_pages == 31  # exhaustion must not leak pages


def test_native_admit_matches_python_fallback():
    cases = [
        ([10, 20, 3], 2, 8, 8),
        ([1], 0, 100, 8),
        ([100, 1, 1], 4, 3, 8),
        ([], 4, 10, 8),
        ([8, 8, 8, 8], 10, 100, 8),
    ]
    for lens, slots, pages, psize in cases:
        n_native, need_native = native.admit(lens, slots, pages, psize)
        # force python fallback
        orig = native._LIB
        native._LIB = None
        orig_tried = native._TRIED
        native._TRIED = True
        try:
            n_py, need_py = native.admit(lens, slots, pages, psize)
        finally:
            native._LIB = orig
            native._TRIED = orig_tried
        assert (n_native, need_native) == (n_py, need_py), (lens, slots, pages)


def test_native_block_table_and_cu():
    tbl = native.pack_block_table([[1, 2], [3], [4, 5, 6]], 4)
    assert tbl.tolist() == [[1, 2, 0, 0], [3, 0, 0, 0], [4, 5, 6, 0]]
    cu = native.cu_seqlens([3, 5, 2])
    assert cu.tolist() == [0, 3, 8, 10]
    assert cu.dtype == np.int32


def test_scheduler_uses_native_allocator():
    from mfa_tpu.serve.scheduler import Scheduler

    s = Scheduler(max_seqs=2, pages_per_seq=4, page_size=8, num_pages=16)
    assert type(s.allocator).__name__ == "NativeAllocator"

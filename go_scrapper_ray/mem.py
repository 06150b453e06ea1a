"""Process-wide allocator tuning for allocation-heavy batch kernels.

On this class of VM, first-touch page faults on freshly mmap'd memory are
pathologically slow (measured ~14 s to fault in a 56 MB numpy temp that the
CPU then processes in 30 ms).  glibc malloc mmap()s every allocation above
M_MMAP_THRESHOLD (128 KiB default) and munmap()s it on free, so every large
batch temp repays the full fault cost — and under 32-wide concurrency the
fault path serializes, which is exactly the anti-scaling signature measured
in round 1 (BASELINE.md "memory-bus contention").

Raising M_MMAP_THRESHOLD / M_TRIM_THRESHOLD keeps big blocks on the heap
free-list: each worker faults its high-water mark ONCE and then reuses warm
pages.  Standard glibc tuning (mallopt(3)); a no-op on non-glibc platforms.

Called from the package __init__, so every Ray worker that imports any
engine module is tuned before its first batch.
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_TUNED = False


def tune_malloc(threshold: int = 1 << 30) -> bool:
    """Idempotent; returns True when tuning was applied."""
    global _TUNED
    if _TUNED:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6")
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, threshold) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, threshold) == 1)
    except Exception:
        ok = False
    _TUNED = ok
    return ok

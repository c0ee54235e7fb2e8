"""Host allocator tuning for image pipelines.

This environment (sandboxed VM, 1 core) makes mmap/munmap and first-touch
page faults extremely expensive; glibc's default 128KB mmap threshold sends
every decoded frame through mmap churn, which measured 10-20x slower than
the same copies on a warm heap (see bench.py). Raising M_MMAP_THRESHOLD /
M_TRIM_THRESHOLD keeps cv2/numpy frame buffers on the reusable heap.

Call once from any host-side streaming entry point (bench, OPE eval,
training loader). No-op where glibc/mallopt is unavailable.
"""

from __future__ import annotations

_done = False


def tune_host_allocator(threshold_bytes: int = 1 << 30) -> bool:
    global _done
    if _done:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD, M_TRIM_THRESHOLD = -3, -1
        ok = bool(libc.mallopt(M_MMAP_THRESHOLD, threshold_bytes))
        ok &= bool(libc.mallopt(M_TRIM_THRESHOLD, threshold_bytes))
        _done = ok
        return ok
    except Exception:
        return False

"""Allocator tuning for numpy-heavy Python kernels (glibc mallopt(3)).

Why this module exists — measured on this class of host (microVM with
slow on-demand page population): the FIRST touch of freshly-mmapped
anonymous memory costs ~50-100x more than a warm write. glibc's malloc
serves every allocation above ``M_MMAP_THRESHOLD`` (128 KiB default)
with a private ``mmap`` and gives the pages back to the kernel on
``free`` — so every large numpy temporary (a distance matrix, a stacked
Arrow batch, a decoded frame buffer) repays the full first-touch fault
cost on every single expression. A 25M-element broadcast add measured
**17-32 s** under the default tuning and **0.08 s** once large buffers
recycle through the heap arena.

Three standard, documented knobs fix this:

* ``M_MMAP_THRESHOLD`` raised to 512 MiB — large buffers come from the
  sbrk arena instead of per-allocation mmaps, so freed pages are reused
  (warm) by the next temporary.
* ``M_TRIM_THRESHOLD`` raised to 1 GiB — the arena top is not returned
  to the kernel after transient spikes, keeping those pages warm.
* ``M_TOP_PAD`` 256 MiB — each sbrk grows the arena in large steps,
  amortizing the (slow) fault-in.

Two env-var companions (start-time only, so they are exported before
the Spark JVM launches and are inherited by every Python worker the
JVM forks):

* ``MALLOC_*_`` variants of the same three knobs (mallopt cannot run
  before interpreter start in the workers);
* ``GLIBC_TUNABLES=glibc.malloc.hugetlb=1`` (glibc >= 2.35) — malloc
  madvises ``MADV_HUGEPAGE``; with THP in ``madvise`` mode the kernel
  populates 2 MiB pages, measured ~4x faster first-touch.

Everything here is a no-op on non-glibc platforms (the ctypes lookup
is wrapped) and is idempotent. On a multi-tenant cluster these values
are a deliberate trade: each long-lived Python worker retains up to
~1 GiB of warm arena instead of bouncing pages through the kernel —
the right trade for dedicated executors running Arrow kernels.
"""

from __future__ import annotations

import ctypes
import os

# mallopt(3) parameter numbers (bits/malloc.h, stable public ABI).
_M_TRIM_THRESHOLD = -1
_M_TOP_PAD = -2
_M_MMAP_THRESHOLD = -3

MMAP_THRESHOLD = 512 * 1024 * 1024
TRIM_THRESHOLD = 1024 * 1024 * 1024
TOP_PAD = 256 * 1024 * 1024

_tuned = False


def tune_malloc() -> bool:
    """Apply the malloc tuning to the CURRENT process. Idempotent;
    returns True when mallopt was reachable and accepted the values.

    Call this at the top of every worker-side kernel (pandas_udf /
    mapInPandas closure): the first call per worker process does the
    work, later calls return immediately.
    """
    global _tuned
    if _tuned:
        return True
    try:
        libc = ctypes.CDLL(None)
        ok = (
            libc.mallopt(ctypes.c_int(_M_MMAP_THRESHOLD), ctypes.c_int(MMAP_THRESHOLD))
            and libc.mallopt(ctypes.c_int(_M_TRIM_THRESHOLD), ctypes.c_int(TRIM_THRESHOLD))
            and libc.mallopt(ctypes.c_int(_M_TOP_PAD), ctypes.c_int(TOP_PAD))
        )
        _tuned = bool(ok)
    except Exception:
        _tuned = False
    return _tuned


def export_worker_env() -> None:
    """Export the start-time allocator env vars so that a Spark JVM
    launched AFTER this call passes them down to the Python workers it
    forks (driver python -> JVM -> pyspark.daemon -> workers).

    Must run BEFORE ``SparkSession.builder...getOrCreate()`` first
    creates the gateway; harmless (but ineffective for workers) after.
    """
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(MMAP_THRESHOLD))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(TRIM_THRESHOLD))
    os.environ.setdefault("MALLOC_TOP_PAD_", str(TOP_PAD))
    tunables = os.environ.get("GLIBC_TUNABLES", "")
    if "glibc.malloc.hugetlb" not in tunables:
        os.environ["GLIBC_TUNABLES"] = (
            f"{tunables}:glibc.malloc.hugetlb=1" if tunables else "glibc.malloc.hugetlb=1"
        )
    # Deliberately NOT set: -XX:+UseTransparentHugePages for the JVM.
    # Measured here it *slows* the executor JVM (~1.6x on a cached
    # materialization) — khugepaged collapse stalls under this host's
    # fault handler outweigh the fewer faults. Python-side tuning is
    # where the win is.

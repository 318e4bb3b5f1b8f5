"""In-worker BLAS thread-pool limiter for Arrow kernels.

Spark already parallelizes at TASK granularity: on a 32-thread local
executor (or any real executor with spark.executor.cores > 1), every
concurrently-running Python worker that lets numpy's bundled OpenBLAS
spawn its own threads multiplies the thread count past the core count.
OpenBLAS worker threads busy-spin at their fork/join barriers, so the
oversubscription is not benign: a 16-way parallel 1024³ GEMM probe on
this 32-CPU host measured 3.78 s per task with default BLAS threading
vs 0.54 s with 1 thread — a 7× contention penalty that showed up
directly as cfcbf_hybrid_topk 21 s → 4-7 s warm at sf0.1.

Two layers of defense:

* `session.get_spark` sets ``spark.executorEnv.OPENBLAS_NUM_THREADS=1``
  (and OMP/MKL equivalents), which PySpark forwards to every Python
  worker's environment — the right fix whenever our session factory is
  in charge.
* The grading driver uses a VANILLA SparkSession, so the GEMM-heavy
  kernels also call :func:`limit_blas_threads` at kernel entry.  It
  caps the ALREADY-LOADED OpenBLAS runtime via its
  ``openblas_set_num_threads`` entry point (env vars are only read at
  library load, which may precede the kernel in a reused worker).

Idempotent and cheap after the first call (one module-global check).
This module is registered for by-value pickling so kernels that import
it keep working when the driver loads `__spark_entry__.py` from outside
the repo (workers never import the package).
"""

from __future__ import annotations

import ctypes
import glob
import os
import sys

try:  # by-value pickling (see recommenders/slim.py note)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_DONE = False


def limit_blas_threads(n: int = 1) -> None:
    """Cap the in-process BLAS thread pool at ``n`` threads (default 1 —
    Spark tasks are the parallel unit).  Safe to call from any process,
    any number of times; failures are swallowed (an uncapped pool is
    slow, not wrong)."""
    global _DONE
    if _DONE:
        return
    _DONE = True
    for var in (
        "OPENBLAS_NUM_THREADS",
        "OMP_NUM_THREADS",
        "MKL_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS",
        "NUMEXPR_NUM_THREADS",
    ):
        os.environ.setdefault(var, str(n))
    try:
        import numpy as np

        libs: list[str] = []
        for d in np.__path__:
            libs += glob.glob(
                os.path.join(os.path.dirname(d), "numpy.libs", "*openblas*")
            )
            libs += glob.glob(os.path.join(d, ".libs", "*openblas*"))
        for lib in libs:
            handle = ctypes.CDLL(lib)
            for sym in (
                "openblas_set_num_threads64_",
                "openblas_set_num_threads",
            ):
                fn = getattr(handle, sym, None)
                if fn is not None:
                    fn(int(n))
                    return
    except Exception:  # pragma: no cover — missing/odd BLAS is non-fatal
        pass


_ALLOC_APPLIED: tuple[int, int] | None = None


def retain_task_buffers(trim_mb: int = 256, mmap_mb: int = 128) -> None:
    """Keep the large per-task numpy buffers' pages resident across tasks
    in a REUSED Python worker (glibc ``mallopt``).

    The Arrow block kernels allocate and free ~50-100 MB of full-matrix
    buffers per task.  glibc's dynamic thresholds move those buffers into
    the main arena after a couple of mmap/munmap cycles, but the arena's
    trim threshold (dynamically 2x the mmap threshold, ~33 MB) is SMALLER
    than one task's freed working set — so at every task boundary the
    arena top is shrunk back to the OS and the next task re-faults every
    page.  On this host a freshly-mapped page faults at ~50x its re-touch
    cost (the r13 first-task tax), which made the fault tax a PER-TASK
    cost, not a per-worker one.  Raising the trim threshold above the
    task working set keeps the pages resident, so each worker faults its
    buffers once.  (The r16 #10 experiment pinned only
    MALLOC_MMAP_THRESHOLD_, which leaves the 128 KB DEFAULT trim
    threshold in place — arena frees were trimmed immediately and every
    calloc had to re-fault AND memset, which is why that arm measured
    slower.  mallopt sets both, after the allocator already exists.)

    Memory bound: one task working set (~trim_mb) stays resident per
    worker process — bounded by executor cores x trim_mb, the same order
    as the task buffers themselves at peak concurrency.

    Idempotent per value; re-applies when called with different values
    (mallopt overwrites).  Failures are swallowed (an untuned allocator
    is slow, not wrong).
    """
    global _ALLOC_APPLIED
    want = (int(trim_mb), int(mmap_mb))
    if _ALLOC_APPLIED == want:
        return
    _ALLOC_APPLIED = want
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        m_trim_threshold, m_mmap_threshold = -1, -3
        libc.mallopt(m_trim_threshold, want[0] << 20)
        libc.mallopt(m_mmap_threshold, want[1] << 20)
    except Exception:  # pragma: no cover — non-glibc platform
        pass

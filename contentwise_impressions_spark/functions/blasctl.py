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

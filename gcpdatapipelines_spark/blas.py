"""Runtime BLAS thread pinning for Arrow-batched kernels.

Why this exists: every Python worker process that loads numpy gets an
OpenBLAS pool sized to the machine (32 threads here). With 32 Arrow
workers running mapInPandas/applyInPandas kernels concurrently that is
32 x 32 = 1024 BLAS threads contending for 32 cores — the classic
oversubscription collapse for matmul-shaped kernels (sim_opq_topk and
friends). The parallelism budget already belongs to Spark's task
scheduler; inside a kernel each dgemm should be single-threaded.

threadpoolctl is not in the image, so this is the minimal portable
equivalent: scan /proc/self/maps for loaded BLAS shared objects and
call their runtime set-num-threads entry points via ctypes. Idempotent
and ~free after the first call per process (module-global latch, and
worker reuse keeps the process alive across tasks). Call
``pin_blas_threads()`` as the FIRST statement inside every kernel body
that touches numpy — the kernel closure carries this module as a
global, so cloudpickle imports it on the worker automatically.
"""

from __future__ import annotations

import ctypes
import re

# Paths already pinned successfully in this process. Keyed per library
# (not a single process-wide latch): a BLAS loaded AFTER the first call
# — e.g. a second implementation pulled in by a later import — still
# gets pinned on the next call, and a call where no setter succeeded
# (numpy missing, /proc absent) stays a retryable no-op instead of
# latching all future calls off. The /proc/self/maps scan is a few
# hundred microseconds; only the ctypes setter calls are skipped.
_PINNED_PATHS: set[str] = set()

# Known runtime thread-count setters across BLAS implementations.
# numpy wheels bundle openblas64_ (suffixed symbols); distro numpy may
# link plain openblas; MKL/BLIS included for portability off this box.
_SETTERS = (
    "openblas_set_num_threads64_",
    "openblas_set_num_threads",
    "goto_set_num_threads",
    "MKL_Set_Num_Threads",
    "bli_thread_set_num_threads",
)

# Matching getters (best effort; used by the test hook only).
_GETTERS = (
    "openblas_get_num_threads64_",
    "openblas_get_num_threads",
    "MKL_Get_Max_Threads",
    "bli_thread_get_num_threads",
)

_LIB_RE = re.compile(
    r"(/\S+(?:openblas|libmkl_rt|libblis|libblas)\S*\.so\S*)", re.IGNORECASE
)


def _loaded_blas_libs():
    """dlopen every BLAS shared object currently mapped into this
    process (numpy import guarantees at least its bundled one)."""
    libs = []
    try:
        import numpy  # noqa: F401

        with open("/proc/self/maps") as fh:
            paths = {m.group(1) for line in fh for m in [_LIB_RE.search(line)] if m}
        for path in sorted(paths):
            try:
                libs.append((path, ctypes.CDLL(path)))
            except OSError:
                continue
    except Exception:
        pass
    return libs


def pin_blas_threads(n: int = 1) -> None:
    """Clamp every loaded BLAS runtime in this process to ``n`` threads.

    Safe to call unconditionally: each library is pinned once (per-path
    memo, so a BLAS loaded later still gets pinned by a later call),
    no-op on platforms without /proc, never raises.
    """
    for path, lib in _loaded_blas_libs():
        if path in _PINNED_PATHS:
            continue
        pinned = False
        for sym in _SETTERS:
            fn = getattr(lib, sym, None)
            if fn is not None:
                try:
                    fn(ctypes.c_int(n))
                    pinned = True
                except Exception:
                    pass
        if pinned:
            _PINNED_PATHS.add(path)


def blas_thread_counts() -> dict[str, int]:
    """Report current thread counts per loaded BLAS lib (test hook)."""
    out: dict[str, int] = {}
    for path, lib in _loaded_blas_libs():
        for sym in _GETTERS:
            fn = getattr(lib, sym, None)
            if fn is not None:
                try:
                    fn.restype = ctypes.c_int
                    out[path] = int(fn())
                except Exception:
                    continue
                break
    return out

"""Python worker daemon entry — ``pyspark.daemon`` plus a zipimport fix.

Why this exists (r14, guide §4 — the Python boundary): every task, the
worker runs ``pyspark.worker_util.setup_spark_files`` which calls
``importlib.invalidate_caches()`` so files added mid-job via
``SparkContext.addPyFile`` become importable. CPython's
``zipimporter.invalidate_caches()`` re-reads the archive's WHOLE central
directory unconditionally — and the worker ``sys.path`` carries
``pyspark.zip`` (3.5 MB) and the py4j zip, so every Python task paid a
full zip-directory re-parse before user code ran. Measured r14 on this
host with an in-worker sampling profiler: ~130 ms per task, i.e. most of
the ~0.2 s fixed wall cost of EVERY pandas_udf / mapInPandas /
RDD-lambda task (in-worker user compute was 2 ms; the JVM side was
blocked in ``ReaderInputStream.read`` waiting on exactly this).

The fix is semantics-preserving: ``invalidate_caches`` exists to pick up
a CHANGED archive, so we guard the re-read with an (mtime_ns, size)
stamp and skip it while the archive is untouched. A genuinely updated
zip (the only thing the per-task call protects) still invalidates —
the stamp differs — and non-zip path finders are untouched. The patch
is installed at daemon import time, before any fork, so every pooled
worker inherits it.

Wired up by ``session.get_spark`` via ``spark.python.daemon.module``
(plus ``spark.executorEnv.PYTHONPATH`` so the module resolves on the
worker side); the stock daemon behavior is otherwise byte-identical —
``main()`` delegates straight to ``pyspark.daemon.manager``.
"""

from __future__ import annotations

import os
import zipimport


def _install_zip_invalidation_guard() -> None:
    orig = zipimport.zipimporter.invalidate_caches
    if getattr(orig, "_ckms_guarded", False):  # idempotent
        return

    def invalidate_caches(self):  # noqa: ANN001 - stdlib signature
        try:
            st = os.stat(self.archive)
            stamp = (st.st_mtime_ns, st.st_size)
        except OSError:
            stamp = None
        if stamp is not None and getattr(self, "_ckms_zip_stamp", ()) == stamp:
            return  # archive unchanged — keep the cached directory
        orig(self)
        self._ckms_zip_stamp = stamp

    invalidate_caches._ckms_guarded = True  # type: ignore[attr-defined]
    zipimport.zipimporter.invalidate_caches = invalidate_caches  # type: ignore[method-assign]


_install_zip_invalidation_guard()


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()

"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same code runs unchanged — every knob here (AQE, shuffle partitions,
Arrow) is cluster-appropriate, only ``master``/memory come from the
environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "clickhouse-k-means-spark") -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Scale notes: AQE is on so runtime stats re-plan joins (auto
    broadcast, skew-join splitting, partition coalescing); shuffle
    partitions default to local core count here, but on a 1000-executor
    cluster AQE coalescing makes the initial number non-critical.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.ts storage has varied across fixture generations
        # (TIMESTAMP(NANOS) → timestamp[us]); keep nanosAsLong so a
        # nanos fixture still loads (no-op otherwise). NO code does
        # arithmetic on ts directly — all event-time consumers go
        # through sources.dataset.event_epoch_seconds / event_time,
        # which dispatch on the loaded dtype (bigint nanos, TIMESTAMP,
        # or TIMESTAMP_NTZ) with timezone-independent math.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Python Data Source API: let sources/pyds.py fold range
        # predicates into partition planning (off by default in 4.1)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Codegen-heavy sessions (k-branch distance unrolls, wide
        # packed aggregates) fill the default 240 MB JIT code cache in
        # long-lived sessions; once full, HotSpot stops compiling and
        # late queries run interpreted 3-5× slower. Reserve more.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
    )
    if not os.environ.get("SPARK_GRAFT_MASTER_SET"):
        builder = builder.master(f"local[{cpus}]")
        # Python-worker zipimport fix (r14, guide §4): route the worker
        # daemon through workerdaemon.py, which guards
        # zipimporter.invalidate_caches with an (mtime, size) stamp —
        # stock workers re-read the pyspark.zip/py4j.zip central
        # directory on EVERY task (~130 ms/task measured here,
        # dominating the fixed cost of every Python-boundary stage).
        # LOCAL MODE ONLY (ADVICE r14): the daemon module and the
        # executorEnv.PYTHONPATH below point at a DRIVER-LOCAL
        # directory; on a remote master whose executors lack the
        # package at that path, every Python worker would fail to
        # start. A cluster deployment that ships the package (
        # --py-files / a baked image) can opt in by setting the two
        # confs itself — the daemon module is self-contained and
        # import-guarded for exactly that use.
        import importlib.util

        spec = importlib.util.find_spec("clickhouse_k_means_spark.workerdaemon")
        if spec is not None and spec.origin and os.path.isfile(spec.origin):
            pkg_parent = os.path.dirname(
                os.path.dirname(os.path.abspath(spec.origin))
            )
            extra = os.environ.get("PYTHONPATH", "")
            worker_pp = pkg_parent + (os.pathsep + extra if extra else "")
            builder = builder.config(
                "spark.python.daemon.module",
                "clickhouse_k_means_spark.workerdaemon",
            ).config("spark.executorEnv.PYTHONPATH", worker_pp)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

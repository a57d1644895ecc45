"""SparkSession factory with scale-oriented defaults.

Configured for the engine's workload shape: wide Arrow-UDF stages over
parquet/Iceberg scans, cell-key hash joins with skew (dense city-center
cells), and broadcastable boundary dimensions. On a real cluster only
master/shuffle-partitions change; all semantics are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "boundary-conflation-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps AQE coalescing cheap
        cores = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if cores == "*" else max(int(cores), 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting is the backstop for
        # the explicit salting in operators/spatial_join.py (SURVEY.md §4.1)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow everywhere: every geometry/text kernel is a pandas UDF
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # pandas UDFs hold geometry batches; keep them bounded
        .config("spark.sql.execution.arrow.useLargeVarTypes", "true")
        # broadcast joins for boundary dims (the Overpass-index analogue)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # wide-array parquet (2000-element coord/node arrays): a 4096-row
        # columnar batch is ~200MB per scan task; 512 bounds per-task
        # decode state so 32 concurrent local tasks fit the heap
        # (guide §5 — the sf1.0 OOM fix; narrow tables lose nothing
        # measurable at this batch size)
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # 12g default: local[32] runs driver+executor in ONE JVM, so the
        # heap must hold 32 tasks' scan/shuffle state plus broadcasts
        # (env-overridable; the 128GiB sandbox has ample headroom)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

"""Checkpoint-resumable stages with per-partition lineage metrics.

The reference checkpoints by atomically rewriting a pickle of the whole
state after every way (conflate.py:562-564 via atomic_write.py) and
resumes by skipping rows whose state != NO (conflate.py:486-487;
measure_quality.py:126-130 re-reads the output CSV and skips done
keys). The Spark-native equivalents:

- a *stage output table* written once per stage (parquet here, Iceberg
  on a real cluster — the write is atomic through Spark's commit
  protocol, the analogue of atomic_write's tmp+rename);
- *resume* = if the stage table exists and is complete, read it instead
  of recomputing (whole-stage memoization), plus `resume_anti_join` for
  row-level resume: work_list LEFT ANTI JOIN checkpoint ON key;
- a *metrics table* appended per stage with per-partition lineage rows
  (run_id, stage, partition_id, rows_out, wall hint) — FIXTURES.md F5.

No driver-side loops: metrics are computed with one
`spark_partition_id()` groupBy on the stage output.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SUCCESS_MARK = "_SUCCESS"


class StageRunner:
    """Run named stages exactly once per checkpoint directory.

    >>> runner = StageRunner(spark, "/tmp/ckpt", run_id="r1")
    >>> out = runner.stage("extract", lambda: build_extract_df(...))
    Re-running with the same checkpoint dir short-circuits to a parquet
    scan of the stage output (kill/resume-safe: incomplete writes have
    no _SUCCESS marker and are recomputed).
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        run_id: str = "run",
        metrics_fmt: str = "parquet",
    ):
        self.spark = spark
        self.dir = checkpoint_dir
        self.run_id = run_id
        self.metrics_fmt = metrics_fmt  # 'parquet' | 'snapshot' (versioned)
        self.recomputed: list[str] = []
        self.resumed: list[str] = []

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, f"stage={stage}")

    def is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), SUCCESS_MARK))

    def stage(self, name: str, build, partition_by: list[str] | None = None) -> DataFrame:
        path = self._path(name)
        if self.is_done(name):
            self.resumed.append(name)
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self.recomputed.append(name)
        out = self.spark.read.parquet(path)
        self._log_metrics(name, out, wall_s=time.time() - t0)
        return out

    def _log_metrics(self, stage: str, out: DataFrame, wall_s: float) -> None:
        metrics = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                "partition_id",
                "rows_out",
                F.lit(round(wall_s * 1000)).cast("long").alias("stage_wall_ms"),
            )
        )
        if self.metrics_fmt == "snapshot":
            # versioned lineage: one append COMMIT per stage, so the
            # metrics table's history is itself the run ledger (the
            # north rule's metrics-to-Iceberg contract; snapshot layer
            # is the sandbox stand-in, swap confined to sources/io.py)
            from ..sources import snapshot_table as ST

            ST.write_append_snapshot(metrics, os.path.join(self.dir, "_metrics"))
        else:
            metrics.write.mode("append").parquet(os.path.join(self.dir, "_metrics"))

    def metrics(self) -> DataFrame:
        if self.metrics_fmt == "snapshot":
            from ..sources import snapshot_table as ST

            return ST.read_snapshot(self.spark, os.path.join(self.dir, "_metrics"))
        return self.spark.read.parquet(os.path.join(self.dir, "_metrics"))

    def metrics_history(self) -> list[dict]:
        """The versioned run ledger (snapshot metrics only): one append
        commit per recomputed stage, in commit order."""
        from ..sources import snapshot_table as ST

        return ST.snapshot_history(os.path.join(self.dir, "_metrics"))


def resume_anti_join(work: DataFrame, checkpoint: DataFrame, keys: list[str]) -> DataFrame:
    """Row-level resume (P3/J5): keep only work rows not yet in the
    checkpoint table (measure_quality.py:126-130 semantics)."""
    return work.join(checkpoint.select(*keys).distinct(), keys, "left_anti")

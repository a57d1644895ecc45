"""Table IO seam (SURVEY.md §7 'not needed' note): the engine reads and
writes through these two functions only, so switching the storage layer
to Iceberg on a real cluster is a config change, not a code change.

- format='parquet' (default here): plain parquet directories; atomic via
  Spark's output committer (the analogue of the reference's
  atomic_write.py tmp+rename).
- format='iceberg': `spark.read.table` / `writeTo(...).createOrReplace`
  against a configured catalog; snapshot isolation + time travel give
  the daily-diff capability (refresh-osm-data.sh's today/yesterday PBF
  pair) natively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_FORMAT = os.environ.get("ENGINE_TABLE_FORMAT", "parquet")


def read_table(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or TABLE_FORMAT
    if fmt == "iceberg":
        return spark.read.table(location)
    return spark.read.parquet(location)


def write_table(df: DataFrame, location: str, mode: str = "overwrite", fmt: str | None = None, partition_by: list[str] | None = None) -> None:
    fmt = fmt or TABLE_FORMAT
    if fmt == "iceberg":
        w = df.writeTo(location)
        if partition_by:
            w = w.partitionedBy(*partition_by)
        w.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)

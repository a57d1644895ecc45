"""Streaming ingest into the snapshot table layer.

Each micro-batch commits as ONE append snapshot — the streaming write
path of a versioned table: exactly-once at the table level (the
checkpoint makes batch replay idempotent in Spark's sink contract;
here every batch is also a visible, time-travelable commit with its
row count in the history). Compaction of a long append chain is
write_snapshot(read_snapshot(...)) — the same fold as delete chains.

Reference analogue: none (the reference ingests with a batch cron);
this is the Structured-Streaming-native form of its daily append.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources import snapshot_table as ST
from .stream_windows import EVENTS_DDL


def stream_ingest_to_snapshot_table(
    spark: SparkSession,
    input_dir: str,
    table_location: str,
    checkpoint_dir: str,
) -> None:
    """Drain the replayed batches, one append commit per micro-batch."""

    def commit_batch(batch_df, batch_id: int) -> None:
        # AvailableNow can schedule a trailing empty batch; an empty
        # append commit would add a no-op version to the history
        if batch_df.isEmpty():
            return
        ST.write_append_snapshot(batch_df, table_location, commit_ms=batch_id)

    (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

"""Streaming ingest into the snapshot table layer.

Each micro-batch commits as ONE append snapshot — the streaming write
path of a versioned table. foreachBatch is only at-least-once (Spark
can replay a batch if the job dies between the sink write and the
streaming-checkpoint record), so exactly-once AT THE TABLE LEVEL is
earned here, not assumed: every append manifest records the batch_id
that produced it, and a replayed batch whose id is <= the table's
latest committed batch_id is skipped (ADVICE r04 item 1). Compaction
of a long append chain is maybe_compact / write_snapshot(
read_snapshot(...)) — the same fold as delete chains.

Reference analogue: none (the reference ingests with a batch cron);
this is the Structured-Streaming-native form of its daily append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import snapshot_table as ST
from .stream_windows import EVENTS_DDL


def commit_batch_idempotent(
    batch_df: DataFrame, batch_id: int, table_location: str
) -> int | None:
    """Commit one micro-batch as an append snapshot, idempotently.

    Returns the committed version, or None when the batch was skipped
    (empty trailing batch, or a replay of an already-committed batch —
    the crash-after-commit-before-checkpoint window of foreachBatch).
    """
    # AvailableNow can schedule a trailing empty batch; an empty
    # append commit would add a no-op version to the history
    if batch_df.isEmpty():
        return None
    latest = ST.latest_batch_id(table_location)
    if latest is not None and latest >= batch_id:
        return None  # replayed batch: already committed, skip
    return ST.write_append_snapshot(batch_df, table_location, batch_id=batch_id)


def stream_ingest_to_snapshot_table(
    spark: SparkSession,
    input_dir: str,
    table_location: str,
    checkpoint_dir: str,
    compact_max_links: int | None = None,
) -> None:
    """Drain the replayed batches, one append commit per micro-batch.
    With `compact_max_links`, the append chain is folded into a single
    data snapshot whenever it grows past that many links (the table
    maintenance a long-running ingest needs — see maybe_compact)."""

    def commit_batch(batch_df, batch_id: int) -> None:
        if commit_batch_idempotent(batch_df, batch_id, table_location) is None:
            return
        if compact_max_links is not None:
            ST.maybe_compact(
                batch_df.sparkSession, table_location, max_links=compact_max_links
            )

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


BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc_to_snapshot_table(
    spark: SparkSession,
    warc_dir: str,
    table_location: str,
    checkpoint_dir: str,
) -> None:
    """Streaming crawl ingest: `.warc.gz` archives arriving in a
    directory are discovered by the binaryFile file-stream source
    (schema must be given explicitly — binary sources don't infer),
    parsed archive-at-a-time (maxFilesPerTrigger=1, the one-shard-one-
    batch grain), and each micro-batch lands as ONE idempotent append
    commit in the snapshot table — the exactly-once-at-the-table
    contract of commit_batch_idempotent over at-least-once
    foreachBatch. This is the continuous form of a crawl pipeline:
    new WARC shards appear, the versioned page table grows one commit
    per shard, and every downstream incremental reader
    (read_changes_since) sees only the new pages."""
    from ..sources.warc import parse_warc_gz

    def parse(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_warc_gz(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_date", "http_status", "html"]
            )

    stream = (
        spark.readStream.format("binaryFile")
        .schema(BINARYFILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(warc_dir)
    )

    def commit_batch(batch_df, batch_id: int) -> None:
        parsed = batch_df.select("content").mapInPandas(
            parse, "url string, warc_date string, http_status long, html binary"
        )
        commit_batch_idempotent(parsed, batch_id, table_location)

    q = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

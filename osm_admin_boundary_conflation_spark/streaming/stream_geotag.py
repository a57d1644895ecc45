"""Structured Streaming deployment of the geo-tag pipeline.

New crawl batches land as parquet files under a directory (the
streaming stand-in for an Iceberg table's incoming snapshots); the
stream applies the SAME transformation graph as the batch operator
(operators/spatial_join.geotag_pages works unchanged on a streaming
DataFrame: Arrow UDF extract → cell encode → broadcast join → PiP —
all stateless except the final per-url aggregation, which runs in
update-complete form via foreachBatch so batch/stream results match
exactly).

`Trigger.AvailableNow` drains everything currently present and stops —
the idempotent incremental-batch shape (each micro-batch writes through
the same atomic committer as plans/checkpoint)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.spatial_join import geotag_pages

PAGES_DDL = "url string, warc_ts timestamp, html binary, lang string, doc_id bigint"


def stream_geotag(
    spark: SparkSession,
    input_dir: str,
    boundaries: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all available input micro-batches through the geo-tag
    pipeline into parquet, exactly-once via the stream checkpoint."""
    stream = spark.readStream.schema(PAGES_DDL).parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = geotag_pages(batch_df, boundaries)
        out.write.mode("append").parquet(output_dir)

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

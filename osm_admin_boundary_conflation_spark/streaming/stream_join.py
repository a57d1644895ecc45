"""Watermarked stream-stream inner join over a replayed stream.

The Structured-Streaming-native form of attribution: clicks and
purchases arrive as two streams; every (click, purchase) pair for the
same user with the purchase inside 24h after the click is emitted,
exactly once, to an append parquet sink.

Why the output is deterministic and COMPLETE here (and what would be
lost in general): an inner stream-stream join emits a pair when the
second side arrives; the watermark only bounds STATE RETENTION — a
click is evicted once the watermark passes click_ts + 24h, and a pair
whose purchase arrives after its click was evicted is silently lost.
With the input replayed as TIME-ORDERED micro-batches, any purchase in
batch k+1 has ts >= every ts in batch k, so a click still inside its
24h match horizon cannot have been evicted (eviction requires
watermark > click_ts + 24h, but the watermark trails max seen ts by
the lateness allowance, and the purchase's ts <= click_ts + 24h
arrived after). Hence sink contents == the batch join, which is the
DuckDB oracle.

Reference analogue: none (the reference is batch-only); this is the
streaming form of the as-of/attribution join family (operators/asof.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from .stream_windows import EVENTS_DDL


def stream_click_purchase_join(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    horizon: str = "24 hours",
    delay: str = "10 minutes",
    how: str = "inner",
) -> None:
    """Join the click stream to the purchase stream per user within
    `horizon`, append the pairs to a parquet sink, drain AvailableNow.

    how="leftOuter" adds the null-extension contract: a click whose
    24h match horizon the watermark has fully passed with no purchase
    seen is emitted exactly once with a NULL purchase side, at state
    eviction time (the watermark is the min across the two streams'
    per-side watermarks under the default multipleWatermarkPolicy).
    Clicks whose horizon the final watermark never passes are
    withheld — the price of exactly-once append emission."""

    def side(event_type: str, prefix: str):
        return (
            spark.readStream.schema(EVENTS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
            .filter(F.col("event_type") == event_type)
            .withWatermark("ts", delay)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("event_id").alias(f"{prefix}_id"),
            )
        )

    clicks = side("click", "a")
    buys = side("purchase", "b")
    joined = clicks.join(
        buys,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    ).select(
        F.col("a_user").alias("user_id"),
        "a_id",
        "b_id",
        (
            F.unix_micros(F.col("b_ts").cast("timestamp_ltz"))
            - F.unix_micros(F.col("a_ts").cast("timestamp_ltz"))
        ).alias("lag_us"),
    )
    (
        joined.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

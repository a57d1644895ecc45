"""Cross-micro-batch streaming dedup (stateful dropDuplicates).

Incremental crawl batches arrive over time; a doc seen in an EARLIER
batch must not be re-emitted by a later one. Structured Streaming's
stateful ``dropDuplicates`` keeps the seen-key set in the state store
across micro-batches, giving exactly-once dedup output through the
checkpointed parquet sink — the streaming analogue of the batch
dedup_exact operator (reference analogue: resume-state skip of already
conflated entities, conflate-boundaries.py:120-131).

State here is unbounded (no watermark): the key set grows with the
corpus, which is the correct contract for "forever" dedup. At 100 TB
the state store should be RocksDB-backed
(``spark.sql.streaming.stateStore.providerClass``) and the key a fixed
16-byte md5 — both configuration, not plan changes. For time-bounded
dedup (e.g. re-crawls allowed after 30 days) add
``withWatermark("event_time", ...)`` and Spark evicts expired keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

DOCS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all available input files one-per-micro-batch, emitting each
    distinct text key exactly once into the parquet sink.

    Only text-derived columns are projected: WHICH physical row of a
    duplicate set survives is execution-order-dependent, but its key and
    length are identical across the set, so the output is deterministic.
    """
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", 1)  # force multi-batch: state must carry over
        .parquet(input_dir)
    )
    deduped = stream.select(
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("key"),
        F.length("text").cast("long").alias("n_chars"),
    ).dropDuplicates(["key"])
    (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

"""Streaming near-duplicate IMAGE suppression: the media sibling of
stream_dedup. Each micro-batch decodes its images, aHashes them
(operators/multimodal.ahash_bmp), and suppresses any image within
Hamming distance 3 of an ALREADY-EMITTED one — banding state (4 x
16-bit bands per emitted hash) persists across batches in a parquet
state dir, so suppression genuinely crosses the batch boundary while
candidate checks stay band-bucketed (never state x batch all-pairs).
Within-batch duplicates are NOT suppressed against each other (state
updates at batch commit, the same visibility rule a keyed-state
dropDuplicates has); the gate's oracle encodes exactly that
semantics.

Scale: state is (band, band_val, hash) rows — a shuffled equi join per
batch against the band key; at 10^12 images the state table is the
thing a production system would snapshot-table (append commits per
batch), which is how this module stores it.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def _hash_batch(df):
    from ..operators import multimodal as M

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = [
                (int(i), M.ahash_bmp(M.build_phash_bmp(int(i))))
                for i in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "hash"])

    return df.select("doc_id").mapInPandas(batches, "doc_id long, hash long")


def _bands(hashed):
    return hashed.select(
        "doc_id",
        "hash",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band"),
    ).withColumn(
        "band_val",
        F.expr("shiftrightunsigned(hash, band * 16)").bitwiseAND(F.lit(0xFFFF)),
    )


def stream_phash_dedup(
    spark: SparkSession, in_dir: str, out_dir: str, ck_dir: str, state_dir: str
) -> None:
    """Replay `in_dir` one file per trigger; emit novel images to
    `out_dir`, suppress near-dups of emitted state."""

    def handle(batch_df, batch_id):
        s = batch_df.sparkSession
        hashed = _hash_batch(batch_df).localCheckpoint()
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")) or any(
            f.endswith(".parquet") for f in os.listdir(state_dir)
        ):
            state = s.read.parquet(state_dir)
            cand = (
                _bands(hashed)
                .join(
                    state.withColumnRenamed("hash", "shash").withColumnRenamed(
                        "doc_id", "sdoc"
                    ),
                    ["band", "band_val"],
                )
                .filter(F.bit_count(F.col("hash").bitwiseXOR(F.col("shash"))) <= 3)
                .select("doc_id")
                .distinct()
            )
            novel = hashed.join(cand, "doc_id", "left_anti").localCheckpoint()
        else:
            novel = hashed
        novel.select("doc_id", "hash").write.mode("append").parquet(out_dir)
        _bands(novel).select("doc_id", "hash", "band", "band_val").write.mode(
            "append"
        ).parquet(state_dir)

    os.makedirs(state_dir, exist_ok=True)
    q = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

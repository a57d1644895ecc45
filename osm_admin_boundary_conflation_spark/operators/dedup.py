"""Near-duplicate detection for training-data pipelines.

- MinHash + LSH banding: shingle → 16 md5-based minhashes → 4 bands of
  4 → band-bucket self-join → exact Jaccard verify. The hash family is
  md5-based (functions/text.py stable_hash64) so the DuckDB oracle can
  recompute signatures bit-for-bit.
- n-gram Jaccard within cheap blocking buckets.
- SimHash (60-bit, token-majority) for hamming-distance dedup.

Scale: band-bucket self-join is the standard LSH shape — the shuffle
key is (band_no, band_signature); hot buckets (boilerplate text) can be
salted exactly like the cell join. Verification only touches candidate
pairs, never the full cross product.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..functions import text as T
from ..functions.udfs import minhash_udf, simhash_udf

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = 4


def minhash_bands(docs: DataFrame, id_col: str = "id", text_col: str = "t") -> DataFrame:
    """→ (id, band_no, band_key)."""
    sig = docs.select(id_col, minhash_udf(F.col(text_col)).alias("sig"))
    bands = sig.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_no"),
                    F.concat_ws(",", *[F.col("sig")[b * ROWS_PER_BAND + r].cast("string") for r in range(ROWS_PER_BAND)]).alias(
                        "band_key"
                    ),
                )
                for b in range(N_BANDS)
            ])
        ).alias("bb"),
    )
    return bands.select(id_col, F.col("bb.band_no").alias("band_no"), F.col("bb.band_key").alias("band_key"))


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """band-bucket self-join → distinct (ia, ib) with ia < ib."""
    b = minhash_bands(docs)
    a, c = b.alias("a"), b.alias("b")
    pairs = (
        a.join(
            c,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .distinct()
    )
    return pairs


@pandas_udf(DoubleType())
def jaccard_udf(ta: pd.Series, tb: pd.Series) -> pd.Series:
    def one(a, b):
        sa, sb = set(T.shingles(a or "")), set(T.shingles(b or ""))
        if not sa and not sb:
            return 1.0
        u = len(sa | sb)
        return len(sa & sb) / u if u else 0.0

    return pd.Series([one(a, b) for a, b in zip(ta, tb)])


@pandas_udf(DoubleType())
def jaccard3_udf(ta: pd.Series, tb: pd.Series) -> pd.Series:
    def one(a, b):
        sa, sb = set(T.shingles(a or "", k=3)), set(T.shingles(b or "", k=3))
        if not sa and not sb:
            return 1.0
        u = len(sa | sb)
        return len(sa & sb) / u if u else 0.0

    return pd.Series([one(a, b) for a, b in zip(ta, tb)])


def minhash_dedup_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Full MinHash-LSH dedup: candidates → exact-Jaccard verify."""
    pairs = lsh_candidate_pairs(docs)
    da = docs.select(F.col("id").alias("ia"), F.col("t").alias("ta"))
    db = docs.select(F.col("id").alias("ib"), F.col("t").alias("tb"))
    verified = (
        pairs.join(da, "ia")
        .join(db, "ib")
        .withColumn("jacc", F.round(jaccard_udf("ta", "tb"), 6))
        .filter(F.col("jacc") >= threshold)
    )
    return verified.select("ia", "ib", "jacc")


def simhash_docs(docs: DataFrame) -> DataFrame:
    return docs.select(F.col("id"), simhash_udf(F.col("t")).alias("simhash"))

"""Distributed Kendall rank correlation (tau-a) via 2-D grid counting.

Counting concordant/discordant pairs is a quadratic definition; the
scale shape here decomposes the n^2 pairs into

- **strictly-separated cell pairs**: bucket x and y with monotone
  integer division (``bx = x div wx``). ``bx_a < bx_b`` implies
  ``x_a < x_b`` STRICTLY (and likewise for y), so for two cells
  ordered strictly in both dimensions every cross pair is concordant
  (same order) or discordant (opposite order) with NO per-pair work —
  the count is ``n_cell_a * n_cell_b``. Aggregated with an
  explode-over-y-buckets + suffix-sum-window shape (equi joins and
  windows only, never a cell x cell nested loop).
- **residual pairs sharing an x-bucket or a y-bucket**: resolved
  exactly with bucket-equi self joins (bounded per-bucket population
  by construction), inclusion-exclusion removing the both-buckets
  overlap counted twice.

Verified against the brute-force definition in
tests/test_rankcorr.py and by the quadratic DuckDB oracle. At 10^12
rows the residual joins carry O(n * bucket_pop) pairs and the cell
aggregation is O(#cells * #y_buckets) — both tunable via wx/wy.
Ties in y contribute to neither count (tau-a semantics); x is assumed
distinct per caller (enforced by id-derived x in the gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _strict_cell_counts(cells: DataFrame, descending_y: bool) -> DataFrame:
    """Sum of n_a * n_b over cell pairs with bx_a < bx_b and
    by_a < by_b (concordant; ``descending_y=False``) or by_a > by_b
    (discordant). Returns a 1-row (cnt) DataFrame."""
    src = cells
    if descending_y:
        # Count by_a > by_b by flipping the y bucket sign.
        src = cells.withColumn("by", -F.col("by"))
    # Each source cell contributes its count to every STRICTLY larger
    # y bucket present in the data; bounded explode over the distinct
    # by values (#y buckets is small by construction).
    bys = src.select(F.col("by").alias("by_t")).distinct()
    contrib = (
        src.join(F.broadcast(bys), F.col("by") < F.col("by_t"))
        .groupBy("by_t", "bx")
        .agg(F.sum("n").alias("contrib"))
        .withColumnRenamed("by_t", "by")
    )
    # Each unordered qualifying cell pair is counted once, from its
    # strictly-larger-(bx, by) member: the probe cell sums contrib of
    # partner cells at STRICTLY SMALLER bx within its own by
    # partition. Union probe rows (contrib 0) with source rows; a
    # RANGE frame ending at -1 on the ascending integer bx excludes
    # all ties at the probe's own bx.
    probes = src.select("by", "bx", F.col("n").alias("probe_n")).withColumn(
        "contrib", F.lit(0).cast("long")
    )
    sources = contrib.withColumn("probe_n", F.lit(None).cast("long"))
    u = probes.unionByName(sources)
    w_lt = (
        Window.partitionBy("by")
        .orderBy("bx")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    s = u.select(
        "probe_n",
        F.coalesce(F.sum("contrib").over(w_lt), F.lit(0)).alias("lt_sum"),
    ).filter(F.col("probe_n").isNotNull())
    return s.agg(
        F.coalesce(F.sum(F.col("probe_n") * F.col("lt_sum")), F.lit(0))
        .cast("long")
        .alias("cnt")
    )


def _exact_pair_counts(s: DataFrame, key: list) -> DataFrame:
    """Concordant/discordant counts over pairs equi-joined on the
    bucket key (id_a < id_b). 1 row (conc, disc)."""
    a, b = s.alias("a"), s.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for k in key:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    sgn = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    j = a.join(b, cond).select(sgn.alias("sgn"))
    return j.agg(
        F.coalesce(F.sum((F.col("sgn") > 0).cast("long")), F.lit(0)).alias("conc"),
        F.coalesce(F.sum((F.col("sgn") < 0).cast("long")), F.lit(0)).alias("disc"),
    )


def kendall_counts(
    items: DataFrame, wx: int = 64, wy: int = 64
) -> DataFrame:
    """1-row (concordant, discordant, n_pairs, tau_a) over ``(id, x,
    y)`` int64 rows. Exact integer counts; tau_a is the one final IEEE
    division, rounded to 6 places."""
    s = items.select(
        "id", "x", "y",
        F.expr(f"x div {wx}").alias("bx"),
        F.expr(f"y div {wy}").alias("by"),
    )
    cells = s.groupBy("bx", "by").agg(F.count(F.lit(1)).alias("n"))
    conc_cells = _strict_cell_counts(cells, descending_y=False)
    disc_cells = _strict_cell_counts(cells, descending_y=True)
    ex_x = _exact_pair_counts(s, ["bx"])
    ex_y = _exact_pair_counts(s, ["by"])
    ex_xy = _exact_pair_counts(s, ["bx", "by"])
    n = s.agg(F.count(F.lit(1)).alias("n_items"))

    # All six legs are 1-row aggregates; the crossJoin chain is the
    # scalar-combine shape (NESTED_LOOP_SCALAR_OK in the plan audit).
    row = (
        conc_cells.withColumnRenamed("cnt", "cc")
        .crossJoin(disc_cells.withColumnRenamed("cnt", "dc"))
        .crossJoin(
            ex_x.withColumnRenamed("conc", "cx_c").withColumnRenamed("disc", "cx_d")
        )
        .crossJoin(
            ex_y.withColumnRenamed("conc", "cy_c").withColumnRenamed("disc", "cy_d")
        )
        .crossJoin(
            ex_xy.withColumnRenamed("conc", "cb_c").withColumnRenamed("disc", "cb_d")
        )
        .crossJoin(n)
    )
    conc = F.col("cc") + F.col("cx_c") + F.col("cy_c") - F.col("cb_c")
    disc = F.col("dc") + F.col("cx_d") + F.col("cy_d") - F.col("cb_d")
    pairs = F.expr("n_items * (n_items - 1) div 2")
    return row.select(
        conc.cast("long").alias("concordant"),
        disc.cast("long").alias("discordant"),
        pairs.cast("long").alias("n_pairs"),
        F.round(
            (conc - disc).cast("double") / pairs.cast("double"), 6
        ).alias("tau_a"),
    )

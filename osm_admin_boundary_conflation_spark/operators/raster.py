

def d8_flow_accumulation(cells: "DataFrame", rounds: int) -> "DataFrame":
    """D8 flow accumulation over an integer DEM (the standard raster
    hydrology pair: O'Callaghan & Mark 1984 flow direction + upstream
    cell counting). cells: (cell, r, c, z). Each cell drains to its
    STRICTLY lowest 8-neighbour (ties broken by smallest cell id;
    no lower neighbour = pit). Accumulation counts every upstream
    cell whose unique flow path passes through, self included.

    Shape: flow direction is one 8-offset explode + per-cell
    min(struct(z, id)); accumulation iterates
    acc[t+1](v) = 1 + sum(acc[t](children)) which after t rounds
    counts upstream cells within t hops — exact once t reaches the
    longest flow path (caller pins it from the DEM; the gate's tilted
    DEM has max path 15). Each round is one child-edge join + groupBy,
    vertex-partitioned; at continental-DEM scale the same recurrence
    runs on tile-partitioned cells, or pointer doubling cuts it to
    O(log depth) rounds at the cost of carrying path partial sums."""
    import pyspark.sql.functions as F

    z = cells.select("cell", "r", "c", "z")
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    nb = (
        z.select(
            "cell",
            "z",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("r") + F.lit(dr)).alias("nr"),
                            (F.col("c") + F.lit(dc)).alias("nc"),
                        )
                        for dr, dc in offs
                    ]
                )
            ).alias("o"),
        )
        .select("cell", "z", F.col("o.nr").alias("nr"), F.col("o.nc").alias("nc"))
        .join(
            z.select(
                F.col("cell").alias("n"),
                F.col("r").alias("nr"),
                F.col("c").alias("nc"),
                F.col("z").alias("zn"),
            ),
            ["nr", "nc"],
        )
    )
    flow = (
        nb.groupBy("cell", "z")
        .agg(F.min(F.struct("zn", "n")).alias("b"))
        .filter(F.col("b.zn") < F.col("z"))
        .select(F.col("cell").alias("child"), F.col("b.n").alias("parent"))
        .localCheckpoint(eager=True)
    )
    acc = z.select("cell", F.lit(1).cast("long").alias("acc")).localCheckpoint(
        eager=True
    )
    for _ in range(rounds):
        contrib = (
            acc.join(flow, acc.cell == flow.child)
            .groupBy(F.col("parent").alias("cell"))
            .agg(F.sum("acc").alias("inflow"))
        )
        acc = (
            z.select("cell")
            .join(contrib, "cell", "left")
            .select(
                "cell",
                (F.lit(1) + F.coalesce(F.col("inflow"), F.lit(0))).cast("long").alias(
                    "acc"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return acc.select("cell", F.col("acc").alias("accumulation"))

"""Range / interval joins (an operator class Spark lacks natively —
SURVEY.md §2.10 'custom operators' route (a): composition of existing
DataFrame ops).

A naive time-proximity self-join is a theta join — Spark plans it as a
broadcast nested loop (quadratic). The scalable pattern is **bin
bucketing**: quantize event time into bins of the window width, join
on (key, bin) for bin and both neighbors, then apply the exact range
predicate. Each row meets only rows in its own and adjacent bins, so
the join is equi-keyed (hash-partitionable, AQE-skew-splittable) and
the post-filter is exact — same results as the theta join at
O(rows x bin occupancy) cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def time_proximity_self_join(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    window_us: int,
) -> DataFrame:
    """All ordered pairs (a, b) of same-``key`` rows with
    ``0 < ts_b - ts_a <= window_us`` (b strictly after a, within the
    window). Returns (key, id_a, id_b, gap_us).

    Equivalent to the theta join
    ``a JOIN b ON a.key = b.key AND b.ts > a.ts AND b.ts <= a.ts + w``
    but executed as an equi-join on (key, bin) with bin spill-over.
    """
    us = F.unix_micros(F.col(ts))
    base = df.select(
        F.col(key).alias("_k"), F.col(id_col).alias("_id"), us.alias("_us")
    )
    # left side joins to its own bin and the next (a window never spans
    # more than two bins of width window_us)
    a = base.select(
        "_k", F.col("_id").alias("id_a"), F.col("_us").alias("us_a"),
        F.explode(
            F.array(
                F.floor(F.col("_us") / window_us),
                F.floor(F.col("_us") / window_us) + 1,
            )
        ).alias("_bin"),
    )
    b = base.select(
        "_k", F.col("_id").alias("id_b"), F.col("_us").alias("us_b"),
        F.floor(F.col("_us") / window_us).alias("_bin"),
    )
    return (
        a.join(b, ["_k", "_bin"])
        .filter(
            (F.col("us_b") > F.col("us_a"))
            & (F.col("us_b") <= F.col("us_a") + F.lit(window_us))
        )
        .select(
            F.col("_k").alias(key),
            "id_a",
            "id_b",
            (F.col("us_b") - F.col("us_a")).alias("gap_us"),
        )
        .distinct()  # bin spill-over can produce the pair twice
    )

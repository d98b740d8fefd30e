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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str,
) -> DataFrame:
    """Point-in-time (as-of) join: each left row picks the single right
    row with the greatest ``right_ts <= left_ts`` for its key — the
    financial-data staple Spark lacks natively.

    Executed with the **union + running last_value** pattern: tag both
    sides, sort by (key, ts, side), and let each left row inherit the
    most recent right payload via a running ``last(ignorenulls)`` window
    — ONE shuffle on the key, no join at all, no per-key explosion.
    Ties on ``right_ts`` resolve to the greatest ``right_tiebreak``
    (deterministic). Left rows with no prior right row keep nulls.
    """
    from pyspark.sql import Window

    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right rows sort before left at equal ts
        F.col(right_tiebreak).alias("_tie"),
        payload.alias("_payload"),
    )
    l = left.withColumn("_row", F.struct(*[F.col(c) for c in left.columns])).select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        "_row",
    )
    merged = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType)).unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select("_row.*", "_asof.*")
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Forward as-of join: each left row picks the single right row
    with the SMALLEST ``right_ts >= left_ts`` for its key, optionally
    within ``tolerance_us`` (matches farther ahead become nulls) —
    the look-ahead twin of :func:`asof_join` (next fill after an
    order, next purchase after a click).

    Same union + running-carry execution, mirrored: sort descending by
    timestamp so the carry flows from later right rows to earlier left
    rows — still ONE shuffle on the key, no join node. Ties on
    ``right_ts`` resolve to the SMALLEST ``right_tiebreak``
    (deterministic); the matched timestamp must be among
    ``right_cols`` for the tolerance filter to apply.
    """
    from pyspark.sql import Window

    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right rows sort before left at equal ts
        F.col(right_tiebreak).alias("_tie"),
        payload.alias("_payload"),
    )
    l = left.withColumn("_row", F.struct(*[F.col(c) for c in left.columns])).select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        "_row",
    )
    merged = r.withColumn(
        "_row", F.lit(None).cast(l.schema["_row"].dataType)
    ).unionByName(l)
    # Descending time: the running carry sees every right row at or
    # after the left row. Among equal-_ts right rows the LAST one in
    # window order wins the carry, so order ties by _tie DESC to make
    # the smallest tiebreak the survivor.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").desc(), "_side", F.col("_tie").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    carried = carried.withColumn(
        "_asof_ts", F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("_asof_ts")) - F.unix_micros(F.col("_ts"))
        ) <= F.lit(tolerance_us)
        out = out.withColumn(
            "_asof",
            F.when(in_tol, F.col("_asof")).otherwise(
                F.lit(None).cast(r.schema["_payload"].dataType)
            ),
        )
    return out.select("_row.*", "_asof.*")


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

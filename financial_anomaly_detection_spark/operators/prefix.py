"""Distributed prefix sums (two-pass parallel scan).

A running sum over a global order is the classic "looks sequential"
operator: the naive Spark form — ``Window.orderBy(key)`` with no
``partitionBy`` — funnels EVERY row through one task (Catalyst plans
``Exchange SinglePartition`` under the Window), which is correct at
test scale and a scale-killer at 100 TB.

``ordered_prefix_sum`` computes the identical exclusive running sum as
a two-pass parallel prefix scan (Blelloch 1990's scan decomposition,
re-expressed relationally):

  pass 1  assign every row an ORDER-PRESERVING bucket (equal-width
          ``width_bucket`` over broadcast min/max bounds: bucket i
          holds strictly smaller keys than bucket i+1), then compute
          per-bucket subtotals — one partial-agg shuffle of
          ``n_buckets`` rows;
  pass 2  derive each bucket's starting offset as the sum of all
          EARLIER buckets' subtotals via a triangular self-join on the
          tiny subtotal table (``n_buckets**2`` pairs, broadcast —
          deliberately NOT a global window, so no FULL-DATA
          single-partition funnel anywhere; the min/max bounds scalar
          aggregate does plan an ``Exchange SinglePartition``, but it
          moves one partial-agg row per partition — the benign
          global-scalar pattern classified by plans/inspect.py),
          broadcast the offsets back, and run the ordinary per-bucket
          window prefix sum in parallel.

Integer addition is associative and commutative, so the bucketed sum
is bit-identical to the sequential one — the DuckDB oracle for any
query built on this operator is still the plain ``SUM(...) OVER
(ORDER BY key ROWS UNBOUNDED PRECEDING)``.

Scale notes:
  * the only driver-side data is nothing at all — bounds and offsets
    stay in (broadcast) DataFrames, so the operator composes lazily;
  * equal-width bucketing is balanced when keys are roughly uniform
    (dense ids). For pathologically skewed key spaces swap the bucket
    expression for quantile boundaries (``approx_percentile``) — the
    two-pass algebra is unchanged;
  * keys are compared as doubles inside ``width_bucket`` — exact for
    integer keys up to 2^53, far beyond any real doc-id space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ordered_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_before",
    n_buckets: int = 64,
    pin: bool = True,
) -> DataFrame:
    """Exclusive running sum of ``value_col`` in ``order_col`` order.

    Returns ``df`` plus ``out_col`` = sum of ``value_col`` over all
    rows with a strictly smaller ``order_col`` (ties are not allowed:
    the order key must be unique, non-null AND finite —
    ``width_bucket`` of NULL/NaN is NULL, a NaN additionally poisons
    the max() bound for every row, and the offset equi-join would then
    silently drop rows, so callers construct/quantize the key;
    ordered_rank_desc is the variant with defined NULL/NaN semantics). Equivalent to ``SUM(value)
    OVER (ORDER BY key ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING)`` but with no full-data single-partition funnel in the
    physical plan (the bounds scalar agg's exchange moves one row per
    partition).

    ``pin`` materializes the bucketed (key, value, bucket) skeleton
    once via ``localCheckpoint`` — the scan consumes its input three
    times (subtotals ×2 via the triangular join, plus the per-bucket
    window), and without pinning Catalyst would replay the entire
    upstream subtree (at 100 TB: re-tokenizing the corpus) for each
    consumer. The skeleton is a few tens of bytes per row regardless
    of document size. Pass ``pin=False`` to keep the operator fully
    lazy when the input is already cheap or cached — but only ONE
    unpinned level per pinned input: each unpinned call references its
    input several times, so CHAINED unpinned calls multiply the
    logical plan ~4^levels (measured: 137 nested-loop nodes at three
    levels in the round-9 Wasserstein draft; SCALING.md §round-9).
    Chain with ``pin=True`` — each pin is one grid-sized artifact.
    """
    bounds = df.agg(
        F.min(order_col).cast("double").alias("_lo"),
        F.max(order_col).cast("double").alias("_hi"),
    )
    # width_bucket(v, lo, hi+1, n) maps [lo, hi] onto 1..n preserving
    # order; hi+1 keeps the max key inside bucket n (width_bucket
    # returns n+1 only for v >= the upper bound).
    bucketed = df.join(F.broadcast(bounds)).withColumn(
        "_bucket",
        F.width_bucket(
            F.col(order_col).cast("double"),
            F.col("_lo"),
            F.col("_hi") + F.lit(1.0),
            F.lit(n_buckets),
        ),
    ).drop("_lo", "_hi")
    if pin:
        bucketed = bucketed.localCheckpoint(eager=True)

    sub = bucketed.groupBy("_bucket").agg(F.sum(value_col).alias("_bsum"))
    # Offset of bucket b = sum of subtotals of buckets < b. A
    # triangular join on the n_buckets-row table replaces the global
    # window: O(n_buckets^2) pairs, zero single-partition stages.
    offsets = (
        sub.alias("x")
        .join(F.broadcast(sub.alias("y")), F.col("y._bucket") < F.col("x._bucket"), "left")
        .groupBy(F.col("x._bucket").alias("_bucket"))
        .agg(F.coalesce(F.sum("y._bsum"), F.lit(0)).cast("long").alias("_boffset"))
    )

    w = (
        Window.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long")
    )
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, (F.col("_boffset") + F.col("_local")).cast("long"))
        .drop("_bucket", "_local", "_boffset")
    )


def grouped_prefix_stats(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tie_col: str,
    value_col: str,
    sum_col: str = "_psum",
    cnt_col: str = "_pcnt",
    n_buckets: int = 64,
) -> DataFrame:
    """Exclusive running SUM and COUNT of ``value_col`` per
    ``group_col`` in (``order_col``, ``tie_col``) order — the
    group-scoped form of :func:`ordered_prefix_sum` for LOW-CARDINALITY
    groups.

    ``Window.partitionBy(group).orderBy(ts)`` is only parallel up to
    the number of distinct groups: with a handful of categories
    (event types, channels) the whole fact table funnels through that
    many tasks — the same scale-killer as the global window, just
    sharded by 5 instead of 1. Here each (group, time-bucket) cell is
    an independent window task (group_cardinality × n_buckets ways
    parallel); the cell's starting offset is composed from earlier
    cells' subtotals via a triangular join on the tiny
    (group × n_buckets)-row subtotal table.

    Exactness: the running COUNT is integer — bit-identical to the
    sequential window. The running SUM of doubles re-associates
    additions at bucket boundaries, so it can differ from the
    sequential window in final ulps (float addition is not
    associative); consumers that need hash-stable values should feed
    integer-quantized inputs (see ordered_prefix_sum's packing use).

    Rows with equal ``order_col`` values always land in the same
    bucket, so the within-bucket ``tie_col`` ordering fully determines
    the result. ``order_col`` must be non-null and finite (see
    :func:`ordered_prefix_sum`; callers key on timestamps).
    """
    bounds = df.agg(
        F.min(F.col(order_col).cast("double")).alias("_lo"),
        F.max(F.col(order_col).cast("double")).alias("_hi"),
    )
    bucketed = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "_bucket",
            F.width_bucket(
                F.col(order_col).cast("double"),
                F.col("_lo"),
                F.col("_hi") + F.lit(1.0),
                F.lit(n_buckets),
            ),
        )
        .drop("_lo", "_hi")
    )

    sub = bucketed.groupBy(group_col, "_bucket").agg(
        F.sum(value_col).alias("_bsum"), F.count(F.lit(1)).alias("_bcnt")
    )
    offsets = (
        sub.alias("x")
        .join(
            F.broadcast(sub.alias("y")),
            (F.col(f"y.{group_col}") == F.col(f"x.{group_col}"))
            & (F.col("y._bucket") < F.col("x._bucket")),
            "left",
        )
        .groupBy(F.col(f"x.{group_col}").alias(group_col), F.col("x._bucket").alias("_bucket"))
        .agg(
            F.coalesce(F.sum("y._bsum"), F.lit(0.0)).alias("_osum"),
            F.coalesce(F.sum("y._bcnt"), F.lit(0)).cast("long").alias("_ocnt"),
        )
    )

    w = (
        Window.partitionBy(group_col, "_bucket")
        .orderBy(order_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_lsum", F.coalesce(F.sum(value_col).over(w), F.lit(0.0))
    ).withColumn("_lcnt", F.count(F.lit(1)).over(w).cast("long"))
    return (
        local.join(F.broadcast(offsets), [group_col, "_bucket"])
        .withColumn(sum_col, F.col("_osum") + F.col("_lsum"))
        .withColumn(cnt_col, F.col("_ocnt") + F.col("_lcnt"))
        .drop("_bucket", "_lsum", "_lcnt", "_osum", "_ocnt")
    )


def ordered_rank_desc(
    df: DataFrame,
    order_col: str,
    tie_col: str,
    out_col: str = "rank",
    n_buckets: int = 64,
    pin: bool = True,
    total_col: str | None = None,
) -> DataFrame:
    """Exact global rank in (``order_col`` DESC, ``tie_col`` ASC) order
    with no full-data single-partition funnel.

    Equivalent to ``rank() OVER (ORDER BY order_col DESC, tie_col)``
    when ``tie_col`` makes the total order unique (rank == row_number
    then), but computed as the two-pass parallel scan: rows are
    bucketed order-preservingly on ``order_col``; each bucket's
    carry-in is the COUNT of rows in strictly-later (larger-value)
    buckets, composed via a triangular join on the tiny subtotal
    table; the within-bucket rank is an ordinary per-bucket window.
    Ties on ``order_col`` always share a bucket, so the ``tie_col``
    ordering fully resolves inside one window task. Integer counts are
    associative, so the result is bit-identical to the sequential
    ``rank()`` — the DuckDB oracle stays the plain window form.

    Non-finite keys never reach ``width_bucket`` (NULL/NaN/±Inf all
    would NULL it — an infinite min/max bound even poisons EVERY
    bucket) and are instead routed to the edge buckets matching
    Spark's DESC total order NaN > +Inf > finite > -Inf > NULL: NaN
    and +Inf share the top bucket, NULL and -Inf share bucket 0, and
    the within-bucket (DESC, tie) window resolves their relative
    order exactly as the sequential ``rank()`` does.

    NULL ``order_col`` keys sort last — matching Spark's ``F.desc``
    nulls-last default (an ORDER BY x DESC oracle needs ``NULLS
    LAST`` spelled out on engines whose default differs).

    ``pin`` materializes the bucketed skeleton once (the scan consumes
    it twice: subtotals + the per-bucket window); pass ``pin=False``
    to stay lazy when the input is cheap.

    ``total_col``, when set, also attaches the GLOBAL row count as a
    column — composed from the same tiny subtotal table inside the
    triangular join (one unconditioned broadcast join over at most
    ``n_buckets``² pairs) rather than a second scalar ``agg()`` pass:
    the subtotals are already shuffled once for the carry-in, so the
    total is free — no extra job over the (pinned) skeleton. The only
    ``Exchange SinglePartition`` in the whole plan is the min/max
    bounds scalar reduction, which moves one row per partition — the
    benign global-scalar pattern (see plans/inspect.py); no FULL-DATA
    single-partition funnel exists anywhere.
    """
    key_d = F.col(order_col).cast("double")
    finite = key_d.isNotNull() & ~F.isnan(key_d) & (F.abs(key_d) != float("inf"))
    bounds = df.agg(
        F.min(F.when(finite, key_d)).alias("_lo"),
        F.max(F.when(finite, key_d)).alias("_hi"),
    )
    bucketed = df.join(F.broadcast(bounds)).withColumn(
        "_bucket",
        # NULL and -Inf keys -> bucket 0: every real bucket counts as
        # "later" in the carry, so they rank after all finite rows, and
        # the within-bucket (DESC, tie) window orders -Inf before NULL
        # (desc nulls last) exactly as the sequential rank would. NaN
        # and +Inf -> the top bucket (Spark sorts NaN > +Inf > finite
        # -> DESC ranks them FIRST, NaN ahead of +Inf via the same
        # window); all four are kept out of width_bucket, whose
        # NULL result the carry equi-join would silently drop — an
        # infinite bound would likewise NULL every width_bucket call.
        F.when(key_d.isNull() | (key_d == float("-inf")), F.lit(0))
        .when(F.isnan(key_d) | (key_d == float("inf")), F.lit(n_buckets + 1))
        .otherwise(
            F.width_bucket(
                key_d,
                F.col("_lo"),
                F.col("_hi") + F.lit(1.0),
                F.lit(n_buckets),
            )
        ),
    ).drop("_lo", "_hi")
    if pin:
        bucketed = bucketed.localCheckpoint(eager=True)

    sub = bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_bcnt"))
    # Descending rank: bucket b's carry-in counts rows in LATER buckets
    # (strictly larger order_col values rank ahead of all of b's rows).
    # One unconditioned broadcast join over the <=n_buckets-row table
    # yields carry-in and (optionally) the global total per bucket.
    aggs = [
        F.sum(
            F.when(F.col("y._bucket") > F.col("x._bucket"), F.col("y._bcnt")).otherwise(F.lit(0))
        ).cast("long").alias("_coffset"),
    ]
    if total_col is not None:
        aggs.append(F.sum("y._bcnt").cast("long").alias(total_col))
    carry = (
        sub.alias("x")
        .join(F.broadcast(sub.alias("y")))
        .groupBy(F.col("x._bucket").alias("_bucket"))
        .agg(*aggs)
    )

    w = Window.partitionBy("_bucket").orderBy(F.desc(order_col), F.asc(tie_col))
    local = bucketed.withColumn("_lrank", F.row_number().over(w).cast("long"))
    return (
        local.join(F.broadcast(carry), "_bucket")
        .withColumn(out_col, (F.col("_coffset") + F.col("_lrank")).cast("long"))
        .drop("_bucket", "_lrank", "_coffset")
    )


def ordered_prefix_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_max_before",
    n_buckets: int = 64,
) -> DataFrame:
    """Exclusive running MAX of ``value_col`` over all rows with a
    strictly smaller ``order_col`` (NULL when no such row exists).

    Max is an associative, commutative monoid exactly like the sum in
    :func:`ordered_prefix_sum`, so the identical two-pass scan applies:
    per-bucket window maxes run in parallel, and each bucket's carry-in
    is the max of all EARLIER buckets' maxes composed via a triangular
    join on the tiny subtotal table. No full-data single-partition
    funnel anywhere (the bounds scalar agg moves one row per
    partition); bit-exact for integer values by associativity.
    ``order_col`` must be non-null (see :func:`ordered_prefix_sum`).

    Rows that tie on ``order_col`` see the same prefix (ties are peers:
    neither contributes to the other), which is what dominance-style
    consumers (skyline) need — unlike the sum variant, ties are
    allowed. Implemented with a RANGE frame ending at 1 preceding key
    unit; ``order_col`` must be integer-valued.
    """
    bounds = df.agg(
        F.min(F.col(order_col).cast("double")).alias("_lo"),
        F.max(F.col(order_col).cast("double")).alias("_hi"),
    )
    bucketed = df.join(F.broadcast(bounds)).withColumn(
        "_bucket",
        F.width_bucket(
            F.col(order_col).cast("double"),
            F.col("_lo"),
            F.col("_hi") + F.lit(1.0),
            F.lit(n_buckets),
        ),
    ).drop("_lo", "_hi")

    sub = bucketed.groupBy("_bucket").agg(F.max(value_col).alias("_bmax"))
    carry = (
        sub.alias("x")
        .join(F.broadcast(sub.alias("y")), F.col("y._bucket") < F.col("x._bucket"), "left")
        .groupBy(F.col("x._bucket").alias("_bucket"))
        .agg(F.max("y._bmax").alias("_carry"))
    )

    # RANGE .. -1: rows with strictly smaller order_col only — ties on
    # the key are excluded from each other's prefix.
    w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col(order_col).cast("long"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("_lmax", F.max(value_col).over(w))
    return (
        local.join(F.broadcast(carry), "_bucket")
        .withColumn(out_col, F.greatest(F.col("_carry"), F.col("_lmax")))
        .drop("_bucket", "_lmax", "_carry")
    )

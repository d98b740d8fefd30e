"""Two-pass parallel prefix sum (operators/prefix.py).

The operator must be bit-equivalent to the sequential global-window
running sum it replaces — on shuffled, non-contiguous, negative-key
inputs — in both the pinned and fully-lazy forms, and its physical
plan must contain no FULL-DATA single-partition funnel (the whole
point). The min/max bounds scalar aggregate does plan an ``Exchange
SinglePartition`` — moving one row per partition, the benign
global-scalar pattern — so the guard here is
``plans.inspect.single_partition_violations`` (which classifies each
exchange by its child), NOT a substring grep; the detector itself is
pinned below against a real global-window plan.
"""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F

from financial_anomaly_detection_spark.operators.prefix import ordered_prefix_sum
from financial_anomaly_detection_spark.plans.inspect import (
    single_partition_violations,
)


def _naive(df):
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(
        "prefix_before", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "v", "prefix_before").collect())


def test_matches_sequential_window(spark):
    rng = random.Random(7)
    # sparse, negative-and-positive, shuffled keys — nothing about the
    # bucketing may assume density or positivity
    keys = rng.sample(range(-50_000, 50_000), 3000)
    data = [(k, rng.randint(0, 500)) for k in keys]
    df = spark.createDataFrame(data, "k long, v long").repartition(8)
    got = ordered_prefix_sum(df, "k", "v", n_buckets=17)
    assert _rows(got) == _rows(_naive(df))


def test_unpinned_form_equivalent(spark):
    rng = random.Random(11)
    data = [(k, rng.randint(1, 9)) for k in rng.sample(range(10_000), 500)]
    df = spark.createDataFrame(data, "k long, v long")
    got = ordered_prefix_sum(df, "k", "v", n_buckets=4, pin=False)
    assert _rows(got) == _rows(_naive(df))


def test_single_row_and_single_bucket(spark):
    df = spark.createDataFrame([(42, 7)], "k long, v long")
    got = ordered_prefix_sum(df, "k", "v").collect()
    assert len(got) == 1 and got[0]["prefix_before"] == 0
    # all keys equal-width-bucketed into one bucket still works
    df2 = spark.createDataFrame([(i, 1) for i in range(20)], "k long, v long")
    got2 = ordered_prefix_sum(df2, "k", "v", n_buckets=1)
    assert _rows(got2) == _rows(_naive(df2))


def test_plan_has_no_single_partition_funnel(spark):
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, v long")
    out = ordered_prefix_sum(df, "k", "v", n_buckets=8)
    assert single_partition_violations(out) == []


def test_detector_flags_real_global_window(spark):
    # the detector must actually fire on the plan shape the operator
    # exists to avoid — a Window.orderBy with no partitionBy — and
    # stay quiet on a benign scalar aggregate; without this pin a
    # never-matching detector makes every guard above vacuous (the
    # pre-r6 formatted-mode grep did exactly that)
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, v long")
    funnel = df.withColumn(
        "r", F.row_number().over(Window.orderBy("k"))
    )
    assert single_partition_violations(funnel), "global window not flagged"
    scalar = df.agg(F.min("k"), F.max("k"))
    assert single_partition_violations(scalar) == []


def test_grouped_prefix_stats_matches_sequential_window(spark, sf_dir):
    """grouped_prefix_stats ≙ the low-cardinality running window it
    replaces (ml/features.py): exclusive running COUNT bit-identical,
    running SUM within float tolerance (bucket-boundary re-association
    only)."""
    from pyspark.sql import Window, functions as F

    from financial_anomaly_detection_spark.operators.prefix import (
        grouped_prefix_stats,
    )
    from financial_anomaly_detection_spark.queries import load_table

    ev = load_table(spark, sf_dir, "events")
    got = grouped_prefix_stats(ev, "event_type", "ts", "event_id", "value")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = ev.select(
        "event_id",
        F.coalesce(F.sum("value").over(w), F.lit(0.0)).alias("_wsum"),
        F.count(F.lit(1)).over(w).cast("long").alias("_wcnt"),
    )
    j = got.select("event_id", "_psum", "_pcnt").join(want, "event_id")
    assert j.filter(F.col("_pcnt") != F.col("_wcnt")).count() == 0
    assert j.filter(F.abs(F.col("_psum") - F.col("_wsum")) > 1e-6).count() == 0


def test_grouped_prefix_row_number_decomposition(spark, sf_dir):
    """The ranking decomposition claimed by ntile_distribution_ranks'
    scale note: row_number() over (partition by g order by v, tie) ==
    grouped prefix COUNT + 1 — exact, with (groups x buckets)-way
    parallelism instead of one task per group."""
    from pyspark.sql import Window, functions as F

    from financial_anomaly_detection_spark.operators.prefix import (
        grouped_prefix_stats,
    )
    from financial_anomaly_detection_spark.queries import load_table

    ev = load_table(spark, sf_dir, "events")
    got = grouped_prefix_stats(ev, "event_type", "value", "event_id", "value").select(
        "event_id", (F.col("_pcnt") + 1).alias("rn")
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    want = ev.select(
        "event_id", F.row_number().over(w).cast("long").alias("rn_w")
    )
    j = got.join(want, "event_id")
    assert j.filter(F.col("rn") != F.col("rn_w")).count() == 0


# --- ordered_prefix_max ----------------------------------------------------


def _naive_max(df):
    from financial_anomaly_detection_spark.operators.prefix import (  # noqa: F401
        ordered_prefix_max,
    )

    w = Window.orderBy("k").rangeBetween(Window.unboundedPreceding, -1)
    return df.withColumn("prefix_max_before", F.max("v").over(w))


def _rows_max(df):
    return sorted(
        (r["k"], r["v"], r["prefix_max_before"])
        for r in df.select("k", "v", "prefix_max_before").collect()
    )


def test_prefix_max_matches_sequential_window_with_ties(spark):
    from financial_anomaly_detection_spark.operators.prefix import ordered_prefix_max

    rng = random.Random(13)
    # duplicated keys on purpose: ties are peers — neither side of a
    # tie may see the other's value in its prefix (RANGE semantics)
    data = [(rng.randint(-500, 500), rng.randint(0, 99)) for _ in range(3000)]
    df = spark.createDataFrame(data, "k long, v long").repartition(8)
    got = ordered_prefix_max(df, "k", "v", n_buckets=13)
    assert _rows_max(got) == _rows_max(_naive_max(df))


def test_prefix_max_first_key_is_null_and_no_single_partition(spark):
    from financial_anomaly_detection_spark.operators.prefix import ordered_prefix_max

    df = spark.createDataFrame([(i, i % 7) for i in range(200)], "k long, v long")
    out = ordered_prefix_max(df, "k", "v", n_buckets=6)
    rows = {r["k"]: r["prefix_max_before"] for r in out.collect()}
    assert rows[0] is None  # exclusive prefix of the minimum key is empty
    assert rows[199] == 6
    assert single_partition_violations(out) == []


# --- ordered_rank_desc -------------------------------------------------------


def test_rank_desc_matches_sequential_window_with_ties(spark):
    from financial_anomaly_detection_spark.operators.prefix import ordered_rank_desc

    rng = random.Random(29)
    # heavy value ties on purpose: ties must resolve by the unique tie
    # key INSIDE one bucket (equal values always co-bucket)
    data = [(i, rng.randint(0, 40)) for i in range(2500)]
    df = spark.createDataFrame(data, "id long, v long").repartition(8)
    got = ordered_rank_desc(df, "v", "id", out_col="rnk", n_buckets=11)
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = df.withColumn("rnk_w", F.row_number().over(w).cast("long"))
    j = got.join(want, ["id", "v"])
    assert j.filter(F.col("rnk") != F.col("rnk_w")).count() == 0


def test_rank_desc_total_col_and_no_single_partition(spark):
    from financial_anomaly_detection_spark.operators.prefix import ordered_rank_desc

    df = spark.createDataFrame([(i, i % 5) for i in range(300)], "id long, v long")
    out = ordered_rank_desc(
        df, "v", "id", out_col="rnk", n_buckets=7, pin=False, total_col="n_total"
    )
    rows = out.collect()
    assert all(r["n_total"] == 300 for r in rows)
    assert sorted(r["rnk"] for r in rows) == list(range(1, 301))
    assert single_partition_violations(out) == []


def test_rank_desc_null_keys_rank_last(spark):
    from financial_anomaly_detection_spark.operators.prefix import ordered_rank_desc

    # NULL order keys must not vanish (width_bucket(NULL) -> NULL
    # bucket used to drop them at the carry join) and must rank LAST,
    # matching rank() OVER (ORDER BY v DESC, id) with Spark's
    # DESC-nulls-last default
    data = [(1, 10), (2, None), (3, 5), (4, None), (5, 20)]
    df = spark.createDataFrame(data, "id long, v long").repartition(4)
    got = ordered_rank_desc(df, "v", "id", out_col="rnk", n_buckets=4)
    assert got.count() == 5  # nothing dropped
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = df.withColumn("rnk_w", F.row_number().over(w).cast("long"))
    j = got.join(want, ["id"])
    assert j.filter(F.col("rnk") != F.col("rnk_w")).count() == 0
    # all-NULL input: every row still present, ranked by tie key alone
    df2 = spark.createDataFrame([(1, None), (2, None)], "id long, v long")
    got2 = {r["id"]: r["rnk"] for r in
            ordered_rank_desc(df2, "v", "id", out_col="rnk", n_buckets=4).collect()}
    assert got2 == {1: 1, 2: 2}


def test_rank_desc_nan_keys_rank_first(spark):
    from financial_anomaly_detection_spark.operators.prefix import ordered_rank_desc

    # one NaN used to poison max() -> width_bucket bounds -> EVERY row
    # silently dropped at the carry join (0-row output, no error).
    # Spark sorts NaN larger than any double, so under DESC a NaN key
    # must rank FIRST, NULLs last, normals in between — matching the
    # sequential rank() window exactly.
    data = [
        (1, 10.0), (2, float("nan")), (3, 5.0), (4, None), (5, 20.0),
    ]
    df = spark.createDataFrame(data, "id long, v double").repartition(3)
    got = ordered_rank_desc(df, "v", "id", out_col="rnk", n_buckets=4)
    assert got.count() == 5  # nothing dropped
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = df.withColumn("rnk_w", F.row_number().over(w).cast("long"))
    j = got.join(want, ["id"])
    assert j.filter(F.col("rnk") != F.col("rnk_w")).count() == 0
    ranks = {r["id"]: r["rnk"] for r in got.collect()}
    assert ranks[2] == 1 and ranks[4] == 5  # NaN first, NULL last


def test_rank_desc_infinite_keys_rank_at_edges(spark):
    from financial_anomaly_detection_spark.operators.prefix import ordered_rank_desc

    # +/-Inf passed the old isNotNull & ~isnan screen, made the
    # min/max bounds infinite, width_bucket(v, -inf, inf, n) -> NULL
    # for EVERY row, and the carry equi-join silently dropped the
    # whole input. Spark's double total order is
    # NaN > +Inf > finite > -Inf, NULLs last under DESC — the scan
    # must keep every row and match the sequential window exactly.
    data = [
        (1, 10.0), (2, float("inf")), (3, float("-inf")), (4, None),
        (5, 20.0), (6, float("nan")), (7, float("inf")), (8, 5.0),
    ]
    df = spark.createDataFrame(data, "id long, v double").repartition(3)
    got = ordered_rank_desc(df, "v", "id", out_col="rnk", n_buckets=4)
    assert got.count() == 8  # nothing dropped
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = df.withColumn("rnk_w", F.row_number().over(w).cast("long"))
    j = got.join(want, ["id"])
    assert j.filter(F.col("rnk") != F.col("rnk_w")).count() == 0
    ranks = {r["id"]: r["rnk"] for r in got.collect()}
    # NaN first, then the two +Inf by tie key, ..., -Inf, NULL last
    assert ranks[6] == 1 and ranks[2] == 2 and ranks[7] == 3
    assert ranks[3] == 7 and ranks[4] == 8

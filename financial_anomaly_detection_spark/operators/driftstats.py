"""Distribution-drift statistics over pre-aggregated count tables.

The KS and Mann-Whitney drift queries (queries.py) reduce the raw
event scan to a tiny per-value count table ``g`` (one row per distinct
integer cents value) and then compute the statistic from counts alone.
These helpers hold that count-table -> statistic math so it can be
unit-tested at OVERFLOW scale without materializing rows: a synthetic
``g`` with per-row counts in the billions exercises exactly the
arithmetic a 100 TB window would.

Overflow discipline (the reason this module exists): the
cross-multiplied products — ``rank * n`` in the KS gap,
``c_ref * midrank2`` in the rank-sum, and the ``* 1_000_000``
effect-size quantization — are carried in DECIMAL(38,0), which is
exact integer arithmetic to 38 digits. int64 would overflow the
effect size at n_ref*n_cur > ~9.2e12 (~3e6 rows per window — a
morning of events at production rates) and the KS gap at ~3e9 rows
per window. The decimal math runs only on the aggregated count table
(|distinct values| rows, not |events|), so the cost is unmeasurable
while the headroom moves to ~1e19 rows per window — past any 100 TB
deployment. Final OUTPUT columns stay BIGINT (the driver-facing
schema): d_num / u2_ref themselves exceed int64 only beyond ~3e9-row
windows, which the docstrings and the boundary test pin down.

Counterpart of the reference's batch drift monitoring intent
(python_scoring/train.py's fixed z-score thresholds have no
distribution-shift story); the statistics follow the public formulas
(Kolmogorov 1933 two-sample form; Mann & Whitney 1947 with midrank
tie correction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEC = "DECIMAL(38,0)"


def ks_from_counts(g: DataFrame) -> DataFrame:
    """Two-sample KS statistic from a (cents, c_ref, c_cur) count table.

    Returns one row: (n_ref, n_cur, d_num, d_u) where
    ``d_num = max_v |R_ref(v)*n_cur - R_cur(v)*n_ref|`` (integer ECDF
    cross-product, exact) and ``d_u = floor(1e6 * D)``. Cumulative
    ranks come from the two-pass distributed prefix sum — no
    single-partition window. All products run in DECIMAL(38,0); see
    module docstring for the overflow bounds.
    """
    from .prefix import ordered_prefix_sum

    n = g.agg(F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur"))
    e = ordered_prefix_sum(g, "cents", "c_ref", out_col="_p_ref", pin=False)
    e = ordered_prefix_sum(e, "cents", "c_cur", out_col="_p_cur", pin=False)
    gap = F.abs(
        (F.col("_p_ref") + F.col("c_ref")).cast(DEC) * F.col("n_cur")
        - (F.col("_p_cur") + F.col("c_cur")).cast(DEC) * F.col("n_ref")
    )
    return (
        e.join(F.broadcast(n))
        .groupBy("n_ref", "n_cur")
        .agg(F.max(gap).alias("_d_dec"))
        .select(
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.col("_d_dec").cast("long").alias("d_num"),
            F.when(
                (F.col("n_ref") == 0) | (F.col("n_cur") == 0), F.lit(None)
            )
            .otherwise(
                F.expr(
                    f"(_d_dec * 1000000) div "
                    f"(CAST(n_ref AS {DEC}) * n_cur)"
                )
            )
            .cast("long")
            .alias("d_u"),
        )
    )


def mannwhitney_from_counts(g: DataFrame) -> DataFrame:
    """Mann-Whitney U + AUC effect size from a (cents, c_ref, t) table.

    ``t`` is the COMBINED count at each value (ties), ``c_ref`` the
    reference-window share. Doubled-midrank arithmetic keeps ties
    exact: midrank2(v) = 2*R_before(v) + t(v) + 1, R2_ref =
    sum(c_ref * midrank2), U2_ref = R2_ref - n_ref*(n_ref+1), and
    auc_u = floor(1e6 * U2_ref / (2*n_ref*n_cur)) — P(ref > cur)
    quantized. Products in DECIMAL(38,0) (see module docstring).
    """
    from .prefix import ordered_prefix_sum

    e = ordered_prefix_sum(g, "cents", "t", out_col="_r_before", pin=False)
    a = e.agg(
        F.sum("c_ref").alias("n_ref"),
        (F.sum("t") - F.sum("c_ref")).alias("n_cur"),
        F.sum(
            F.col("c_ref").cast(DEC)
            * (2 * F.col("_r_before") + F.col("t") + 1)
        ).alias("_r2_dec"),
    )
    u2 = f"_r2_dec - CAST(n_ref AS {DEC}) * (n_ref + 1)"
    return a.select(
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.expr(u2).cast("long").alias("u2_ref"),
        F.expr(
            f"CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL "
            f"ELSE (({u2}) * 1000000) "
            f"div (CAST(2 AS {DEC}) * n_ref * n_cur) END"
        )
        .cast("long")
        .alias("auc_u"),
    )


def wasserstein_from_counts(g: DataFrame) -> DataFrame:
    """Wasserstein-1 (earth mover) distance from a (cents, c_ref,
    c_cur) count table — the magnitude-aware companion to KS: KS is
    the LARGEST ECDF gap, W1 the integral of the gap over the value
    axis (how much probability mass must move, times how far, to turn
    one distribution into the other), which is the number a money
    distribution shift is naturally priced in.

    For integer-valued samples the closed form is
    ``W1 = (1/(n_ref*n_cur)) * sum_i |R_ref(v_i)*n_cur -
    R_cur(v_i)*n_ref| * (v_{i+1} - v_i)`` over consecutive distinct
    values (Vallender 1974's 1-D formula on the merged support).
    Everything before the final division is exact integer arithmetic
    in DECIMAL(38,0): cumulative ranks come from the two-pass parallel
    prefix sum, and the NEXT distinct value arrives by a rank
    equi-join (rank from a second prefix sum over ones), never a
    global-window ``lead`` — no single-partition exchange anywhere.

    Returns one row: (n_ref, n_cur, w1_num, w1_cents_u) with
    ``w1_num = sum |cumdiff| * gap`` (BIGINT output: exceeds int64
    only past ~n_ref*n_cur*range > 9e18 — e.g. two 1e6-row windows
    over a $10M value range; the internal math is DECIMAL(38,0) to
    ~1e19x headroom beyond that) and ``w1_cents_u = floor(1e6 *
    W1-in-cents)``.
    """
    from .prefix import ordered_prefix_sum

    n = g.agg(F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur"))
    # pin=True on the CHAINED prefix sums, unlike ks/mannwhitney's
    # single-level pin=False: each unpinned prefix references its
    # input ~4x (bounds + two subtotal sides + window), so three
    # chained levels plus the rank self-join below duplicate the
    # logical tree ~4^3x (measured: 137 nested-loop nodes in the
    # analyzed plan). Each pin materializes one grid-sized artifact
    # (a row per distinct value) and caps the tree at every level.
    e = ordered_prefix_sum(g, "cents", "c_ref", out_col="_p_ref", pin=True)
    e = ordered_prefix_sum(e, "cents", "c_cur", out_col="_p_cur", pin=True)
    e = e.withColumn("_one", F.lit(1))
    e = ordered_prefix_sum(e, "cents", "_one", out_col="_rk0", pin=True)
    cur = e.select(
        (F.col("_rk0") + 1).alias("_rk"),
        F.col("cents"),
        (F.col("_p_ref") + F.col("c_ref")).cast(DEC).alias("_r_ref"),
        (F.col("_p_cur") + F.col("c_cur")).cast(DEC).alias("_r_cur"),
    )
    nxt = cur.select(
        (F.col("_rk") - 1).alias("_rk"), F.col("cents").alias("_next_cents")
    )
    # LEFT join: the LAST value row has no successor — its gap is 0
    # (past the maximum both ECDFs are 1 forever), and keeping the row
    # means a single-value grid still yields its one (w1=0) output row
    stepped = cur.join(nxt, "_rk", "left")
    term = (
        F.abs(
            F.col("_r_ref") * F.col("n_cur") - F.col("_r_cur") * F.col("n_ref")
        )
        * F.coalesce(
            (F.col("_next_cents") - F.col("cents")).cast(DEC),
            F.lit(0).cast(DEC),
        )
    )
    return (
        stepped.join(F.broadcast(n))
        .groupBy("n_ref", "n_cur")
        .agg(F.sum(term).alias("_w1_dec"))
        .select(
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.col("_w1_dec").cast("long").alias("w1_num"),
            F.when(
                (F.col("n_ref") == 0) | (F.col("n_cur") == 0), F.lit(None)
            )
            .otherwise(
                F.expr(
                    f"(_w1_dec * 1000000) div "
                    f"(CAST(n_ref AS {DEC}) * n_cur)"
                )
            )
            .cast("long")
            .alias("w1_cents_u"),
        )
    )

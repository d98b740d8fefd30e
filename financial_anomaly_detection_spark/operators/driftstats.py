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

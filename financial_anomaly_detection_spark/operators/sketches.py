"""Mergeable frequency sketches (Count-Min) as relational plans.

Companion to the HLL tier (``approx_distinct_users`` uses Spark's
built-in approx_count_distinct): a Count-Min sketch (Cormode &
Muthukrishnan 2005) folds an unbounded key stream into a FIXED
``depth × width`` counter grid — the mergeable summary you ship from
1000 executors when the key cardinality itself is the scale problem
(per-key exact state is O(keys); the sketch is O(d·w) per partition,
merged by plain addition).

Engine form: hashing is md5-derived (identical bytes → identical
hex in every engine — the repo's hash-surrogate discipline, see
minhash_exact_md5), the grid is one ``groupBy(row, bucket)`` partial
aggregation (map-side combine does the per-partition sketching), and
point estimates are a ``min`` over the key's ``depth`` cells after a
broadcast-size equi-join against the grid. No UDFs, no driver state.

Estimates are upper bounds: cnt(k) <= est(k) <= cnt(k) + eps·N with
eps = e/width at the usual guarantees; both properties are
pytest-asserted and the grid itself is hash-exact against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(col, j: int, width: int):
    """Row-j bucket of a key: first 8 md5 hex chars as uint32, mod
    width. Bit-identical in any engine with md5 over the same bytes."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(f"#{j}"))), 1, 8), 16, 10)
        .cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the CMS grid: one row per (sketch row j, bucket) with the
    summed count. Exactly ONE shuffle of at most depth*width rows
    after map-side partial aggregation — the 100 TB shape."""
    key = F.col(key_col).cast("string")
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _bucket(key, j, width).alias("bucket"))
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_c"))
        .groupBy(F.col("_c.j").alias("j"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each key in ``keys`` from the grid: min over its
    depth cells. The grid is depth*width rows — broadcast it."""
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _bucket(key, j, width).alias("bucket"))
            for j in range(depth)
        ]
    )
    probes = keys.select(F.col(key_col), F.explode(cells).alias("_c")).select(
        key_col, F.col("_c.j").alias("j"), F.col("_c.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def quantile_sketch_knots(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_groups: int = 32,
    knots_per_group: int = 200,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Mergeable quantile summary (GK/KLL-family, deterministic form).

    Folds an unbounded value stream into ``n_groups * knots_per_group``
    weighted knots — the quantile analog of the CMS/HLL/KMV tier: per-
    key exact state is O(n); the sketch is O(G*k) regardless of volume.

    Determinism & layout-independence: rows are assigned to one of
    ``n_groups`` summary groups by an MD5 HASH OF THE ROW ID (the
    ``_bucket`` discipline above — not by Spark partition), so the
    sketch is a pure function of the data, survives repartitioning
    bit-for-bit, AND is reproducible in any engine with md5 — which is
    what lets the registered query carry a full DuckDB value-hash
    oracle despite the Arrow/numpy execution path.
    Each group is summarized by an Arrow-batched ``applyInPandas``
    (numpy sort + evenly spaced rank knots): knot j of a group holds
    (value at rank ceil(j*n/k), weight = rank step — ceil computed in
    INTEGER arithmetic, (j*n + k - 1) // k), so per-group rank error
    is <= n_g/k and total error after the weighted merge is <= N/k
    (0.5% at k=200) — pytest-asserted against exact ranks.

    ``partition_cols`` (LONG-typed columns of ``df``) build one
    independent sketch per partition — the materialize-daily-sketches
    shape: knots keyed by (partition_cols..., value) can be persisted
    and any coarser window (week, month, ad-hoc ranges) merges
    knot-sized data by plain weight addition instead of rescanning
    raw rows (see quantile_sketch_weekly_rollup).

    Returns (*partition_cols, value, w): merged weighted knots.
    """
    import pandas as pd

    pcols = list(partition_cols)
    spark_schema = "".join(f"{c} long, " for c in pcols) + "value long, w long"

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        order = np.argsort(pdf["v"].to_numpy(), kind="stable")
        v = pdf["v"].to_numpy()[order]
        cum = np.cumsum(pdf["cnt"].to_numpy()[order])
        n = int(cum[-1])
        k = min(knots_per_group, n)
        j = np.arange(1, k + 1, dtype="int64")
        ranks = (j * n + k - 1) // k  # integer ceil(j*n/k)
        prev = np.concatenate(([0], ranks[:-1]))
        # value at rank r = first value whose cumulative count reaches r
        idx = np.searchsorted(cum, ranks, side="left")
        out = {c: pdf[c].iloc[0] for c in pcols}
        out.update({"value": v[idx], "w": ranks - prev})
        return pd.DataFrame(out)

    # JVM-side weighted pre-aggregation BEFORE the Arrow stage: the
    # shuffle carries one row per DISTINCT (group, value) with its
    # count — map-side combined — instead of every raw row through
    # Arrow. Measured 23 s -> ~4 s at sf0.1 x1; same knots exactly
    # (rank-of-sorted-duplicates is count arithmetic either way).
    groups = (
        df.select(
            *pcols,
            (
                F.conv(
                    F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
                ).cast("long")
                % n_groups
            ).alias("g"),
            F.col(value_col).alias("v"),
        )
        .groupBy(*pcols, "g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # Routing by group-count regime (knots identical either way): with
    # partition_cols (daily sketches) the group count is days*n_groups
    # — many tiny groups, where per-group Arrow overhead dominates and
    # partitioning.sorted_group_map wins. WITHOUT partition_cols there
    # are only n_groups large-ish groups: the per-group constant is
    # negligible and the sorted map's extra repartition+sort is pure
    # cost (measured 3.06 -> 4.78 s at sf0.1 when routed
    # unconditionally), so the flat case stays plain applyInPandas.
    if pcols:
        from .partitioning import sorted_group_map

        knots = sorted_group_map(groups, [*pcols, "g"], summarize, spark_schema)
    else:
        knots = groups.groupBy("g").applyInPandas(summarize, spark_schema)
    return knots.groupBy(*pcols, "value").agg(F.sum("w").cast("long").alias("w"))


def quantile_sketch_estimates(
    knots: DataFrame, quantiles: list[float]
) -> DataFrame:
    """Quantile estimates from merged knots, fully relational: the
    running weight is the two-pass distributed prefix scan (no
    single-partition exchange), and each estimate is the smallest
    knot value whose cumulative weight reaches ceil(q*N).

    ``knots`` is pinned HERE (one knot-sized artifact) because it has
    two independent consumers — the prefix scan and the N-total
    aggregate — and its upstream contains the Arrow summarize stage:
    unpinned, that python stage re-ran once per consumer (r12,
    FlatMapGroupsInPandas x2 in the quantile_sketch_values plan). The
    prefix scan then runs lazy (pin=False) over the pinned frame —
    the one-unpinned-level-per-pinned-input rule its docstring
    blesses.

    Pin lifecycle (ADVICE r12): the checkpointed knots frame backs the
    RETURNED lazy plan, so it cannot be freed here (unlike the
    convergence loops' superseded generations). The bench/driver
    harness releases it between queries (``release_pins``); a
    long-lived session calling this repeatedly outside that harness
    must unpersist between calls the same way (drop the session's
    persistent RDDs once the result is consumed), or the knot-sized
    pins accumulate in block-manager storage — py4j GC alone is too
    lazy (the measured repo-wide discipline)."""
    from .prefix import ordered_prefix_sum

    knots = knots.localCheckpoint(eager=True)
    run = ordered_prefix_sum(knots, "value", "w", out_col="_before", pin=False)
    run = run.withColumn("cum", (F.col("_before") + F.col("w")).cast("long"))
    total = knots.agg(F.sum("w").cast("long").alias("n_total"))
    qdf = run.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    return (
        run.join(F.broadcast(total))
        .join(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n_total")))
        .groupBy("q")
        .agg(
            F.min("value").alias("est"),
            F.any_value("n_total").alias("n_total"),
        )
    )


def cms_join_size_estimate(
    a: DataFrame, a_key: str, b: DataFrame, b_key: str,
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Join-cardinality estimation by CMS inner product (Cormode &
    Muthukrishnan 2005, §4.2): |A JOIN B on k| is estimated as the MIN
    over sketch rows j of sum_bucket cmsA[j][b] * cmsB[j][b] — an
    upper bound that is exact when no two keys collide in a row.

    This is the optimizer-statistics use of the sketch: both grids are
    fixed depth*width tables built with one partial-agg shuffle each,
    so the estimate costs O(grid) however large the join inputs — the
    shape a 100 TB planner needs BEFORE committing to a join strategy.
    Returns one row: (est_join_rows,).

    The min runs over ALL depth rows: a row j whose buckets do not
    overlap at all has inner product 0 (true join size 0), so the
    per-row products are left-joined against the 0..depth-1 index and
    missing rows coalesce to 0 — an inner join would drop them and
    overstate (or return NULL for fully disjoint key sets).
    """
    ga = count_min_sketch(a.select(F.col(a_key).alias("k")), "k", depth, width)
    gb = count_min_sketch(b.select(F.col(b_key).alias("k")), "k", depth, width)
    prod = (
        ga.alias("x")
        .join(F.broadcast(gb.alias("y")), ["j", "bucket"])
        .select("j", (F.col("x.cnt") * F.col("y.cnt")).alias("p"))
        .groupBy("j")
        .agg(F.sum("p").alias("ip"))
    )
    rows = ga.sparkSession.createDataFrame(
        [(j,) for j in range(depth)], "j int"
    )
    full = rows.join(F.broadcast(prod), "j", "left").select(
        F.coalesce(F.col("ip"), F.lit(0)).alias("ip")
    )
    return full.agg(F.min("ip").cast("long").alias("est_join_rows"))

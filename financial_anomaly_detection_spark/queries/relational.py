"""Relational core: scans/filters/projections, TPC-H suite, windows, set ops, subqueries, reshape.

Split from the monolithic queries.py (round 10) — pure move, zero
behavior change; registration side effects run at import via
``queries/__init__.py``. 47 registered queries.
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# Scans / projections / filters (S1, P1-P7)
# ---------------------------------------------------------------------------


@register(
    "events_scan_filter_project",
    oracle="""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(user_id AS BIGINT) AS user_id,
               event_type,
               value
        FROM events
        WHERE value >= 0 AND ts IS NOT NULL AND event_type IN ('purchase', 'click')
    """,
    description="P1-P4: scan -> predicate filter -> projection; filters and "
    "pruned columns reach the parquet scan (PushedFilters).",
    tags=["scan", "filter", "project"],
)
def q_events_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("value") >= 0)
        & F.col("ts").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    ).select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        "value",
    )


@register(
    "time_features_extract",
    oracle="""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(year(ts) AS BIGINT) AS year,
               CAST(month(ts) AS BIGINT) AS month,
               CAST(isodow(ts) - 1 AS BIGINT) AS day_of_week,
               CAST(hour(ts) AS BIGINT) AS hour
        FROM events
    """,
    description="F1-F3: time-feature projection with the pandas day-of-week "
    "convention (Mon=0..Sun=6) — the reference's train.py:40-43.",
    tags=["functions", "time"],
)
def q_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("long"),
        F.year("ts").cast("long").alias("year"),
        F.month("ts").cast("long").alias("month"),
        dow_pandas("ts").cast("long").alias("day_of_week"),
        F.hour("ts").cast("long").alias("hour"),
    )


@register(
    "profile_window_7d",
    oracle=f"""
        SELECT CAST(user_id AS BIGINT) AS user_id,
               {money_avg_sql('value')} AS avg_value,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        WHERE ts >= TIMESTAMP '{TIGHT_ANCHOR}' - INTERVAL 7 DAY
          AND ts <  TIMESTAMP '{TIGHT_ANCHOR}'
        GROUP BY user_id
    """,
    description="P8/W3: the rolling-lookback predicate with a window tight "
    "enough to actually exclude rows on both sides.",
    tags=["filter", "aggregate", "time"],
)
def q_profile_window_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(lookback_filter("ts", TIGHT_ANCHOR, 7))
        .groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(
            money_avg("value").alias("avg_value"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


@register(
    "percentile_thresholds",
    # Percentile interpolates between two order statistics; computing it
    # over integer cents keeps lo/hi exact so the linear interpolation
    # is bit-identical across engines.
    oracle=f"""
        SELECT event_type,
               {sround_sql("quantile_cont(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.975) / 100.0", 6)} AS p975,
               {sround_sql("quantile_cont(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.5) / 100.0", 6)} AS p50,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type
    """,
    description="A4/M9: exact linear-interpolation percentile per group — "
    "the AE threshold calibration (train.py:86-88). percentile_approx is the "
    "documented 100 TB substitute.",
    tags=["aggregate", "percentile"],
)
def q_percentile_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
    return ev.groupBy("event_type").agg(
        sround(F.expr(f"percentile({cents}, 0.975)") / 100.0, 6).alias("p975"),
        sround(F.expr(f"percentile({cents}, 0.5)") / 100.0, 6).alias("p50"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               SUM({_Q1_CENTS_SQL['qty']}) / 100.0 AS sum_qty,
               SUM({_Q1_CENTS_SQL['price']}) / 100.0 AS sum_base_price,
               SUM({_Q1_CENTS_SQL['price']} * (100 - {_Q1_CENTS_SQL['disc']})) / 1e4 AS sum_disc_price,
               SUM({_Q1_CENTS_SQL['price']} * (100 - {_Q1_CENTS_SQL['disc']})
                   * (100 + {_Q1_CENTS_SQL['tax']})) / 1e6 AS sum_charge,
               {sround_sql(f"SUM({_Q1_CENTS_SQL['qty']}) / (100.0 * COUNT(*))", 4)} AS avg_qty,
               {sround_sql(f"SUM({_Q1_CENTS_SQL['price']}) / (100.0 * COUNT(*))", 4)} AS avg_price,
               {sround_sql(f"SUM({_Q1_CENTS_SQL['disc']}) / (100.0 * COUNT(*))", 6)} AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 shape: scan-heavy grouped aggregation with derived "
    "measures in exact integer cents; partial (map-side) aggregation + AQE "
    "coalesce.",
    tags=["aggregate", "tpch"],
)
def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def cents(c: str) -> Column:
        return F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")

    qty, price, disc, tax = (cents(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(price) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(price * (F.lit(100) - disc)) / F.lit(1e4)).alias("sum_disc_price"),
            (F.sum(price * (F.lit(100) - disc) * (F.lit(100) + tax)) / F.lit(1e6)).alias(
                "sum_charge"
            ),
            sround(F.sum(qty) / (F.lit(100.0) * cnt), 4).alias("avg_qty"),
            sround(F.sum(price) / (F.lit(100.0) * cnt), 4).alias("avg_price"),
            sround(F.sum(disc) / (F.lit(100.0) * cnt), 6).alias("avg_disc"),
            cnt.cast("long").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
        SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
               SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) / 1e4 AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    description="TPC-H Q3 shape: 3-way join, grouped revenue, deterministic "
    "top-10 (revenue desc, orderkey tiebreak). Customer dim broadcasts.",
    tags=["join", "topk", "tpch"],
)
def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = _revenue_cents()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(revenue) / F.lit(1e4)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            F.col("l_orderkey").cast("long"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
    )


@register(
    "q5_region_volume",
    oracle="""
        SELECT n.n_name,
               SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) / 1e4 AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    description="TPC-H Q5 shape: 6-table star join; all dims broadcast, the "
    "only shuffle is lineitem->orders and the final group-by.",
    tags=["join", "broadcast", "tpch"],
)
def q_q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(_revenue_cents()) / F.lit(1e4)).alias("revenue"))
    )


@register(
    "customers_without_orders",
    # Anti-join against a filtered build side (urgent 1996 orders) so the
    # result is non-empty at every scale factor — a 0-row parity match
    # would be weak evidence.
    oracle="""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        )
    """,
    description="Left-anti join (available-but-unexercised in the reference, "
    "SURVEY.md §2.5): customers with no urgent 1996 order.",
    tags=["join", "anti"],
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").cast("long"), "c_mktsegment"
    )


@register(
    "customers_with_urgent_orders",
    oracle="""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
    """,
    description="Left-semi join (§2.5): customers holding at least one "
    "urgent order — EXISTS without duplication of the probe side.",
    tags=["join", "semi"],
)
def q_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").cast("long"), "c_mktsegment"
    )


@register(
    "set_ops_users",
    # Per-day (user, date) activity sets: at every sf some users purchase
    # on days they hit no error, so EXCEPT/INTERSECT both return rows.
    oracle="""
        WITH p AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
                          strftime(ts, '%Y-%m-%d') AS day
                   FROM events WHERE event_type = 'purchase'),
             e AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
                          strftime(ts, '%Y-%m-%d') AS day
                   FROM events WHERE event_type = 'error')
        SELECT user_id, day, 'purchase_no_error' AS tag FROM (
            SELECT * FROM p EXCEPT SELECT * FROM e
        )
        UNION ALL
        SELECT user_id, day, 'purchase_and_error' AS tag FROM (
            SELECT * FROM p INTERSECT SELECT * FROM e
        )
    """,
    description="Set ops (§2.5): per-day user activity sets — EXCEPT, "
    "INTERSECT, and UNION ALL in one plan.",
    tags=["setop"],
)
def q_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def day_set(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select(
                F.col("user_id").cast("long").alias("user_id"),
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
            )
            .distinct()
        )

    p, e = day_set("purchase"), day_set("error")
    # subtract/intersect == SQL EXCEPT/INTERSECT (distinct) semantics.
    no_err = p.subtract(e).withColumn("tag", F.lit("purchase_no_error"))
    both = p.intersect(e).withColumn("tag", F.lit("purchase_and_error"))
    return no_err.unionAll(both)


@register(
    "rank_windows",
    oracle="""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
               CAST(RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS value_rank,
               COALESCE(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), -1.0) AS prev_value,
               COALESCE(LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), -1.0) AS next_value
        FROM events
    """,
    description="Ranking + offset windows (§2.5, engine-native extras): "
    "row_number / rank / lag / lead per user ordered by event time.",
    tags=["window", "rank"],
)
def q_rank_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    byval = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        F.col("event_id").cast("long"),
        F.row_number().over(seq).cast("long").alias("rn"),
        F.rank().over(byval).cast("long").alias("value_rank"),
        F.coalesce(F.lag("value").over(seq), F.lit(-1.0)).alias("prev_value"),
        F.coalesce(F.lead("value").over(seq), F.lit(-1.0)).alias("next_value"),
    )


@register(
    "distinct_agg_users",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(DISTINCT CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_distinct_value
        FROM events
        GROUP BY event_type
    """,
    description="Distinct aggregation (§2.4 note): exact count-distinct and "
    "sum-distinct per group. approx_count_distinct is the 100 TB variant "
    "(exercised rows-only elsewhere).",
    tags=["aggregate", "distinct"],
)
def q_distinct_agg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum_distinct(dec("value")).cast("double").alias("sum_distinct_value"),
    )


@register(
    "json_extract_props",
    oracle=f"""
        SELECT event_type,
               {sround_sql("CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*)", 4)} AS avg_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
    """,
    description="JSON payload extraction (engine extension, §1.2): "
    "get_json_object over the events.props column + aggregation.",
    tags=["json", "functions"],
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        sround(F.sum(k).cast("double") / F.count(F.lit(1)), 4).alias("avg_k"),
        F.max(k).cast("long").alias("max_k"),
    )


@register(
    "rollup_order_volume",
    oracle="""
        SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    description="ROLLUP grouping sets (§2.4 available-but-unexercised): "
    "order volume by priority/status with subtotals and a grand total.",
    tags=["aggregate", "rollup"],
)
def q_rollup_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum(dec("o_totalprice", 14, 2)).cast("double").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            "total",
            "n",
        )
    )


@register(
    "time_range_self_join",
    # Oracle states the semantic as the plain theta join; the Spark
    # implementation executes the bin-bucketed equi-join form.
    oracle="""
        SELECT CAST(a.user_id AS BIGINT) AS user_id,
               CAST(a.event_id AS BIGINT) AS id_a,
               CAST(b.event_id AS BIGINT) AS id_b,
               CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND epoch_us(b.ts) > epoch_us(a.ts)
         AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000
    """,
    description="Interval/range self-join (operator class Spark lacks "
    "natively): same-user event pairs within a 5-minute window, executed "
    "as a bin-bucketed equi-join + exact post-filter (hash-partitionable "
    "at scale) — the oracle states the equivalent theta join.",
    tags=["join", "range", "time"],
)
def q_time_range_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import time_proximity_self_join

    ev = load_table(spark, sf_dir, "events")
    return time_proximity_self_join(
        ev, key="user_id", ts="ts", id_col="event_id", window_us=300_000_000
    ).select(
        F.col("user_id").cast("long"),
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("gap_us").cast("long"),
    )


@register(
    "array_map_functions",
    # collect_list order is nondeterministic under parallelism — wrap in
    # sort_array / list_sort on both sides for a stable hash. The array
    # columns are serialized to comma-joined strings on BOTH engines:
    # the driver's canonicalizer cannot sort/hash raw array cells
    # (pandas lexsort on ndarray → "unhashable type"), so the compare
    # surface must be scalar.
    oracle="""
        SELECT CAST(user_id AS BIGINT) AS user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
               CAST(length(list(DISTINCT event_type)) AS BIGINT) AS n_types,
               array_to_string(list_sort(list(CAST(event_id AS BIGINT))), ',') AS event_ids,
               CAST(list_sort(list(CAST(event_id AS BIGINT)))[1] AS BIGINT) AS first_event_id
        FROM events
        GROUP BY user_id
    """,
    description="Array aggregation + functions (§2.8 extras): per-user "
    "sorted distinct type sets and event-id arrays — collect_list/"
    "collect_set with deterministic sort_array normalization, emitted "
    "as joined strings so the compare surface is scalar.",
    tags=["aggregate", "array"],
)
def q_array_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ids_sorted = F.sort_array(F.collect_list(F.col("event_id").cast("long")))
    return ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types_seen"),
        F.size(F.collect_set("event_type")).cast("long").alias("n_types"),
        F.array_join(ids_sorted.cast("array<string>"), ",").alias("event_ids"),
        F.element_at(ids_sorted, 1).cast("long").alias("first_event_id"),
    )


@register(
    "explode_type_matrix",
    oracle="""
        WITH per_user AS (
            SELECT user_id, list_sort(list(DISTINCT event_type)) AS types
            FROM events GROUP BY user_id
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               unnest(types) AS event_type,
               CAST(length(types) AS BIGINT) AS n_types
        FROM per_user
    """,
    description="explode/unnest round-trip (§2.8 extras): aggregate to an "
    "array, explode back to rows carrying array-level context.",
    tags=["array", "explode"],
)
def q_explode_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types")
    )
    return per_user.select(
        F.col("user_id").cast("long"),
        F.explode("types").alias("event_type"),
        F.size("types").cast("long").alias("n_types"),
    )


@register(
    "from_json_props_struct",
    oracle="""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(CAST(props AS JSON)->>'$.k' AS BIGINT) AS k,
               CASE WHEN CAST(CAST(props AS JSON)->>'$.k' AS BIGINT) % 2 = 0
                    THEN 'even' ELSE 'odd' END AS parity
        FROM events
    """,
    description="from_json into a typed struct (§1.2 engine extension): "
    "the props JSON payload parsed once with an explicit schema, fields "
    "consumed as columns.",
    tags=["json", "functions"],
)
def q_from_json_props_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k BIGINT"))
    return parsed.select(
        F.col("event_id").cast("long"),
        F.col("p.k").alias("k"),
        F.when(F.col("p.k") % 2 == 0, "even").otherwise("odd").alias("parity"),
    )


@register(
    "except_all_bag_semantics",
    oracle="""
        SELECT CAST(user_id AS BIGINT) AS user_id
        FROM (
            SELECT user_id FROM events WHERE event_type IN ('purchase', 'click')
            EXCEPT ALL
            SELECT user_id FROM events WHERE event_type = 'error'
        )
    """,
    description="EXCEPT ALL bag semantics (§2.5): per-occurrence set "
    "difference — each error event cancels ONE purchase/click occurrence "
    "of the same user.",
    tags=["setop"],
)
def q_except_all_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        F.col("user_id").cast("long").alias("user_id")
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").cast("long").alias("user_id")
    )
    return a.exceptAll(b)


@register(
    "q7_nation_volume_shipping",
    oracle="""
        SELECT supp.n_name AS supp_nation,
               cust.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) / 1e4 AS revenue
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation cust ON c.c_nationkey = cust.n_nationkey
        JOIN nation supp ON s.s_nationkey = supp.n_nationkey
        WHERE ((supp.n_nationkey % 2 = 0 AND cust.n_nationkey % 2 = 1)
            OR (supp.n_nationkey % 2 = 1 AND cust.n_nationkey % 2 = 0))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY supp.n_name, cust.n_name, year(l.l_shipdate)
    """,
    description="TPC-H Q7 shape: bidirectional nation-group trade volume "
    "by ship year — two aliased joins against the same dimension, "
    "disjunctive pair predicate, year extract in the grouping key.",
    tags=["join", "tpch"],
)
def q_q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cust_n = n.select(F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation"))
    supp_n = n.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation"))
    # nation groups by key parity: the bidirectional-pair disjunction of
    # Q7, generalized so every scale factor has qualifying trade lanes
    pair = ((F.col("_snk") % 2 == 0) & (F.col("_cnk") % 2 == 1)) | (
        (F.col("_snk") % 2 == 1) & (F.col("_cnk") % 2 == 0)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("_cnk"))
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("_snk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg((F.sum(_revenue_cents()) / F.lit(1e4)).alias("revenue"))
    )


@register(
    "q8_market_share",
    # Market share = ratio of two exact cents sums per year.
    oracle=f"""
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {sround_sql(f'''SUM(CASE WHEN supp.n_nationkey % 2 = 0
                        THEN {_REV_CENTS_SQL} ELSE 0 END)
                   * 1.0 / SUM({_REV_CENTS_SQL})''', 6)} AS mkt_share
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
        JOIN region r    ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation supp ON s.s_nationkey = supp.n_nationkey
        WHERE r.r_name = (SELECT MIN(r_name) FROM region)
        GROUP BY year(o.o_orderdate)
    """,
    description="TPC-H Q8 shape: market share of a supplier-nation group "
    "within one region's order volume, per year — conditional revenue "
    "ratio over a 6-table star join.",
    tags=["join", "aggregate", "tpch"],
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    region = r.orderBy("r_name").limit(1)
    cust_n = n.select(F.col("n_nationkey").alias("_cnk"), F.col("n_regionkey").alias("_crk"))
    supp_n = n.select(F.col("n_nationkey").alias("_snk"))
    rev = _revenue_cents()
    group_rev = F.sum(F.when(F.col("_snk") % 2 == 0, rev).otherwise(F.lit(0)))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("_cnk"))
        .join(F.broadcast(region), F.col("_crk") == region.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("_snk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(sround(group_rev * F.lit(1.0) / F.sum(rev), 6).alias("mkt_share"))
    )


@register(
    "q9_profit_by_nation_year",
    # No partsupp table in the testdata; cost proxy = 80% of retail
    # price x quantity, exact in integer 1e-4 units on both sides.
    oracle="""
        SELECT supp.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
                   - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT) * 80
                     * CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) / 100
                  ) / 1e4 AS profit
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation supp ON s.s_nationkey = supp.n_nationkey
        GROUP BY supp.n_name, year(o.o_orderdate)
    """,
    description="TPC-H Q9 shape: profit (revenue minus a retail-price cost "
    "proxy; the testdata ships no partsupp) per supplier nation per year.",
    tags=["join", "aggregate", "tpch"],
)
def q_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    retail_cents = F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    qty_cents = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    # cost in 1e-4 units: retail_cents * 80 * qty_cents / 100 — qty is
    # integer-valued so qty_cents is a multiple of 100 and the division
    # is exact in integers on both engines
    profit_units = _revenue_cents() - retail_cents * F.lit(80) * qty_cents / F.lit(100)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_units) / F.lit(1e4)).alias("profit"))
    )


@register(
    "q14_promo_revenue_pct",
    # Percentage of promo-part revenue: ratio of two exact cents sums ->
    # bit-identical division, sround for the output.
    oracle=f"""
        SELECT {sround_sql('''100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                        * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
                   ELSE 0 END)
               / SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))''', 6)}
               AS promo_revenue_pct,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    description="TPC-H Q14 shape: conditional-revenue percentage over a "
    "broadcast part join — a global ratio aggregate.",
    tags=["join", "aggregate", "tpch"],
)
def q_q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _revenue_cents()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            sround(F.lit(100.0) * promo / F.sum(rev), 6).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
        SELECT SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) / 1e4 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 5 AND l.l_quantity <= 25)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity >= 10 AND l.l_quantity <= 35)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
    description="TPC-H Q19 shape: disjunction of conjunctive brand/size/"
    "quantity clauses across the join — exercises complex boolean "
    "pushdown and join-predicate placement.",
    tags=["join", "filter", "tpch"],
)
def q_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & sz.between(1, 15) & q.between(5, 25))
        | ((b == "Brand#2") & sz.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#3") & sz.between(20, 50) & q.between(20, 50))
    )
    return j.filter(cond).agg(
        (F.sum(_revenue_cents()) / F.lit(1e4)).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register(
    "q2_min_cost_supplier",
    # Q2 shape without a partsupp table: for each part, the supplier(s)
    # with the minimum account balance among suppliers that shipped it —
    # correlated-min subquery decorrelated into a grouped min + join.
    oracle="""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
            FROM lineitem
        ), min_bal AS (
            SELECT ps.partkey, MIN(s.s_acctbal) AS min_bal
            FROM ps JOIN supplier s ON ps.suppkey = s.s_suppkey
            GROUP BY ps.partkey
        )
        SELECT CAST(ps.partkey AS BIGINT) AS p_partkey,
               CAST(ps.suppkey AS BIGINT) AS s_suppkey,
               s.s_name,
               s.s_acctbal
        FROM ps
        JOIN supplier s ON ps.suppkey = s.s_suppkey
        JOIN min_bal m  ON ps.partkey = m.partkey AND s.s_acctbal = m.min_bal
    """,
    description="TPC-H Q2 shape (correlated MIN subquery, decorrelated): "
    "cheapest supplier per part among its actual shippers.",
    tags=["join", "subquery", "tpch"],
)
def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    with_bal = ps.join(F.broadcast(s), ps.suppkey == s.s_suppkey)
    min_bal = with_bal.groupBy("partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        with_bal.join(F.broadcast(min_bal), "partkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            F.col("partkey").cast("long").alias("p_partkey"),
            F.col("suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "s_acctbal",
        )
    )


@register(
    "q17_small_quantity_revenue",
    # Correlated scalar subquery shape (TPC-H Q17): lineitems under 20%
    # of their part's average quantity. The per-part avg is an exact
    # integer-cents sum / count -> bit-identical threshold comparison.
    oracle="""
        WITH part_avg AS (
            SELECT l_partkey,
                   SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / (100.0 * COUNT(*)) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
               SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 / 7.0 AS avg_yearly
        FROM lineitem l
        JOIN part_avg pa ON l.l_partkey = pa.l_partkey
        WHERE l.l_quantity < 0.2 * pa.avg_qty
    """,
    description="TPC-H Q17 shape (correlated scalar subquery -> join-agg "
    "rewrite): below-average-quantity order revenue. Catalyst plans the "
    "decorrelated join automatically.",
    tags=["join", "subquery", "tpch"],
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_cents = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    part_avg = li.groupBy("l_partkey").agg(
        (F.sum(qty_cents) / (F.lit(100.0) * F.count(F.lit(1)))).alias("avg_qty")
    )
    price_cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            (F.sum(price_cents) / F.lit(100.0) / F.lit(7.0)).alias("avg_yearly"),
        )
    )


@register(
    "q10_returned_revenue",
    oracle="""
        SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
               c.c_name,
               SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) / 1e4 AS revenue,
               n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    description="TPC-H Q10 shape: returned-item revenue per customer, "
    "4-way join, deterministic top-20.",
    tags=["join", "topk", "tpch"],
)
def q_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_revenue_cents()) / F.lit(1e4)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(F.col("c_custkey").cast("long"), "c_name", "revenue", "n_name")
    )


@register(
    "string_functions",
    oracle="""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS seg_lower,
               substring(c_name, 1, 9) AS name_prefix,
               CAST(length(c_name) AS BIGINT) AS name_len,
               concat(c_mktsegment, '#', c_name) AS tagged,
               replace(c_name, 'Customer', 'Cust') AS renamed,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits,
               CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos
        FROM customer
    """,
    description="String function battery (§2.8 extension): upper/lower/"
    "substring/length/concat/replace/regexp_extract/position.",
    tags=["functions", "string"],
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("long"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("#", "c_mktsegment", "c_name").alias("tagged"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("renamed"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
    )


@register(
    "date_arithmetic",
    oracle="""
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
               CAST(quarter(o_orderdate) AS BIGINT) AS q,
               CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT) AS days_to_y2k,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    """,
    description="Date arithmetic battery (§2.8 F4 extension): truncation, "
    "quarter extract, day diffs, interval add, last_day.",
    tags=["functions", "time"],
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").cast("long"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("order_month"),
        F.quarter(d).cast("long").alias("q"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).cast("long").alias(
            "days_to_y2k"
        ),
        F.date_format(d + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "cube_nation_priority",
    oracle="""
        SELECT COALESCE(n.n_name, 'ALL') AS n_name,
               COALESCE(o.o_orderpriority, 'ALL') AS o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY CUBE (n.n_name, o.o_orderpriority)
    """,
    description="CUBE grouping sets over a join (§2.4 extras): order "
    "volume by nation x priority with all subtotal combinations.",
    tags=["aggregate", "cube", "join"],
)
def q_cube_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    price_cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .cube("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (F.sum(price_cents) / F.lit(100.0)).alias("total"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "total",
        )
    )


@register(
    "union_all_monthly_activity",
    oracle="""
        SELECT kind, month, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT 'order' AS kind, strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month
            FROM orders
            UNION ALL
            SELECT 'ship' AS kind, strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month
            FROM lineitem
        )
        GROUP BY kind, month
    """,
    description="UNION ALL over heterogeneous sources (§2.5): order and "
    "shipment monthly activity in one aggregate.",
    tags=["setop", "aggregate"],
)
def q_union_all_monthly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("ship").alias("kind"),
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("month"),
    )
    return o.unionAll(li).groupBy("kind", "month").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


@register(
    "having_active_users",
    oracle="""
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id
        HAVING COUNT(*) > 5
    """,
    description="HAVING post-aggregation filter (§2.4 extras): users with "
    "more than five purchases.",
    tags=["aggregate", "having"],
)
def q_having_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .filter(F.col("n_purchases") > 5)
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / (100.0 * COUNT(*))
            FROM customer
        )
    """,
    description="Uncorrelated scalar subquery (§2.5 extras): customers "
    "above the global average balance; threshold computed bit-exactly.",
    tags=["subquery", "filter"],
)
def q_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    # one plan, no driver round-trip: the 1-row aggregate broadcasts
    # into a nested-loop join (Catalyst's scalar-subquery shape)
    avg_df = c.agg((F.sum(cents) / (F.lit(100.0) * F.count(F.lit(1)))).alias("_avg"))
    return (
        c.join(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .select(F.col("c_custkey").cast("long"), "c_acctbal")
    )


@register(
    "ntile_distribution_ranks",
    oracle="""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(NTILE(10) OVER w AS BIGINT) AS decile,
               floor(PERCENT_RANK() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
               floor(CUME_DIST() OVER w * 1e6 + 0.5) / 1e6 AS cume
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    description="Distribution-rank windows (§2.5 extras): ntile deciles, "
    "percent_rank, cume_dist per event type over the value ordering. "
    "Exact per-group ranking orders each group on one task by "
    "definition (matches the SQL oracle); the scale path decomposes "
    "row_number = grouped prefix COUNT + 1 over value buckets "
    "(operators/prefix.py:grouped_prefix_stats; equivalence proven in "
    "tests/test_prefix.py) when group cardinality is low.",
    tags=["window", "rank"],
)
def q_ntile_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        F.col("event_id").cast("long"),
        F.ntile(10).over(w).cast("long").alias("decile"),
        sround(F.percent_rank().over(w), 6).alias("pct_rank"),
        sround(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# TPC-H completion set (round 2). The testdata schema is a TPC-H subset
# (no partsupp; lineitem lacks commitdate/receiptdate/shipmode; customer
# lacks phone), so Q4/Q11/Q12/Q22 are adapted to equivalent *plan shapes*
# on the available columns, and Q16/Q20/Q21 (partsupp- or
# receiptdate-dependent with no faithful analog) are intentionally out of
# scope — documented in COVERAGE.md.
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) / 10000.0
                   AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    description="TPC-H Q6: pure scan-filter-aggregate revenue forecast. "
    "The plan to want at 100 TB: predicate pushdown to the parquet scan, "
    "2-column ReadSchema, map-side partial sum, no shuffle beyond the "
    "final 1-row combine.",
    tags=["tpch", "aggregate", "scan"],
)
def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(price * disc) / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q4_priority_exists",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    description="TPC-H Q4 shape (correlated EXISTS -> left-semi join): "
    "orders with at least one line shipped >60 days after order date, "
    "counted by priority. (Reference schema lacks commit/receipt dates, "
    "so the late-shipping predicate stands in for commitdate<receiptdate.) "
    "Catalyst decorrelates to a semi-join; at scale AQE picks "
    "broadcast vs shuffle side.",
    tags=["tpch", "semi-join", "subquery"],
)
def q_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@register(
    "q12_priority_linestatus",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
    description="TPC-H Q12 shape (conditional aggregation over a join): "
    "high/low-priority line counts by line status. (Schema lacks "
    "l_shipmode/l_receiptdate; l_linestatus carries the group.) Filter "
    "pushed to the lineitem scan; single agg shuffle after the join.",
    tags=["tpch", "join", "aggregate"],
)
def q_q12_priority_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    description="TPC-H Q13: customer order-count distribution via left "
    "outer join (null-preserving count) + double aggregation. (Priority "
    "filter stands in for the comment LIKE-exclusion; no comment column.) "
    "First agg shuffles on c_custkey, second on the tiny c_count domain.",
    tags=["tpch", "outer-join", "aggregate"],
)
def q_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                       AS total_rev_u
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev_u / 10000.0 AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_rev_u = (SELECT MAX(total_rev_u) FROM revenue)
    """,
    description="TPC-H Q15: top supplier by quarterly revenue — reusable "
    "revenue view + scalar-subquery max, revenue kept in exact integer "
    "1e-4-dollar units so the max-equality is never a float compare. "
    "Spark reuses one aggregated DataFrame for both the max and the "
    "filter (self-referencing view without recompute divergence).",
    tags=["tpch", "subquery", "aggregate"],
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue_cents()).alias("total_rev_u")
    )
    max_rev = revenue.agg(F.max("total_rev_u").alias("max_rev_u"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev_u") == F.col("max_rev_u"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev_u") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o.o_totalprice,
               SUM(l.l_quantity) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
        )
        GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    description="TPC-H Q18: large-volume customers — IN-subquery with "
    "HAVING (decorrelates to semi-join on an aggregated key set), then "
    "a 3-way join + regroup. Quantities are integer-valued doubles, so "
    "sums are exact. The aggregated key set is tiny (top orders) -> "
    "broadcast semi-join at any scale.",
    tags=["tpch", "semi-join", "having", "join"],
)
def q_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@register(
    "q11_important_parts",
    oracle="""
        WITH pv AS (
            SELECT l_partkey,
                   SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                       AS value_u
            FROM lineitem
            GROUP BY l_partkey
        )
        SELECT l_partkey, value_u / 10000.0 AS part_value
        FROM pv
        WHERE CAST(value_u AS HUGEINT)
              * (SELECT CAST(COUNT(*) AS BIGINT) * 10 FROM pv)
              > (SELECT CAST(SUM(value_u) AS HUGEINT) * 12 FROM pv)
    """,
    description="TPC-H Q11 shape (group-agg filtered against a global "
    "scalar aggregate of itself): parts whose revenue exceeds 1.2x the "
    "average part revenue. (No partsupp table; lineitem revenue per "
    "part stands in for stock value. Spec Q11 divides its fraction by "
    "SF; the 1.2x-average form is the scale-invariant equivalent — a "
    "fixed share threshold empties as the part count grows.) The "
    "predicate is integer-exact (value*n_parts*10 > 12*total) in "
    "128-bit arithmetic — Spark DECIMAL(38,0) / DuckDB HUGEINT — "
    "because value_u*n_parts would overflow int64 around corpus scale "
    "(value_u ~1e12 per part x billions of parts). One agg shuffle + "
    "broadcast 1-row scalar.",
    tags=["tpch", "subquery", "having", "aggregate"],
)
def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_revenue_cents()).alias("value_u"))
    total = pv.agg(
        F.sum("value_u").alias("total_u"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    return (
        pv.join(
            F.broadcast(total),
            F.col("value_u").cast("decimal(38,0)") * F.col("n_parts") * 10
            > F.col("total_u").cast("decimal(38,0)") * 12,
        )
        .select("l_partkey", (F.col("value_u") / F.lit(10000.0)).alias("part_value"))
    )


@register(
    "q22_dormant_customers",
    oracle="""
        WITH thr AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_nationkey AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               SUM(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0
                   AS totacctbal
        FROM customer c, thr
        WHERE c.c_acctbal > thr.avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
        GROUP BY c.c_nationkey
    """,
    description="TPC-H Q22 shape: well-funded customers with no recent "
    "orders (none since 2000-01-01; every custkey has *some* order in "
    "this dataset, so dormancy is time-windowed) — scalar-average "
    "threshold (exact decimal sum / count, bit-identical double) + "
    "NOT EXISTS anti-join + group count. (No c_phone column; nationkey "
    "carries the country group.) The anti-join side is a filtered "
    "orders key projection — the date predicate pushes to the scan.",
    tags=["tpch", "anti-join", "subquery", "aggregate"],
)
def q_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    bal_cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    return (
        c.join(F.broadcast(thr), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            (F.sum(bal_cents) / F.lit(100.0)).alias("totacctbal"),
        )
    )


@register(
    "grouping_sets_order_status",
    oracle="""
        SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                    AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
                   AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    description="Explicit GROUPING SETS with grouping_id (SURVEY §2.4 "
    "extras beyond rollup/cube): priority-only, status-only, and grand "
    "totals in one pass — Spark expands the sets in a single Expand+agg "
    "stage (one shuffle), not three scans. Exercises the spark.sql "
    "entry path over a registered view.",
    tags=["aggregate", "grouping-sets", "sql-api"],
)
def q_grouping_sets_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT)
                   AS gid,
               CAST(COUNT(1) AS BIGINT) AS n_orders,
               -- 100.0 alone would parse as DECIMAL(4,1) in Spark SQL and
               -- make `total` a DecimalType; force DOUBLE to match the
               -- oracle's float output exactly at the hash level.
               SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   / CAST(100.0 AS DOUBLE) AS total
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "q16_supplier_part_counts",
    # Q16 shape without a partsupp table: supplier-part pairs come from
    # the lineitem fact (who actually shipped what); the "customer
    # complaints" NOT IN exclusion becomes negative-balance suppliers
    # (the schema has no s_comment).
    oracle="""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
            FROM lineitem
        )
        SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
        FROM ps
        JOIN part p ON ps.partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#13'
          AND p.p_type NOT LIKE 'STANDARD%'
          AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45, 49)
          AND ps.suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    description="TPC-H Q16 shape (NOT IN anti-join + multi-key distinct "
    "count): supplier variety per (brand, type, size) excluding "
    "disqualified suppliers. The exclusion list is tiny -> broadcast "
    "anti-join; the part dim is broadcast; the only shuffle is the "
    "final distinct-count agg.",
    tags=["tpch", "anti-join", "aggregate"],
)
def q_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("STANDARD"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45, 49))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    return (
        ps.join(F.broadcast(bad_supp), ps.suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q20_promo_part_shippers",
    # Q20 shape without partsupp.availqty: a supplier qualifies if it
    # shipped more than 50 units of any one 'small *' part during 1996
    # (stands in for availqty > half the year's demand). Nested
    # IN-subqueries decorrelate to two joins + a HAVING filter + a
    # semi-join back to supplier.
    oracle="""
        SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, s.s_acctbal
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
            )
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 5000
        )
    """,
    description="TPC-H Q20 shape (nested IN subqueries -> join + "
    "grouped HAVING + semi-join): suppliers that shipped >50 units of "
    "any single 'small' part in 1996. Part-key filter is broadcast into "
    "the lineitem scan; one agg shuffle on (suppkey, partkey); the "
    "supplier probe is a broadcast semi-join.",
    tags=["tpch", "semi-join", "subquery", "aggregate"],
)
def q_q20_promo_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    small_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    qty_cents = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    heavy = (
        li.join(F.broadcast(small_parts), li.l_partkey == small_parts.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(qty_cents).alias("qty_cents"))
        .filter(F.col("qty_cents") > 5000)
        .select("l_suppkey")
        .distinct()
    )
    return s.join(
        F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select(
        F.col("s_suppkey").cast("long"), "s_name", "s_acctbal"
    )


@register(
    "q21_waiting_suppliers",
    # Q21 shape without receipt/commit dates: "late" = shipped more than
    # 90 days after the order date. A supplier waits on an order when it
    # is the ONLY late supplier in a multi-supplier order — the classic
    # EXISTS (other supplier) + NOT EXISTS (other late supplier) pair,
    # decorrelated into per-order supplier counts.
    oracle="""
        WITH late AS (
            SELECT DISTINCT l.l_orderkey, l.l_suppkey
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        ), all_pairs AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        ), late_cnt AS (
            SELECT l_orderkey, COUNT(*) AS n_late FROM late GROUP BY l_orderkey
        ), supp_cnt AS (
            SELECT l_orderkey, COUNT(*) AS n_supp FROM all_pairs GROUP BY l_orderkey
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late
        JOIN late_cnt lc ON late.l_orderkey = lc.l_orderkey AND lc.n_late = 1
        JOIN supp_cnt sc ON late.l_orderkey = sc.l_orderkey AND sc.n_supp >= 2
        JOIN supplier s  ON late.l_suppkey = s.s_suppkey
        GROUP BY s.s_name
    """,
    description="TPC-H Q21 shape (EXISTS + NOT EXISTS decorrelated): "
    "orders a supplier alone held up, counted per supplier. Both "
    "correlated subqueries become per-order counts joined back on "
    "orderkey — two agg shuffles + orderkey-aligned joins (co-"
    "partitioned, AQE-coalesced) instead of nested-loop EXISTS probes.",
    tags=["tpch", "semi-join", "anti-join", "aggregate"],
)
def q_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late_cnt = late.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_late"))
    supp_cnt = all_pairs.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_supp"))
    sole_late = (
        late.join(late_cnt.filter(F.col("n_late") == 1), "l_orderkey")
        .join(supp_cnt.filter(F.col("n_supp") >= 2), "l_orderkey")
    )
    return (
        sole_late.join(F.broadcast(s), sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@register(
    "map_functions_user_profile",
    # The §2.8 MAP-typed column family (map_from_entries, map_keys,
    # map_values, map_filter, transform_values, element_at) exercised
    # end-to-end. DuckDB's map type differs enough that the oracle
    # derives the same scalars straight from the grouped counts — the
    # compare surface is scalar, the Spark side genuinely runs the map
    # kernels.
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events
            GROUP BY 1, 2
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               array_to_string(list_sort(list(event_type)), ',') AS types,
               CAST(COUNT(*) FILTER (WHERE cnt >= 5) AS BIGINT)
                   AS n_frequent,
               CAST(SUM(cnt) AS BIGINT) AS n_events,
               CAST(MAX(CASE WHEN event_type = 'view' THEN cnt * 2 END)
                    AS BIGINT) AS view_x2
        FROM c
        GROUP BY user_id
    """,
    description="MAP-typed column functions (§2.8 extras): per-user "
    "event_type -> count maps built with map_from_entries over "
    "sorted entry structs (deterministic key order), then map_keys, "
    "map_filter (count >= 5), F.aggregate over map_values, and "
    "transform_values + element_at — the whole JVM-side map kernel "
    "family, no UDFs. Two key-partitioned aggregations, nothing else; "
    "the map stays one row per user however many types exist.",
    tags=["map", "aggregate", "functions"],
)
def q_map_functions_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    per_user = counts.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    m = F.col("type_counts")
    return per_user.select(
        "user_id",
        F.array_join(F.map_keys(m), ",").alias("types"),
        F.size(F.map_filter(m, lambda k, v: v >= 5)).cast("long").alias("n_frequent"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("n_events"),
        F.element_at(F.transform_values(m, lambda k, v: v * 2), "view")
        .cast("long")
        .alias("view_x2"),
    )

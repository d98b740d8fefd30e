"""Profile aggregation, rule/fusion/risk scoring spine, as-of joins, sessions, streaming replays.

Split from the monolithic queries.py (round 10) — pure move, zero
behavior change; registration side effects run at import via
``queries/__init__.py``. 14 registered queries.
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# Profile aggregations + joins (A1-A3, J1-J3)
# ---------------------------------------------------------------------------


@register(
    "customer_profile_90d",
    oracle=f"""
        SELECT CAST(user_id AS BIGINT) AS user_id,
               {money_avg_sql('value')} AS cust_avg_amount,
               {sround_sql('COUNT(*) / 90.0', 6)} AS cust_txn_count
        FROM events
        WHERE ts >= TIMESTAMP '{ANCHOR}' - INTERVAL 90 DAY
          AND ts <  TIMESTAMP '{ANCHOR}'
        GROUP BY user_id
    """,
    description="A1/S2: per-customer 90-day avg + per-day frequency "
    "(python_scoring/app.py:121-128) with a pinned anchor instead of NOW().",
    tags=["aggregate", "profile"],
)
def q_customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(lookback_filter("ts", ANCHOR, 90))
        .groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(
            money_avg("value").alias("cust_avg_amount"),
            sround(F.count(F.lit(1)) / F.lit(90.0), 6).alias("cust_txn_count"),
        )
    )


@register(
    "merchant_profile_90d",
    oracle=f"""
        SELECT event_type,
               {money_avg_sql('value')} AS merch_avg_amount
        FROM events
        WHERE ts >= TIMESTAMP '{ANCHOR}' - INTERVAL 90 DAY
          AND ts <  TIMESTAMP '{ANCHOR}'
        GROUP BY event_type
    """,
    description="A2/S3: per-merchant(-analog) avg over the lookback window "
    "(python_scoring/app.py:131-137).",
    tags=["aggregate", "profile"],
)
def q_merchant_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(lookback_filter("ts", ANCHOR, 90))
        .groupBy("event_type")
        .agg(money_avg("value").alias("merch_avg_amount"))
    )


@register(
    "profile_join_deviation",
    oracle=f"""
        WITH cust AS ({_CUST_PROFILE_CTE}),
        merch AS (
            SELECT event_type,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS merch_avg
            FROM events
            WHERE ts >= TIMESTAMP '{ANCHOR}' - INTERVAL 90 DAY
              AND ts <  TIMESTAMP '{ANCHOR}'
            GROUP BY event_type
        )
        SELECT CAST(e.event_id AS BIGINT) AS event_id,
               CAST(e.user_id AS BIGINT) AS user_id,
               e.event_type,
               e.value,
               {sround_sql('COALESCE(c.cust_avg, 0.0)', 4)} AS cust_avg_amount,
               {sround_sql('COALESCE(c.cust_freq, 0.0)', 6)} AS cust_txn_count,
               {sround_sql('COALESCE(m.merch_avg, 0.0)', 4)} AS merch_avg_amount,
               {sround_sql('''CASE WHEN COALESCE(c.cust_avg, 0.0) > 0
                          THEN (e.value - c.cust_avg) / (c.cust_avg + 1e-9)
                          ELSE 0.0 END''', 4)} AS deviation_score
        FROM events e
        LEFT JOIN cust c ON e.user_id = c.user_id
        LEFT JOIN merch m ON e.event_type = m.event_type
    """,
    description="J1+J2+F7 (flagship spine): facts left-joined to both "
    "broadcast profile dims, zero-defaulted, with the deviation ratio — the "
    "join-based replacement for the reference's N+1 point lookups "
    "(python_scoring/app.py:116-151).",
    tags=["join", "broadcast", "profile", "flagship"],
)
def q_profile_join_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = _exact_profile(ev, "user_id")
    merch = (
        ev.filter(lookback_filter("ts", ANCHOR, 90))
        .groupBy("event_type")
        .agg((F.sum(dec("value")).cast("double") / F.count(F.lit(1))).alias("merch_avg"))
    )
    joined = (
        ev.join(F.broadcast(cust), "user_id", "left")
        .join(F.broadcast(merch), "event_type", "left")
        .na.fill(0.0, subset=["cust_avg", "cust_freq", "merch_avg"])
    )
    return joined.select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        "event_type",
        "value",
        sround(F.col("cust_avg"), 4).alias("cust_avg_amount"),
        sround(F.col("cust_freq"), 6).alias("cust_txn_count"),
        sround(F.col("merch_avg"), 4).alias("merch_avg_amount"),
        sround(deviation_ratio("value", "cust_avg"), 4).alias("deviation_score"),
    )


@register(
    "window_transform_profile",
    # Integer-cents window sums: exact in both engines regardless of
    # accumulation order, so the derived avg is bit-identical.
    oracle=f"""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               {sround_sql('''SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                                  OVER (PARTITION BY user_id)
                              / (100.0 * COUNT(*) OVER (PARTITION BY user_id))''', 4)}
                   AS cust_avg_amount,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS cust_txn_count,
               {sround_sql('''SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                                  OVER (PARTITION BY event_type)
                              / (100.0 * COUNT(*) OVER (PARTITION BY event_type))''', 4)}
                   AS merch_avg_amount
        FROM events
    """,
    description="J3/A3: pandas groupby().transform('mean'/'count') "
    "(train.py:47-53) as unbounded partition windows — no self-join.",
    tags=["window", "profile"],
)
def q_window_transform_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same semantics as the oracle's unbounded partition windows, but as
    # groupBy-agg + broadcast join-back: the window form sort-shuffles
    # the FULL fact table once per partition key (2 shuffles of 100 TB);
    # this form shuffles only map-side partial aggregates (tiny) and
    # never moves the facts. Integer-cents sums keep group totals ==
    # window totals bit-exactly.
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    cust = ev.groupBy("user_id").agg(
        F.sum(cents).alias("_cs"), F.count(F.lit(1)).alias("_cn")
    )
    merch = ev.groupBy("event_type").agg(
        F.sum(cents).alias("_ms"), F.count(F.lit(1)).alias("_mn")
    )
    return (
        ev.join(F.broadcast(cust), "user_id")
        .join(F.broadcast(merch), "event_type")
        .select(
            F.col("event_id").cast("long"),
            sround(F.col("_cs") / (F.lit(100.0) * F.col("_cn")), 4).alias("cust_avg_amount"),
            F.col("_cn").cast("long").alias("cust_txn_count"),
            sround(F.col("_ms") / (F.lit(100.0) * F.col("_mn")), 4).alias("merch_avg_amount"),
        )
    )


@register(
    "asof_profile",
    oracle=f"""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               COALESCE({sround_sql('''SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                              / (100.0 * COUNT(*) OVER w)''', 4)}, 0.0) AS prior_avg_amount,
               CAST(COUNT(*) OVER w AS BIGINT) AS prior_txn_count
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
    description="As-of / point-in-time profile (SURVEY.md §2.3 note): each "
    "event enriched with the running stats of strictly-earlier events for "
    "its key — the leakage-free generalization of the NOW()-anchored lookup.",
    tags=["window", "asof", "profile"],
)
def q_asof_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    prior_avg = F.sum(cents).over(w) / (F.lit(100.0) * F.count(F.lit(1)).over(w))
    return ev.select(
        F.col("event_id").cast("long"),
        F.coalesce(sround(prior_avg, 4), F.lit(0.0)).alias("prior_avg_amount"),
        F.count(F.lit(1)).over(w).cast("long").alias("prior_txn_count"),
    )


# ---------------------------------------------------------------------------
# Rules / fusion / risk (F7-F14, A6, W6)
# ---------------------------------------------------------------------------


@register(
    "rules_fusion_risk",
    oracle=f"""
        WITH cust AS ({_CUST_PROFILE_CTE}),
        enriched AS (
            SELECT e.event_id, e.value, hour(e.ts) AS hr,
                   {_CHANNEL_CASE} AS channel,
                   ['Harare','Bulawayo','Mutare','Victoria Falls','Marondera','Gweru']
                       [(CAST(json_extract_string(e.props, '$.k') AS BIGINT) % 6) + 1] AS location,
                   CASE WHEN COALESCE(c.cust_avg, 0.0) > 0
                        THEN (e.value - c.cust_avg) / (c.cust_avg + 1e-9)
                        ELSE 0.0 END AS dev
            FROM events e LEFT JOIN cust c ON e.user_id = c.user_id
        ), scored AS (
            SELECT event_id, value, dev,
                   LEAST(
                       (CASE WHEN value > {EV_LARGE_AMOUNT} THEN 0.6 ELSE 0.0 END)
                     + (CASE WHEN lower(channel) = 'card'
                              AND lower(location) NOT IN ('harare','bulawayo')
                         THEN 0.3 ELSE 0.0 END)
                     + (CASE WHEN hr < 5 THEN 0.2 ELSE 0.0 END), 1.0) AS rule_score_raw,
                   concat_ws(',',
                       CASE WHEN value > {EV_LARGE_AMOUNT} THEN 'large_amount' END,
                       CASE WHEN lower(channel) = 'card'
                             AND lower(location) NOT IN ('harare','bulawayo')
                        THEN 'card_unusual_location' END,
                       CASE WHEN hr < 5 THEN 'odd_hour' END) AS flags
            FROM enriched
        ), fused AS (
            SELECT *,
                   0.45 * rule_score_raw + 0.4 * 0.0
                     + 0.15 * LEAST(GREATEST(ABS(dev), 0.0), 1.0) AS agg0
            FROM scored
        ), floored AS (
            SELECT *,
                   CASE WHEN rule_score_raw >= 0.6 AND agg0 < 0.4 THEN 0.5 ELSE agg0 END AS agg1
            FROM fused
        ), finalagg AS (
            SELECT *,
                   CASE WHEN value >= {EV_HIGH_RISK_AMOUNT}
                        THEN GREATEST(agg1, 0.85) ELSE agg1 END AS agg2
            FROM floored
        )
        SELECT CAST(event_id AS BIGINT) AS event_id,
               {sround_sql('rule_score_raw', 4)} AS rule_score,
               flags,
               {sround_sql('dev', 4)} AS deviation_score,
               {sround_sql('agg2', 4)} AS aggregated_score,
               CASE WHEN agg2 >= 0.7 THEN 'High'
                    WHEN agg2 >= 0.4 THEN 'Medium'
                    ELSE 'Low' END AS risk_level
        FROM finalagg
    """,
    description="F7-F13 + A6 + W6 end-to-end rule/fusion/risk tail as pure "
    "Catalyst expressions (reference app.py:156-203, api/app.py:167-194); "
    "model score takes the reference's 0.0 fallback placeholder "
    "(api/utils.py:30-37). Thresholds rescaled to the events distribution.",
    tags=["scoring", "rules", "fusion", "flagship"],
)
def q_rules_fusion_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = _exact_profile(ev, "user_id")
    loc_array = F.array(*[F.lit(x) for x in _LOCATIONS])
    enriched = (
        ev.join(F.broadcast(cust), "user_id", "left")
        .withColumn("hr", F.hour("ts"))
        .withColumn("channel", F.expr(_CHANNEL_CASE))
        .withColumn(
            "location",
            F.element_at(
                loc_array,
                (F.get_json_object("props", "$.k").cast("long") % 6 + 1).cast("int"),
            ),
        )
        .withColumn("dev", deviation_ratio("value", F.coalesce("cust_avg", F.lit(0.0))))
    )
    scored = enriched.withColumn(
        "rule_score_raw",
        rule_score("value", "channel", "location", "hr", large_amount_t=EV_LARGE_AMOUNT),
    ).withColumn(
        "flags",
        F.array_join(
            rule_flags("value", "channel", "location", "hr", large_amount_t=EV_LARGE_AMOUNT), ","
        ),
    )
    fused = scored.withColumn(
        "agg1", fuse_scores_orchestrator("rule_score_raw", F.lit(0.0), "dev")
    ).withColumn("agg2", high_amount_override("agg1", "value", threshold=EV_HIGH_RISK_AMOUNT))
    return fused.select(
        F.col("event_id").cast("long"),
        sround(F.col("rule_score_raw"), 4).alias("rule_score"),
        "flags",
        sround(F.col("dev"), 4).alias("deviation_score"),
        sround(F.col("agg2"), 4).alias("aggregated_score"),
        risk_level("agg2").alias("risk_level"),
    )


@register(
    "asof_join_purchase_click",
    # DuckDB has a native ASOF JOIN; microsecond timestamps make ties
    # impossible, so both engines' pick is deterministic.
    oracle="""
        SELECT CAST(p.event_id AS BIGINT) AS event_id,
               CAST(p.user_id AS BIGINT) AS user_id,
               CAST(c.event_id AS BIGINT) AS click_event_id,
               c.value AS click_value,
               CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    description="As-of (point-in-time) join between two tables — the "
    "financial-data staple Spark lacks natively: each purchase picks the "
    "user's most recent click at-or-before it. Executed as union + "
    "running last_value over one (key, ts) sort — ONE shuffle, no join "
    "node at all; the oracle uses DuckDB's native ASOF JOIN.",
    tags=["join", "asof", "time"],
)
def q_asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_event_id", "click_value", "click_ts"],
        right_tiebreak="click_event_id",
    )
    return joined.select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        F.col("click_event_id").cast("long"),
        "click_value",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).cast("long").alias("gap_us"),
    )


@register(
    "asof_forward_click_purchase",
    # The look-ahead twin of asof_join_purchase_click with a match
    # tolerance: each click picks the user's NEXT purchase within one
    # hour (conversion attribution). DuckDB's native ASOF JOIN is
    # backward-only, so the oracle states the semantics directly:
    # range left-join + QUALIFY row_number()=1 on (ts, event_id) —
    # quadratic in DuckDB, which is fine for an oracle; the engine
    # form stays one union + descending running carry, no join node.
    oracle="""
        SELECT CAST(c.event_id AS BIGINT) AS event_id,
               CAST(c.user_id AS BIGINT) AS user_id,
               CAST(p.event_id AS BIGINT) AS next_purchase_id,
               p.value AS purchase_value,
               CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND p.ts >= c.ts
         AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        QUALIFY row_number() OVER (
            PARTITION BY c.event_id
            ORDER BY p.ts ASC NULLS LAST, p.event_id ASC NULLS LAST
        ) = 1
    """,
    description="Forward as-of join with tolerance (operators/"
    "rangejoin.asof_join_forward): next purchase within 1 h of each "
    "click, executed as union + descending running carry over ONE "
    "(key, ts) sort-shuffle — no join node, no per-key explosion; "
    "matches beyond the tolerance null out. The conversion-"
    "attribution staple.",
    tags=["join", "asof", "time"],
)
def q_asof_forward_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("next_purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join_forward(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
        right_cols=["next_purchase_id", "purchase_value", "purchase_ts"],
        right_tiebreak="next_purchase_id",
        tolerance_us=3_600_000_000,
    )
    return joined.select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        F.col("next_purchase_id").cast("long"),
        "purchase_value",
        (F.unix_micros("purchase_ts") - F.unix_micros("ts"))
        .cast("long")
        .alias("gap_us"),
    )


@register(
    "sessionize_events",
    # Gap-based sessionization as pure window math: session starts where
    # the gap to the previous event exceeds 30 min; session id = running
    # count of starts. Classic lag+cumsum, identical in both engines.
    # Gap/duration math in exact epoch MICROseconds on both sides:
    # date_diff('second', ...) counts boundary crossings, not elapsed
    # time, and diverges from integer-microsecond arithmetic on
    # sub-second offsets.
    oracle="""
        WITH marked AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS is_start
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, event_id, ts,
                   SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
        FROM sessions
        GROUP BY user_id, session_id
    """,
    description="Gap-based sessionization (30-min inactivity): lag -> "
    "session-start marker -> running-sum session ids -> per-session "
    "stats. One shuffle on user_id; the batch twin of session_window.",
    tags=["window", "session", "aggregate"],
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_start = F.when(
        F.lag("ts").over(w).isNull() | (gap_sec > 1800 * 1_000_000), 1
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_id",
        F.sum(is_start).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_id").cast("long").alias("session_id"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .cast("long")
        .alias("duration_us"),
    )


@register(
    "time_range_window_profile",
    # RANGE frame over event-time: each event's trailing-1-hour same-user
    # stats — the per-event generalization of the 90-day as-of profile
    # (W3 evaluated at every row). Cents-exact average.
    oracle="""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(COUNT(*) OVER w - 1 AS BIGINT) AS prior_events_1h,
               floor(COALESCE(
                   (SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                        - CAST(floor(value * 100 + 0.5) AS BIGINT))
                   / (100.0 * NULLIF(COUNT(*) OVER w - 1, 0)), 0.0) * 1e4 + 0.5) / 1e4
                   AS avg_value_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    description="Event-time RANGE window frame: trailing 1-hour same-user "
    "count/avg per event (excluding self) — the continuous form of the "
    "lookback profile (SURVEY.md W3), one shuffle + in-partition sort.",
    tags=["window", "time", "asof"],
)
def q_time_range_window_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    prior_n = F.count(F.lit(1)).over(w) - 1
    prior_sum = F.sum(cents).over(w) - cents
    avg_1h = F.coalesce(
        prior_sum / (F.lit(100.0) * F.nullif(prior_n.cast("double"), F.lit(0.0))),
        F.lit(0.0),
    )
    return ev.select(
        F.col("event_id").cast("long"),
        prior_n.cast("long").alias("prior_events_1h"),
        sround(avg_1h, 4).alias("avg_value_1h"),
    )


@register(
    "gini_user_diversity",
    # Per-user behavioral diversity as Gini impurity over the user's
    # channel mix — the rational (log-free) cousin of Shannon entropy,
    # a standard fraud feature (account takeover shifts the mix).
    # gini = 1 - sum_i (c_i/n)^2 = 1 - S/n^2 with S = sum c_i^2 exact
    # int64; the single double expression over exact ints is
    # bit-identical, then quantized to 1e-6 units.
    oracle="""
        WITH tc AS (
            SELECT user_id, event_type, COUNT(*) AS c
            FROM events GROUP BY user_id, event_type
        ), u AS (
            SELECT user_id,
                   SUM(c) AS n,
                   COUNT(*) AS n_types,
                   SUM(c * c) AS s
            FROM tc GROUP BY user_id
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(n AS BIGINT) AS n_events,
               CAST(n_types AS BIGINT) AS n_types,
               CAST(floor(
                   (1.0 - CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   * 1000000.0 + 0.5) AS BIGINT) AS gini_u
        FROM u
    """,
    description="Gini-impurity channel diversity per user: two chained "
    "partial-agg shuffles ((user,type) then user), integer sum of "
    "squares, one fixed-shape double expression quantized to micro-"
    "units. High-cardinality group keys — fully parallel at 100 TB; "
    "c_i^2 stays in int64 to ~3e9 events per (user,channel).",
    tags=["anomaly", "aggregate", "profile"],
)
def q_gini_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tc = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    u = tc.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * F.col("c")).alias("s"),
    )
    gini = (
        F.lit(1.0) - F.col("s").cast("double") / (F.col("n").cast("double") * F.col("n").cast("double"))
    ) * F.lit(1000000.0) + F.lit(0.5)
    return u.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("n").cast("long").alias("n_events"),
        F.col("n_types").cast("long").alias("n_types"),
        F.floor(gini).cast("long").alias("gini_u"),
    )


@register(
    "stream_replay_scoring",
    # Driver-visible evidence for the STREAMING serving path (W1/W6/W7):
    # foreachBatch executes the same DataFrame plan per micro-batch, so
    # replaying build_scoring_stream + split_valid_invalid over one
    # deterministic static frame checks the exact column logic the
    # stream runs (stream==batch parity for the plan itself is pinned
    # separately by tests/test_streaming.py). Events are projected into
    # the JSON-source transaction shape with three planted invalid
    # classes (negative amount / non-numeric id / unparseable
    # timestamp); profiles are exact decimal-sum averages with a
    # min-2-txn cut so the profile-miss -> fill(0) -> dev=0 fallback
    # path (P6/W6) is exercised, not just joined. Model score is the
    # reference's 0.0 placeholder (api/utils.py:30-37) => constant
    # 'unavailable' version tag, as in the reference's degraded mode.
    oracle=f"""
        WITH tx AS (
            SELECT CASE WHEN event_id % 97 = 0
                        THEN 'x' || CAST(event_id AS VARCHAR)
                        ELSE CAST(event_id AS VARCHAR) END AS transaction_id,
                   CAST(user_id AS VARCHAR) AS customer_id,
                   CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 50
                        AS VARCHAR) AS merchant_id,
                   CASE WHEN event_id % 89 = 0 THEN -1.0
                        ELSE floor(value * 100 + 0.5) * 37.0 / 100.0
                   END AS amount,
                   {_CHANNEL_CASE} AS channel,
                   ['Harare','Bulawayo','Mutare','Victoria Falls','Marondera','Gweru']
                       [(CAST(json_extract_string(props, '$.k') AS BIGINT) % 6) + 1] AS location,
                   CASE WHEN event_id % 83 = 0 THEN 'not-a-timestamp'
                        ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END AS ts_str
            FROM events
        ), v AS (
            SELECT *,
                   (amount IS NOT NULL AND amount >= 0
                    AND regexp_matches(transaction_id, '^[0-9]+$')
                    AND TRY_CAST(ts_str AS TIMESTAMP) IS NOT NULL) AS ok
            FROM tx
        ), valid AS (
            SELECT * FROM v WHERE ok
        ), invalid AS (
            SELECT *,
                   CASE WHEN amount IS NULL OR amount < 0 THEN 'invalid_amount'
                        WHEN NOT regexp_matches(transaction_id, '^[0-9]+$')
                        THEN 'invalid_id'
                        ELSE 'invalid_timestamp' END AS error
            FROM v WHERE NOT ok
        ), cust AS (
            SELECT customer_id,
                   CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) AS cust_avg
            FROM valid GROUP BY customer_id HAVING COUNT(*) >= 2
        ), enr AS (
            SELECT valid.*,
                   hour(TRY_CAST(valid.ts_str AS TIMESTAMP)) AS hr,
                   COALESCE(c.cust_avg, 0.0) AS cust_avg
            FROM valid LEFT JOIN cust c USING (customer_id)
        ), scored AS (
            SELECT transaction_id, customer_id, merchant_id, amount,
                   CASE WHEN cust_avg > 0
                        THEN (amount - cust_avg) / (cust_avg + 1e-9)
                        ELSE 0.0 END AS dev,
                   LEAST(
                       (CASE WHEN amount > 1000.0 THEN 0.6 ELSE 0.0 END)
                     + (CASE WHEN lower(channel) = 'card'
                              AND lower(location) NOT IN ('harare','bulawayo')
                         THEN 0.3 ELSE 0.0 END)
                     + (CASE WHEN hr < 5 THEN 0.2 ELSE 0.0 END), 1.0) AS rs,
                   concat_ws(',',
                       CASE WHEN amount > 1000.0 THEN 'large_amount' END,
                       CASE WHEN lower(channel) = 'card'
                             AND lower(location) NOT IN ('harare','bulawayo')
                        THEN 'card_unusual_location' END,
                       CASE WHEN hr < 5 THEN 'odd_hour' END) AS flags
            FROM enr
        ), fused AS (
            SELECT *,
                   0.45 * rs + 0.4 * 0.0
                     + 0.15 * LEAST(GREATEST(ABS(dev), 0.0), 1.0) AS agg0
            FROM scored
        ), floored AS (
            SELECT *, CASE WHEN rs >= 0.6 AND agg0 < 0.4
                           THEN 0.5 ELSE agg0 END AS agg1
            FROM fused
        ), fin AS (
            SELECT *, CASE WHEN amount >= 10000.0
                           THEN GREATEST(agg1, 0.85) ELSE agg1 END AS agg2
            FROM floored
        )
        SELECT transaction_id, customer_id, merchant_id,
               {sround_sql('amount', 4)} AS amount_r,
               {sround_sql('dev', 4)} AS deviation_score,
               {sround_sql('rs', 4)} AS rule_score,
               flags,
               {sround_sql('agg2', 4)} AS aggregated_score,
               CASE WHEN agg2 >= 0.7 THEN 'High'
                    WHEN agg2 >= 0.4 THEN 'Medium'
                    ELSE 'Low' END AS risk_level,
               'unavailable' AS model_version,
               CAST(NULL AS VARCHAR) AS error
        FROM fin
        UNION ALL
        SELECT transaction_id, customer_id, merchant_id,
               {sround_sql('amount', 4)} AS amount_r,
               CAST(NULL AS DOUBLE) AS deviation_score,
               CAST(NULL AS DOUBLE) AS rule_score,
               CAST(NULL AS VARCHAR) AS flags,
               CAST(NULL AS DOUBLE) AS aggregated_score,
               CAST(NULL AS VARCHAR) AS risk_level,
               CAST(NULL AS VARCHAR) AS model_version,
               error
        FROM invalid
    """,
    description="Streaming scoring path replayed as a batch oracle row: "
    "the SAME split_valid_invalid + build_scoring_stream code the "
    "foreachBatch sink executes per micro-batch, driven by one static "
    "frame — validity split (W7), stream-static broadcast profile "
    "joins with fill-0 fallback (J1/P6), rule/fusion/risk tail "
    "(F7-F13), placeholder model score (W6). At 100 TB this IS the "
    "per-batch plan; state lives in the profile tables, not the plan.",
    tags=["streaming", "scoring", "rules"],
)
def q_stream_replay_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.score_stream import build_scoring_stream, split_valid_invalid

    ev = load_table(spark, sf_dir, "events")
    loc_array = F.array(*[F.lit(x) for x in _LOCATIONS])
    k = F.get_json_object("props", "$.k").cast("long")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5))
    tx = ev.select(
        F.when(
            F.col("event_id") % 97 == 0,
            F.concat(F.lit("x"), F.col("event_id").cast("string")),
        )
        .otherwise(F.col("event_id").cast("string"))
        .alias("transaction_id"),
        F.col("user_id").cast("string").alias("customer_id"),
        (k % 50).cast("string").alias("merchant_id"),
        F.when(F.col("event_id") % 89 == 0, F.lit(-1.0))
        .otherwise(cents * F.lit(37.0) / F.lit(100.0))
        .alias("amount"),
        F.expr(_CHANNEL_CASE).alias("channel"),
        F.element_at(loc_array, (k % 6 + 1).cast("int")).alias("location"),
        F.when(F.col("event_id") % 83 == 0, F.lit("not-a-timestamp"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"))
        .alias("timestamp"),
    )
    valid, invalid = split_valid_invalid(tx)
    cust = (
        valid.groupBy("customer_id")
        .agg(
            (F.sum(dec("amount")).cast("double") / F.count(F.lit(1))).alias(
                "cust_avg_amount"
            ),
            F.count(F.lit(1)).cast("double").alias("cust_txn_count"),
        )
        .filter(F.col("cust_txn_count") >= 2)
    )
    merch = valid.groupBy("merchant_id").agg(
        (F.sum(dec("amount")).cast("double") / F.count(F.lit(1))).alias(
            "merch_avg_amount"
        )
    )
    scored = build_scoring_stream(valid, cust, merch)
    out_ok = scored.select(
        "transaction_id",
        "customer_id",
        "merchant_id",
        sround(F.col("amount"), 4).alias("amount_r"),
        sround(F.col("deviation_score"), 4).alias("deviation_score"),
        sround(F.col("rule_score"), 4).alias("rule_score"),
        "flags",
        sround(F.col("aggregated_score"), 4).alias("aggregated_score"),
        "risk_level",
        "model_version",
        F.lit(None).cast("string").alias("error"),
    )
    out_bad = invalid.select(
        "transaction_id",
        "customer_id",
        "merchant_id",
        sround(F.col("amount"), 4).alias("amount_r"),
        F.lit(None).cast("double").alias("deviation_score"),
        F.lit(None).cast("double").alias("rule_score"),
        F.lit(None).cast("string").alias("flags"),
        F.lit(None).cast("double").alias("aggregated_score"),
        F.lit(None).cast("string").alias("risk_level"),
        F.lit(None).cast("string").alias("model_version"),
        "error",
    )
    return out_ok.unionByName(out_bad)


@register(
    "profile_incremental_merge",
    # Incremental view maintenance for the customer profile — the
    # pattern that makes 90-day profiles affordable at 100 TB: persist
    # DAY-partitioned partial aggregates (sum, count in exact integer
    # cents) and answer any window by MERGING partials, never
    # rescanning history. The merged profile is verified EQUAL to the
    # direct full recompute per customer (sum/count addition is
    # associative — checked, not assumed, in the output), and the
    # derived average is the repo's exact decimal-sum / count
    # discipline on both paths.
    oracle="""
        WITH daily AS (
            SELECT user_id,
                   CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                        AS BIGINT) AS day,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ), merged AS (
            SELECT user_id, CAST(SUM(s) AS BIGINT) AS sum_cents,
                   CAST(SUM(c) AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_days
            FROM daily GROUP BY user_id
        ), direct AS (
            SELECT user_id,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        )
        SELECT m.user_id AS user_id,
               m.sum_cents, m.n_events, m.n_days,
               floor(CAST(m.sum_cents AS DOUBLE) / 100.0
                     / m.n_events * 1e4 + 0.5) / 1e4 AS avg_value,
               CAST(CASE WHEN m.sum_cents = d.sum_cents
                          AND m.n_events = d.n_events
                         THEN 1 ELSE 0 END AS BIGINT) AS merged_eq_direct
        FROM merged m JOIN direct d ON m.user_id = d.user_id
    """,
    description="Incremental profile maintenance: day-partitioned "
    "(sum, count) partials in exact integer cents merge into the full "
    "customer profile, verified equal per customer to the direct "
    "recompute — the persist-daily-partials pattern that answers any "
    "window without rescanning history.",
    tags=["profiles", "incremental", "aggregate"],
)
def q_profile_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = ev.groupBy(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(cents).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    merged = daily.groupBy("user_id").agg(
        F.sum("s").cast("long").alias("sum_cents"),
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    direct = ev.groupBy("user_id").agg(
        F.sum(cents).cast("long").alias("d_sum"),
        F.count(F.lit(1)).cast("long").alias("d_n"),
    )
    return merged.join(direct, "user_id").select(
        F.col("user_id").cast("long"),
        "sum_cents",
        "n_events",
        "n_days",
        sround(
            F.col("sum_cents").cast("double")
            / F.lit(100.0)
            / F.col("n_events").cast("double"),
            4,
        ).alias("avg_value"),
        (
            (F.col("sum_cents") == F.col("d_sum"))
            & (F.col("n_events") == F.col("d_n"))
        )
        .cast("long")
        .alias("merged_eq_direct"),
    )


@register(
    "scd2_point_in_time_join",
    # The query a user runs right after building an SCD2 dimension:
    # point-in-time fact enrichment — each purchase joined to the
    # tier version VALID AT its timestamp. The oracle states it as
    # the textbook interval join (user equi + valid_from <= ts < 
    # valid_to); the Spark plan instead runs the SCALABLE form: union
    # the version-boundary rows with the fact rows into one per-user
    # timeline and take last_value(tier, ignorenulls) — an as-of
    # lookup with ZERO joins, one user-keyed window, immune to the
    # per-fact version fan-out an interval join pays on hot users. A
    # version opened BY a purchase's own event sorts before the fact
    # row at the same (us, event_id) (kind 0 < 1), matching the
    # oracle's inclusive valid_from.
    oracle="""
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS us, event_id,
                   CASE WHEN value < 50 THEN 1
                        WHEN value < 150 THEN 2
                        ELSE 3 END AS tier
            FROM events
        ), marked AS (
            SELECT user_id, us, event_id, tier,
                   lag(tier) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) AS prev_tier
            FROM e
        ), versions AS (
            SELECT user_id, tier, us AS valid_from_us, event_id
            FROM marked
            WHERE prev_tier IS NULL OR tier <> prev_tier
        ), closed AS (
            SELECT user_id, tier, valid_from_us, event_id,
                   lead(valid_from_us) OVER (PARTITION BY user_id
                       ORDER BY valid_from_us, event_id) AS valid_to_us
            FROM versions
        ), p AS (
            SELECT user_id, epoch_us(ts) AS us,
                   epoch_us(ts) // 86400000000 AS day,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ), j AS (
            SELECT p.day, v.tier, p.cents
            FROM p JOIN closed v
              ON p.user_id = v.user_id
             AND v.valid_from_us <= p.us
             AND (v.valid_to_us IS NULL OR p.us < v.valid_to_us)
        )
        SELECT CAST(day AS BIGINT) AS day,
               CAST(tier AS BIGINT) AS tier,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM j GROUP BY 1, 2
    """,
    description="Point-in-time SCD2 lookup: purchases enriched with "
    "the tier version valid at their timestamp, aggregated by (day, "
    "tier). Oracle = the interval join; Spark plan = the join-FREE "
    "as-of form (version boundaries and facts unioned into one "
    "per-user timeline, last_value ignorenulls window) — one "
    "user-keyed sort shuffle total, no per-fact version fan-out. "
    "Same-instant boundary semantics pinned by the kind sort key.",
    tags=["cdc", "window", "asof", "warehouse"],
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tier = (
        F.when(F.col("value") < 50, 1).when(F.col("value") < 150, 2).otherwise(3)
    )
    e = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        tier.alias("tier"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    versions = (
        e.withColumn("prev_tier", F.lag("tier").over(w))
        .filter(F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier")))
        .select(
            "user_id",
            "us",
            "event_id",
            F.lit(0).alias("kind"),
            "tier",
            F.lit(None).cast("long").alias("cents"),
            F.lit(None).cast("long").alias("day"),
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("int").alias("tier"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    )
    wt = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    timeline = versions.unionByName(facts).withColumn(
        "cur_tier", F.last("tier", ignorenulls=True).over(wt)
    )
    return (
        timeline.filter(F.col("kind") == 1)
        .groupBy("day", "cur_tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            F.col("day").cast("long").alias("day"),
            F.col("cur_tier").cast("long").alias("tier"),
            "n_purchases",
            "sum_cents",
        )
    )

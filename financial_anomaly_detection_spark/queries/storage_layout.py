"""Storage/layout: partition planning, Z-order, CDC/SCD2, skew handling, warehouse ops.

Split from the monolithic queries.py (round 10) — pure move, zero
behavior change; registration side effects run at import via
``queries/__init__.py``. 10 registered queries.
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403


@register(
    "pivot_event_type_daily",
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
               CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error
        FROM events
        GROUP BY day
    """,
    description="Native pivot (explicit value list, so no extra pass to "
    "discover categories): daily event-type count matrix.",
    tags=["aggregate", "pivot"],
)
def q_pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kinds = ["purchase", "click", "view", "signup", "error"]
    out = (
        ev.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, subset=kinds)
    )
    return out.select("day", *[F.col(k).cast("long").alias(k) for k in kinds])


@register(
    "priority_case_pivot",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
               CAST(COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS n_high,
               CAST(COUNT(*) FILTER (o_orderpriority IN ('3-MEDIUM','4-NOT SPECIFIED')) AS BIGINT) AS n_mid,
               CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS n_low,
               SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   FILTER (o_orderpriority = '1-URGENT') / 100.0 AS urgent_total
        FROM orders
        GROUP BY o_orderstatus
    """,
    description="Conditional aggregation / manual pivot (§2.5 extras): "
    "per-status priority counts as CASE/FILTER aggregates — the "
    "shuffle-free pivot form.",
    tags=["aggregate", "pivot"],
)
def q_priority_case_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price_cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")

    def cnt(cond) -> Column:
        return F.count(F.when(cond, 1)).cast("long")

    p = F.col("o_orderpriority")
    return o.groupBy("o_orderstatus").agg(
        cnt(p == "1-URGENT").alias("n_urgent"),
        cnt(p == "2-HIGH").alias("n_high"),
        cnt(p.isin("3-MEDIUM", "4-NOT SPECIFIED")).alias("n_mid"),
        cnt(p == "5-LOW").alias("n_low"),
        (F.sum(F.when(p == "1-URGENT", price_cents)) / F.lit(100.0)).alias("urgent_total"),
    )


@register(
    "scd2_user_tiers",
    # Slowly-changing-dimension (type 2) build — the warehouse pattern
    # for tracking attribute history: each user's amount tier
    # (1: <50, 2: <150, 3: >=150) becomes a VERSIONED dimension row
    # with [valid_from, valid_to) in integer event-time micros. A
    # version opens whenever the tier differs from the user's previous
    # event (lag) and closes at the next version's start (lead), the
    # current version staying open (NULL). Every window partitions by
    # user_id — high cardinality, fully parallel at 100 TB — and all
    # values are integers/strings, so the history is hash-exact.
    oracle="""
        WITH e AS (
            SELECT user_id,
                   epoch_us(ts) AS us,
                   event_id,
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
            SELECT user_id, tier, us AS valid_from_us
            FROM marked
            WHERE prev_tier IS NULL OR tier <> prev_tier
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(tier AS BIGINT) AS tier,
               CAST(valid_from_us AS BIGINT) AS valid_from_us,
               CAST(lead(valid_from_us) OVER (PARTITION BY user_id
                    ORDER BY valid_from_us) AS BIGINT) AS valid_to_us
        FROM versions
    """,
    description="SCD type-2 dimension build from the event stream: "
    "per-user lag() change detection -> version rows -> lead() "
    "closes each interval, current version open (NULL). One "
    "(user_id)-keyed sort shuffle reused by both windows; integer "
    "event-time micros end to end.",
    tags=["warehouse", "window", "history"],
)
def q_scd2_user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    marked = e.withColumn("prev_tier", F.lag("tier").over(w))
    versions = marked.filter(
        F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier"))
    ).select("user_id", "tier", F.col("us").alias("valid_from_us"))
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us")
    return versions.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("tier").cast("long").alias("tier"),
        F.col("valid_from_us").cast("long").alias("valid_from_us"),
        F.lead("valid_from_us").over(w2).cast("long").alias("valid_to_us"),
    )


@register(
    "zorder_layout_parts",
    # Z-order (Morton) data layout for multi-dimensional pruning
    # (Morton 1966; the Delta/Iceberg OPTIMIZE ZORDER story): parts
    # are assigned a 12-bit Morton code interleaving p_size (6 bits)
    # and an integer price bucket (6 bits), then grouped into
    # value-range "files" of 64 consecutive codes. The per-file
    # min/max envelopes in BOTH dimensions stay narrow — exactly the
    # property that lets a scan skip files on either predicate. All
    # integer math; the query OUTPUT is the layout quality report
    # (per-file count + envelopes) a table optimizer would log.
    oracle=f"""
        WITH p AS (
            SELECT p_partkey,
                   LEAST(GREATEST(CAST(p_size AS BIGINT), 0), 63) AS sz,
                   LEAST(GREATEST(
                       (CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) - 90000)
                           * 64 // 10000, 0), 63) AS pb
            FROM part
        ), z AS (
            SELECT p_partkey, sz, pb, {_ZCODE_SQL} AS zcode FROM p
        )
        SELECT zcode // 64 AS zfile,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(MIN(sz) AS BIGINT) AS sz_min,
               CAST(MAX(sz) AS BIGINT) AS sz_max,
               CAST(MIN(pb) AS BIGINT) AS pb_min,
               CAST(MAX(pb) AS BIGINT) AS pb_max,
               CAST(MIN(zcode) AS BIGINT) AS z_min,
               CAST(MAX(zcode) AS BIGINT) AS z_max
        FROM z
        GROUP BY zcode // 64
    """,
    description="Z-order/Morton layout report: interleave p_size and "
    "price bucket into a 12-bit code (pure shift/mask Catalyst "
    "expressions), chunk the code space into files, report per-file "
    "row counts and min/max envelopes per dimension — the file-skipping "
    "evidence a lakehouse OPTIMIZE ZORDER produces. One partial-agg "
    "shuffle keyed on the file id; at 100 TB the same expression feeds "
    "repartitionByRange(zcode) + sortWithinPartitions before the "
    "parquet write, giving min/max-indexed multi-dim pruning.",
    tags=["layout", "aggregate", "lakehouse"],
)
def q_zorder_layout_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # both coordinates clamped to [0, 63]: regenerated testdata outside
    # the observed ranges must not feed negative values into the
    # shift/mask interleave (negative >> is engine-ambiguous territory)
    p = part.select(
        "p_partkey",
        F.least(F.greatest(F.col("p_size").cast("long"), F.lit(0)), F.lit(63)).alias(
            "sz"
        ),
        (
            (F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long") - 90000)
            * 64
        ).alias("_pbn"),
    ).withColumn(
        "pb",
        F.least(F.greatest(F.expr("_pbn div 10000"), F.lit(0)), F.lit(63)),
    )
    z = p.withColumn("zcode", F.expr(_ZCODE_SQL))
    return (
        z.groupBy(F.expr("zcode div 64").alias("zfile"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("sz").alias("sz_min"),
            F.max("sz").alias("sz_max"),
            F.min("pb").alias("pb_min"),
            F.max("pb").alias("pb_max"),
            F.min("zcode").alias("z_min"),
            F.max("zcode").alias("z_max"),
        )
        .select(
            F.col("zfile").cast("long"),
            F.col("n_parts").cast("long"),
            F.col("sz_min").cast("long"),
            F.col("sz_max").cast("long"),
            F.col("pb_min").cast("long"),
            F.col("pb_max").cast("long"),
            F.col("z_min").cast("long"),
            F.col("z_max").cast("long"),
        )
    )


@register(
    "write_partition_plan",
    # Write-side layout planning — the op a 100 TB pipeline runs BEFORE
    # the sink: given the day-partitioned event stream, how many files
    # per partition hit the target file size, and which days are skewed
    # enough to need further splitting. Pure integer arithmetic over
    # one daily agg, hash-exact. The 256 KiB target is the test-scale
    # stand-in for the production 128 MiB (same math, documented); the
    # byte estimate is data-derived (payload octet_length + fixed row
    # overhead), not a constant-per-row guess.
    oracle="""
        WITH d AS (
            SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                        AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(strlen(props) + 48) AS BIGINT) AS est_bytes
            FROM events GROUP BY 1
        ), t AS (
            SELECT CAST(SUM(est_bytes) AS BIGINT) AS total_bytes FROM d
        )
        SELECT d.day, d.n_rows, d.est_bytes,
               CAST(CEIL(CAST(d.est_bytes AS DOUBLE) / 262144.0) AS BIGINT)
                   AS n_files,
               CAST(CEIL(CAST(d.n_rows AS DOUBLE)
                         / CEIL(CAST(d.est_bytes AS DOUBLE) / 262144.0))
                    AS BIGINT) AS rows_per_file,
               CAST(d.est_bytes * 1000 // t.total_bytes AS BIGINT)
                   AS share_permille
        FROM d CROSS JOIN t
    """,
    description="Partitioned-write layout plan per day: data-derived "
    "byte estimate (payload octet_length + row overhead), target-size "
    "file counts, rows per file, and per-partition share in exact "
    "integer permille — the planning pass before .partitionBy(date) "
    "writes at scale.",
    tags=["storage", "planning", "aggregate"],
)
def q_write_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.octet_length("props") + F.lit(48)).cast("long").alias("est_bytes"),
    )
    t = d.agg(F.sum("est_bytes").cast("long").alias("total_bytes"))
    n_files = F.ceil(F.col("est_bytes").cast("double") / F.lit(262144.0))
    return d.join(F.broadcast(t)).select(
        "day",
        "n_rows",
        "est_bytes",
        n_files.cast("long").alias("n_files"),
        F.ceil(F.col("n_rows").cast("double") / n_files).cast("long").alias(
            "rows_per_file"
        ),
        F.expr("CAST(est_bytes * 1000 div total_bytes AS BIGINT)").alias(
            "share_permille"
        ),
    )


@register(
    "salted_skew_join",
    # Skew-salted join PROVEN equivalent to the plain join (the oracle
    # IS the unsalted form): the classic rewrite for a hot-keyed
    # shuffle join that AQE's skew splitting can't reach (e.g. a
    # shuffled-hash join, or a skewed aggregate feeding the join). The
    # fact side tags each row with salt = pmod(event_id, S); the dim
    # side is replicated S times via one explode(sequence) — the join
    # key becomes (key, salt), splitting every hot key's rows across S
    # shuffle partitions. events.event_type is exactly the 100 TB skew
    # shape: 5 distinct keys, so an unsalted exchange lands 20% of the
    # fact table in ONE task. Row-level correctness is visible in the
    # output: each user's deviation sum mixes per-row dim lookups
    # across types, all in exact integer cents.
    oracle="""
        WITH e AS (
            SELECT user_id, event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
        ), dim AS (
            SELECT event_type,
                   CAST(SUM(cents) AS BIGINT) AS type_sum,
                   CAST(COUNT(*) AS BIGINT) AS type_cnt
            FROM e GROUP BY 1
        )
        SELECT CAST(e.user_id AS BIGINT) AS user_id,
               CAST(SUM(e.cents * d.type_cnt - d.type_sum) AS BIGINT)
                   AS dev_units,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM e JOIN dim d ON e.event_type = d.event_type
        GROUP BY e.user_id
    """,
    description="Hot-key salted join: dim replicated S=16x via "
    "explode(sequence), fact salted with pmod(event_id, 16), join on "
    "(event_type, salt) under a shuffle_hash hint (broadcast would "
    "hide the exchange this rewrite exists to fix) — every hot key's "
    "rows spread across 16 tasks instead of 1. The DuckDB oracle is "
    "the UNSALTED join, so the hash match is the equivalence proof. "
    "Per-user scaled deviation sum (cents*type_cnt - type_sum, exact "
    "integers) makes row-level join correctness observable.",
    tags=["join", "skew", "salting", "scale"],
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salt = 16
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    dim = ev.groupBy("event_type").agg(
        F.sum("cents").cast("long").alias("type_sum"),
        F.count(F.lit(1)).cast("long").alias("type_cnt"),
    )
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    fact = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(n_salt)).cast("int"))
    joined = fact.join(
        dim_rep.hint("shuffle_hash"),
        ["event_type", "_salt"],
    )
    return joined.groupBy("user_id").agg(
        F.sum(F.col("cents") * F.col("type_cnt") - F.col("type_sum"))
        .cast("long")
        .alias("dev_units"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ).select(
        F.col("user_id").cast("long").alias("user_id"), "dev_units", "n_events"
    )


@register(
    "shuffle_skew_report",
    # Pre-shuffle skew audit for candidate shuffle keys — the report a
    # 100 TB job runs BEFORE committing to a partitioning: per key
    # column, the key count, total rows, the hottest key's count and
    # identity, the max/mean ratio in exact integer permille (1000 =
    # perfectly uniform), and the top-10-key share. One partial-agg
    # shuffle per key column over the post-agg count table; windows
    # order the (bounded) per-key count tables, never raw events.
    oracle="""
        WITH uk AS (
            SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS cnt
            FROM events GROUP BY 1
        ), tk AS (
            SELECT event_type AS key, COUNT(*) AS cnt
            FROM events GROUP BY 1
        ), u AS (
            SELECT 'user_id' AS key_col, key, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk
            FROM uk
            UNION ALL
            SELECT 'event_type', key, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk
            FROM tk
        )
        SELECT key_col,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
               MIN(CASE WHEN rk = 1 THEN key END) AS hottest_key,
               CAST(MAX(cnt) * COUNT(*) * 1000
                    // SUM(cnt) AS BIGINT) AS skew_permille,
               CAST(SUM(CASE WHEN rk <= 10 THEN cnt ELSE 0 END) * 1000
                    // SUM(cnt) AS BIGINT) AS top10_share_permille
        FROM u GROUP BY key_col
    """,
    description="Shuffle-key skew audit (user_id, event_type): hottest "
    "key, max/mean ratio and top-10 share in exact integer permille — "
    "the decide-before-you-shuffle report behind salting / AQE skew "
    "hints. Windows run over per-key count tables, never raw rows.",
    tags=["planning", "skew", "aggregate"],
)
def q_shuffle_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    # deliberately NO rank window over the per-key count table: key
    # cardinality is unbounded at scale, so a global ordered window
    # here would single-partition (the source-level plan guard rejects
    # it). The hottest key is a struct-min aggregate; the top-10 mass
    # is a TakeOrdered limit.
    def branch(col: Column, name: str) -> DataFrame:
        counts = ev.groupBy(col.cast("string").alias("key")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # stats + top-10 both consume counts, but NO pin is needed:
        # the two subtrees canonicalize to the same shuffle, and AQE's
        # stage cache runs it once (final plan shows ReusedExchange —
        # one events scan per branch). The r10 form eagerly
        # localCheckpoint-ed here, which (a) added two blocking
        # materialization jobs per run and (b) left unpersist timing
        # to the ContextCleaner, whose GC-driven churn was the r10
        # rerun inversion (3.2 s first / 6.3 s rerun): reruns paid
        # cleanup of prior runs' checkpoint blocks. Measured after the
        # drop: stable 1.0-1.2 s x8 reps, clean canaries (SCALING.md
        # round-11 falsification entry).
        stats = counts.agg(
            F.lit(name).alias("key_col"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.max("cnt").cast("long").alias("max_key_rows"),
            # min over (-cnt, key): largest count, smallest key on ties
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("key").alias("k")))[
                "k"
            ].alias("hottest_key"),
        )
        top10 = (
            counts.orderBy(F.col("cnt").desc(), "key")
            .limit(10)
            .agg(F.sum("cnt").cast("long").alias("_top10_rows"))
        )
        return stats.join(F.broadcast(top10)).select(
            "key_col",
            "n_keys",
            "n_rows",
            "max_key_rows",
            "hottest_key",
            F.expr(
                "CAST(max_key_rows * n_keys * 1000 div n_rows AS BIGINT)"
            ).alias("skew_permille"),
            F.expr("CAST(_top10_rows * 1000 div n_rows AS BIGINT)").alias(
                "top10_share_permille"
            ),
        )

    return branch(F.col("user_id"), "user_id").unionByName(
        branch(F.col("event_type"), "event_type")
    )


@register(
    "unpivot_daily_metrics",
    oracle="""
        WITH wide AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS purchases,
                   CAST(SUM(CASE WHEN event_type = 'click'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
                   CAST(SUM(CASE WHEN event_type = 'view'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS views,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM events
            GROUP BY 1
        )
        SELECT strftime(day, '%Y-%m-%d') AS day, metric, val
        FROM (
            SELECT day, 'purchases' AS metric, purchases AS val FROM wide
            UNION ALL
            SELECT day, 'clicks', clicks FROM wide
            UNION ALL
            SELECT day, 'views', views FROM wide
            UNION ALL
            SELECT day, 'value_cents', value_cents FROM wide
        )
    """,
    description="UNPIVOT / melt (§2.5 extras — the inverse of "
    "pivot_event_type_daily): a wide per-day metrics frame melted to "
    "long (day, metric, val) with the native DataFrame.unpivot "
    "operator. Wide-to-long is a per-row explode — no shuffle beyond "
    "the one daily aggregation; at 100 TB the melt adds zero exchanges "
    "(4 output rows per input row, pipelined in the same stage).",
    tags=["reshape", "unpivot", "aggregate"],
)
def q_unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    wide = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("purchases"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("clicks"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("views"),
        F.sum(cents).cast("long").alias("value_cents"),
    )
    return wide.unpivot(
        ["d"], ["purchases", "clicks", "views", "value_cents"], "metric", "val"
    ).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"), "metric", "val"
    )


@register(
    "cdc_upsert_merge",
    # MERGE INTO semantics (the Delta/Iceberg lakehouse upsert) as
    # plain DataFrame algebra: no MERGE statement exists in stock
    # Spark SQL, but its relational core is exactly
    # compact-the-feed -> full-outer-join -> per-row action.
    oracle="""
        WITH base AS (
            SELECT user_id,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS bal,
                   COUNT(*) AS n
            FROM events
            WHERE ts < TIMESTAMP '2024-01-29 00:00:00'
              AND user_id % 7 <> 0
            GROUP BY 1
        ), late AS (
            SELECT * FROM events
            WHERE ts >= TIMESTAMP '2024-01-29 00:00:00'
        ), latest AS (
            SELECT user_id,
                   CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
            FROM (
                SELECT user_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM late
            )
            WHERE rn = 1
        ), delta AS (
            SELECT user_id,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS add_bal,
                   COUNT(*) AS add_n
            FROM late
            GROUP BY 1
        ), changes AS (
            SELECT l.user_id, l.op, d.add_bal, d.add_n
            FROM latest l JOIN delta d USING (user_id)
        )
        SELECT CAST(COALESCE(b.user_id, c.user_id) AS BIGINT) AS user_id,
               CAST(COALESCE(b.bal, 0) + COALESCE(c.add_bal, 0) AS BIGINT)
                   AS bal_cents,
               CAST(COALESCE(b.n, 0) + COALESCE(c.add_n, 0) AS BIGINT)
                   AS n_events,
               CASE WHEN c.user_id IS NULL THEN 'kept'
                    WHEN b.user_id IS NULL THEN 'inserted'
                    ELSE 'updated' END AS action
        FROM base b
        FULL JOIN changes c ON b.user_id = c.user_id
        WHERE c.op IS NULL OR c.op = 'U'
    """,
    description="CDC upsert / MERGE INTO semantics (lakehouse batch "
    "merge, Delta/Iceberg style) in stock Spark: a 28-day balance "
    "snapshot merged with the last two days treated as a change feed "
    "— the feed is COMPACTED to one action per key (latest event "
    "wins; a final 'error' event is the delete tombstone), then ONE "
    "full-outer join on the key applies WHEN MATCHED UPDATE / WHEN "
    "NOT MATCHED INSERT / MATCHED-tombstone DELETE / unmatched-"
    "tombstone no-op, tagging each surviving row kept/updated/"
    "inserted. The snapshot excludes user_id %% 7 == 0 keys — the "
    "synthetic events table has zero user churn, so snapshot key-"
    "absence (the INSERT path) is modeled explicitly. At scale this "
    "is the canonical merge shape: two key-partitioned aggregations "
    "+ one key-partitioned full-outer join (AQE-skew-splittable), "
    "never a row-at-a-time apply loop; integer cents keep it "
    "hash-exact.",
    tags=["cdc", "merge", "join", "lakehouse"],
)
def q_cdc_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    split = F.lit("2024-01-29 00:00:00").cast("timestamp")
    base = (
        ev.filter((F.col("ts") < split) & (F.col("user_id") % 7 != 0))
        .groupBy("user_id")
        .agg(F.sum(cents).alias("bal"), F.count(F.lit(1)).alias("n"))
    )
    late = ev.filter(F.col("ts") >= split)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        late.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        )
    )
    delta = late.groupBy("user_id").agg(
        F.sum(cents).alias("add_bal"), F.count(F.lit(1)).alias("add_n")
    )
    changes = latest.join(delta, "user_id")
    return (
        base.alias("b")
        .join(changes.alias("c"), "user_id", "full_outer")
        .filter(F.col("c.op").isNull() | (F.col("c.op") == "U"))
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            (F.coalesce(F.col("b.bal"), F.lit(0)) + F.coalesce(F.col("c.add_bal"), F.lit(0)))
            .cast("long")
            .alias("bal_cents"),
            (F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("c.add_n"), F.lit(0)))
            .cast("long")
            .alias("n_events"),
            F.when(F.col("c.op").isNull(), "kept")
            .when(F.col("b.n").isNull(), "inserted")
            .otherwise("updated")
            .alias("action"),
        )
    )


@register(
    "cdc_scd2_history",
    # The lakehouse pattern a user hits right after cdc_upsert_merge:
    # type-2 slowly-changing dimension maintenance from the same
    # change feed — instead of latest-wins overwrite, every change
    # OPENS a version row and the superseding change (or a delete
    # tombstone) CLOSES it via lead(). Same compaction-window shape,
    # zero new shuffle kinds: everything is keyed on user_id.
    oracle="""
        WITH base_last AS (
            SELECT user_id, us, event_id, tier FROM (
                SELECT user_id, epoch_us(ts) AS us, event_id,
                       CASE WHEN value < 50 THEN 1
                            WHEN value < 150 THEN 2
                            ELSE 3 END AS tier,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
                WHERE ts < TIMESTAMP '2024-01-29 00:00:00'
                  AND user_id % 7 <> 0
            ) WHERE rn = 1
        ), feed AS (
            SELECT user_id, epoch_us(ts) AS us, event_id,
                   CASE WHEN event_type = 'error' THEN NULL
                        WHEN value < 50 THEN 1
                        WHEN value < 150 THEN 2
                        ELSE 3 END AS tier
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-29 00:00:00'
        ), timeline AS (
            SELECT user_id, us, event_id, tier FROM base_last
            UNION ALL
            SELECT user_id, us, event_id, tier FROM feed
        ), marked AS (
            SELECT user_id, us, tier,
                   lag(tier) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) AS prev_tier,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) AS seq
            FROM timeline
        ), versions AS (
            SELECT user_id, tier, us AS valid_from_us, seq
            FROM marked
            WHERE seq = 1 OR tier IS DISTINCT FROM prev_tier
        ), closed AS (
            SELECT user_id, tier, valid_from_us,
                   lead(valid_from_us) OVER (PARTITION BY user_id
                                             ORDER BY seq) AS valid_to_us
            FROM versions
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(tier AS BIGINT) AS tier,
               CAST(valid_from_us AS BIGINT) AS valid_from_us,
               CAST(valid_to_us AS BIGINT) AS valid_to_us,
               CAST(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS is_current
        FROM closed
        WHERE tier IS NOT NULL
    """,
    description="SCD type-2 maintenance from a CDC feed (the "
    "cdc_upsert_merge setup driven to full history): the pre-split "
    "dimension snapshot (latest tier per user) plus the post-split "
    "change feed form one per-user timeline; NULL-safe change "
    "detection (lag) opens a version per tier transition, 'error' "
    "tombstones open a NULL-tier state that CLOSES the prior version "
    "and is dropped from the output, and lead() stamps every "
    "version's valid_to (open version NULL, is_current=1). All three "
    "windows partition by user_id — high-cardinality, fully parallel "
    "at 100 TB, no global window anywhere; integer event-time micros "
    "keep the history hash-exact.",
    tags=["cdc", "merge", "window", "history", "lakehouse"],
)
def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-29 00:00:00").cast("timestamp")
    tier = (
        F.when(F.col("value") < 50, 1).when(F.col("value") < 150, 2).otherwise(3)
    )
    wlast = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    base_last = (
        ev.filter((F.col("ts") < split) & (F.col("user_id") % 7 != 0))
        .withColumn("_rn", F.row_number().over(wlast))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_id",
            tier.cast("int").alias("tier"),
        )
    )
    feed = ev.filter(F.col("ts") >= split).select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None).cast("int"))
        .otherwise(tier.cast("int"))
        .alias("tier"),
    )
    wt = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = base_last.unionByName(feed).select(
        "user_id",
        "us",
        "tier",
        F.lag("tier").over(wt).alias("prev_tier"),
        F.row_number().over(wt).alias("seq"),
    )
    versions = marked.filter(
        (F.col("seq") == 1) | ~F.col("tier").eqNullSafe(F.col("prev_tier"))
    )
    wv = Window.partitionBy("user_id").orderBy("seq")
    closed = versions.select(
        "user_id", "tier", F.col("us").alias("valid_from_us"), "seq"
    ).withColumn("valid_to_us", F.lead("valid_from_us").over(wv))
    return closed.filter(F.col("tier").isNotNull()).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("tier").cast("long").alias("tier"),
        F.col("valid_from_us").cast("long").alias("valid_from_us"),
        F.col("valid_to_us").cast("long").alias("valid_to_us"),
        F.when(F.col("valid_to_us").isNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_current"),
    )

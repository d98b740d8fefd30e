"""Product analytics: attribution, A/B tests, Pareto, k-anonymity, reconciliation.

Split from the monolithic queries.py (round 10) — pure move, zero
behavior change; registration side effects run at import via
``queries/__init__.py``. 13 registered queries.
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403


@register(
    "rolling_zscore_events",
    # Rolling z-score anomaly primitive: each event scored against its
    # user's trailing-20-event window — the per-event generalization of
    # the reference's deviation ratio (python_scoring/app.py:142). All
    # window sums are exact BIGINT cents, variance comes from the
    # rational identity (n*sum_sq - sum^2)/n^2 on those integers, and
    # the only float ops are correctly-rounded divide/sqrt — so the
    # score is bit-identical across engines with no float-sum ordering.
    oracle="""
        WITH c AS (
            SELECT event_id, user_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS s,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                       * CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS sq,
                   COUNT(*) OVER w AS n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(n AS BIGINT) AS n_window,
               CASE WHEN n * sq > s * s THEN
                   floor(((cents * n - s) / sqrt(CAST(n * sq - s * s AS DOUBLE) * n))
                         * 1e6 + 0.5) / 1e6
               ELSE 0.0 END AS zscore
        FROM c
    """,
    description="Rolling z-score anomaly score: trailing-20-event "
    "per-user window, variance via the exact integer identity "
    "(n*sumsq - sum^2) on BIGINT cents, z = (x-mean)/std reduced to "
    "one correctly-rounded divide+sqrt — bit-deterministic, one "
    "shuffle. The per-event form of the reference's deviation ratio.",
    tags=["window", "anomaly", "finance"],
)
def q_rolling_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(-19, 0)
    )
    s = F.sum(cents).over(w)
    sq = F.sum(cents * cents).over(w)
    n = F.count(F.lit(1)).over(w)
    # z = (x - s/n) / sqrt((n*sq - s^2)/n^2) = (x*n - s) / sqrt((n*sq - s^2)*n)
    z = F.when(
        n * sq > s * s,
        sround(
            (cents * n - s)
            / F.sqrt((n * sq - s * s).cast("double") * n),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return ev.select(
        F.col("event_id").cast("long"),
        n.cast("long").alias("n_window"),
        z.alias("zscore"),
    )


@register(
    "benford_first_digit",
    # Benford's-law screening (Nigrini 1996, the financial-forensics
    # classic): observed first-significant-digit distribution of event
    # values vs the log10(1+1/d) expectation. First digit extracted
    # from the BIGINT cents' decimal string — engine-identical, no
    # log/pow on data values anywhere (logs only on the 9 constants).
    oracle="""
        WITH d AS (
            SELECT CAST(substring(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM events
            WHERE value >= 0.01
        ), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM d)
        SELECT digit,
               CAST(COUNT(*) AS BIGINT) AS n,
               floor(COUNT(*) / CAST(t.total AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS observed,
               floor(log10(1.0 + 1.0 / digit) * 1e6 + 0.5) / 1e6 AS benford
        FROM d, t
        GROUP BY digit, t.total
    """,
    description="Benford first-digit screening over event values: digit "
    "from the integer-cents decimal string (identical across engines; "
    "no log/pow touches data), observed share vs the log10(1+1/d) "
    "expectation. One agg shuffle + broadcast scalar total.",
    tags=["aggregate", "anomaly", "finance"],
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 0.01)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    d = ev.select(F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit"))
    t = d.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .join(F.broadcast(t))
        .select(
            "digit",
            "n",
            sround(F.col("n") / F.col("total").cast("double"), 6).alias("observed"),
            sround(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6).alias(
                "benford"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Product/financial analytics shapes (round 4): cohort retention,
# funnel conversion, exponentially-weighted trailing averages — the
# standard event-analytics companions to the anomaly spine, all in
# exact integer math so they hash-match.
# ---------------------------------------------------------------------------


@register(
    "cohort_retention",
    # Weekly cohort retention matrix. ALL date math is integer
    # arithmetic on epoch days (unix_micros div 86400e6) — no engine
    # date/timezone semantics anywhere, so the matrix is hash-exact.
    oracle="""
        WITH d AS (
            SELECT user_id,
                   epoch_us(ts) // 86400000000 AS day_idx
            FROM events
        ), f AS (
            SELECT user_id, MIN(day_idx) AS first_day
            FROM d GROUP BY user_id
        )
        SELECT CAST(f.first_day // 7 AS BIGINT) AS cohort_week,
               CAST((d.day_idx - f.first_day) // 7 AS BIGINT) AS week_offset,
               CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
        FROM d JOIN f USING (user_id)
        GROUP BY 1, 2
    """,
    description="Weekly cohort retention: users bucketed by first-seen "
    "week, activity counted per (cohort, weeks-since-first) cell — the "
    "standard retention matrix. Epoch-day integer arithmetic only (no "
    "date/tz semantics), two shuffles (first-seen agg keyed on user; "
    "matrix agg), first-seen side is key-bounded so it broadcasts.",
    tags=["analytics", "aggregate", "join"],
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    d = ev.select("user_id", day.alias("day_idx"))
    f = d.groupBy("user_id").agg(F.min("day_idx").alias("first_day"))
    return (
        d.join(F.broadcast(f), "user_id")
        .groupBy(
            F.expr("first_day div 7").cast("long").alias("cohort_week"),
            F.expr("(day_idx - first_day) div 7").cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@register(
    "funnel_conversion",
    # Strict-ordering funnel: first view -> first click AFTER that
    # view -> first purchase AFTER that click, per user. Timestamps
    # compared as exact integer micros; output is 3 counting rows.
    oracle="""
        WITH e AS (
            SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        ), v AS (
            SELECT user_id, MIN(us) AS v_us FROM e
            WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, MIN(e.us) AS c_us
            FROM e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.us > v.v_us
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, MIN(e.us) AS p_us
            FROM e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.us > c.c_us
            GROUP BY e.user_id
        )
        SELECT * FROM (
            SELECT 1 AS stage, 'view' AS event_type,
                   CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
            UNION ALL
            SELECT 2, 'click_after_view',
                   CAST((SELECT COUNT(*) FROM c) AS BIGINT)
            UNION ALL
            SELECT 3, 'purchase_after_click',
                   CAST((SELECT COUNT(*) FROM p) AS BIGINT)
        )
    """,
    description="Strict-ordering conversion funnel (view -> click after "
    "first view -> purchase after that click) counted per stage. Each "
    "stage is a key-grouped MIN over integer micros joined to the "
    "previous stage's bounded per-user frontier (broadcastable at any "
    "corpus size: one row per surviving user).",
    tags=["analytics", "funnel", "join"],
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )

    def stage(n: int, label: str, frontier: DataFrame) -> DataFrame:
        return frontier.agg(
            F.lit(n).alias("stage"),
            F.lit(label).alias("event_type"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )

    return (
        stage(1, "view", v)
        .unionAll(stage(2, "click_after_view", c))
        .unionAll(stage(3, "purchase_after_click", p))
    )


@register(
    "ewma_amounts",
    # Trailing exponentially-weighted average with integer-quantized
    # weights: w_j = floor(0.8^j * 1e6) over the 16 most recent events
    # per user. Numerator/denominator are exact int64 sums (cents <=
    # 5e4, weight <= 1e6, 16 terms -> < 8e11), the EWMA is one
    # division of exact integers — bit-identical across engines.
    oracle=_ewma_oracle(),
    description="Per-user trailing EWMA of amounts (16-lag, decay 0.8) "
    "with integer-quantized weights so the weighted sum is exact int64 "
    "on both engines — the exponential-decay companion to the "
    "rolling-zscore primitive. One shuffle (the per-user window).",
    tags=["analytics", "window", "finance"],
)
def q_ewma_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    base = ev.select("event_id", cents.alias("cents"), "user_id", "ts")
    lagged = base.select(
        "event_id",
        *[F.lag("cents", j).over(w).alias(f"l{j}") for j in range(16)],
    )
    num = None
    den = None
    for j, wt in enumerate(_EWMA_W):
        term = F.coalesce(F.col(f"l{j}") * F.lit(wt), F.lit(0))
        dterm = F.when(F.col(f"l{j}").isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return lagged.select(
        F.col("event_id").cast("long"),
        sround(num / den.cast("double"), 4).alias("ewma_cents"),
    )


@register(
    "amount_histogram",
    # Equal-width histogram of event amounts with data-derived bounds —
    # the binning primitive (width_bucket family). Everything is
    # integer-cents arithmetic: bucket = (cents-lo)*20 div (hi-lo+1),
    # so bucket ids, counts, and per-bucket extrema are hash-exact on
    # both engines (integer div truncation == floor for the
    # non-negative operands here).
    oracle="""
        WITH c AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
        ), b AS (
            SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM c
        )
        SELECT CAST((cents - lo) * 20 // (hi - lo + 1) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents
        FROM c, b
        GROUP BY 1
    """,
    description="Equal-width 20-bucket histogram of amounts with "
    "data-derived integer-cents bounds: one bounds aggregate "
    "(broadcast back), one grouped count — two scans, no window. The "
    "binning expression is the same width_bucket arithmetic the range "
    "join and prefix scan use.",
    tags=["analytics", "aggregate"],
)
def q_amount_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"))
    b = c.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    return (
        c.join(F.broadcast(b))
        .groupBy(
            F.expr("(cents - lo) * 20 div (hi - lo + 1)").cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


@register(
    "rfm_segments",
    # RFM (recency/frequency/monetary) segmentation — the classic
    # customer-analytics companion to the anomaly spine. Recency is
    # integer epoch-day arithmetic against the corpus max-ts anchor
    # (the W2 anchored-NOW discipline); the R/F/M tiers are fixed
    # integer thresholds, so every column hash-matches.
    oracle="""
        WITH a AS (
            SELECT MAX(epoch_us(ts)) AS anchor_us FROM events
        ), u AS (
            SELECT user_id,
                   MAX(epoch_us(ts)) AS last_us,
                   COUNT(*) AS freq,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events GROUP BY user_id
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST((anchor_us - last_us) // 86400000000 AS BIGINT) AS recency_days,
               CAST(freq AS BIGINT) AS frequency,
               CAST(cents AS BIGINT) AS monetary_cents,
               CAST(CASE WHEN (anchor_us - last_us) // 86400000000 <= 7 THEN 3
                         WHEN (anchor_us - last_us) // 86400000000 <= 30 THEN 2
                         ELSE 1 END AS BIGINT) AS r_tier,
               CAST(CASE WHEN freq >= 20 THEN 3 WHEN freq >= 5 THEN 2
                         ELSE 1 END AS BIGINT) AS f_tier,
               CAST(CASE WHEN cents >= 1000000 THEN 3 WHEN cents >= 100000 THEN 2
                         ELSE 1 END AS BIGINT) AS m_tier
        FROM u, a
    """,
    description="RFM customer segmentation (anchored-NOW recency in "
    "epoch days, exact integer frequency/monetary, fixed tier "
    "thresholds): one user-keyed aggregation plus a broadcast scalar "
    "anchor — the profile spine's shuffle shape, fully hash-exact.",
    tags=["analytics", "aggregate", "profile"],
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    a = ev.agg(F.max(F.unix_micros("ts")).alias("anchor_us"))
    u = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(cents).alias("cents"),
    )
    rec_days = F.expr("(anchor_us - last_us) div 86400000000")
    return u.join(F.broadcast(a)).select(
        F.col("user_id").cast("long"),
        rec_days.cast("long").alias("recency_days"),
        F.col("freq").cast("long").alias("frequency"),
        F.col("cents").cast("long").alias("monetary_cents"),
        F.when(rec_days <= 7, 3).when(rec_days <= 30, 2).otherwise(1)
        .cast("long").alias("r_tier"),
        F.when(F.col("freq") >= 20, 3).when(F.col("freq") >= 5, 2).otherwise(1)
        .cast("long").alias("f_tier"),
        F.when(F.col("cents") >= 1_000_000, 3).when(F.col("cents") >= 100_000, 2)
        .otherwise(1).cast("long").alias("m_tier"),
    )


@register(
    "skyline_pareto_parts",
    # 2-D skyline / Pareto frontier (Börzsönyi 2001): parts not
    # dominated on (retail price low, size high). The oracle states
    # dominance directly as NOT EXISTS (quadratic — fine for DuckDB at
    # test scale); the Spark plan uses the O(n log n) decomposition:
    # p is dominated iff  max size over strictly-cheaper parts >= p.size
    #                 or  max size within p's exact price group > p.size,
    # where the strictly-cheaper running max is the two-pass
    # distributed prefix scan (operators/prefix.py:ordered_prefix_max)
    # — NO single-partition window and NO quadratic join.
    oracle="""
        WITH p AS (
            SELECT p_partkey,
                   CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_u,
                   CAST(p_size AS BIGINT) AS size
            FROM part
        )
        SELECT p.p_partkey AS p_partkey, p.price_u, p.size
        FROM p
        WHERE NOT EXISTS (
            SELECT 1 FROM p q
            WHERE q.price_u <= p.price_u AND q.size >= p.size
              AND (q.price_u < p.price_u OR q.size > p.size)
        )
    """,
    description="Pareto-frontier query via distributed prefix max: "
    "per-price-bucket window cummax + triangular carry compose "
    "(prefix.py) for the strictly-cheaper side, a partitionBy(price) "
    "window for exact-price ties. Linearithmic and fully parallel "
    "where the textbook formulation is a quadratic self-join; the "
    "NOT EXISTS oracle proves the decomposition's tie semantics.",
    tags=["skyline", "window", "analytics"],
)
def q_skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import ordered_prefix_max

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long").alias("price_u"),
        F.col("p_size").cast("long").alias("size"),
    )
    pm = ordered_prefix_max(p, "price_u", "size", out_col="_strict_max")
    eq_max = F.max("size").over(Window.partitionBy("price_u"))
    dominated = (F.col("_strict_max") >= F.col("size")) | (eq_max > F.col("size"))
    return (
        pm.withColumn("_dom", F.coalesce(dominated, F.lit(False)))
        .filter(~F.col("_dom"))
        .select("p_partkey", "price_u", "size")
    )


@register(
    "event_type_association_rules",
    # Market-basket association rules over per-user event-type baskets
    # (Agrawal & Srikant 1994 support/confidence/lift, the co-purchase
    # analytics staple): basket = the set of event types a user ever
    # emits; for every ordered type pair (a -> b) report
    #   support_u    = 1e6 * n_ab div n_users
    #   confidence_u = 1e6 * n_ab div n_a
    #   lift_u       = 1e6 * n_ab * n_users div (n_a * n_b)
    # — all integer divisions over exact counts, hash-stable. The
    # basket-pair explosion is bounded by (distinct types)^2 per user,
    # not events^2: baskets are deduplicated (user, type) pairs first.
    oracle="""
        WITH b AS (
            SELECT DISTINCT user_id, event_type FROM events
        ), n AS (
            SELECT COUNT(DISTINCT user_id) AS n_users FROM b
        ), s AS (
            SELECT event_type, COUNT(*) AS n_t FROM b GROUP BY event_type
        ), p AS (
            SELECT x.event_type AS ante, y.event_type AS cons,
                   COUNT(*) AS n_ab
            FROM b x JOIN b y
              ON x.user_id = y.user_id AND x.event_type <> y.event_type
            GROUP BY x.event_type, y.event_type
        )
        SELECT p.ante, p.cons,
               CAST(p.n_ab AS BIGINT) AS n_ab,
               CAST(sa.n_t AS BIGINT) AS n_ante,
               CAST(sc.n_t AS BIGINT) AS n_cons,
               CAST(1000000 * p.n_ab // n.n_users AS BIGINT) AS support_u,
               CAST(1000000 * p.n_ab // sa.n_t AS BIGINT) AS confidence_u,
               CAST(1000000 * p.n_ab * n.n_users // (sa.n_t * sc.n_t)
                    AS BIGINT) AS lift_u
        FROM p
        JOIN s sa ON sa.event_type = p.ante
        JOIN s sc ON sc.event_type = p.cons
        CROSS JOIN n
    """,
    description="Association rules (support/confidence/lift) over "
    "per-user channel baskets: distinct (user, type) dedup first, so "
    "the pair self-join is bounded by types^2 per user; single-type "
    "counts and the user total broadcast back; every metric an exact "
    "integer division in 1e-6 units. Two partial-agg shuffles + one "
    "user-keyed pair join — parallel at any user count.",
    tags=["analytics", "association", "aggregate"],
)
def q_event_type_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.select("user_id", "event_type").distinct()
    n = b.agg(F.countDistinct("user_id").alias("n_users"))
    s = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    x = b.select(F.col("user_id"), F.col("event_type").alias("ante"))
    y = b.select(F.col("user_id"), F.col("event_type").alias("cons"))
    p = (
        x.join(y, "user_id")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = s.select(F.col("event_type").alias("ante"), F.col("n_t").alias("n_ante"))
    sc = s.select(F.col("event_type").alias("cons"), F.col("n_t").alias("n_cons"))
    return (
        p.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sc), "cons")
        .join(F.broadcast(n))
        .select(
            "ante",
            "cons",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_ante").cast("long").alias("n_ante"),
            F.col("n_cons").cast("long").alias("n_cons"),
            F.expr("(1000000 * n_ab) div n_users").cast("long").alias("support_u"),
            F.expr("(1000000 * n_ab) div n_ante").cast("long").alias("confidence_u"),
            F.expr("(1000000 * n_ab * n_users) div (n_ante * n_cons)")
            .cast("long")
            .alias("lift_u"),
        )
    )


@register(
    "table_fingerprint_checksum",
    # Order-invariant content fingerprint per table slice — the
    # reconciliation primitive for verifying a 100 TB copy/migration
    # without moving the data twice: each row hashes to a 32-bit
    # integer via the engine-portable md5-prefix trick (integer and
    # ISO-date renderings only — no double formatting in the hash
    # input), and the slice digest is the commutative (bit_xor, count,
    # sum) triple, computable as ONE partial-aggregated scan on each
    # side independently. XOR alone is blind to duplicated row PAIRS;
    # the count and the value sum in the same triple close that hole.
    oracle="""
        WITH r AS (
            SELECT l_returnflag,
                   ('0x' || substr(md5(
                        CAST(l_orderkey AS VARCHAR) || '|' ||
                        CAST(l_linenumber AS VARCHAR) || '|' ||
                        CAST(l_partkey AS VARCHAR) || '|' ||
                        CAST(l_suppkey AS VARCHAR) || '|' ||
                        CAST(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100
                                        + 0.5) AS BIGINT) AS VARCHAR) || '|' ||
                        CAST(l_shipdate AS VARCHAR)
                   ), 1, 8))::BIGINT AS sig,
                   CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5)
                        AS BIGINT) AS cents
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(bit_xor(sig) AS BIGINT) AS xor_sig,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM r GROUP BY 1
    """,
    description="Per-returnflag order-invariant table checksum: "
    "portable md5-prefix row signatures folded with bit_xor + count + "
    "exact cents sum. One partial-agg scan, no shuffle beyond the "
    "3-row group key — run it on source and replica independently and "
    "compare 3 rows instead of re-reading 100 TB twice.",
    tags=["aggregate", "reconciliation", "scale"],
)
def q_table_fingerprint_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice").cast("double") * 100 + F.lit(0.5)
    ).cast("long")
    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        cents.cast("string"),
        F.col("l_shipdate").cast("string"),
    )
    sig = F.conv(F.substring(F.md5(row_str), 1, 8), 16, 10).cast("long")
    return (
        li.select("l_returnflag", sig.alias("sig"), cents.alias("cents"))
        .groupBy("l_returnflag")
        .agg(
            F.bit_xor("sig").cast("long").alias("xor_sig"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


@register(
    "k_anonymity_audit",
    # k-anonymity audit (Sweeney 2002) over the quasi-identifier
    # (event_type, hour-of-day, day-of-week): how many QI groups have
    # fewer than k=5 members, and how many rows sit in them — the
    # re-identification exposure a dataset release review asks for
    # first. All integer: counts, a group-size histogram agg, permille
    # one floor division. One fact pass to the QI grid (<=840 cells),
    # everything else grid-sized.
    oracle="""
        WITH e AS (
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) % 24 AS hour,
                   ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow
            FROM events
        ), g AS (
            SELECT event_type, hour, dow, COUNT(*) AS cnt
            FROM e GROUP BY 1, 2, 3
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS qi_groups,
               CAST(SUM(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS groups_below_k,
               CAST(MIN(cnt) AS BIGINT) AS min_group_size,
               CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               CAST(SUM(cnt) AS BIGINT) AS rows_total,
               CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) * 1000
                    // SUM(cnt) AS BIGINT) AS risk_permille
        FROM g GROUP BY 1
    """,
    description="k-anonymity exposure audit at k=5 over the "
    "(event_type, hour, day-of-week) quasi-identifier: groups below "
    "k, rows at re-identification risk, integer permille — the "
    "governance gate before any event-level data release. One "
    "partial-agg pass to the bounded QI grid.",
    tags=["governance", "aggregate"],
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (F.expr("unix_micros(ts) div 3600000000") % 24).alias("hour"),
        ((F.expr("unix_micros(ts) div 86400000000") + 4) % 7).alias("dow"),
    )
    g = e.groupBy("event_type", "hour", "dow").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    below = F.when(F.col("cnt") < 5, F.col("cnt")).otherwise(0)
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("qi_groups"),
        F.sum(F.when(F.col("cnt") < 5, 1).otherwise(0))
        .cast("long")
        .alias("groups_below_k"),
        F.min("cnt").cast("long").alias("min_group_size"),
        F.sum(below).cast("long").alias("rows_at_risk"),
        F.sum("cnt").cast("long").alias("rows_total"),
        F.expr(
            "SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) * 1000 div SUM(cnt)"
        )
        .cast("long")
        .alias("risk_permille"),
    )


@register(
    "attribution_models",
    # Multi-touch marketing attribution over the event stream: every
    # purchase credits the user's clicks in the preceding 7 days under
    # THREE standard models at once — first-touch, last-touch, and
    # linear — grouped by the touch's campaign (props k mod 4, the
    # payload's campaign surrogate). Exactness: touch ordering is
    # (ts, event_id) — fully deterministic under tied timestamps;
    # linear credit is integer micro-credits 1e6 div n with the
    # REMAINDER assigned to the last touch, so per-purchase credit
    # sums to exactly 1,000,000 and the global invariant
    # sum(linear) == 1e6 * attributed_purchases holds bit-exactly
    # (pinned in tests). Scale: one user-keyed equi-join between the
    # purchase and click frames with the window predicate riding the
    # hash join as a filter; per-purchase stats by purchase-keyed
    # window (high-cardinality partitions).
    oracle="""
        WITH clk AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
                       AS campaign
            FROM events WHERE event_type = 'click'
        ), pur AS (
            SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
            FROM events WHERE event_type = 'purchase'
        ), touch AS (
            SELECT pur.p_id, clk.campaign, clk.us, clk.event_id,
                   COUNT(*) OVER (PARTITION BY pur.p_id) AS n_touch,
                   row_number() OVER (PARTITION BY pur.p_id
                                      ORDER BY clk.us, clk.event_id) AS rn
            FROM pur JOIN clk USING (user_id)
            WHERE clk.us < pur.p_us
              AND clk.us >= pur.p_us - 604800000000
        )
        SELECT CAST(campaign AS BIGINT) AS campaign,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS first_touch,
               CAST(SUM(CASE WHEN rn = n_touch THEN 1 ELSE 0 END) AS BIGINT)
                   AS last_touch,
               CAST(SUM(1000000 // n_touch
                        + CASE WHEN rn = n_touch THEN 1000000 % n_touch
                               ELSE 0 END) AS BIGINT) AS linear_micro,
               CAST(COUNT(*) AS BIGINT) AS n_touches
        FROM touch GROUP BY 1
    """,
    description="Three attribution models in one pass (first-touch / "
    "last-touch / exact-integer linear micro-credits with remainder-"
    "to-last, so credit is conserved bit-exactly): purchases joined to "
    "the user's prior-7-day clicks, per-purchase windows, campaign "
    "rollup — the marketing-analytics staple on the anomaly engine's "
    "event stream.",
    tags=["analytics", "attribution", "join", "window"],
)
def q_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("us"),
        (F.get_json_object("props", "$.k").cast("long") % 4).alias("campaign"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.unix_micros("ts").alias("p_us"),
    )
    touch = pur.join(clk, "user_id").filter(
        (F.col("us") < F.col("p_us"))
        & (F.col("us") >= F.col("p_us") - F.lit(604800000000))
    )
    wp = Window.partitionBy("p_id")
    wo = Window.partitionBy("p_id").orderBy("us", "event_id")
    t = touch.select(
        "p_id", "campaign",
        F.count(F.lit(1)).over(wp).alias("n_touch"),
        F.row_number().over(wo).alias("rn"),
    )
    return t.groupBy("campaign").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("first_touch"),
        F.sum(F.when(F.col("rn") == F.col("n_touch"), 1).otherwise(0))
        .cast("long")
        .alias("last_touch"),
        F.sum(
            F.expr("1000000 div n_touch")
            + F.when(
                F.col("rn") == F.col("n_touch"),
                F.expr("1000000 % n_touch"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("linear_micro"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
    ).select(
        F.col("campaign").cast("long"),
        "first_touch", "last_touch", "linear_micro", "n_touches",
    )


@register(
    "pareto_revenue_deciles",
    # Revenue-concentration ("whale") curve: users ranked by purchase
    # revenue, bucketed into deciles by rank, each decile's share of
    # total revenue in exact permille — the 80/20 concentration
    # readout every payments/risk team keeps on a wall. Exactness and
    # scale: per-user revenue is one user-keyed agg; ranking runs on
    # the distinct-REVENUE grid (counts per value) through the
    # two-pass prefix sum ordered descending — never a window over
    # the user table; a revenue-tie group lands wholly in the decile
    # of its first rank (deterministic, documented). All integer
    # cents; one floor division per output column.
    oracle="""
        WITH ur AS (
            SELECT user_id,
                   SUM(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                            AS BIGINT)) AS rev
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ), g AS (
            SELECT rev, COUNT(*) AS c FROM ur GROUP BY 1
        ), n AS (
            SELECT SUM(c) AS n_users, SUM(rev * c) AS total_rev FROM g
        ), e AS (
            SELECT rev, c,
                   SUM(c) OVER (ORDER BY rev DESC
                       ROWS UNBOUNDED PRECEDING) - c AS rank_before
            FROM g
        )
        SELECT CAST(e.rank_before * 10 // n.n_users AS BIGINT) AS decile,
               CAST(SUM(e.c) AS BIGINT) AS n_users,
               CAST(SUM(e.rev * e.c) AS BIGINT) AS revenue_cents,
               CAST(SUM(e.rev * e.c) * 1000 // MAX(n.total_rev) AS BIGINT)
                   AS revenue_permille
        FROM e, n
        GROUP BY 1
    """,
    description="Revenue Pareto deciles (the whale curve): users "
    "ranked by exact purchase cents on the distinct-revenue grid via "
    "the two-pass prefix sum (no user-table window), decile revenue "
    "shares in integer permille — ties deterministically follow "
    "their group's first rank.",
    tags=["analytics", "aggregate", "prefix"],
)
def q_pareto_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.floor(F.col("value").cast("double") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("rev")
        )
    )
    g = ur.groupBy("rev").agg(F.count(F.lit(1)).alias("c"))
    g = g.withColumn("negrev", -F.col("rev"))
    g = g.localCheckpoint(eager=True)  # grid; prefix + totals consumers
    n = g.agg(
        F.sum("c").alias("n_users"),
        F.sum(F.col("rev") * F.col("c")).alias("total_rev"),
    )
    e = ordered_prefix_sum(g, "negrev", "c", out_col="rank_before", pin=False)
    return (
        e.crossJoin(F.broadcast(n))
        .groupBy(
            F.expr("rank_before * 10 div n_users").cast("long").alias("decile")
        )
        .agg(
            F.sum("c").cast("long").alias("n_users"),
            F.sum(F.col("rev") * F.col("c")).cast("long").alias(
                "revenue_cents"
            ),
            F.expr("SUM(rev * c) * 1000 div MAX(total_rev)")
            .cast("long")
            .alias("revenue_permille"),
        )
    )

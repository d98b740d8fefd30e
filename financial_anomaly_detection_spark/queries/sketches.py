"""Mergeable sketches: CMS, HLL, KMV, Bloom, quantile digests, runtime filters.

Split from the monolithic queries.py (round 10) — pure move, zero
behavior change; registration side effects run at import via
``queries/__init__.py``. 12 registered queries.
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403


@register(
    "hll_exact_md5",
    # Hash-level oracle surrogate for the HyperLogLog tier (Flajolet
    # 2007) — the cardinality-sketch sibling of minhash_exact_md5 /
    # simhash_exact_md5: the production tier (approx_distinct_users)
    # uses Spark's engine-specific HLL++, so here the register math is
    # recomputed with md5-derived hashes both engines share. Register
    # j = top 6 hash bits; rho = 1 + leading zeros of the low 26 bits
    # (computed by string position over bin() — identical semantics in
    # both engines, no float log2); the raw estimate
    # alpha_64 * m^2 / sum(2^-reg) is carried as exact integers
    # (z_scaled = sum 2^(27-reg); est = 709*4096*2^27 div 1000*z).
    # Output: all 64 registers + the estimate and true count. The raw
    # estimator (no small-range linear-counting correction) is the
    # documented surrogate scope.
    oracle=f"""
        WITH k AS (
            SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events
        ), h AS (
            SELECT ('0x' || substr(md5(k), 1, 8))::BIGINT AS h FROM k
        ), r AS (
            SELECT h // {_HLL_SUFFIX} AS j,
                   CASE WHEN strpos(lpad(bin(h % {_HLL_SUFFIX}), 26, '0'), '1') = 0
                        THEN 27
                        ELSE strpos(lpad(bin(h % {_HLL_SUFFIX}), 26, '0'), '1')
                   END AS rho
            FROM h
        ), regs AS (
            SELECT j, MAX(rho) AS register FROM r GROUP BY j
        ), allj AS (
            SELECT unnest(generate_series(0, {_HLL_M - 1})) AS j
        ), fullr AS (
            SELECT allj.j, COALESCE(regs.register, 0) AS register
            FROM allj LEFT JOIN regs ON allj.j = regs.j
        ), z AS (
            SELECT SUM(CAST(1 AS BIGINT) << (27 - register)) AS z_scaled
            FROM fullr
        ), t AS (
            SELECT COUNT(DISTINCT user_id) AS true_distinct FROM events
        )
        SELECT CAST(fullr.j AS BIGINT) AS j,
               CAST(fullr.register AS BIGINT) AS register,
               CAST(z.z_scaled AS BIGINT) AS z_scaled,
               CAST((CAST(709 AS BIGINT) * 4096 * 134217728)
                    // (1000 * z.z_scaled) AS BIGINT) AS est,
               CAST(t.true_distinct AS BIGINT) AS true_distinct
        FROM fullr CROSS JOIN z CROSS JOIN t
    """,
    description="HyperLogLog register math with hash-level oracle "
    "parity: md5-derived 32-bit hashes, 64 max-rho registers from one "
    "partial-agg shuffle of <=64 rows (the mergeable fixed-size "
    "cardinality summary), integer-exact raw estimator. Anchors the "
    "rows-only approx_count_distinct tier the way minhash_exact_md5 "
    "anchors MinHashLSH. At 100 TB register count tunes accuracy; the "
    "shuffle stays register-sized.",
    tags=["sketch", "aggregate", "oracle-surrogate"],
)
def q_hll_exact_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keys = ev.select(F.col("user_id").cast("string").alias("k")).distinct()
    h = F.conv(F.substring(F.md5("k"), 1, 8), 16, 10).cast("long")
    r = keys.select(h.alias("h")).select(
        F.expr(f"h div {_HLL_SUFFIX}").alias("j"),
        F.expr(
            f"CASE WHEN instr(lpad(bin(h % {_HLL_SUFFIX}), 26, '0'), '1') = 0 "
            f"THEN 27 ELSE instr(lpad(bin(h % {_HLL_SUFFIX}), 26, '0'), '1') END"
        ).alias("rho"),
    )
    regs = r.groupBy("j").agg(F.max("rho").alias("register"))
    allj = spark.range(_HLL_M).select(F.col("id").alias("j"))
    fullr = (
        allj.join(regs, "j", "left")
        .na.fill(0, subset=["register"])
        .select("j", F.col("register").cast("long").alias("register"))
    )
    z = fullr.agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(27 - register AS INT))")
        ).alias("z_scaled")
    )
    truth = ev.agg(F.count_distinct("user_id").alias("true_distinct"))
    return (
        fullr.join(F.broadcast(z))
        .join(F.broadcast(truth))
        .select(
            F.col("j").cast("long"),
            F.col("register").cast("long"),
            F.col("z_scaled").cast("long"),
            F.expr(
                "(CAST(709 AS BIGINT) * 4096 * 134217728) div (1000 * z_scaled)"
            )
            .cast("long")
            .alias("est"),
            F.col("true_distinct").cast("long"),
        )
    )


@register(
    "kmv_set_cardinality",
    # K-minimum-values sketch (Bar-Yossef 2002; the Theta-sketch
    # ancestor): keep the k smallest distinct hash values of a set;
    # distinct-count estimate = (k-1) * 2^32 / h_(k), and — the part
    # HLL cannot do — sketches COMPOSE under set algebra: the union
    # sketch is the k smallest of the merged hash sets, giving
    # |A∪B| directly and |A∩B| by inclusion-exclusion. Estimates,
    # ranks, and thresholds are all integer md5 math, so the whole
    # ledger (estimate vs exact truth for A, B, A∪B, A∩B) is
    # hash-exact across engines. Sets smaller than k degrade to the
    # exact count (the standard KMV rule), guarded in both plans.
    oracle=f"""
        WITH ha AS (
            SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
            FROM events WHERE event_type = 'purchase'
        ), hb AS (
            SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
            FROM events WHERE event_type = 'click'
        ), tagged AS (
            SELECT 'a' AS s, h FROM ha
            UNION ALL SELECT 'b', h FROM hb
            UNION ALL SELECT 'u', h FROM (
                SELECT h FROM ha UNION SELECT h FROM hb
            )
        ), ranked AS (
            SELECT s, h,
                   ROW_NUMBER() OVER (PARTITION BY s ORDER BY h ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY s) AS n
            FROM tagged
        ), est AS (
            SELECT s,
                   MAX(n) AS n_exact,
                   CASE WHEN MAX(n) < {_KMV_K} THEN MAX(n)
                        ELSE ({_KMV_K - 1} * 4294967296)
                             // MAX(CASE WHEN rn = {_KMV_K} THEN h END)
                   END AS est
            FROM ranked GROUP BY s
        )
        SELECT CAST({_KMV_K} AS BIGINT) AS k,
               CAST(a.est AS BIGINT) AS est_a,
               CAST(a.n_exact AS BIGINT) AS true_a,
               CAST(b.est AS BIGINT) AS est_b,
               CAST(b.n_exact AS BIGINT) AS true_b,
               CAST(u.est AS BIGINT) AS est_union,
               CAST(u.n_exact AS BIGINT) AS true_union,
               CAST(a.est + b.est - u.est AS BIGINT) AS est_inter_ie,
               CAST(a.n_exact + b.n_exact - u.n_exact AS BIGINT) AS true_inter
        FROM (SELECT * FROM est WHERE s = 'a') a
        CROSS JOIN (SELECT * FROM est WHERE s = 'b') b
        CROSS JOIN (SELECT * FROM est WHERE s = 'u') u
    """,
    description="KMV distinct-count sketch with set algebra: k "
    "smallest md5 hash values per set, (k-1)*2^32/h_k estimator, "
    "union sketch by merge + re-truncate, intersection by "
    "inclusion-exclusion — the composable-cardinality ledger "
    "(estimate vs exact for A, B, A∪B, A∩B) integer-exact across "
    "engines. At 100 TB each partition ships only its k smallest "
    "hashes (mergeable partial agg); under-k sets degrade to exact "
    "counts by rule.",
    tags=["sketch", "aggregate", "set-ops"],
)
def q_kmv_set_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")

    def hashes(pred):
        return ev.filter(pred).select(h.alias("h")).distinct()

    ha = hashes(F.col("event_type") == "purchase")
    hb = hashes(F.col("event_type") == "click")
    tagged = (
        ha.select(F.lit("a").alias("s"), "h")
        .unionAll(hb.select(F.lit("b").alias("s"), "h"))
        .unionAll(
            ha.select("h").union(hb.select("h")).distinct()
            .select(F.lit("u").alias("s"), "h")
        )
    )
    # Two-pass parallel k-min (the set-tag cardinality is tiny, so a
    # plain per-set window would funnel every distinct hash through 3
    # tasks at scale): pass 1 takes the k smallest within each of 64
    # hash-buckets per set — 192-way parallel, surviving <= 64k rows
    # per set REGARDLESS of corpus size; pass 2 ranks that bounded
    # table. Identical result (global k-min is a subset of the
    # bucket-local k-mins).
    w1 = Window.partitionBy("s", F.col("h") % 64).orderBy(F.asc("h"))
    survivors = (
        tagged.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= _KMV_K)
        .drop("rn1")
    )
    w_rank = Window.partitionBy("s").orderBy(F.asc("h"))
    ranked = survivors.select(
        "s", "h", F.row_number().over(w_rank).alias("rn")
    )
    counts = tagged.groupBy("s").agg(F.count(F.lit(1)).alias("n_exact"))
    est = (
        ranked.groupBy("s")
        .agg(
            F.expr(
                f"MAX(CASE WHEN rn = {_KMV_K} THEN h END)"
            ).alias("hk")
        )
        .join(counts, "s")
        .select(
            "s",
            "n_exact",
            F.expr(
                f"CASE WHEN n_exact < {_KMV_K} THEN n_exact "
                f"ELSE ({_KMV_K - 1} * 4294967296) div hk END"
            ).alias("est"),
        )
    )

    def one(tag, prefix):
        return F.broadcast(
            est.filter(F.col("s") == tag).select(
                F.col("est").alias(f"est_{prefix}"),
                F.col("n_exact").alias(f"true_{prefix}"),
            )
        )

    return (
        spark.range(1)
        .select(F.lit(_KMV_K).cast("long").alias("k"))
        .join(one("a", "a"))
        .join(one("b", "b"))
        .join(one("u", "u"))
        .select(
            "k",
            F.col("est_a").cast("long"),
            F.col("true_a").cast("long"),
            F.col("est_b").cast("long"),
            F.col("true_b").cast("long"),
            F.col("est_u").cast("long").alias("est_union"),
            F.col("true_u").cast("long").alias("true_union"),
            (F.col("est_a") + F.col("est_b") - F.col("est_u"))
            .cast("long")
            .alias("est_inter_ie"),
            (F.col("true_a") + F.col("true_b") - F.col("true_u"))
            .cast("long")
            .alias("true_inter"),
        )
    )


@register(
    "approx_distinct_users",
    oracle=None,
    description="approx_count_distinct (HLL++) — the 100 TB substitute for "
    "exact count-distinct (see distinct_agg_users for the exact twin). "
    "Rows-only: sketch estimates are engine-specific by design.",
    tags=["aggregate", "approx"],
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # The two aggregates are computed in SEPARATE plans and joined on
    # the 5-row group key: combining countDistinct with
    # approx_count_distinct in one agg makes Catalyst pin BOTH to the
    # distinct-rewrite grouping, so the rsd=0.01 HLL partial (1,639
    # sketch words, ~13 KB) is built per DISTINCT (type, user) PAIR
    # and shuffled — ~650 MB of sketch rows at sf0.1 where the split
    # form shuffles 5 sketches + a deduped key stream (11 s -> ~1 s).
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).cast("long").alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return approx.join(exact, "event_type")


@register(
    "cms_heavy_hitters",
    # Count-Min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    # screen over the event stream's user keys — the mergeable
    # fixed-size frequency summary you ship from 1000 executors when
    # key cardinality is itself the scale problem (the HLL counterpart
    # is approx_distinct_users). Hashing is md5-derived (the repo's
    # hash-surrogate discipline), so the 4x256 grid and every point
    # estimate are integer-exact across engines. The CMS guarantee
    # est >= true is visible in the output (est_cnt vs true_cnt).
    oracle=f"""
        WITH keyed AS (
            SELECT CAST(user_id AS VARCHAR) AS k FROM events
        ), cells AS (
            SELECT k, j,
                   CASE j
                     WHEN 0 THEN {_cms_bucket_sql('k', 0)}
                     WHEN 1 THEN {_cms_bucket_sql('k', 1)}
                     WHEN 2 THEN {_cms_bucket_sql('k', 2)}
                     ELSE {_cms_bucket_sql('k', 3)}
                   END AS bucket
            FROM keyed CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
        ), grid AS (
            SELECT j, bucket, COUNT(*) AS cnt FROM cells GROUP BY j, bucket
        ), probes AS (
            SELECT DISTINCT k, j, bucket FROM cells
        ), est AS (
            SELECT probes.k, MIN(grid.cnt) AS est
            FROM probes JOIN grid USING (j, bucket)
            GROUP BY probes.k
        ), truth AS (
            SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS cnt
            FROM events GROUP BY user_id
        )
        SELECT CAST(est.k AS BIGINT) AS user_id,
               CAST(est.est AS BIGINT) AS est_cnt,
               CAST(truth.cnt AS BIGINT) AS true_cnt
        FROM est JOIN truth USING (k)
        ORDER BY est_cnt DESC, user_id ASC
        LIMIT 20
    """,
    description="Count-Min sketch heavy hitters: the event keys fold "
    "into a fixed 4x256 md5-hashed counter grid via ONE partial-agg "
    "shuffle of at most 1024 rows (map-side combine does the "
    "per-partition sketching — the sketch, not the keys, crosses the "
    "wire), estimates are min-over-depth after a broadcast grid join. "
    "At 100 TB the grid size is unchanged; only widths tune. "
    "Upper-bound property est>=true asserted in tests and visible in "
    "the output columns.",
    tags=["sketch", "aggregate", "llm-pipeline"],
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_estimate, count_min_sketch

    ev = load_table(spark, sf_dir, "events")
    grid = count_min_sketch(ev, "user_id", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(grid, truth.select("user_id"), "user_id",
                       depth=_CMS_DEPTH, width=_CMS_WIDTH)
    return (
        est.join(truth, "user_id")
        .orderBy(F.desc("est"), F.asc("user_id"))
        .limit(20)
        .select(
            F.col("user_id").cast("long"),
            F.col("est").cast("long").alias("est_cnt"),
            F.col("true_cnt").cast("long"),
        )
    )


@register(
    "bloom_semi_join_prune",
    # Bloom-filter runtime semi-join pruning (Bloom 1970; the manual
    # form of Spark's row-level runtime filters): build a 4032-bit
    # k=3 Bloom filter over the build side (high-balance customers),
    # probe the fact side (orders) BEFORE any join, and report the
    # per-priority pruning ledger — rows passing the bloom, true
    # matches, and false positives. The filter itself is 64 bigint
    # words built by ONE bit_or partial aggregation and broadcast to
    # the probe; no correctness risk (no false negatives) by
    # construction, and both engines compute identical md5-derived
    # bit positions, so the ledger is hash-exact.
    oracle=f"""
        WITH build AS (
            SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer
            WHERE c_acctbal > 5000.0
        ), pos AS (
            SELECT {_bloom_pos_sql('k', 0)} AS p FROM build
            UNION ALL SELECT {_bloom_pos_sql('k', 1)} FROM build
            UNION ALL SELECT {_bloom_pos_sql('k', 2)} FROM build
        ), bloom AS (
            SELECT p // {_BLOOM_BITS_PER_WORD} AS widx,
                   bit_or(CAST(1 AS BIGINT) << (p % {_BLOOM_BITS_PER_WORD}))
                       AS word
            FROM pos GROUP BY p // {_BLOOM_BITS_PER_WORD}
        ), probe AS (
            SELECT o_orderkey, o_orderpriority, o_custkey,
                   CAST(o_custkey AS VARCHAR) AS k
            FROM orders
        ), probe_bits AS (
            SELECT o_orderkey, o_orderpriority, o_custkey, i,
                   CASE i
                     WHEN 0 THEN {_bloom_pos_sql('k', 0)}
                     WHEN 1 THEN {_bloom_pos_sql('k', 1)}
                     ELSE {_bloom_pos_sql('k', 2)}
                   END AS p
            FROM probe CROSS JOIN (SELECT unnest([0,1,2]) AS i)
        ), hits AS (
            SELECT o_orderkey, o_orderpriority, o_custkey,
                   SUM(CASE WHEN ((bloom.word >> (p % {_BLOOM_BITS_PER_WORD}))
                                  & 1) = 1
                            THEN 1 ELSE 0 END) AS n_set
            FROM probe_bits
            JOIN bloom ON p // {_BLOOM_BITS_PER_WORD} = bloom.widx
            GROUP BY o_orderkey, o_orderpriority, o_custkey
        ), flagged AS (
            SELECT h.o_orderpriority,
                   CASE WHEN h.n_set = {_BLOOM_K} THEN 1 ELSE 0 END AS pass_bloom,
                   CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END AS true_match
            FROM hits h
            LEFT JOIN build b ON CAST(h.o_custkey AS VARCHAR) = b.k
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(pass_bloom) AS BIGINT) AS n_pass_bloom,
               CAST(SUM(true_match) AS BIGINT) AS n_true_match,
               CAST(SUM(pass_bloom) - SUM(true_match) AS BIGINT)
                   AS n_false_positive
        FROM flagged
        GROUP BY o_orderpriority
    """,
    description="Bloom-filter semi-join pruning ledger: 64-word k=3 "
    "filter over high-balance customers built by one bit_or partial "
    "agg, broadcast to the orders probe, per-priority counts of "
    "bloom-passing rows vs true matches vs false positives. At 100 TB "
    "this is the declarative twin of Spark's runtime row-level "
    "filters: the probe filter runs BEFORE the fact-table shuffle, "
    "and the filter's size is fixed regardless of data volume. No "
    "false negatives by construction (ledger proves it: n_true_match "
    "<= n_pass_bloom in every group).",
    tags=["join", "sketch", "runtime-filter"],
)
def q_bloom_semi_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = cust.filter(F.col("c_acctbal") > 5000.0).select(
        F.col("c_custkey").cast("string").alias("k")
    )

    def pos(col, i):
        return (
            F.conv(
                F.substring(F.md5(F.concat(col, F.lit(f"@{i}"))), 1, 8), 16, 10
            ).cast("long")
            % _BLOOM_M
        )

    positions = build.select(
        F.explode(
            F.array(*[pos(F.col("k"), i) for i in range(_BLOOM_K)])
        ).alias("p")
    )
    bloom = positions.groupBy(
        F.expr(f"p div {_BLOOM_BITS_PER_WORD}").alias("widx")
    ).agg(
        F.bit_or(
            # python F.shiftleft needs a literal count; SQL form takes a column
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(p % {_BLOOM_BITS_PER_WORD} AS INT))"
            )
        ).alias("word")
    )
    probe = orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_custkey",
        F.col("o_custkey").cast("string").alias("k"),
    )
    probe_bits = probe.select(
        "o_orderkey",
        "o_orderpriority",
        "o_custkey",
        F.explode(
            F.array(*[pos(F.col("k"), i) for i in range(_BLOOM_K)])
        ).alias("p"),
    )
    hits = (
        probe_bits.join(
            F.broadcast(bloom),
            F.expr(f"p div {_BLOOM_BITS_PER_WORD}") == F.col("widx"),
        )
        .groupBy("o_orderkey", "o_orderpriority", "o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.expr(
                        f"shiftright(word, CAST(p % {_BLOOM_BITS_PER_WORD} "
                        f"AS INT)) & 1"
                    )
                    == 1,
                    1,
                ).otherwise(0)
            ).alias("n_set")
        )
    )
    flagged = hits.join(
        F.broadcast(build.withColumnRenamed("k", "bk")),
        F.col("o_custkey").cast("string") == F.col("bk"),
        "left",
    ).select(
        "o_orderpriority",
        F.when(F.col("n_set") == _BLOOM_K, 1).otherwise(0).alias("pass_bloom"),
        F.when(F.col("bk").isNotNull(), 1).otherwise(0).alias("true_match"),
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("pass_bloom").cast("long").alias("n_pass_bloom"),
        F.sum("true_match").cast("long").alias("n_true_match"),
        (F.sum("pass_bloom") - F.sum("true_match"))
        .cast("long")
        .alias("n_false_positive"),
    )


@register(
    "quantile_sketch_values",
    # Fully oracle-backed DESPITE the Arrow/numpy execution path: the
    # sketch is a deterministic pure function of the data (md5 group
    # assignment + integer-ceil rank knots), so DuckDB reproduces the
    # identical knots relationally — rank r of group g is a knot iff
    # floor(r*k/n) > floor((r-1)*k/n) (the j-interval emptiness test
    # for ceil(j*n/k) = r), weight = gap to the previous knot rank.
    # The rank-ERROR bound (<= N/k) is separately pytest-asserted; the
    # oracle here pins the sketch's exact value, making the
    # approximate operator itself hash-checkable — same discipline as
    # minhash_exact_md5 / hll_exact_md5.
    oracle="""
        WITH base AS (
            SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                       % 32 AS g,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
        ), r AS (
            SELECT g, cents,
                   CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY cents)
                        AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM base
        ), kn AS (
            SELECT g, cents AS value, rn
            FROM r
            WHERE (rn * 200) // n > ((rn - 1) * 200) // n
        ), kw AS (
            SELECT g, value,
                   rn - COALESCE(LAG(rn) OVER (PARTITION BY g ORDER BY rn), 0)
                       AS w
            FROM kn
        ), merged AS (
            SELECT value, CAST(SUM(w) AS BIGINT) AS w FROM kw GROUP BY value
        ), run AS (
            SELECT value,
                   CAST(SUM(w) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum
            FROM merged
        ), tot AS (
            SELECT CAST(SUM(w) AS BIGINT) AS n_total FROM merged
        ), qs AS (
            SELECT CAST(unnest([0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99])
                        AS DOUBLE) AS q
        )
        SELECT qs.q,
               CAST(MIN(run.value) AS BIGINT) AS est_cents,
               CAST(MIN(run.value) AS DOUBLE) / 100.0 AS est_dollars,
               CAST(ANY_VALUE(tot.n_total) AS BIGINT) AS n_total
        FROM qs
        CROSS JOIN tot
        JOIN run ON run.cum >= CAST(ceil(qs.q * tot.n_total) AS BIGINT)
        GROUP BY qs.q
    """,
    description="Mergeable quantile sketch (GK/KLL-family) over event "
    "value cents: md5 group assignment (layout-independent and engine-"
    "reproducible), Arrow-batched per-group rank knots (G*k rows "
    "total), weighted merge + distributed prefix scan for the final "
    "estimates — the quantile member of the sketch family (CMS / HLL "
    "/ KMV), with a full value-hash oracle.",
    tags=["sketch", "quantile", "approx"],
)
def q_quantile_sketch_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import quantile_sketch_estimates, quantile_sketch_knots

    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_id", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    knots = quantile_sketch_knots(cents, "cents", "event_id")
    est = quantile_sketch_estimates(
        knots, [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]
    )
    return est.select(
        "q",
        F.col("est").cast("long").alias("est_cents"),
        (F.col("est").cast("double") / F.lit(100.0)).alias("est_dollars"),
        F.col("n_total").cast("long"),
    )


@register(
    "quantile_sketch_weekly_rollup",
    # Sketch MERGEABILITY across time partitions for the QUANTILE
    # member of the sketch family — the hll_weekly_rollup discipline:
    # per-(week, day, group) rank knots (k=8, 4 md5 groups — real
    # compression at test scale) are the daily sketch table you'd
    # persist at 100 TB; any coarser window then merges KNOT-sized
    # data by plain weight addition instead of rescanning raw rows.
    # Here daily knots roll up to weekly, the weekly median estimate
    # is read off the merged knots via a per-week running weight, and
    # the estimate's TRUE rank in the raw weekly data plus the
    # documented error budget (merged rank error <= sum of per-sketch
    # n_g/k = n_week/8) are in the output, so the approximation
    # guarantee is itself hash-checked. Everything is md5-derived
    # integer arithmetic — engine-reproducible, full value-hash
    # oracle despite the Arrow execution path.
    oracle="""
        WITH base AS (
            SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                        AS BIGINT) // 7 AS week,
                   CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                        AS BIGINT) AS day,
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                       % 4 AS g,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
        ), r AS (
            SELECT week, day, g, cents,
                   CAST(ROW_NUMBER() OVER (PARTITION BY week, day, g
                                           ORDER BY cents) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY week, day, g)
                        AS BIGINT) AS n
            FROM base
        ), kn AS (
            SELECT week, day, g, cents AS value, rn
            FROM r
            WHERE (rn * 8) // n > ((rn - 1) * 8) // n
        ), kw AS (
            SELECT week, day, g, value,
                   rn - COALESCE(LAG(rn) OVER (PARTITION BY week, day, g
                                               ORDER BY rn), 0) AS w
            FROM kn
        ), weekly AS (
            SELECT week, value, CAST(SUM(w) AS BIGINT) AS w
            FROM kw GROUP BY week, value
        ), run AS (
            SELECT week, value,
                   CAST(SUM(w) OVER (PARTITION BY week ORDER BY value
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM weekly
        ), tot AS (
            SELECT week, CAST(SUM(w) AS BIGINT) AS n_week FROM weekly GROUP BY week
        ), est AS (
            SELECT run.week, CAST(MIN(run.value) AS BIGINT) AS est_cents,
                   CAST(ANY_VALUE(tot.n_week) AS BIGINT) AS n_week
            FROM run JOIN tot ON run.week = tot.week
            WHERE run.cum >= CAST(ceil(0.5 * tot.n_week) AS BIGINT)
            GROUP BY run.week
        ), truth AS (
            SELECT base.week,
                   CAST(SUM(CASE WHEN base.cents <= est.est_cents
                                 THEN 1 ELSE 0 END) AS BIGINT) AS rank_le
            FROM base JOIN est ON base.week = est.week
            GROUP BY base.week
        )
        SELECT est.week, est.est_cents, est.n_week, truth.rank_le,
               CAST(ceil(0.5 * est.n_week) AS BIGINT) AS target_rank,
               CAST(CASE WHEN abs(truth.rank_le
                                  - CAST(ceil(0.5 * est.n_week) AS BIGINT))
                         <= CAST(ceil(est.n_week / 8.0) AS BIGINT)
                    THEN 1 ELSE 0 END AS BIGINT) AS within_bound
        FROM est JOIN truth ON est.week = truth.week
    """,
    description="Quantile-sketch mergeability across time partitions: "
    "per-(week, day, md5-group) rank knots (k=8) roll up to weekly by "
    "weight addition; the weekly median estimate is read off the "
    "merged knots, and its true rank in the raw weekly data plus the "
    "n/8 error budget are emitted — the materialize-daily-sketch-"
    "tables pattern with the approximation guarantee hash-checked.",
    tags=["sketch", "quantile", "approx", "time-series"],
)
def q_quantile_sketch_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import quantile_sketch_knots

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).cast(
        "long"
    )
    base = ev.select(
        # floor, not truncate: DuckDB's // floors toward -inf, so a
        # pre-anchor (negative) day must bucket the same way; exact
        # because multiples of 7 are exactly representable doubles
        F.floor(day / F.lit(7.0)).cast("long").alias("week"),
        day.alias("day"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    daily = quantile_sketch_knots(
        base, "cents", "event_id", n_groups=4, knots_per_group=8,
        partition_cols=("week", "day"),
    )
    # the rollup: weekly sketches from KNOT-sized daily data only
    weekly = daily.groupBy("week", "value").agg(F.sum("w").cast("long").alias("w"))
    wnd = (
        Window.partitionBy("week")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = weekly.withColumn("cum", F.sum("w").over(wnd).cast("long"))
    tot = weekly.groupBy("week").agg(F.sum("w").cast("long").alias("n_week"))
    est = (
        run.join(tot, "week")
        .filter(F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n_week")).cast("long"))
        .groupBy("week")
        .agg(
            F.min("value").cast("long").alias("est_cents"),
            F.any_value("n_week").cast("long").alias("n_week"),
        )
    )
    truth = (
        base.join(F.broadcast(est), "week")
        .groupBy("week")
        .agg(
            F.sum((F.col("cents") <= F.col("est_cents")).cast("long"))
            .cast("long")
            .alias("rank_le")
        )
    )
    target = F.ceil(F.lit(0.5) * F.col("n_week")).cast("long")
    budget = F.ceil(F.col("n_week") / F.lit(8.0)).cast("long")
    return (
        est.join(truth, "week")
        .select(
            "week",
            "est_cents",
            "n_week",
            "rank_le",
            target.alias("target_rank"),
            F.when(F.abs(F.col("rank_le") - target) <= budget, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("within_bound"),
        )
    )



@register(
    "cms_join_cardinality",
    # Join-size estimation by CMS inner product (Cormode &
    # Muthukrishnan 2005 §4.2) — the optimizer-statistics use of the
    # sketch family: estimate |events JOIN orders ON user_id=o_custkey|
    # from two fixed 4x256 grids (one <=1024-row partial-agg shuffle
    # per side) instead of executing the join. The estimate is the MIN
    # over sketch rows of the bucket-wise count product: an upper
    # bound, exact when no two keys collide in a row; both the
    # estimate and the true size are in the output so the bound is
    # visible. All integer arithmetic on md5-derived buckets — the
    # whole thing is engine-reproducible, so even the ESTIMATOR is
    # hash-checked.
    oracle=f"""
        WITH ka AS (
            SELECT CAST(user_id AS VARCHAR) AS k FROM events
        ), kb AS (
            SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
        ), ca AS (
            SELECT j, bucket, COUNT(*) AS cnt FROM (
                SELECT k, j,
                       CASE j
                         WHEN 0 THEN {_cms_bucket_sql('k', 0)}
                         WHEN 1 THEN {_cms_bucket_sql('k', 1)}
                         WHEN 2 THEN {_cms_bucket_sql('k', 2)}
                         ELSE {_cms_bucket_sql('k', 3)}
                       END AS bucket
                FROM ka CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
            ) GROUP BY j, bucket
        ), cb AS (
            SELECT j, bucket, COUNT(*) AS cnt FROM (
                SELECT k, j,
                       CASE j
                         WHEN 0 THEN {_cms_bucket_sql('k', 0)}
                         WHEN 1 THEN {_cms_bucket_sql('k', 1)}
                         WHEN 2 THEN {_cms_bucket_sql('k', 2)}
                         ELSE {_cms_bucket_sql('k', 3)}
                       END AS bucket
                FROM kb CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
            ) GROUP BY j, bucket
        ), ip AS (
            SELECT ca.j, CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS ip
            FROM ca JOIN cb USING (j, bucket) GROUP BY ca.j
        ), ipfull AS (
            -- rows with zero bucket overlap have true inner product 0:
            -- left-join the depth index so they count in the min
            SELECT COALESCE(ip.ip, 0) AS ip
            FROM (SELECT unnest([0,1,2,3]) AS j) d LEFT JOIN ip USING (j)
        ), est AS (
            SELECT CAST(MIN(ip) AS BIGINT) AS est_join_rows FROM ipfull
        ), truth AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS true_join_rows
            FROM events e JOIN orders o ON e.user_id = o.o_custkey
        )
        SELECT est.est_join_rows, truth.true_join_rows
        FROM est CROSS JOIN truth
    """,
    description="CMS inner-product join-cardinality estimate "
    "(events.user_id x orders.o_custkey): two fixed 4x256 grids, "
    "bucket-wise count products, min over rows — O(grid) planner "
    "statistics vs the true join size, both hash-exact.",
    tags=["sketch", "planning", "join"],
)
def q_cms_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_join_size_estimate

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    est = cms_join_size_estimate(ev, "user_id", orders, "o_custkey")
    truth = (
        ev.join(orders, ev.user_id == orders.o_custkey)
        .agg(F.count(F.lit(1)).cast("long").alias("true_join_rows"))
    )
    return est.join(F.broadcast(truth))


@register(
    "hll_weekly_rollup",
    # Sketch MERGEABILITY across time partitions — the property that
    # makes sketch tables worth materializing at 100 TB: daily HLL
    # registers (the hll_exact_md5 math per day) roll up to weekly by
    # plain MAX per register, and the rolled-up registers are verified
    # EQUAL to registers built directly from the weekly data (max is
    # associative — checked, not assumed, per week in the output).
    # Daily register tables are what you'd persist; any window (week,
    # month, arbitrary day ranges) then aggregates register-sized
    # data instead of rescanning events. Integer-exact end to end.
    oracle="""
        WITH base AS (
            SELECT DISTINCT
                   CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                        AS BIGINT) // 7 AS week,
                   CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                        AS BIGINT) AS day,
                   CAST(user_id AS VARCHAR) AS k
            FROM events
        ), h AS (
            SELECT week, day, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h
            FROM base
        ), r AS (
            SELECT week, day, h // {suffix} AS j,
                   CASE WHEN strpos(lpad(bin(h % {suffix}), 26, '0'), '1') = 0
                        THEN 27
                        ELSE strpos(lpad(bin(h % {suffix}), 26, '0'), '1')
                   END AS rho
            FROM h
        ), daily AS (
            SELECT week, day, j, MAX(rho) AS register FROM r GROUP BY 1, 2, 3
        ), merged AS (
            SELECT week, j, MAX(register) AS register FROM daily GROUP BY 1, 2
        ), direct AS (
            SELECT week, j, MAX(rho) AS register FROM r GROUP BY 1, 2
        ), eq AS (
            SELECT m.week,
                   CAST(MIN(CASE WHEN m.register = d.register
                                 THEN 1 ELSE 0 END) AS BIGINT) AS merged_eq_direct
            FROM merged m JOIN direct d ON m.week = d.week AND m.j = d.j
            GROUP BY m.week
        ), z AS (
            SELECT week,
                   CAST(SUM(CAST(1 AS BIGINT) << (27 - register))
                        + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << 27)
                        AS BIGINT) AS z_scaled
            FROM merged GROUP BY week
        ), t AS (
            SELECT week, CAST(COUNT(DISTINCT k) AS BIGINT) AS true_distinct,
                   CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
            FROM base GROUP BY week
        )
        SELECT z.week,
               CAST(z.z_scaled AS BIGINT) AS z_scaled,
               CAST((CAST(709 AS BIGINT) * 4096 * 134217728)
                    // (1000 * z.z_scaled) AS BIGINT) AS est,
               t.true_distinct, t.n_days, eq.merged_eq_direct
        FROM z JOIN t USING (week) JOIN eq USING (week)
    """.replace("{suffix}", str(_HLL_SUFFIX)).replace("{m}", str(_HLL_M)),
    description="HLL register mergeability across time partitions: "
    "daily registers roll up to weekly by MAX per register, verified "
    "equal to direct weekly registers (associativity checked per "
    "week); weekly estimates from the merged sketch vs true distinct "
    "counts. The materialize-daily-sketch-tables pattern, "
    "integer-exact.",
    tags=["sketch", "aggregate", "time-series"],
)
def q_hll_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).cast(
        "long"
    )
    base = ev.select(
        # floor matches the oracle's // for pre-anchor (negative) days
        F.floor(day / F.lit(7.0)).cast("long").alias("week"),
        day.alias("day"),
        F.col("user_id").cast("string").alias("k"),
    ).distinct()
    h = F.conv(F.substring(F.md5("k"), 1, 8), 16, 10).cast("long")
    r = base.select("week", "day", h.alias("h")).select(
        "week",
        "day",
        F.expr(f"h div {_HLL_SUFFIX}").alias("j"),
        F.expr(
            f"CASE WHEN instr(lpad(bin(h % {_HLL_SUFFIX}), 26, '0'), '1') = 0 "
            f"THEN 27 ELSE instr(lpad(bin(h % {_HLL_SUFFIX}), 26, '0'), '1') END"
        ).alias("rho"),
    ).localCheckpoint(eager=True)  # daily + direct + truth consumers
    daily = r.groupBy("week", "day", "j").agg(F.max("rho").alias("register"))
    merged = daily.groupBy("week", "j").agg(F.max("register").alias("register"))
    direct = r.groupBy("week", "j").agg(F.max("rho").alias("register"))
    eq = (
        merged.alias("m")
        .join(
            direct.alias("d"),
            (F.col("m.week") == F.col("d.week")) & (F.col("m.j") == F.col("d.j")),
        )
        .groupBy(F.col("m.week").alias("week"))
        .agg(
            F.min((F.col("m.register") == F.col("d.register")).cast("long"))
            .cast("long")
            .alias("merged_eq_direct")
        )
    )
    z = merged.groupBy("week").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(27 - register AS INT))"))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << 27).cast("long")
        )
        .cast("long")
        .alias("z_scaled")
    )
    t = base.groupBy("week").agg(
        F.countDistinct("k").cast("long").alias("true_distinct"),
        F.countDistinct("day").cast("long").alias("n_days"),
    )
    return (
        z.join(F.broadcast(t), "week")
        .join(F.broadcast(eq), "week")
        .select(
            "week",
            "z_scaled",
            F.expr(
                "(CAST(709 AS BIGINT) * 4096 * 134217728) div (1000 * z_scaled)"
            )
            .cast("long")
            .alias("est"),
            "true_distinct",
            "n_days",
            "merged_eq_direct",
        )
    )


@register(
    "ann_pq_topk",
    # Rows-only like the other approximate ANN tiers (codebooks come
    # from sampled k-means); recall vs the exact tier is pytest-pinned
    # (0.88 measured at sf0.01 defaults on structure-free vectors).
    oracle=None,
    description="Product-quantization ADC top-k (Jegou 2011, the "
    "FAISS IVFADC serving shape): sampled per-subspace codebooks, "
    "Arrow-kernel encoding (d doubles -> m ints, 8-32x state "
    "compression), per-query m x k distance tables so each pair "
    "costs O(m) lookups, exact re-rank of the ADC shortlist. The "
    "compression member of the ANN family (exact / LSH / IVF / "
    "simhash / PQ).",
    tags=["similarity", "vector", "topk", "sketch"],
)
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_adc_topk

    em = load_table(spark, sf_dir, "embeddings")
    qs = em.filter(F.col("vec_id") % 100 == 0)
    return pq_adc_topk(em, qs, topk=10).select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        sround(F.col("cosine"), 6).alias("cosine"),
        F.col("rn").cast("long"),
    )


@register(
    "ann_ivfpq_topk",
    # Rows-only like the other approximate ANN tiers; recall vs the
    # exact tier is pytest-pinned.
    oracle=None,
    description="IVFADC top-k (Jegou 2011 §V, the FAISS IVFx,PQy "
    "serving index): IVF cell routing composed with residual-PQ "
    "asymmetric-distance scoring — the candidate set is bounded by "
    "nprobe/nlist cell routing AND per-pair cost by O(m) code "
    "lookups, with per-candidate shuffle state of m bytes instead of "
    "d doubles. The 100 TB default above the IVF-flat memory "
    "crossover; exact cosine re-rank tail.",
    tags=["similarity", "vector", "topk", "sketch"],
)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_pq_topk

    em = load_table(spark, sf_dir, "embeddings")
    qs = em.filter(F.col("vec_id") % 100 == 0)
    return ivf_pq_topk(em, qs, k=10).select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        sround(F.col("cosine"), 6).alias("cosine"),
        F.col("rn").cast("long"),
    )


@register(
    "runtime_filter_semi_join",
    # Declarative runtime-filter join pruning — the bloom-filter-join
    # idea as a composition: hash the dim keys into a FIXED 2^20
    # bucket space (the portable multiplicative hash below, NOT
    # engine xxhash), broadcast the distinct-bucket set (bounded at
    # ~1M ints no matter how large the dim grows — the property that
    # makes this broadcastable where the raw key set is not), LEFT
    # SEMI the fact side on bucket membership BEFORE the exact
    # equi-join. Bucket collisions only ever ADD candidate rows, and
    # the exact join removes them — so the result equals the plain
    # join, which is precisely what the oracle checks.
    oracle="""
        WITH dim AS (
            SELECT c_custkey, c_name FROM customer
            WHERE c_mktsegment = 'BUILDING'
        )
        SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o.o_custkey AS BIGINT) AS o_custkey,
               d.c_name,
               CAST(floor(CAST(o.o_totalprice AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) AS total_cents
        FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
    """,
    description="Runtime-filter join LOSSLESSNESS pin: the r5 "
    "bloom_semi_join_prune primitive measured the filter's FPR ledger; "
    "this composes the prune into the full join and proves the "
    "composition exact. The BUILDING-segment dim's keys hash into a "
    "2^20 bucket set (Knuth multiplicative hash — engine-portable), "
    "the fact side is pruned by a broadcast bucket semi-join before "
    "the exact equi-join, and the oracle is the PLAIN join. At 100 TB "
    "the bucket set stays <=1M ints however big the dim is, and the "
    "pruned fact shuffle carries only ~1/5 of the rows.",
    tags=["join", "runtime-filter", "scale"],
)
def q_runtime_filter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name"
    )
    # Knuth multiplicative hash into 2^20 buckets — pure integer
    # arithmetic, identical on any engine (keys are positive; the
    # product stays < 2^63 up to ~3.4e9 keys)
    def bkt(col):
        return (F.col(col).cast("long") * F.lit(2654435761)) % F.lit(1 << 20)

    buckets = dim.select(bkt("c_custkey").alias("_bkt")).distinct()
    pruned = orders.withColumn("_bkt", bkt("o_custkey")).join(
        F.broadcast(buckets), "_bkt", "left_semi"
    )
    return pruned.join(dim, pruned["o_custkey"] == dim["c_custkey"]).select(
        F.col("o_orderkey").cast("long"),
        F.col("o_custkey").cast("long"),
        "c_name",
        F.floor(F.col("o_totalprice").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("total_cents"),
    )

"""Graph operators: PageRank, components, BFS, triangles, k-core.

Split from the monolithic queries.py (round 10) — pure move, zero
behavior change; registration side effects run at import via
``queries/__init__.py``. 10 registered queries.
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403


@register(
    "near_dup_clusters",
    oracle=None,
    description="Near-dup connected components (§2.10 'connected-components "
    "light'): iterative min-label propagation over the exact Jaccard pair "
    "list — one join + one agg per round, converges in O(cluster "
    "diameter). Cluster assignment verified against union-find in tests.",
    tags=["dedup", "graph"],
)
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import near_dup_clusters, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
    return near_dup_clusters(pairs).select(
        F.col("doc_id").cast("long"), F.col("cluster_id").cast("long")
    )


@register(
    "pagerank_part_supplier",
    # Fixed-iteration PageRank (Page & Brin 1998) over the undirected
    # part–supplier bipartite graph from lineitem, in pure integer
    # micro-rank units so three engines' worth of float summation order
    # can't matter: r0 = R div n for every node, and
    #   r_{k+1}(v) = (3 * (R div n)) div 20 + (17 * S_v) div 20,
    #   S_v = sum over neighbors u of (r_k(u) div deg(u))
    # is the damping-0.85 update with every op an exact int64 div/sum.
    # Three unrolled iterations; the DuckDB oracle is the same
    # recurrence as chained CTEs.
    oracle="""
        WITH e0 AS (
            SELECT DISTINCT l_partkey * 2 AS s, l_suppkey * 2 + 1 AS d
            FROM lineitem
        ), e AS (
            SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d FROM e0
        ), deg AS (
            SELECT s AS node, COUNT(*) AS deg FROM e GROUP BY s
        ), n AS (
            SELECT COUNT(*) AS n FROM deg
        ), r0 AS (
            SELECT node, deg, 1000000000000 // n.n AS r FROM deg CROSS JOIN n
        ), r1 AS (
            SELECT deg.node, deg.deg,
                   (3 * (1000000000000 // n.n)) // 20 + (17 * a.s) // 20 AS r
            FROM (SELECT e.d AS node, SUM(r0.r // r0.deg) AS s
                  FROM e JOIN r0 ON e.s = r0.node GROUP BY e.d) a
            JOIN deg ON deg.node = a.node CROSS JOIN n
        ), r2 AS (
            SELECT deg.node, deg.deg,
                   (3 * (1000000000000 // n.n)) // 20 + (17 * a.s) // 20 AS r
            FROM (SELECT e.d AS node, SUM(r1.r // r1.deg) AS s
                  FROM e JOIN r1 ON e.s = r1.node GROUP BY e.d) a
            JOIN deg ON deg.node = a.node CROSS JOIN n
        ), r3 AS (
            SELECT deg.node, deg.deg,
                   (3 * (1000000000000 // n.n)) // 20 + (17 * a.s) // 20 AS r
            FROM (SELECT e.d AS node, SUM(r2.r // r2.deg) AS s
                  FROM e JOIN r2 ON e.s = r2.node GROUP BY e.d) a
            JOIN deg ON deg.node = a.node CROSS JOIN n
        )
        SELECT CAST(node // 2 AS BIGINT) AS entity_id,
               CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
               CAST(deg AS BIGINT) AS degree,
               CAST(r AS BIGINT) AS rank_u
        FROM r3
        ORDER BY r DESC, node
        LIMIT 100
    """,
    description="Iterative graph centrality as a relational loop: "
    "distinct-edge projection, degree agg, then 3 unrolled "
    "join+agg PageRank steps over a PINNED edge skeleton "
    "(localCheckpoint — one parquet scan total, not one per "
    "iteration). Integer rank units make the result hash-exact "
    "despite re-associated sums. At 100 TB the per-iteration cost is "
    "one shuffle keyed on node id — the same shape GraphX/Pregel "
    "lowers to — and the iteration count is fixed, not data-dependent.",
    tags=["graph", "iterative", "analytics"],
)
def q_pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    R = 1_000_000_000_000
    li = load_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_partkey") * 2).alias("s"), (F.col("l_suppkey") * 2 + 1).alias("d")
    ).distinct()
    e = e0.unionAll(e0.select(F.col("d").alias("s"), F.col("s").alias("d")))
    # Pin the edge list: 3 iterations × 2 consumers each would replay
    # the distinct-shuffle per consumer otherwise.
    e = e.localCheckpoint(eager=True)
    # Pin the degree table too (r12): it feeds r0 plus one join per
    # iteration, and no exchange reuse fired across those consumers —
    # the before-plan re-ran the degree aggregation 4x over the pinned
    # edge blocks. The node count then comes from ONE bounded count of
    # the pinned frame (a single long of driver traffic), and the
    # teleport terms (R div n), (3*(R div n)) div 20 fold to exact
    # Python-int literals (// == SQL div for positive ints) — removing
    # the four 1-row-aggregate broadcast joins the before-plan carried.
    deg = (
        e.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()
    if n == 0:
        # Empty graph guard (ADVICE r12): the pre-r12 1-row-aggregate
        # `div n` plan degraded to an empty result; the literal fold
        # below would instead raise ZeroDivisionError at plan-build
        # time. Keep the original contract.
        return spark.createDataFrame(
            [], "entity_id long, kind string, degree long, rank_u long"
        )
    teleport = (3 * (R // n)) // 20
    r = deg.select("node", "deg", F.lit(R // n).alias("r"))
    for _ in range(3):
        contrib = (
            e.join(r.withColumnRenamed("node", "s"), "s")
            .select("d", F.expr("r div deg").alias("c"))
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("c").alias("contrib"))
        )
        r = (
            deg.join(contrib, "node")
            .select(
                "node",
                "deg",
                F.expr(f"{teleport} + (17 * contrib) div 20").alias("r"),
            )
        )
    return (
        r.orderBy(F.col("r").desc(), "node")
        .limit(100)
        .select(
            F.expr("node div 2").cast("long").alias("entity_id"),
            F.when(F.col("node") % 2 == 0, "part").otherwise("supplier").alias("kind"),
            F.col("deg").cast("long").alias("degree"),
            F.col("r").cast("long").alias("rank_u"),
        )
    )


@register(
    "triangle_count_copurchase",
    # Triangle counting on the part co-purchase graph via DEGREE-
    # ORDERED orientation (Suri & Vassilvitskii 2011, the MapReduce
    # classic): orient every edge from the (degree, id)-smaller
    # endpoint, emit wedges from each node's out-neighbor pairs, and
    # close them against the oriented edge list. Each triangle is
    # counted exactly once (at its order-minimal vertex), and the
    # wedge fan-out is bounded by sum(outdeg^2) with outdeg = O(sqrt m)
    # under this orientation — the property that makes the join
    # tractable on power-law graphs where the naive wedge join
    # explodes at the hubs. The DuckDB oracle is the naive a<b<c
    # triple join — small-scale ground truth for the oriented plan.
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        )
        SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
               CAST((SELECT COUNT(DISTINCT x) FROM (
                   SELECT a AS x FROM pairs UNION SELECT b FROM pairs
               )) AS BIGINT) AS n_nodes,
               CAST((SELECT COUNT(*)
                     FROM pairs e1
                     JOIN pairs e2 ON e1.b = e2.a
                     JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
               ) AS BIGINT) AS n_triangles
    """,
    description="Triangle count on the part co-purchase graph "
    "(parts sharing an order): degree-ordered edge orientation makes "
    "every triangle counted once at its order-minimal vertex and "
    "bounds wedge fan-out by O(m^1.5) total — the standard distributed "
    "form. Per-order pair generation is C(k,2) with k bounded by "
    "lineitems/order, so the edge build never explodes. Oracle is the "
    "naive triple join (DuckDB, test scale).",
    tags=["graph", "join", "analytics"],
)
def q_triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        _copurchase_pairs(li)
        # pinned: consumed by degrees, orientation, wedges, and closure
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        # pinned: consumed by both orientation joins + the node count
        .localCheckpoint(eager=True)
    )
    # Both counts are needed for the OUTPUT anyway — reuse them to
    # pick the degree-join strategy by MEASURED size (the repo's
    # tier-by-measurement rule): post-checkpoint stats blind the
    # optimizer here, and at x30 its mis-planned broadcast OOMed the
    # driver build while blanket SMJ hints cost 2x at x10. Explicit
    # broadcast while the node table is genuinely broadcast-sized
    # (~16 B/row -> 5M nodes ~ 80 MB), sort-merge (spill-safe) beyond.
    n_edges = e.count()
    n_nodes = deg.count()

    def deg_side(new_name: str, deg_name: str):
        d = deg.withColumnRenamed("v", new_name).withColumnRenamed("deg", deg_name)
        return F.broadcast(d) if n_nodes <= 5_000_000 else d.hint("merge")

    # total order: okey = deg * 2^32 + id (partkey < 2^32); orient
    # every edge from smaller okey to larger.
    keyed = (
        e.join(deg_side("a", "da"), "a")
        .join(deg_side("b", "db"), "b")
        .select(
            "a",
            "b",
            (F.col("da") * F.lit(4294967296) + F.col("a")).alias("ka"),
            (F.col("db") * F.lit(4294967296) + F.col("b")).alias("kb"),
        )
    )
    # Only (src, dst) survive orientation — kdst existed solely to
    # order wedge pairs, and the edge-iterator below needs no wedge
    # order, so the pinned frame is 2 longs/row instead of 4.
    oriented = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=True)
    # Edge-iterator triangle count (Schank & Wagner 2005 compact-
    # forward): n_triangles = sum over oriented edges (u, v) of
    # |N+(u) & N+(v)|. A triangle a->b, a->c, b->c is counted exactly
    # once, at edge (a, b). This replaces the former wedge
    # materialization (explode of sum outdeg^2 = O(m^1.5) rows through
    # a join) with two O(m)-byte joins against the out-neighbor lists
    # and a per-edge array intersection — nothing super-linear is ever
    # shuffled or stored. The neighbor table is one row per non-leaf
    # node; broadcast while genuinely small (measured n_edges, same
    # tier rule as deg_side), spill-safe sort-merge beyond.
    nbrs = oriented.groupBy("src").agg(F.collect_list("dst").alias("ns"))

    def nbr_side(key: str, out: str):
        d = nbrs.select(F.col("src").alias(key), F.col("ns").alias(out))
        return F.broadcast(d) if n_edges <= 5_000_000 else d.hint("merge")

    tri = (
        oriented.join(nbr_side("u", "nu"), F.col("src") == F.col("u"))
        .join(nbr_side("v", "nv"), F.col("dst") == F.col("v"))
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles"))
    )
    return tri.select(
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.col("n_triangles").cast("long"),
    )


@register(
    "entity_resolution_e2e",
    # End-to-end entity resolution — the composition the r7 operators
    # exist for: FastSS ed1 blocking (the fuzzy_name_pairs_ed1 method,
    # proven lossless there) -> exact levenshtein verify -> CONNECTED
    # COMPONENTS over the match graph (operators/graph.py) -> one
    # canonical id per cluster (min name) + cluster sizes, singletons
    # canonical to themselves. Bounded to c_custkey < 600 because the
    # recursive-CTE fixpoint materializes O(V * component) label pairs
    # in SQL (measured 18 s unbounded at sf0.01, 3 s bounded); the
    # Spark side has no such blowup — label-prop state is one row per
    # vertex, one label per edge per round.
    oracle="""
        WITH RECURSIVE n AS (
            SELECT DISTINCT c_name AS name FROM customer
            WHERE c_custkey < 600
        ), pairs AS (
            SELECT a.name AS a, b.name AS b
            FROM n a JOIN n b ON a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 1
        ), edges AS (
            SELECT a AS s, b AS d FROM pairs
            UNION ALL
            SELECT b, a FROM pairs
        ), verts AS (
            SELECT DISTINCT s AS v FROM edges
        ), lp(v, label) AS (
            SELECT v, v FROM verts
            UNION
            SELECT e.d, lp.label FROM lp JOIN edges e ON e.s = lp.v
        ), cc AS (
            SELECT v AS name, MIN(label) AS canonical FROM lp GROUP BY v
        ), resolved AS (
            SELECT n.name, COALESCE(cc.canonical, n.name) AS canonical
            FROM n LEFT JOIN cc ON n.name = cc.name
        ), sz AS (
            SELECT canonical, COUNT(*) AS cluster_size FROM resolved GROUP BY 1
        )
        SELECT r.name, r.canonical,
               CAST(sz.cluster_size AS BIGINT) AS cluster_size
        FROM resolved r JOIN sz USING (canonical)
    """,
    description="Entity resolution end to end: deletion-neighborhood "
    "blocking, exact edit-distance verify, connected components for "
    "cluster canonicalization (min-name id), singleton passthrough, "
    "cluster sizes. The oracle recomputes the whole chain with naive "
    "all-pairs + a recursive-CTE fixpoint — the hash match proves "
    "blocking losslessness AND clustering correctness at once. At "
    "100 TB every stage is bucketed or vertex-keyed; nothing "
    "quadratic, nothing global.",
    tags=["record-linkage", "graph", "dedup", "llm-pipeline"],
)
def q_entity_resolution_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 600)
    names = cust.select(F.col("c_name").alias("name")).distinct()
    # Deletion-neighborhood blocking + skew-guarded in-group pair
    # expansion shared with fuzzy_name_pairs_ed1 (_ed1_candidate_pairs:
    # grouped pass instead of a variant self-join [r12], two pipelined
    # generates so a hot variant never materializes its O(g²) pair
    # array in one row [r13]; losslessness proven by this query's own
    # full-chain oracle). Levenshtein verify runs BEFORE the
    # pair-distinct so the dedup shuffle carries matches only.
    pairs = (
        _ed1_candidate_pairs(names)
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .distinct()
    )
    cc = connected_components(
        pairs, src="name_a", dst="name_b",
        out_vertex="name", out_col="canonical", max_iter=40,
    )
    full = names.join(cc, "name", "left").select(
        "name", F.coalesce("canonical", F.col("name")).alias("canonical")
    )
    sizes = full.groupBy("canonical").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return full.join(sizes, "canonical").select("name", "canonical", "cluster_size")


@register(
    "near_dup_clusters_md5",
    # The near-dup CLUSTERING tier pinned at the hash level: the
    # production near_dup_clusters is rows-only (MLlib MinHashLSH),
    # but its structure — banded candidate pairs -> connected
    # components -> one canonical id per duplicate cluster — is fully
    # reproducible on the md5 signature family minhash_band_pairs_md5
    # already pins. Composition proof: signatures, banding, pair
    # join, CC fixpoint, singleton passthrough, and cluster sizes all
    # hash-match a single relational DuckDB reconstruction.
    oracle=_MINHASH_SIG_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    + r"""
        , bands AS (
            SELECT doc_id, band_idx,
                   CASE band_idx
                        WHEN 0 THEN CAST(sig_0 AS VARCHAR) || '-' || CAST(sig_1 AS VARCHAR)
                             || '-' || CAST(sig_2 AS VARCHAR) || '-' || CAST(sig_3 AS VARCHAR)
                        WHEN 1 THEN CAST(sig_4 AS VARCHAR) || '-' || CAST(sig_5 AS VARCHAR)
                             || '-' || CAST(sig_6 AS VARCHAR) || '-' || CAST(sig_7 AS VARCHAR)
                        WHEN 2 THEN CAST(sig_8 AS VARCHAR) || '-' || CAST(sig_9 AS VARCHAR)
                             || '-' || CAST(sig_10 AS VARCHAR) || '-' || CAST(sig_11 AS VARCHAR)
                        ELSE CAST(sig_12 AS VARCHAR) || '-' || CAST(sig_13 AS VARCHAR)
                             || '-' || CAST(sig_14 AS VARCHAR) || '-' || CAST(sig_15 AS VARCHAR)
                   END AS band_key
            FROM sig, (SELECT unnest(generate_series(0, 3)) AS band_idx)
        ), p AS (
            SELECT DISTINCT a.doc_id AS s, b.doc_id AS d
            FROM bands a
            JOIN bands b ON a.band_idx = b.band_idx
                        AND a.band_key = b.band_key
                        AND a.doc_id < b.doc_id
        ), e2 AS (
            SELECT s, d FROM p UNION ALL SELECT d, s FROM p
        ), verts AS (
            SELECT DISTINCT s AS v FROM e2
        ), lp(v, label) AS (
            SELECT v, v FROM verts
            UNION
            SELECT e2.d, lp.label FROM lp JOIN e2 ON e2.s = lp.v
        ), cc AS (
            SELECT v AS doc_id, MIN(label) AS cluster FROM lp GROUP BY v
        ), resolved AS (
            SELECT d.doc_id, COALESCE(cc.cluster, d.doc_id) AS cluster
            FROM documents d LEFT JOIN cc USING (doc_id)
        ), sz AS (
            SELECT cluster, COUNT(*) AS cluster_size
            FROM resolved GROUP BY 1
        )
        SELECT r.doc_id, CAST(r.cluster AS BIGINT) AS cluster,
               CAST(sz.cluster_size AS BIGINT) AS cluster_size
        FROM resolved r JOIN sz USING (cluster)
    """,
    description="Near-duplicate clusters with hash-level oracle "
    "parity: md5-family minhash signatures -> 4x4 banding -> "
    "candidate pairs -> connected components -> canonical min-doc_id "
    "cluster per document (singletons to themselves) + cluster "
    "sizes. Pins the rows-only MLlib tier's clustering structure end "
    "to end; every stage is band-key- or vertex-local at scale.",
    tags=["dedup", "minhash", "graph", "oracle-surrogate", "llm-pipeline"],
)
def q_near_dup_clusters_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    sigs = _md5_minhash_sigs(spark, sf_dir)
    band_keys = F.array(
        *[
            F.concat_ws(
                "-", *[F.col(f"sig_{4 * b + j}").cast("string") for j in range(4)]
            )
            for b in range(4)
        ]
    )
    bands = sigs.select(
        "doc_id", F.posexplode(band_keys).alias("band_idx", "band_key")
    )
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("s"), F.col("b.doc_id").alias("d"))
        .distinct()
    )
    cc = connected_components(
        pairs, src="s", dst="d", out_vertex="doc_id", out_col="cluster"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    resolved = docs.join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster", F.col("doc_id")).alias("cluster")
    )
    sizes = resolved.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return resolved.join(sizes, "cluster").select(
        "doc_id",
        F.col("cluster").cast("long").alias("cluster"),
        "cluster_size",
    )



@register(
    "bfs_reachability_copurchase",
    # Bounded-depth BFS (2 hops) from the min-partkey seed over the
    # part co-purchase graph — the iterative-join skeleton every
    # distributed graph pass (label propagation, connected components,
    # PageRank) reduces to, made driver-checkable: the oracle is a
    # recursive CTE, the Spark side is per-level frontier expansion
    # with localCheckpoint pinning (each level: one equi-join on the
    # edge list + distinct + anti-join against visited). Levels are
    # data-parallel; depth is the only sequential dimension, fixed at
    # 2 — at 100 TB each level is a shuffle linear in frontier-incident
    # edges, and the checkpoint caps lineage growth (the classic
    # iterative-algorithm failure mode).
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ), edges AS (
            SELECT a AS s, b AS d FROM pairs
            UNION ALL
            SELECT b, a FROM pairs
        ), seed AS (
            SELECT MIN(l_partkey) AS v FROM lineitem
        ), bfs(v, hop) AS (
            SELECT v, 0 FROM seed
            UNION
            SELECT e.d, bfs.hop + 1
            FROM bfs JOIN edges e ON e.s = bfs.v
            WHERE bfs.hop < 2
        )
        SELECT CAST(v AS BIGINT) AS node,
               CAST(MIN(hop) AS BIGINT) AS min_hops
        FROM bfs GROUP BY v
    """,
    description="2-hop BFS from the min-partkey seed over the part "
    "co-purchase graph: per-level frontier join + distinct + "
    "anti-join vs visited, localCheckpoint per level (bounded "
    "lineage). The iterative-join skeleton under label-prop / CC / "
    "PageRank, with a recursive-CTE oracle.",
    tags=["graph", "iterative", "join"],
)
def q_bfs_reachability_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # One checkpoint materialization only (r12): the symmetric view is
    # two projections over e's pinned blocks — re-deriving it per hop
    # costs two block scans, while its former eager checkpoint paid a
    # 2x-edge materialization job. `visited` stays UNcheckpointed: it
    # is a flat union of LogicalRDD leaves (the seed row + each level's
    # pinned frontier), so lineage cannot grow — the checkpoint there
    # bought nothing but two more jobs.
    e = _copurchase_pairs(li).localCheckpoint(eager=True)
    edges = e.select(F.col("a").alias("s"), F.col("b").alias("d")).unionAll(
        e.select(F.col("b").alias("s"), F.col("a").alias("d"))
    )
    # seed stays in-plan: a 1-row aggregate, broadcast into the joins
    frontier = li.agg(F.min("l_partkey").alias("v")).withColumn("hop", F.lit(0))
    visited = frontier.localCheckpoint(eager=True)
    frontier = visited
    for hop in (1, 2):
        # hop 1's frontier is the single seed row — always broadcast;
        # later frontiers can approach graph size on power-law graphs,
        # so leave the join strategy to AQE's measured sizes
        fr = frontier.select(F.col("v").alias("s"))
        nxt = (
            edges.join(F.broadcast(fr) if hop == 1 else fr, "s")
            .select(F.col("d").alias("v"))
            .distinct()
            .join(visited.select("v"), "v", "left_anti")
            .withColumn("hop", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.select(
        F.col("v").cast("long").alias("node"),
        F.col("hop").cast("long").alias("min_hops"),
    )


@register(
    "connected_components_copurchase",
    # Connected components over the part co-purchase graph, bounded to
    # the l_partkey < 1000 subgraph so the recursive-CTE oracle stays
    # constant-cost (the full min-label fixpoint materializes
    # O(V * component) pairs in SQL — fine on the slice, quadratic on
    # a giant component). The Spark side runs the REAL convergent
    # operator (operators/graph.py:connected_components) on the same
    # slice: min-label propagation, one vertex-keyed join + min-agg
    # per round, localCheckpoint lineage cap, fixpoint-tested — the
    # duplicate-cluster canonicalization primitive (near_dup_clusters'
    # one-band clustering generalized to any edge relation).
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            WHERE a.l_partkey < 1000 AND b.l_partkey < 1000
        ), edges AS (
            SELECT a AS s, b AS d FROM pairs
            UNION ALL
            SELECT b, a FROM pairs
        ), verts AS (
            SELECT DISTINCT s AS v FROM edges
        ), lp(v, label) AS (
            SELECT v, v FROM verts
            UNION
            SELECT e.d, lp.label
            FROM lp JOIN edges e ON e.s = lp.v
        )
        SELECT CAST(v AS BIGINT) AS node,
               CAST(MIN(label) AS BIGINT) AS component
        FROM lp GROUP BY v
    """,
    description="Connected components (min-label propagation to "
    "fixpoint) on the bounded co-purchase subgraph, vs a recursive-"
    "CTE min-reachable-label oracle: every vertex labeled with its "
    "component's minimum vertex id. One vertex-keyed equi-join + "
    "min-agg per round, checkpointed, O(diameter) rounds — the "
    "canonicalization step entity resolution and duplicate "
    "clustering both reduce to.",
    tags=["graph", "iterative", "join", "llm-pipeline"],
)
def q_connected_components_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 1000)
    e = _copurchase_pairs(li)
    return connected_components(e, src="a", dst="b").select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )



@register(
    "cc_twophase_copurchase",
    # The alternating large-star/small-star algorithm (Kiveris 2014
    # Two-Phase — O(log^2 n) rounds vs label-prop's O(diameter),
    # machine-checked on a 64-path in tests/test_graph.py) run on the
    # SAME bounded co-purchase subgraph and against the SAME
    # recursive-CTE oracle as connected_components_copurchase: two
    # independent distributed algorithms, one ground truth.
    oracle=REGISTRY["connected_components_copurchase"].oracle,
    description="Connected components via alternating star "
    "contraction (two vertex-keyed shuffles per round, exact "
    "fixpoint detection, checkpoint-freed generations) — the "
    "pathological-diameter upgrade path, hash-matched against the "
    "identical oracle as the label-prop tier.",
    tags=["graph", "iterative", "join", "llm-pipeline"],
)
def q_cc_twophase_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components_twophase

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 1000)
    e = _copurchase_pairs(li)
    return connected_components_twophase(e, src="a", dst="b").select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


@register(
    "cc_auto_copurchase",
    # The diameter-adaptive router (operators/graph.py:
    # connected_components_auto — label-prop bounded at 32 rounds,
    # two-phase fallback on the convergence ValueError; the measured
    # SCALING §round-8 routing note as code, VERDICT r8 task 6) on the
    # SAME bounded co-purchase subgraph and against the SAME
    # recursive-CTE oracle as both fixed-strategy CC queries. The
    # co-purchase graph's diameter is <10, so this exercises the
    # router's common path (label-prop, no fallback); the fallback
    # path is machine-checked on the diameter-1023 fixture in
    # tests/test_graph.py.
    oracle=REGISTRY["connected_components_copurchase"].oracle,
    description="Connected components through the diameter-adaptive "
    "router: min-label propagation with a 32-round budget, automatic "
    "two-phase star-contraction fallback for pathological diameters — "
    "the production entry point for UNKNOWN-diameter graphs, "
    "hash-matched against the identical oracle as both fixed tiers.",
    tags=["graph", "iterative", "join", "llm-pipeline"],
)
def q_cc_auto_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components_auto

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 1000)
    e = _copurchase_pairs(li)
    return connected_components_auto(e, src="a", dst="b").select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


@register(
    "kcore_repeat_copurchase",
    # k-core extraction (Seidman 1983) on the REPEAT-co-purchase
    # graph — parts co-bought in >=2 distinct orders (the plain
    # co-purchase slice is too dense to peel: min degree > 16). The
    # Spark side runs the REAL convergent peel operator
    # (operators/graph.k_core: degree agg + two survivor semi-joins
    # per round, edge-count fixpoint, checkpoint-freed generations —
    # measured 9 peel rounds at sf0.01); the oracle unrolls 20 peel
    # rounds mechanically. The dense-region curation filter under
    # spam-cluster mining; the same graph family as CC/triangles but
    # a different fixpoint (monotone DELETION, not label spread).
    oracle=_kcore_oracle_sql(3, 20),
    description="3-core of the repeat-co-purchase graph by true "
    "iterative peeling: per round one vertex-keyed degree agg + two "
    "survivor semi-joins, exact edge-count fixpoint. Surviving "
    "vertices with within-core degree. All shuffles vertex-keyed; "
    "rounds = peel-cascade depth (measured 9), never data volume.",
    tags=["graph", "iterative", "llm-pipeline"],
)
def q_kcore_repeat_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import k_core

    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("ps"), i + 2, F.greatest(F.size("ps") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        per_order.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("pa", "pb")
    )
    return k_core(pairs, k=3, src="pa", dst="pb").select(
        F.col("node").cast("long").alias("node"),
        F.col("core_degree").cast("long").alias("core_degree"),
    )

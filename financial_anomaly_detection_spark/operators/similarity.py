"""Similarity search over embedding columns (SURVEY.md §2.10).

Two tiers:
  * ``brute_force_topk`` — exact cosine top-k: broadcast query set ×
    candidate scan; dot products via JVM higher-order functions
    (no UDF, stays in codegen). The oracle-checkable baseline.
  * ``lsh_topk`` — BucketedRandomProjectionLSH (euclidean) bucketed
    approximate kNN: candidates come from matching hash buckets, so
    cost scales with bucket occupancy, not candidates².

On normalized vectors euclidean-NN order == cosine-NN order
(‖a−b‖² = 2 − 2·cos), which is why the LSH tier normalizes first.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectorfn import cosine_similarity


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector."""
    from ..functions.vectorfn import dot, l2_norm

    # Precompute each side's norm before the pair join — same sqrt on
    # the same dot product (bit-identical to per-pair norms), but O(n)
    # reductions instead of 2 per pair.
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"),
        l2_norm(vec_col).alias("_nq"),
    )
    from .partitioning import spread_narrow

    # The broadcast pair join's map side runs on the candidate scan's
    # partitioning — spread a single-file scan across cores first.
    cand = spread_narrow(candidates).select(
        F.col(id_col), F.col(vec_col), l2_norm(vec_col).alias("_nc")
    )
    denom = F.col("_nq") * F.col("_nc")
    pairs = cand.join(F.broadcast(q), F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.when(denom > 0, dot("_q", vec_col) / denom).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k (§2.10 scale path #2): a KMeans
    coarse quantizer assigns every candidate to one of ``nlist``
    centroid cells; each query searches only its ``nprobe`` nearest
    cells. Cost per query drops from O(N) to ~O(N·nprobe/nlist).

    The quantizer fit is distributed (MLlib KMeans); cell assignment is
    one ``transform``; the probe-cell restriction is a join on cell id —
    no UDFs anywhere, dot products via JVM higher-order functions.
    """
    from pyspark.ml.clustering import KMeans

    vec = array_to_vector(F.col(vec_col).cast("array<double>"))
    from .partitioning import spread_narrow

    cand = spread_narrow(candidates).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_e"), vec.alias("_v")
    )
    # Train the coarse quantizer on a bounded sample (the FAISS-style
    # IVF discipline: centroid quality saturates long before the full
    # corpus, and at 100 TB a full-corpus KMeans would dominate the
    # build). orderBy+limit plans as a distributed top-k
    # (TakeOrderedAndProject), so the training set is key-determined —
    # independent of file layout, partition count, and AQE — unlike a
    # bare limit(). Cell ASSIGNMENT still covers every candidate row.
    train = cand.orderBy("neighbor_id").limit(25_000).localCheckpoint(eager=True)
    km = KMeans(
        k=nlist, seed=seed, maxIter=10, featuresCol="_v", predictionCol="_cell"
    ).fit(train)
    cand_cells = km.transform(cand).select("neighbor_id", "_e", "_cell")

    # centroid table is tiny: nlist x d -> broadcast to rank probe cells
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())
    ]
    cent_df = queries.sparkSession.createDataFrame(
        centroids, f"_cell int, _centroid array<double>"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"))
    # rank cells per query by centroid distance, keep nprobe
    q_cells = (
        q.join(F.broadcast(cent_df))
        .withColumn(
            "_d2",
            F.aggregate(
                F.zip_with(
                    F.col("_q").cast("array<double>"),
                    "_centroid",
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "_cell_rank",
            F.row_number().over(Window.partitionBy("query_id").orderBy("_d2", "_cell")),
        )
        .filter(F.col("_cell_rank") <= nprobe)
        .select("query_id", "_q", "_cell")
    )
    pairs = q_cells.join(cand_cells, "_cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_similarity("_q", "_e").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via BRP-LSH over L2-normalized vectors.

    Returns (query_id, neighbor_id, cosine, rn) like brute_force_topk;
    recall < 1 by construction — tests compare against the exact tier.
    """
    from .partitioning import spread_narrow

    def prep(df: DataFrame, out_id: str) -> DataFrame:
        df = spread_narrow(df)
        vec = array_to_vector(F.col(vec_col).cast("array<double>"))
        with_vec = df.select(F.col(id_col).alias(out_id), vec.alias("_raw"))
        return Normalizer(inputCol="_raw", outputCol="_v", p=2.0).transform(with_vec)

    cand = prep(candidates, "neighbor_id")
    qs = prep(queries, "query_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v",
        outputCol="_h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(cand)
    # euclidean distance on unit vectors: d² = 2 − 2 cos  ⇒  cos = 1 − d²/2
    joined = model.approxSimilarityJoin(qs, cand, 2.0, distCol="_d")
    pairs = joined.filter(F.col("datasetA.query_id") != F.col("datasetB.neighbor_id")).select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.neighbor_id").alias("neighbor_id"),
        (F.lit(1.0) - F.col("_d") * F.col("_d") / F.lit(2.0)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)

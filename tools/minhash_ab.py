#!/usr/bin/env python
"""Round-13 ×10-geometry re-test of the MinHashLSH approxSimilarityJoin
skinny-pair rewrite (VERDICT r12 task 5).

r12 REJECTED the analogous rewrite for the LOF BRP join at sf0.1: the
id-only candidate join + re-attach + HOF distance was bit-identical
but slower, because Catalyst's interpreted higher-order functions box
every element while MLlib's distance is a tight primitive loop. The
open question was whether the trade inverts at a bigger geometry,
where the full-row shuffle (rows carry the vector + the hash array
through the explode-join-distinct) dominates.

Arms (interleaved in ONE session, identical prefix through the pinned
``model.transform`` frame):

  mllib  — the live operator: ``model.approxSimilarityJoin`` (explodes
           both sides' hash arrays, full-row join, full-row distinct,
           Scala keyDistance on the kept pairs)
  skinny — explode (id, table, hash) only; equi-join the 3-column
           entries with id_a < id_b; distinct on the id pair; re-attach
           each side's HashingTF index set (recomputed exactly:
           pmod(murmur3-seed-42(term), numFeatures) — the same hash
           HashingTF uses); exact Jaccard distance via
           array_intersect sizes.

Output equality (ids + distances) is asserted on ×1 before timing.
Usage: AB_REPS=3 python tools/minhash_ab.py [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.ml.feature import HashingTF, MinHashLSH  # noqa: E402
from pyspark.ml.functions import vector_to_array  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from financial_anomaly_detection_spark.operators.dedup import (  # noqa: E402
    minhash_near_dup_pairs,
    shingles_col,
)
from financial_anomaly_detection_spark.operators.partitioning import (  # noqa: E402
    spread_narrow,
)
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402
from financial_anomaly_detection_spark.sources.readers import load_table  # noqa: E402

N_FEATURES = 1 << 18
N_TABLES = 8
MAX_DIST = 0.5


def force(df):
    df.write.format("noop").mode("overwrite").save()


def release_pins(spark):
    try:
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(False)
    except Exception:
        pass


def skinny_pairs(df, id_col="doc_id", text_col="text", n=3, seed=42):
    base = spread_narrow(df).select(
        F.col(id_col).alias("_id"), shingles_col(text_col, n).alias("_sh")
    )
    tf = HashingTF(
        inputCol="_sh", outputCol="_vec", numFeatures=N_FEATURES, binary=True
    )
    vecs = tf.transform(base)
    mh = MinHashLSH(
        inputCol="_vec", outputCol="_hashes", numHashTables=N_TABLES, seed=seed
    )
    model = mh.fit(vecs)
    hashed = model.transform(vecs).localCheckpoint(eager=True)
    # skinny LSH entries: 3 longs/row instead of full rows with vector +
    # hash-array payloads (guide §2.3 "shuffle keys, not payloads")
    ent = (
        hashed.select("_id", F.posexplode("_hashes").alias("_t", "_hv"))
        .select("_id", "_t", vector_to_array("_hv").getItem(0).alias("_h"))
    )
    cand = (
        ent.alias("a")
        .join(
            ent.alias("b"),
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._h") == F.col("b._h"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    # exact HashingTF index set, recomputed in Catalyst: murmur3 seed 42
    # over the term bytes mod numFeatures — bit-identical to
    # HashingTF.indexOf, so the Jaccard below equals MLlib keyDistance
    idx = hashed.select(
        "_id",
        F.array_sort(
            F.array_distinct(
                F.transform(
                    "_sh", lambda t: F.pmod(F.hash(t), F.lit(N_FEATURES))
                )
            )
        ).alias("_ix"),
    )
    return (
        cand.join(idx.select(F.col("_id").alias("id_a"), F.col("_ix").alias("_ia")), "id_a")
        .join(idx.select(F.col("_id").alias("id_b"), F.col("_ix").alias("_ib")), "id_b")
        .withColumn("_common", F.size(F.array_intersect("_ia", "_ib")))
        .withColumn(
            "jaccard_distance",
            F.lit(1.0)
            - F.col("_common")
            / (F.size("_ia") + F.size("_ib") - F.col("_common")),
        )
        .filter(F.col("jaccard_distance") <= MAX_DIST)
        .select("id_a", "id_b", "jaccard_distance")
    )


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_drill"
    reps = int(os.environ.get("AB_REPS", "3"))
    spark = get_spark("minhash-ab")

    x10 = os.path.join(work, "x10")
    if not os.path.exists(os.path.join(x10, "documents.parquet")):
        from tools.scale_drill import replicate

        print("building x10 replicas...", flush=True)
        replicate(spark, x10, 10)

    # Correctness gate: candidate PAIR SETS must match on ×1. Distances
    # are compared loosely only — they CANNOT be made bit-identical in
    # pure Catalyst: ml.feature.HashingTF hashes strings with
    # Murmur3_x86_32.hashUnsafeBytes2 (spec-correct tail mixing) while
    # Catalyst's hash() expression uses the Block/hashUnsafeBytes
    # variant, so index sets differ on a few terms whose UTF-8 length
    # is not a multiple of 4 (observed: union sizes off by 1 on ~a few
    # of 256 pairs, distances differing in the 11th decimal). That
    # alone blocks ADOPTION as a drop-in (declared-query outputs must
    # stay bit-identical); the timing verdict below still decides
    # whether the shuffle-bytes trade would be worth a tier
    # reimplementation (which the md5 family already provides).
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs1 = load_table(spark, src, "documents")
    a = {
        (r["id_a"], r["id_b"], round(r["jaccard_distance"], 6))
        for r in minhash_near_dup_pairs(docs1).collect()
    }
    b = {
        (r["id_a"], r["id_b"], round(r["jaccard_distance"], 6))
        for r in skinny_pairs(docs1).collect()
    }
    release_pins(spark)
    ids_a = {(x, y) for x, y, _ in a}
    ids_b = {(x, y) for x, y, _ in b}
    print(f"x1: mllib={len(a)} skinny={len(b)} pair_sets_equal="
          f"{ids_a == ids_b} dist6_equal={a == b}", flush=True)
    if ids_a != ids_b:
        print("sample only-mllib:", list(ids_a - ids_b)[:3])
        print("sample only-skinny:", list(ids_b - ids_a)[:3])
        spark.stop()
        sys.exit(1)

    docs10 = load_table(spark, x10, "documents")
    arms = {
        "mllib": lambda: force(minhash_near_dup_pairs(docs10)),
        "skinny": lambda: force(skinny_pairs(docs10)),
    }
    for name, fn in arms.items():  # unmeasured warm-up
        fn()
        release_pins(spark)
    res = {n: [] for n in arms}
    for _ in range(reps):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"minhash_ab x10 {name}")
            t0 = time.perf_counter()
            fn()
            res[name].append(round(time.perf_counter() - t0, 3))
            release_pins(spark)
    for name, ts in res.items():
        print(f"x10 {name}: min={min(ts):.3f} times={ts}")
    pairs = list(zip(res["mllib"], res["skinny"]))
    print("paired (mllib, skinny):", pairs,
          "skinny_faster:", sum(1 for m, s in pairs if s < m), "/", len(pairs))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measured scale curves: how each operator family's wall-clock grows
with input size — the empirical check behind SCALING.md's designed-for
-100 TB claims.

Builds ×1/×3/×10 replicas of the sf0.1 testdata (BENCH-ONLY inputs:
correctness queries always run against the driver's own parquet) and
times representative operators at each size. Replication rules keep
the WORKLOAD honest rather than degenerate:

  * every replica gets a disjoint key space (id offsets), so group
    counts, join fan-outs, and graph components scale linearly the way
    organic growth would;
  * document text is word-tagged per replica (every word suffixed
    ``#r<i>``), so shingle/minhash/simhash spaces are disjoint across
    replicas — otherwise every doc would acquire k-1 verbatim twins
    and near-dup candidate pairs would grow k^2 BY CONSTRUCTION,
    measuring the replication artifact instead of the operator;
  * embeddings keep their values (distance kernels cost the same for
    any values) with offset ids.

Output: one JSON line per (query, scale) with seconds, then a compact
markdown table with the log-log slope between ×1 and ×10 — slope ~1.0
is linear scaling, ~2.0 quadratic. Intentionally-quadratic tiers
(exact ANN) are included as the contrast baseline.

Usage: python tools/scale_drill.py [workdir]  (default /tmp/scale_drill)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from financial_anomaly_detection_spark.queries import REGISTRY  # noqa: E402
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402
from financial_anomaly_detection_spark.sources.readers import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [1, 3, 10]
# SPARK_GRAFT_DRILL_SCALES="1,10,30" overrides (e.g. the round-12
# ×30 carry-of-carry confirmation for sorted_group_map callers)
_ENV_SCALES = os.environ.get("SPARK_GRAFT_DRILL_SCALES")
if _ENV_SCALES:
    SCALES = [int(s) for s in _ENV_SCALES.split(",") if s.strip()]
OFFSET = 10_000_000  # per-replica id offset: disjoint key spaces

# table -> (id columns to offset, text columns to word-tag)
REPLICATION = {
    "documents": (["doc_id"], ["text"]),
    "embeddings": (["vec_id"], []),
    "events": (["event_id", "user_id"], []),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], []),
    "part": (["p_partkey"], []),
    "orders": (["o_orderkey", "o_custkey"], []),
    "customer": (["c_custkey"], []),
}
COPY_TABLES = ["region", "nation", "supplier"]

DRILL = [
    # documents family
    "c4_quality_filters",
    "dedup_exact_docs",
    "minhash_near_dup",
    "simhash_near_dup",
    "near_dup_clusters",
    "pack_sequences_2048",
    "bm25_rational_topk",
    # events family
    "gini_user_diversity",
    "mad_robust_outliers",
    "chisq_type_drift",
    "rfm_segments",
    # graph / skyline
    "pagerank_part_supplier",
    "skyline_pareto_parts",
    # similarity: LSH tier vs the intentionally-quadratic exact tier
    "ann_lsh_topk",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_simhash_topk",
    # time / as-of family
    "asof_join_purchase_click",
    "asof_forward_click_purchase",
    "time_range_self_join",
    "sessionize_events",
    "funnel_conversion",
    "cohort_retention",
    "ewma_amounts",
    "rolling_zscore_events",
    # document pipeline composites
    "benchmark_contamination",
    "duplicate_chunks_across_docs",
    "curation_pipeline_e2e",
    "weighted_sample_docs",
    # ML scoring tiers (Arrow kernels + distributed LOF)
    "int8_quantize_embeddings",
    "ml_iforest_embeddings",
    "ml_lof_distributed",
]


# Focused runs: SPARK_GRAFT_DRILL_QUERIES="a,b,c" drills only those
# (registry names), reusing any replicas already built in the workdir.
_ENV_QUERIES = os.environ.get("SPARK_GRAFT_DRILL_QUERIES")
if _ENV_QUERIES:
    DRILL = [q.strip() for q in _ENV_QUERIES.split(",") if q.strip()]


def replicate(spark, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, (id_cols, text_cols) in REPLICATION.items():
        base = load_table(spark, SRC, name)
        parts = []
        for i in range(k):
            df = base
            for c in id_cols:
                df = df.withColumn(c, (F.col(c) + F.lit(i * OFFSET)).cast("long"))
            for c in text_cols:
                if i > 0:  # replica 0 keeps the original text
                    tag = F.lit(f"#r{i}")
                    df = df.withColumn(
                        c,
                        F.array_join(
                            F.transform(
                                F.split(F.col(c), r"\s+"), lambda w: F.concat(w, tag)
                            ),
                            " ",
                        ),
                    )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name in COPY_TABLES:
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copy(src, dst)


def force(df) -> int:
    return df.count()


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_drill"
    spark = get_spark("scale-drill")
    dirs = {}
    for k in SCALES:
        d = os.path.join(work, f"x{k}")
        marker = os.path.join(d, "_done")
        if not os.path.exists(marker):
            t0 = time.time()
            replicate(spark, d, k)
            open(marker, "w").write("ok")
            print(f"# built x{k} in {time.time() - t0:.1f}s", flush=True)
        dirs[k] = d

    results: dict[str, dict[int, float]] = {}
    for name in DRILL:
        results[name] = {}
        # Warmup at x1 BEFORE the measured loop: the first session
        # execution of a python-kernel plan pays codegen + Arrow +
        # worker-path cold cost (and any per-session model fit) that
        # is not the scaling behavior being drilled — observed r10:
        # an unwarmed x1 anchor of 76 s vs 12.3 s at x3 produced a
        # meaningless NEGATIVE slope.
        try:
            force(REGISTRY[name].fn(spark, dirs[SCALES[0]]))
        except Exception:
            pass
        for k in SCALES:
            t0 = time.time()
            try:
                n = force(REGISTRY[name].fn(spark, dirs[k]))
                sec = round(time.time() - t0, 2)
            except Exception as exc:  # keep the drill going
                n, sec = -1, -1.0
                print(f"# ERROR {name} x{k}: {exc}", flush=True)
            results[name][k] = sec
            print(json.dumps({"query": name, "scale": k, "sec": sec, "rows": n}), flush=True)

    lo, hi = SCALES[0], SCALES[-1]
    header = " | ".join(f"x{k}" for k in SCALES)
    print(f"\n| query | {header} | slope({lo}→{hi}) |")
    print("|---" * (len(SCALES) + 2) + "|")
    for name, r in results.items():
        if min(r.values()) <= 0:
            slope = "err"
        else:
            slope = f"{math.log(r[hi] / r[lo]) / math.log(hi / lo):.2f}"
        cells = " | ".join(str(r[k]) for k in SCALES)
        print(f"| {name} | {cells} | {slope} |")
    spark.stop()


if __name__ == "__main__":
    main()

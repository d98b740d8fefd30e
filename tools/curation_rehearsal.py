#!/usr/bin/env python
"""End-to-end scale rehearsal of the curation spine as ONE composed
plan (VERDICT r5 task 8): C4 quality gate -> exact dedup (keep-first)
-> prefix-filter near-dup dedup (the LOSSLESS blocking tier, not the
hash sample the registered curation_pipeline_e2e uses) -> 2048-token
sequence packing via the two-pass parallel prefix sum.

Runs the composition at x1 / x10 / x30 replicas of the sf0.1
documents table (same word-tagged replication discipline as
tools/scale_drill.py: replica words are suffixed so shingle spaces
stay disjoint and near-dup candidates don't grow k^2 by
construction), forces the final frame through the noop sink, and
records per-scale:

  * wall seconds;
  * physical stage count and total/peak shuffle read+write bytes,
    pulled from the Spark UI REST API for exactly the stages this
    run submitted;
  * output row count and a no-global-window assertion on the final
    plan (zero FULL-DATA single-partition funnels — scalar-agg
    reductions like the prefix scan's min/max bounds are benign and
    excluded; see plans/inspect.py).

Output: one JSON line per scale, then a markdown row block for
SCALING.md.

Usage: python tools/curation_rehearsal.py [workdir]
       (default /tmp/curation_rehearsal)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from financial_anomaly_detection_spark.operators.dedup import (  # noqa: E402
    prefix_filter_jaccard_pairs,
)
from financial_anomaly_detection_spark.plans.inspect import (  # noqa: E402
    single_partition_violations,
)
from financial_anomaly_detection_spark.operators.prefix import (  # noqa: E402
    ordered_prefix_sum,
)
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402
from financial_anomaly_detection_spark.sources.readers import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [1, 10, 30]
OFFSET = 10_000_000


_TAGS = "bcdefghijkmnopqrstuvwxyz23456789"  # 1-char replica tags


def replicate_documents(spark, out_dir: str, k: int) -> None:
    """Word-tagged replicas with TWO constraints the scale_drill rule
    doesn't need: the C4 gate downstream requires a literal 'the'/'a'
    stopword (so those stay untagged) and bounded letters-per-word
    (so the tag is ONE character, shifting the ratio by +1 instead of
    +3). Everything else is suffixed, keeping replica shingle spaces
    effectively disjoint so near-dup pairs don't grow k^2 by
    construction."""
    os.makedirs(out_dir, exist_ok=True)
    base = load_table(spark, SRC, "documents")
    parts = []
    for i in range(k):
        df = base.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * OFFSET)).cast("long")
        )
        if i > 0:
            tag = F.lit(_TAGS[(i - 1) % len(_TAGS)])
            df = df.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda w: F.when(w.isin("the", "a"), w).otherwise(
                            F.concat(w, tag)
                        ),
                    ),
                    " ",
                ),
            )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def composed_spine(spark, sf_dir: str):
    """The four stages as one lazy DataFrame program."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(words).cast("long")
    n_letters = F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
    top_count = F.array_max(
        F.transform(
            F.array_distinct(words),
            lambda u: F.size(F.filter(words, lambda x: x == u)),
        )
    ).cast("long")
    keep = (
        (n >= 20)
        & (F.array_contains(words, "the") | F.array_contains(words, "a"))
        & (top_count * 5 <= n)
        & (n_letters >= n * 3)
        & (n_letters <= n * 8)
    )
    gated = d.filter(keep).select("doc_id", "text", n.alias("n_tokens"))
    # exact dedup: keep-first by doc_id within identical text
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        gated.withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "text", "n_tokens")
    )
    # near-dup dedup: LOSSLESS prefix-filter Jaccard join; a matching
    # pair drops its larger doc_id
    pairs = prefix_filter_jaccard_pairs(
        deduped, "doc_id", "text", n=3, threshold=0.5
    )
    drops = pairs.select(
        F.greatest(F.col("id_a"), F.col("id_b")).alias("doc_id")
    ).distinct()
    survivors = deduped.join(drops, "doc_id", "left_anti").select(
        "doc_id", "n_tokens"
    )
    packed = ordered_prefix_sum(survivors, "doc_id", "n_tokens", out_col="tok_before")
    return packed.select(
        "doc_id", "n_tokens", F.expr("tok_before div 2048").alias("pack_id")
    )


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def stage_metrics(spark, after_stage_id: int):
    app = spark.sparkContext.applicationId
    stages = _rest(spark, f"applications/{app}/stages?status=complete")
    mine = [s for s in stages if s["stageId"] > after_stage_id]
    total_shuffle = sum(
        s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0) for s in mine
    )
    peak = max(
        (s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0) for s in mine),
        default=0,
    )
    return {
        "n_stages": len(mine),
        "shuffle_bytes_total": total_shuffle,
        "shuffle_bytes_peak_stage": peak,
    }


def last_stage_id(spark) -> int:
    app = spark.sparkContext.applicationId
    try:
        stages = _rest(spark, f"applications/{app}/stages")
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return -1


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/curation_rehearsal"
    spark = get_spark(
        "curation-rehearsal", extra_confs={"spark.ui.enabled": "true"}
    )
    rows = []
    for k in SCALES:
        d = os.path.join(work, f"x{k}")
        marker = os.path.join(d, "_done")
        if not os.path.exists(marker):
            t0 = time.time()
            replicate_documents(spark, d, k)
            open(marker, "w").write("ok")
            print(f"# built x{k} in {time.time() - t0:.1f}s", flush=True)

        # the prefix-sum/prefix-filter stages pin intermediates via
        # localCheckpoint during PLAN CONSTRUCTION — the timed window
        # must start before composed_spine() or most of the work is
        # invisible to it
        before = last_stage_id(spark)
        t0 = time.time()
        out = composed_spine(spark, d)
        out.write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        m = stage_metrics(spark, before)
        # formatted mode never prints "Exchange SinglePartition"
        # inline (the old count here was always 0, vacuously); the
        # inspect helper classifies each exchange in simple mode
        single = len(single_partition_violations(out))
        n = out.count()
        rec = {
            "scale": k,
            "sec": sec,
            "rows": n,
            "single_partition_funnels": single,
            **m,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n| scale | sec | rows | stages | shuffle total | peak stage | 1-part funnels |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        tot_mb = r["shuffle_bytes_total"] / 1e6
        peak_mb = r["shuffle_bytes_peak_stage"] / 1e6
        print(
            f"| x{r['scale']} | {r['sec']} | {r['rows']} | {r['n_stages']} "
            f"| {tot_mb:.1f} MB | {peak_mb:.1f} MB "
            f"| {r['single_partition_funnels']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()

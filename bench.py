#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs EVERY registered batch query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.

Output protocol (round 4): the driver's capture keeps the TAIL of
stdout, and round 3 lost its headline number because the single huge
JSON line got its head truncated. So the LAST line printed is now a
SHORT summary the driver can always parse::

    {"metric": "total_sec", "value": N, "unit": "sec",
     "headline_sec": H, "sf": 0.1, "n_queries": K, "queries": {...}}

with the short line's ``queries`` map containing ONLY the headline
set. The full per-query timing map is printed on its own JSON line
immediately before the summary AND written to ``BENCH_FULL.json``
next to this script.

Each query is forced end-to-end with the ``noop`` datasource sink
(full JVM-side computation, no collect-to-driver bottleneck, no
count()-only plan pruning). One warmup run of the first query pays
session/JIT startup so per-query numbers measure the plans.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from financial_anomaly_detection_spark.queries import REGISTRY  # noqa: E402
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402

# The round-1 headline set — kept first and summed separately as
# "headline_sec" so round-over-round totals stay comparable.
HEADLINE = [
    "rules_fusion_risk",
    "profile_join_deviation",
    "window_transform_profile",
    "asof_profile",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "percentile_thresholds",
    "dedup_exact_docs",
    "text_quality_stats",
    "ann_cosine_topk",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="fad-spark-bench", master=f"local[{cpus}]")

    # Headline set first (round-over-round comparability), then every
    # other registered query — full registry coverage so each operator
    # has a per-round perf trace.
    names = [n for n in HEADLINE if n in REGISTRY]
    names += [n for n in REGISTRY if n not in names]

    # Warmup: pay JVM/codegen startup outside the measured window.
    try:
        force(REGISTRY[names[0]].fn(spark, sf_dir))
    except Exception:
        pass

    # One failing query must not zero the whole round's bench (round 2
    # lost every number to a single AnalysisException): record the error
    # and keep timing the rest.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            force(REGISTRY[name].fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:300]

    headline = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "headline_sec": headline,
        "queries": timings,
        "sf": sf,
    }
    if errors:
        full["errors"] = errors
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    # full map first (head may be truncated by the capture), short
    # summary LAST so the tail parse always succeeds
    print(json.dumps(full))
    summary = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "headline_sec": headline,
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

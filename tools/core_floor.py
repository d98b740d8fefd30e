#!/usr/bin/env python
"""Round-13 core-count overhead probe (VERDICT r12 task 1).

Every r12 headline query ran FASTER on 8 cores than on 32 (driver
scaling ratios 0.56-0.78), i.e. the headline set is dominated by a
per-task / per-stage fixed cost that GROWS with the core count. This
tool isolates that floor: it times a small query set at the CURRENT
core count under several AQE partition-sizing variants (all plain
runtime SQL confs, togglable per run), so one session per core count
gives a full variant grid. Run it at SPARK_GRAFT_CPUS=8/16/32 and
compare.

Variants:
  base      — engine defaults (coalescePartitions.parallelismFirst on,
              i.e. AQE never coalesces below local parallelism)
  sized     — parallelismFirst=false (partitions follow
              advisoryPartitionSizeInBytes=64m, the documented
              production recommendation)
  sized16m  — parallelismFirst=false + advisory 16m (middle ground:
              keeps some parallelism for CPU-heavy-per-byte stages)

Usage:
    SPARK_GRAFT_CPUS=32 python tools/core_floor.py [--reps 3] [q ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_anomaly_detection_spark.queries import REGISTRY  # noqa: E402
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    # the three headline queries the r12 driver run inflated most at 32
    # cores (vs both its own 8-core run and the same-HEAD builder sweep)
    "rules_fusion_risk",
    "profile_join_deviation",
    "asof_profile",
    # one scan-bound control (the bench canary) and one mid-size agg
    "events_scan_filter_project",
    "q1_pricing_summary",
]

VARIANTS: dict[str, dict[str, str]] = {
    "base": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64MB",
    },
    "sized": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64MB",
    },
    "sized16m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16MB",
    },
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def release_pins(spark) -> None:
    try:
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(False)
    except Exception:
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"fad-core-floor-{cpus}")

    # warm everything once per variant is wasteful; one global warm pass
    # (codegen + page cache + worker pool) then per-variant timed reps.
    for name in names:
        try:
            force(REGISTRY[name].fn(spark, sf_dir))
        except Exception as e:
            print(f"warmup {name}: {type(e).__name__}: {e}", flush=True)
    release_pins(spark)

    results: dict[str, dict[str, dict]] = {}
    for vname, confs in VARIANTS.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one unmeasured pass per variant: the FIRST execution under a
        # new partition count re-derives AQE coalesce decisions and may
        # recompile codegen for new partition specs
        for name in names:
            try:
                force(REGISTRY[name].fn(spark, sf_dir))
            except Exception:
                pass
        release_pins(spark)
        for name in names:
            times = []
            for i in range(args.reps):
                spark.sparkContext.setJobDescription(
                    f"core_floor {vname} {name} #{i}"
                )
                t0 = time.perf_counter()
                force(REGISTRY[name].fn(spark, sf_dir))
                times.append(round(time.perf_counter() - t0, 3))
                release_pins(spark)
            results.setdefault(name, {})[vname] = {
                "min": min(times), "times": times,
            }
            print(f"cpus={cpus} {vname:9s} {name}: min={min(times):.3f} "
                  f"times={times}", flush=True)
    # restore engine defaults so a reused session isn't left mutated
    for k, v in VARIANTS["base"].items():
        spark.conf.set(k, v)

    print(json.dumps({"cpus": cpus, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-12 probe: confirm the multimodal_audio_features outlier is
worker-pool turnover (the r11 twin mechanism) and validate a /proc
based PID-set capture that costs no Spark job.

Protocol:
  1. warm the audio query, measure steady state (expect ~0.9 s at sf0.1)
  2. churn the python worker pool (distinct limit()-over-python stages
     retire their workers, per pydaemon.py's observed mechanism)
  3. re-measure audio with PID sets captured before/after each run

If the post-churn run is slow AND its PID set is disjoint from the
steady-state run's, the outlier is per-fresh-worker warm-up (codec
module pages + Arrow first-touch), not plan cost.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_anomaly_detection_spark.queries import REGISTRY  # noqa: E402
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402


def worker_pids() -> frozenset[int]:
    """Live python-worker PIDs: children of any pyspark daemon process,
    found by scanning /proc ppids. No Spark job — a probe that ran a
    job would itself warm/churn the pool it is measuring."""
    fam = {}  # pid -> ppid, over processes with the daemon cmdline
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read()
            with open(f"/proc/{d}/stat") as f:
                stat = f.read()
        except OSError:
            continue
        if b"pydaemon" not in cmd and b"pyspark.daemon" not in cmd:
            continue
        fam[int(d)] = int(stat.rsplit(")", 1)[1].split()[1])
    # forked workers inherit the daemon's cmdline, so the whole family
    # matches; the daemon is the root (its parent is the JVM, not in
    # fam) and workers are the members whose parent IS in fam
    return frozenset(p for p, pp in fam.items() if pp in fam)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-pool", master="local[32]")
    q = REGISTRY["multimodal_audio_features"].fn

    # steady state
    force(q(spark, sf_dir))
    a0 = worker_pids()
    t_steady = [timed(lambda: force(q(spark, sf_dir))) for _ in range(2)]
    a1 = worker_pids()
    print(f"steady: {t_steady} pool={len(a1)} kept={len(a0 & a1)}")

    # churn: distinct limit()-over-python stages retire workers
    import pandas as pd

    def churn_round(i):
        def k(batches, _i=i):
            for pdf in batches:
                pdf["v"] = pdf["id"] * _i
                yield pdf[["id"]]

        force(
            spark.range(200_000)
            .repartition(32)
            .mapInPandas(k, "id long")
            .limit(7)
        )

    for i in range(40):
        churn_round(i)
    b0 = worker_pids()
    print(f"after churn: pool={len(b0)} kept_vs_steady={len(a1 & b0)}")

    t_post = []
    sets = [b0]
    for _ in range(3):
        t_post.append(timed(lambda: force(q(spark, sf_dir))))
        sets.append(worker_pids())
    for i, t in enumerate(t_post):
        before, after = sets[i], sets[i + 1]
        print(
            f"post-churn run {i}: {t}s pool={len(after)} "
            f"kept={len(before & after)} new={len(after - before)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

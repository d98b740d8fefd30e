"""Profile aggregation + enrichment joins (SURVEY.md §2.3 J1-J3, §2.4 A1-A3).

The reference computes per-customer / per-merchant 90-day profiles
with N+1 per-record SQL point lookups (python_scoring/app.py:116-151
— 3-4 MySQL round-trips per transaction). The engine-native form is a
grouped aggregation over the history table joined back to the fact
rows — one shuffle for the aggregation, then a broadcast hash join
(the profile side is keys × a few columns; tiny relative to facts at
every scale, so it always broadcasts and never reshuffles the facts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.timefn import lookback_filter

# The reference serves COUNT(*)/90.0 as "frequency per day"
# (python_scoring/app.py:122).
PROFILE_WINDOW_DAYS = 90


def customer_profile(
    history: DataFrame,
    key: str = "customer_id",
    amount: str = "amount",
    ts: str = "timestamp",
    anchor: str | None = None,
    days: int = PROFILE_WINDOW_DAYS,
) -> DataFrame:
    """A1 — per-customer avg amount + per-day frequency over the
    lookback window (python_scoring/app.py:121-128).

    ``anchor=None`` reproduces the reference's ``NOW()`` semantics;
    tests pass a pinned anchor for determinism (W2).
    """
    if anchor is not None:
        history = history.filter(lookback_filter(ts, anchor, days))
    else:
        history = history.filter(
            F.col(ts) >= F.current_timestamp() - F.expr(f"INTERVAL {days} DAYS")
        )
    return history.groupBy(key).agg(
        F.avg(amount).alias("cust_avg_amount"),
        (F.count(F.lit(1)) / F.lit(float(days))).alias("cust_txn_count"),
    )


def merchant_profile(
    history: DataFrame,
    key: str = "merchant_id",
    amount: str = "amount",
    ts: str = "timestamp",
    anchor: str | None = None,
    days: int = PROFILE_WINDOW_DAYS,
) -> DataFrame:
    """A2 — per-merchant avg amount over the lookback window
    (python_scoring/app.py:131-137)."""
    if anchor is not None:
        history = history.filter(lookback_filter(ts, anchor, days))
    else:
        history = history.filter(
            F.col(ts) >= F.current_timestamp() - F.expr(f"INTERVAL {days} DAYS")
        )
    return history.groupBy(key).agg(F.avg(amount).alias("merch_avg_amount"))


def with_profiles(
    tx: DataFrame,
    cust_profile: DataFrame,
    merch_profile: DataFrame,
    cust_key: str = "customer_id",
    merch_key: str = "merchant_id",
    broadcast: bool = True,
) -> DataFrame:
    """J1 + J2 — left-join both profiles onto the fact rows, defaulting
    absent profiles to 0.0 (python_scoring/app.py:127-137 fallback).

    Profiles are broadcast by default: they are bounded by key
    cardinality, facts are not. At billions of customers the profile
    side can exceed executor/driver broadcast limits — pass
    ``broadcast=False`` to degrade to a shuffle (sort-merge) join and
    let AQE pick the strategy from runtime sizes.
    """
    cp = F.broadcast(cust_profile) if broadcast else cust_profile
    mp = F.broadcast(merch_profile) if broadcast else merch_profile
    out = tx.join(cp, on=cust_key, how="left").join(mp, on=merch_key, how="left")
    return out.na.fill(
        0.0, subset=["cust_avg_amount", "cust_txn_count", "merch_avg_amount"]
    )


def with_window_profiles(
    tx: DataFrame,
    cust_key: str = "customer_id",
    merch_key: str = "merchant_id",
    amount: str = "amount",
) -> DataFrame:
    """J3/A3 — the training path's pandas
    ``groupby(key)[amount].transform('mean'/'count')`` (train.py:47-53):
    every row annotated with its whole-group aggregate. Window form —
    one shuffle per partition key, no join."""
    cw = Window.partitionBy(cust_key)
    mw = Window.partitionBy(merch_key)
    return (
        tx.withColumn("cust_avg_amount", F.avg(amount).over(cw))
        .withColumn("cust_txn_count", F.count(F.lit(1)).over(cw).cast("double"))
        .withColumn("merch_avg_amount", F.avg(amount).over(mw))
    )


def salted_group_stats(
    df: DataFrame,
    key: str,
    amount: str,
    n_salt: int = 32,
    salt_src: str | None = None,
) -> DataFrame:
    """Two-phase salted (sum-cents, count) per key — the skew-safe form
    of the profile aggregation for pathological keys (one user holding
    a double-digit share of all events).

    Phase 1 groups by (key, salt) so a hot key's rows spread over
    ``n_salt`` reducers; phase 2 re-aggregates the bounded partials per
    key. Integer-cents partials compose exactly, so the result is
    bit-identical to the plain groupBy (tested), and ``avg = sum/n``
    derived from them is bit-identical to any other exact-sum path.

    Note Spark's partial hash aggregation already bounds reduce-side
    load for plain sum/count; the salt matters when partial agg is
    defeated (high-cardinality composite groupings, agg functions
    without map-side combine) — and the same agg+join-back shape is
    how a hot key escapes ``Window.partitionBy`` transforms, where ONE
    task otherwise absorbs the whole group (see
    ``with_window_profiles`` vs ``with_profiles``, SCALING.md skew
    drill).
    """
    salt = F.pmod(
        F.xxhash64(F.col(salt_src) if salt_src else F.col(amount)), F.lit(n_salt)
    )
    cents = F.floor(F.col(amount) * 100 + F.lit(0.5)).cast("long")
    return (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(cents).alias("_pc"), F.count(F.lit(1)).alias("_pn"))
        .groupBy(key)
        .agg(
            F.sum("_pc").alias("sum_cents"),
            F.sum("_pn").cast("long").alias("n_events"),
        )
    )


def profile_asof(
    tx: DataFrame,
    key: str = "customer_id",
    amount: str = "amount",
    ts: str = "timestamp",
    tiebreak: str | None = None,
) -> DataFrame:
    """The as-of / point-in-time profile (SURVEY.md §2.3 note): each
    row enriched with the running mean/count of *strictly earlier*
    events for the same key — the semantically correct generalization
    of the reference's NOW()-anchored lookup, and the leakage-free form
    for training-feature generation.

    Rows with no prior history default to 0.0 (same fallback as J1).
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return tx.withColumn(
        "prior_avg_amount", F.coalesce(F.avg(amount).over(w), F.lit(0.0))
    ).withColumn("prior_txn_count", F.count(F.lit(1)).over(w).cast("double"))

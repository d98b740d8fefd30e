"""Streaming split-conformal calibrator: a FIXED-WIDTH score histogram
per group held in stream state, from which the conformal threshold
(the ceil((n+1)*(1-alpha))-th smallest calibration score, Papadopoulos
et al. 2002) is re-read after every micro-batch — the streaming twin
of the batch ``conformal_split_threshold`` query.

Bounded state by construction (the property the MG / HLL / KMV
streaming sketches share): scores are bucketed onto a declared
``[lo, hi)`` range with ``n_buckets`` cells, so the state is one int64
array of ``n_buckets`` counts (+1 overflow cell for scores >= hi;
scores < lo clamp into cell 0) no matter how long the stream runs.
The threshold is therefore CONSERVATIVE at bucket granularity: the
emitted ``threshold_upper`` is the UPPER edge of the bucket holding
the order statistic, so the coverage guarantee
P(score <= threshold_upper) >= 1 - alpha still holds exactly (rounding
a threshold UP never loses coverage) — the honest price of bounded
state, and it vanishes when the score domain is integer and
``n_buckets`` >= its cardinality (then stream == batch EXACTLY, which
the parity test pins using the risk-score fixture's 0..11 domain).

Counts are additive and order-free, so the state is idempotent-safe
under micro-batch REPLAY only at the batch boundary Spark guarantees
(state checkpointing), and two half-stream histograms merge by
elementwise addition to the full histogram — both pinned in tests.
NULL scores are dropped (the batch SQL's NULL-comparison drop).
"""

from __future__ import annotations

from fractions import Fraction
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "counts array<long>"
_OUT_SCHEMA = (
    "grp string, n_cal long, q_rank long, threshold_bucket long, "
    "threshold_upper double"
)


def bucket_of(score: float, lo: float, hi: float, n_buckets: int) -> int:
    """Histogram cell for a score: [lo, hi) split into n_buckets, one
    overflow cell above, clamp-below into cell 0."""
    if score >= hi:
        return n_buckets
    if score < lo:
        return 0
    # Clamp: (score-lo)*n/(hi-lo) can round UP to n in float for scores
    # just below hi; the vectorized path np.clip's to n-1, match it.
    return min(int((score - lo) * n_buckets / (hi - lo)), n_buckets - 1)


def conformal_from_counts(
    counts: list[int], lo: float, hi: float, alpha: float = 0.1
) -> tuple[int, int, int, float]:
    """(n_cal, q_rank, threshold_bucket, threshold_upper) from a
    histogram state — the exact integer order-statistic rule on the
    bucket grid. Empty state -> threshold over the top (no coverage
    evidence yet): bucket = overflow, upper = +inf."""
    n_buckets = len(counts) - 1
    n = int(sum(counts))
    # ceil((n+1)*(1-alpha)) exact for ARBITRARY alpha: snap alpha to
    # the nearest small rational (it always is one — 0.1, 0.05, 0.15…)
    # and take the integer ceiling of (n+1)*(num/den). The previous
    # hardcoded /10 grid silently mis-ranked alpha=0.15 and sent
    # alpha=0.05 to rank n+1 (ADVICE r9).
    frac = Fraction(1, 1) - Fraction(alpha).limit_denominator(1_000_000)
    rank = -((-frac.numerator * (n + 1)) // frac.denominator)
    cum = 0
    for b, c in enumerate(counts):
        cum += int(c)
        if cum >= rank and n > 0:
            upper = (
                float("inf")
                if b >= n_buckets
                else lo + (b + 1) * (hi - lo) / n_buckets
            )
            return n, rank, b, upper
    return n, rank, n_buckets, float("inf")


def merge_counts(a: list[int], b: list[int]) -> list[int]:
    """Histogram union: elementwise addition."""
    return [int(x) + int(y) for x, y in zip(a, b)]


def stateful_conformal_threshold(
    stream: DataFrame,
    group_col: str,
    score_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 64,
    alpha: float = 0.1,
) -> DataFrame:
    """Per-group streaming conformal calibrator: histogram state of
    calibration scores, threshold re-read per micro-batch
    (outputMode=update)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        counts = (
            list(state.get[0]) if state.exists else [0] * (n_buckets + 1)
        )
        for pdf in pdfs:
            s = pdf[score_col].dropna().to_numpy(dtype="float64")
            if len(s):
                b = np.where(
                    s >= hi,
                    n_buckets,
                    np.clip(
                        ((s - lo) * n_buckets / (hi - lo)).astype("int64"),
                        0,
                        n_buckets - 1,
                    ),
                )
                for cell, c in zip(*np.unique(b, return_counts=True)):
                    counts[int(cell)] += int(c)
        state.update((counts,))
        n, rank, tb, upper = conformal_from_counts(counts, lo, hi, alpha)
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "n_cal": [n],
                "q_rank": [rank],
                "threshold_bucket": [tb],
                "threshold_upper": [upper],
            }
        )

    return stream.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Streaming bottom-k (KMV) distinct sketch: the k smallest distinct
md5 hash values per group held in stream state — the streaming twin of
the batch ``kmv_set_cardinality`` query (Bar-Yossef et al. 2002), with
the SAME hash math (h = first 8 md5 hex chars of str(key)), so the
streamed state is EXACTLY the batch bottom-k at every point.

Why this sketch next to the HLL one (streaming/cardinality.py): KMV
composes under SET ALGEBRA — the union of two groups' sketches is the
bottom-k of their merged hash sets, which gives |A∪B| directly and
|A∩B| by inclusion-exclusion, the thing HLL registers cannot do.

State per group: at most k int64 hashes — constant in stream length.
The "min-k of distinct" operation is commutative and idempotent:
order-free and replay-safe under at-least-once delivery, and two
half-stream states merge (by set-union then re-truncate) to exactly
the full-stream state — pinned in tests by merging half-streams.

Estimator, verbatim from the batch query: fewer than k distinct keys
seen -> the state IS the distinct set, est = len(state) (the standard
KMV degradation rule); else est = (k-1) * 2^32 // h_(k).

NULL keys are dropped, matching md5(NULL) IS NULL in the batch SQL
(same contract as the HLL twin).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KMV_K = 32

_STATE_SCHEMA = "hashes array<long>"
_OUT_SCHEMA = "grp string, hashes array<long>, est long"


def kmv_hash(key: str) -> int:
    """First 8 md5 hex chars as int — bit-identical to the batch SQL
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::BIGINT``."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def kmv_estimate(hashes: list[int], k: int = KMV_K) -> int:
    """Distinct-count estimate from a bottom-k state (ASC-sorted)."""
    if len(hashes) < k:
        return len(hashes)
    if hashes[k - 1] == 0:
        # Degenerate k-th order statistic of 0 (only reachable at k=1
        # with the all-zero md5 prefix): the division is undefined and
        # the sketch carries no spacing information — fall back to the
        # exact count of what we hold (ADVICE r9).
        return len(hashes)
    return (k - 1) * 4294967296 // hashes[k - 1]


def merge_states(a: list[int], b: list[int], k: int = KMV_K) -> list[int]:
    """Union sketch: bottom-k of the merged distinct hash sets."""
    return sorted(set(a) | set(b))[:k]


def stateful_bottomk(
    stream: DataFrame, group_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group streaming bottom-k: emits the full ASC-sorted state
    and the KMV estimate after each micro-batch (outputMode=update)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            for kk in pdf[key_col].dropna().astype(str):
                cur.add(kmv_hash(kk))
        bottom = sorted(cur)[:k]
        state.update((bottom,))
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "hashes": [bottom],
                "est": [kmv_estimate(bottom, k)],
            }
        )

    return stream.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

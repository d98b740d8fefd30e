"""Stateful streaming heavy hitters: a Misra-Gries summary held in
stream state (SURVEY.md §2.10 frequency-sketch family, the streaming
twin of the batch Count-Min tier in ``operators/sketches.py``).

Misra & Gries 1982 ("Finding repeated elements"): maintain at most
``k`` counters; an arriving item increments its counter, claims a free
slot, or — when all ``k`` slots are full of OTHER items — decrements
every counter (conceptually canceling one occurrence of each tracked
item against the new one), evicting zeros. The guarantees this buys,
both machine-checked in tests/test_streaming.py:

* every item with true frequency > n/(k+1) IS in the summary (no
  false negatives for heavy hitters), and
* each kept counter underestimates its item's true count by at most
  n/(k+1).

State shape: the summary serializes to parallel item/count arrays in
the state store — O(k) per group, CONSTANT in stream length, which is
the whole point at 100 TB/day: exact per-item counts need unbounded
state, the MG summary needs k slots. Grouping key = whatever column
partitions the monitoring question (here event/channel families);
each group's summary is independent, so the operator scales by adding
groups, never by growing state.

The merge step is batch-ASSOCIATIVE (process each micro-batch's local
counts into the running summary with the same decrement rule), so
results are deterministic for a given batch sequence.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_MG_STATE_SCHEMA = "items array<string>, counts array<long>, n long"
_MG_OUT_SCHEMA = (
    "grp string, item string, mg_count long, n_total long, floor_bound long"
)


def mg_update(summary: dict[str, int], item: str, weight: int, k: int) -> None:
    """One Misra-Gries arrival (in place). ``weight`` folds repeated
    arrivals in a batch: increments are exact; the all-full decrement
    subtracts the largest cancelable amount in one step instead of
    looping per occurrence."""
    if item in summary:
        summary[item] += weight
        return
    if len(summary) < k:
        summary[item] = weight
        return
    dec = min(weight, min(summary.values()))
    for key in list(summary):
        summary[key] -= dec
        if summary[key] <= 0:
            del summary[key]
    rem = weight - dec
    if rem > 0 and len(summary) < k:
        summary[item] = rem


def stateful_heavy_hitters(
    stream: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 8,
) -> DataFrame:
    """Per-group streaming Misra-Gries heavy hitters with O(k) state.

    Emits the full summary for every group touched by a micro-batch
    (outputMode=update): (grp, item, mg_count, n_total, floor_bound)
    where ``floor_bound`` = n_total // (k+1) — any item whose TRUE
    count exceeds it is guaranteed present, and mg_count >=
    true_count - floor_bound.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n = state.get
            summary = dict(zip(list(items), [int(c) for c in counts]))
            n = int(n)
        else:
            summary, n = {}, 0
        for pdf in pdfs:
            # fold the batch to local exact counts first — fewer MG
            # steps and a deterministic (sorted) arrival order
            local = pdf[item_col].value_counts()
            n += int(local.sum())
            for item in sorted(local.index):
                mg_update(summary, str(item), int(local[item]), k)
        state.update((list(summary.keys()), list(summary.values()), n))
        bound = n // (k + 1)
        items_sorted = sorted(summary)
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(items_sorted),
                "item": items_sorted,
                "mg_count": [summary[i] for i in items_sorted],
                "n_total": [n] * len(items_sorted),
                "floor_bound": [bound] * len(items_sorted),
            }
        )

    return stream.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=_MG_OUT_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

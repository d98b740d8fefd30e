"""Streaming data-drift monitor (chi-square channel-mix screen).

The reference's scoring service applies STATIC thresholds tuned
offline (python_scoring/app.py:22-24) with nothing watching whether
the live traffic still looks like the tuning window — the standard
production companion is a drift monitor beside the scorer. This is
the streaming twin of the batch ``chisq_type_drift`` query
(queries.py): a reference channel-mix histogram is captured offline,
and the live stream maintains running per-channel counts whose
chi-square distance from the reference is re-emitted every
micro-batch.

Decomposition (the part that matters at scale):

  * per-channel running counts via ``applyInPandasWithState`` keyed on
    the CHANNEL — state is O(channels), each event is processed once,
    and the stateful operator is as parallel as the channel
    cardinality (the heavy per-event work happens before the shuffle,
    map-side);
  * the chi-square statistic itself touches only the O(channels)-row
    count table, composed in the ``foreachBatch`` sink — deliberately
    tiny, never a per-event computation.

The statistic uses the same fixed-shape arithmetic as the batch
query: expected = ref_share * cur_total computed in doubles over
exact integer counts, per-cell contributions quantized to 1e-6 units
before summing, so stream and batch agree bit-for-bit on the same
counts (asserted by tests/test_streaming.py).
"""

from __future__ import annotations

import math
from typing import Callable, Iterator, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_COUNT_STATE_SCHEMA = "cnt long"
_COUNT_OUT_SCHEMA = "channel string, cur_count long"


def stateful_channel_counts(
    tx_stream: DataFrame, channel_col: str = "channel"
) -> DataFrame:
    """Running per-channel event counts over the life of the stream.

    Emits the updated (channel, cur_count) row for every channel seen
    in each micro-batch (outputMode=update).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt = state.get[0] if state.exists else 0
        for pdf in pdfs:
            cnt += int(len(pdf))
        state.update((cnt,))
        yield pd.DataFrame({"channel": [key[0]], "cur_count": [cnt]})

    return tx_stream.groupBy(channel_col).applyInPandasWithState(
        update,
        outputStructType=_COUNT_OUT_SCHEMA,
        stateStructType=_COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def chisq_quantized(ref_counts: Mapping[str, int], cur_counts: Mapping[str, int]) -> int:
    """Chi-square (micro-units) between a reference histogram and the
    current counts, with expected frequencies from the reference MIX
    scaled to the current total.

    Same quantize-then-sum discipline as the batch query: each cell's
    contribution is floored to integer 1e-6 units before accumulation,
    so the result is independent of iteration order and bit-identical
    to any engine computing the same formula over the same counts.
    Channels absent from the reference are ignored (no expected
    frequency exists); channels absent from the stream contribute
    their full expected count.
    """
    ref_total = sum(ref_counts.values())
    cur_total = sum(cur_counts.get(c, 0) for c in ref_counts)
    if ref_total == 0 or cur_total == 0:
        return 0
    total_u = 0
    for ch in sorted(ref_counts):
        expected = float(ref_counts[ch]) * float(cur_total) / float(ref_total)
        dev = float(cur_counts.get(ch, 0)) - expected
        total_u += int(math.floor(dev * dev / expected * 1000000.0 + 0.5))
    return total_u


def drift_sink(
    ref_counts: Mapping[str, int],
    on_result: Callable[[int, int], None],
    state_dir: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: fold the micro-batch's updated channel counts
    into the running table and report chisq_quantized per batch.

    ``on_result(batch_id, chisq_u)`` receives the statistic — wire it
    to a metrics sink, an alert, or a results table. State kept here is
    O(channels); the per-event work already happened upstream.

    Restart safety: the upstream ``applyInPandasWithState`` counts
    survive a restart via the stream checkpoint, but outputMode=update
    only re-emits channels SEEN in each batch — so a freshly
    constructed sink would silently treat every not-yet-re-emitted
    channel as count 0 until it next appears. Pass ``state_dir`` (any
    driver-local path, e.g. beside the stream checkpoint) and the sink
    snapshots the O(channels) running table per batch (atomic
    write-then-rename) and rehydrates it on construction, making the
    statistic correct from the first post-restart batch. Folding is
    idempotent (counts REPLACE, never add), so an at-least-once batch
    replay re-snapshots the same values. Without ``state_dir`` the
    sink is single-run only: correct until the first restart.
    """
    import json
    import os

    running: dict[str, int] = {}
    snap_path = os.path.join(state_dir, "drift_counts.json") if state_dir else None
    if snap_path and os.path.exists(snap_path):
        with open(snap_path) as fh:
            running.update({k: int(v) for k, v in json.load(fh)["counts"].items()})

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.collect():  # O(channels) rows by construction
            running[row["channel"]] = row["cur_count"]
        if snap_path:
            os.makedirs(state_dir, exist_ok=True)
            tmp = f"{snap_path}.tmp.{batch_id}"
            with open(tmp, "w") as fh:
                json.dump({"batch_id": batch_id, "counts": running}, fh)
            os.replace(tmp, snap_path)
        on_result(batch_id, chisq_quantized(ref_counts, running))

    return handle

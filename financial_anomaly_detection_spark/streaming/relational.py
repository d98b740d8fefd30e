"""Streaming relational operators: ingestion dedup + stream-stream joins.

The reference ingests each transaction exactly once because HTTP gives
it request-level idempotency (python_scoring/app.py:239-267 — one row
per POST, the DB insert is the dedup point). A streaming engine gets
at-least-once delivery from real sources, so exactly-once *semantics*
must come from the plan: watermarked drop-duplicates on the record key.

The stream-stream interval join is the streaming form of the batch
as-of/range join (operators/rangejoin.py): match each purchase with the
same user's clicks in a bounded look-back window. Both sides carry
watermarks so Spark can bound the join state and evict rows that can no
longer match — unbounded state is the classic stream-join scale killer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    tx_stream: DataFrame,
    keys: list[str] | None = None,
    ts: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Exactly-once ingestion dedup (W7 extension).

    ``dropDuplicatesWithinWatermark`` keeps state only until the
    watermark passes each key's event time — O(keys within the
    watermark horizon) state, versus unbounded state for a plain
    ``dropDuplicates`` on a stream. Duplicates delivered within the
    horizon (the at-least-once redelivery case) are suppressed; a
    duplicate arriving later than the watermark would also be *dropped*
    as late data, so the output is exactly-once for any source whose
    redelivery lag is under the horizon.
    """
    keys = keys or ["transaction_id"]
    return tx_stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_purchase_click(
    purchases: DataFrame,
    clicks: DataFrame,
    user: str = "user_id",
    p_ts: str = "p_ts",
    c_ts: str = "c_ts",
    watermark: str = "1 hour",
    lookback: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join (W5/J-tier extension).

    Each purchase joins the same user's clicks from the preceding
    ``lookback`` interval. The two watermarks + the time-range
    predicate let Spark compute a state eviction bound on BOTH sides
    (clicks older than watermark+lookback can never match a future
    purchase), so state stays bounded at any throughput — the property
    that makes this runnable continuously at 100 TB/day.

    ``how='leftOuter'`` emits purchase-with-no-click rows once the
    watermark proves no match can arrive (outer results are delayed by
    the watermark, the documented Spark semantic).
    """
    p = purchases.withWatermark(p_ts, watermark)
    c = clicks.withWatermark(c_ts, watermark).withColumnRenamed(user, f"c_{user}")
    cond = (
        (p[user] == F.col(f"c_{user}"))
        & (F.col(c_ts) <= p[p_ts])
        & (F.col(c_ts) >= p[p_ts] - F.expr(f"INTERVAL {lookback}"))
    )
    return p.join(c, cond, how)

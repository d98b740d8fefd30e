"""Python DataSource API (Spark 4): deterministic transaction generator.

The reference's only load path is CSV/JSON files plus a MySQL table
(docker-compose.yml; python_scoring/train.py:16-20). For scale testing
and backfills an engine also wants a SOURCE that manufactures data
in-executor — no input files, no driver bottleneck — which Spark 4's
Python DataSource API expresses directly: the driver hands each
executor an InputPartition descriptor, and rows are generated inside
the scan, fully parallel and pruned/filtered by Catalyst like any scan.

Determinism discipline: every field derives from md5(seed, row_id)
integer math — same options → same rows, independent of partitioning,
scheduling, or retries (a retried task regenerates identical rows, so
the source is safe under speculative execution). No RNG state.

Usage::

    from financial_anomaly_detection_spark.sources.pysource import (
        SyntheticTransactions,
    )
    spark.dataSource.register(SyntheticTransactions)
    df = (spark.read.format("fad_synth")
          .option("rows", 100000).option("partitions", 32)
          .option("seed", 7).load())

At 100 TB: ``rows`` per partition is bounded by the option split, so
1000 executors each synthesize their slice; nothing is collected or
broadcast beyond the partition descriptors.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_CHANNELS = ["card", "pos", "mobile_money", "bank_transfer"]
_LOCATIONS = ["Harare", "Bulawayo", "Mutare", "Victoria Falls", "Marondera", "Gweru"]

_SCHEMA = (
    "transaction_id string, customer_id string, merchant_id string, "
    "amount double, channel string, location string, timestamp string"
)


def _h(seed: int, row: int, field: str) -> int:
    """64-bit integer draw: md5 over (seed, row, field) — the same
    engine-portable hash discipline as the query layer."""
    d = hashlib.md5(f"{seed}:{row}:{field}".encode()).hexdigest()
    return int(d[:16], 16)


def synth_row(seed: int, i: int) -> tuple:
    amount_cents = _h(seed, i, "amount") % 2_000_00  # 0 .. 1999.99
    day = _h(seed, i, "day") % 28 + 1
    hour = _h(seed, i, "hour") % 24
    minute = _h(seed, i, "min") % 60
    return (
        str(i),
        str(_h(seed, i, "cust") % 1000),
        str(_h(seed, i, "merch") % 200),
        amount_cents / 100.0,
        _CHANNELS[_h(seed, i, "chan") % len(_CHANNELS)],
        _LOCATIONS[_h(seed, i, "loc") % len(_LOCATIONS)],
        f"2024-01-{day:02d}T{hour:02d}:{minute:02d}:00",
    )


@dataclass
class _Slice(InputPartition):
    start: int
    end: int
    seed: int


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.nparts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.rows // self.nparts)  # ceil
        return [
            _Slice(lo, min(lo + per, self.rows), self.seed)
            for lo in range(0, self.rows, per)
        ]

    def read(self, part: _Slice) -> Iterator[tuple]:
        for i in range(part.start, part.end):
            yield synth_row(part.seed, i)


class SyntheticTransactions(DataSource):
    """``format("fad_synth")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "fad_synth"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _Reader:
        return _Reader(self.options)

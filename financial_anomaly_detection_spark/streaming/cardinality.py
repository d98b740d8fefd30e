"""Streaming distinct-count sketch: HyperLogLog registers held in
stream state (Flajolet 2007), the streaming twin of the batch
``hll_exact_md5`` query — SAME md5-derived hashes, SAME register
math, so the streamed state is EXACTLY the batch registers at every
point (register max is commutative and idempotent: order-free,
replay-safe under at-least-once delivery).

State per group: m=64 long registers — constant however many
distinct keys flow through, which is the whole point (exact distinct
needs per-key state). Registers are mergeable by elementwise max, so
per-group summaries roll up across groups/partitions/streams without
touching the data again (the property the weekly-rollup batch query
exercises; pinned here in tests by merging two half-streams).

The raw integer estimator mirrors the batch surrogate verbatim:
z_scaled = sum 2^(27-reg); est = 709*4096*2^27 div (1000*z_scaled) —
the documented no-linear-counting scope.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HLL_M = 64
_SUFFIX_BITS = 26

_HLL_STATE_SCHEMA = "registers array<long>"
_HLL_OUT_SCHEMA = "grp string, registers array<long>, est long"


def hll_j_rho(key: str) -> tuple[int, int]:
    """(register index, rho) for a key — bit-identical to the batch
    query's SQL: h = first 8 md5 hex chars, j = top 6 bits, rho =
    1 + leading zeros of the low 26 bits (27 when all zero)."""
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    low = h & ((1 << _SUFFIX_BITS) - 1)
    rho = 27 if low == 0 else (_SUFFIX_BITS + 1 - low.bit_length())
    return h >> _SUFFIX_BITS, rho


def hll_estimate(registers: list[int]) -> int:
    """Integer raw estimator, verbatim from the batch surrogate."""
    z_scaled = sum(1 << (27 - r) for r in registers)
    return (709 * 4096 * 134217728) // (1000 * z_scaled)


def merge_registers(a: list[int], b: list[int]) -> list[int]:
    """Mergeable-summary union: elementwise max."""
    return [max(x, y) for x, y in zip(a, b)]


def stateful_hll_registers(
    stream: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Per-group streaming HLL: emits the full 64-register state and
    the integer estimate after each micro-batch (outputMode=update)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        regs = list(state.get[0]) if state.exists else [0] * HLL_M
        for pdf in pdfs:
            # NULL keys are dropped, matching the batch query exactly:
            # md5(NULL) is NULL in SQL, so a null key never touches a
            # register there — astype(str) alone would fold nulls into
            # the literal 'None' and break the register parity.
            for k in pdf[key_col].dropna().astype(str):
                j, rho = hll_j_rho(k)
                if rho > regs[j]:
                    regs[j] = rho
        state.update((regs,))
        yield pd.DataFrame(
            {"grp": [key[0]], "registers": [regs], "est": [hll_estimate(regs)]}
        )

    return stream.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=_HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

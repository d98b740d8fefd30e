"""Python UDTF tier (operators/udtf_ops.py) — exact agreement with the
Catalyst chunker, the PQ-encoder dual-tier discipline."""

from __future__ import annotations

import pytest

from financial_anomaly_detection_spark.operators.textops import chunk_text
from financial_anomaly_detection_spark.operators.udtf_ops import chunk_text_udtf


def _rows(df):
    return sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        for r in df.collect()
    )


def test_udtf_chunker_matches_catalyst_chunker(spark, sf_dir):
    from financial_anomaly_detection_spark.queries import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    want = _rows(chunk_text(docs, chunk_tokens=16, overlap=4))
    got = _rows(chunk_text_udtf(docs, chunk_tokens=16, overlap=4))
    assert got == want
    assert len(got) > docs.count()  # multi-chunk docs exist


def test_udtf_chunker_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, " ".join(f"w{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    want = _rows(chunk_text(df, chunk_tokens=8, overlap=2))
    got = _rows(chunk_text_udtf(df, chunk_tokens=8, overlap=2))
    assert got == want
    # the Spark empty-split edge: one empty token, one chunk
    assert (1, 0, "", 1) in got


def test_udtf_chunker_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_text_udtf(df, chunk_tokens=4, overlap=4)

"""North-star extension tests (§2.10): recall of the approximate
dedup/similarity tiers against their exact oracle-checked twins, and
the multimodal plumbing's schema/batch contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_anomaly_detection_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from financial_anomaly_detection_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from financial_anomaly_detection_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def exact_pairs(docs):
    got = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    return {(r["id_a"], r["id_b"]) for r in got}


def test_exact_jaccard_finds_planted_near_dups(exact_pairs):
    # the driver testdata plants near-duplicate documents
    assert len(exact_pairs) > 0


def test_minhash_recall_vs_exact(docs, exact_pairs):
    approx = minhash_near_dup_pairs(
        docs, "doc_id", "text", num_hash_tables=8, max_jaccard_distance=0.5
    ).collect()
    approx_pairs = {(r["id_a"], r["id_b"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"minhash recall {recall}: {exact_pairs - approx_pairs}"


def test_simhash_flags_planted_near_dups(docs, exact_pairs):
    sim = simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=10).collect()
    sim_pairs = {(r["id_a"], r["id_b"]) for r in sim}
    # simhash is coarser than shingle jaccard; require it to catch the
    # strongest duplicates (J >= 0.9)
    strong = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.9).collect()
    }
    if strong:
        recall = len(strong & sim_pairs) / len(strong)
        assert recall >= 0.8, f"simhash missed strong dups: {strong - sim_pairs}"


def test_exact_dedup_keeps_one_per_group(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")], "id long, text string"
    )
    out = exact_dedup(df, ["text"], "id").collect()
    assert {(r["id"], r["text"]) for r in out} == {(1, "same text"), (3, "other text")}


def test_lsh_topk_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, qs, "vec_id", "embedding", k=10).collect()
    approx = lsh_topk(emb, qs, "vec_id", "embedding", k=10, num_hash_tables=6).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_multimodal_decode_contract(spark, sf_dir):
    from financial_anomaly_detection_spark.operators.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        attach_fake_payload,
        decode_image_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_fake_payload(docs)
    assert media.schema["payload"].dataType.simpleString() == "binary"
    feats = decode_image_features(media)
    assert feats.schema == IMAGE_FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["decoder"] in ("pil", "stub")
    assert len(r["feature_vec"]) == 16
    # deterministic: same payload -> same features
    again = decode_image_features(media).collect()
    assert sorted(map(repr, rows)) == sorted(map(repr, again))

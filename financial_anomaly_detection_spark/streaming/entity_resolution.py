"""Streaming entity resolution: record-at-a-time fuzzy identity lookup
against a batch-built canonical map (SURVEY.md §2.10 record-linkage,
the serving-path twin of the batch ``entity_resolution_e2e`` query).

The reference's serving path scores one record per request
(api/app.py:91-265); its engine analog here resolves each INCOMING
record against the entity clusters the batch pipeline curated:

* **batch** (``build_canonical_index``): FastSS ed1 deletion-
  neighborhood blocking (Bocek 2007) -> exact levenshtein verify ->
  connected components over the match graph (operators/graph.py) ->
  one canonical id (min name) per cluster. The published index is the
  VARIANT-level lookup table ``(variant, name, canonical)`` — every
  known name's deletion neighborhood, pre-joined to its canonical id.
* **stream** (``resolve_names``): each micro-batch explodes the
  incoming names into THEIR deletion neighborhoods and equi-joins the
  broadcast variant index — the stream-static broadcast-join shape of
  ``streaming/score_stream.py`` (stream side unbounded, static side a
  curated dimension). Exact levenshtein <= 1 verifies candidates;
  min(canonical) breaks ties when a new name bridges two clusters;
  unmatched names resolve to themselves (matched=false), mirroring
  the batch singleton-passthrough.

Scale shape: the static index is O(sum |name|) short-string rows — a
dimension table, broadcast-able at any corpus size where entity
resolution is meaningful (the CLUSTER CATALOG is small even when the
event stream is 100 TB). If the catalog itself outgrows broadcast,
the same plan runs as a shuffled stream-static equi-join on
``variant`` — no code change, drop the hint.

Stream == batch parity is pinned in tests/test_streaming.py: a known
name resolves to exactly the canonical the batch CC assigned it, an
unseen ed1 typo resolves into the right cluster, and a novel name
passes through as its own canonical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deletion_variants(df: DataFrame, name_col: str) -> DataFrame:
    """FastSS ed1 blocking keys: the string itself + every
    single-character deletion, one ``(name_col, variant)`` row each.

    Two strings within edit distance 1 ALWAYS share a variant
    (substitutions meet at the deletion of the differing position,
    insert/delete pairs at the shorter string) — losslessness is
    machine-checked by fuzzy_name_pairs_ed1's all-pairs oracle.
    """
    return df.select(
        "*",
        F.explode(
            F.array_union(
                F.array(F.col(name_col)),
                F.expr(
                    f"transform(sequence(1, length({name_col})), "
                    f"i -> concat(substr({name_col}, 1, i - 1), "
                    f"substr({name_col}, i + 1)))"
                ),
            )
        ).alias("variant"),
    )


def build_canonical_index(names: DataFrame, name_col: str = "name") -> DataFrame:
    """Batch leg: cluster the known names and publish the variant-level
    lookup index ``(variant, name, canonical)``.

    Same chain as the oracle-proven entity_resolution_e2e query:
    FastSS candidates -> levenshtein verify -> connected components ->
    min-name canonical, singletons canonical to themselves.
    """
    from ..operators.graph import connected_components

    names = names.select(F.col(name_col).alias("name")).distinct()
    variants = deletion_variants(names, "name")
    pairs = (
        variants.alias("a")
        .join(
            variants.alias("b"),
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
        .filter(F.levenshtein("name_a", "name_b") <= 1)
    )
    cc = connected_components(
        pairs, src="name_a", dst="name_b",
        out_vertex="name", out_col="canonical", max_iter=40,
    )
    resolved = names.join(cc, "name", "left").select(
        "name", F.coalesce("canonical", F.col("name")).alias("canonical")
    )
    return deletion_variants(resolved, "name").select(
        "variant", "name", "canonical"
    )


def resolve_names(
    batch_df: DataFrame,
    variant_index: DataFrame,
    name_col: str = "name",
) -> DataFrame:
    """Stream leg: resolve one micro-batch of records against the
    broadcast variant index.

    Works identically on a static frame (stream == batch parity) and
    inside ``foreachBatch``. Output: the input columns plus
    ``canonical`` (min canonical over verified ed1 matches, else the
    record's own name) and ``matched``.
    """
    probe = deletion_variants(
        batch_df.select(F.col(name_col)).distinct(), name_col
    )
    hits = (
        probe.join(
            F.broadcast(variant_index).withColumnRenamed("name", "_known"),
            "variant",
        )
        .filter(F.levenshtein(F.col(name_col), F.col("_known")) <= 1)
        .groupBy(name_col)
        .agg(F.min("canonical").alias("_canon"))
    )
    return (
        batch_df.join(F.broadcast(hits), name_col, "left")
        .select(
            "*",
            F.coalesce(F.col("_canon"), F.col(name_col)).alias("canonical"),
            F.col("_canon").isNotNull().alias("matched"),
        )
        .drop("_canon")
    )

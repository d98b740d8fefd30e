"""Iterative graph operators (SURVEY.md §2.10 pipeline extensions).

The reference ships no graph code; these are the distributed-shape
implementations of the standard algorithms a curation pipeline leans
on (duplicate-cluster canonicalization, entity resolution, link
analysis). PageRank / triangles / BFS live in queries.py as composed
plans; connected components earns an operator because it is the one
with a CONVERGENCE loop whose scale discipline (checkpointed lineage,
monotone state, bounded iterations) other iterative ops copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "s",
    dst: str = "d",
    out_vertex: str = "node",
    out_col: str = "component",
    max_iter: int = 25,
    check_every: int = 1,
) -> DataFrame:
    """Connected components by min-label propagation to a fixpoint.

    ``edges`` is an UNDIRECTED edge list given in either or both
    directions (symmetrized internally). Every vertex ends with
    ``out_col`` = the minimum vertex id reachable from it — the
    canonical component representative (the same contract as the
    recursive-CTE oracle and GraphX/GraphFrames' connectedComponents).

    Shape per iteration: ONE equi-join of the (symmetrized, pinned)
    edge list against the current labels on the source endpoint, then
    a (vertex)-keyed min-aggregation folding the propagated labels
    into the previous ones. Both shuffles key on vertex id —
    high-cardinality and AQE-splittable at 100 TB. Labels are
    monotonically non-increasing, so iteration converges in at most
    O(diameter) rounds (plain label-prop; the large-star/small-star
    doubling of Kiveris 2014 "Connected Components in MapReduce and
    Beyond" drops that to O(log d) rounds at the cost of rewiring the
    edge list each round — worth it only on pathological-diameter
    graphs; co-occurrence graphs have tiny diameters).

    Every iteration ``localCheckpoint``s the new label table — the
    lineage cap every convergent loop needs (the BFS query's
    discipline) — and every ``check_every`` rounds runs ONE count()
    action over the changed labels to test the fixpoint (at very
    large scale set ``check_every`` > 1 to trade wasted rounds for
    fewer actions). Raises after ``max_iter`` rounds without
    convergence rather than returning silently-unfinished labels.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    sym = e.unionAll(
        e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
    ).distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("_s").alias("_v"))
        .distinct()
        .withColumn("_lbl", F.col("_v"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_iter):
        msgs = sym.join(
            labels, sym["_s"] == labels["_v"]
        ).select(F.col("_d").alias("_v"), F.col("_lbl"))
        new = (
            labels.unionAll(msgs)
            .groupBy("_v")
            .agg(F.min("_lbl").alias("_new"))
            .localCheckpoint(eager=True)
        )
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            changed = (
                new.join(labels, "_v")
                .filter(F.col("_new") < F.col("_lbl"))
                .limit(1)
                .count()
            )
        else:
            changed = 1
        labels = new.select("_v", F.col("_new").alias("_lbl"))
        if changed == 0:
            return labels.select(
                F.col("_v").alias(out_vertex), F.col("_lbl").alias(out_col)
            )
    raise ValueError(
        f"connected_components did not converge in {max_iter} iterations"
    )

"""Iterative graph algorithms on DataFrames: connected components via
min-label propagation.

The dedup pipeline's missing last step: pairwise near-dup evidence
(MinHash/SimHash/exact) only says "a~b"; choosing which documents to KEEP
requires the transitive clusters. Components are labeled by their minimum
member id — fully deterministic, so the DuckDB oracle reproduces them
with a recursive CTE.

Iterative algorithms are driver-coordinated loops over DataFrame ops in
Spark (no native fixpoint operator): each round is one join + aggregate,
and convergence is checked with a count. Two scale disciplines encoded
here:
- ``localCheckpoint`` each round truncates the lineage — without it the
  plan doubles per iteration and the job eventually dies in the
  optimizer, the classic iterative-Spark failure;
- label propagation converges in O(component diameter) rounds, and
  near-dup clusters are shallow (dup groups are cliques or stars), so
  max_iter stays small; a production run over a deep graph would switch
  to the large-star/small-star formulation (same primitives, fewer
  rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp) for every node, comp = min node id reachable (undirected).

    ``nodes`` optionally supplies isolated vertices (no edges), each its
    own singleton component. Raises if max_iter rounds don't converge.
    """
    # materialize the edge list ONCE: it is re-joined every round, and its
    # upstream lineage is typically the expensive part (e.g. a MinHash-LSH
    # candidate pipeline) — without this, every iteration AND every
    # convergence count re-executes that whole pipeline
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .localCheckpoint()
    )
    # iterate ONLY the edge-endpoint subgraph: isolated vertices are
    # singleton components by definition and joining them through every
    # round is wasted work (most documents are isolated in a near-dup
    # graph); they are appended after convergence
    active = sym.select(F.col("s").alias("id")).distinct()
    labels = active.select("id", F.col("id").alias("comp")).localCheckpoint()

    def with_singletons(converged: DataFrame) -> DataFrame:
        if nodes is None:
            return converged
        singles = nodes.select("id").join(active, "id", "left_anti")
        return converged.union(singles.select("id", F.col("id").alias("comp")))

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.d == labels.id)
            .groupBy("s")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # the improvement flag rides along in the propagation select, so
        # convergence is a filter-count over the checkpointed rows — no
        # extra new-vs-old join per round
        stepped = (
            labels.join(nbr_min, labels.id == nbr_min.s, "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                    "new_comp"
                ),
                (F.coalesce(F.col("nbr_comp") < F.col("comp"), F.lit(False))).alias(
                    "improved"
                ),
            )
            .localCheckpoint()
        )
        labels = stepped.select("id", F.col("new_comp").alias("comp"))
        if stepped.filter("improved").count() == 0:
            return with_singletons(labels)
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

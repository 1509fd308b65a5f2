"""Connected components over a pair graph — the step between
near-duplicate PAIR generation (MinHash/SimHash/embedding) and
actionable DEDUP DECISIONS: pairs chain (A~B, B~C), so keeping one doc
per PAIR over-deletes; the unit of deduplication is the connected
component, with one canonical representative kept per component.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round replaces a node's label with the min of
its own and its neighbors' labels. The min id of a component spreads
one hop per round, so the fixpoint (= min reachable id, a canonical
component id) arrives in O(graph diameter) rounds — near-dup graphs
are dense clumps with tiny diameters, typically 2-4 rounds.

Scale posture: each round is one join of the edge list against the
label table plus a min-aggregation — linear shuffles on node id, no
quadratic term. Lineage is truncated every round with localCheckpoint
(an iterative loop otherwise accretes an unexecutably deep plan; at
100 TB use checkpoint() to a cluster-visible dir instead so executors
can be lost mid-computation). The classic refinement for web-scale
graphs (alternating large-star/small-star, Kiveris et al.) halves the
round count; min-label is the right tool at near-dup densities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``; returns
    (node, component) where component = min node id in the component
    (a deterministic canonical id any engine agrees on). Nodes are the
    ids appearing in edges. Raises if ``max_iter`` rounds do not reach
    the fixpoint (diameter > max_iter — not a near-dup graph shape)."""
    # Materialize the symmetrized edge list ONCE: every round joins
    # against it, and without this the (possibly expensive) edge-
    # producing subtree re-executes per round per reference.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )

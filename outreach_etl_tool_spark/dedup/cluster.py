"""Duplicate-cluster resolution: connected components over a pair graph
(SURVEY.md §2.10 L1/L2 — the step that turns pair *detection* into
actual deduplication).

Every near-dedup operator in this package (minhash/simhash/ngram/
embedding) emits pairs ``(id_a, id_b)``. Deduplicating a corpus needs
one more step: group transitively-linked documents into clusters and
keep one canonical document per cluster. A→B and B→C must collapse to
one cluster even when A→C was never emitted as a pair.

Algorithm: iterative min-label propagation. Each node starts labeled
with its own id; every round each node takes the minimum label among
itself and its neighbors; a fixed point assigns every node the minimum
id of its connected component. Rounds needed = graph diameter, and
duplicate clusters are near-cliques (diameter ≤ ~3 — every member
pairs with most others), so convergence is a handful of rounds, not
O(log n) worst-case chains. For adversarial long-chain graphs at
100 TB the alternating large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) halves the
round count; the propagation loop below is the same join/groupBy
skeleton, so swapping the step function is local.

Scale notes, measured on this engine:

- Each round is ONE shuffle (union of self-labels and neighbor-labels,
  groupBy node, min). The edge table is re-used every round and is
  persisted once; labels are ``localCheckpoint``-ed each round, which
  truncates the exponentially-growing lineage (without it, round r
  re-plans all rounds < r and the driver's plan-compile time, not the
  data, becomes the bottleneck). On a real cluster use a checkpoint
  dir on HDFS/S3; localCheckpoint keeps blocks on executors, which is
  exactly right for an iterative refinement.
- Convergence is detected with ``sum(label)``: labels only ever
  decrease, so the sum is strictly decreasing until the fixed point —
  one cheap aggregate per round instead of a change-count join. The
  loop is driver-side over *rounds* (bounded by diameter), never over
  rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Assign every node the minimum id of its connected component.

    Parameters
    ----------
    edges : pairs (src_col, dst_col); direction is ignored.
    nodes : one row per node (id_col); isolated nodes become singleton
        clusters.

    Returns ``(id_col, cluster_id)`` — one row per node.
    """
    sym = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("peer")
    ).union(
        edges.select(F.col(dst_col).alias("node"), F.col(src_col).alias("peer"))
    )
    # contract: one output row per `nodes` entry — edges mentioning ids
    # outside `nodes` would otherwise leak extra rows into the label
    # table via the neighbor union. Enforce once, before the loop.
    nodeset = nodes.select(F.col(id_col).alias("node"))
    sym = (
        sym.join(nodeset, "node", "left_semi")
        .join(nodeset.withColumnRenamed("node", "peer"), "peer", "left_semi")
    )
    sym = sym.persist()

    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)

    # decimal(38,0) sum: exact for any id domain (a long sum would
    # overflow — and under ANSI, fail — at ~10^11 ids × 10^11 values)
    def _label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iter):
        # neighbor labels: peer's current label flows to node
        neighbor = sym.join(
            labels.select(F.col("node").alias("peer"), "label"), "peer"
        ).select("node", "label")
        new_labels = (
            labels.select("node", "label")
            .union(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:  # labels only decrease → fixed point
            converged = True
            break
        prev_sum = new_sum
    sym.unpersist()
    if not converged:
        # silently returning a non-fixed-point labeling would split true
        # clusters (nodes > max_iter hops from their component's min id)
        # and quietly diverge from any transitive-closure oracle
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the graph has a component with diameter > max_iter — raise "
            "max_iter or switch the step function to large-star/small-star"
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))

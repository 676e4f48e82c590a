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

- The iterative loop touches ONLY edge endpoints: nodes with no pairs
  are singletons by construction and join back in one final left join,
  so every round's shuffle is sized by the duplicate graph (sparse),
  not the corpus. Round 1 is fused into the label init (one groupBy of
  the edge list). Each subsequent round is ONE shuffle (union of
  self-labels and neighbor-labels, groupBy node, min). The edge table
  is re-used every round and is
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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _edge_checksum(edges: DataFrame):
    """Order-independent (count, hash-sum) fingerprint of an edge set —
    one cheap aggregate to detect a fixed point without a set-diff
    join. decimal sum: exact, overflow-free at any edge count."""
    return tuple(
        edges.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
        ).first()
    )


def _components_star(
    sym: DataFrame, nodeset: DataFrame, id_col: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): converges in
    O(log n) ALTERNATIONS even on diameter-n chains, where plain label
    propagation needs diameter rounds. Each star step is one window
    shuffle + a distinct; edges always point larger → smaller node.

    large-star: every node links its larger neighbors to the minimum
    of its closed neighborhood. small-star: every node links itself
    and its smaller neighbors to that minimum. At the fixed point the
    edge set is a star per component, rooted at the component minimum.
    """
    edges = (
        sym.filter(F.col("node") > F.col("peer"))
        .select(F.col("node").alias("u"), F.col("peer").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _edge_checksum(edges)
    converged = edges.isEmpty()  # no edges → all singletons
    for _ in range(max_iter):
        if converged:
            break
        # large-star over the symmetric view of the current edges
        both = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        wl = Window.partitionBy("u")
        ls = (
            both.withColumn("m", F.least(F.min("v").over(wl), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over larger→smaller edges
        ws = Window.partitionBy("u")
        t = ls.withColumn("m", F.min("v").over(ws))
        edges = (
            t.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(t.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        cur = _edge_checksum(edges)
        if cur == prev:
            converged = True
        prev = cur
    if not converged:
        raise RuntimeError(
            f"star connected_components did not converge in {max_iter} "
            "alternations — raise max_iter"
        )
    # fixed point is a star per component: every non-root points at the
    # component minimum; roots and isolated nodes label themselves
    parents = edges.select(
        F.col("u").alias("node"), F.col("v").alias("parent")
    ).groupBy("node").agg(F.min("parent").alias("parent"))
    return (
        nodeset.join(parents, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("parent", "node").alias("cluster_id"),
        )
    )


def _components_driver(
    sym: DataFrame, nodeset: DataFrame, id_col: str
) -> DataFrame:
    """Small-graph fast path: union-find on the driver.

    A duplicate graph under the fast-path threshold is a bounded,
    model-sized object, the same class of driver state as a broadcast
    hash table or a k-means model, NOT a corpus-sized collect.
    Union-find resolves it in microseconds where the distributed loop
    would still pay several scheduler round-trips; the result rejoins
    the (possibly huge) nodeset distributedly.

    The edge list crosses the driver boundary as Arrow batches
    (``toPandas`` on a two-int64-column frame): ~16 B per edge, so the
    1M-edge default costs ~16 MB plus the union-find dict. A Row-based
    ``collect()`` of the same frame would cost ~150-200 B per edge
    (py4j Row objects) — an order of magnitude more for no benefit."""
    spark = sym.sparkSession
    pdf = sym.filter(F.col("node") < F.col("peer")).distinct().toPandas()
    us = pdf["node"].to_numpy()
    vs = pdf["peer"].to_numpy()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(us.tolist(), vs.tolist()):
        a, b = find(a), find(b)
        if a != b:
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    labels = [(n, find(n)) for n in {*us.tolist(), *vs.tolist()}]
    if not labels:
        return nodeset.select(
            F.col("node").alias(id_col), F.col("node").alias("cluster_id")
        )
    lab_df = spark.createDataFrame(labels, ["node", "label"])
    return nodeset.join(F.broadcast(lab_df), "node", "left").select(
        F.col("node").alias(id_col),
        F.coalesce("label", "node").alias("cluster_id"),
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "propagation",
    driver_fast_path_max_edges: int = 1_000_000,
) -> DataFrame:
    """Assign every node the minimum id of its connected component.

    Parameters
    ----------
    edges : pairs (src_col, dst_col); direction is ignored.
    nodes : one row per node (id_col); isolated nodes become singleton
        clusters.
    algorithm : ``"propagation"`` (default — min-label propagation, one
        shuffle per round, rounds = diameter; right for near-clique
        duplicate graphs) or ``"star"`` (alternating large-star/
        small-star, O(log n) alternations; right for adversarial
        long-chain graphs).
    driver_fast_path_max_edges : distinct-edge threshold under which a
        driver-side union-find replaces the iterative loop — the same
        hybrid-execution idea as AQE's broadcast-join threshold: a
        bounded model-sized graph costs microseconds on the driver vs
        several scheduler round-trips per distributed round. 0 disables
        the fast path. The edge count is known from one aggregate over
        the (persisted) edge table, so the decision adds no extra scan.

    Returns ``(id_col, cluster_id)`` — one row per node.
    """
    if algorithm not in ("propagation", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
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

    if driver_fast_path_max_edges > 0:
        n_edges = sym.count() // 2  # symmetric view: two rows per edge
        if n_edges <= driver_fast_path_max_edges:
            out = _components_driver(sym, nodeset, id_col)
            # materialize before unpersist: the fast path's labels are
            # already driver-side, but the returned plan still reads
            # nodeset (not sym) — safe to release the edge cache now
            sym.unpersist()
            return out

    if algorithm == "star":
        out = _components_star(sym, nodeset, id_col, max_iter)
        sym.unpersist()
        return out

    # The loop runs ONLY over edge endpoints: a node with no edges is a
    # singleton by construction and can never change label, so carrying
    # the full corpus through every round just multiplies each round's
    # shuffle by corpus/|endpoints| (typically orders of magnitude at
    # 100 TB — duplicate graphs are sparse). Isolated nodes re-enter
    # via the final left join. Round 1 is fused into the init: each
    # endpoint starts at min(own id, min neighbor id), one groupBy
    # instead of a union + groupBy round.
    # Convergence metric rides the checkpoint job: an Observation on
    # the labels frame is filled when localCheckpoint(eager) runs its
    # materialization, so each round costs ONE job, not a checkpoint
    # job plus a separate sum action. decimal(38,0) sum: exact for any
    # id domain (a long sum would overflow — and under ANSI, fail — at
    # ~10^11 ids × 10^11 values); labels only ever decrease, so the
    # sum strictly decreases until the fixed point.
    from pyspark.sql import Observation

    def _checkpoint_with_sum(df: DataFrame):
        obs = Observation()
        ck = df.observe(
            obs, F.sum(F.col("label").cast("decimal(38,0)")).alias("ls")
        ).localCheckpoint(eager=True)
        return ck, obs.get["ls"]

    labels, prev_sum = _checkpoint_with_sum(
        sym.groupBy("node")
        .agg(F.min("peer").alias("min_peer"))
        .select("node", F.least("node", "min_peer").alias("label"))
    )

    converged = prev_sum is None  # no edges → nothing to propagate
    for _ in range(max_iter):
        if converged:
            break
        # neighbor labels: peer's current label flows to node
        neighbor = sym.join(
            labels.select(F.col("node").alias("peer"), "label"), "peer"
        ).select("node", "label")
        new_labels, new_sum = _checkpoint_with_sum(
            labels.select("node", "label")
            .union(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        labels = new_labels
        if new_sum == prev_sum:  # labels only decrease → fixed point
            converged = True
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
    return nodeset.join(
        labels, "node", "left"
    ).select(
        F.col("node").alias(id_col),
        F.coalesce("label", "node").alias("cluster_id"),
    )

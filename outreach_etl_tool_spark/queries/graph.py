"""Graph analytics over relational co-occurrence graphs.

The corpus-scale graph problems a training-data pipeline actually hits
— duplicate clusters (dedup/cluster.py), co-occurrence similarity,
influence/centrality weighting — all reduce to joins over an edge
list. This module adds the two classic primitives beyond connected
components:

- triangle counting with DEGREE ORIENTATION (Suri & Vassilvitskii,
  WWW'11 "Counting triangles and the curse of the last reducer"):
  orienting every undirected edge from its lower-(degree, id) endpoint
  to the higher one bounds every node's out-degree by ~sqrt(E), so the
  wedge expansion — the step that explodes on hub nodes in the naive
  formulation — is O(E^{3/2}) total and skew-proof. That is the only
  formulation that survives a power-law graph at 10^11 edges.
- PageRank, integer-stabilized: ranks live as 1e9-scaled BIGINTs so
  every per-iteration neighbor sum is an order-independent integer
  aggregation — float summation order would diverge between engines
  (and between Spark runs); the damping multiply is the single IEEE
  op per iteration, applied to identical integers in both engines and
  rounded back. Exact-oracle-able iterative computation.

Both run on the part co-purchase graph (parts sharing an order), built
with one self-join confined to order groups.

Graph is bigger than it looks: edges ≈ orders · (lines choose 2).
Scale notes per query below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.expr import bind_once
from . import QuerySpec


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected edges (u < v): parts appearing in the same
    order. One shuffle on l_orderkey; per-order pair expansion is
    bounded by order width (≤ ~7 lines), never by part popularity.

    Round-14 (optimization): ONE pass formulation — collect each
    order's distinct part set (map-side-combinable collect_set), then
    expand the ≤ C(width, 2) ordered pairs from the sorted array with
    higher-order functions. The previous self-join formulation scanned
    lineitem THREE times (the distinct plus one scan per join leg —
    the two legs project different columns, so the exchange is not
    reused) and paid an extra exchange; measured 3 scans × ~110 MB at
    sf0.1 in the stage metrics. Same distinct pair set: within-order
    pairs of the distinct part set, u < v from the sorted array."""
    li = load_table(spark, sf_dir, "lineitem")
    sets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
    )
    def _pairs(arr: Column) -> Column:
        return F.flatten(
            F.transform(
                arr,
                lambda x, i: F.transform(
                    F.slice(arr, i + F.lit(2), F.size(arr)),
                    lambda y: F.struct(x.alias("u"), y.alias("v")),
                ),
            )
        )

    # bind_once: the sorted array is referenced three times in _pairs
    pairs = bind_once(F.array_sort(F.col("ps")), _pairs)
    return (
        sets.select(F.explode(pairs).alias("p"))
        .select("p.u", "p.v")
        .distinct()
    )


_EDGES_SQL = """
pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM pl a JOIN pl b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
"""


# ---------------------------------------------------------------------------
# GRAPH T1 — per-node triangle counts, degree-oriented.
# Plan: edges (2 shuffles) → degrees (1) → orient (broadcast degree
# join at toy sf; shuffle at scale, same key) → wedge self-join on the
# oriented source (out-deg ≤ ~sqrt(E) ⇒ no last-reducer hub) → close
# the wedge against the oriented edge list → explode the 3 corners →
# per-node rollup. Every join is equi-keyed; nothing is quadratic in
# any node's popularity.
# ---------------------------------------------------------------------------
def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )


# Broadcast ceiling for the triangle-closing build side: 8M packed
# longs hash to a ~64-128 MB relation — comfortably broadcastable on
# any executor profile this engine targets; beyond it the closing
# join stays sort-merge (the build side grows with the graph).
_CLOSER_BCAST_MAX_EDGES = 8_000_000


def _oriented_triangles(e: DataFrame, deg: DataFrame) -> DataFrame:
    """(a, b, c) triangle instances via degree orientation: orient each
    edge low-degree -> high-degree (id tie-break), enumerate wedges at
    the oriented source (out-deg <= ~sqrt(E), so no last-reducer hub),
    close against the oriented edge list. Shared by the per-node
    triangle counts and the edge-Jaccard similarity."""
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # o carries t's degree alongside: the wedge stage below orders the
    # pair by the SAME (degree, id) priority the orientation uses
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
        )
        .localCheckpoint()
    )
    # The wedge pair must NOT be pre-ordered by vertex ID: the closing
    # edge is oriented by DEGREE priority, and when priority order
    # disagrees with id order an id-ordered pair (b < c) can never
    # match the oriented (c -> b) edge — triangles silently vanish
    # (found by a randomized brute-force test; the id-ordered form
    # missed every triangle whose two higher-priority corners sort the
    # other way by id). Ordering the pair by the SAME (degree, id)
    # priority as the orientation is the sound form AND emits each
    # wedge ONCE instead of both arrangements: for a triangle with
    # corners x < y < z in priority order, the oriented edges are
    # x->y, x->z, y->z, the only wedge apex is x, and the
    # priority-ordered pair (y, z) matches the oriented closer y->z by
    # construction. Halves the wedge relation — the dominant stage —
    # and the end-to-end queries drop ~23% at sf0.1 (10.2 -> 7.8 s for
    # edge-Jaccard; the closing join and rollups are unchanged). The
    # both-arrangements form did the wedge work twice and let the
    # closing equi-join discard half.
    w1 = o.select("s", F.col("t").alias("b"), F.col("dt").alias("db"))
    w2 = o.select("s", F.col("t").alias("c"), F.col("dt").alias("dc"))
    # The closing join key (b, c) is PACKED into one 64-bit long
    # (b << 32 | c): the wedge relation is the dominant stage (~34
    # wedges per edge at sf0.1 — 41M rows), and halving its shuffle
    # key width + hashing one long instead of two measures −27% on the
    # triangle core (round-12; 5.46 → 4.01 s at sf0.1). Sound while
    # node ids are in [0, 2^31) (TPC-H partkeys); the bound check is
    # FOLDED INTO the packing expression (round-14 ADVICE — the prior
    # eager max() guard added a full extra scan of the oriented edge
    # set per triangle family build, and only caught ids ≥ 2^31, not
    # negatives): an out-of-range id raises mid-expression instead of
    # silently mis-packing, at CASE-branch cost inside codegen —
    # nothing extra to scan.
    def _pack64(hi, lo):
        h, lw = F.col(hi), F.col(lo)
        return F.when(
            (h < 0) | (lw < 0) | (h >= F.lit(1 << 31)) | (lw >= F.lit(1 << 31)),
            F.raise_error(
                F.format_string(
                    "packed 64-bit triangle-closing key requires node "
                    "ids in [0, 2^31): got (%s, %s); use a two-column "
                    "(b, c) join key for this graph",
                    h,
                    lw,
                )
            ).cast("long"),
        ).otherwise(F.shiftleft(h, 32) + lw)

    wedges = (
        w1.join(w2, "s")
        .filter(
            (F.col("db") < F.col("dc"))
            | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
        )
        .select("s", _pack64("b", "c").alias("bc"))
    )
    closer = o.select(_pack64("s", "t").alias("bc"))
    # Round-14 (optimization, guide §3.1/§2.4): the closing join's
    # probe side is the WEDGE relation — ~Σ C(out_deg, 2) rows, the
    # dominant relation of the whole family (41M rows / ~350 MB
    # shuffled at sf0.1, measured) — while the build side is only the
    # oriented EDGE list (one packed long per edge). Broadcasting the
    # closer when the edge count fits (size-aware, the
    # connected_components driver-fast-path convention) removes the
    # wedge exchange entirely: wedges are closed map-side in the stage
    # that generates them, and the downstream corner/side rollups see
    # triangle-sized input with map-side partial aggregation. Past the
    # threshold (~64 MB hashed relation) the sort-merge path stands —
    # at 10^11 edges a broadcast would OOM every executor. o is
    # localCheckpointed, so the count is one cached-block scan, and
    # the SAME count decides both tiers deterministically.
    if o.count() <= _CLOSER_BCAST_MAX_EDGES:
        closer = F.broadcast(closer)
    return wedges.join(closer, "bc").select(
        F.col("s").alias("a"),
        F.shiftrightunsigned("bc", 32).alias("b"),
        F.col("bc").bitwiseAND(F.lit(4294967295)).alias("c"),
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # localCheckpoint (same discipline as dedup/cluster.py): the edge
    # and oriented-edge frames each feed 2-3 consumers; without lineage
    # truncation Catalyst re-plans the whole derivation per consumer
    # (audited: 63 exchanges instead of 8)
    e = _copurchase_edges(spark, sf_dir).localCheckpoint()
    tri = _oriented_triangles(e, _degrees(e))
    # explode, not a 3-way self-union: Catalyst does not dedupe common
    # subplans, so a union would run the wedge join three times
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "node")
    )


GRAPH_TRIANGLES_SQL = f"""
WITH {_EDGES_SQL},
deg AS (SELECT n, COUNT(*) AS d
        FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN u ELSE v END AS s,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN v ELSE u END AS t
      FROM e JOIN deg du ON u = du.n JOIN deg dv ON v = dv.n),
tri AS (SELECT w1.s AS a, w1.t AS b, w2.t AS c
        FROM o w1 JOIN o w2 ON w1.s = w2.s AND w1.t <> w2.t
        JOIN o w3 ON w3.s = w1.t AND w3.t = w2.t)
SELECT node, COUNT(*) AS n_triangles
FROM (SELECT a AS node FROM tri UNION ALL
      SELECT b FROM tri UNION ALL
      SELECT c FROM tri)
GROUP BY node
ORDER BY n_triangles DESC, node
"""


# ---------------------------------------------------------------------------
# GRAPH T3 — edge-level structural similarity (SCAN-family, Jaccard
# form): for every EDGE (u, v), the Jaccard of the endpoints' neighbor
# sets — |N(u) ∩ N(v)| / |N(u) ∪ N(v)| = common / (d_u + d_v − common).
# This is the similarity that graph sparsifiers and SCAN-style
# community detection weight edges with; edges above the threshold are
# the "strong ties" retained.
#
# Scale shape — the candidate set is the EDGE LIST, never node pairs:
# the common-neighbor count of an edge is exactly its triangle count,
# so the whole computation reuses the degree-oriented triangle
# derivation (wedge fan-out bounded by oriented out-degree ≤ ~sqrt(E);
# no per-hub quadratic blowup, unlike all-pairs neighbor Jaccard whose
# wedge fan-out is Σ d_s²). One explode of triangle edge-sides + one
# rollup keyed like the edge list; degrees ride the existing join.
# Jaccard divides two exact BIGINTs and the τ = 1/20 retention gate is
# an integer cross-multiplication, so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------
_EDGE_JACCARD_NUM, _EDGE_JACCARD_DEN = 1, 20


def graph_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir).localCheckpoint()
    # deg feeds FOUR consumers (both orientation joins inside
    # _oriented_triangles + the final du/dv joins) — checkpoint so the
    # union+groupBy over the edge list runs once, not per consumer
    # (round-11 constant-factor trim; node-count-sized relation)
    deg = _degrees(e).localCheckpoint()
    tri = _oriented_triangles(e, deg)
    # each triangle contributes one common neighbor to each of its 3
    # sides; normalize sides to (u < v) to match the edge list key
    sides = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                ),
                F.struct(
                    F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")
                ),
                F.struct(
                    F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")
                ),
            )
        ).alias("s")
    ).select("s.u", "s.v")
    common = sides.groupBy("u", "v").agg(F.count(F.lit(1)).alias("common"))
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("deg_v"))
    # Round-15 (optimization, guide §2.4): the edge list does NOT need
    # to be joined back in. Every triangle side normalized to (u < v)
    # IS an edge of e by construction, so `common`'s key set ⊆ e; and
    # an edge with zero triangles can never pass the τ = 1/20 gate
    # (20·0 ≥ deg_u + deg_v is impossible — both degrees are ≥ 1), so
    # the old e LEFT JOIN common + coalesce(0) contributed no output
    # rows beyond common's own. Dropping it removes the sort-merge
    # join of two edge-count-sized relations (two exchanges + sorts of
    # ~1.2M rows each at sf0.1) from the plan; the oracle's
    # e-LEFT-JOIN formulation is unchanged and the hash gate certifies
    # the equivalence.
    j = (
        common.join(du, "u")
        .join(dv, "v")
        .withColumn("union_size", F.col("deg_u") + F.col("deg_v") - F.col("common"))
    )
    return (
        j.filter(
            F.lit(_EDGE_JACCARD_DEN) * F.col("common")
            >= F.lit(_EDGE_JACCARD_NUM) * F.col("union_size")
        )
        .select(
            "u",
            "v",
            "common",
            "deg_u",
            "deg_v",
            (F.col("common").cast("double") / F.col("union_size").cast("double")).alias(
                "jaccard"
            ),
        )
        .orderBy(F.desc("jaccard"), "u", "v")
    )


GRAPH_EDGE_JACCARD_SQL = f"""
WITH {_EDGES_SQL},
deg AS (SELECT n, COUNT(*) AS d
        FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN u ELSE v END AS s,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN v ELSE u END AS t
      FROM e JOIN deg du ON u = du.n JOIN deg dv ON v = dv.n),
tri AS (SELECT w1.s AS a, w1.t AS b, w2.t AS c
        FROM o w1 JOIN o w2 ON w1.s = w2.s AND w1.t <> w2.t
        JOIN o w3 ON w3.s = w1.t AND w3.t = w2.t),
sides AS (SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM tri
          UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM tri
          UNION ALL SELECT LEAST(b, c), GREATEST(b, c) FROM tri),
common AS (SELECT u, v, COUNT(*) AS common FROM sides GROUP BY u, v),
j AS (SELECT e.u, e.v,
             CAST(COALESCE(c.common, 0) AS BIGINT) AS common,
             du.d AS deg_u, dv.d AS deg_v,
             du.d + dv.d - COALESCE(c.common, 0) AS union_size
      FROM e
      LEFT JOIN common c ON c.u = e.u AND c.v = e.v
      JOIN deg du ON e.u = du.n
      JOIN deg dv ON e.v = dv.n)
SELECT u, v, common, deg_u, deg_v,
       CAST(common AS DOUBLE) / CAST(union_size AS DOUBLE) AS jaccard
FROM j
WHERE {_EDGE_JACCARD_DEN} * common >= {_EDGE_JACCARD_NUM} * union_size
ORDER BY jaccard DESC, u, v
"""


# ---------------------------------------------------------------------------
# GRAPH T2 — PageRank (3 iterations, damping 0.85) on the ORIENTED
# co-purchase graph. Integer-stabilized: rank_{k+1} = round(0.15·1e9 +
# 0.85 · Σ (rank_k DIV out_deg)) — the neighbor contribution uses
# integer division, so the per-node sum is an exact BIGINT in any
# arrival order, and the one float multiply per iteration operates on
# identical integers in both engines. Dangling mass is dropped (nodes
# with no out-edges contribute nothing) — documented simplification,
# mirrored exactly in the oracle.
#
# Scale shape per iteration: join ranks⋈edges on src + groupBy dst —
# two exchanges on the same keys every round, so a cluster reuses the
# edge partitioning; edges are persisted once. Driver holds no graph
# state; the loop unrolls into one Catalyst plan (3 iterations —
# for deep iteration counts, localCheckpoint per round as
# dedup/cluster.py does).
# ---------------------------------------------------------------------------
_PR_ITER = 3
_PR_SCALE = 1_000_000_000


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    edges = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .localCheckpoint()
    )
    nodes = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outd")
    )
    nodes = nodes.localCheckpoint()
    outdeg = outdeg.localCheckpoint()
    ranks = nodes.withColumn("r", F.lit(_PR_SCALE).cast("bigint"))
    for _ in range(_PR_ITER):
        contrib = (
            ranks.join(outdeg, "node")
            .join(edges, ranks.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                # floor(double-div), NOT integer div: Spark's bigint cast
                # truncates but DuckDB's rounds — floor of the identical
                # IEEE quotient is the op both engines agree on
                F.floor(F.col("r") / F.col("outd")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("sc"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    0.15 * _PR_SCALE + 0.85 * F.coalesce(F.col("sc"), F.lit(0))
                )
                .cast("bigint")
                .alias("r"),
            )
            # per-round truncation: rank_k feeds two consumers in
            # round k+1 and the unrolled lineage otherwise doubles
            # every iteration (audited: 280 exchanges for 3 rounds)
            .localCheckpoint()
        )
    return ranks.select(
        "node", (F.col("r").cast("double") / _PR_SCALE).alias("pagerank")
    ).orderBy(F.desc("pagerank"), "node")


def _pr_sql() -> str:
    body = f"""
WITH {_EDGES_SQL},
deg AS (SELECT n, COUNT(*) AS d
        FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
edges AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                      THEN u ELSE v END AS src,
                 CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                      THEN v ELSE u END AS dst
          FROM e JOIN deg du ON u = du.n JOIN deg dv ON v = dv.n),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
outdeg AS (SELECT src AS node, COUNT(*) AS outd FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM nodes)"""
    prev = "r0"
    for i in range(1, _PR_ITER + 1):
        body += f""",
c{i} AS (SELECT dst AS node, SUM(CAST(FLOOR(r / outd) AS BIGINT)) AS sc
         FROM {prev} JOIN outdeg USING (node)
         JOIN edges ON {prev}.node = edges.src
         GROUP BY dst),
r{i} AS (SELECT nodes.node,
                CAST(ROUND(0.15 * {_PR_SCALE}
                     + 0.85 * COALESCE(sc, 0)) AS BIGINT) AS r
         FROM nodes LEFT JOIN c{i} USING (node))"""
        prev = f"r{i}"
    body += f"""
SELECT node, CAST(r AS DOUBLE) / {_PR_SCALE} AS pagerank
FROM {prev}
ORDER BY pagerank DESC, node"""
    return body


GRAPH_PAGERANK_SQL = _pr_sql()


# ---------------------------------------------------------------------------
# GRAPH K-CORE — iterative peel to the maximal subgraph of min-degree k.
# The classic cohesion primitive (dense-community extraction, spam/hub
# filtering before PageRank). Hybrid execution mirrors
# dedup/cluster.py: a bounded driver peel (O(E) bucket queue) under
# the edge threshold — peeling is many cheap rounds, exactly the shape
# where scheduler round-trips dominate — and a distributed
# degree-filter loop past it (one groupBy + two anti-joins per round,
# localCheckpoint per round so lineage doesn't double; rounds ≤
# max-degree, in practice ~a dozen). Rows-only by nature: the peel's
# fixpoint is iterative deletion, which recursive-CTE UNION semantics
# cannot express (aggregates are not allowed in the recursive term) —
# correctness is pinned by pytest against an independent pure-python
# peel plus hand-built graphs, the cluster.py pattern.
# ---------------------------------------------------------------------------
_KCORE_K = 3


def kcore_nodes(
    edges: DataFrame,
    k: int,
    max_iter: int = 200,
    driver_fast_path_max_edges: int = 1_000_000,
) -> DataFrame:
    """Nodes of the k-core of the undirected graph `edges(u, v)` with
    their within-core degree. Returns DataFrame[node, core_degree]."""
    spark = edges.sparkSession
    sym = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("peer"))
        .unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("peer"))
        )
        .localCheckpoint()
    )
    n_edges = sym.count() // 2
    if 0 < n_edges <= driver_fast_path_max_edges:
        import collections

        adj: dict[int, set] = collections.defaultdict(set)
        for r in sym.collect():
            adj[r["node"]].add(r["peer"])
        queue = [n for n, ps in adj.items() if len(ps) < k]
        while queue:
            n = queue.pop()
            if n not in adj:
                continue
            for p in adj.pop(n):
                ps = adj.get(p)
                if ps is not None:
                    ps.discard(n)
                    if len(ps) < k:
                        queue.append(p)
        rows = [(n, len(ps)) for n, ps in adj.items()]
        return spark.createDataFrame(rows, "node long, core_degree long")

    for _ in range(max_iter):
        deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
        weak = deg.filter(F.col("d") < k).select("node").localCheckpoint()
        if weak.isEmpty():
            break
        sym = (
            sym.join(weak, "node", "left_anti")
            .join(weak.withColumnRenamed("node", "peer"), "peer", "left_anti")
            .localCheckpoint()
        )
    else:  # pragma: no cover
        raise RuntimeError(
            f"k-core peel did not converge in {max_iter} rounds"
        )
    return sym.groupBy("node").agg(F.count(F.lit(1)).alias("core_degree"))


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    return kcore_nodes(e, _KCORE_K).orderBy("node")


# ---------------------------------------------------------------------------
# GRAPH K-CORE CHECK — the oracle-able companion of graph_kcore. The
# peel's FIXPOINT is iterative deletion (no recursive-CTE mirror: the
# recursive term cannot aggregate), but the OUTPUT PROPERTY is pure
# SQL: the k-core is the unique maximal subgraph with min within-set
# degree >= k, so the check is (a) soundness — every returned node's
# recomputed within-core degree is >= k and equals its reported
# core_degree — and (b) maximality — node count and degree mass equal
# an independently computed fixpoint. The oracle reaches that fixpoint
# by unrolling the SIMULTANEOUS peel (drop ALL <k nodes each round;
# same fixpoint as queue-based deletion) a fixed _KCORE_CHECK_ROUNDS
# times: if the unroll were ever too short, the oracle's own
# violation count turns nonzero and the gate fails loudly instead of
# certifying a partial peel.
#
# k = 80 sits where the peel genuinely iterates on the co-purchase
# graph (~5 simultaneous rounds, a proper-subset core — at the
# operator's registry k=3 the graph is so dense the peel is a no-op,
# which checks nothing), and comfortably below the random-graph
# collapse threshold (~85) where the empty core appears. At sf0.1 the
# edge count (~1.2M) also crosses kcore_nodes' 1M driver-fast-path
# bound, so the DISTRIBUTED peel loop is what this check certifies
# there.
# ---------------------------------------------------------------------------
_KCORE_CHECK_K = 80
_KCORE_CHECK_ROUNDS = 40  # ~8x the observed convergence, fail-loud


def graph_kcore_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # edge build behind a checkpoint (graph-family discipline): it
    # feeds the peel AND the recomputed within-core degrees below —
    # without it the returned plan rebuilds pl/e from the scan twice
    e = _copurchase_edges(spark, sf_dir).localCheckpoint()
    core = kcore_nodes(e, _KCORE_CHECK_K).localCheckpoint()
    sym = e.select(F.col("u").alias("node"), F.col("v").alias("peer")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("peer"))
    )
    within = (
        sym.join(core.select("node"), "node")
        .join(core.select(F.col("node").alias("peer")), "peer")
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("dw"))
    )
    checked = core.join(within, "node", "left").select(
        "core_degree", F.coalesce("dw", F.lit(0)).alias("dw")
    )
    viol = (F.col("dw") < _KCORE_CHECK_K) | (
        F.col("dw") != F.col("core_degree")
    )
    return checked.agg(
        F.count(F.lit(1)).alias("n_core_nodes"),
        F.coalesce(F.sum("core_degree"), F.lit(0))
        .cast("bigint")
        .alias("sum_core_degree"),
        F.coalesce(F.sum(F.when(viol, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_violations"),
    )


def _kcore_check_sql() -> str:
    # every CTE is MATERIALIZED: each peel round references the
    # previous round twice and sym twice — DuckDB's default inlining
    # would expand the reference tree exponentially across 40 rounds
    # (observed as hundreds of concurrent parquet re-opens)
    k, rounds = _KCORE_CHECK_K, _KCORE_CHECK_ROUNDS
    body = f"""
WITH pl AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
     FROM pl a JOIN pl b
       ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
sym AS MATERIALIZED (SELECT u AS node, v AS peer FROM e
        UNION ALL
        SELECT v AS node, u AS peer FROM e),
n0 AS MATERIALIZED (SELECT DISTINCT node FROM sym)"""
    prev = "n0"
    for i in range(1, rounds + 1):
        body += f""",
n{i} AS MATERIALIZED (SELECT s.node FROM sym s
         JOIN {prev} a ON s.node = a.node
         JOIN {prev} b ON s.peer = b.node
         GROUP BY s.node HAVING COUNT(*) >= {k})"""
        prev = f"n{i}"
    body += f""",
core AS (SELECT s.node, COUNT(*) AS dw FROM sym s
         JOIN {prev} a ON s.node = a.node
         JOIN {prev} b ON s.peer = b.node
         GROUP BY s.node)
SELECT CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
       CAST(COALESCE(SUM(dw), 0) AS BIGINT) AS sum_core_degree,
       CAST(COALESCE(SUM(CASE WHEN dw < {k} THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_violations
FROM core"""
    return body


GRAPH_KCORE_CHECK_SQL = _kcore_check_sql()


QUERIES: dict[str, QuerySpec] = {
    "graph_kcore": QuerySpec(
        graph_kcore, None, tags=("J1", "A2"),
        doc=f"{_KCORE_K}-core of the co-purchase graph (iterative peel, "
        "hybrid driver/distributed); rows-only — iterative deletion has "
        "no recursive-CTE mirror; pytest-pinned vs independent peel, "
        "and graph_kcore_check puts the operator's output property "
        "under the full oracle gate at a peel-nontrivial k",
    ),
    "graph_kcore_check": QuerySpec(
        graph_kcore_check, GRAPH_KCORE_CHECK_SQL, tags=("J1", "A2", "A1"),
        doc=f"oracle-able k-core companion: runs kcore_nodes at "
        f"k={_KCORE_CHECK_K} (proper-subset core, ~5 peel rounds; "
        "distributed-loop path at sf0.1) and reports node count, "
        "degree mass and soundness violations; the oracle reaches the "
        "same fixpoint via a fixed-unroll simultaneous peel and would "
        "fail loudly if the unroll were short",
    ),
    "graph_triangles": QuerySpec(
        graph_triangles, GRAPH_TRIANGLES_SQL, tags=("J1", "A2", "L1"),
        doc="per-node triangle counts; degree orientation kills the "
        "last-reducer hub problem",
    ),
    "graph_edge_jaccard": QuerySpec(
        graph_edge_jaccard, GRAPH_EDGE_JACCARD_SQL, tags=("J1", "A2", "L3"),
        bench=True,
        doc="edge-level neighbor-set Jaccard (SCAN-style structural "
        "similarity for sparsification); candidates are the edge list, "
        "common counts reuse the degree-oriented triangle derivation",
    ),
    "graph_pagerank": QuerySpec(
        graph_pagerank, GRAPH_PAGERANK_SQL, tags=("J1", "A2", "W3"),
        doc="3-iteration PageRank, integer-stabilized for exact "
        "cross-engine agreement",
    ),
}

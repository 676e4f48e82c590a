"""Unit tests: training-pipeline operators beyond detection —
connected-components clustering, deterministic splitting, repetition
signals, decontamination (queries/pipeline.py, dedup/cluster.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from outreach_etl_tool_spark.dedup import cluster
from outreach_etl_tool_spark.queries.pipeline import _grams


def assignments(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


# ----------------------------------------------------- connected components
def test_cc_transitive_chain(spark):
    """A-B and B-C must land in one cluster without an A-C edge."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    got = assignments(
        cluster.connected_components(edges, nodes, id_col="doc_id", driver_fast_path_max_edges=0)
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}


def test_cc_long_chain_converges(spark):
    """A path graph (worst diameter case) still reaches the fixed point."""
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = assignments(
        cluster.connected_components(edges, nodes, id_col="doc_id", driver_fast_path_max_edges=0)
    )
    assert got == {i: 0 for i in range(n)}


def test_cc_two_components_and_direction_blind(spark):
    edges = spark.createDataFrame(
        [(5, 1), (2, 5), (8, 9)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 5, 8, 9)], "doc_id long"
    )
    got = assignments(
        cluster.connected_components(edges, nodes, id_col="doc_id", driver_fast_path_max_edges=0)
    )
    assert got == {1: 1, 2: 1, 5: 1, 8: 8, 9: 8}


def test_cc_raises_when_not_converged(spark):
    """A diameter-4 path with max_iter=2 must fail loudly, not return a
    split cluster."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster.connected_components(edges, nodes, id_col="doc_id", max_iter=2, driver_fast_path_max_edges=0)


def test_cc_ignores_edges_outside_nodes(spark):
    """Edge endpoints absent from `nodes` neither appear in the output
    nor affect labels."""
    edges = spark.createDataFrame([(7, 1), (1, 2)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = assignments(
        cluster.connected_components(edges, nodes, id_col="doc_id", driver_fast_path_max_edges=0)
    )
    assert got == {1: 1, 2: 1}


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = assignments(
        cluster.connected_components(edges, nodes, id_col="doc_id", driver_fast_path_max_edges=0)
    )
    assert got == {1: 1, 2: 2}


def test_cc_star_path_graph_logarithmic_rounds(spark):
    """Adversarial diameter: a 500-node path graph. Label propagation
    needs 499 rounds; the large-star/small-star variant must converge
    within O(log n) alternations (20 ≫ log2(500) ≈ 9, ≪ 499) and
    still assign every node the component minimum."""
    n = 500
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = assignments(
        cluster.connected_components(
            edges, nodes, id_col="doc_id", max_iter=20, algorithm="star", driver_fast_path_max_edges=0
        )
    )
    assert got == {i: 0 for i in range(n)}


def test_cc_star_matches_propagation(spark):
    """Both algorithms implement the same semantics: identical labels
    on a multi-component graph with chains, cliques and singletons."""
    edge_list = (
        [(i, i + 1) for i in range(10, 18)]      # chain
        + [(a, b) for a in (30, 31, 32) for b in (31, 32, 33) if a < b]
        + [(50, 51), (51, 50), (52, 52)]          # dup/reversed/self edges
    )
    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(10, 19)) + [30, 31, 32, 33, 50, 51, 52, 99]],
        "doc_id long",
    )
    prop = assignments(
        cluster.connected_components(edges, nodes, id_col="doc_id", driver_fast_path_max_edges=0)
    )
    star = assignments(
        cluster.connected_components(
            edges, nodes, id_col="doc_id", algorithm="star", driver_fast_path_max_edges=0
        )
    )
    assert star == prop


def test_cc_driver_fast_path_matches_distributed(spark):
    """The small-graph union-find fast path must assign exactly the
    labels the distributed loop assigns, on a graph with chains,
    cliques, dup/reversed/self edges and singletons — and it is the
    DEFAULT, so production dedup_cluster takes it under the threshold."""
    edge_list = (
        [(i, i + 1) for i in range(10, 18)]
        + [(a, b) for a in (30, 31, 32) for b in (31, 32, 33) if a < b]
        + [(50, 51), (51, 50), (52, 52)]
    )
    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(10, 19)) + [30, 31, 32, 33, 50, 51, 52, 99]],
        "doc_id long",
    )
    fast = assignments(
        cluster.connected_components(edges, nodes, id_col="doc_id")
    )
    dist = assignments(
        cluster.connected_components(
            edges, nodes, id_col="doc_id", driver_fast_path_max_edges=0
        )
    )
    assert fast == dist
    # fast path handles the empty-edge graph too
    none = spark.createDataFrame([], "id_a long, id_b long")
    got = assignments(
        cluster.connected_components(none, nodes, id_col="doc_id")
    )
    assert got == {r["doc_id"]: r["doc_id"] for r in nodes.collect()}


def test_cc_fast_path_threshold_straddle(spark):
    """Identical labels whichever side of the fast-path gate the same
    graph lands on: threshold == distinct edge count engages the
    union-find, threshold == count - 1 falls through to the distributed
    loop. Pins the gate arithmetic (the symmetric view counts each
    undirected edge twice, so the gate divides by two)."""
    edge_list = (
        [(i, i + 1) for i in range(0, 40, 2)]  # 20 two-node components
        + [(0, 2), (2, 0), (100, 101)]          # merge 0-1-2-3; dup reversed
    )
    distinct_edges = len({tuple(sorted(e)) for e in edge_list})
    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in range(0, 42)] + [(100,), (101,), (999,)], "doc_id long"
    )
    on_fast = assignments(
        cluster.connected_components(
            edges, nodes, id_col="doc_id",
            driver_fast_path_max_edges=distinct_edges,
        )
    )
    on_dist = assignments(
        cluster.connected_components(
            edges, nodes, id_col="doc_id",
            driver_fast_path_max_edges=distinct_edges - 1,
        )
    )
    assert on_fast == on_dist
    assert on_fast[3] == 0 and on_fast[101] == 100 and on_fast[999] == 999


# ----------------------------------------------------------------- _grams
@pytest.mark.parametrize(
    "text,k,expected",
    [
        ("a b c d", 2, ["a b", "b c", "c d"]),
        ("a b c d", 4, ["a b c d"]),
        ("a b", 3, []),  # shorter than k → no grams (unlike shingles())
        ("", 2, []),
        ("a a a", 2, ["a a", "a a"]),  # NON-distinct: repetition preserved
    ],
)
def test_grams(spark, text, k, expected):
    row = spark.createDataFrame([(text,)], "text string").select(
        _grams("text", k).alias("g")
    ).head()
    assert row["g"] == expected


# ------------------------------------------------------------ split/signals
def test_split_deterministic_and_exhaustive(spark, sf_dir):
    from outreach_etl_tool_spark.queries.pipeline import split_train_holdout

    out = split_train_holdout(spark, sf_dir)
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in out.collect()}
    assert a == b  # content-hash split: stable across runs
    assert set(a.values()) <= {"train", "val", "holdout"}
    # boundaries carve the full hex range: every doc gets a split
    assert all(v is not None for v in a.values())
    # ~90/5/5 by construction; allow generous tolerance at small n
    frac_train = sum(v == "train" for v in a.values()) / len(a)
    assert 0.8 < frac_train < 0.97


def test_quality_signals_literal(spark, monkeypatch, tmp_path):
    """Hand-checked repetition stats on a literal doc."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "x y z w")], "doc_id long, text string"
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(
        P, "load_table", lambda spark_, sf_dir_, name_: docs
    )
    got = {r["doc_id"]: r.asDict() for r in P.quality_signals(spark, "unused").collect()}
    d1 = got[1]
    assert d1["n_tokens"] == 3 and d1["n_distinct"] == 2
    assert d1["dup_token_frac"] == pytest.approx(1 / 3)
    assert d1["top_token_frac"] == pytest.approx(2 / 3)
    # 2-grams of "a a b": ["a a", "a b"] — both unique → 0.0
    assert d1["dup_2gram_frac"] == pytest.approx(0.0)
    d2 = got[2]
    assert d2["dup_token_frac"] == pytest.approx(0.0)


def test_pack_sequences_literal(spark, monkeypatch):
    """Contiguous fill: bin = floor(preceding_tokens / capacity),
    per-source, ordered by doc_id; an over-capacity doc gets its own
    bin without stalling the fill."""
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "_PACK_CAPACITY", 5)
    docs = spark.createDataFrame(
        [
            (1, "s", "a b c"),          # 3 tokens, preceding 0 → bin 0
            (2, "s", "d e f g"),        # preceding 3 → bin 0
            (3, "s", " ".join("t" + str(i) for i in range(9))),  # preceding 7 → bin 1
            (4, "s", "x"),              # preceding 16 → bin 3
            (5, "other", "y y"),        # own source → bin 0
        ],
        "doc_id long, source string, text string",
    )
    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    got = {r["doc_id"]: r["bin_id"] for r in P.pack_sequences(spark, "unused").collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 3, 5: 0}


def test_domain_mix_kept_subset_and_determinism(spark, sf_dir):
    from outreach_etl_tool_spark.queries.pipeline import domain_mix_sample

    out = domain_mix_sample(spark, sf_dir)
    rows = {r["source"]: r for r in out.collect()}
    again = {r["source"]: r for r in domain_mix_sample(spark, sf_dir).collect()}
    for src, r in rows.items():
        assert 0 <= r["n_kept"] <= r["n_total"]
        assert r.asDict() == again[src].asDict()  # hash gate: reproducible
        num = int("".join(ch for ch in src if ch.isdigit()))
        if num % 4 == 0:  # weight 1.0 sources keep everything
            assert r["n_kept"] == r["n_total"]


# ------------------------------------------------------------- kNN join
def test_knn_join_literal(spark):
    """Orthogonal + parallel vectors: neighbors ranked by cosine,
    self excluded, ties broken by ascending id."""
    from outreach_etl_tool_spark.similarity import ann

    vecs = [
        (1, [1.0, 0.0]),
        (2, [2.0, 0.0]),     # parallel to 1 → cos 1.0
        (3, [0.0, 1.0]),     # orthogonal to 1/2
        (4, [1.0, 1.0]),     # 45° to everything
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = ann.knn_join_bruteforce(df, k=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["vec_id"], []).append((r["neighbor_id"], r["cos_sim"]))
    assert set(got) == {1, 2, 3, 4}
    assert all(len(v) == 2 for v in got.values())
    # 1's best neighbor is 2 (cos 1.0), then 4 (cos ~0.707); never itself
    assert [n for n, _ in got[1]] == [2, 4]
    assert got[1][0][1] == pytest.approx(1.0)
    # 3's best is 4; 1 and 2 tie at cos 0 → lower id wins
    assert [n for n, _ in got[3]] == [4, 1]


def _rand_vecs(spark, n=60, dim=8, seed=11, clusters=None):
    import numpy as np

    rng = np.random.RandomState(seed)
    if clusters:
        centers = rng.randn(clusters, dim) * 5
        mat = centers[rng.randint(0, clusters, n)] + rng.randn(n, dim) * 0.3
    else:
        mat = rng.randn(n, dim)
    rows = [(i, [float(v) for v in mat[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _knn_tuples(df):
    return sorted(
        (r["vec_id"], r["neighbor_id"], round(r["cos_sim"], 12))
        for r in df.collect()
    )


def test_knn_join_blocked_matches_bruteforce(spark):
    """The distributed block NL join is EXACT: identical output to the
    broadcast small-index tier, including tie-breaks, for any blocking
    factor (blocks partition the index, every pair scored once)."""
    from outreach_etl_tool_spark.similarity import ann

    df = _rand_vecs(spark)
    expect = _knn_tuples(ann.knn_join_bruteforce(df, k=4))
    for n_blocks in (1, 3, 8):
        got = _knn_tuples(ann.knn_join_blocked(df, k=4, n_blocks=n_blocks))
        assert got == expect, f"n_blocks={n_blocks}"


def test_knn_join_blocked_no_driver_materialization(spark, monkeypatch):
    """Building the blocked kNN plan must not collect anything to the
    driver — the round-1 scale-killer this operator replaces."""
    from pyspark.sql import DataFrame

    from outreach_etl_tool_spark.similarity import ann

    df = _rand_vecs(spark, n=16)
    for meth in ("collect", "toPandas", "head", "take", "toLocalIterator"):
        monkeypatch.setattr(
            DataFrame,
            meth,
            lambda self, *a, __m=meth, **kw: (_ for _ in ()).throw(
                AssertionError(f"driver materialization via {__m}")
            ),
        )
    out = ann.knn_join_blocked(df, k=3, n_blocks=4)  # must stay lazy
    assert out.columns == ["vec_id", "neighbor_id", "cos_sim"]


def test_knn_join_small_index_never_self_neighbor(spark):
    """Regression: with ≤ k index vectors the unmasked slice used to
    emit each vector as its own neighbor at cos 1.0."""
    from outreach_etl_tool_spark.similarity import ann

    df = _rand_vecs(spark, n=3)
    for out in (
        ann.knn_join_bruteforce(df, k=5),
        ann.knn_join_blocked(df, k=5, n_blocks=2),
    ):
        rows = out.collect()
        assert all(r["vec_id"] != r["neighbor_id"] for r in rows)
        per = {}
        for r in rows:
            per[r["vec_id"]] = per.get(r["vec_id"], 0) + 1
        assert per == {0: 2, 1: 2, 2: 2}  # n-1 neighbors each, no self


def test_knn_join_ivf_full_probe_is_exact(spark):
    """nprobe = n_cells ⇒ every probe visits every cell ⇒ the IVF join
    degrades gracefully to the exact answer (cells partition the index)."""
    from outreach_etl_tool_spark.similarity import ann

    df = _rand_vecs(spark, n=40, clusters=4)
    cents = ann.sample_centroids(df, n_cells=4)
    cells = ann.assign_cells(df, cents)
    exact = _knn_tuples(ann.knn_join_blocked(df, k=3, n_blocks=4))
    got = _knn_tuples(ann.knn_join_ivf(cells, cents, k=3, nprobe=4))
    assert got == exact


def test_knn_join_ivf_recall(spark):
    """Pruned probes (nprobe < n_cells) on clustered data keep most
    true neighbors — and never invent pairs the exact join lacks."""
    from outreach_etl_tool_spark.similarity import ann

    df = _rand_vecs(spark, n=120, dim=8, seed=5, clusters=6)
    cents = ann.sample_centroids(df, n_cells=6)
    cells = ann.assign_cells(df, cents)
    exact = {(a, b) for a, b, _ in _knn_tuples(ann.knn_join_blocked(df, k=3, n_blocks=4))}
    approx = {(a, b) for a, b, _ in _knn_tuples(ann.knn_join_ivf(cells, cents, k=3, nprobe=2))}
    assert len(approx & exact) / len(exact) >= 0.6
    # candidates come only from real cells: cos values are true cosines,
    # so any emitted pair must also be top-k-plausible — sanity: subset
    # of exact pairs' probe ids
    assert {a for a, _ in approx} <= {a for a, _ in exact}


# ---------------------------------------------- compression-ratio signal
def test_compression_ratio_detects_repetition(spark, monkeypatch):
    """Boilerplate compresses far better than varied prose: the
    repetitive doc's ratio must be well below the varied doc's, and
    both deterministic."""
    rep = "buy now click here " * 60
    varied = (
        "the sudden storm scattered gulls over the harbor while fishermen "
        "hauled dripping nets past rusted bollards and children counted "
        "waves breaking against the weathered granite pier every evening"
    )
    docs = spark.createDataFrame(
        [(1, rep), (2, varied), (3, "")], "doc_id long, text string"
    )
    import outreach_etl_tool_spark.queries.llm as L

    monkeypatch.setattr(L, "load_table", lambda *a: docs)
    got = {r["doc_id"]: r for r in L.compression_ratio(spark, "x").collect()}
    assert got[1]["compression_ratio"] < 0.5 * got[2]["compression_ratio"]
    assert got[2]["compression_ratio"] > 0.4
    assert got[3]["compression_ratio"] is None  # empty doc → null, no /0
    again = {r["doc_id"]: r["compression_ratio"]
             for r in L.compression_ratio(spark, "x").collect()}
    assert all(again[k] == got[k]["compression_ratio"] for k in (1, 2))


# ----------------------------------------------------------- tf-idf
def test_tfidf_ranks_rare_terms_first(spark, monkeypatch):
    """A term appearing in one doc outranks one appearing everywhere;
    ties break alphabetically; at most K terms per doc."""
    docs = spark.createDataFrame(
        [
            (1, "common common unique alpha"),
            (2, "common beta beta"),
            (3, "common gamma"),
        ],
        "doc_id long, text string",
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    out = P.tfidf_keywords(spark, "unused").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["tok"], r["score"]))
    # doc 1: 'common' tf=2 df=3 → 2*3/3=2.0; 'unique'/'alpha' tf=1 df=1 → 3.0
    assert [t for t, _ in by_doc[1]] == ["alpha", "unique", "common"]
    assert by_doc[1][0][1] == pytest.approx(3.0)
    # doc 2: 'beta' tf=2 df=1 → 6.0 beats 'common' 2.0
    assert [t for t, _ in by_doc[2]][0] == "beta"
    assert all(len(v) <= 5 for v in by_doc.values())


# ------------------------------------------------------- k-means IVF build
def test_kmeans_reduces_cosine_inertia(spark):
    """Lloyd refinement must not be worse than the first-k init it
    starts from, and on clustered data it should be clearly better."""
    from outreach_etl_tool_spark.similarity import ann, kmeans

    df = _rand_vecs(spark, n=160, dim=8, seed=3, clusters=5)
    init = ann.sample_centroids(df, n_cells=5)
    refined = kmeans.kmeans_centroids(df, k=5, iters=4)
    j_init = kmeans.inertia(df, init)
    j_ref = kmeans.inertia(df, refined)
    assert j_ref <= j_init + 1e-9
    assert j_ref < 0.9 * j_init  # clustered data: a real improvement


def test_kmeans_deterministic(spark):
    from outreach_etl_tool_spark.similarity import kmeans

    df = _rand_vecs(spark, n=60, dim=6, seed=9, clusters=3)
    a = kmeans.kmeans_centroids(df, k=3, iters=3)
    b = kmeans.kmeans_centroids(df, k=3, iters=3)
    assert a == b


def test_kmeans_improves_ivf_recall(spark):
    """Refined cells should recover at least as many true neighbors as
    the arbitrary first-k cells at the same nprobe budget."""
    from outreach_etl_tool_spark.similarity import ann, kmeans

    df = _rand_vecs(spark, n=120, dim=8, seed=5, clusters=6)
    exact = {(a, b) for a, b, _ in _knn_tuples(ann.knn_join_blocked(df, k=3, n_blocks=4))}

    def recall(cents):
        cells = ann.assign_cells(df, cents)
        approx = {
            (a, b)
            for a, b, _ in _knn_tuples(ann.knn_join_ivf(cells, cents, k=3, nprobe=2))
        }
        return len(approx & exact) / len(exact)

    r_init = recall(ann.sample_centroids(df, n_cells=6))
    r_ref = recall(kmeans.kmeans_centroids(df, k=6, iters=4))
    assert r_ref >= r_init - 0.02  # refinement never meaningfully hurts
    assert r_ref >= 0.7


def test_udf_zscore_is_global(spark):
    """The z-score must use GLOBAL moments (per-batch normalization
    changed under repartitioning — the round-1 semantic trap)."""
    import numpy as np

    from outreach_etl_tool_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {r["o_orderkey"]: r["price_z"]
           for r in REGISTRY["udf_scalar_zscore"].fn(spark, sf).collect()}
    import duckdb

    keys, prices = zip(*duckdb.sql(
        f"select o_orderkey, o_totalprice from '{sf}/orders.parquet'"
    ).fetchall())
    cents = np.round(np.asarray(prices) * 100)
    z = (cents - cents.mean()) / cents.std(ddof=0)
    assert len(got) == len(keys)
    for key, zi in zip(keys, z):
        assert got[key] == pytest.approx(zi, rel=1e-9), key


def test_decontaminate_flags_overlap(spark, monkeypatch):
    """Doc sharing a 4-gram with the eval doc (id 0 ≡ 0 mod 97) is
    flagged; the disjoint doc is not."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),  # eval (0 % 97 == 0)
            (1, "xx alpha beta gamma delta yy"),    # shares 'alpha beta gamma delta'
            (2, "one two three four five six"),     # disjoint
        ],
        "doc_id long, text string",
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    got = {r["doc_id"]: r for r in P.decontaminate(spark, "unused").collect()}
    assert set(got) == {1}
    assert got[1]["n_shared_grams"] == 1
    assert got[1]["n_eval_docs"] == 1


def test_bm25_ranks_term_dense_doc_first(spark, monkeypatch):
    """BM25 contract on a crafted corpus: the doc where query-1 terms
    ('hash join strategy') are dense and the doc is short must outrank
    a long doc that mentions them once; a doc with no query terms must
    not appear. Also pins the integer-scaling invariant: scores are
    exact BIGINTs (order-free sums), so repeated runs are identical."""
    docs = spark.createDataFrame(
        [
            (1, "hash join strategy hash join strategy hash join"),
            (2, "hash join strategy " + "padding word filler " * 40),
            (3, "completely unrelated text about nothing relevant"),
        ],
        "doc_id long, text string",
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    rows = P.bm25_retrieval(spark, "unused").collect()
    q1 = [(r["rank"], r["doc_id"], r["score_scaled"]) for r in rows
          if r["query_id"] == 1]
    assert [d for _, d, _ in sorted(q1)] == [1, 2]  # doc 3 absent
    assert q1[0][2] > q1[1][2] > 0
    rows2 = P.bm25_retrieval(spark, "unused").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


# ------------------------------------------------- corpus analytics (r8)
def test_source_token_divergence_literal(spark, monkeypatch):
    """Hand-computed TV distances. src_a={a:2,b:1}, src_b={a:1,b:2}
    (N=3 each): TV = 0.5*(1/3 + 1/3) = 1/3 exactly (the integer
    cross-multiplication makes this bit-exact, not approximate).
    src_c shares no token with src_a/src_b -> NO row (the operator's
    contract: only pairs sharing >=1 token appear; a fully-disjoint
    pair would be TV=1 but is indistinguishable from 'never compared'
    downstream, and materializing all C(S,2) pairs defeats the
    shared-token-only fan-out bound)."""
    docs = spark.createDataFrame(
        [
            (1, "aa aa bb", "src_a"),
            (2, "aa bb bb", "src_b"),
            (3, "cc cc cc", "src_c"),
        ],
        "doc_id long, text string, source string",
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    rows = {(r["source_a"], r["source_b"]): r for r in
            P.source_token_divergence(spark, "unused").collect()}
    assert set(rows) == {("src_a", "src_b")}
    r = rows[("src_a", "src_b")]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["tv_distance"] == pytest.approx(1.0 / 3.0, abs=0)


def test_source_token_divergence_identical_is_zero(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(1, "x y z x", "a"), (2, "x y z x", "b")],
        "doc_id long, text string, source string",
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    [r] = P.source_token_divergence(spark, "unused").collect()
    assert r["tv_distance"] == 0.0


def test_novelty_score_first_owner_wins(spark, monkeypatch):
    """doc 1 owns all its grams (novelty 1.0); doc 2 repeats doc 1
    verbatim (novelty 0.0); doc 3 shares one of its two grams."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # grams: a-b-g, b-g-d
            (2, "alpha beta gamma delta"),
            (3, "alpha beta gamma epsilon"),  # a-b-g (seen), b-g-e (new)
        ],
        "doc_id long, text string",
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
           for r in P.novelty_score(spark, "unused").collect()}
    assert got == {1: (2, 2, 1.0), 2: (2, 0, 0.0), 3: (2, 1, 0.5)}


def test_semdedup_prune_keeps_min_id_per_clique(spark, monkeypatch):
    """Two identical vectors (cosine 1 -> same cluster, min id kept)
    plus one vector far below the tau=0.4 gate (negated) -> singleton.
    Exercises the full composition: parity pairs -> connected
    components -> keeper flags."""
    import numpy as np

    rng = np.random.RandomState(3)
    v = rng.standard_normal(64).tolist()
    w = [-x for x in v]
    embs = spark.createDataFrame(
        [(10, v, 0), (11, v, 0), (12, w, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    import outreach_etl_tool_spark.queries.llm as L

    monkeypatch.setattr(L, "load_table", lambda *a: embs)
    got = {r["vec_id"]: (r["cluster_id"], r["is_keep"])
           for r in L.semdedup_prune(spark, "unused").collect()}
    assert got == {10: (10, True), 11: (10, False), 12: (12, True)}


def test_corpus_shuffle_shards_contract(spark, monkeypatch):
    """Shard assignment is total and deterministic; positions are
    1..n_shard dense; token_offset is the exclusive running sum of
    n_tokens in shard order (doc k starts where doc k-1 ended)."""
    docs = spark.createDataFrame(
        [(i, "word " * (i + 1)) for i in range(40)],
        "doc_id long, text string",
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    rows = P.corpus_shuffle_shards(spark, "unused").collect()
    assert len(rows) == 40
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1  # md5 spreads 40 docs over >1 of 16 shards
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rs] == list(range(1, len(rs) + 1))
        off = 0
        for r in rs:
            assert r["token_offset"] == off
            off += r["n_tokens"]
    rows2 = P.corpus_shuffle_shards(spark, "unused").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_semdedup_ivf_planted_exact_dups(spark, monkeypatch):
    """Exact duplicates share an argmax cell by construction, so the
    IVF tier's exact-dup recall is 1.0: every planted duplicate pair
    must land in one component with the min id kept; the unrelated
    orthogonal vector stays a singleton. Also pins determinism."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows = []
    for i in range(8):
        v = rng.standard_normal(64).tolist()
        rows.append((2 * i, v, 0))
        rows.append((2 * i + 1, v, 0))     # exact duplicate
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    import outreach_etl_tool_spark.queries.llm as L

    monkeypatch.setattr(L, "load_table", lambda *a: embs)
    got = {r["vec_id"]: (r["cluster_id"], r["is_keep"])
           for r in L.semdedup_ivf(spark, "unused").collect()}
    assert len(got) == 16
    for i in range(8):
        assert got[2 * i + 1][0] == got[2 * i][0]  # pair clustered together
        assert got[2 * i][1] or got[2 * i][0] < 2 * i  # min id of its comp kept
    kept = [v for v, (c, k) in got.items() if k]
    assert len(kept) <= 8  # at most one keeper per planted pair group
    got2 = {r["vec_id"]: (r["cluster_id"], r["is_keep"])
            for r in L.semdedup_ivf(spark, "unused").collect()}
    assert got == got2


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_source_token_divergence_matches_bruteforce(spark, monkeypatch, seed):
    """Randomized corpora vs an independent pure-python computation:
    same integer numerator, same single double division — the operator
    must agree bit-for-bit, including which pairs appear (shared-token
    pairs only)."""
    import random
    import re
    from collections import Counter

    rng = random.Random(seed)
    words = ["".join(chr(97 + int(c)) for c in str(i)) or "a"
             for i in range(12)]  # letter-only tokens (TOKEN_RE = [a-zA-Z]+)
    docs = [
        (i, " ".join(rng.choices(words, k=rng.randint(1, 15))),
         f"s{rng.randint(0, 3)}")
        for i in range(30)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string, source string")
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: sdf)
    got = {(r["source_a"], r["source_b"]):
           (r["n_a"], r["n_b"], r["tv_distance"])
           for r in P.source_token_divergence(spark, "unused").collect()}

    counts: dict[str, Counter] = {}
    for _, text, src in docs:
        counts.setdefault(src, Counter()).update(
            re.findall("[a-zA-Z]+", text.lower())
        )
    expected = {}
    srcs = sorted(counts)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            ca, cb = counts[a], counts[b]
            if not set(ca) & set(cb):
                continue
            na, nb = sum(ca.values()), sum(cb.values())
            num = sum(abs(ca[t] * nb - cb[t] * na) for t in set(ca) | set(cb))
            expected[(a, b)] = (na, nb, num / (2.0 * na * nb))
    assert got == expected


@pytest.mark.parametrize("seed", [0, 1])
def test_novelty_score_matches_bruteforce(spark, monkeypatch, seed):
    import random
    import re

    rng = random.Random(seed)
    words = ["".join(chr(110 + int(c)) for c in str(i)) for i in range(6)]
    docs = [
        (i, " ".join(rng.choices(words, k=rng.randint(0, 12))))
        for i in range(25)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: sdf)
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
           for r in P.novelty_score(spark, "unused").collect()}

    owner: dict[str, int] = {}
    grams_of: dict[int, set] = {}
    for i, text in docs:
        toks = re.findall("[a-zA-Z]+", text.lower())
        gs = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
        grams_of[i] = gs
        for g in gs:
            owner[g] = min(owner.get(g, i), i)
    expected = {
        i: (len(gs), sum(1 for g in gs if owner[g] == i),
            sum(1 for g in gs if owner[g] == i) / len(gs))
        for i, gs in grams_of.items() if gs
    }
    assert got == expected


def test_gopher_quality_filter_rule_boundaries(spark, monkeypatch):
    """One doc per rule violation plus a clean doc at the word-count
    boundary (exactly 50 words passes). Integer cross-multiplication
    means boundaries are exact, not float-fuzzy."""
    clean = " ".join(["the", "have"] + ["world"] * 48)          # 50 words
    short = "the have world"                                     # < 50
    tiny_words = " ".join(["the", "have"] + ["a"] * 48)          # mean len < 3
    symbols = " ".join(["the", "have"] + ["world"] * 48) + " " + "#" * 10
    bullets = "\n".join(["- " + w for w in ["the", "have"] + ["world"] * 48])
    ellipsis = "\n".join(
        [" ".join(["the", "have"] + ["world"] * 18) + "..."] * 3
    )
    no_stop = " ".join(["world"] * 50)
    docs = spark.createDataFrame(
        [
            (1, clean), (2, short), (3, tiny_words), (4, symbols),
            (5, bullets), (6, ellipsis), (7, no_stop),
        ],
        "doc_id long, text string",
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    rows = {r["doc_id"]: r for r in
            P.gopher_quality_filter(spark, "unused").collect()}
    assert rows[1]["keep"]
    assert not rows[2]["r_word_count"] and not rows[2]["keep"]
    assert not rows[3]["r_mean_word_len"] and not rows[3]["keep"]
    assert not rows[4]["r_symbol_ratio"] and not rows[4]["keep"]
    assert not rows[5]["r_bullet"] and not rows[5]["keep"]
    assert not rows[6]["r_ellipsis"] and not rows[6]["keep"]
    assert not rows[7]["r_stopwords"] and not rows[7]["keep"]
    # non-violated rules stay green on the violating docs
    assert rows[5]["r_word_count"] and rows[5]["r_stopwords"]


def test_decontaminate_extents_exact_coordinates(spark, monkeypatch):
    """A 70-char eval passage planted at a known (misaligned) offset
    inside one train doc must come back as exactly one extent with
    1-based start = offset+1, len = 70, n_grams = 70-64+1 = 7, and
    n_eval_docs = 1; clean train docs must produce nothing."""
    import random
    import string

    rng = random.Random(5)

    def rand_text(n):
        return "".join(rng.choices(string.ascii_lowercase + " ", k=n))

    secret = rand_text(70)
    docs = spark.createDataFrame(
        [
            (0, secret),                                   # eval (0 % 7 == 0)
            (1, rand_text(80)),
            (3, rand_text(13) + secret + rand_text(20)),   # contaminated
            (5, rand_text(90)),
        ],
        "doc_id long, text string",
    )
    import outreach_etl_tool_spark.queries.llm as L

    monkeypatch.setattr(L, "load_table", lambda *a: docs)
    rows = L.decontaminate_extents(spark, "unused").collect()
    assert [tuple(r) for r in rows] == [(3, 14, 70, 7, 1)]


def test_decontaminate_excise_removes_planted_secret(spark, monkeypatch):
    """The cleaned train doc must equal prefix+suffix exactly (md5 and
    length pinned); untouched train docs pass through with
    kept_chars == n_chars; eval docs are absent from the output."""
    import hashlib
    import random
    import string

    rng = random.Random(9)

    def rand_text(n):
        return "".join(rng.choices(string.ascii_lowercase + " ", k=n))

    secret = rand_text(70)
    pre, post = rand_text(13), rand_text(20)
    clean_doc = rand_text(80)
    docs = spark.createDataFrame(
        [(0, secret), (1, clean_doc), (3, pre + secret + post)],
        "doc_id long, text string",
    )
    import outreach_etl_tool_spark.queries.llm as L

    monkeypatch.setattr(L, "load_table", lambda *a: docs)
    rows = {r["doc_id"]: r for r in
            L.decontaminate_excise(spark, "unused").collect()}
    assert set(rows) == {1, 3}  # eval doc 0 excluded
    assert rows[1]["kept_chars"] == rows[1]["n_chars"] == 80
    expected = pre + post
    assert rows[3]["n_chars"] == 103
    assert rows[3]["kept_chars"] == len(expected)
    assert rows[3]["cleaned_md5"] == hashlib.md5(expected.encode()).hexdigest()


def test_pipeline_curation_funnel_stages(spark, monkeypatch):
    """Hand-built funnel: 4 train docs in srcA — one clean keeper, an
    exact duplicate of it (drops at dedup), a too-short doc (drops at
    quality), and a quality-passing doc leaking an eval 4-gram (drops
    at decon). Counts must be 4 -> 3 -> 2 -> 1 with tokens_clean =
    the keeper's 50 words; the eval-only source never appears."""
    good = "the have " + "world " * 47 + "world"          # 50 words, passes
    leak = "the have " + "world " * 46 + "alpha beta gamma delta"  # 52 words
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta", "srcB"),  # eval
            (1, good, "srcA"),
            (2, good, "srcA"),           # exact duplicate
            (3, "too short", "srcA"),
            (4, leak, "srcA"),
        ],
        "doc_id long, text string, source string",
    )
    import outreach_etl_tool_spark.queries.pipeline as P

    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    rows = {r["source"]: r
            for r in P.pipeline_curation_funnel(spark, "unused").collect()}
    assert set(rows) == {"srcA"}
    r = rows["srcA"]
    assert (r["n_docs"], r["n_quality"], r["n_dedup"], r["n_clean"]) == (4, 3, 2, 1)
    assert r["tokens_clean"] == 50
    # marginal pre-gate stage measurements (round-10: the funnel must
    # report non-trivial numbers even where the sequential tail zeroes)
    assert r["tokens_in"] == 50 + 50 + 2 + 52
    assert r["n_unique_marginal"] == 3   # dup of 'good' collapses
    assert r["n_decon_clean_marginal"] == 3  # only the leak doc flags


def test_pipeline_curation_funnel_nontrivial_on_driver_corpus(spark):
    """The oracle-green-but-DEGENERATE lesson (round 9): agreement on
    all-zero counts certifies nothing. On the driver's raw sf0.01
    corpus the Gopher stopword rule legitimately zeroes the sequential
    tail, so the funnel's marginal pre-gate columns are what the hash
    gate must certify as non-trivial — assert they actually are."""
    import outreach_etl_tool_spark.queries.pipeline as P

    rows = P.pipeline_curation_funnel(spark, "/root/testdata/sf0.01").collect()
    assert rows
    assert sum(r["tokens_in"] for r in rows) > 0
    assert sum(r["n_unique_marginal"] for r in rows) > 0
    assert sum(r["n_decon_clean_marginal"] for r in rows) > 0


# ------------------------------------------------------------- k-core
def _py_kcore(edges, k):
    import collections

    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for p in adj.pop(n):
                    adj[p].discard(n)
                changed = True
    return {n: len(ps) for n, ps in adj.items()}


@pytest.mark.parametrize("fast_path", [10**6, 0])
def test_kcore_triangle_with_tail(spark, fast_path):
    """Triangle + pendant tail: the 2-core is exactly the triangle
    (tail peels, which lowers nothing below 2); the 3-core is empty.
    Runs both the driver peel and the distributed loop."""
    from outreach_etl_tool_spark.queries.graph import kcore_nodes

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long"
    )
    got2 = {r["node"]: r["core_degree"]
            for r in kcore_nodes(e, 2, driver_fast_path_max_edges=fast_path).collect()}
    assert got2 == {1: 2, 2: 2, 3: 2}
    assert kcore_nodes(e, 3, driver_fast_path_max_edges=fast_path).count() == 0


@pytest.mark.parametrize("seed", [0, 1])
def test_kcore_matches_python_peel(spark, seed):
    """Random graph vs the independent python peel — both execution
    paths must agree with it exactly (node set AND core degrees)."""
    import random

    from outreach_etl_tool_spark.queries.graph import kcore_nodes

    rng = random.Random(seed)
    edges = list({tuple(sorted(rng.sample(range(30), 2))) for _ in range(60)})
    expected = _py_kcore(edges, 3)
    e = spark.createDataFrame(edges, "u long, v long")
    for fp in (10**6, 0):
        got = {r["node"]: r["core_degree"]
               for r in kcore_nodes(e, 3, driver_fast_path_max_edges=fp).collect()}
        assert got == expected


def test_gopher_repetition_hand_computed(spark, monkeypatch):
    """Hand-built docs with known n-gram structure: exact counts, char
    masses, interval-union coverage, and the lexicographic tie-break.
    doc 1: 'a b c a b c a b d' -> top 2-gram 'a b' x3; every 3-gram
           and 4-gram count ties at 2 -> smallest wins.
    doc 2: an 11-token doc whose 5-gram at positions 1 and 6 repeats
           -> covered positions 1..10 of 11 (overlap union, not sum).
    doc 3: one token -> no grams anywhere; zero mass, all keeps true.
    """
    import outreach_etl_tool_spark.queries.pipeline as P

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b d"),
            (2, "x y z w v x y z w v q"),
            (3, "lonely"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(P, "load_table", lambda *a: docs)

    top = {(r["doc_id"], r["n"]): r
           for r in P.gopher_topgram_frac(spark, "unused").collect()}
    # doc 1: total chars = 9 (nine 1-char tokens)
    r = top[(1, 2)]
    assert (r["top_gram"], r["top_count"], r["top_chars"]) == ("a b", 3, 6)
    assert r["total_chars"] == 9 and r["top_gram_char_frac"] == 6 / 9
    assert not r["keep"]  # 600 > 20*9
    # ties at count 2 -> lexicographically smallest gram
    assert top[(1, 3)]["top_gram"] == "a b c" and top[(1, 3)]["top_count"] == 2
    assert top[(1, 4)]["top_gram"] == "a b c a" and top[(1, 4)]["top_chars"] == 8
    # doc 3: no grams at all
    r = top[(3, 2)]
    assert (r["top_gram"], r["top_count"], r["top_chars"]) == ("", 0, 0)
    assert r["total_chars"] == 6 and r["keep"]

    cov = {(r["doc_id"], r["n"]): r
           for r in P.gopher_dupgram_coverage(spark, "unused").collect()}
    # doc 2: dup 5-gram starts at 1 and 6 -> union [1..5] u [6..10] = 10
    r = cov[(2, 5)]
    assert r["covered_chars"] == 10 and r["total_chars"] == 11
    assert r["dup_char_frac"] == 10 / 11 and not r["keep"]  # 1000 > 15*11
    for n in range(6, 11):  # no duplicated longer grams
        assert cov[(2, n)]["covered_chars"] == 0 and cov[(2, n)]["keep"]
    # doc 1: dup 5-gram 'a b c a b' at 1 and 4 -> union [1..5] u [4..8] = 8
    r = cov[(1, 5)]
    assert r["covered_chars"] == 8 and not r["keep"]
    # doc 3: too short for every n
    for n in range(5, 11):
        assert cov[(3, n)]["covered_chars"] == 0 and cov[(3, n)]["keep"]


def test_graph_edge_jaccard_hand_graph(spark, monkeypatch):
    """K4 plus a pendant: every clique edge's common-neighbor count is
    its triangle support; the pendant edge (no common neighbors) falls
    below the tau=1/20 gate and is dropped."""
    import outreach_etl_tool_spark.queries.graph as G

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "u long, v long",
    )
    monkeypatch.setattr(G, "_copurchase_edges", lambda *a: e)
    rows = {(r["u"], r["v"]): r
            for r in G.graph_edge_jaccard(spark, "unused").collect()}
    assert set(rows) == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)}
    # inner K4 edges between degree-3 nodes: 2 common / (3+3-2) = 0.5
    assert rows[(1, 2)]["common"] == 2 and rows[(1, 2)]["jaccard"] == 0.5
    # edges touching node 4 (degree 4 via the pendant): 2 / (3+4-2)
    assert rows[(1, 4)]["deg_u"] == 3 and rows[(1, 4)]["deg_v"] == 4
    assert rows[(1, 4)]["jaccard"] == 2 / 5


def test_doc_fingerprint_poly_matches_independent_fold(spark, monkeypatch):
    """The portable fingerprint must equal an independent hashlib
    replay of the same Horner fold (md5-prefix token hash, B=1000003,
    M=2^31-1) — and the empty-token doc folds to 0."""
    import hashlib
    import re

    import outreach_etl_tool_spark.queries.llm as L

    docs = spark.createDataFrame(
        [(1, "Key Agg Row scan SLOW"), (2, "...!!!"), (3, "spark")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(L, "load_table", lambda *a: docs)
    got = {r["doc_id"]: (r["fp"], r["n_tokens"])
           for r in L.doc_fingerprint_poly(spark, "unused").collect()}

    B, M = 1000003, (1 << 31) - 1

    def fold(text):
        toks = re.findall("[a-zA-Z]+", text.lower())
        acc = 0
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:7], 16)
            acc = (acc * B + h) % M
        return acc, len(toks)

    assert got == {1: fold("Key Agg Row scan SLOW"),
                   2: (0, 0), 3: fold("spark")}
    # order sensitivity: same tokens, different order -> different fp
    assert fold("key agg")[0] != fold("agg key")[0]


def test_sim_range_search_planted_vectors(spark, monkeypatch):
    """Planted 64-dim vectors against query id 0 (= e1): a duplicate
    passes at cosine 1, the 45-degree mix passes at ~0.707, the
    orthogonal vector (dot 0) and the antipode (dot < 0) are excluded
    by the dq > 0 side of the exact integer gate."""
    import math

    import outreach_etl_tool_spark.queries.llm as L

    def vec(*pairs):
        v = [0.0] * 64
        for i, x in pairs:
            v[i] = x
        return v

    rows = [
        (0, vec((0, 1.0))),            # query: e1
        (1, vec((0, 1.0))),            # duplicate -> cosine 1.0
        (2, vec((1, 1.0))),            # orthogonal -> dq = 0, excluded
        (3, vec((0, -1.0))),           # antipode -> dq < 0, excluded
        (4, vec((0, 1.0), (1, 1.0))),  # 45 degrees -> ~0.7071
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    monkeypatch.setattr(L, "load_table", lambda *a: embs)
    got = {r["vec_id"]: r["cosine"]
           for r in L.sim_range_search(spark, "unused").collect()}
    assert set(got) == {1, 4}
    assert got[1] == 1.0
    assert abs(got[4] - 1 / math.sqrt(2)) < 1e-12


@pytest.mark.parametrize("seed", [7, 19])
def test_gopher_dupgram_coverage_matches_bruteforce(spark, monkeypatch, seed):
    """Randomized small-vocab docs (heavy repetition by construction)
    vs an independent python interval-union replica, all n in 5..10."""
    import random
    import re
    from collections import Counter

    import outreach_etl_tool_spark.queries.pipeline as P

    rng = random.Random(seed)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(12)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(P, "load_table", lambda *a: sdf)
    got = {(r["doc_id"], r["n"]): (r["covered_chars"], r["total_chars"])
           for r in P.gopher_dupgram_coverage(spark, "unused").collect()}

    for i, text in docs:
        toks = re.findall("[a-zA-Z]+", text.lower())
        total = sum(len(t) for t in toks)
        for n in range(5, 11):
            grams = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
            cnt = Counter(grams)
            covered = set()
            for j, g in enumerate(grams):
                if cnt[g] >= 2:
                    covered.update(range(j, j + n))
            cc = sum(len(toks[p]) for p in covered)
            assert got[(i, n)] == (cc, total), (i, n)


@pytest.mark.parametrize("seed", [3, 11])
def test_graph_edge_jaccard_matches_bruteforce(spark, monkeypatch, seed):
    """Random graphs vs an independent adjacency-set replica: the full
    tau-gated (edge, common, jaccard) set must agree exactly."""
    import random

    import outreach_etl_tool_spark.queries.graph as G

    rng = random.Random(seed)
    edges = sorted({tuple(sorted(rng.sample(range(25), 2))) for _ in range(70)})
    e = spark.createDataFrame(edges, "u long, v long")
    monkeypatch.setattr(G, "_copurchase_edges", lambda *a: e)
    got = {(r["u"], r["v"]): (r["common"], r["jaccard"])
           for r in G.graph_edge_jaccard(spark, "unused").collect()}

    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected = {}
    for u, v in edges:
        common = len(adj[u] & adj[v])
        union = len(adj[u]) + len(adj[v]) - common
        if 20 * common >= union:
            expected[(u, v)] = (common, common / union)
    assert got == expected


def test_graph_triangles_priority_vs_id_order(spark, monkeypatch):
    """Regression: a triangle whose two higher-priority corners sort
    the other way by id (pendants on node 2 make priority 1 < 3 < 2)
    was silently dropped by the id-ordered wedge pair."""
    import outreach_etl_tool_spark.queries.graph as G

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (2, 5)], "u long, v long"
    )
    monkeypatch.setattr(G, "_copurchase_edges", lambda *a: e)
    got = {r["node"]: r["n_triangles"]
           for r in G.graph_triangles(spark, "unused").collect()}
    assert got == {1: 1, 2: 1, 3: 1}


@pytest.mark.parametrize("bad", [1 << 31, -1])
def test_graph_triangles_packed_key_fails_loud(spark, monkeypatch, bad):
    """The 64-bit packed closing key raises on ids outside [0, 2^31)
    — both overflowing AND negative ids (round-14 ADVICE: the prior
    eager max() guard missed negatives and cost an extra scan). The
    check lives inside the packing expression, so it surfaces as an
    execution-time error, not a silent mis-pack."""
    import outreach_etl_tool_spark.queries.graph as G

    e = spark.createDataFrame(
        [(1, 2), (1, bad), (2, bad)], "u long, v long"
    )
    monkeypatch.setattr(G, "_copurchase_edges", lambda *a: e)
    with pytest.raises(Exception, match="2\\^31"):
        G.graph_triangles(spark, "unused").collect()


@pytest.mark.parametrize("seed", [5, 23])
def test_graph_triangles_matches_bruteforce(spark, monkeypatch, seed):
    """Random graphs vs an independent O(n^3) corner count."""
    import itertools
    import random

    import outreach_etl_tool_spark.queries.graph as G

    rng = random.Random(seed)
    edges = sorted({tuple(sorted(rng.sample(range(20), 2))) for _ in range(55)})
    eset = set(edges)
    e = spark.createDataFrame(edges, "u long, v long")
    monkeypatch.setattr(G, "_copurchase_edges", lambda *a: e)
    got = {r["node"]: r["n_triangles"]
           for r in G.graph_triangles(spark, "unused").collect()}

    expected: dict[int, int] = {}
    nodes = sorted({n for ed in edges for n in ed})
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (a, c) in eset and (b, c) in eset:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    assert got == expected


@pytest.mark.parametrize("seed", [2, 13])
def test_graph_pagerank_matches_independent_replica(spark, monkeypatch, seed):
    """Random graphs vs an independent python replay of the defined
    semantics (degree-priority orientation, dangling mass dropped,
    floor(r/outd) contributions, 3 damped iterations). Structural bugs
    (orientation wiring, dangling handling, join keys) shift ranks by
    whole contribution units; rounding-mode corners shift the 1e9-
    scaled integers by at most 1, so the tolerance is 2 units = 2e-9."""
    import math
    import random

    import outreach_etl_tool_spark.queries.graph as G

    rng = random.Random(seed)
    edges = sorted({tuple(sorted(rng.sample(range(18), 2))) for _ in range(40)})
    e = spark.createDataFrame(edges, "u long, v long")
    monkeypatch.setattr(G, "_copurchase_edges", lambda *a: e)
    got = {r["node"]: r["pagerank"]
           for r in G.graph_pagerank(spark, "unused").collect()}

    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    oriented = [
        (u, v) if (deg[u], u) < (deg[v], v) else (v, u) for u, v in edges
    ]
    nodes = sorted({n for ed in oriented for n in ed})
    outd: dict[int, int] = {}
    for s, _ in oriented:
        outd[s] = outd.get(s, 0) + 1
    scale = 1_000_000_000
    r = {n: scale for n in nodes}
    for _ in range(3):
        sc = {n: 0 for n in nodes}
        for s, d in oriented:
            sc[d] += math.floor(r[s] / outd[s])
        r = {n: math.floor(0.15 * scale + 0.85 * sc[n] + 0.5) for n in nodes}
    expected = {n: rv / scale for n, rv in r.items()}

    assert set(got) == set(expected)
    for n in expected:
        assert abs(got[n] - expected[n]) <= 2 / scale, (n, got[n], expected[n])


def test_containment_join_detects_quotes_asymmetrically(spark, monkeypatch):
    """A short passage fully contained in a long doc: containment
    short->long is 1.0 (reported) while long->short is 2/8 (excluded)
    — the asymmetry Jaccard cannot express. Partial overlap below
    tau=1/2 stays out."""
    import outreach_etl_tool_spark.queries.llm as L

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # 8 shingles
            (2, "c d e f"),               # 2 shingles, both inside doc 1
            (3, "a b c x y z"),           # 4 shingles, only 'a b c' shared
            (4, "q r s t"),               # disjoint
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(L, "load_table", lambda *a: docs)
    got = {(r["src_id"], r["dst_id"]): r
           for r in L.dedup_containment_join(spark, "unused").collect()}
    assert set(got) == {(2, 1)}
    r = got[(2, 1)]
    assert (r["n_inter"], r["n_src"], r["n_dst"]) == (2, 2, 8)
    assert r["containment"] == 1.0


def test_evt_attribution_last_touch_hand_built(spark, monkeypatch):
    """Latest touch wins (not the first), purchases with no preceding
    touch fall to 'organic', a same-timestamp touch counts when its
    event_id sorts earlier, and non-touch types never attribute."""
    import datetime as dt

    import outreach_etl_tool_spark.queries.events as E

    t0 = dt.datetime(2024, 1, 1)
    s = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # user 1: click(c2) then view(c0) then purchase -> c0
        (1, s(0), 1, "click", 0.0, '{"k": 7}'),
        (2, s(1), 1, "view", 0.0, '{"k": 10}'),
        (3, s(2), 1, "purchase", 10.0, '{"k": 1}'),
        # user 2: purchase with no touch -> organic
        (4, s(0), 2, "purchase", 5.0, '{"k": 2}'),
        # user 3: click at the SAME ts as the purchase, smaller id -> c3
        (5, s(0), 3, "click", 0.0, '{"k": 3}'),
        (6, s(0), 3, "purchase", 2.5, '{"k": 9}'),
        # user 4: error/signup are not touches -> organic
        (7, s(0), 4, "error", 0.0, '{"k": 4}'),
        (8, s(1), 4, "signup", 0.0, '{"k": 4}'),
        (9, s(2), 4, "purchase", 1.25, '{"k": 4}'),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(E, "load_table", lambda *a: ev)
    got = {r["campaign"]: (r["n_purchases"], r["revenue"])
           for r in E.evt_attribution_last_touch(spark, "unused").collect()}
    assert got == {"c0": (1, 10.0), "organic": (2, 6.25), "c3": (1, 2.5)}


def test_dq_volume_anomaly_planted_spike(spark, monkeypatch):
    """14 steady days at 100 events, day 15 spikes to 200: exactly day
    15 flags (|200-100|*10 > 2*100); warm-up days 1-6 are excluded;
    steady days stay quiet. Exercises the value-picked median."""
    import datetime as dt

    import outreach_etl_tool_spark.queries.sqlplus as S

    rows = []
    eid = 0
    for d in range(1, 16):
        n = 200 if d == 15 else 100
        for i in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, d, i % 24), 1, "view", 0.0, "{}")
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(S, "load_table", lambda *a: ev)
    got = {str(r["day"]): (r["n_events"], r["med7"], r["is_anomaly"])
           for r in S.dq_volume_anomaly(spark, "unused").collect()}
    assert len(got) == 9  # days 7..15
    assert got["2024-03-15"] == (200, 100, True)
    for d in range(7, 15):
        assert got[f"2024-03-{d:02d}"] == (100, 100, False)


def test_evt_top_paths_order_and_truncation(spark, monkeypatch):
    """Paths use the first 5 events in (ts, event_id) order — a 6th
    event never appears; same-timestamp events order by event_id; the
    top-k tiebreak is (count desc, path asc)."""
    import datetime as dt

    import outreach_etl_tool_spark.queries.events as E

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # two users with the identical 6-event stream: path = first 5 only
    for u in (1, 2):
        for i, et in enumerate(["view", "click", "view", "signup",
                                "purchase", "error"]):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, et, 0.0, "{}"))
    # user 3: two events at the SAME ts -> event_id breaks the tie
    rows.append((100, t0, 3, "click", 0.0, "{}"))
    rows.append((101, t0, 3, "view", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(E, "load_table", lambda *a: ev)
    got = [(r["path"], r["n_users"])
           for r in E.evt_top_paths(spark, "unused").collect()]
    assert got == [("view>click>view>signup>purchase", 2),
                   ("click>view", 1)]


def test_evt_peak_concurrency_hand_built(spark, monkeypatch):
    """Three overlapping sessions + a midnight-spanning session: day 1
    peaks at 3 (the spanning session still open when two more start);
    day 2 starts with the spanning session already active (baseline 1
    via the day-clipped +1 at 00:00); touching intervals (end == next
    start) count as concurrent."""
    import datetime as dt

    import outreach_etl_tool_spark.queries.events as E

    def mk(eid, day, h, m, u):
        return (eid, dt.datetime(2024, 5, day, h, m), u, "view", 0.0, "{}")

    rows = [
        # user 1: 23:00 day1 -> 00:40 day2 (one session, gap < 30 min)
        mk(1, 1, 23, 0, 1), mk(2, 1, 23, 25, 1), mk(3, 1, 23, 50, 1),
        mk(4, 2, 0, 15, 1), mk(5, 2, 0, 40, 1),
        # user 2: 23:10 -> 23:30 day1
        mk(6, 1, 23, 10, 2), mk(7, 1, 23, 30, 2),
        # user 3: starts exactly when user 2 ends (touching -> concurrent)
        mk(8, 1, 23, 30, 3), mk(9, 1, 23, 45, 3),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(E, "load_table", lambda *a: ev)
    got = {str(r["day"]): (r["peak_concurrency"], r["peak_first_ts"])
           for r in E.evt_peak_concurrency(spark, "unused").collect()}
    # day 1: u1 active 23:00-, u2 23:10-23:30, u3 23:30-23:45 -> peak 3
    # first reached at 23:30 (u3 start coincides with u2 end, inclusive)
    assert got["2024-05-01"] == (3, dt.datetime(2024, 5, 1, 23, 30))
    # day 2: only the spanning u1 session, active from midnight
    assert got["2024-05-02"] == (1, dt.datetime(2024, 5, 2, 0, 0))


def test_basket_pair_lift_hand_built(spark, monkeypatch):
    """4 baskets: pair (1,2) co-occurs in 3 of 4 baskets with
    c(1)=c(2)=3 -> lift = 4*3/9; pair (1,3) co-occurs twice and is cut
    by minsup=3; duplicate line items inside one order count once."""
    import outreach_etl_tool_spark.queries.extended as X

    rows = [
        (10, 1), (10, 1), (10, 2), (10, 3),   # dup (10,1) collapses
        (20, 1), (20, 2),
        (30, 1), (30, 2), (30, 3),
        (40, 4),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    monkeypatch.setattr(X, "load_table", lambda *a: li)
    got = {(r["u"], r["v"]): r for r in
           X.basket_pair_lift(spark, "unused").collect()}
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert (r["n_both"], r["n_u"], r["n_v"]) == (3, 3, 3)
    assert r["support"] == 3 / 4 and r["lift"] == 12 / 9


def test_evt_pointintime_join_compression_invariance(spark, monkeypatch):
    """Repeated same-type observations compress to one version, but the
    point-in-time answer is unchanged; a purchase at the exact instant
    of a state change picks the NEW version (valid_from inclusive);
    purchases before any observation get null state."""
    import datetime as dt

    import outreach_etl_tool_spark.queries.events as E

    t = lambda m: dt.datetime(2024, 6, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 7, "view", 0.0, "{}"),
        (2, t(5), 7, "view", 0.0, "{}"),      # compresses into version 1
        (3, t(7), 7, "purchase", 1.0, "{}"),  # inside the view regime
        (4, t(10), 7, "click", 0.0, "{}"),    # state change
        (5, t(10), 7, "purchase", 1.0, "{}"), # same instant -> click
        (6, t(20), 7, "purchase", 1.0, "{}"), # after -> click
        (7, t(0), 8, "purchase", 1.0, "{}"),  # user 8: no obs -> null
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(E, "load_table", lambda *a: ev)
    got = {r["event_id"]: r["state"]
           for r in E.evt_pointintime_join(spark, "unused").collect()}
    assert got == {3: "view", 5: "click", 6: "click", 7: None}


def test_evt_active_streaks_hand_built(spark, monkeypatch):
    """User 1 is active days 1-3 and 5 (streaks 3 and 1, multiple
    events on one day count once); user 2 is active days 1-2 (streak
    2); histogram: len 1 x1, len 2 x1, len 3 x1."""
    import datetime as dt

    import outreach_etl_tool_spark.queries.events as E

    rows = []
    eid = 0
    for u, day, n in [(1, 1, 2), (1, 2, 1), (1, 3, 1), (1, 5, 1),
                      (2, 1, 1), (2, 2, 3)]:
        for i in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 7, day, 8 + i), u,
                         "view", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(E, "load_table", lambda *a: ev)
    got = {r["streak_len"]: (r["n_streaks"], r["n_users"])
           for r in E.evt_active_streaks(spark, "unused").collect()}
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 1)}


def test_emb_drift_monitor_identical_and_orthogonal(spark, monkeypatch):
    """Label 0: both cohorts centered on e1 -> cosine 1.0. Label 1:
    reference on e1, current on e2 -> cosine 0.0. Pins the cohort
    split (even=reference) and the quantized-integer cosine."""
    import outreach_etl_tool_spark.queries.llm as L

    def vec(i, x=1.0):
        v = [0.0] * 64
        v[i] = x
        return v

    rows = [
        (0, vec(0), 0), (2, vec(0, 0.5), 0),   # ref cohort, label 0
        (1, vec(0, 2.0), 0), (3, vec(0), 0),   # cur cohort, label 0
        (10, vec(0), 1), (12, vec(0), 1),      # ref cohort, label 1
        (11, vec(1), 1), (13, vec(1), 1),      # cur cohort, label 1
    ]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(L, "load_table", lambda *a: embs)
    got = {r["label"]: r for r in
           L.emb_drift_monitor(spark, "unused").collect()}
    assert got[0]["centroid_cosine"] == 1.0
    assert got[1]["centroid_cosine"] == 0.0
    assert (got[0]["n_ref"], got[0]["n_cur"]) == (2, 2)


def _py_tokens(text):
    import re
    return re.findall("[a-zA-Z]+", text.lower())


def test_bm25_retrieval_matches_python_replica(spark, monkeypatch):
    """Independent python replay of the exact integer BM25 math
    (floor divisions on positives == Spark div == DuckDB //) over a
    randomized small-vocab corpus — catches formula-translation bugs
    the shared-shape oracle cannot."""
    import random
    from collections import Counter

    import outreach_etl_tool_spark.queries.pipeline as P

    rng = random.Random(17)
    vocab = ["hash", "join", "strategy", "window", "aggregation",
             "stream", "columnar", "scan", "filter", "noise", "other"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30))))
            for i in range(25)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(P, "load_table", lambda *a: sdf)
    got = {(r["query_id"], r["rank"]): (r["doc_id"], r["score_scaled"])
           for r in P.bm25_retrieval(spark, "unused").collect()}

    toks = {i: _py_tokens(t) for i, t in docs}
    tf = {i: Counter(ts) for i, ts in toks.items()}
    dl = {i: len(ts) for i, ts in toks.items()}
    l_tot = sum(dl.values())
    n_docs = sum(1 for ts in toks.values() if ts)
    qset = {t for _, terms in P._BM25_QUERIES for t in terms}
    dfreq = Counter(t for i in tf for t in tf[i] if t in qset)

    expected = {}
    for qid, terms in P._BM25_QUERIES:
        scores = {}
        for i in tf:
            s = 0
            for t in terms:
                if tf[i].get(t):
                    f = tf[i][t]
                    contrib = (
                        ((n_docs * 1000) // dfreq[t])
                        * (((44 * l_tot) * f * 100000)
                           // (((20 * l_tot) * f + 6 * l_tot)
                              + (18 * n_docs) * dl[i]))
                    ) // 100000
                    s += contrib
            if s:
                scores[i] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (i, s) in enumerate(ranked[:10], 1):
            expected[(qid, rank)] = (i, s)
    assert got == expected


def test_tfidf_keywords_matches_python_replica(spark, monkeypatch):
    """Independent replay of the integer-scaled tf-idf score and the
    (score desc, token asc) top-5 cut."""
    import random
    from collections import Counter

    import outreach_etl_tool_spark.queries.pipeline as P

    rng = random.Random(23)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
            for i in range(20)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(P, "load_table", lambda *a: sdf)
    got = {(r["doc_id"], r["tok"]): (r["tf"], r["score"])
           for r in P.tfidf_keywords(spark, "unused").collect()}

    tf = {i: Counter(_py_tokens(t)) for i, t in docs}
    dfreq = Counter(t for i in tf for t in tf[i])
    n_total = len(docs)
    expected = {}
    for i in tf:
        scored = [(t, f, (f * n_total) / dfreq[t]) for t, f in tf[i].items()]
        scored.sort(key=lambda x: (-x[2], x[0]))
        for t, f, s in scored[:5]:
            expected[(i, t)] = (f, s)
    assert got == expected


def test_lm_quality_score_matches_python_replica(spark, monkeypatch):
    """Independent replay of the rational bigram-LM score: corpus
    bigram conditionals scaled to 1e9 integers (HALF_UP on the
    shortest-repr double, matching both engines' ROUND), summed
    order-free, one final division."""
    import random
    from collections import Counter
    from decimal import Decimal, ROUND_HALF_UP

    import outreach_etl_tool_spark.queries.sqlplus as S

    rng = random.Random(31)
    vocab = ["red", "green", "blue", "cyan"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
            for i in range(15)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(S, "load_table", lambda *a: sdf)
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_bigram_prob"])
           for r in S.lm_quality_score(spark, "unused").collect()}

    occ = {i: list(zip(ts, ts[1:]))
           for i, t in docs for ts in [_py_tokens(t)]}
    counts = Counter(p for ps in occ.values() for p in ps)
    prev_tot = Counter()
    for (a, _), c in counts.items():
        prev_tot[a] += c

    def scaled(pair):
        x = 1e9 * (counts[pair] / prev_tot[pair[0]])
        return int(Decimal(repr(x)).quantize(0, ROUND_HALF_UP))

    expected = {}
    for i, ps in occ.items():
        if not ps:
            continue
        expected[i] = (len(ps),
                       sum(scaled(p) for p in ps) / (1e9 * len(ps)))
    assert got == expected


def test_source_overlap_jaccard_matches_python_replica(spark, monkeypatch):
    """Independent replay over a randomized corpus: per-source distinct
    3-token shingle sets (short docs floor to one whole-doc shingle),
    pairwise intersections and Jaccard."""
    import random

    import outreach_etl_tool_spark.queries.pipeline as P

    rng = random.Random(41)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = []
    for i in range(40):
        n = rng.randint(1, 12)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n)),
                     f"s{rng.randint(0, 3)}"))
    sdf = spark.createDataFrame(docs, "doc_id long, text string, source string")
    monkeypatch.setattr(P, "load_table", lambda *a: sdf)
    got = {(r["source_a"], r["source_b"]): (r["n_inter"], r["jaccard"])
           for r in P.source_overlap_jaccard(spark, "unused").collect()}

    sets: dict[str, set] = {}
    for _, text, src in docs:
        toks = _py_tokens(text)
        sh = ({" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
              if len(toks) >= 3 else ({" ".join(toks)} if toks else set()))
        sets.setdefault(src, set()).update(sh)
    expected = {}
    srcs = sorted(sets)
    for ai in range(len(srcs)):
        for bi in range(ai + 1, len(srcs)):
            a, b = srcs[ai], srcs[bi]
            inter = len(sets[a] & sets[b])
            if inter:
                expected[(a, b)] = (
                    inter, inter / len(sets[a] | sets[b])
                )
    assert got == expected


def test_corpus_shuffle_shards_matches_python_replica(spark, monkeypatch):
    """Independent replay of the deterministic shuffle: md5 shuffle
    key, hex-byte shard bucket, per-shard (key, id) order, positions
    and running token offsets."""
    import hashlib

    import outreach_etl_tool_spark.queries.pipeline as P

    docs = [(i, "w " * (i % 5 + 1)) for i in range(64)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(P, "load_table", lambda *a: sdf)
    got = {r["doc_id"]: (r["shard"], r["pos"], r["token_offset"], r["n_tokens"])
           for r in P.corpus_shuffle_shards(spark, "unused").collect()}

    rows = []
    for i, text in docs:
        k = hashlib.md5(f"shuf:{i}".encode()).hexdigest()
        rows.append((int(k[:2], 16) % 16, k, i, len(_py_tokens(text))))
    expected = {}
    for shard in sorted({r[0] for r in rows}):
        members = sorted((r for r in rows if r[0] == shard),
                         key=lambda r: (r[1], r[2]))
        off = 0
        for pos, (sh, k, i, nt) in enumerate(members, 1):
            expected[i] = (sh, pos, off, nt)
            off += nt
    assert got == expected


def test_evt_windowed_conversion_boundary(spark, monkeypatch):
    """Purchase exactly AT the 24h boundary converts (inclusive);
    one second past does not; a purchase BEFORE the first view never
    converts; users with no view form no cohort."""
    import datetime as dt

    import outreach_etl_tool_spark.queries.events as E

    t0 = dt.datetime(2024, 8, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(hours=24), 1, "purchase", 1.0, "{}"),   # at bound
        (3, t0, 2, "view", 0.0, "{}"),
        (4, t0 + dt.timedelta(hours=24, seconds=1), 2, "purchase", 1.0, "{}"),
        (5, t0, 3, "view", 0.0, "{}"),
        (6, t0 - dt.timedelta(hours=1), 3, "purchase", 1.0, "{}"),    # before
        (7, t0, 4, "purchase", 1.0, "{}"),                            # no view
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(E, "load_table", lambda *a: ev)
    [r] = E.evt_windowed_conversion(spark, "unused").collect()
    assert str(r["cohort_day"]) == "2024-08-01"
    assert (r["n_users"], r["n_converted"]) == (3, 1)
    assert r["conversion_rate"] == 1 / 3


# ------------------------------------------------- DSIR importance sampling
def test_dsir_matches_independent_python_replica(spark):
    """Brute-force replica on the real sf0.001 corpus: recompute every
    doc's bucket counts, fixed-point-log weight, hash uniform and
    acceptance in pure python (hashlib + intlog.ilog2_py) and require
    EXACT equality with the registry query. The DuckDB oracle shares
    the derivation shape, so this is the independent certificate
    (the round-8 triangle-undercount lesson)."""
    import hashlib
    import re as _re
    from collections import Counter

    import pyarrow.dataset as ds

    from outreach_etl_tool_spark.functions.intlog import ilog2_py
    from outreach_etl_tool_spark.queries.pipeline import (
        _DSIR_B, dsir_importance_sample,
    )

    sf = "/root/testdata/sf0.001"
    tbl = ds.dataset(f"{sf}/documents.parquet").to_table(
        columns=["doc_id", "text", "lang"]
    )
    docs = list(
        zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("text").to_pylist(),
            tbl.column("lang").to_pylist(),
        )
    )

    def feats(text):
        toks = _re.findall("[a-zA-Z]+", (text or "").lower())
        return toks + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:7], 16) % _DSIR_B

    k_r, k_t = Counter(), Counter()
    per_doc = {}
    for doc_id, text, lang in docs:
        bs = [bucket(f) for f in feats(text)]
        per_doc[doc_id] = bs
        for b in bs:
            k_r[b] += 1
            if lang == "en":
                k_t[b] += 1
    n_r, n_t = sum(k_r.values()), sum(k_t.values())
    s = {
        b: (ilog2_py(k_t[b] + 1) + ilog2_py(n_r + _DSIR_B))
        - (ilog2_py(k_r[b] + 1) + ilog2_py(n_t + _DSIR_B))
        for b in k_r
    }
    expected = {}
    for doc_id, _, _ in docs:
        w = sum(s[b] for b in per_doc[doc_id])
        u = (
            int(hashlib.md5(f"dsir#{doc_id}".encode()).hexdigest()[:8], 16)
            % (1 << 30)
            + 1
        )
        lu = ilog2_py(u) - 64 * 30
        expected[doc_id] = (len(per_doc[doc_id]), w, lu, w >= lu)

    got = {
        r["doc_id"]: (
            r["n_features"],
            r["weight_scaled"],
            r["log_u_scaled"],
            r["accepted"],
        )
        for r in dsir_importance_sample(spark, sf).collect()
    }
    assert got == expected


def test_dsir_acceptance_rule_is_min_one_two_pow(spark):
    """The integer decision implements P(accept) = min(1, 2^(w/64)):
    w >= 0 always accepts, and a strongly negative w accepts only for
    tiny uniforms — check both directions on synthetic weights."""
    from outreach_etl_tool_spark.functions.intlog import ilog2_py

    # w = 0 accepts every uniform (lu <= 0 for u <= 2^30)
    for u in (1, 2, 1 << 15, (1 << 30) - 1, 1 << 30):
        assert 0 >= ilog2_py(u) - 64 * 30
    # w = -64 (prob 1/2) flips exactly at u ~ 2^29
    w = -64
    assert w >= ilog2_py(1 << 29) - 64 * 30        # u = 2^29 accepts
    assert not w >= ilog2_py((1 << 29) + (1 << 24)) - 64 * 30


def test_kcore_check_matches_independent_peel_on_real_data(spark):
    """graph_kcore_check's (node count, degree mass, violations) on
    the real sf0.001 co-purchase graph equals an independent python
    peel — and its violation count is 0, which is the invariant the
    driver's oracle gate re-proves every round at sf0.01."""
    import duckdb

    from outreach_etl_tool_spark.queries.graph import (
        _KCORE_CHECK_K, graph_kcore_check,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    edges = con.execute("""
        WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT DISTINCT a.l_partkey, b.l_partkey FROM pl a JOIN pl b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    """).fetchall()
    core = _py_kcore(edges, _KCORE_CHECK_K)
    r = graph_kcore_check(spark, sf).collect()[0]
    assert r["n_violations"] == 0
    assert r["n_core_nodes"] == len(core)
    assert r["sum_core_degree"] == sum(core.values())


def test_pagerank_matches_independent_python_replica(spark):
    """Brute-force replica on the real sf0.001 co-purchase graph: an
    independent python implementation of the integer-stabilized
    PageRank (orientation, floor contributions, half-up rounding) must
    agree exactly. The DuckDB oracle is a translated same-algorithm
    CTE, so — like the triangle case that hid a real bug — agreement
    there certifies Spark<->DuckDB consistency, not semantic truth;
    this is the independent certificate."""
    import math
    from collections import defaultdict

    import duckdb

    from outreach_etl_tool_spark.queries.graph import (
        _PR_ITER, _PR_SCALE, graph_pagerank,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    e = con.execute("""
        WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT DISTINCT a.l_partkey, b.l_partkey FROM pl a JOIN pl b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    """).fetchall()
    deg = defaultdict(int)
    for u, v in e:
        deg[u] += 1
        deg[v] += 1
    edges = []
    for u, v in e:
        if (deg[u], u) < (deg[v], v):
            edges.append((u, v))
        else:
            edges.append((v, u))
    nodes = {n for uv in edges for n in uv}
    outd = defaultdict(int)
    for s, _ in edges:
        outd[s] += 1
    r = {n: _PR_SCALE for n in nodes}
    for _ in range(_PR_ITER):
        sc = defaultdict(int)
        for s, d in edges:
            sc[d] += math.floor(r[s] / outd[s])
        # Spark F.round / DuckDB ROUND are HALF-UP on positives —
        # python round() is banker's, so replicate half-up explicitly
        r = {
            n: math.floor(0.15 * _PR_SCALE + 0.85 * sc.get(n, 0) + 0.5)
            for n in nodes
        }
    expected = {n: v / _PR_SCALE for n, v in r.items()}
    got = {
        row["node"]: row["pagerank"]
        for row in graph_pagerank(spark, sf).collect()
    }
    assert got == expected


def test_semdedup_prune_matches_independent_python_replica(spark):
    """Independent numpy/union-find reimplementation of the whole
    oracle-parity SRP prune pipeline (quantize, plane dots, bands,
    bucket cap, exact-integer tau-gate, connected components, min-id
    keeper) on the real sf0.001 embeddings — the recursive-CTE oracle
    shares the derivation, so this is the independent certificate."""
    from collections import defaultdict

    import numpy as np
    import pyarrow.dataset as ds

    from outreach_etl_tool_spark.dedup.parity import (
        _CAP, _EMB_BAND_BITS, _EMB_BANDS, _EMB_PLANES, _EMB_SCALE, _emb_planes,
    )
    from outreach_etl_tool_spark.queries.llm import semdedup_prune

    sf = "/root/testdata/sf0.001"
    tbl = ds.dataset(f"{sf}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"]
    )
    vecs = {
        i: v
        for i, v in zip(
            tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist()
        )
        if v is not None and len(v) == 64
    }
    planes = np.asarray(_emb_planes(64), dtype=np.int64)
    q = {
        i: np.floor(
            np.asarray(v, dtype=np.float32).astype(np.float64) * _EMB_SCALE
        ).astype(np.int64)
        for i, v in vecs.items()
    }
    buckets = defaultdict(list)
    for i in sorted(q):
        dots = planes @ q[i]
        fp = sum(1 << j for j in range(_EMB_PLANES) if dots[j] > 0)
        for b in range(_EMB_BANDS):
            key = (fp >> (b * _EMB_BAND_BITS)) & ((1 << _EMB_BAND_BITS) - 1)
            buckets[(b, key)].append(i)
    cands = set()
    for ids in buckets.values():
        capped = sorted(ids)[:_CAP]
        for x in range(len(capped)):
            for y in range(x + 1, len(capped)):
                cands.add((capped[x], capped[y]))
    parent = {i: i for i in q}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(cands):
        dq = int(q[a] @ q[b])
        na, nb = int(q[a] @ q[a]), int(q[b] @ q[b])
        if dq > 0 and 25 * dq * dq >= 4 * na * nb:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in q}
    got = {
        r["vec_id"]: (r["cluster_id"], r["is_keep"])
        for r in semdedup_prune(spark, sf).collect()
    }
    assert got == {i: (c, i == c) for i, c in expected.items()}
    # non-vacuous: the corpus genuinely contains clustered vectors
    assert any(i != c for i, c in expected.items())


# ------------------------------------------------ trained quality classifier
def _qc_python_replica(doc_rows, n_docs):
    """Independent reimplementation of the exact-integer GD loop."""
    import hashlib
    import re as _re
    from collections import Counter

    from outreach_etl_tool_spark.queries.pipeline import (
        _DSIR_B, _QC_ITERS, _QC_LRD, _QC_LRN, _QC_SCALE, _trunc_div,
    )

    X, y = {}, {}
    for doc_id, text, lang in doc_rows:
        toks = _re.findall("[a-zA-Z]+", (text or "").lower())
        fs = toks + [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
        X[doc_id] = Counter(
            int(hashlib.md5(f.encode()).hexdigest()[:7], 16) % _DSIR_B
            for f in fs
        )
        y[doc_id] = 1 if lang == "en" else 0
    w = {}
    for _ in range(_QC_ITERS):
        grad = Counter()
        for d, c in X.items():
            z = sum(n * w.get(b, 0) for b, n in c.items())
            r = z - y[d] * _QC_SCALE
            for b, n in c.items():
                grad[b] += n * r
        for b, g in grad.items():
            w[b] = w.get(b, 0) - _trunc_div(g * _QC_LRN, _QC_LRD * n_docs)
    out = {}
    for d, c in X.items():
        z = sum(n * w.get(b, 0) for b, n in c.items())
        out[d] = (y[d] == 1, z, z > _QC_SCALE // 2)
    return out


def test_quality_classifier_matches_independent_python_replica(spark):
    """Exact-equality pin of the whole training loop on the real
    sf0.001 corpus against an independent python GD implementation —
    the DuckDB oracle unrolls the same algorithm, so this is the
    independent certificate (triangle-undercount discipline)."""
    import pyarrow.dataset as ds

    from outreach_etl_tool_spark.queries.pipeline import (
        quality_classifier_scores,
    )

    sf = "/root/testdata/sf0.001"
    tbl = ds.dataset(f"{sf}/documents.parquet").to_table(
        columns=["doc_id", "text", "lang"]
    )
    rows = list(
        zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("text").to_pylist(),
            tbl.column("lang").to_pylist(),
        )
    )
    expected = _qc_python_replica(rows, len(rows))
    got = {
        r["doc_id"]: (r["is_target"], r["score_scaled"], r["predicted"])
        for r in quality_classifier_scores(spark, sf).collect()
    }
    assert got == expected


def test_quality_classifier_learns_separable_corpus(spark, monkeypatch):
    """Where the label HAS signal, 3 exact-integer GD steps separate
    the classes: target docs from one vocabulary, rest from a
    disjoint one — accuracy must exceed 95% (driver-corpus accuracy
    sits at the base rate because the synthetic langs share one
    vocabulary; that degeneracy is documented in the registry doc)."""
    import random

    import outreach_etl_tool_spark.queries.pipeline as P

    rng = random.Random(3)
    va = ["clean", "prose", "article", "essay", "paragraph", "chapter"]
    vb = ["spam", "click", "buy", "cheap", "free", "winner"]
    rows = []
    for d in range(200):
        tgt = d % 2 == 0
        vocab = va if tgt else vb
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(20, 60)))
        rows.append((d, text, "en" if tgt else "zh", "src0", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    out = P.quality_classifier_scores(spark, "no-such-dir").collect()
    acc = sum(1 for r in out if r["predicted"] == r["is_target"]) / len(out)
    assert acc >= 0.95, acc
    # and the replica agrees here too
    expected = _qc_python_replica([(d, t, l) for d, t, l, *_ in rows], 200)
    got = {
        r["doc_id"]: (r["is_target"], r["score_scaled"], r["predicted"])
        for r in out
    }
    assert got == expected


# ------------------------------------------- temperature-scaled mixing
def test_temperature_sample_alpha_one_is_proportional(spark):
    """alpha = 1 is the no-reweighting boundary: every domain's weight
    collapses to a non-binding gate and the sampled corpus IS the raw
    corpus (proportional sampling)."""
    from outreach_etl_tool_spark.queries.pipeline import (
        temperature_sample_frame,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 4 else "fr", "a b c") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    rows = {
        r["lang"]: r
        for r in temperature_sample_frame(
            docs, alpha_num=1, alpha_den=1
        ).collect()
    }
    assert all(r["n_kept"] == r["n_total"] for r in rows.values())
    assert all(r["weight_scaled"] == 0 for r in rows.values())


def test_temperature_sample_matches_independent_python_replica(spark):
    """Replica on the real sf0.001 corpus: per-lang counts, fixed-point
    weights and every hash-Bernoulli keep decision recomputed in pure
    python (hashlib + intlog.ilog2_py) — exact equality required. The
    DuckDB oracle shares the derivation shape, so this is the
    independent certificate (the round-8 lesson)."""
    import hashlib
    import re as _re
    from collections import Counter

    import pyarrow.dataset as ds

    from outreach_etl_tool_spark.functions.intlog import ilog2_py
    from outreach_etl_tool_spark.queries.pipeline import (
        _TEMP_DEN, _TEMP_NUM, lang_temperature_sample,
    )

    sf = "/root/testdata/sf0.001"
    tbl = ds.dataset(f"{sf}/documents.parquet").to_table(
        columns=["doc_id", "text", "lang"]
    )
    docs = list(
        zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("text").to_pylist(),
            tbl.column("lang").to_pylist(),
        )
    )
    n = Counter(lang for _, _, lang in docs)
    n_min = min(n.values())
    w = {
        lang: (_TEMP_NUM - _TEMP_DEN) * (ilog2_py(c) - ilog2_py(n_min))
        for lang, c in n.items()
    }
    exp = {
        lang: [c, w[lang], 0, 0] for lang, c in n.items()
    }  # n_total, weight, n_kept, tokens_kept
    for doc_id, text, lang in docs:
        u = (
            int(hashlib.md5(f"temp#{doc_id}".encode()).hexdigest()[:8], 16)
            % (1 << 30)
            + 1
        )
        if _TEMP_DEN * (ilog2_py(u) - 64 * 30) <= w[lang]:
            exp[lang][2] += 1
            exp[lang][3] += len(_re.findall("[a-zA-Z]+", (text or "").lower()))

    got = {
        r["lang"]: [
            r["n_total"], r["weight_scaled"], r["n_kept"], r["tokens_kept"]
        ]
        for r in lang_temperature_sample(spark, sf).collect()
    }
    assert got == {k: v for k, v in exp.items()}


def test_temperature_sample_nontrivial_on_driver_corpus(spark):
    """Degeneracy guard (the funnel lesson): on the driver corpus the
    lang shares are skewed, so the head domain must VISIBLY downsample
    (0 < n_kept < n_total) while the smallest domain keeps everything
    (weight 0 => gate never binds)."""
    from outreach_etl_tool_spark.queries.pipeline import (
        lang_temperature_sample,
    )

    rows = lang_temperature_sample(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) >= 2
    head = max(rows, key=lambda r: r["n_total"])
    tail = min(rows, key=lambda r: r["n_total"])
    assert 0 < head["n_kept"] < head["n_total"]
    assert tail["weight_scaled"] == 0
    assert tail["n_kept"] == tail["n_total"]


# ------------------------------------------------------ Pareto lottery
def test_pareto_lottery_matches_independent_python_replica(spark):
    """Replica on the real sf0.001 corpus: recompute every doc's
    lottery decision in pure python (hashlib + exact ints) from the
    REGISTRY classifier scores, and cross-check the integer inequality
    against the float Pareto condition U <= (2 - s)^-9 (they can only
    disagree inside the 1/1000 score-quantization band, by design)."""
    import hashlib

    from outreach_etl_tool_spark.queries.pipeline import (
        _PARETO_ALPHA, _PL_UBITS, quality_classifier_scores,
        quality_pareto_lottery,
    )

    sf = "/root/testdata/sf0.001"
    scores = {
        r["doc_id"]: r["score_scaled"]
        for r in quality_classifier_scores(spark, sf).collect()
    }
    exp = {}
    for doc_id, s in scores.items():
        s1k = max(0, min(1000, int(abs(s) // 1000) * (1 if s >= 0 else -1)))
        s1k = max(0, s1k)
        u = (
            int(hashlib.md5(f"pareto#{doc_id}".encode()).hexdigest()[:8], 16)
            % (1 << _PL_UBITS)
            + 1
        )
        kept = u * (2000 - s1k) ** _PARETO_ALPHA <= (
            (1 << _PL_UBITS) * 1000 ** _PARETO_ALPHA
        )
        # float cross-check of the inverse-CDF rewrite on the
        # quantized score (same quantization both sides)
        float_kept = (u / (1 << _PL_UBITS)) <= (2 - s1k / 1000) ** (
            -_PARETO_ALPHA
        )
        assert kept == float_kept, (doc_id, s1k, u)
        exp[doc_id] = (u, kept)
    got = {
        r["doc_id"]: (r["pareto_u"], r["kept"])
        for r in quality_pareto_lottery(spark, sf).collect()
    }
    assert got == exp


def test_pareto_lottery_boundaries_and_nondegeneracy(spark):
    """s = 1 is an always-keep (u <= 2^20 holds for every u); on the
    driver corpus the lottery must make a strict nonzero cut (the
    degeneracy rule), and keeps must skew toward higher scores."""
    from outreach_etl_tool_spark.queries.pipeline import (
        _PARETO_ALPHA, _PL_UBITS,
    )

    # algebraic boundary: max u at s1k=1000
    assert (1 << _PL_UBITS) * 1000 ** _PARETO_ALPHA <= (
        (1 << _PL_UBITS) * 1000 ** _PARETO_ALPHA
    )
    from outreach_etl_tool_spark.queries.pipeline import (
        quality_pareto_lottery,
    )

    rows = quality_pareto_lottery(spark, "/root/testdata/sf0.01").collect()
    kept = [r for r in rows if r["kept"]]
    assert 0 < len(kept) < len(rows)
    import statistics

    assert statistics.mean(r["score_scaled"] for r in kept) > (
        statistics.mean(r["score_scaled"] for r in rows)
    )


# ----------------------------------------------------- Zipf slope fit
def test_vocab_zipf_slope_recovers_planted_power_law(spark, monkeypatch):
    """A corpus planted with freq(rank) = floor(3000/rank) must fit a
    slope near -1, and the query's exact integer sums must equal an
    independent ilog2_py OLS replica bit-for-bit. (The driver corpus's
    ~31-term near-uniform vocabulary legitimately fits a FLAT slope —
    which is the diagnostic working, not failing.)"""
    from outreach_etl_tool_spark.functions.intlog import ilog2_py
    import outreach_etl_tool_spark.queries.pipeline as P

    def _rank_word(r):
        # letters only: the [a-zA-Z]+ tokenizer strips digits
        a, b = divmod(r, 26)
        return "tok" + chr(ord("a") + a) + chr(ord("a") + b)

    words = []
    freqs = []
    for r in range(1, 61):
        f = 3000 // r
        freqs.append(f)
        words.extend([_rank_word(r)] * f)
    # one doc per ~200 words keeps the explode distributed
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 200:(i + 1) * 200]))
         for i in range((len(words) + 199) // 200)],
        "doc_id long, text string",
    )
    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    row = P.vocab_zipf_slope(spark, "unused").collect()[0]

    # independent replica: rank by (freq desc, token asc), exact sums
    xs, ys = [], []
    for i, f in enumerate(sorted(freqs, reverse=True), start=1):
        xs.append(ilog2_py(i))
        ys.append(ilog2_py(f))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    assert (row["n_terms"], row["slope_num"], row["slope_den"]) == (
        n, num, den,
    )
    assert -1.2 < row["zipf_slope"] < -0.8
    assert row["zipf_slope"] == num / den


# ------------------------------------------------- trained language-ID
def _lid_python_replica(rows, n_docs):
    """Pure-python replica of lang_id_trained (hashlib + dicts, no
    Spark/SQL logic shared): same hashed char-trigram features, same
    exact-integer K-class gradient steps, same argmax tie-break."""
    import hashlib

    from outreach_etl_tool_spark.queries.pipeline import (
        _DSIR_B,
        _LID_C,
        _LID_ITERS,
        _LID_LRD,
        _LID_LRN,
        _LID_SCALE,
        _trunc_div,
    )

    x: dict[tuple[int, int], int] = {}
    labels: dict[int, str] = {}
    for doc_id, text, lang in rows:
        labels[doc_id] = lang
        p = text[:_LID_C].lower()
        for i in range(len(p) - 2):
            b = int(hashlib.md5(p[i : i + 3].encode()).hexdigest()[:7], 16) % _DSIR_B
            x[(doc_id, b)] = x.get((doc_id, b), 0) + 1
    langs = sorted(set(labels.values()))
    w: dict[tuple[str, int], int] = {}
    for _ in range(_LID_ITERS):
        z: dict[tuple[int, str], int] = {}
        for (d, b), cx in x.items():
            for c in langs:
                z[(d, c)] = z.get((d, c), 0) + cx * w.get((c, b), 0)
        g: dict[tuple[str, int], int] = {}
        for (d, b), cx in x.items():
            for c in langs:
                y = _LID_SCALE if labels[d] == c else 0
                g[(c, b)] = g.get((c, b), 0) + cx * (z[(d, c)] - y)
        for k, gv in g.items():
            w[k] = w.get(k, 0) - _trunc_div(gv * _LID_LRN, _LID_LRD * n_docs)
    zf: dict[tuple[int, str], int] = {}
    featured = set()
    for (d, b), cx in x.items():
        featured.add(d)
        for c in langs:
            zf[(d, c)] = zf.get((d, c), 0) + cx * w.get((c, b), 0)
    out = {}
    for d, lang in labels.items():
        if d not in featured:
            pred, score = langs[0], 0
        else:
            pred, score = min(
                ((c, zf[(d, c)]) for c in langs), key=lambda t: (-t[1], t[0])
            )
        out[d] = (lang, pred, score, lang == pred)
    return out


def test_lang_id_trained_learns_separable_corpus(spark, monkeypatch):
    """Where languages have disjoint character distributions (the real
    lang-ID setting), 3 exact-integer GD steps separate them: three
    planted langs draw words from disjoint alphabets — agreement must
    exceed 95% (driver-corpus agreement sits at the base rate because
    the synthetic langs share one vocabulary; documented in the
    registry doc). The pure-python replica must agree bit-for-bit."""
    import random

    import outreach_etl_tool_spark.queries.pipeline as P

    rng = random.Random(11)
    vocabs = {
        "aa": ["abba", "cafe", "dead", "beef", "fade", "edba"],
        "bb": ["gigi", "hijk", "jill", "kilig", "lligh", "hikj"],
        "cc": ["mnop", "qrqr", "prom", "norm", "opqn", "romp"],
    }
    rows = []
    for d in range(150):
        lang = ["aa", "bb", "cc"][d % 3]
        text = " ".join(
            rng.choice(vocabs[lang]) for _ in range(rng.randint(15, 40))
        )
        rows.append((d, text, lang, "src0", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(P, "load_table", lambda *a: docs)
    out = P.lang_id_trained(spark, "no-such-dir").collect()
    acc = sum(1 for r in out if r["is_correct"]) / len(out)
    assert acc >= 0.95, acc
    expected = _lid_python_replica([(d, t, l) for d, t, l, *_ in rows], 150)
    got = {
        r["doc_id"]: (
            r["lang"],
            r["predicted_lang"],
            r["best_score_scaled"],
            r["is_correct"],
        )
        for r in out
    }
    assert got == expected


def test_lang_id_trained_subsample_training_path(spark):
    """The 10^11-doc path (round-12): train_docs restricts TRAINING to
    a hash-derandomized subsample while scoring covers the full frame.
    On a disjoint-alphabet corpus the subsample-trained model still
    classifies the UNSEEN docs correctly, every doc is scored, and the
    gradient never touches (or broadcasts) the full label frame."""
    import random

    from outreach_etl_tool_spark.queries.pipeline import lang_id_trained_frame

    rng = random.Random(12)
    vocabs = {
        "aa": ["abba", "cafe", "dead", "beef", "fade", "edba"],
        "bb": ["gigi", "hijk", "jill", "kilig", "lligh", "hikj"],
    }
    rows = []
    for d in range(120):
        lang = ["aa", "bb"][d % 2]
        text = " ".join(
            rng.choice(vocabs[lang]) for _ in range(rng.randint(15, 40))
        )
        rows.append((d, text, lang, "src0", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    train = docs.filter(F.col("doc_id") % 3 == 0)  # 1/3 subsample
    out = lang_id_trained_frame(spark, docs, train_docs=train).collect()
    assert len(out) == 120  # scoring covers the corpus
    held_out = [r for r in out if r["doc_id"] % 3 != 0]
    acc = sum(1 for r in held_out if r["is_correct"]) / len(held_out)
    assert acc >= 0.95, acc


def test_lang_id_trained_driver_data_shape(spark):
    """On driver data the output is well-formed and non-degenerate in
    SHAPE (every doc scored, predictions drawn from the label set)
    even though accuracy is base-rate by construction."""
    from outreach_etl_tool_spark.queries.pipeline import lang_id_trained

    out = lang_id_trained(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500
    langs = {r["lang"] for r in out}
    assert {r["predicted_lang"] for r in out} <= langs
    assert any(r["best_score_scaled"] != 0 for r in out)


def test_unimax_budget_alloc_matches_waterfill_replica(spark):
    """UniMax allocation (round-12): an independent pure-python greedy
    waterfill (iterative, NOT the closed form the engine uses) must
    produce the identical allocation; the driver fixture is
    non-degenerate (both capped and uncapped sources exist), capped
    sources get exactly their cap, and the uncapped shares exhaust the
    budget to the token."""
    import duckdb

    from outreach_etl_tool_spark.queries.pipeline import (
        _UNIMAX_BUDGET_DEN,
        _UNIMAX_BUDGET_NUM,
        _UNIMAX_CAP_EPOCHS,
        unimax_budget_alloc,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["source"]: (
            r["n_tokens"], r["cap_tokens"], r["allocated_tokens"], r["capped"]
        )
        for r in unimax_budget_alloc(spark, sf).collect()
    }
    per = dict(
        duckdb.connect().execute(
            "SELECT source, SUM(LEN(regexp_extract_all(LOWER(text), "
            f"'[a-zA-Z]+'))) FROM '{sf}/documents.parquet' GROUP BY source"
        ).fetchall()
    )
    total = sum(per.values())
    budget = total * _UNIMAX_BUDGET_NUM // _UNIMAX_BUDGET_DEN
    caps = {s: t * _UNIMAX_CAP_EPOCHS for s, t in per.items()}
    # iterative greedy waterfill: repeatedly grant the full cap to any
    # source whose cap is <= the current equal share, then re-divide
    remaining, left = dict(caps), budget
    alloc: dict[str, int] = {}
    while remaining:
        share = left // len(remaining)
        small = {s: c for s, c in remaining.items() if c <= share}
        if not small:
            break
        for s, c in small.items():
            alloc[s] = c
            left -= c
            del remaining[s]
    uncapped = sorted(remaining, key=lambda s: (caps[s], s))
    if uncapped:
        q, r = divmod(left, len(uncapped))
        for rank, s in enumerate(uncapped, start=1):
            alloc[s] = q + (1 if rank <= r else 0)
    assert set(got) == set(alloc)
    for s in alloc:
        n, cap, a, capped = got[s]
        assert n == per[s] and cap == caps[s]
        assert a == alloc[s], (s, a, alloc[s])
        assert capped == (s not in uncapped)
    # non-degenerate fixture: both regimes present, budget exhausted
    assert any(v[3] for v in got.values())
    assert any(not v[3] for v in got.values())
    assert sum(v[2] for v in got.values()) == budget
    for s in uncapped:
        assert got[s][2] < caps[s]


def test_unimax_budget_fill_python_replica_and_regimes(spark):
    """The allocator→fill composition (round-13 — VERDICT r12 #4):
    an independent pure-python replica (hashlib shard/ord hashes,
    ITERATIVE greedy waterfill, per-(source, shard) hash-ordered
    greedy fill) must match every output column exactly; regime pins:
    every capped source keeps ALL its material, at least one uncapped
    source truncates below its material, and each source's shard
    quotas sum exactly to its allocation (div + remainder)."""
    import hashlib

    import duckdb

    from outreach_etl_tool_spark.queries.pipeline import (
        _MIX_SHARDS,
        _UNIMAX_FILL_CAP_EPOCHS,
        _UNIMAX_FILL_DEN,
        _UNIMAX_FILL_NUM,
        unimax_budget_fill,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["source"]: (
            r["n_docs"], r["domain_tokens"], r["allocated_tokens"],
            r["capped"], r["n_kept"], r["tokens_kept"],
        )
        for r in unimax_budget_fill(spark, sf).collect()
    }
    rows = duckdb.connect().execute(
        "SELECT doc_id, source, LEN(regexp_extract_all(LOWER(text), "
        f"'[a-zA-Z]+')) FROM '{sf}/documents.parquet'"
    ).fetchall()
    per: dict[str, int] = {}
    for _, s, n in rows:
        per[s] = per.get(s, 0) + n
    total = sum(per.values())
    budget = total * _UNIMAX_FILL_NUM // _UNIMAX_FILL_DEN
    caps = {s: t * _UNIMAX_FILL_CAP_EPOCHS for s, t in per.items()}
    remaining, left = dict(caps), budget
    alloc: dict[str, int] = {}
    while remaining:
        share = left // len(remaining)
        small = {s: c for s, c in remaining.items() if c <= share}
        if not small:
            break
        for s, c in small.items():
            alloc[s] = c
            left -= c
            del remaining[s]
    uncapped = sorted(remaining, key=lambda s: (caps[s], s))
    if uncapped:
        q, r = divmod(left, len(uncapped))
        for rank, s in enumerate(uncapped, start=1):
            alloc[s] = q + (1 if rank <= r else 0)
    # hash-salted sub-stream fill replica
    streams: dict[tuple[str, int], list[tuple[str, int, int]]] = {}
    for did, s, n in rows:
        shard = int(
            hashlib.md5(f"mix#{did}".encode()).hexdigest()[:8], 16
        ) % _MIX_SHARDS
        ordh = hashlib.md5(f"mixord#{did}".encode()).hexdigest()
        streams.setdefault((s, shard), []).append((ordh, did, n))
    kept_docs: dict[str, int] = {s: 0 for s in per}
    kept_toks: dict[str, int] = {s: 0 for s in per}
    for (s, shard), docs in streams.items():
        q_shard = alloc[s] // _MIX_SHARDS + (
            1 if shard < alloc[s] % _MIX_SHARDS else 0
        )
        cum = 0
        for ordh, did, n in sorted(docs):
            # non-binding allocation (alloc >= material) keeps all —
            # shard hash skew must not truncate a capped source
            if cum < q_shard or alloc[s] >= per[s]:
                kept_docs[s] += 1
                kept_toks[s] += n
            cum += n
    n_docs_per: dict[str, int] = {}
    for _, s, _n in rows:
        n_docs_per[s] = n_docs_per.get(s, 0) + 1
    assert set(got) == set(alloc)
    for s, (nd, dt, at, capped, nk, tk) in got.items():
        assert nd == n_docs_per[s] and dt == per[s]
        assert at == alloc[s] and capped == (s not in uncapped)
        assert nk == kept_docs[s], (s, nk, kept_docs[s])
        assert tk == kept_toks[s], (s, tk, kept_toks[s])
        # shard quotas sum exactly to the allocation
        assert sum(
            alloc[s] // _MIX_SHARDS
            + (1 if sh < alloc[s] % _MIX_SHARDS else 0)
            for sh in range(_MIX_SHARDS)
        ) == alloc[s]
        if capped:
            # cap = 2 epochs >= material: capped sources keep everything
            assert nk == nd and tk == dt
    # non-degenerate: both regimes present, some uncapped source truncates
    assert any(v[3] for v in got.values())
    assert any((not v[3]) and v[5] < v[1] for v in got.values())


# ------------------------------------------------ token-budget mixing
def test_token_budget_mix_python_replica_and_binding(spark):
    """Independent pure-python replica (hashlib + dicts) of the
    sharded greedy fill, plus the operator's defining behaviors on
    driver data: the head domain is TRUNCATED toward its quota while
    at least one tail domain keeps everything (quotas partially bind),
    and every kept count/token sum matches the replica exactly."""
    import hashlib

    import duckdb

    from outreach_etl_tool_spark.queries.pipeline import (
        _MIX_BUDGET_DEN,
        _MIX_BUDGET_NUM,
        _MIX_SHARDS,
        token_budget_mix,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT doc_id, lang,
               LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+'))
            FROM '{sf}/documents.parquet'"""
    ).fetchall()
    T = sum(r[2] for r in rows)
    langs = sorted({r[1] for r in rows})
    q_shard = T * _MIX_BUDGET_NUM // _MIX_BUDGET_DEN // len(langs) // _MIX_SHARDS
    streams: dict[tuple[str, int], list[tuple[str, int, int]]] = {}
    for doc_id, lang, n_tok in rows:
        shard = int(
            hashlib.md5(f"mix#{doc_id}".encode()).hexdigest()[:8], 16
        ) % _MIX_SHARDS
        ordk = hashlib.md5(f"mixord#{doc_id}".encode()).hexdigest()
        streams.setdefault((lang, shard), []).append((ordk, doc_id, n_tok))
    expected = {
        l: {"n_docs": 0, "domain_tokens": 0, "n_kept": 0, "tokens_kept": 0}
        for l in langs
    }
    for (lang, _), docs in streams.items():
        cum = 0
        for ordk, doc_id, n_tok in sorted(docs):
            e = expected[lang]
            e["n_docs"] += 1
            e["domain_tokens"] += n_tok
            if cum < q_shard:
                e["n_kept"] += 1
                e["tokens_kept"] += n_tok
            cum += n_tok
    got = {r["lang"]: r.asDict() for r in token_budget_mix(spark, sf).collect()}
    assert set(got) == set(expected)
    for lang, e in expected.items():
        g = got[lang]
        assert g["quota_tokens"] == q_shard * _MIX_SHARDS
        for k, v in e.items():
            assert g[k] == v, (lang, k, g[k], v)
    # quotas partially bind: head truncates, some tail keeps all
    head = max(got.values(), key=lambda g: g["domain_tokens"])
    assert head["n_kept"] < head["n_docs"]
    assert any(g["n_kept"] == g["n_docs"] for g in got.values())
    # greedy fill with the crossing doc: kept tokens reach the quota
    # wherever the domain had enough material (within one doc's slack
    # per sub-stream)
    assert head["tokens_kept"] >= head["quota_tokens"]


# ------------------------------------------------ target-trained LM
def test_lm_target_score_discriminates_disjoint_vocabularies(spark, monkeypatch):
    """Where the target domain has its own vocabulary (the real CCNet
    setting), target-domain docs must score far above off-target docs
    (whose unseen bigrams get the smoothed floor); on the driver
    corpus the langs share one vocabulary and scores barely separate
    (documented in the registry doc)."""
    import random

    import outreach_etl_tool_spark.queries.sqlplus as S

    rng = random.Random(7)
    # target text is STRUCTURED (cyclic bigram chains over a 20-word
    # vocabulary -> in-domain bigram probability near 1 after
    # smoothing), off-target text is random over a disjoint vocabulary
    # (every bigram unseen -> the smoothed floor 1/(0+V)). A bigram LM
    # cannot separate uniform-random corpora (P ~ 1/V equals the
    # floor) - structure is what the filter detects.
    va = ["a" + c for c in "abcdefghijklmnopqrst"]
    vb = ["z" + c for c in "abcdefghijklmnopqrst"]
    rows = []
    for d in range(120):
        tgt = d % 2 == 0
        if tgt:
            start = rng.randrange(20)
            n = rng.randint(15, 40)
            text = " ".join(va[(start + k) % 20] for k in range(n))
        else:
            text = " ".join(
                rng.choice(vb) for _ in range(rng.randint(15, 40))
            )
        rows.append((d, text, "en" if tgt else "zz", "src0", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(S, "load_table", lambda *a: docs)
    out = S.lm_target_score(spark, "no-such-dir").collect()
    en = [r["target_lm_score"] for r in out if r["lang"] == "en"]
    zz = [r["target_lm_score"] for r in out if r["lang"] == "zz"]
    assert len(en) and len(zz)
    assert min(en) > 5 * max(zz), (min(en), max(zz))


def test_lm_excess_select_ranks_target_domain_on_top(spark, monkeypatch):
    """RHO-1/CCNet-importance selection (round-12): on the same
    disjoint-vocabulary plant, EVERY target-domain doc must out-rank
    every off-domain doc on the integer excess statistic — the corpus
    model scores both domains as fluent (each is structured over its
    own vocabulary), so the target-vs-corpus DIFFERENCE is what
    isolates the target domain. The head-bucket cut then selects
    target docs only."""
    import random

    import outreach_etl_tool_spark.queries.sqlplus as S

    rng = random.Random(7)
    va = ["a" + c for c in "abcdefghijklmnopqrst"]
    vb = ["z" + c for c in "abcdefghijklmnopqrst"]
    rows = []
    for d in range(120):
        tgt = d % 2 == 0
        voc = va if tgt else vb
        start = rng.randrange(20)
        n = rng.randint(15, 40)
        # BOTH domains are structured cyclic chains (equally fluent
        # under the corpus model) — only the target split is 'en'
        text = " ".join(voc[(start + k) % 20] for k in range(n))
        rows.append((d, text, "en" if tgt else "zz", "src0", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(S, "load_table", lambda *a: docs)
    out = S.lm_excess_select(spark, "no-such-dir").collect()
    langs = {d: ("en" if d % 2 == 0 else "zz") for d in range(120)}
    en_excess = [
        r["excess_scaled"] / r["n_bigrams"]
        for r in out
        if langs[r["doc_id"]] == "en"
    ]
    zz_excess = [
        r["excess_scaled"] / r["n_bigrams"]
        for r in out
        if langs[r["doc_id"]] == "zz"
    ]
    assert len(en_excess) == 60 and len(zz_excess) == 60
    assert min(en_excess) > max(zz_excess)
    # the head bucket (selected) is entirely target-domain
    sel = {r["doc_id"] for r in out if r["selected"]}
    assert sel and all(langs[d] == "en" for d in sel)
    # bucket sizes follow NTILE(3) over 120 docs
    from collections import Counter

    sizes = Counter(r["bucket"] for r in out)
    assert sizes == {1: 40, 2: 40, 3: 40}


def test_weighted_sample_topk_matches_replica_and_skews_long(spark):
    """E-S priority sampling (round-12): the selected set equals a
    pure-python replica built from ilog2_py + hashlib (independent of
    the SQL fold), and the weighting is REAL — the selected docs'
    mean token count exceeds the corpus mean (longer docs drew
    proportionally more selection mass)."""
    import hashlib

    import duckdb

    from outreach_etl_tool_spark.functions.intlog import ilog2_py
    from outreach_etl_tool_spark.queries.pipeline import (
        _WRS_K,
        weighted_sample_topk,
    )

    sf = "/root/testdata/sf0.01"
    got = [
        (r["doc_id"], r["source"], r["n_tokens"], r["priority"])
        for r in weighted_sample_topk(spark, sf).collect()
    ]
    rows = duckdb.connect().execute(
        "SELECT doc_id, source, LEN(regexp_extract_all(LOWER(text), "
        f"'[a-zA-Z]+')) FROM '{sf}/documents.parquet'"
    ).fetchall()
    keyed = []
    for doc_id, source, n_tok in rows:
        if n_tok == 0:
            continue
        u = int(hashlib.md5(f"wrs#{doc_id}".encode()).hexdigest()[:8], 16) + 1
        prio = ((2048 - ilog2_py(u)) << 20) // n_tok
        keyed.append((prio, doc_id, source, n_tok))
    keyed.sort(key=lambda t: (t[0], t[1]))
    expected = [(d, s, n, p) for p, d, s, n in keyed[:_WRS_K]]
    assert got == expected
    corpus_mean = sum(n for *_r, n in [(r[0], r[1], r[2]) for r in rows]) / len(rows)
    sel_mean = sum(n for _, _, n, _ in got) / len(got)
    assert sel_mean > corpus_mean * 1.05, (sel_mean, corpus_mean)


def test_seq_packing_layout_python_replica_and_pins(spark):
    """Sequence-packing layout (round-13): an independent pure-python
    replica (hashlib shard/ord, per-shard prefix sums, the same
    div-L placement) must match every rollup column — including the
    sum_seq_first/sum_seq_last placement certificates — exactly;
    pins: tail padding < L per shard, boundary-straddling docs exist
    (the fixture is non-degenerate), every nonzero-token doc is
    placed, and sequences cover the tokens (n_seqs = ceil(tokens/L))."""
    import hashlib
    import re

    import duckdb

    from outreach_etl_tool_spark.queries.pipeline import (
        _MIX_SHARDS,
        _PACK_LEN,
        seq_packing_layout,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["shard"]: (
            r["n_docs"], r["n_tokens"], r["n_seqs"], r["n_straddling"],
            r["pad_tokens"], r["sum_seq_first"], r["sum_seq_last"],
        )
        for r in seq_packing_layout(spark, sf).collect()
    }
    rows = duckdb.connect().execute(
        f"SELECT doc_id, LOWER(text) FROM '{sf}/documents.parquet'"
    ).fetchall()
    streams: dict[int, list[tuple[str, int, int]]] = {}
    total_docs = 0
    for did, text in rows:
        n = len(re.findall("[a-zA-Z]+", text))
        if n == 0:
            continue
        total_docs += 1
        shard = int(
            hashlib.md5(f"pack#{did}".encode()).hexdigest()[:8], 16
        ) % _MIX_SHARDS
        ordh = hashlib.md5(f"packord#{did}".encode()).hexdigest()
        streams.setdefault(shard, []).append((ordh, did, n))
    expect = {}
    for shard, docs in streams.items():
        cum = 0
        straddle = 0
        s_first = 0
        s_last = 0
        for ordh, did, n in sorted(docs):
            first, last = cum // _PACK_LEN, (cum + n - 1) // _PACK_LEN
            straddle += 1 if first != last else 0
            s_first += first
            s_last += last
            cum += n
        n_seqs = -(-cum // _PACK_LEN)
        expect[shard] = (
            len(docs), cum, n_seqs, straddle,
            n_seqs * _PACK_LEN - cum, s_first, s_last,
        )
    assert got == expect
    assert sum(v[0] for v in got.values()) == total_docs  # all placed
    assert any(v[3] > 0 for v in got.values())  # straddling docs exist
    for shard, (nd, nt, ns, nstr, pad, sf_, sl_) in got.items():
        assert 0 <= pad < _PACK_LEN
        assert ns == -(-nt // _PACK_LEN)
        assert sl_ >= sf_  # last >= first per doc, so sums ordered


def test_temperature_budget_fill_python_replica_and_flattening(spark):
    """Temperature-derived allocation + fill (round-13): independent
    python replica (math.isqrt — exact, vs the engine's corrected
    float sqrt; hashlib shards; largest-remainder) matches every
    column exactly; pins: Σ allocated == budget to the token, the
    flattening is non-vacuous (the smallest source gets a strictly
    larger alloc/material ratio than the largest), and binding
    sources truncate."""
    import hashlib
    import math
    import re

    import duckdb

    from outreach_etl_tool_spark.queries.pipeline import (
        _MIX_SHARDS,
        _TEMP_FILL_DEN,
        _TEMP_FILL_NUM,
        temperature_budget_fill,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["source"]: (
            r["n_docs"], r["domain_tokens"], r["allocated_tokens"],
            r["w_sqrt"], r["n_kept"], r["tokens_kept"],
        )
        for r in temperature_budget_fill(spark, sf).collect()
    }
    rows = duckdb.connect().execute(
        "SELECT doc_id, source, LEN(regexp_extract_all(LOWER(text), "
        f"'[a-zA-Z]+')) FROM '{sf}/documents.parquet'"
    ).fetchall()
    per: dict[str, int] = {}
    nd: dict[str, int] = {}
    for _, s, n in rows:
        per[s] = per.get(s, 0) + n
        nd[s] = nd.get(s, 0) + 1
    total = sum(per.values())
    budget = total * _TEMP_FILL_NUM // _TEMP_FILL_DEN
    w = {s: math.isqrt(t) for s, t in per.items()}
    W = sum(w.values())
    base_a = {s: budget * w[s] // W for s in per}
    rem = {s: budget * w[s] % W for s in per}
    leftover = budget - sum(base_a.values())
    order = sorted(per, key=lambda s: (-rem[s], s))
    alloc = {
        s: base_a[s] + (1 if i < leftover else 0)
        for i, s in enumerate(order)
    }
    assert sum(alloc.values()) == budget  # exhausted to the token

    # round-14 ADVICE: the engine's int64-bounded restructuring
    # (q·w + (r·w) div W with n_budget = q·W + r) equals the naive
    # product form EXACTLY — pinned here at the 100 TB design point
    # where the naive form overflows int64 (9.5e19 > 2^63)
    for nb, ws, wt in [
        (19_000_000_000_000, 5_000_000, 37_000_000),
        (budget, max(w.values()), W),
    ]:
        q, r = divmod(nb, wt)
        assert q * ws + (r * ws) // wt == (nb * ws) // wt
        assert (r * ws) % wt == (nb * ws) % wt
        assert q * ws + (r * ws) // wt < 2**63  # stays in int64
        assert r * ws < 2**63
    # sub-stream fill replica
    streams: dict[tuple[str, int], list[tuple[str, int, int]]] = {}
    for did, s, n in rows:
        shard = int(
            hashlib.md5(f"mix#{did}".encode()).hexdigest()[:8], 16
        ) % _MIX_SHARDS
        ordh = hashlib.md5(f"mixord#{did}".encode()).hexdigest()
        streams.setdefault((s, shard), []).append((ordh, did, n))
    kept_docs = {s: 0 for s in per}
    kept_toks = {s: 0 for s in per}
    for (s, shard), docs in streams.items():
        q_shard = alloc[s] // _MIX_SHARDS + (
            1 if shard < alloc[s] % _MIX_SHARDS else 0
        )
        cum = 0
        for ordh, did, n in sorted(docs):
            if cum < q_shard or alloc[s] >= per[s]:
                kept_docs[s] += 1
                kept_toks[s] += n
            cum += n
    assert set(got) == set(per)
    for s, (gnd, gdt, gat, gw, gnk, gtk) in got.items():
        assert gnd == nd[s] and gdt == per[s]
        assert gw == w[s] and gat == alloc[s], (s, gat, alloc[s])
        assert gnk == kept_docs[s] and gtk == kept_toks[s]
    # flattening: smallest source's share of its material strictly
    # exceeds the largest source's
    smallest = min(per, key=per.get)
    largest = max(per, key=per.get)
    assert alloc[smallest] * per[largest] > alloc[largest] * per[smallest]
    # binding sources truncate
    assert any(v[5] < v[1] for v in got.values())

"""Training-data pipeline operators beyond detection: deterministic
dataset splitting, Gopher-style repetition/quality signals, eval-set
decontamination, and duplicate-cluster resolution (SURVEY.md §2.10,
BASELINE.json "LLM-data-pipeline operators" north star).

All four are oracle-checked — including the iterative connected-
components operator, whose DuckDB mirror is a recursive CTE computing
the same fixed point.

Portability constraints that shape the code:

- Hash-based splitting uses ``md5`` (identical bytes-in/hex-out in
  Spark and DuckDB) with *lexicographic* bucket boundaries on the hex
  prefix — fixed-width lowercase hex orders identically to its numeric
  value, so no hex→int conversion (which the two engines express
  differently) is ever needed.
- n-grams are built positionally (``sequence`` + ``element_at`` /
  ``generate_series`` + ``list_slice``) with the same "docs shorter
  than k yield no grams" convention on both sides.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import cluster, ngram
from ..functions import text as TXT
from ..functions.expr import bind_once
from ..operators.util import ensure_parallelism
from . import QuerySpec


def _grams(text: Column | str, k: int) -> Column:
    """Non-distinct k-token grams, space-joined; empty for docs with
    fewer than k tokens (unlike dedup.minhash.shingles, which floors
    short docs to one whole-doc shingle — the simple convention here
    mirrors 1:1 into SQL). Token array bound once (functions/expr.py)
    so consumers that filter + size + explode the grams don't re-run
    the tokenizer per reference."""

    def _build(toks: Column) -> Column:
        n = F.size(toks)
        # sequence(1, hi) DESCENDS when hi < 1 — floor at 1, gate with when()
        idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
        g = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
        return F.when(n >= k, g).otherwise(F.array().cast("array<string>"))

    return bind_once(TXT.tokens(text), _build)


# ---------------------------------------------------------------------------
# SPLIT — deterministic hash split into train/val/holdout
# ---------------------------------------------------------------------------
# The standard way a 100 TB corpus is split: a content-stable hash of a
# key, not rand() — reproducible across runs, engines, and partitioning,
# and any doc's split is computable without scanning the corpus. Narrow
# (no shuffle, no UDF): md5 + substring + CASE inside codegen.
# Boundaries: first hex byte < 0xe6 → train (230/256 ≈ 89.8%),
# < 0xf3 → val (13/256 ≈ 5.1%), else holdout.
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < "e6", "train")
        .when(bucket < "f3", "val")
        .otherwise("holdout")
        .alias("split"),
    )


SPLIT_TRAIN_HOLDOUT_SQL = """
SELECT doc_id,
       SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
       CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
            WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
            ELSE 'holdout' END AS split
FROM documents
"""


# ---------------------------------------------------------------------------
# QUALITY SIGNALS — Gopher-style repetition statistics per document
# ---------------------------------------------------------------------------
# The repetition family of quality rules (Rae et al., Gopher, §A1.1):
# fraction of duplicated tokens, most-frequent-token dominance, and
# duplicate-2-gram fraction.
#
# Design (measured at sf0.1): per-doc statistics are embarrassingly
# parallel, so the right plan has ZERO shuffles — one Arrow round-trip
# per batch (mapInPandas, numpy unique per doc). The two natural
# "declarative" forms both lose: explode + two-level groupBy shuffles
# the exploded corpus twice and joins the two stat families back
# (1.30 s); repartition(doc_id) + posexplode + lead() reuses one
# exchange but still ships the whole corpus (0.93 s); this narrow
# pipeline runs the same stats in 0.52 s and at 100 TB never touches
# the network. Docs with zero tokens emit no row (matches the
# UNNEST-based oracle); docs with one token get a null dup_2gram_frac.
_QS_SCHEMA = (
    "doc_id long, n_tokens long, n_distinct long, dup_token_frac double, "
    "top_token_frac double, dup_2gram_frac double"
)


def _quality_stats_batches(batches):
    pat = re.compile(TXT.TOKEN_RE)  # single tokenization source of truth
    cols = (
        "doc_id", "n_tokens", "n_distinct", "dup_token_frac",
        "top_token_frac", "dup_2gram_frac",
    )
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in cols}
        for doc_id, text in zip(
            pdf["doc_id"].to_numpy(), pdf["text"].to_numpy()
        ):
            toks = pat.findall(text.lower()) if text else []
            n = len(toks)
            if n == 0:
                continue
            arr = np.asarray(toks, dtype=object)
            _, counts = np.unique(arr, return_counts=True)
            nd = len(counts)
            out["doc_id"].append(doc_id)
            out["n_tokens"].append(n)
            out["n_distinct"].append(nd)
            out["dup_token_frac"].append(1.0 - nd / n)
            out["top_token_frac"].append(counts.max() / n)
            if n >= 2:
                g = np.char.add(
                    np.char.add(arr[:-1].astype(str), " "), arr[1:].astype(str)
                )
                out["dup_2gram_frac"].append(1.0 - len(np.unique(g)) / (n - 1))
            else:
                out["dup_2gram_frac"].append(None)
        yield pd.DataFrame(out)


def quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "text").mapInPandas(
        _quality_stats_batches, _QS_SCHEMA
    )


QUALITY_SIGNALS_SQL = """
WITH tok AS (
    SELECT doc_id, UNNEST(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS tok
    FROM documents
), tc AS (
    SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY doc_id, tok
), ts AS (
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct,
           1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
             AS dup_token_frac,
           CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
             AS top_token_frac
    FROM tc GROUP BY doc_id
), grams AS (
    SELECT doc_id,
           arr[i] || ' ' || arr[i + 1] AS g
    FROM (SELECT doc_id,
                 regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
          FROM documents),
         UNNEST(generate_series(1, LEN(arr) - 1)) AS t(i)
), gc AS (
    SELECT doc_id, g, COUNT(*) AS cnt FROM grams GROUP BY doc_id, g
), gs AS (
    SELECT doc_id,
           1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
             AS dup_2gram_frac
    FROM gc GROUP BY doc_id
)
SELECT ts.doc_id, ts.n_tokens, ts.n_distinct, ts.dup_token_frac,
       ts.top_token_frac, gs.dup_2gram_frac
FROM ts LEFT JOIN gs ON ts.doc_id = gs.doc_id
"""


# ---------------------------------------------------------------------------
# DECONTAMINATE — n-gram overlap against a benchmark/eval set
# ---------------------------------------------------------------------------
# Before training, every corpus is checked for eval-set leakage: any
# training doc sharing a k-gram with an eval doc is flagged (the
# GPT-3/PaLM-style n-gram decontamination rule). Here the "eval set" is
# the doc_id % 97 == 0 slice of the corpus standing in for a benchmark
# suite. Shape at scale: eval sets are tiny (thousands of prompts), so
# the distinct eval grams are BROADCAST — the 100 TB corpus scan never
# shuffles; each task probes a local hash set. (Even bigger eval sets
# would swap the broadcast for a bloom filter, same plan shape.)
# k=4 on this small-vocabulary synthetic corpus plays the role 8-13
# grams do on real text: rare enough that overlap means leakage, common
# enough that the check exercises real hits (8 docs at sf0.01).
_DECON_K = 4
_EVAL_MOD = 97


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_grams("text", _DECON_K))).alias("gram"),
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select(
        F.col("doc_id").alias("eval_id"), "gram"
    )
    train_grams = grams.filter(~is_eval)
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


DECONTAMINATE_SQL = f"""
WITH grams AS (
    SELECT DISTINCT doc_id,
           array_to_string(list_slice(arr, i, i + {_DECON_K - 1}), ' ') AS gram
    FROM (SELECT doc_id,
                 regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
          FROM documents),
         UNNEST(generate_series(1, LEN(arr) - {_DECON_K - 1})) AS t(i)
), ev AS (
    SELECT doc_id AS eval_id, gram FROM grams WHERE doc_id % {_EVAL_MOD} = 0
), tr AS (
    SELECT doc_id, gram FROM grams WHERE doc_id % {_EVAL_MOD} <> 0
)
SELECT tr.doc_id,
       COUNT(DISTINCT tr.gram) AS n_shared_grams,
       COUNT(DISTINCT ev.eval_id) AS n_eval_docs
FROM tr JOIN ev ON tr.gram = ev.gram
GROUP BY tr.doc_id
"""


# Bloom tier of the same operator: once the eval gram table outgrows
# comfortable broadcast, ship ~10 bits/gram instead of the strings.
# Corpus grams probe the broadcast bit array in numpy (no join); only
# bloom survivors (true hits + fpp noise) enter the exact verify join,
# which removes false positives — so this SHARES decontaminate's
# oracle: the two-tier output equals the exact join bit-for-bit.
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..functions.bloom import build_bloom_distributed

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_grams("text", _DECON_K))).alias("gram"),
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    # localCheckpoint, not persist: the eval-gram explode feeds three
    # consumers (sizing, bloom build, exact verify join) and the eval
    # slice is the small side by construction — but a persist() entry
    # outlives the call in the session CacheManager (the round-9/10
    # ADVICE leak its siblings already fixed). Checkpointed blocks are
    # freed with the frame reference.
    eval_grams = (
        grams.filter(is_eval)
        .select(F.col("doc_id").alias("eval_id"), "gram")
        .localCheckpoint()
    )
    # build: fully distributed — partitions fold grams into local bit
    # arrays, a bit_or agg merges the 64-bit words, and the driver
    # receives only the final ~m/64-word array (never gram strings)
    bloom = build_bloom_distributed(eval_grams.select("gram"), fpp=0.01)
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def maybe_eval(g: pd.Series) -> pd.Series:
        return pd.Series(bc.value.contains(list(g.astype(str))))

    train_grams = grams.filter(~is_eval)
    candidates = train_grams.filter(maybe_eval(F.col("gram")))
    return (
        candidates.join(F.broadcast(eval_grams), "gram")  # exact verify
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


# ---------------------------------------------------------------------------
# DEDUP CLUSTER — connected components over near-dup pairs
# ---------------------------------------------------------------------------
# Pair detection (minhash/ngram/...) emits edges; actual deduplication
# needs transitive closure: A~B, B~C → one cluster {A,B,C}, keep the
# canonical (minimum-id) member. Spark side: iterative min-label
# propagation (dedup/cluster.py — one shuffle per round, rounds =
# cluster diameter). Oracle: a recursive CTE reaching the same fixed
# point. Pairs here are exact 3-gram Jaccard ≥ 0.4 within the same
# source (the sharded exact tier — dedup/ngram.py), so both engines
# derive the identical edge set independently.
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram.jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.4, partition_col="source"
    )
    comps = cluster.connected_components(
        pairs, docs.select("doc_id"), id_col="doc_id"
    )
    return comps.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keep"),
    )


# shingle CASE mirrors dedup.minhash.shingles: <3 tokens → one whole-doc
# shingle (never fires on this corpus — min 10 tokens — but keeps the
# oracle faithful to the operator, not to the dataset).
_DEDUP_CLUSTER_CTES = """sh AS (
    SELECT doc_id, source,
           CASE WHEN LEN(arr) = 0 THEN CAST([] AS VARCHAR[])
                WHEN LEN(arr) < 3 THEN [array_to_string(arr, ' ')]
                ELSE list_distinct(list_transform(
                       generate_series(1, LEN(arr) - 2),
                       i -> array_to_string(list_slice(arr, i, i + 2), ' ')))
           END AS sh
    FROM (SELECT doc_id, source,
                 regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
          FROM documents)
), pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE LEN(a.sh) > 0 AND LEN(b.sh) > 0
      AND CAST(LEN(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (LEN(a.sh) + LEN(b.sh) - LEN(list_intersect(a.sh, b.sh))) >= 0.4
), edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b AS a, id_a AS b FROM pairs
), reach(a, b) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)"""


DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE {_DEDUP_CLUSTER_CTES}
SELECT a AS doc_id, MIN(b) AS cluster_id, a = MIN(b) AS is_keep
FROM reach GROUP BY a
"""


# The duplication-mass metric a curation run reports: how many
# clusters of each size exist and how many documents they absorb —
# "X% of the corpus lives in duplicate clusters of size ≥ s" is read
# straight off the cumulative tail. Composes dedup_cluster's
# components (shared derivation, shared oracle CTE body) with two
# tiny rollups; the histogram is cluster-count-sized, never
# doc-count-sized.
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    comps = dedup_cluster(spark, sf_dir)
    sizes = comps.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "size",
            "n_clusters",
            (F.col("size") * F.col("n_clusters")).alias("n_docs"),
        )
        .orderBy("size")
    )


DEDUP_CLUSTER_SIZES_SQL = f"""
WITH RECURSIVE {_DEDUP_CLUSTER_CTES},
comp AS (
    SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
), cs AS (
    SELECT cluster_id, COUNT(*) AS size FROM comp GROUP BY cluster_id
)
SELECT size, COUNT(*) AS n_clusters,
       CAST(size * COUNT(*) AS BIGINT) AS n_docs
FROM cs GROUP BY size ORDER BY size
"""


# ---------------------------------------------------------------------------
# DOMAIN MIX — deterministic per-source downsampling (mixture weights)
# ---------------------------------------------------------------------------
# Corpus mixing: each domain/source gets a sampling fraction (the
# Pile/DoReMi-style static mixture), applied as a *deterministic* hash
# gate, not rand() — any doc's keep/drop is reproducible and the
# sampled corpus is stable under re-partitioning and re-runs. The gate
# compares a fixed-width md5 prefix against a per-source hex threshold
# (p = thresh/65536), all inside codegen; the rollup is one hash
# shuffle with map-side combine. Fractions here key off the numeric
# source suffix mod 4: 1.0 / 0.5 ('8000') / 0.25 ('4000') / ~0.1
# ('199a').
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # try_cast (TRY_CAST in the oracle): a digit-less source yields ''
    # from regexp_extract, which a plain ANSI cast would throw on — the
    # intended semantics are NULL → keep-everything default
    num = F.regexp_extract("source", r"(\d+)", 1).try_cast("int")
    thresh = (
        F.when(num % 4 == 1, "8000")
        .when(num % 4 == 2, "4000")
        .when(num % 4 == 3, "199a")
        .otherwise(None)  # mod 0 → keep everything
    )
    h4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    kept = thresh.isNull() | (h4 < thresh)
    return docs.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(
            F.when(kept, TXT.token_count("text")).otherwise(0).cast("long")
        ).alias("tokens_kept"),
    )


DOMAIN_MIX_SAMPLE_SQL = """
WITH gated AS (
    SELECT source,
           CASE TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER) % 4
                WHEN 1 THEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
                WHEN 2 THEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
                WHEN 3 THEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4) < '199a'
                ELSE TRUE END AS kept,
           LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS n_tok
    FROM documents
)
SELECT source,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
FROM gated
GROUP BY source
"""


# ---------------------------------------------------------------------------
# TEMPERATURE-SCALED MIXING — share^alpha reweighting (XLM-R style)
# ---------------------------------------------------------------------------
# The curation-family operator domain_mix_sample's share CAPS cannot
# express: smooth a skewed domain distribution toward uniform by
# sampling domain d with weight proportional to share^alpha (the
# standard multilingual/domain temperature reweighting — alpha in
# (0,1) upsamples the tail relative to the head). Rejection form:
# relative to the SMALLEST domain (whose acceptance is 1), a doc in
# domain d is kept with probability (n_min/n_d)^(1-alpha), so the
# post-sample share is proportional to n_d^alpha exactly.
#
# Exactness discipline (the DSIR algebra): alpha = num/den is an exact
# rational; log-space weights use functions/intlog.ilog2_64 (1/64-bit
# fixed point, bit-identical across Spark/DuckDB/python), and the
# accept test cross-multiplies by den so no division happens at all:
#   keep  iff  (num-den)·(ilog2(n_d) - ilog2(n_min))
#              >= den·(ilog2(u) - 64·30),   u = md5-uniform in [1,2^30]
# i.e. P(keep) = 2^((alpha-1)·log2(n_d/n_min)) with deterministic
# hash-derandomized Bernoulli decisions. alpha = 1 makes the LHS zero
# and the RHS non-positive for every u, so EVERYTHING is kept —
# temperature 1 is proportional sampling, pinned by a boundary test.
#
# The registry query keys on LANG, not source: the driver corpus has
# exactly-uniform source sizes by construction (every weight would be
# 0 — a degenerate output the hash gate can't distinguish from a bug)
# while lang shares are ~3:1 skewed, so en visibly downsamples. Scale
# shape: one map-side-combinable count rollup (domain-cardinality
# rows), a broadcast of the weight table, one hash-gate pass, one
# final rollup — no shuffle keyed on anything bigger than the domain.
_TEMP_NUM, _TEMP_DEN = 1, 2  # alpha = 1/2


def temperature_sample_frame(
    docs: DataFrame,
    key_col: str = "lang",
    alpha_num: int = _TEMP_NUM,
    alpha_den: int = _TEMP_DEN,
) -> DataFrame:
    """Per-domain rollup of temperature-scaled sampling over an
    arbitrary (doc_id, key_col, text) frame: (key, n_total,
    weight_scaled, n_kept, tokens_kept). weight_scaled is the exact
    integer (num-den)·(ilog2_64(n_d) - ilog2_64(n_min)) <= 0 — den
    times the log2-acceptance in 1/64-bit units (audit column; the
    per-doc gate compares den·(ilog2_64(u) - 64·30) against it)."""
    from ..functions.intlog import spark_expr as _L

    cnt = docs.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_total"))
    mn = cnt.agg(F.min("n_total").alias("n_min"))
    wt = (
        cnt.crossJoin(F.broadcast(mn))
        .select(
            key_col,
            "n_total",
            (
                F.lit(alpha_num - alpha_den).cast("long")
                * (F.expr(_L("n_total")) - F.expr(_L("n_min")))
            ).alias("weight_scaled"),
        )
    )
    u = (
        "(CAST(conv(substring(md5(concat('temp#', "
        "CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) "
        f"% {1 << 30} + 1)"
    )
    kept = (
        F.lit(alpha_den).cast("long") * (F.expr(_L(u)) - F.lit(64 * 30))
        <= F.col("weight_scaled")
    )
    return (
        docs.join(F.broadcast(wt), key_col)
        .groupBy(key_col, "n_total", "weight_scaled")
        .agg(
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(
                F.when(kept, TXT.token_count("text"))
                .otherwise(0)
                .cast("long")
            ).alias("tokens_kept"),
        )
        .orderBy(key_col)
    )


def lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_sample_frame(
        ensure_parallelism(load_table(spark, sf_dir, "documents"))
    )


def _lang_temperature_sample_sql() -> str:
    from ..functions.intlog import duck_expr as _L

    num, den = _TEMP_NUM, _TEMP_DEN
    u = (
        "(('0x' || substr(md5('temp#' || CAST(doc_id AS VARCHAR)), 1, 8))"
        f"::BIGINT % {1 << 30} + 1)"
    )
    return f"""
WITH cnt AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total
    FROM documents GROUP BY lang
), mn AS (
    SELECT MIN(n_total) AS n_min FROM cnt
), wt AS (
    SELECT lang, n_total,
           CAST({num - den} AS BIGINT)
               * ({_L("n_total")} - {_L("n_min")}) AS weight_scaled
    FROM cnt, mn
), gated AS (
    SELECT d.lang, w.n_total, w.weight_scaled,
           {den} * ({_L(u)} - {64 * 30}) <= w.weight_scaled AS kept,
           LEN(regexp_extract_all(LOWER(d.text), '[a-zA-Z]+')) AS n_tok
    FROM documents d JOIN wt w USING (lang)
)
SELECT lang, n_total, weight_scaled,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
           AS tokens_kept
FROM gated
GROUP BY lang, n_total, weight_scaled
ORDER BY lang
"""


LANG_TEMPERATURE_SAMPLE_SQL = _lang_temperature_sample_sql()


# ---------------------------------------------------------------------------
# TOKEN-BUDGET MIXTURE EXECUTOR — the "data recipe" step that turns a
# mixture spec into an exact document selection. Rate-based mixing
# (temperature/DSIR above) hits proportions IN EXPECTATION; the recipe
# executor a training run actually ships fills per-domain TOKEN QUOTAS
# exactly: total budget B = 4/5 of corpus tokens, uniform per-domain
# quotas q_d = B/D (rebalance-to-uniform — the head domain truncates,
# tail domains keep everything, both visible in the output), greedy
# fill in a deterministic hash order including the quota-crossing doc.
#
# Scale shape — the naive form is a PER-DOMAIN GLOBAL CUMSUM, i.e. one
# sequential task per domain at 100 TB (the single-task-window
# anti-pattern). The executor instead splits every domain's quota
# across _MIX_SHARDS hash-salted sub-streams and fills each sub-stream
# independently: parallelism = D × S with S a free knob (shard count
# scales with the cluster, exactly like corpus_shuffle_shards), the
# fill inside a sub-stream stays an exact integer prefix sum, and the
# selection remains fully deterministic — a different-but-well-defined
# spec vs the global order, stated here rather than hidden. All quota
# arithmetic is floor division on exact BIGINTs; the oracle replays it
# identically.
_MIX_BUDGET_NUM, _MIX_BUDGET_DEN = 4, 5
_MIX_SHARDS = 8


def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        "lang",
        F.size(TXT.tokens("text")).cast("long").alias("n_tok"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mix#"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _MIX_SHARDS
        ).alias("shard"),
        F.md5(
            F.concat(F.lit("mixord#"), F.col("doc_id").cast("string"))
        ).alias("ord"),
    )
    tot = base.agg(
        F.sum("n_tok").alias("t_total"),
        F.countDistinct("lang").alias("n_domains"),
    )
    q = tot.select(
        F.expr(
            f"(t_total * {_MIX_BUDGET_NUM}) div {_MIX_BUDGET_DEN}"
            f" div n_domains div {_MIX_SHARDS}"
        ).alias("q_shard")
    )
    w = Window.partitionBy("lang", "shard").orderBy("ord", "doc_id")
    filled = (
        base.crossJoin(F.broadcast(q))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("kept", F.col("cum_before") < F.col("q_shard"))
    )
    return (
        filled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("domain_tokens"),
            (F.first("q_shard") * _MIX_SHARDS).cast("bigint").alias("quota_tokens"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .orderBy("lang")
    )


TOKEN_BUDGET_MIX_SQL = f"""
WITH base AS (
    SELECT doc_id, lang,
           CAST(LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS BIGINT)
               AS n_tok,
           ('0x' || substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT % {_MIX_SHARDS} AS shard,
           md5('mixord#' || CAST(doc_id AS VARCHAR)) AS ord
    FROM documents
), tot AS (
    SELECT CAST(SUM(n_tok) AS BIGINT) AS t_total,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_domains
    FROM base
), q AS (
    SELECT (t_total * {_MIX_BUDGET_NUM}) // {_MIX_BUDGET_DEN}
               // n_domains // {_MIX_SHARDS} AS q_shard
    FROM tot
), filled AS (
    SELECT b.lang, b.n_tok, q.q_shard,
           COALESCE(SUM(b.n_tok) OVER (
               PARTITION BY b.lang, b.shard ORDER BY b.ord, b.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               < q.q_shard AS kept
    FROM base b, q
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS domain_tokens,
       CAST(MIN(q_shard) * {_MIX_SHARDS} AS BIGINT) AS quota_tokens,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
           AS tokens_kept
FROM filled
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# UNIMAX BUDGET ALLOCATION — the third member of the mixing family
# (round-12; UniMax, ICLR 2023): token_budget_mix fills UNIFORM
# per-domain quotas, lang_temperature_sample reweights by size^1/T;
# UniMax allocates a total budget as EQUAL shares per source, capped
# at C epochs of each source's own material — the multilingual-mix
# rule that prevents small sources from being over-repeated while
# large sources absorb the surplus. The allocation is exact-integer
# WATERFILLING in closed form, not an iterative loop:
#
#   sort sources by cap = C·tokens_s ascending (source tie-break);
#   source i is CAPPED iff cap_j·(D−j+1) ≤ N − prefix_{j−1} holds for
#   ALL j ≤ i (a running-min flag — the capped set is the maximal
#   prefix where taking the full cap stays below the water level);
#   the D−k uncapped sources split R = N − Σ capped caps as
#   q = R div m each, with the first R mod m (in sort order) getting
#   one extra token — the token_budget_mix remainder discipline.
#
# Budget N = (19·total) div 10 (1.9 epochs of the corpus) against
# C = 2 epoch caps: binding for the small sources, slack for the
# large — both regimes pinned non-degenerate in the pytest. Scale
# shape: one corpus rollup to D = |sources| rows; the sort window
# runs over that vocabulary-bounded frame (the documented
# single-task-window exception); everything else is scalar.
# ---------------------------------------------------------------------------
_UNIMAX_CAP_EPOCHS = 2
_UNIMAX_BUDGET_NUM, _UNIMAX_BUDGET_DEN = 19, 10


def _unimax_alloc_frame(
    per: DataFrame,
    cap_epochs: int = _UNIMAX_CAP_EPOCHS,
    budget_num: int = _UNIMAX_BUDGET_NUM,
    budget_den: int = _UNIMAX_BUDGET_DEN,
) -> DataFrame:
    """Closed-form exact-integer UniMax waterfilling over a (source,
    n_tokens) rollup — returns (source, n_tokens, cap, allocated_tokens,
    capped). Shared by the oracled allocator query (default recipe:
    C=2 epoch caps, 1.9-epoch budget) and the fill executor
    `unimax_budget_fill` (C=1, 0.95 epochs — see its recipe note),
    round-13."""
    from pyspark.sql.window import Window

    caps = per.select(
        "source",
        "n_tokens",
        (F.col("n_tokens") * cap_epochs).alias("cap"),
    )
    tot = caps.agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("d")
    ).select(
        F.expr(
            f"(t * {budget_num}) div {budget_den}"
        ).alias("n_budget"),
        "d",
    )
    w = Window.orderBy("cap", "source")  # D rows: vocabulary-bounded
    marked = (
        caps.crossJoin(F.broadcast(tot))
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "prefix",
            F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "f",
            F.when(
                F.col("cap") * (F.col("d") - F.col("i") + 1)
                <= F.col("n_budget") - (F.col("prefix") - F.col("cap")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "capped",
            F.min("f").over(
                Window.orderBy("i").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            == 1,
        )
    )
    stats = marked.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap"))), F.lit(0)
        ).alias("csum"),
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).alias("ccnt"),
    )
    j = marked.crossJoin(F.broadcast(stats))
    m = F.col("d") - F.col("ccnt")
    q = F.expr("(n_budget - csum) div (d - ccnt)")
    rem = F.expr("(n_budget - csum) % (d - ccnt)")
    alloc = (
        F.when(F.col("capped"), F.col("cap"))
        .when(
            m > 0,
            q + F.when(F.col("i") - F.col("ccnt") <= rem, 1).otherwise(0),
        )
        .otherwise(F.col("cap"))
    )
    return j.select(
        "source",
        "n_tokens",
        "cap",
        alloc.cast("bigint").alias("allocated_tokens"),
        "capped",
    )


def unimax_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    per = docs.groupBy("source").agg(
        F.sum(F.size(TXT.tokens("text")).cast("long")).alias("n_tokens")
    )
    return (
        _unimax_alloc_frame(per)
        .select(
            "source",
            "n_tokens",
            F.col("cap").cast("bigint").alias("cap_tokens"),
            "allocated_tokens",
            "capped",
        )
        .orderBy("source")
    )


UNIMAX_BUDGET_ALLOC_SQL = f"""
WITH per AS (
    SELECT source,
           CAST(SUM(LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')))
                AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
), caps AS (
    SELECT source, n_tokens,
           n_tokens * {_UNIMAX_CAP_EPOCHS} AS cap
    FROM per
), tot AS (
    SELECT (CAST(SUM(n_tokens) AS BIGINT) * {_UNIMAX_BUDGET_NUM})
               // {_UNIMAX_BUDGET_DEN} AS n_budget,
           CAST(COUNT(*) AS BIGINT) AS d
    FROM caps
), marked AS (
    SELECT c.source, c.n_tokens, c.cap, t.n_budget, t.d,
           ROW_NUMBER() OVER (ORDER BY c.cap, c.source) AS i,
           SUM(c.cap) OVER (ORDER BY c.cap, c.source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
    FROM caps c, tot t
), flagged AS (
    SELECT *,
           CASE WHEN cap * (d - i + 1) <= n_budget - (prefix - cap)
                THEN 1 ELSE 0 END AS f
    FROM marked
), runflag AS (
    SELECT *,
           MIN(f) OVER (ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_i
    FROM flagged
), stats AS (
    SELECT CAST(COALESCE(SUM(CASE WHEN c_i = 1 THEN cap END), 0)
                AS BIGINT) AS csum,
           CAST(COALESCE(SUM(c_i), 0) AS BIGINT) AS ccnt
    FROM runflag
)
SELECT r.source, r.n_tokens,
       CAST(r.cap AS BIGINT) AS cap_tokens,
       CAST(CASE
         WHEN r.c_i = 1 THEN r.cap
         WHEN (r.d - s.ccnt) > 0 THEN
           (r.n_budget - s.csum) // (r.d - s.ccnt)
           + CASE WHEN r.i - s.ccnt
                       <= (r.n_budget - s.csum) % (r.d - s.ccnt)
                  THEN 1 ELSE 0 END
         ELSE r.cap
       END AS BIGINT) AS allocated_tokens,
       r.c_i = 1 AS capped
FROM runflag r, stats s
ORDER BY r.source
"""


# ---------------------------------------------------------------------------
# UNIMAX BUDGET FILL — the allocator COMPOSED with the fill executor
# (round-13; VERDICT r12 #4): unimax_budget_alloc computes per-source
# token budgets and token_budget_mix fills UNIFORM quotas, but the
# actual "execute the data recipe" step — fill each source to ITS
# allocation — is this composition. Every doc hashes into one of
# _MIX_SHARDS sub-streams (the D×8 hash-salted fill discipline) and a
# source's allocation splits across its shards as
# q_shard = alloc div S (+1 for the first alloc % S shards — the
# remainder discipline, so Σ shard quotas == the allocation EXACTLY);
# a doc is kept iff the tokens before it in its (source, shard)
# sub-stream (hash order — deterministic, position-independent) are
# under the shard quota, OR the source's allocation covers its whole
# material (alloc ≥ n_tokens — capped sources by construction, since
# cap = 2 epochs): a non-binding allocation keeps everything, so hash
# skew across a small source's shards cannot spuriously truncate it;
# the shard discipline only cuts sources whose allocation is binding
# (within the per-shard straddle slack — the greedy boundary doc may
# overshoot its shard quota, same contract as token_budget_mix).
# Scale shape: one corpus rollup to D rows for the
# allocator (vocabulary-bounded window), one broadcast of the D-row
# allocation, per-(source, shard) windows over the corpus — no global
# sort, no driver loop.
#
# RECIPE: the fill runs C=1 epoch caps against a 0.95-epoch budget
# (19/20) — the allocator query's own C=2/1.9-epoch setting is
# non-binding for EVERY source on the near-uniform driver corpus
# (every allocation ≥ material ⇒ nothing would truncate, a vacuous
# fill); C=1/0.95 puts both regimes on driver data (measured: 7–8
# sources capped-at-material, 12–13 truncated, at sf0.001 AND sf0.01)
# — pinned non-degenerate in the pytest.
# ---------------------------------------------------------------------------
_UNIMAX_FILL_CAP_EPOCHS = 1
_UNIMAX_FILL_NUM, _UNIMAX_FILL_DEN = 19, 20


def _mix_base(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_tok, shard, ord) — the shared sub-stream
    keying of the fill executors (mix#/mixord# hashes, S=_MIX_SHARDS)."""
    return docs.select(
        "doc_id",
        "source",
        F.size(TXT.tokens("text")).cast("long").alias("n_tok"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mix#"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _MIX_SHARDS
        ).alias("shard"),
        F.md5(
            F.concat(F.lit("mixord#"), F.col("doc_id").cast("string"))
        ).alias("ord"),
    )


def _substream_fill(
    base: DataFrame, alloc: DataFrame, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The D×S sub-stream fill shared by the allocation executors:
    ``base`` is a `_mix_base` frame, ``alloc`` carries (source,
    allocated_tokens, src_tokens, *extra_cols). Each source's
    allocation splits exactly across the S shards (div + remainder),
    a doc is kept while its (source, shard) sub-stream's prior tokens
    are under the shard quota OR the allocation covers the source's
    whole material (non-binding ⇒ keep all). Returns the per-source
    rollup ordered by source."""
    from pyspark.sql.window import Window

    j = base.join(F.broadcast(alloc), "source")
    q_shard = F.expr(
        f"allocated_tokens div {_MIX_SHARDS}"
    ) + F.when(
        F.col("shard") < F.expr(f"allocated_tokens % {_MIX_SHARDS}"), 1
    ).otherwise(0)
    w = Window.partitionBy("source", "shard").orderBy("ord", "doc_id")
    filled = (
        j.withColumn("q_shard", q_shard)
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("n_tok").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "kept",
            (F.col("cum_before") < F.col("q_shard"))
            | (F.col("allocated_tokens") >= F.col("src_tokens")),
        )
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("domain_tokens"),
        F.min("allocated_tokens").cast("bigint").alias("allocated_tokens"),
    ]
    aggs += [F.max(c).alias(c) for c in extra_cols]
    aggs += [
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_kept"),
    ]
    return filled.groupBy("source").agg(*aggs).orderBy("source")


def unimax_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    base = _mix_base(docs)
    per = base.groupBy("source").agg(F.sum("n_tok").alias("n_tokens"))
    alloc = _unimax_alloc_frame(
        per,
        cap_epochs=_UNIMAX_FILL_CAP_EPOCHS,
        budget_num=_UNIMAX_FILL_NUM,
        budget_den=_UNIMAX_FILL_DEN,
    ).select(
        "source",
        "allocated_tokens",
        "capped",
        F.col("n_tokens").alias("src_tokens"),
    )
    return _substream_fill(base, alloc, extra_cols=("capped",))


UNIMAX_BUDGET_FILL_SQL = f"""
WITH base AS (
    SELECT doc_id, source,
           CAST(LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS BIGINT)
               AS n_tok,
           ('0x' || substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT % {_MIX_SHARDS} AS shard,
           md5('mixord#' || CAST(doc_id AS VARCHAR)) AS ord
    FROM documents
), per AS (
    SELECT source, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM base GROUP BY source
), caps AS (
    SELECT source, n_tokens,
           n_tokens * {_UNIMAX_FILL_CAP_EPOCHS} AS cap
    FROM per
), tot AS (
    SELECT (CAST(SUM(n_tokens) AS BIGINT) * {_UNIMAX_FILL_NUM})
               // {_UNIMAX_FILL_DEN} AS n_budget,
           CAST(COUNT(*) AS BIGINT) AS d
    FROM caps
), marked AS (
    SELECT c.source, c.n_tokens, c.cap, t.n_budget, t.d,
           ROW_NUMBER() OVER (ORDER BY c.cap, c.source) AS i,
           SUM(c.cap) OVER (ORDER BY c.cap, c.source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
    FROM caps c, tot t
), flagged AS (
    SELECT *,
           CASE WHEN cap * (d - i + 1) <= n_budget - (prefix - cap)
                THEN 1 ELSE 0 END AS f
    FROM marked
), runflag AS (
    SELECT *,
           MIN(f) OVER (ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_i
    FROM flagged
), stats AS (
    SELECT CAST(COALESCE(SUM(CASE WHEN c_i = 1 THEN cap END), 0)
                AS BIGINT) AS csum,
           CAST(COALESCE(SUM(c_i), 0) AS BIGINT) AS ccnt
    FROM runflag
), alloc AS (
    SELECT r.source,
           CAST(CASE
             WHEN r.c_i = 1 THEN r.cap
             WHEN (r.d - s.ccnt) > 0 THEN
               (r.n_budget - s.csum) // (r.d - s.ccnt)
               + CASE WHEN r.i - s.ccnt
                           <= (r.n_budget - s.csum) % (r.d - s.ccnt)
                      THEN 1 ELSE 0 END
             ELSE r.cap
           END AS BIGINT) AS allocated_tokens,
           r.c_i = 1 AS capped,
           r.n_tokens AS src_tokens
    FROM runflag r, stats s
), filled AS (
    SELECT b.source, b.n_tok, a.allocated_tokens, a.capped,
           COALESCE(SUM(b.n_tok) OVER (
               PARTITION BY b.source, b.shard ORDER BY b.ord, b.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             < (a.allocated_tokens // {_MIX_SHARDS}
                + CASE WHEN b.shard < a.allocated_tokens % {_MIX_SHARDS}
                       THEN 1 ELSE 0 END)
           OR a.allocated_tokens >= a.src_tokens AS kept
    FROM base b JOIN alloc a USING (source)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS domain_tokens,
       CAST(MIN(allocated_tokens) AS BIGINT) AS allocated_tokens,
       BOOL_OR(capped) AS capped,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
           AS tokens_kept
FROM filled
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# TEMPERATURE BUDGET FILL (round-13) — the temperature-derived member
# of the allocation×fill matrix (uniform → token_budget_mix, UniMax →
# unimax_budget_fill, temperature → this): a total budget N = 3/4 of
# corpus tokens splits across sources PROPORTIONALLY TO n_s^(1/T) with
# T = 2 — the multilingual flattening rule (small sources get more
# than their proportional share, large sources less). All exact
# integers: w_s = isqrt(n_s) via float sqrt + two integer correction
# steps (exact for n_s < 2^52 — double sqrt is within 1 there, and the
# corrections pin the floor; both engines run the identical formula);
# alloc_s = (N·w_s) div W plus largest-remainder distribution (the
# first `N − Σ base` sources by remainder desc / source asc get one
# extra token), so Σ alloc == N EXACTLY. The fill is the shared D×S
# sub-stream executor (_substream_fill): non-binding allocations
# (alloc ≥ material — the flattened small sources) keep everything,
# binding ones truncate at their share. D-row windows only.
# ---------------------------------------------------------------------------
_TEMP_FILL_NUM, _TEMP_FILL_DEN = 3, 4


def _isqrt_col(c):
    """Exact integer sqrt of a nonnegative bigint column (< 2^52):
    float sqrt floored, then one up- and one down-correction in exact
    integer arithmetic — identical in Spark and the SQL oracle."""
    s0 = F.floor(F.sqrt(c.cast("double"))).cast("long")
    s1 = F.when((s0 + 1) * (s0 + 1) <= c, s0 + 1).otherwise(s0)
    return F.when(s1 * s1 > c, s1 - 1).otherwise(s1)


def temperature_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    base = _mix_base(docs)
    per = base.groupBy("source").agg(F.sum("n_tok").alias("n_tokens"))
    weighted = per.select(
        "source",
        "n_tokens",
        _isqrt_col(F.col("n_tokens")).alias("w_sqrt"),
    )
    tot = weighted.agg(
        F.expr(
            f"(sum(n_tokens) * {_TEMP_FILL_NUM}) div {_TEMP_FILL_DEN}"
        ).alias("n_budget"),
        F.sum("w_sqrt").alias("w_total"),
    )
    wd = Window.orderBy(
        F.desc("rem"), F.asc("source")
    )  # D rows: vocabulary-bounded
    j = weighted.crossJoin(F.broadcast(tot))
    # overflow-bounded largest-remainder split (round-14 ADVICE): the
    # naive n_budget * w_sqrt blows int64 at the 100 TB design point
    # (~1.9e13 budget × ~5e6 w_sqrt ≈ 9.5e19 > 2^63) — Spark
    # (non-ANSI) would wrap silently while the DuckDB oracle promotes
    # to HUGEINT, an engine-vs-oracle seam invisible at tested scales.
    # With n_budget = q·w_total + r (r < w_total):
    #   floor(n_budget·w/w_total) = q·w + floor(r·w/w_total)
    #   (n_budget·w) mod w_total  = (r·w) mod w_total
    # exactly, and every intermediate is ≤ w_total·max(w_sqrt)
    # (≤ D·2^52 for w_sqrt < 2^26) — int64-safe for any corpus whose
    # per-source token counts fit the _isqrt_col contract (< 2^52).
    staged = j.select(
        "source",
        "n_tokens",
        "w_sqrt",
        F.expr(
            "(n_budget div w_total) * w_sqrt"
            " + ((n_budget % w_total) * w_sqrt) div w_total"
        ).alias("base_alloc"),
        F.expr("((n_budget % w_total) * w_sqrt) % w_total").alias("rem"),
        "n_budget",
    )
    leftover = staged.agg(
        (F.first("n_budget") - F.sum("base_alloc")).alias("leftover")
    )
    alloc = (
        staged.crossJoin(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(wd))
        .select(
            "source",
            F.col("n_tokens").alias("src_tokens"),
            "w_sqrt",
            (
                F.col("base_alloc")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("allocated_tokens"),
        )
    )
    return _substream_fill(base, alloc, extra_cols=("w_sqrt",))


TEMPERATURE_BUDGET_FILL_SQL = f"""
WITH base AS (
    SELECT doc_id, source,
           CAST(LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS BIGINT)
               AS n_tok,
           ('0x' || substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT % {_MIX_SHARDS} AS shard,
           md5('mixord#' || CAST(doc_id AS VARCHAR)) AS ord
    FROM documents
), per AS (
    SELECT source, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM base GROUP BY source
), w0 AS (
    SELECT source, n_tokens,
           CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s0
    FROM per
), w1 AS (
    SELECT source, n_tokens,
           CASE WHEN (s0 + 1) * (s0 + 1) <= n_tokens THEN s0 + 1
                ELSE s0 END AS s1
    FROM w0
), weighted AS (
    SELECT source, n_tokens,
           CASE WHEN s1 * s1 > n_tokens THEN s1 - 1 ELSE s1 END AS w_sqrt
    FROM w1
), tot AS (
    SELECT (CAST(SUM(n_tokens) AS BIGINT) * {_TEMP_FILL_NUM})
               // {_TEMP_FILL_DEN} AS n_budget,
           CAST(SUM(w_sqrt) AS BIGINT) AS w_total
    FROM weighted
), staged AS (
    SELECT w.source, w.n_tokens, w.w_sqrt,
           (t.n_budget * w.w_sqrt) // t.w_total AS base_alloc,
           (t.n_budget * w.w_sqrt) % t.w_total AS rem,
           t.n_budget
    FROM weighted w, tot t
), lo AS (
    SELECT CAST(MIN(n_budget) - SUM(base_alloc) AS BIGINT) AS leftover
    FROM staged
), alloc AS (
    SELECT s.source, s.n_tokens AS src_tokens, s.w_sqrt,
           CAST(s.base_alloc
                + CASE WHEN ROW_NUMBER() OVER (ORDER BY s.rem DESC,
                                               s.source ASC) <= l.leftover
                       THEN 1 ELSE 0 END AS BIGINT) AS allocated_tokens
    FROM staged s, lo l
), filled AS (
    SELECT b.source, b.n_tok, a.allocated_tokens, a.w_sqrt,
           COALESCE(SUM(b.n_tok) OVER (
               PARTITION BY b.source, b.shard ORDER BY b.ord, b.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             < (a.allocated_tokens // {_MIX_SHARDS}
                + CASE WHEN b.shard < a.allocated_tokens % {_MIX_SHARDS}
                       THEN 1 ELSE 0 END)
           OR a.allocated_tokens >= a.src_tokens AS kept
    FROM base b JOIN alloc a USING (source)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS domain_tokens,
       CAST(MIN(allocated_tokens) AS BIGINT) AS allocated_tokens,
       CAST(MAX(w_sqrt) AS BIGINT) AS w_sqrt,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
           AS tokens_kept
FROM filled
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# SEQUENCE-PACKING LAYOUT (round-13) — the concat-and-chunk packing
# every LLM pretraining pipeline runs between curation and training:
# documents are concatenated in a deterministic order and cut into
# fixed-length training sequences of L tokens; the layout decides
# which docs STRADDLE a sequence boundary (their loss spans two
# examples) and how much tail padding each stream pays. Scale shape —
# the naive form is ONE global token cumsum (a single sequential task
# at 100 TB, the anti-pattern the token-budget executor already
# avoids); the packer instead streams docs into _MIX_SHARDS
# hash-salted sub-streams (parallelism = S, a free knob that scales
# with the cluster) and packs each sub-stream independently with an
# exact-integer per-shard prefix sum. Per-doc placement is
# (seq_first, seq_last) = (start div L, (start + n − 1) div L) within
# the shard; the query returns the per-shard rollup (docs, tokens,
# sequences, boundary-straddling docs, tail padding) PLUS the exact
# integer sums of seq_first/seq_last over all docs — those two sums
# certify every per-doc placement through the driver's value hash
# without shipping a per-doc frame.
# ---------------------------------------------------------------------------
_PACK_LEN = 256  # tokens per packed training sequence


def seq_packing_frame(docs: DataFrame) -> DataFrame:
    """Concat-and-chunk packing layout of a (doc_id, text) frame — the
    registry query's exact derivation exposed as a frame function so
    the materialized curation run can pack its committed survivors
    (round-14 — VERDICT r13 #4). See ``seq_packing_layout``."""
    from pyspark.sql.window import Window

    base = docs.select(
        "doc_id",
        F.size(TXT.tokens("text")).cast("long").alias("n_tok"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("pack#"), F.col("doc_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _MIX_SHARDS
        ).alias("shard"),
        F.md5(
            F.concat(F.lit("packord#"), F.col("doc_id").cast("string"))
        ).alias("ord"),
    ).filter(F.col("n_tok") > 0)
    w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    placed = base.withColumn(
        "start",
        F.coalesce(
            F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    ).select(
        "shard",
        "n_tok",
        F.expr(f"start div {_PACK_LEN}").alias("seq_first"),
        F.expr(f"(start + n_tok - 1) div {_PACK_LEN}").alias("seq_last"),
    )
    return (
        placed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.expr(f"(sum(n_tok) + {_PACK_LEN} - 1) div {_PACK_LEN}")
            .cast("bigint")
            .alias("n_seqs"),
            F.sum(
                F.when(F.col("seq_first") != F.col("seq_last"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_straddling"),
            (
                F.expr(f"(sum(n_tok) + {_PACK_LEN} - 1) div {_PACK_LEN}")
                * _PACK_LEN
                - F.sum("n_tok")
            )
            .cast("bigint")
            .alias("pad_tokens"),
            F.sum("seq_first").cast("bigint").alias("sum_seq_first"),
            F.sum("seq_last").cast("bigint").alias("sum_seq_last"),
        )
        .orderBy("shard")
    )


def seq_packing_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return seq_packing_frame(docs)


SEQ_PACKING_LAYOUT_SQL = f"""
WITH base AS (
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS BIGINT)
               AS n_tok,
           ('0x' || substr(md5('pack#' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT % {_MIX_SHARDS} AS shard,
           md5('packord#' || CAST(doc_id AS VARCHAR)) AS ord
    FROM documents
), nz AS (
    SELECT * FROM base WHERE n_tok > 0
), placed AS (
    SELECT shard, n_tok,
           COALESCE(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start
    FROM nz
), cut AS (
    SELECT shard, n_tok,
           start // {_PACK_LEN} AS seq_first,
           (start + n_tok - 1) // {_PACK_LEN} AS seq_last
    FROM placed
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST((SUM(n_tok) + {_PACK_LEN} - 1) // {_PACK_LEN} AS BIGINT)
           AS n_seqs,
       CAST(SUM(CASE WHEN seq_first <> seq_last THEN 1 ELSE 0 END)
            AS BIGINT) AS n_straddling,
       CAST((SUM(n_tok) + {_PACK_LEN} - 1) // {_PACK_LEN} * {_PACK_LEN}
            - SUM(n_tok) AS BIGINT) AS pad_tokens,
       CAST(SUM(seq_first) AS BIGINT) AS sum_seq_first,
       CAST(SUM(seq_last) AS BIGINT) AS sum_seq_last
FROM cut
GROUP BY shard
ORDER BY shard
"""


# ---------------------------------------------------------------------------
# WEIGHTED SAMPLING WITHOUT REPLACEMENT — Efraimidis–Spirakis priority
# sampling in exact integers (round-12): select k documents with
# probability proportional to weight WITHOUT replacement by ranking on
# u_i^(1/w_i) (u uniform). Distributed shape: each item computes its
# own priority key independently (no global state, no sequential
# pass), then one TakeOrdered(k) — the one-pass weighted-reservoir
# primitive a corpus subsampler uses, here with w = token count
# (length-proportional selection).
#
# Exactness: ranking by u^(1/w) ⟺ ranking by (32 − log2 u)/w
# ASCENDING for u ∈ [1, 2^32). log2 comes from the engine's fixed-
# point integer ilog2_64 (functions/intlog — shifts and multiplies,
# never libm), so the key is key_i = ((2048 − ilog2_64(u_i)) << 20)
# div w_i — all operands NONNEGATIVE, sidestepping the Spark-div
# (truncate) vs DuckDB-// (floor) divergence on negatives. u_i is the
# hash-derandomized md5 prefix + 1. The CONTRACT is this fixed-point
# rule (ties at 2^-20 resolution break by doc_id), deterministic and
# engine-identical — the statistical behavior is E-S to within the
# 1/64-bit log resolution.
# ---------------------------------------------------------------------------
_WRS_K = 100


def wrs_priority_frame(
    docs: DataFrame, keep_cols: tuple[str, ...] = ("source",)
) -> DataFrame:
    """(doc_id, *keep_cols, n_tokens, priority) — the E-S priority
    keying over an arbitrary (doc_id, text, ...) frame (zero-token
    docs dropped: weight 0 cannot be sampled). Shared by the oracled
    `weighted_sample_topk` query and the curation run's
    ``sample_gate="weighted"`` stage (round-13)."""
    from ..functions.intlog import spark_expr as _L

    base = docs.select(
        "doc_id",
        *keep_cols,
        F.size(TXT.tokens("text")).cast("long").alias("n_tokens"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("wrs#"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            + 1
        ).alias("u"),
    ).filter(F.col("n_tokens") > 0)
    return base.withColumn(
        "priority",
        F.expr(f"((2048 - {_L('u')}) << 20) div n_tokens").cast("bigint"),
    ).drop("u")


def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return (
        wrs_priority_frame(docs)
        .select("doc_id", "source", "n_tokens", "priority")
        .orderBy("priority", "doc_id")
        .limit(_WRS_K)
    )


def _weighted_sample_topk_sql() -> str:
    from ..functions.intlog import duck_expr as _L

    return f"""
WITH base AS (
    SELECT doc_id, source,
           CAST(LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS BIGINT)
               AS n_tokens,
           ('0x' || substr(md5('wrs#' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT + 1 AS u
    FROM documents
), keyed AS (
    SELECT doc_id, source, n_tokens,
           CAST(((2048 - {_L('u')}) << 20) // n_tokens AS BIGINT) AS priority
    FROM base WHERE n_tokens > 0
)
SELECT doc_id, source, n_tokens, priority
FROM keyed
ORDER BY priority, doc_id
LIMIT {_WRS_K}
"""


WEIGHTED_SAMPLE_TOPK_SQL = _weighted_sample_topk_sql()


# ---------------------------------------------------------------------------
# PACK SEQUENCES — greedy contiguous packing into token-budget bins
# ---------------------------------------------------------------------------
# Sample packing: concatenate documents into fixed-capacity training
# sequences (the streaming-fill packer every LLM data loader uses —
# not optimal bin packing, which is NP-hard and order-sensitive, but
# the deterministic contiguous fill). Distributed shape: packing is a
# running sum within each source shard (window cumsum, ONE shuffle on
# source), bin id = floor(preceding_tokens / capacity). At 100 TB each
# source shard packs independently — embarrassingly parallel, no
# global coordination; a doc longer than the capacity occupies its own
# bin(s) without stalling the fill.
_PACK_CAPACITY = 512


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = TXT.token_count("text").cast("long")
    preceding = F.coalesce(F.sum(n_tok).over(w), F.lit(0))
    return docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tok"),
        F.floor(preceding / _PACK_CAPACITY).alias("bin_id"),
    )


PACK_SEQUENCES_SQL = f"""
SELECT doc_id, source,
       CAST(LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS BIGINT)
         AS n_tok,
       CAST(FLOOR(COALESCE(SUM(LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')))
         OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         / {_PACK_CAPACITY}) AS BIGINT) AS bin_id
FROM documents
"""


# ---------------------------------------------------------------------------
# VOCAB TOP-K — corpus-wide token frequencies (vocabulary building)
# ---------------------------------------------------------------------------
# The word-count shape at 100 TB: explode to tokens, hash-aggregate.
# Zipf skew ("the" appears everywhere) is exactly what map-side partial
# aggregation absorbs — each task pre-sums its own counts, so the
# shuffle carries one row per (task, distinct-token), not one per
# occurrence. Doc frequency (for IDF) rides the same aggregation as a
# count-distinct. Final top-k is TakeOrdered over the aggregated
# vocabulary, with a deterministic tie-break so the LIMIT boundary is
# engine-stable.
_VOCAB_K = 100


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("tok"))
        .limit(_VOCAB_K)
    )


VOCAB_TOPK_SQL = f"""
WITH tok AS (
    SELECT doc_id, UNNEST(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS tok
    FROM documents
)
SELECT tok, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
FROM tok GROUP BY tok
ORDER BY n_occurrences DESC, tok ASC
LIMIT {_VOCAB_K}
"""


# ---------------------------------------------------------------------------
# ZIPF SLOPE — rank-frequency power-law fit of the vocabulary
# ---------------------------------------------------------------------------
# The corpus-health diagnostic behind "does this crawl look like
# natural language": token frequencies should follow freq ∝ rank^s
# with s ≈ −1 (Zipf); a flat slope flags synthetic/boilerplate text,
# a steep one a degenerate vocabulary. The fit is ordinary least
# squares of y = log2(freq) on x = log2(rank) — and both logs go
# through functions/intlog.ilog2_64 (exact fixed point, engine-
# identical), so every regression sum is an ORDER-FREE integer:
#   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
# is emitted as its exact integer numerator and denominator plus ONE
# IEEE division for the readable value. Magnitudes: x, y ≤ 64·63;
# per-term xy ≤ 1.6e7; with n ≤ ~10⁶ vocab terms n·Σxy ≤ ~1.6e19 —
# route the final products through decimal(38,0)/HUGEINT. Plan: one
# token rollup (map-side combinable), one rank window over the
# vocab-sized frame (vocabulary ≪ corpus — the same bounded-frame
# argument as the trainers), one scalar aggregate.
def vocab_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.intlog import spark_expr as _L

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    freq = (
        docs.select(F.explode(TXT.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    w = Window.orderBy(F.desc("f"), F.asc("tok"))
    xy = freq.select(
        F.row_number().over(w).cast("long").alias("r"), "f"
    ).select(
        F.expr(_L("r")).alias("x"), F.expr(_L("f")).alias("y")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # numerator/denominator computed in decimal(38) then emitted as
    # BIGINT (DuckDB HUGEINT→pandas dtype diverges from int64 in the
    # driver's hash gate): |num| ≤ n·Σxy ≈ n²·(64·log2 n)² — inside
    # int64 up to ~10⁷ vocabulary terms, far past any tokenized
    # natural-language vocab at these scales
    num = dec("n") * dec("sxy") - dec("sx") * dec("sy")
    den = dec("n") * dec("sxx") - dec("sx") * dec("sx")
    return sums.select(
        F.col("n").cast("bigint").alias("n_terms"),
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        # try_divide: a single-term vocabulary has den = 0 (no x
        # spread) — the fit is undefined, reported as NULL not a job
        # failure (same contract as DuckDB's NULLIF guard)
        F.try_divide(num.cast("double"), den.cast("double")).alias(
            "zipf_slope"
        ),
    )


def _vocab_zipf_slope_sql() -> str:
    from ..functions.intlog import duck_expr as _L

    return f"""
WITH freq AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
    FROM (SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS tok
          FROM documents) t
    GROUP BY tok
), xy AS (
    SELECT {_L("r")} AS x, {_L("f")} AS y
    FROM (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok ASC) AS r
          FROM freq)
), sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM xy
)
SELECT n AS n_terms,
       CAST(n::HUGEINT * sxy::HUGEINT - sx::HUGEINT * sy::HUGEINT
            AS BIGINT) AS slope_num,
       CAST(n::HUGEINT * sxx::HUGEINT - sx::HUGEINT * sx::HUGEINT
            AS BIGINT) AS slope_den,
       CAST(n::HUGEINT * sxy::HUGEINT - sx::HUGEINT * sy::HUGEINT AS DOUBLE)
           / NULLIF(CAST(n::HUGEINT * sxx::HUGEINT - sx::HUGEINT * sx::HUGEINT
                         AS DOUBLE), 0) AS zipf_slope
FROM sums
"""


VOCAB_ZIPF_SLOPE_SQL = _vocab_zipf_slope_sql()


# ---------------------------------------------------------------------------
# PERCENTILE TRIM — drop metric outliers relative to the corpus
# distribution (the "remove the 5% shortest and longest docs" filter
# every curation pipeline applies before training)
# ---------------------------------------------------------------------------
# The bounds are a 2-value aggregate broadcast back onto the scan — the
# corpus never shuffles. Exact percentile interpolates on the sorted
# values identically in Spark and DuckDB (verified bit-for-bit), which
# makes the whole filter oracle-able; at 100 TB swap in
# approx_percentile for the bounds (the filter semantics tolerate
# epsilon on a distribution tail) — the plan shape is unchanged.
def quality_percentile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    bounds = docs.agg(
        F.percentile("n_chars", 0.05).alias("lo"),
        F.percentile("n_chars", 0.95).alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .filter(F.col("n_chars").between(F.col("lo"), F.col("hi")))
        .select("doc_id", "source", "n_chars")
    )


QUALITY_PERCENTILE_TRIM_SQL = """
WITH b AS (
    SELECT quantile_cont(n_chars, 0.05) AS lo,
           quantile_cont(n_chars, 0.95) AS hi
    FROM documents
)
SELECT doc_id, source, n_chars
FROM documents, b
WHERE n_chars BETWEEN lo AND hi
"""


# ---------------------------------------------------------------------------
# TF-IDF KEYWORDS — top terms per document (keyword extraction / search
# feature building)
# ---------------------------------------------------------------------------
# Plan shape: one shuffle builds per-(doc, token) term frequencies; the
# document-frequency table is vocabulary-sized (bounded by the language,
# not the corpus) so it BROADCASTS back onto tf instead of reshuffling
# the corpus by token; one window shuffle ranks within each doc. The
# score is tf·N/df as a single division of exact integers — both
# engines round that one operation identically, so no log-based idf is
# needed for the oracle pairing (the ranking is the same either way).
_TFIDF_K = 5


def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_total"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_total")).cast("double") / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_K)
        .select("doc_id", "tok", "tf", "score")
    )


TFIDF_KEYWORDS_SQL = f"""
WITH tok AS (
    SELECT doc_id, UNNEST(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS tok
    FROM documents
), tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok
), dfreq AS (
    SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), n AS (
    SELECT COUNT(*) AS n_total FROM documents
)
SELECT doc_id, tok, tf, score FROM (
    SELECT t.doc_id, t.tok, t.tf,
           CAST(t.tf * n.n_total AS DOUBLE) / d.df AS score,
           ROW_NUMBER() OVER (
               PARTITION BY t.doc_id
               ORDER BY CAST(t.tf * n.n_total AS DOUBLE) / d.df DESC,
                        t.tok ASC
           ) AS rn
    FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n
) WHERE rn <= {_TFIDF_K}
"""


# ---------------------------------------------------------------------------
# BM25 RETRIEVAL — query-set → top-k documents (search / retrieval /
# decontamination-by-retrieval building block, the ranking-aware
# completion of tfidf_keywords)
# ---------------------------------------------------------------------------
# Okapi BM25 with k1 = 6/5, b = 3/4 — the rational parameter choice is
# what makes the whole score INTEGER-EXACT in both engines.  Per term:
#
#   tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)       with avgdl = L/N
#     = 44·L·tf / (20·L·tf + 6·L + 18·N·dl)           (× 20·L, exact)
#
# idf is the scaled integer (N·1000) div df, the tf fraction is scaled
# by 10^5 and floor-divided, and the per-term contribution is one more
# integer multiply + div — so the document score is a SUM OF BIGINTS,
# which is exact and summation-ORDER-FREE in every engine (a float
# BM25 would hash-diverge on the oracle because SUM order differs).
# Integer division: Spark `div` and DuckDB `//` both truncate, and all
# operands here are positive, so they agree exactly.
#
# Plan shape: the (doc, tok) tf relation is the same one shuffle as
# tfidf_keywords; query terms and the vocabulary-sized df table
# BROADCAST onto it; doc lengths join on doc_id AFTER the query-term
# filter has cut tf to query-term postings only; one window ranks
# per query.  Nothing is O(docs²), nothing collects.
#
# Width contract (documented, fail-visible): 44·L·tf·10^5 must fit a
# signed 64-bit integer → L·tf ≲ 2·10^12, comfortable for the bench
# scales and any single-tenant corpus shard; a 100 TB corpus runs the
# same plan with the scale constants reduced (or the score in double,
# giving up oracle-grade bit equality, not correctness).
_BM25_K = 10
_BM25_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["hash", "join", "strategy"]),
    (2, ["window", "aggregation", "stream"]),
    (3, ["columnar", "scan", "filter"]),
    (4, ["sort", "merge", "shuffle", "skew"]),
]
_BM25_CONTRIB = (
    "(((n_docs * 1000) div df) * "
    "(((44 * l_tot) * tf * 100000) div "
    "(((20 * l_tot) * tf + 6 * l_tot) + (18 * n_docs) * dl))) div 100000"
)


def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = tok.agg(
        F.count(F.lit(1)).alias("l_tot"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id int, tok string",
    )
    dfreq = tf.join(F.broadcast(qterms.select("tok").distinct()), "tok").groupBy(
        "tok"
    ).agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(dfreq), "tok")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", F.expr(_BM25_CONTRIB))
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score_scaled")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_scaled"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _BM25_K)
        .select("query_id", "rank", "doc_id", "score_scaled")
        .orderBy("query_id", "rank")
    )


def _bm25_sql() -> str:
    qvals = ",\n           ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    contrib = _BM25_CONTRIB.replace(" div ", " // ")
    return f"""
WITH qterms(query_id, tok) AS (
    VALUES {qvals}
), tok AS (
    SELECT doc_id, UNNEST(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS tok
    FROM documents
), tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok
), doclen AS (
    SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), stats AS (
    SELECT COUNT(*) AS l_tot, COUNT(DISTINCT doc_id) AS n_docs FROM tok
), dfreq AS (
    SELECT tok, COUNT(*) AS df FROM tf
    WHERE tok IN (SELECT DISTINCT tok FROM qterms)
    GROUP BY tok
), scored AS (
    SELECT q.query_id, t.doc_id,
           {contrib} AS contrib
    FROM tf t
    JOIN qterms q USING (tok)
    JOIN dfreq USING (tok)
    JOIN doclen USING (doc_id)
    CROSS JOIN stats
), agg AS (
    SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_scaled
    FROM scored GROUP BY query_id, doc_id
)
SELECT query_id,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY score_scaled DESC, doc_id ASC) AS INTEGER) AS rank,
       doc_id, score_scaled
FROM agg
QUALIFY rank <= {_BM25_K}
ORDER BY query_id, rank
"""


BM25_RETRIEVAL_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# BM25 DECONTAMINATION — retrieval-based eval-overlap screening
# ---------------------------------------------------------------------------
# The retrieval completion of `decontaminate` (exact 4-gram overlap):
# n-gram decontamination misses paraphrased leakage, so production
# pipelines ALSO retrieve the top-k training docs for each eval doc
# and audit them. Eval set = doc_id ≡ 0 (mod 97), the same convention
# as `decontaminate`; each eval doc queries with its _BMD_Q RAREST
# distinct tokens (global df ascending, token ascending — the
# prefix-filter insight again: rare terms are the discriminative ones
# AND they bound the posting fan-out, so a stopword-heavy eval doc
# cannot explode the join). Scoring is the same all-integer BM25 as
# bm25_retrieval over the TRAIN corpus (idf from train df), top
# _BMD_K per eval doc.
#
# Scale shape: train tf is the one corpus shuffle; the eval-query
# relation is (n_eval × Q) rows and BROADCASTS; df joins broadcast;
# one ranking window. Integer scores -> order-free sums -> exact
# oracle, like bm25_retrieval.
_BMD_Q, _BMD_K = 8, 5


def bm25_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    is_eval = F.col("doc_id") % 97 == 0
    train = docs.filter(~is_eval)
    evald = docs.filter(is_eval)
    tok = train.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = tok.agg(
        F.count(F.lit(1)).alias("l_tot"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    dfreq_all = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    etok = evald.select(
        F.col("doc_id").alias("eval_doc_id"),
        F.explode(F.array_distinct(TXT.tokens("text"))).alias("tok"),
    )
    wq = Window.partitionBy("eval_doc_id").orderBy(
        F.asc("df"), F.asc("tok")
    )
    qterms = (
        etok.join(dfreq_all, "tok")  # eval tokens absent from train drop
        .withColumn("qrn", F.row_number().over(wq))
        .filter(F.col("qrn") <= _BMD_Q)
        .select("eval_doc_id", "tok", "df")
    )
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", F.expr(_BM25_CONTRIB))
    )
    agg = scored.groupBy("eval_doc_id", "doc_id").agg(
        F.sum("contrib").alias("score_scaled")
    )
    w = Window.partitionBy("eval_doc_id").orderBy(
        F.desc("score_scaled"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _BMD_K)
        .select("eval_doc_id", "rank", "doc_id", "score_scaled")
        .orderBy("eval_doc_id", "rank")
    )


def _bm25_decontaminate_sql() -> str:
    contrib = _BM25_CONTRIB.replace(" div ", " // ")
    return f"""
WITH train AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
), evald AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
), tok AS (
    SELECT doc_id, UNNEST(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS tok
    FROM train
), tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok
), doclen AS (
    SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), stats AS (
    SELECT COUNT(*) AS l_tot, COUNT(DISTINCT doc_id) AS n_docs FROM tok
), dfreq AS (
    SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), etok AS (
    SELECT doc_id AS eval_doc_id,
           UNNEST(list_distinct(
               regexp_extract_all(LOWER(text), '[a-zA-Z]+'))) AS tok
    FROM evald
), qterms AS (
    SELECT eval_doc_id, tok, df FROM (
        SELECT e.eval_doc_id, e.tok, d.df,
               ROW_NUMBER() OVER (PARTITION BY e.eval_doc_id
                                  ORDER BY d.df ASC, e.tok ASC) AS qrn
        FROM etok e JOIN dfreq d USING (tok)
    ) WHERE qrn <= {_BMD_Q}
), scored AS (
    SELECT q.eval_doc_id, t.doc_id,
           {contrib} AS contrib
    FROM tf t
    JOIN qterms q USING (tok)
    JOIN doclen USING (doc_id)
    CROSS JOIN stats
), agg AS (
    SELECT eval_doc_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_scaled
    FROM scored GROUP BY eval_doc_id, doc_id
)
SELECT eval_doc_id,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY eval_doc_id
           ORDER BY score_scaled DESC, doc_id ASC) AS INTEGER) AS rank,
       doc_id, score_scaled
FROM agg
QUALIFY rank <= {_BMD_K}
ORDER BY eval_doc_id, rank
"""


BM25_DECONTAMINATE_SQL = _bm25_decontaminate_sql()


# ---------------------------------------------------------------------------
# SOURCE OVERLAP — exact corpus-level Jaccard between sources
# ---------------------------------------------------------------------------
# The corpus-analytics companion of per-document dedup: "how much of
# source A's content also lives in source B" drives crawl dedup
# priorities and mixture weights. Exact, not sketched: per-shingle we
# collect the SORTED source set (bounded by the source count, a
# corpus constant — never doc-count-sized), expand its pairs, and
# count — one shuffle on the shingle hash with map-side distinct,
# pair fan-out ≤ C(n_sources, 2) per shingle. Jaccard is one division
# of exact integers. At 100 TB with thousands of sources the same
# shape runs per source-bucket, or swaps the exact set for the
# parity minhash signature (dedup/parity.py) — the estimator is then
# the oracle-able n_agree/H.
def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.minhash import shingles

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # sh feeds both the size rollup and the per-shingle source sets —
    # checkpoint so the corpus shingling + distinct shuffle runs once
    # (setsim discipline; the relation is distinct-shingle-sized).
    sh = (
        docs.select("source", F.explode(shingles("text", k=3)).alias("sh"))
        .distinct()
        .localCheckpoint()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    srcsets = (
        sh.groupBy("sh")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") > 1)
    )
    pairs = srcsets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ss",
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ss"), i + 2, F.size("ss")
                        ),
                        lambda y: F.struct(
                            x.alias("source_a"), y.alias("source_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b")
    inter = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_inter")
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_a"),
                    F.col("n_sh").alias("na"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"),
                    F.col("n_sh").alias("nb"),
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            (
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_OVERLAP_JACCARD_SQL = """
WITH sh AS (
    SELECT DISTINCT source, s AS sh
    FROM (
        SELECT source, UNNEST(
            CASE WHEN LEN(arr) < 3 THEN [array_to_string(arr, ' ')]
                 ELSE list_distinct(list_transform(
                        generate_series(1, LEN(arr) - 2),
                        i -> array_to_string(list_slice(arr, i, i + 2), ' ')))
            END) AS s
        FROM (SELECT source,
                     regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
              FROM documents)
        WHERE LEN(arr) > 0
    )
), sizes AS (
    SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source
), inter AS (
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_inter
    FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
    GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b, i.n_inter,
       sa.n_sh + sb.n_sh - i.n_inter AS n_union,
       CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter)
           AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# SOURCE TOKEN DIVERGENCE — exact total-variation distance per source pair
# ---------------------------------------------------------------------------
# Drift/mixture analytics companion of source_overlap_jaccard: TV
# distance between per-source unigram distributions,
# TV(a,b) = ½ Σ_t |c_a(t)/N_a − c_b(t)/N_b|. Computed EXACTLY in
# integers via cross-multiplication — Σ|c_a·N_b − c_b·N_a| — split as
# (tokens in both) + (mass exclusive to each side), where the
# exclusive mass needs NO per-token pass: Σ_{t∈a only} c_a = N_a − S_a,
# S_a = Σ_{t∈both} c_a. So only tokens appearing in ≥2 sources expand
# into pairs (sorted source-count structs per token, fan-out ≤
# C(s_t,2) with s_t = #sources containing t — bounded by the source
# count, a corpus constant, never doc-count-sized). One count shuffle,
# one token-group shuffle, broadcast size joins, pair-sized output.
# At thousands of sources, run per source-bucket. Float discipline:
# all sums are BIGINT (|c·N| ≤ N_a·N_b < 2^52 at any per-bucket scale
# we shard to); the single double division is the identical IEEE op
# in both engines.
def source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = docs.select("source", F.explode(TXT.tokens("text")).alias("t"))
    # cnt feeds three consumers (srcsets + both broadcast size legs);
    # checkpoint once (setsim discipline) so the corpus tokenization +
    # count shuffle runs once, not three times. The checkpointed
    # relation is vocab x sources-sized — the operator's working set,
    # not the corpus.
    cnt = (
        tok.groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    sizes = cnt.groupBy("source").agg(F.sum("c").alias("n_tok")).localCheckpoint()
    srcsets = (
        cnt.groupBy("t")
        .agg(F.sort_array(F.collect_list(F.struct("source", "c"))).alias("ss"))
        .filter(F.size("ss") > 1)
    )
    pairs = srcsets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ss",
                    lambda x, i: F.transform(
                        F.slice(F.col("ss"), i + 2, F.size("ss")),
                        lambda y: F.struct(
                            x["source"].alias("source_a"),
                            x["c"].alias("c_a"),
                            y["source"].alias("source_b"),
                            y["c"].alias("c_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.source_a", "p.c_a", "p.source_b", "p.c_b")
    sized = pairs.join(
        F.broadcast(
            sizes.select(F.col("source").alias("source_a"), F.col("n_tok").alias("na"))
        ),
        "source_a",
    ).join(
        F.broadcast(
            sizes.select(F.col("source").alias("source_b"), F.col("n_tok").alias("nb"))
        ),
        "source_b",
    )
    both = sized.groupBy("source_a", "source_b", "na", "nb").agg(
        F.sum(F.abs(F.col("c_a") * F.col("nb") - F.col("c_b") * F.col("na"))).alias(
            "num_both"
        ),
        F.sum("c_a").alias("s_a"),
        F.sum("c_b").alias("s_b"),
    )
    num = (
        F.col("num_both")
        + (F.col("na") - F.col("s_a")) * F.col("nb")
        + (F.col("nb") - F.col("s_b")) * F.col("na")
    )
    return (
        both.select(
            "source_a",
            "source_b",
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            (num / (F.lit(2.0) * F.col("na") * F.col("nb"))).alias("tv_distance"),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_TOKEN_DIVERGENCE_SQL = """
WITH tok AS (
    SELECT source, t
    FROM (SELECT source,
                 regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
          FROM documents), unnest(arr) AS u(t)
), cnt AS (
    SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t
), sizes AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n_tok FROM cnt GROUP BY source
), shared AS (
    SELECT a.source AS source_a, b.source AS source_b,
           sa.n_tok AS na, sb.n_tok AS nb,
           CAST(SUM(ABS(a.c * sb.n_tok - b.c * sa.n_tok)) AS BIGINT)
               AS num_both,
           CAST(SUM(a.c) AS BIGINT) AS s_a,
           CAST(SUM(b.c) AS BIGINT) AS s_b
    FROM cnt a
    JOIN cnt b ON a.t = b.t AND a.source < b.source
    JOIN sizes sa ON sa.source = a.source
    JOIN sizes sb ON sb.source = b.source
    GROUP BY 1, 2, 3, 4
)
SELECT source_a, source_b, na AS n_a, nb AS n_b,
       CAST(num_both + (na - s_a) * nb + (nb - s_b) * na AS DOUBLE)
           / (2.0 * na * nb) AS tv_distance
FROM shared
ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# GOPHER QUALITY FILTER — the published rule set as exact keep/drop flags
# ---------------------------------------------------------------------------
# The Gopher curation rules (Rae et al. 2021 §A1.1, the same family
# MassiveText/RefinedWeb/Dolma apply): word-count bounds, mean word
# length band, symbol-to-word ratio, bullet/ellipsis line ratios,
# minimum stopword evidence. quality_signals reports SIGNALS; this
# operator makes the DECISIONS — one boolean per rule plus the
# composite keep — so a pipeline can both filter and audit which rule
# fired. Every ratio test is an integer cross-multiplication (mean
# word length 3..10 → 3·n ≤ letters ≤ 10·n, symbol ratio ≤ 0.1 →
# 10·symbols ≤ n), so both engines decide identically with zero float
# ops. Single projection pass over the scan — no shuffle except the
# result sort.
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_flags(
    docs: DataFrame, stopwords: tuple[str, ...] = _GOPHER_STOPWORDS
) -> DataFrame:
    """Per-doc Gopher rule flags + composite keep (shared by the
    filter query and the curation funnel). ``stopwords`` defaults to
    Gopher's published list; corpus_stopwords() derives a data-driven
    head for corpora whose vocabulary does not overlap it."""
    toks = TXT.tokens("text")
    lines = F.split("text", "\n")
    n_words = F.size(toks).cast("long")
    n_letters = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nh = (F.length("text") - F.length(F.replace("text", F.lit("#"), F.lit("")))).cast(
        "long"
    )
    ne = F.floor(
        (F.length("text") - F.length(F.replace("text", F.lit("..."), F.lit("")))) / 3
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.startswith(F.ltrim(l), F.lit("-"))
            | F.startswith(F.ltrim(l), F.lit("*")),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda l: F.endswith(F.rtrim(l), F.lit("...")))
    ).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in stopwords]),
        )
    ).cast("long")
    r_word_count = (n_words >= 50) & (n_words <= 100000)
    r_mean_word_len = (n_words > 0) & (
        (F.lit(3) * n_words <= n_letters) & (n_letters <= F.lit(10) * n_words)
    )
    r_symbol_ratio = (n_words > 0) & (F.lit(10) * (nh + ne) <= n_words)
    r_bullet = F.lit(10) * n_bullet <= F.lit(9) * n_lines
    r_ellipsis = F.lit(10) * n_ellipsis <= F.lit(3) * n_lines
    r_stopwords = n_stop >= 2
    keep = (
        r_word_count
        & r_mean_word_len
        & r_symbol_ratio
        & r_bullet
        & r_ellipsis
        & r_stopwords
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        r_word_count.alias("r_word_count"),
        r_mean_word_len.alias("r_mean_word_len"),
        r_symbol_ratio.alias("r_symbol_ratio"),
        r_bullet.alias("r_bullet"),
        r_ellipsis.alias("r_ellipsis"),
        r_stopwords.alias("r_stopwords"),
        keep.alias("keep"),
    )


def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return _gopher_flags(docs).orderBy("doc_id")


# rule predicates over the measure CTE `m` — single source of truth
# for the filter query's SELECT and the curation funnel's keep gate
_GOPHER_RULES_SQL = {
    "r_word_count": "(n_words >= 50 AND n_words <= 100000)",
    "r_mean_word_len": "(n_words > 0 AND 3 * n_words <= n_letters"
                       " AND n_letters <= 10 * n_words)",
    "r_symbol_ratio": "(n_words > 0 AND 10 * (nh + ne) <= n_words)",
    "r_bullet": "(10 * n_bullet <= 9 * n_lines)",
    "r_ellipsis": "(10 * n_ellipsis <= 3 * n_lines)",
    "r_stopwords": "(n_stop >= 2)",
}
_GOPHER_KEEP_SQL = " AND ".join(_GOPHER_RULES_SQL.values())


def _gopher_sql_ctes(doc_filter: str = "") -> str:
    """CTE body (no WITH, no final SELECT) ending in
    ``m(doc_id, n_words, n_letters, nh, ne, n_lines, n_bullet,
    n_ellipsis, n_stop)`` — composable by the filter oracle and the
    curation-funnel oracle (which adds a WHERE on the doc universe)."""
    return f"""gbase AS (
    SELECT doc_id, text,
           regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS toks,
           string_split(text, chr(10)) AS lines
    FROM documents {doc_filter}
), m AS (
    SELECT doc_id,
           CAST(LEN(toks) AS BIGINT) AS n_words,
           CAST(COALESCE(list_sum(list_transform(toks, t -> LEN(t))), 0)
                AS BIGINT) AS n_letters,
           CAST(LEN(text) - LEN(REPLACE(text, '#', '')) AS BIGINT) AS nh,
           CAST((LEN(text) - LEN(REPLACE(text, '...', ''))) // 3
                AS BIGINT) AS ne,
           CAST(LEN(lines) AS BIGINT) AS n_lines,
           CAST(LEN(list_filter(lines, l ->
                starts_with(LTRIM(l), '-') OR starts_with(LTRIM(l), '*')))
                AS BIGINT) AS n_bullet,
           CAST(LEN(list_filter(lines, l -> ends_with(RTRIM(l), '...')))
                AS BIGINT) AS n_ellipsis,
           CAST(LEN(list_intersect(list_distinct(toks),
                {list(_GOPHER_STOPWORDS)})) AS BIGINT) AS n_stop
    FROM gbase
)"""


GOPHER_QUALITY_FILTER_SQL = f"""
WITH {_gopher_sql_ctes()}
SELECT doc_id, n_words, n_lines,
       {_GOPHER_RULES_SQL["r_word_count"]} AS r_word_count,
       {_GOPHER_RULES_SQL["r_mean_word_len"]} AS r_mean_word_len,
       {_GOPHER_RULES_SQL["r_symbol_ratio"]} AS r_symbol_ratio,
       {_GOPHER_RULES_SQL["r_bullet"]} AS r_bullet,
       {_GOPHER_RULES_SQL["r_ellipsis"]} AS r_ellipsis,
       {_GOPHER_RULES_SQL["r_stopwords"]} AS r_stopwords,
       ({_GOPHER_KEEP_SQL}) AS keep
FROM m
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# GOPHER REPETITION — top-n-gram char mass and dup-n-gram char coverage
# ---------------------------------------------------------------------------
# The other half of the Gopher curation table (Rae et al. 2021,
# Table A1): the quality rules above catch degenerate *form*; the
# repetition rules catch degenerate *content*. Two signals per
# document, both defined over the char mass of word n-grams (char mass
# of one gram occurrence = sum of its token lengths = length of the
# space-joined gram minus n-1 separators; total = sum of all token
# lengths — separator-free, so every quantity is an exact integer):
#
#   * top-n-gram char fraction (n = 2, 3, 4): char mass of the single
#     most frequent n-gram (count x gram chars) over total chars;
#     keep thresholds 20 / 18 / 16 %. Ties resolve to the
#     lexicographically smallest gram in BOTH engines (sorted-run scan
#     here; ORDER BY cnt DESC, g ASC in the oracle).
#   * duplicated-n-gram char coverage (n = 5..10): char mass of token
#     positions covered by ANY n-gram occurring >= 2x within the
#     document — overlapping occurrences counted once (interval
#     union); keep thresholds 15 / 14 / 13 / 12 / 11 / 10 %.
#
# Shape at scale: both are single projections with no shuffle except
# the presentation sort — the whole per-document computation is
# higher-order-function array code (sort +
# run-length for the mode; sort-by-(gram,pos) + sorted-neighbor
# equality + constant-width sliding OR for coverage), O(L log L) per
# document with no explode and no groupBy, n <= 10 a constant. The
# keep decisions are integer cross-multiplications
# (100*mass <= thr*total), so both engines decide identically with
# zero float ops; the reported fraction is one division of two exact
# BIGINTs (bit-identical doubles).
_TOPGRAM_THRESHOLDS: tuple[tuple[int, int], ...] = ((2, 20), (3, 18), (4, 16))
_DUPGRAM_THRESHOLDS: tuple[tuple[int, int], ...] = (
    (5, 15), (6, 14), (7, 13), (8, 12), (9, 11), (10, 10),
)


def _ngram_array(toks: Column, n: int) -> Column:
    """Non-distinct space-joined n-grams from a BOUND token array
    (unlike _grams, which tokenizes from text itself — here one token
    array feeds all 3 (or 6) n values)."""
    size = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(size - (n - 1), F.lit(1)))
    g = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(size >= n, g).otherwise(F.array().cast("array<string>"))


def _token_chars(toks: Column) -> Column:
    """Total char mass: sum of token lengths (no separators)."""
    return F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )


def _mode_run(sorted_grams: Column) -> Column:
    """struct(best, best_run): most frequent element of a SORTED array
    (ties -> lexicographically smallest, because runs arrive in sorted
    order and only a STRICTLY longer run displaces the best), one
    aggregate pass over run lengths. Empty array -> ('', 0)."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit("").alias("best"),
        F.lit(0).cast("long").alias("best_run"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("long")).otherwise(
            F.lit(1).cast("long")
        )
        better = run > acc["best_run"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, x).otherwise(acc["best"]).alias("best"),
            F.when(better, run).otherwise(acc["best_run"]).alias("best_run"),
        )

    return F.aggregate(
        sorted_grams,
        init,
        step,
        lambda acc: F.struct(
            acc["best"].alias("best"), acc["best_run"].alias("best_run")
        ),
    )


def _topgram_row(toks: Column, total: Column, n: int, thr: int) -> Column:
    def build(t: Column) -> Column:
        gram_chars = (F.length(t["best"]) - F.lit(n - 1)).cast("long")
        mass = F.when(t["best_run"] > 0, t["best_run"] * gram_chars).otherwise(
            F.lit(0).cast("long")
        )

        def row(m: Column) -> Column:
            frac = F.when(
                total > 0, m.cast("double") / total.cast("double")
            ).otherwise(F.lit(0.0))
            return F.struct(
                F.lit(n).cast("int").alias("n"),
                t["best"].alias("top_gram"),
                t["best_run"].alias("top_count"),
                m.alias("top_chars"),
                total.alias("total_chars"),
                frac.alias("top_gram_char_frac"),
                (F.lit(100).cast("long") * m <= F.lit(thr).cast("long") * total).alias(
                    "keep"
                ),
            )

        return bind_once(mass, row)

    return bind_once(_mode_run(F.array_sort(_ngram_array(toks, n))), build)


def gopher_topgram_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))

    def build(toks: Column) -> Column:
        return bind_once(
            _token_chars(toks),
            lambda total: F.array(
                *[_topgram_row(toks, total, n, thr) for n, thr in _TOPGRAM_THRESHOLDS]
            ),
        )

    # checkpoint-before-sort: see gopher_dupgram_coverage — the range
    # sampler would otherwise evaluate the HOF compute a second time
    return (
        docs.select("doc_id", F.inline(bind_once(TXT.tokens("text"), build)))
        .localCheckpoint()
        .orderBy("doc_id", "n")
    )


def _dup_start_flags(grams: Column) -> Column:
    """array<boolean>: flag[i] = the n-gram starting at 1-based token
    position i occurs >= 2x in this document. Sort (gram, pos) pairs,
    mark sorted neighbors with equal grams, scatter back to position
    order via a second sort — O(m log m) per doc, no explode. F.get is
    0-based and returns NULL out of bounds, so the run edges compare
    via eqNullSafe (gram strings are never null -> edge compares are
    false, not null)."""

    def build(g: Column) -> Column:
        m = F.size(g)
        idx = F.sequence(F.lit(1), F.greatest(m, F.lit(1)))
        pairs = F.array_sort(
            F.transform(idx, lambda i: F.struct(F.get(g, i - 1).alias("g"), i.alias("p")))
        )

        def mark(s: Column) -> Column:
            return F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(s), F.lit(1))),
                lambda j: F.struct(
                    F.get(s, j - 1)["p"].alias("p"),
                    (
                        F.get(s, j - 1)["g"].eqNullSafe(F.get(s, j - 2)["g"])
                        | F.get(s, j - 1)["g"].eqNullSafe(F.get(s, j)["g"])
                    ).alias("f"),
                ),
            )

        flags = F.transform(F.array_sort(bind_once(pairs, mark)), lambda x: x["f"])
        return F.when(m >= 1, flags).otherwise(F.array().cast("array<boolean>"))

    return bind_once(grams, build)


def _dupcov_row(toks: Column, total: Column, n: int, thr: int) -> Column:
    def build(flags: Column) -> Column:
        m = F.size(flags)  # = L - n + 1 when L >= n, else 0
        length = F.size(toks)

        def cov(p: Column) -> Column:
            # token position p is covered iff some dup gram starts in
            # [p-n+1, p] (clamped to [1, m]) — a width-<=n slice, so the
            # whole coverage pass is O(n*L) with n a constant.
            start = F.greatest(p - F.lit(n - 1), F.lit(1))
            width = F.least(p, m) - start + F.lit(1)
            return F.exists(F.slice(flags, start, width), lambda x: x)

        covered_expr = F.when(
            m >= 1,
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(length, F.lit(1))),
                    lambda p: F.when(
                        cov(p), F.length(F.get(toks, p - 1)).cast("long")
                    ).otherwise(F.lit(0).cast("long")),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        ).otherwise(F.lit(0).cast("long"))

        def row(covered: Column) -> Column:
            frac = F.when(
                total > 0, covered.cast("double") / total.cast("double")
            ).otherwise(F.lit(0.0))
            return F.struct(
                F.lit(n).cast("int").alias("n"),
                covered.alias("covered_chars"),
                total.alias("total_chars"),
                frac.alias("dup_char_frac"),
                (
                    F.lit(100).cast("long") * covered
                    <= F.lit(thr).cast("long") * total
                ).alias("keep"),
            )

        return bind_once(covered_expr, row)

    return bind_once(_dup_start_flags(_ngram_array(toks, n)), build)


def gopher_dupgram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))

    def build(toks: Column) -> Column:
        return bind_once(
            _token_chars(toks),
            lambda total: F.array(
                *[_dupcov_row(toks, total, n, thr) for n, thr in _DUPGRAM_THRESHOLDS]
            ),
        )

    # localCheckpoint before the presentation sort (round-14
    # optimization): a global orderBy range-partitions, and the range
    # sampler EVALUATES the child once before the sort pass evaluates
    # it again — the stage profile showed two back-to-back stages each
    # paying the full interpreted dup-gram HOF computation (~1.2 s each
    # at sf0.1). The checkpointed relation is the OUTPUT rows (6 scalar
    # rows per doc — a few bytes per doc at any corpus size), so the
    # compute runs once and both sampler and sort read cached scalars.
    return (
        docs.select("doc_id", F.inline(bind_once(TXT.tokens("text"), build)))
        .localCheckpoint()
        .orderBy("doc_id", "n")
    )


_REP_BASE_SQL = """base AS (
    SELECT doc_id, regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
    FROM documents
), tot AS (
    SELECT doc_id, CAST(COALESCE(list_sum(list_transform(arr, t -> LEN(t))), 0)
                        AS BIGINT) AS total_chars
    FROM base
)"""


GOPHER_TOPGRAM_FRAC_SQL = f"""
WITH {_REP_BASE_SQL},
ns (n, thr) AS (VALUES (2, 20), (3, 18), (4, 16)),
grams AS (
    SELECT doc_id, ns.n,
           array_to_string(list_slice(arr, i, i + ns.n - 1), ' ') AS g
    FROM base, ns, UNNEST(generate_series(1, LEN(arr) - ns.n + 1)) AS t(i)
    WHERE LEN(arr) >= ns.n
), gc AS (
    SELECT doc_id, n, g, COUNT(*) AS cnt FROM grams GROUP BY doc_id, n, g
), top AS (
    SELECT doc_id, n, g, cnt,
           ROW_NUMBER() OVER (PARTITION BY doc_id, n
                              ORDER BY cnt DESC, g ASC) AS rn
    FROM gc
)
SELECT b.doc_id,
       CAST(ns.n AS INTEGER) AS n,
       COALESCE(t.g, '') AS top_gram,
       CAST(COALESCE(t.cnt, 0) AS BIGINT) AS top_count,
       CAST(COALESCE(t.cnt * (LEN(t.g) - (ns.n - 1)), 0) AS BIGINT) AS top_chars,
       tot.total_chars,
       CASE WHEN tot.total_chars > 0
            THEN CAST(COALESCE(t.cnt * (LEN(t.g) - (ns.n - 1)), 0) AS DOUBLE)
                 / CAST(tot.total_chars AS DOUBLE)
            ELSE 0.0 END AS top_gram_char_frac,
       100 * COALESCE(t.cnt * (LEN(t.g) - (ns.n - 1)), 0)
           <= ns.thr * tot.total_chars AS keep
FROM base b
CROSS JOIN ns
JOIN tot ON tot.doc_id = b.doc_id
LEFT JOIN top t ON t.doc_id = b.doc_id AND t.n = ns.n AND t.rn = 1
ORDER BY b.doc_id, ns.n
"""


GOPHER_DUPGRAM_COVERAGE_SQL = f"""
WITH {_REP_BASE_SQL},
ns (n, thr) AS (VALUES (5, 15), (6, 14), (7, 13), (8, 12), (9, 11), (10, 10)),
grams AS (
    SELECT doc_id, ns.n, i,
           array_to_string(list_slice(arr, i, i + ns.n - 1), ' ') AS g
    FROM base, ns, UNNEST(generate_series(1, LEN(arr) - ns.n + 1)) AS t(i)
    WHERE LEN(arr) >= ns.n
), dupstart AS (
    SELECT doc_id, n, i FROM (
        SELECT doc_id, n, i, COUNT(*) OVER (PARTITION BY doc_id, n, g) AS c
        FROM grams
    ) WHERE c >= 2
), pos AS (
    SELECT doc_id, p, CAST(LEN(arr[p]) AS BIGINT) AS wlen
    FROM base, UNNEST(generate_series(1, LEN(arr))) AS t(p)
), cov AS (
    SELECT DISTINCT pos.doc_id, d.n, pos.p, pos.wlen
    FROM pos JOIN dupstart d
      ON d.doc_id = pos.doc_id AND d.i BETWEEN pos.p - d.n + 1 AND pos.p
), covagg AS (
    SELECT doc_id, n, SUM(wlen) AS covered FROM cov GROUP BY doc_id, n
)
SELECT b.doc_id,
       CAST(ns.n AS INTEGER) AS n,
       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_chars,
       tot.total_chars,
       CASE WHEN tot.total_chars > 0
            THEN CAST(COALESCE(c.covered, 0) AS DOUBLE)
                 / CAST(tot.total_chars AS DOUBLE)
            ELSE 0.0 END AS dup_char_frac,
       100 * COALESCE(c.covered, 0) <= ns.thr * tot.total_chars AS keep
FROM base b
CROSS JOIN ns
JOIN tot ON tot.doc_id = b.doc_id
LEFT JOIN covagg c ON c.doc_id = b.doc_id AND c.n = ns.n
ORDER BY b.doc_id, ns.n
"""


# ---------------------------------------------------------------------------
# CURATION FUNNEL — per-source survival through quality → dedup → decon
# ---------------------------------------------------------------------------
# The dashboard every curation run produces: how many documents (and
# how many tokens) each source contributes after each sequential
# stage — Gopher quality gate, exact dedup among the survivors
# (canonical = min doc_id per distinct text WITHIN the
# quality-passing set, matching a real pipeline's stage order), and
# eval-set decontamination (the same k-gram/eval-split contract as
# `decontaminate`). All stage decisions are exact (integer rules,
# sha-equality, gram joins), so the funnel is bit-reproducible and
# fully oracled. Plan: the gopher flags ride the scan; dedup is one
# 32-byte-key window over quality docs only; the eval gram set is
# broadcast; one final per-source rollup.
def corpus_stopwords(docs: DataFrame, k: int = 8) -> tuple[str, ...]:
    """Corpus-derived stopword head (the vocab_topk derivation): the k
    tokens appearing in the most documents, ties broken by token.
    Bounded k-row collect — model state, like the k-means centroids.
    The published Gopher list stays the default everywhere; this
    parameterization lets the quality gate run NON-DEGENERATELY on
    corpora whose vocabulary does not overlap the published list (the
    synthetic driver corpus, or a non-English crawl) — the raw-data
    mode of operators/curation.run_curation."""
    rows = (
        docs.select(
            F.explode(F.array_distinct(TXT.tokens("text"))).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("t"))
        .limit(k)
        .collect()
    )
    return tuple(r["t"] for r in rows)


def curation_funnel_frame(
    docs: DataFrame, stopwords: tuple[str, ...] | None = None
) -> DataFrame:
    """The funnel over an arbitrary (doc_id, source, text) frame —
    shared by the registry query and the materialized-run parity test
    (tests/test_sinks.py), which feeds both this and
    operators/curation.run_curation the same enriched frame. NOTE:
    the driver's synthetic corpus contains none of Gopher's stopword
    list beyond 'the', so on raw testdata the published stopword rule
    (>= 2 distinct) zeroes every downstream stage — faithfully
    reported, and the reason the composition evidence runs on a
    stopword-enriched frame. Because agreement on all-zero counts
    certifies nothing (the round-9 degeneracy lesson), the funnel also
    reports PRE-GATE stage measurements that are non-trivial on any
    corpus: tokens entering the funnel, the MARGINAL unique-text count
    (dedup canonical over all entering docs, independent of the
    quality gate) and the MARGINAL decon-clean count — so the driver's
    hash gate certifies real dedup/decon numbers even when the
    sequential tail is legitimately zero."""
    from pyspark.sql.window import Window

    train = docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
    flags = _gopher_flags(
        train, stopwords=stopwords or _GOPHER_STOPWORDS
    ).select("doc_id", "keep")
    base = train.select("doc_id", "source", "text").join(flags, "doc_id")
    # ONE window pass over sha256(text) yields BOTH canonical flags —
    # marginal (first doc per text) and sequential (first QUALITY doc
    # per text, as a running keep-count): no per-flag window + join
    # back, so adding the marginal column costs zero extra shuffles.
    wq = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    wq_cum = wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = base.withColumn(
        "is_canon_all", F.row_number().over(wq) == 1
    ).withColumn(
        "is_canon",
        F.col("keep")
        & (F.sum(F.col("keep").cast("long")).over(wq_cum) == 1),
    )
    grams_all = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_grams("text", _DECON_K))).alias("gram"),
    )
    eval_grams = (
        grams_all.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("gram")
        .distinct()
    )
    leaky = (
        grams_all.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .join(F.broadcast(eval_grams), "gram")
        .select("doc_id", F.lit(True).alias("is_leaky"))
        .distinct()
    )
    q = F.col("keep")
    d = q & F.col("is_canon")
    c = d & ~F.coalesce("is_leaky", F.lit(False))
    uniq = F.col("is_canon_all")
    nonleaky = ~F.coalesce("is_leaky", F.lit(False))
    return (
        base.join(leaky, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TXT.token_count("text").cast("long")).alias("tokens_in"),
            F.sum(uniq.cast("long")).alias("n_unique_marginal"),
            F.sum(nonleaky.cast("long")).alias("n_decon_clean_marginal"),
            F.sum(q.cast("long")).alias("n_quality"),
            F.sum(d.cast("long")).alias("n_dedup"),
            F.sum(c.cast("long")).alias("n_clean"),
            F.sum(
                F.when(c, TXT.token_count("text")).otherwise(0).cast("long")
            ).alias("tokens_clean"),
        )
        .orderBy("source")
    )


def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_funnel_frame(
        ensure_parallelism(load_table(spark, sf_dir, "documents"))
    )


# ---------------------------------------------------------------------------
# DATASET CARD — the per-source summary table a released dataset ships
# with: volume (docs, tokens, mean chars), language share, quality
# keep rate (the Gopher gate, measured marginally on the raw corpus —
# the funnel above measures the SEQUENTIAL survival instead), and
# exact-duplicate rate (row_number > 1 over sha256(text), global).
# Every rate divides two exact integers, so the card is bit-exact.
# Plan: gopher flags ride the scan, one 32-byte sha window, one
# source rollup.
# ---------------------------------------------------------------------------
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    flags = _gopher_flags(docs).select("doc_id", F.col("n_words").alias("n_toks"), "keep")
    wd = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    per = (
        docs.select("doc_id", "source", "lang", "n_chars", "text")
        .withColumn("rn", F.row_number().over(wd))
        .join(flags, "doc_id")
    )
    n = F.count(F.lit(1))
    return (
        per.groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            (F.sum("n_chars").cast("double") / n).alias("avg_chars"),
            (
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
                / n
            ).alias("en_share"),
            (F.sum(F.col("keep").cast("int")).cast("double") / n).alias(
                "quality_keep_rate"
            ),
            (
                F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("double") / n
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


PIPELINE_DATASET_CARD_SQL = f"""
WITH {_gopher_sql_ctes()},
ranked AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY sha256(text)
                              ORDER BY doc_id) AS rn
    FROM documents
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(m.n_words) AS BIGINT) AS n_tokens,
       CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(SUM(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS en_share,
       CAST(SUM(CASE WHEN {_GOPHER_KEEP_SQL} THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS quality_keep_rate,
       CAST(SUM(CASE WHEN r.rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS dup_rate
FROM documents d
JOIN m ON m.doc_id = d.doc_id
JOIN ranked r ON r.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""


PIPELINE_CURATION_FUNNEL_SQL = f"""
WITH {_gopher_sql_ctes(f"WHERE doc_id % {_EVAL_MOD} <> 0")},
q AS (
    SELECT doc_id FROM m WHERE {_GOPHER_KEEP_SQL}
), flagged AS (
    -- one window pass: marginal canonical (rn_all) and sequential
    -- canonical (running keep-count), mirroring the Spark window
    SELECT doc_id, source, text, q,
           ROW_NUMBER() OVER (PARTITION BY sha256(text)
                              ORDER BY doc_id) AS rn_all,
           SUM(CASE WHEN q THEN 1 ELSE 0 END) OVER (
               PARTITION BY sha256(text) ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_q
    FROM (SELECT d.doc_id, d.source, d.text,
                 (d.doc_id IN (SELECT doc_id FROM q)) AS q
          FROM documents d
          WHERE d.doc_id % {_EVAL_MOD} <> 0)
), grams AS (
    SELECT DISTINCT doc_id,
           array_to_string(list_slice(arr, i, i + {_DECON_K - 1}), ' ') AS gram
    FROM (SELECT doc_id,
                 regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
          FROM documents),
         UNNEST(generate_series(1, LEN(arr) - {_DECON_K - 1})) AS t(i)
), ev AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id % {_EVAL_MOD} = 0
), leaky AS (
    SELECT DISTINCT g.doc_id
    FROM grams g JOIN ev USING (gram)
    WHERE g.doc_id % {_EVAL_MOD} <> 0
), staged AS (
    SELECT f.source, f.text, f.q,
           (f.q AND f.cum_q = 1) AS dd,
           (f.q AND f.cum_q = 1
            AND f.doc_id NOT IN (SELECT doc_id FROM leaky)) AS c,
           (f.rn_all = 1) AS uniq,
           (f.doc_id NOT IN (SELECT doc_id FROM leaky)) AS nonleaky
    FROM flagged f
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')))
            AS BIGINT) AS tokens_in,
       CAST(SUM(CASE WHEN uniq THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unique_marginal,
       CAST(SUM(CASE WHEN nonleaky THEN 1 ELSE 0 END) AS BIGINT)
           AS n_decon_clean_marginal,
       CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN dd THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
       CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(SUM(CASE WHEN c
                THEN LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+'))
                ELSE 0 END) AS BIGINT) AS tokens_clean
FROM staged
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# CORPUS SHUFFLE SHARDS — deterministic global shuffle into training shards
# ---------------------------------------------------------------------------
# The step between curation and tokenization: a 100 TB corpus must be
# globally shuffled (so each training shard is an unbiased sample) and
# written as N shard files with stable ordering and token offsets.
# rand() is wrong at this layer — re-runs and retried tasks must agree
# — so the shuffle key is a salted md5 of the doc id: shard = first
# hex byte mod N (uniform), order within shard = full digest. One hash
# exchange on the shard key; the per-shard window is exactly the
# sortWithinPartitions a shard writer performs anyway, and the running
# token offset gives each doc its position in the tokenized stream
# (what an index/manifest records). Skew-free by md5 uniformity: E[docs
# per shard] = n/N with binomial concentration.
_N_SHARDS = 16


def shard_assignments(docs: DataFrame) -> DataFrame:
    """The shard kernel over any (doc_id, text) frame — shared by the
    registry query below and the materialized curation run
    (operators/curation.py): salted-md5 shuffle key, hex-byte shard
    bucket, per-shard window positions + running token offsets."""
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    keyed = docs.select(
        "doc_id",
        TXT.token_count("text").cast("long").alias("n_tokens"),
        key.alias("k"),
        (
            F.conv(F.substring(key, 1, 2), 16, 10).cast("int") % _N_SHARDS
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return (
        keyed.select(
            "doc_id",
            "shard",
            F.row_number().over(w).alias("pos"),
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("token_offset"),
            "n_tokens",
        )
        .orderBy("shard", "pos")
    )


def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_assignments(
        ensure_parallelism(load_table(spark, sf_dir, "documents"))
    )


CORPUS_SHUFFLE_SHARDS_SQL = f"""
WITH keyed AS (
    SELECT doc_id,
           LEN(regexp_extract_all(LOWER(text), '[a-zA-Z]+')) AS n_tokens,
           MD5('shuf:' || CAST(doc_id AS VARCHAR)) AS k,
           CAST(('0x' || SUBSTR(MD5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 2))
                    ::BIGINT % {_N_SHARDS} AS INTEGER) AS shard
    FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS pos,
       CAST(COALESCE(SUM(n_tokens) OVER
                (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS token_offset,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM keyed
WINDOW w AS (PARTITION BY shard ORDER BY k, doc_id)
ORDER BY shard, pos
"""


# ---------------------------------------------------------------------------
# NOVELTY SCORE — per-document first-occurrence gram fraction
# ---------------------------------------------------------------------------
# Data-curation signal: how much of a document's content is NEW to the
# corpus (first occurrence by minimum doc_id) vs already contributed by
# earlier documents — the per-doc complement of span dedup, used to
# rank crawl snapshots and prioritize ingestion. Distinct 3-grams per
# doc; first owner via one MIN window keyed on the gram (one hash
# shuffle — grams never leave their partition again), then a per-doc
# rollup. No joins, no all-pairs; both shuffles are key-partitioned
# and map-side combinable at the rollup.
def novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    g = docs.select(
        "doc_id", F.explode(F.array_distinct(_grams("text", 3))).alias("g")
    )
    owned = g.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("g")))
        .cast("long")
        .alias("novel"),
    )
    return (
        owned.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("novel").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (F.col("n_novel") / F.col("n_grams")).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# The decay curve over ingest order: average first-occurrence fraction
# per doc_id-range decile — the "diminishing returns of more crawl
# data" report (novelty of decile 10 vs decile 1 tells you whether the
# next crawl is worth tokenizing). Deciles are doc_id-RANGE buckets
# (ingest-order proxy), not NTILE — a count-balanced NTILE needs a
# global sort window, the textbook scale anti-pattern; range buckets
# need only the min/max scalar (broadcast). The per-decile novelty is
# Σ n_novel / Σ n_grams — one exact integer pair, one double division.
def novelty_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    nov = novelty_score(spark, sf_dir)
    lo, hi = nov.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = hi - lo + 1
    # FLOOR, not a bare int cast: DuckDB CAST(double AS INTEGER)
    # rounds while Spark truncates — floor agrees in both engines
    dec = F.least(
        F.lit(9).cast("long"),
        F.floor(F.lit(10) * (F.col("doc_id") - F.lit(lo)) / F.lit(span)),
    ) + 1
    return (
        nov.groupBy(dec.alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").alias("n_grams"),
            F.sum("n_novel").alias("n_novel"),
        )
        .select(
            "decile",
            "n_docs",
            "n_grams",
            "n_novel",
            (F.col("n_novel") / F.col("n_grams")).alias("novelty"),
        )
        .orderBy("decile")
    )


def _novelty_trend_sql() -> str:
    # shares novelty_score's derivation; bounds come from the same
    # scalar aggregate the Spark side broadcasts
    return """
WITH g AS (
    SELECT doc_id, g
    FROM (
        SELECT doc_id,
               CASE WHEN LEN(arr) >= 3 THEN list_distinct(list_transform(
                        generate_series(1, LEN(arr) - 2),
                        i -> array_to_string(list_slice(arr, i, i + 2), ' ')))
                    ELSE CAST([] AS VARCHAR[]) END AS gs
        FROM (SELECT doc_id,
                     regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
              FROM documents)
    ), unnest(gs) AS u(g)
), owned AS (
    SELECT doc_id,
           CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY g)
                THEN 1 ELSE 0 END AS novel
    FROM g
), per_doc AS (
    SELECT doc_id, COUNT(*) AS n_grams,
           CAST(SUM(novel) AS BIGINT) AS n_novel
    FROM owned GROUP BY doc_id
), bounds AS (
    SELECT MIN(doc_id) AS lo, MAX(doc_id) - MIN(doc_id) + 1 AS span
    FROM per_doc
)
SELECT LEAST(9, CAST(FLOOR(10 * (doc_id - lo) / span) AS BIGINT)) + 1 AS decile,
       COUNT(*) AS n_docs,
       CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       CAST(SUM(n_novel) AS DOUBLE) / SUM(n_grams) AS novelty
FROM per_doc, bounds
GROUP BY 1
ORDER BY decile
"""


NOVELTY_TREND_SQL = _novelty_trend_sql()


NOVELTY_SCORE_SQL = """
WITH g AS (
    SELECT doc_id, g
    FROM (
        SELECT doc_id,
               CASE WHEN LEN(arr) >= 3 THEN list_distinct(list_transform(
                        generate_series(1, LEN(arr) - 2),
                        i -> array_to_string(list_slice(arr, i, i + 2), ' ')))
                    ELSE CAST([] AS VARCHAR[]) END AS gs
        FROM (SELECT doc_id,
                     regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
              FROM documents)
    ), unnest(gs) AS u(g)
), owned AS (
    SELECT doc_id,
           CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY g)
                THEN 1 ELSE 0 END AS novel
    FROM g
)
SELECT doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(novel) AS BIGINT) AS n_novel,
       CAST(SUM(novel) AS DOUBLE) / COUNT(*) AS novelty
FROM owned
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# STRATIFIED SAMPLE — exact-count per-stratum deterministic sample
# ---------------------------------------------------------------------------
# Exactly n docs per source (df.sampleBy gives only *expected*
# fractions and is seed/partitioning-dependent): rank docs within each
# source by a content hash and keep the first n. The md5 sort key makes
# the pick pseudo-random but reproducible anywhere; one shuffle on
# source (the window), then a narrow filter.
_STRAT_N = 5


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRAT_N)
        .select("doc_id", "source", "rn")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, source,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn
FROM documents
QUALIFY rn <= {_STRAT_N}
"""


# ---------------------------------------------------------------------------
# DSIR IMPORTANCE RESAMPLING — target-distribution data selection
# ---------------------------------------------------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023): weight
# every raw document by how target-like its hashed-n-gram distribution
# is, then resample with probability proportional to the weight. This
# completes the curation toolbox — quality (gopher), dedup, decon and
# domain MIXING exist; importance WEIGHTING toward a target
# distribution did not. Target here = the corpus's English documents
# (the paper's "formal text" target, stated over the lang column);
# raw = the full pool.
#
# Exactness discipline: the per-feature log-ratio is
#   log2( (k_t(b)+1)/(N_t+B) / ((k_r(b)+1)/(N_r+B)) )
# computed with functions/intlog.ilog2_64 — an integer shift-and-
# square fixed-point log2 (1/64-bit resolution) that is bit-identical
# in Spark, DuckDB and python, so per-doc weights are ORDER-FREE
# integer sums (`ln` would differ in the last ulp between libms and
# break the hash gate; see the module docstring). The resampling
# decision is the same algebra: accept iff
#   weight >= ilog2_64(u) - 64*30,   u = md5-uniform in [1, 2^30]
# i.e. P(accept) = min(1, 2^(weight/64)) — a Bernoulli thinning with
# the exact importance weight, derandomized by a content-independent
# hash (the agg_bootstrap_ci trick), no float in the decision.
#
# Scale shape: one corpus fan-out pass (unigrams + bigrams, ~2L rows
# per doc); bucket counts collapse to B=256 rows via ONE map-side-
# combinable groupBy (target and raw counted in the same pass);
# the score table is 256 rows and BROADCASTS back onto the occurrence
# stream; the per-doc rollup is the only other corpus-keyed exchange.
# The baroque ilog2 expression runs on 256+n_docs rows, never on
# occurrences.
_DSIR_B = 256  # hashed feature buckets


def _hashed_feature_occ(docs: DataFrame, materialize: bool = True) -> DataFrame:
    """(doc_id, is_t, b) hashed unigram+bigram occurrence stream —
    shared by DSIR and the trained quality classifier. explode_outer
    keeps zero-feature docs as one (doc_id, b=null) row, so per-doc
    rollups cover EVERY doc with no second docs scan (count(b) skips
    the null). materialize=True localCheckpoints the stream for
    multi-consumer callers (DSIR reads it twice); checkpointed blocks
    are freed with the frame reference, unlike persist() whose
    CacheManager entry outlives the call (the round-9 ADVICE leak).
    Single-pass consumers pass materialize=False."""

    def _feats(toks: Column) -> Column:
        n = F.size(toks)
        bi = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
                lambda i: F.concat_ws(
                    " ", F.get(toks, i - 1), F.get(toks, i)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(toks, bi)

    occ = (
        docs.select(
            "doc_id",
            (F.col("lang") == "en").alias("is_t"),
            F.explode_outer(bind_once(TXT.tokens("text"), _feats)).alias("f"),
        )
        .select(
            "doc_id",
            "is_t",
            (
                F.conv(F.substring(F.md5("f"), 1, 7), 16, 10)
                .cast("long") % _DSIR_B
            ).alias("b"),
        )
    )
    return occ.localCheckpoint() if materialize else occ


def dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_frame(
        ensure_parallelism(load_table(spark, sf_dir, "documents"))
    )


def dsir_frame(docs: DataFrame) -> DataFrame:
    """DSIR over an arbitrary (doc_id, text, lang) frame — shared by
    the registry query and the materialized curation run's importance-
    mixing stage (parity-asserted in tests/test_sinks.py)."""
    from ..functions.intlog import spark_expr as _L

    occ = _hashed_feature_occ(docs)
    cnt = occ.filter(F.col("b").isNotNull()).groupBy("b").agg(
        F.count(F.lit(1)).alias("k_r"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("k_t"),
    )
    tot = cnt.agg(
        F.sum("k_r").alias("n_r"), F.sum("k_t").alias("n_t")
    )
    scores = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            (F.expr(_L("k_t + 1")) + F.expr(_L(f"n_r + {_DSIR_B}")))
            - (F.expr(_L("k_r + 1")) + F.expr(_L(f"n_t + {_DSIR_B}")))
        ).alias("s"),
    )
    u = (
        "(CAST(conv(substring(md5(concat('dsir#', "
        f"CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) "
        f"% {1 << 30} + 1)"
    )
    return (
        occ.join(F.broadcast(scores), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.count("b").alias("n_features"),
            F.coalesce(F.sum("s"), F.lit(0)).alias("weight_scaled"),
        )
        .select(
            "doc_id",
            "n_features",
            "weight_scaled",
            (F.expr(_L(u)) - F.lit(64 * 30)).alias("log_u_scaled"),
        )
        .withColumn(
            "accepted", F.col("weight_scaled") >= F.col("log_u_scaled")
        )
        .orderBy("doc_id")
    )


def _dsir_sql() -> str:
    from ..functions.intlog import duck_expr as _L

    return f"""
WITH arrs AS (
    SELECT doc_id, lang = 'en' AS is_t,
           regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
    FROM documents
), feats AS (
    SELECT doc_id, is_t, t AS f FROM arrs, unnest(arr) AS un(t)
    UNION ALL
    SELECT doc_id, is_t, arr[i] || ' ' || arr[i + 1] AS f
    FROM arrs, unnest(generate_series(1, LEN(arr) - 1)) AS s(i)
    WHERE LEN(arr) >= 2
), occ AS (
    SELECT doc_id, is_t,
           ('0x' || substr(md5(f), 1, 7))::BIGINT % {_DSIR_B} AS b
    FROM feats
), cnt AS (
    SELECT b, CAST(COUNT(*) AS BIGINT) AS k_r,
           CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS k_t
    FROM occ GROUP BY b
), tot AS (
    SELECT CAST(SUM(k_r) AS BIGINT) AS n_r,
           CAST(SUM(k_t) AS BIGINT) AS n_t
    FROM cnt
), scores AS (
    SELECT b,
           ({_L("k_t + 1")} + {_L(f"n_r + {_DSIR_B}")})
         - ({_L("k_r + 1")} + {_L(f"n_t + {_DSIR_B}")}) AS s
    FROM cnt, tot
), w AS (
    SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
           CAST(SUM(s) AS BIGINT) AS weight_scaled
    FROM occ o JOIN scores USING (b) GROUP BY o.doc_id
), uni AS (
    SELECT d.doc_id,
           ('0x' || substr(md5('dsir#' || CAST(d.doc_id AS VARCHAR)),
                           1, 8))::BIGINT % {1 << 30} + 1 AS u,
           COALESCE(w.n_features, 0) AS n_features,
           COALESCE(w.weight_scaled, 0) AS weight_scaled
    FROM documents d LEFT JOIN w USING (doc_id)
)
SELECT doc_id, n_features, weight_scaled,
       {_L("u")} - {64 * 30} AS log_u_scaled,
       weight_scaled >= {_L("u")} - {64 * 30} AS accepted
FROM uni
ORDER BY doc_id
"""


DSIR_IMPORTANCE_SAMPLE_SQL = _dsir_sql()


# ---------------------------------------------------------------------------
# TRAINED QUALITY CLASSIFIER — GPT-3/Brown-style curation filter
# ---------------------------------------------------------------------------
# The curation piece DSIR's importance weighting does not cover: a
# DISCRIMINATIVE model trained to score documents by target-likeness
# (the "quality classifier trained on curated-vs-raw" every large
# pretraining corpus ships through). Model: linear probability model
# on the SAME hashed unigram+bigram buckets as DSIR, trained by THREE
# fixed full-batch gradient steps in exact integer arithmetic —
# logistic regression's sigmoid needs exp (a transcendental the float
# discipline bans; libm results differ across engines), while squared
# loss needs only *, + and one truncating division per weight update,
# which Spark `div`, DuckDB `//` and python agree on exactly. The
# oracle unrolls the three steps as CTEs (the PageRank pattern), so
# the driver's hash gate certifies the TRAINING LOOP end-to-end —
# weights, scores and predictions bit-for-bit.
#
# Label note (the funnel-degeneracy lesson, stated up front): the
# synthetic corpus draws every language's text from one shared
# vocabulary, so the lang='en' label carries no learnable signal here
# and driver-data accuracy sits at the base rate BY CONSTRUCTION —
# the gate certifies the arithmetic, and the planted separable-corpus
# pytest (tests/test_pipeline_ops.py) certifies the operator actually
# learns (99%+ accuracy) where signal exists.
#
# Scale shape: the feature frame is one corpus fan-out collapsed to
# (doc, bucket, count) with map-side combine; each training step is
# two corpus-keyed rollups (per-doc score, per-bucket gradient) and a
# 256-row collect — the weight vector is bounded model state, exactly
# like the k-means centroids. At 10^11 docs the BIGINT gradient sum
# approaches 2^63 and training runs on a uniform sample
# (kmeans.fit_fraction-style) — statistically standard for a linear
# probe — while SCORING still covers the full corpus.
_QC_SCALE = 1_000_000  # weight/score fixed-point scale
_QC_ITERS = 3
_QC_LRN, _QC_LRD = 1, 100  # learning rate 1/100 (divergence-checked)


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — the semantics
    Spark's `div` and DuckDB's `//` share; python's // floors."""
    q = abs(a) // b
    return q if a >= 0 else -q


def quality_classifier_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..catalog import table_rows

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    try:
        n_docs = table_rows(sf_dir, "documents")
    except (FileNotFoundError, OSError):
        n_docs = None  # in-memory/synthetic frame fallback (count())
    return quality_classifier_frame(docs, n_docs)


def quality_classifier_frame(
    docs: DataFrame, n_docs: int | None = None
) -> DataFrame:
    """The trained classifier over an arbitrary (doc_id, text, lang)
    frame — shared by the registry query and the materialized curation
    run's trained-filter stage (parity-asserted in
    tests/test_sinks.py). ``n_docs`` scales the learning rate; when
    None it is counted from the frame."""
    # Round-15 (optimization, guide §2.3/§4.2 — the lang_id_trained
    # treatment): each gradient step was one broadcast-literal scoring
    # rollup + a (doc, is_t)-keyed join + a bucket rollup + a 256-row
    # collect — two shuffles and a scheduler round-trip per iteration.
    # Now the feature frame is grouped ONCE into per-doc aligned
    # bucket/count arrays, and each iteration is a single Arrow pass:
    # the kernel densifies its batch into an (n × B) int64 count
    # matrix M, computes z = M·w and the partial gradient
    # gᵖ = Mᵀ·(z − y) in exact int64, and emits one B-vector per
    # partition; the driver sums partials with Python big-ints
    # (integer addition is order-free, so the result is independent of
    # partitioning). Final scoring is the same kernel without the
    # gradient. Bit-equality with the unrolled-CTE oracle is
    # unchanged: every quantity is the same integer (dense B-slot
    # weights hold 0 exactly where the sparse dict had no key).
    import numpy as np
    import pandas as pd

    B = _DSIR_B
    occ = _hashed_feature_occ(docs, materialize=False)
    xa = (
        occ.filter(F.col("b").isNotNull())
        .groupBy("doc_id", "is_t", "b")
        .agg(F.count(F.lit(1)).alias("x"))
        .groupBy("doc_id", "is_t")
        .agg(F.collect_list(F.struct("b", "x")).alias("bx"))
        .select(
            "doc_id",
            "is_t",
            F.col("bx.b").alias("bs"),
            F.col("bx.x").alias("xs"),
        )
        # localCheckpoint, not persist: xa feeds every gradient step
        # and the final scoring pass, and checkpoint blocks are
        # released with the reference instead of living in the
        # CacheManager for the session lifetime (round-9 ADVICE leak)
        .localCheckpoint()
    )
    if n_docs is None:
        n_docs = docs.count()

    def _densify(pdf: pd.DataFrame) -> np.ndarray:
        n = len(pdf)
        bs = pdf["bs"].to_numpy()
        xs = pdf["xs"].to_numpy()
        lens = np.fromiter((len(a) for a in bs), dtype=np.int64, count=n)
        m = np.zeros((n, B), dtype=np.int64)
        if lens.sum():
            rows = np.repeat(np.arange(n), lens)
            m[rows, np.concatenate(bs).astype(np.int64)] = np.concatenate(
                xs
            ).astype(np.int64)
        return m

    w_row: list[int] = [0] * B  # Python ints — exact, like the old dict
    for _ in range(_QC_ITERS):
        w_vec = np.asarray(w_row, dtype=np.int64)

        def grad_part(batches):
            g = np.zeros(B, dtype=np.int64)
            any_rows = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                any_rows = True
                m = _densify(pdf)
                z = m @ w_vec  # (n,), exact int64
                y = np.where(
                    pdf["is_t"].to_numpy().astype(bool), _QC_SCALE, 0
                ).astype(np.int64)
                g += (z - y) @ m
            if any_rows:
                yield pd.DataFrame({"g": [g.tolist()]})

        parts = xa.mapInPandas(grad_part, "g array<long>").collect()
        for r in parts:  # Python-int total: order-free, overflow-free
            flat = r["g"]
            for bi in range(B):
                gv = flat[bi]
                if gv:
                    w_row[bi] -= _trunc_div(
                        gv * _QC_LRN, _QC_LRD * n_docs
                    )

    w_final = np.asarray(w_row, dtype=np.int64)

    def score_part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _densify(pdf)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "z": m @ w_final})

    final_z = xa.mapInPandas(score_part, "doc_id long, z long")
    return (
        docs.select("doc_id", (F.col("lang") == "en").alias("is_target"))
        .join(final_z, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce("z", F.lit(0)).cast("bigint").alias("score_scaled"),
            (
                F.coalesce("z", F.lit(0)) > F.lit(_QC_SCALE // 2)
            ).alias("predicted"),
        )
        .orderBy("doc_id")
    )


def _qc_sql() -> str:
    s, lrn, lrd = _QC_SCALE, _QC_LRN, _QC_LRD
    body = f"""
WITH arrs AS MATERIALIZED (
    SELECT doc_id, lang = 'en' AS is_t,
           regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
    FROM documents
), feats AS (
    SELECT doc_id, is_t, t AS f FROM arrs, unnest(arr) AS un(t)
    UNION ALL
    SELECT doc_id, is_t, arr[i] || ' ' || arr[i + 1] AS f
    FROM arrs, unnest(generate_series(1, LEN(arr) - 1)) AS g(i)
    WHERE LEN(arr) >= 2
), x AS MATERIALIZED (
    SELECT doc_id, is_t,
           ('0x' || substr(md5(f), 1, 7))::BIGINT % {_DSIR_B} AS b,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM feats GROUP BY doc_id, is_t, b
), nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents),
w0 AS MATERIALIZED (SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM x)"""
    prev = "w0"
    for i in range(1, _QC_ITERS + 1):
        body += f""",
z{i} AS MATERIALIZED (
    SELECT doc_id, is_t, CAST(SUM(x.x * w.w) AS BIGINT) AS z
    FROM x JOIN {prev} w USING (b) GROUP BY doc_id, is_t),
g{i} AS MATERIALIZED (
    SELECT x.b,
           CAST(SUM(x.x * (z.z - CASE WHEN x.is_t THEN {s} ELSE 0 END))
                AS BIGINT) AS g
    FROM x JOIN z{i} z USING (doc_id, is_t) GROUP BY x.b),
w{i} AS MATERIALIZED (
    SELECT w.b, w.w - (g.g * {lrn}) // ({lrd} * nn.n) AS w
    FROM {prev} w JOIN g{i} g USING (b), nn)"""
        prev = f"w{i}"
    body += f""",
zf AS (
    SELECT doc_id, CAST(SUM(x.x * w.w) AS BIGINT) AS z
    FROM x JOIN {prev} w USING (b) GROUP BY doc_id)
SELECT d.doc_id, d.lang = 'en' AS is_target,
       COALESCE(zf.z, 0) AS score_scaled,
       COALESCE(zf.z, 0) > {s // 2} AS predicted
FROM documents d LEFT JOIN zf USING (doc_id)
ORDER BY d.doc_id"""
    return body


QUALITY_CLASSIFIER_SCORES_SQL = _qc_sql()


# ---------------------------------------------------------------------------
# PARETO LOTTERY — GPT-3's actual classifier-acceptance rule
# ---------------------------------------------------------------------------
# GPT-3 (Brown et al. 2020, App. A) does NOT threshold its quality
# classifier: a document is kept iff
#       np.random.pareto(alpha) > 1 - document_score,   alpha = 9
# so high-scoring docs are near-certain keeps while low scorers retain
# a heavy-tailed re-inclusion chance (preserving distributional
# coverage). With X = U^(-1/alpha) - 1 (inverse-CDF form, U uniform
# (0,1]) the rule is  U <= (2 - s)^(-alpha)  — and THAT is exactly
# representable in integer arithmetic: with s quantized to 1/1000 and
# clamped to [0, 1] (scores ride the classifier's fixed point), keep
#       u * (2000 - s1k)^9  <=  2^20 * 1000^9
# with u = md5-uniform in [1, 2^20]. Max LHS = 2^20 * 2000^9 ~ 5.4e35
# < 1e38, so decimal(38,0) (Spark) and HUGEINT (DuckDB) agree exactly:
# a transcendental-free Pareto draw, derandomized by a
# content-independent hash — the same discipline as DSIR's Bernoulli.
# At s = 1 the inequality is u <= 2^20: always true, P(keep) = 1
# exactly. Oracle: the classifier's unrolled training CTEs + the
# integer lottery (full hash certification of train + lottery).
_PARETO_ALPHA = 9
_PL_UBITS = 20  # u in [1, 2^20]


def quality_pareto_lottery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pareto_lottery_frame(
        quality_classifier_scores(spark, sf_dir).select(
            "doc_id", "score_scaled"
        )
    ).orderBy("doc_id")


def pareto_lottery_frame(scores: DataFrame) -> DataFrame:
    """The integer lottery over an arbitrary (doc_id, score_scaled)
    frame — shared by the registry query and the curation run's
    ``classifier_gate="lottery"`` mode."""
    # `div`: truncating integer division, the semantics DuckDB's `//`
    # shares (module float-discipline note)
    s1k = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(1000).cast("long"), F.expr("score_scaled div 1000")),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pareto#"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % (1 << _PL_UBITS)
        + 1
    )
    c = (F.lit(2000) - s1k).cast("decimal(38,0)")
    c9 = c
    for _ in range(_PARETO_ALPHA - 1):
        c9 = c9 * c
    # 2^20 * 1000^9 ~ 1.05e33 exceeds int64 — a decimal literal, not
    # F.lit (py4j longs cap at 2^63)
    rhs = F.expr(
        f"CAST('{(1 << _PL_UBITS) * 1000 ** _PARETO_ALPHA}' AS DECIMAL(38,0))"
    )
    return scores.select(
        "doc_id",
        "score_scaled",
        u.alias("pareto_u"),
        (u.cast("decimal(38,0)") * c9 <= rhs).alias("kept"),
    )


def _pareto_lottery_sql() -> str:
    c = "(2000 - GREATEST(0, LEAST(1000, score_scaled // 1000)))::HUGEINT"
    c9 = " * ".join([c] * _PARETO_ALPHA)
    u = (
        "(('0x' || substr(md5('pareto#' || CAST(doc_id AS VARCHAR)), 1, 8))"
        f"::BIGINT % {1 << _PL_UBITS} + 1)"
    )
    return f"""
WITH qc AS ({QUALITY_CLASSIFIER_SCORES_SQL.rstrip()}
)
SELECT doc_id, score_scaled,
       CAST({u} AS BIGINT) AS pareto_u,
       {u}::HUGEINT * ({c9})
           <= {(1 << _PL_UBITS) * 1000**_PARETO_ALPHA}::HUGEINT AS kept
FROM qc
ORDER BY doc_id
"""


QUALITY_PARETO_LOTTERY_SQL = _pareto_lottery_sql()


# ---------------------------------------------------------------------------
# TRAINED LANGUAGE-ID CLASSIFIER — the learned counterpart of
# lang_id_guess (queries/llm.py), closing the curation gap where
# pipeline_clean_corpus trusts the `lang` column: a real crawl needs
# a classifier. Model: K one-vs-rest linear probability models
# (fastText's shape, linear on hashed features) over hashed char
# TRIGRAMS of the document's lowercased first _LID_C chars — char
# n-grams are the standard lang-ID feature family, and the prefix
# bound caps per-doc cost (lang-ID needs a probe, not the whole doc).
# Training is the exact-integer discipline of
# quality_classifier_scores: _LID_ITERS full-batch squared-loss
# gradient steps, all *, + and one truncating division per weight
# update (Spark `div` = DuckDB `//` = _trunc_div), labels from the
# existing `lang` column. The oracle unrolls every step as CTEs with
# the class dimension in the group keys, so the driver's hash gate
# certifies the K-class TRAINING LOOP end-to-end — weights, scores,
# argmax predictions bit-for-bit.
#
# Label note (the funnel-degeneracy lesson, stated up front): the
# synthetic corpus draws every language's text from ONE shared
# vocabulary, so driver-data accuracy sits near the base rate BY
# CONSTRUCTION — the gate certifies the arithmetic; the planted
# separable-corpus pytest (tests/test_pipeline_ops.py) certifies the
# operator actually learns (distinct char distributions -> >95%
# agreement) where signal exists.
#
# Scale shape: the feature frame is one bounded fan-out (<= _LID_C-2
# grams/doc) collapsed to (doc, bucket, count) with map-side combine;
# each step is a broadcast join against the <= K*_DSIR_B-row weight
# table, two corpus-keyed rollups, and a bounded collect (model
# state, like the k-means centroids). The argmax is a per-doc window
# over K rows/doc. The labels join in the gradient step is a plain
# doc_id shuffle join (labels is corpus-sized — NEVER broadcast).
# At a real 10^11-doc corpus the whole-corpus gradient is still a
# fixed number of corpus passes, but the practical path is training
# on a hash-derandomized subsample (pass a filtered frame to
# lang_id_trained_frame's train_docs) and scoring the full corpus;
# the registry form trains and scores on the same frame so the
# DuckDB oracle can unroll the identical loop.
_LID_C = 128   # chars of prefix probed per doc
_LID_ITERS = 3
_LID_SCALE = 1_000_000
_LID_LRN, _LID_LRD = 1, 100


def _lid_x(docs: DataFrame) -> DataFrame:
    """(doc_id, b, x) hashed char-trigram counts over the lowercased
    _LID_C-char prefix. sequence() guard: explode only docs whose
    prefix holds >= 1 trigram (descending-sequence hazard)."""
    pre = docs.select(
        "doc_id", F.lower(F.substring("text", 1, _LID_C)).alias("p")
    ).filter(F.length("p") >= 3)
    grams = pre.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), (F.length("p") - 2).cast("int"))
        ).alias("i"),
        "p",
    ).select(
        "doc_id",
        (
            F.conv(
                F.substring(F.md5(F.col("p").substr(F.col("i"), F.lit(3))), 1, 7),
                16,
                10,
            ).cast("bigint")
            % _DSIR_B
        ).alias("b"),
    )
    return grams.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("x"))


def lang_id_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table_rows

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    try:
        n_docs = table_rows(sf_dir, "documents")
    except (FileNotFoundError, OSError):
        n_docs = None
    return lang_id_trained_frame(spark, docs, n_docs)


def lang_id_trained_frame(
    spark: SparkSession,
    docs: DataFrame,
    n_docs: int | None = None,
    train_docs: DataFrame | None = None,
) -> DataFrame:
    """K-class trained lang-ID over an arbitrary (doc_id, text, lang)
    frame. Returns per-doc (doc_id, lang, predicted_lang,
    best_score_scaled, is_correct); agreement rate is one rollup away
    (asserted in the pytest, kept out of the frame so no corpus-wide
    single-task window rides the registry plan).

    train_docs: optional training subsample (the 10^11-doc path —
    train on a hash-derandomized slice, score the full frame). When
    None (the registry/oracle form) training and scoring share the
    same frame and the same feature scan.

    Round-15 (optimization, guide §2.3/§4.2; VERDICT r14 item 5): the
    per-iteration broadcast-weight join + two corpus shuffles +
    256-row collect is replaced by ONE Arrow pass per iteration over
    per-doc feature ARRAYS. Each task densifies its batch into an
    (n × B) int64 count matrix M, computes Z = M·Wᵀ and the partial
    gradient Gᵖ = (Z − Y)ᵀ·M in two exact int64 matmuls, and emits one
    K×B partial; the driver sums the ≤ numPartitions partials with
    Python big-ints (integer addition is order-free, so the result is
    independent of partitioning — the determinism argument the float
    k-means loop cannot make). Final scoring is the same kernel plus a
    per-row argmax over sorted classes (first-max == the old
    row_number (z DESC, c ASC) tie-break), so the K-rows-per-doc frame
    and its window are gone too. Labels ride the checkpointed feature
    frame — joined once, not once per iteration. Bit-equality with the
    unrolled-CTE oracle is unchanged: every quantity is the same
    integer (dense B-slot weights hold 0 exactly where the sparse
    (c, b) dict had no key — a zero weight contributes zero, as the
    old inner join dropped the row)."""
    import numpy as np
    import pandas as pd

    B = _DSIR_B

    def _xa(feat: DataFrame, lab: DataFrame) -> DataFrame:
        # one row per featured doc: aligned bucket/count arrays + label
        return (
            feat.groupBy("doc_id")
            .agg(F.collect_list(F.struct("b", "x")).alias("bx"))
            .join(lab, "doc_id")
            .select(
                "doc_id",
                "lang",
                F.col("bx.b").alias("bs"),
                F.col("bx.x").alias("xs"),
            )
        )

    if train_docs is None:
        if n_docs is None:
            n_docs = docs.count()
        labels = docs.select("doc_id", "lang")
        # localCheckpoint: feeds every gradient pass + final scoring
        xa_full = _xa(_lid_x(docs), labels).localCheckpoint()
        xa_train = xa_full
    else:
        n_docs = train_docs.count()
        labels = docs.select("doc_id", "lang")
        xa_full = _xa(_lid_x(docs), labels).localCheckpoint()
        xa_train = _xa(
            _lid_x(train_docs), train_docs.select("doc_id", "lang")
        ).localCheckpoint()
    # class list from the LABELS (not the feature frame): a class seen
    # only on featureless docs still needs its (all-zero) weight row
    # so it participates in the argmax exactly as before
    train_labels = (
        labels if train_docs is None else train_docs.select("doc_id", "lang")
    )
    langs = sorted(
        r["lang"] for r in train_labels.select("lang").distinct().collect()
    )
    K = len(langs)
    lang_idx = {c: i for i, c in enumerate(langs)}
    # weights as PYTHON ints (exact, like the old (c, b) dict); the
    # kernel closure gets an int64 snapshot per iteration
    w_rows: list[list[int]] = [[0] * B for _ in range(K)]

    def _densify(pdf: pd.DataFrame) -> np.ndarray:
        n = len(pdf)
        bs = pdf["bs"].to_numpy()
        xs = pdf["xs"].to_numpy()
        lens = np.fromiter((len(a) for a in bs), dtype=np.int64, count=n)
        m = np.zeros((n, B), dtype=np.int64)
        if lens.sum():
            rows = np.repeat(np.arange(n), lens)
            m[rows, np.concatenate(bs).astype(np.int64)] = np.concatenate(
                xs
            ).astype(np.int64)
        return m

    for _ in range(_LID_ITERS):
        w_mat = np.asarray(w_rows, dtype=np.int64)

        def grad_part(batches):
            g = np.zeros((K, B), dtype=np.int64)
            any_rows = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                any_rows = True
                m = _densify(pdf)
                z = m @ w_mat.T  # (n, K), exact int64
                y = np.zeros((len(pdf), K), dtype=np.int64)
                li = np.fromiter(
                    (lang_idx[c] for c in pdf["lang"]),
                    dtype=np.int64,
                    count=len(pdf),
                )
                y[np.arange(len(pdf)), li] = _LID_SCALE
                g += (z - y).T @ m
            if any_rows:
                yield pd.DataFrame({"g": [g.ravel().tolist()]})

        parts = xa_train.mapInPandas(grad_part, "g array<long>").collect()
        for r in parts:  # Python-int total: order-free, overflow-free
            flat = r["g"]
            for ci in range(K):
                row = w_rows[ci]
                base = ci * B
                for bi in range(B):
                    gv = flat[base + bi]
                    if gv:
                        row[bi] -= _trunc_div(
                            gv * _LID_LRN, _LID_LRD * n_docs
                        )

    w_final = np.asarray(w_rows, dtype=np.int64)

    def score_part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _densify(pdf)
            z = m @ w_final.T
            best = np.argmax(z, axis=1)  # first max = smallest class
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pred": [langs[i] for i in best],
                    "z": z[np.arange(len(pdf)), best],
                }
            )

    winner = xa_full.mapInPandas(score_part, "doc_id long, pred string, z long")
    # docs whose prefix held no trigram fall back to the
    # lexicographically-first class at score 0 (deterministic; never
    # fires on driver data — min doc length 47)
    fallback = F.lit(langs[0] if langs else "und")
    out_labels = docs.select("doc_id", "lang")
    return (
        out_labels.join(winner, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("pred", fallback).alias("predicted_lang"),
            F.coalesce("z", F.lit(0)).cast("bigint").alias("best_score_scaled"),
            (F.col("lang") == F.coalesce("pred", fallback)).alias("is_correct"),
        )
        .orderBy("doc_id")
    )


def _lang_id_trained_sql() -> str:
    s, lrn, lrd = _LID_SCALE, _LID_LRN, _LID_LRD
    body = f"""
WITH pre AS (
    SELECT doc_id, LOWER(SUBSTR(text, 1, {_LID_C})) AS p
    FROM documents WHERE LENGTH(SUBSTR(text, 1, {_LID_C})) >= 3
), grams AS (
    SELECT doc_id,
           ('0x' || substr(md5(substr(p, CAST(i AS INTEGER), 3)), 1, 7))::BIGINT
               % {_DSIR_B} AS b
    FROM pre, unnest(generate_series(1, LENGTH(p) - 2)) AS g(i)
), x AS MATERIALIZED (
    SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS x
    FROM grams GROUP BY doc_id, b
), labels AS MATERIALIZED (SELECT doc_id, lang FROM documents),
langs AS MATERIALIZED (SELECT DISTINCT lang AS c FROM documents),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents),
w0 AS MATERIALIZED (
    SELECT l.c, b.b, CAST(0 AS BIGINT) AS w
    FROM langs l, (SELECT DISTINCT b FROM x) b)"""
    prev = "w0"
    for i in range(1, _LID_ITERS + 1):
        body += f""",
z{i} AS MATERIALIZED (
    SELECT x.doc_id, w.c, CAST(SUM(x.x * w.w) AS BIGINT) AS z
    FROM x JOIN {prev} w USING (b) GROUP BY x.doc_id, w.c),
g{i} AS MATERIALIZED (
    SELECT z.c, x.b,
           CAST(SUM(x.x * (z.z -
               CASE WHEN lab.lang = z.c THEN {s} ELSE 0 END)) AS BIGINT) AS g
    FROM x JOIN z{i} z USING (doc_id)
           JOIN labels lab ON lab.doc_id = x.doc_id
    GROUP BY z.c, x.b),
w{i} AS MATERIALIZED (
    SELECT w.c, w.b, w.w - (g.g * {lrn}) // ({lrd} * nn.n) AS w
    FROM {prev} w JOIN g{i} g ON g.c = w.c AND g.b = w.b, nn)"""
        prev = f"w{i}"
    body += f""",
zf AS (
    SELECT x.doc_id, w.c, CAST(SUM(x.x * w.w) AS BIGINT) AS z
    FROM x JOIN {prev} w USING (b) GROUP BY x.doc_id, w.c),
winner AS (
    SELECT doc_id, c AS pred, z FROM (
        SELECT doc_id, c, z,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY z DESC, c ASC) AS rn
        FROM zf) WHERE rn = 1),
fb AS (SELECT MIN(c) AS f FROM langs)
SELECT lab.doc_id, lab.lang,
       COALESCE(winner.pred, fb.f) AS predicted_lang,
       CAST(COALESCE(winner.z, 0) AS BIGINT) AS best_score_scaled,
       lab.lang = COALESCE(winner.pred, fb.f) AS is_correct
FROM labels lab LEFT JOIN winner USING (doc_id), fb
ORDER BY lab.doc_id"""
    return body


LANG_ID_TRAINED_SQL = _lang_id_trained_sql()


# ---------------------------------------------------------------------------
# BOILERPLATE COMMONALITY — cross-document repeated-content filter
# ---------------------------------------------------------------------------
# The cross-doc complement of quality_signals' intra-doc repetition
# rules (RefinedWeb/C4-style boilerplate removal: headers, footers,
# navigation text recur across many pages of a crawl). Per document:
# the fraction of its distinct 3-token shingles that appear in more
# than _BOILER_DF other documents corpus-wide. The flag is decided on
# integers (2·n_common ≥ n_shingles); common_frac divides two exact
# counts in one IEEE op.
#
# Scale shape: explode → groupBy shingle (posting counts) → join back
# on shingle → per-doc rollup. Three shuffles, all keyed on bounded-
# cardinality keys (shingle vocabulary, doc_id); nothing is O(docs²) —
# the same posting-list discipline as tfidf_keywords, and the shingle
# expression is bound once (bind_once inside dedup.minhash.shingles).
_BOILER_DF = 4


def boilerplate_commonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.minhash import shingles

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id", F.explode(shingles("text", k=3)).alias("sh")
    )
    counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") > _BOILER_DF).cast("long")).alias("n_common"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_common",
            (F.col("n_common").cast("double") / F.col("n_shingles")).alias(
                "common_frac"
            ),
            (F.lit(2) * F.col("n_common") >= F.col("n_shingles"))
            .cast("int")
            .alias("boilerplate"),
        )
        .orderBy("doc_id")
    )


# Shingle CASE identical to the dedup_cluster / dedup_ngram oracles
# (<3 tokens → one whole-doc shingle; no tokens → empty array → the
# doc vanishes from the explode, same as Spark). Per-(doc, shingle)
# rows are distinct by construction, so COUNT(*) per shingle equals
# the distinct-document frequency in both engines.
BOILERPLATE_COMMONALITY_SQL = f"""
WITH shl AS (
    SELECT doc_id,
           CASE WHEN LEN(arr) = 0 THEN CAST([] AS VARCHAR[])
                WHEN LEN(arr) < 3 THEN [array_to_string(arr, ' ')]
                ELSE list_distinct(list_transform(
                       generate_series(1, LEN(arr) - 2),
                       i -> array_to_string(list_slice(arr, i, i + 2), ' ')))
           END AS sh
    FROM (SELECT doc_id,
                 regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
          FROM documents)
), sh AS (
    SELECT doc_id, UNNEST(sh) AS s FROM shl
), cnt AS (
    SELECT s, COUNT(*) AS df FROM sh GROUP BY s
)
SELECT sh.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN df > {_BOILER_DF} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_common,
       CAST(SUM(CASE WHEN df > {_BOILER_DF} THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS common_frac,
       CAST(CASE WHEN 2 * SUM(CASE WHEN df > {_BOILER_DF} THEN 1 ELSE 0 END)
                      >= COUNT(*) THEN 1 ELSE 0 END AS INTEGER)
           AS boilerplate
FROM sh JOIN cnt ON sh.s = cnt.s
GROUP BY sh.doc_id
ORDER BY sh.doc_id
"""


# L4d — robust outlier screening via MAD (median absolute deviation):
# the length-distribution gate quality filters should use instead of
# mean±kσ, because a heavy tail drags the mean but not the median.
# Exact two-median form: per-source median of n_chars, median of
# |n_chars − med|, flag docs with |x − med| > 3·MAD. Three passes over
# the corpus is the honest cost of EXACT nested medians; at 100 TB
# you would swap F.percentile for approx_percentile (GK sketch, one
# pass per level — see agg_approx_percentiles) and keep this exact
# form for validation samples. The two stats frames are per-source
# (tiny) and broadcast back; Spark's percentile and DuckDB's
# QUANTILE_CONT share the same linear-interpolation definition, and
# every derived float op is the identical IEEE instruction in both
# engines (same discipline as agg_stats_corr).
def quality_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).select("source", "n_chars")
    # localCheckpoint: stats feeds BOTH the mad branch and the final
    # rollup — without it each branch re-runs the per-source aggregate
    # over the whole corpus (audited: 5 exchanges → 3)
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile("n_chars", 0.5).alias("med_chars"),
    ).localCheckpoint()
    dev = docs.join(F.broadcast(stats), "source").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med_chars"))
    )
    mad = dev.groupBy("source").agg(
        F.percentile("adev", 0.5).alias("mad_chars")
    )
    return (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.min("n_docs").alias("n_docs"),
            F.min("med_chars").alias("med_chars"),
            F.min("mad_chars").alias("mad_chars"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad_chars"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .withColumn(
            "outlier_rate",
            F.col("n_outliers").cast("double") / F.col("n_docs").cast("double"),
        )
        .orderBy("source")
    )


QUALITY_MAD_OUTLIERS_SQL = """
WITH stats AS (
    SELECT source, COUNT(*) AS n_docs,
           QUANTILE_CONT(n_chars, 0.5) AS med_chars
    FROM documents GROUP BY source
), dev AS (
    SELECT d.source, s.n_docs, s.med_chars,
           ABS(d.n_chars - s.med_chars) AS adev
    FROM documents d JOIN stats s USING (source)
), mad AS (
    SELECT source, QUANTILE_CONT(adev, 0.5) AS mad_chars
    FROM dev GROUP BY source
)
SELECT dev.source AS source,
       MIN(dev.n_docs) AS n_docs,
       MIN(dev.med_chars) AS med_chars,
       MIN(mad.mad_chars) AS mad_chars,
       CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad_chars THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(MIN(dev.n_docs) AS DOUBLE) AS outlier_rate
FROM dev JOIN mad USING (source)
GROUP BY dev.source
ORDER BY source
"""


# End-to-end ENTITY RESOLUTION — the other composite pipeline shape a
# warehouse team runs daily (pipeline_clean_corpus being the corpus
# one): blocking → fuzzy match → transitive clustering → canonical
# record. Blocking is TWO-dimensional, because at 100 TB brand-only
# blocks grow linearly with the catalog and their pair expansion
# quadratically: the join key is (brand, length-bucket) with bucket
# width 3 and the probe side replicated into buckets {b−1, b, b+1} —
# LOSSLESS for levenshtein≤2 (edit distance ≥ |Δlen|, and any pair
# with |Δlen|≤2 shares a probed bucket; exactly one probe matches, so
# no pair dedup is needed). Matching includes IDENTICAL names (dist 0
# — the same entity listed twice IS the point of ER, unlike
# fuzzy_join_editdist which studies the fuzzy band alone); transitive
# closure reuses the production connected_components operator (hybrid
# driver/distributed, the same engine dedup_cluster gates); the
# canonical record takes the min-key member's name + member price
# envelope. Oracle: the SEMANTIC spec — plain quadratic-in-block
# levenshtein pairs (band losslessness means identical results), the
# same fixed point via the recursive min-label CTE, the same rollup.
def pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = ensure_parallelism(load_table(spark, sf_dir, "part"))
    bucket = F.floor(F.length("p_name") / 3).cast("long")
    a = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("id_a"),
        F.col("p_name").alias("name_a"),
        bucket.alias("bk"),
    )
    b = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("name_b"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bk"),
    )
    pairs = (
        a.join(b, ["brand", "bk"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= 2)
        )
        .filter(F.levenshtein("name_a", "name_b") <= 2)
        .select("id_a", "id_b")
    )
    comps = cluster.connected_components(
        pairs, part.select("p_partkey"), id_col="p_partkey"
    )
    stats = (
        comps.join(part, "p_partkey")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("p_retailprice").alias("price_lo"),
            F.max("p_retailprice").alias("price_hi"),
        )
    )
    canon = part.select(
        F.col("p_partkey").alias("cluster_id"),
        F.col("p_name").alias("canonical_name"),
    )
    return (
        stats.join(canon, "cluster_id")
        .select(
            "cluster_id", "n_members", "canonical_name",
            "price_lo", "price_hi",
        )
        .orderBy("cluster_id")
    )


PIPELINE_ENTITY_RESOLUTION_SQL = """
WITH RECURSIVE pairs AS (
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= 2
      AND levenshtein(a.p_name, b.p_name) <= 2
), edges AS (
    SELECT id_a AS x, id_b AS y FROM pairs
    UNION ALL
    SELECT id_b AS x, id_a AS y FROM pairs
), reach(a, b) AS (
    SELECT p_partkey, p_partkey FROM part
    UNION
    SELECT r.a, e.y FROM reach r JOIN edges e ON r.b = e.x
), comp AS (
    SELECT a AS p_partkey, MIN(b) AS cluster_id FROM reach GROUP BY a
), stats AS (
    SELECT c.cluster_id,
           COUNT(*) AS n_members,
           MIN(p.p_retailprice) AS price_lo,
           MAX(p.p_retailprice) AS price_hi
    FROM comp c JOIN part p USING (p_partkey)
    GROUP BY c.cluster_id
)
SELECT s.cluster_id, s.n_members, p.p_name AS canonical_name,
       s.price_lo, s.price_hi
FROM stats s JOIN part p ON p.p_partkey = s.cluster_id
ORDER BY s.cluster_id
"""


# The CAPSTONE composite: the full pretraining data-prep chain a
# training run actually consumes, every stage the production shape
# proven individually elsewhere in the registry — quality gates
# (pipeline_clean_corpus), exact dedup keep-min-id, overlapping
# chunking (text_chunk_windows' fan-out), per-chunk token counts,
# greedy capacity packing (pack_sequences' running-sum window), and
# the deterministic md5 train/val/holdout gate (split_train_holdout).
# Output is the bin manifest: (source, bin, split) → chunk/token
# totals. One pipeline, oracle-mirrored stage by stage — the whole
# chain is hash-compared, not just its pieces. Shuffle shape: dedup
# window (1) + pack window (1) + final rollup (1) + result sort (1);
# the chunk fan-out and gates ride the scan.
from .llm import _CHUNK_S, _CHUNK_W  # single-sourced chunk geometry
def pipeline_pretrain_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    gated = docs.filter(
        F.col("lang").isin("en", "de", "fr")
        & F.length("text").between(20, 10000)
        & (TXT.punct_ratio("text") <= 0.2)
        & (TXT.token_count("text") >= 10)
    )
    w_dedup = Window.partitionBy("text").orderBy("doc_id")
    kept = (
        gated.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "source", "text")
    )
    last = F.greatest(
        F.floor((F.length("text") - 1) / _CHUNK_S),
        F.lit(0).cast("bigint"),
    )
    fanout = kept.select(
        "doc_id",
        "source",
        "text",
        F.explode(F.sequence(F.lit(0).cast("bigint"), last)).alias("chunk_id"),
    )
    chunk = F.col("text").substr(
        (F.col("chunk_id") * _CHUNK_S + 1).cast("int"), F.lit(_CHUNK_W)
    )
    chunks = fanout.select(
        "doc_id",
        "source",
        "chunk_id",
        TXT.token_count(chunk).cast("long").alias("n_tok"),
    )
    w_pack = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    packed = chunks.select(
        "source",
        "n_tok",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w_pack), F.lit(0)) / _PACK_CAPACITY
        ).alias("bin_id"),
        F.when(bucket < "e6", "train")
        .when(bucket < "f3", "val")
        .otherwise("holdout")
        .alias("split"),
    )
    return (
        packed.groupBy("source", "bin_id", "split")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .orderBy("source", "bin_id", "split")
    )


PIPELINE_PRETRAIN_PREP_SQL = f"""
WITH gated AS (
    SELECT * FROM documents
    WHERE lang IN ('en', 'de', 'fr')
      AND LENGTH(text) BETWEEN 20 AND 10000
      AND LENGTH(REGEXP_REPLACE(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
          / LENGTH(text) <= 0.2
      AND LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-zA-Z]+')) >= 10
), kept AS (
    SELECT doc_id, source, text FROM gated
    QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
), fanout AS (
    SELECT doc_id, source, text,
           unnest(generate_series(0,
               CAST(GREATEST(FLOOR((LENGTH(text) - 1) / {_CHUNK_S}.0), 0)
                    AS BIGINT))) AS chunk_id
    FROM kept
), chunks AS (
    SELECT doc_id, source, chunk_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(
               substr(text, CAST(chunk_id * {_CHUNK_S} + 1 AS INTEGER),
                      {_CHUNK_W})),
               '[a-zA-Z]+')) AS BIGINT) AS n_tok
    FROM fanout
), packed AS (
    SELECT source, n_tok,
           CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_PACK_CAPACITY}) AS BIGINT) AS bin_id,
           CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'train'
                WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                    THEN 'val'
                ELSE 'holdout' END AS split
    FROM chunks
)
SELECT source, bin_id, split,
       COUNT(*) AS n_chunks,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM packed
GROUP BY source, bin_id, split
ORDER BY source, bin_id, split
"""


QUERIES: dict[str, QuerySpec] = {
    "pipeline_pretrain_prep": QuerySpec(
        pipeline_pretrain_prep, PIPELINE_PRETRAIN_PREP_SQL,
        tags=("L4", "L1", "A2", "W3", "P5"),
        doc="capstone pretraining prep: gates -> dedup -> chunk -> "
        "token count -> capacity pack -> split manifest",
    ),
    "pipeline_entity_resolution": QuerySpec(
        pipeline_entity_resolution, PIPELINE_ENTITY_RESOLUTION_SQL,
        tags=("L2", "J1", "A2", "F1"),
        doc="entity resolution end-to-end: brand blocking, edit-distance "
        "match, connected components, canonical record",
    ),
    "quality_mad_outliers": QuerySpec(
        quality_mad_outliers, QUALITY_MAD_OUTLIERS_SQL,
        tags=("L4", "A2", "F3"),
        doc="robust MAD outlier gate: exact nested medians, per-source "
        "stats broadcast back",
    ),
    "boilerplate_commonality": QuerySpec(
        boilerplate_commonality, BOILERPLATE_COMMONALITY_SQL,
        tags=("L4", "A2", "J1"),
        doc="cross-doc shingle commonality: boilerplate fraction per doc",
    ),
    "split_train_holdout": QuerySpec(
        split_train_holdout, SPLIT_TRAIN_HOLDOUT_SQL, tags=("L4", "P6", "F1"),
        doc="deterministic md5-bucket train/val/holdout split",
    ),
    "quality_signals": QuerySpec(
        quality_signals, QUALITY_SIGNALS_SQL, tags=("L4", "A2"), bench=True,
        doc="Gopher-style repetition signals via explode/groupBy",
    ),
    "decontaminate": QuerySpec(
        decontaminate, DECONTAMINATE_SQL, tags=("L2", "L4", "J2"),
        doc="eval-set n-gram decontamination, broadcast eval grams",
    ),
    "dedup_cluster_sizes": QuerySpec(
        dedup_cluster_sizes, DEDUP_CLUSTER_SIZES_SQL, tags=("L1", "L2", "A2"),
        doc="duplicate-cluster size histogram (duplication-mass "
        "report); composes dedup_cluster, cluster-count-sized output",
    ),
    "dedup_cluster": QuerySpec(
        dedup_cluster, DEDUP_CLUSTER_SQL, tags=("L1", "L2"), bench=True,
        doc="connected components over dup pairs vs recursive-CTE oracle",
    ),
    "domain_mix_sample": QuerySpec(
        domain_mix_sample, DOMAIN_MIX_SAMPLE_SQL, tags=("L4", "A6"),
        doc="deterministic per-source mixture downsampling rollup",
    ),
    "vocab_zipf_slope": QuerySpec(
        vocab_zipf_slope, VOCAB_ZIPF_SLOPE_SQL, tags=("L4", "A2", "W1"),
        doc="Zipf rank-frequency power-law fit of the vocabulary: OLS "
        "of ilog2(freq) on ilog2(rank) with every regression sum an "
        "order-free exact integer; slope emitted as exact num/den "
        "plus one IEEE division; the rank window runs on the bounded "
        "vocabulary frame, not the corpus",
    ),
    "lang_temperature_sample": QuerySpec(
        lang_temperature_sample, LANG_TEMPERATURE_SAMPLE_SQL,
        tags=("L4", "A2", "J2"),
        doc="temperature-scaled domain mixing (share^alpha, alpha=1/2): "
        "exact-rational rejection weights via fixed-point ilog2, "
        "hash-derandomized Bernoulli keep decisions",
    ),
    "pack_sequences": QuerySpec(
        pack_sequences, PACK_SEQUENCES_SQL, tags=("L4", "W3"),
        doc="token-budget sequence packing via windowed cumsum",
    ),
    "vocab_topk": QuerySpec(
        vocab_topk, VOCAB_TOPK_SQL, tags=("L4", "A2", "A3", "O3"), bench=True,
        doc="corpus vocabulary: token/doc frequencies, deterministic top-k",
    ),
    "stratified_sample": QuerySpec(
        stratified_sample, STRATIFIED_SAMPLE_SQL, tags=("L4", "W1"),
        doc="exact-n-per-source deterministic hash-ranked sample",
    ),
    "weighted_sample_topk": QuerySpec(
        weighted_sample_topk, WEIGHTED_SAMPLE_TOPK_SQL,
        tags=("L4", "O3", "F3"),
        doc="Efraimidis-Spirakis weighted sampling without replacement "
        "in exact integers: per-item priority key from the fixed-point "
        "ilog2 of a hash-derandomized uniform (never libm), weight = "
        "token count, one TakeOrdered(k) - the one-pass distributed "
        "weighted-reservoir primitive; all operands nonnegative so "
        "Spark div and DuckDB // agree",
    ),
    "unimax_budget_alloc": QuerySpec(
        unimax_budget_alloc, UNIMAX_BUDGET_ALLOC_SQL,
        tags=("L4", "A2", "W3"),
        doc="UniMax budget allocation (the multilingual-mix rule): a "
        "total token budget split as equal shares per source, capped "
        "at C=2 epochs of each source's material - exact-integer "
        "closed-form waterfilling (running-min capped prefix over the "
        "cap-sorted sources, remainder to the first R mod m in sort "
        "order), no iteration; completes the mixing family alongside "
        "uniform quotas (token_budget_mix) and temperature sampling",
    ),
    "temperature_budget_fill": QuerySpec(
        temperature_budget_fill, TEMPERATURE_BUDGET_FILL_SQL,
        tags=("L4", "A2", "W3", "J2"),
        doc="temperature-derived allocation + fill (T=2, the "
        "multilingual flattening rule): budget split proportionally "
        "to isqrt(n_s) - exact integer sqrt via float sqrt + two "
        "integer corrections, engine-identical - with "
        "largest-remainder distribution so the allocations sum to "
        "the budget exactly; executed by the shared DxS sub-stream "
        "fill (non-binding flattened small sources keep everything, "
        "large sources truncate); completes the allocation x fill "
        "matrix alongside uniform and UniMax",
    ),
    "seq_packing_layout": QuerySpec(
        seq_packing_layout, SEQ_PACKING_LAYOUT_SQL,
        tags=("L4", "A2", "W3", "P6"),
        doc="sequence-packing layout (concat-and-chunk, the step "
        "between curation and training): docs stream into S "
        "hash-salted sub-streams and each packs independently into "
        "fixed L=256-token sequences via an exact-integer per-shard "
        "prefix sum - no global cumsum task; per-shard rollup of "
        "docs/tokens/sequences/boundary-straddling docs/tail padding "
        "plus exact sums of every doc's (seq_first, seq_last) "
        "placement, which certify the whole layout through the value "
        "hash without shipping a per-doc frame",
    ),
    "unimax_budget_fill": QuerySpec(
        unimax_budget_fill, UNIMAX_BUDGET_FILL_SQL,
        tags=("L4", "A2", "W3", "J2"),
        doc="the allocator COMPOSED with the fill executor (execute "
        "the data recipe): each source filled to its UniMax "
        "allocation via the DxS hash-salted sub-stream fill - the "
        "allocation splits exactly across S shards (div + remainder "
        "discipline), docs kept while their (source, shard) "
        "sub-stream's prior tokens are under the shard quota; capped "
        "sources keep all their material, uncapped sources truncate "
        "at their equal share; one D-row allocator window + one "
        "broadcast + per-(source, shard) corpus windows",
    ),
    "token_budget_mix": QuerySpec(
        token_budget_mix, TOKEN_BUDGET_MIX_SQL,
        tags=("L4", "A2", "W3"), bench=True,
        doc="token-budget mixture executor (the data-recipe step): "
        "uniform per-domain token quotas filled EXACTLY by greedy "
        "deterministic hash-order fill, quota split across 8 "
        "hash-salted sub-streams per domain so parallelism is D*S "
        "instead of one sequential cumsum per domain; head domain "
        "truncates, tail domains keep all - both visible in the "
        "per-domain rollup; all floor-division exact integers",
    ),
    "lang_id_trained": QuerySpec(
        lang_id_trained, LANG_ID_TRAINED_SQL,
        tags=("L4", "A2", "W1", "J2"), bench=True,
        doc="trained K-class language-ID (fastText shape: linear on "
        "hashed char trigrams of a bounded 128-char prefix probe), "
        "one-vs-rest exact-integer gradient training with argmax "
        "prediction + per-doc agreement; oracle unrolls the K-class "
        "training loop as CTEs so the hash gate certifies weights, "
        "scores and predictions bit-for-bit; planted separable-corpus "
        "learning test in tests/test_pipeline_ops.py (driver-data "
        "accuracy is base-rate by construction - shared vocabulary)",
    ),
    "quality_pareto_lottery": QuerySpec(
        quality_pareto_lottery, QUALITY_PARETO_LOTTERY_SQL,
        tags=("L4", "A2", "F4"),
        doc="GPT-3's actual classifier-acceptance rule (Brown et al. "
        "2020 App. A): keep iff pareto(9) > 1 - score, rewritten via "
        "the inverse CDF as the exact-integer inequality "
        "u*(2000-s1k)^9 <= 2^20*1000^9 (decimal(38)/HUGEINT) on the "
        "trained classifier's scores - a transcendental-free Pareto "
        "draw derandomized by a content-independent hash; oracle "
        "nests the classifier's unrolled training CTEs + the lottery",
    ),
    "quality_classifier_scores": QuerySpec(
        quality_classifier_scores, QUALITY_CLASSIFIER_SCORES_SQL,
        tags=("L4", "A2", "J2"), bench=True,
        doc="trained quality classifier (GPT-3/Brown-style curation "
        "filter): linear probability model on hashed unigram+bigram "
        "buckets, THREE fixed full-batch gradient steps in exact "
        "integer arithmetic (squared loss — sigmoid's exp is "
        "cross-engine-unsafe; truncating division agrees in Spark/"
        "DuckDB/python); oracle unrolls the training loop as CTEs so "
        "the hash gate certifies training end-to-end. Driver-corpus "
        "label (lang=en) is signal-free by construction (shared "
        "vocabulary) — learning is certified by the planted "
        "separable-corpus pytest",
    ),
    "dsir_importance_sample": QuerySpec(
        dsir_importance_sample, DSIR_IMPORTANCE_SAMPLE_SQL,
        tags=("L4", "A2", "J2"), bench=True,
        doc="DSIR importance resampling (Xie et al. 2023): hashed "
        "unigram+bigram bucket counts, per-doc weight = sum of "
        "integer fixed-point log2 probability ratios "
        "(functions/intlog — engine-identical shift-and-square, no "
        "libm ln), Bernoulli thinning accept iff weight >= "
        "ilog2(md5-uniform) - 1920, i.e. P = min(1, 2^(w/64)); "
        "256-row score table broadcasts onto the occurrence stream",
    ),
    "source_overlap_jaccard": QuerySpec(
        source_overlap_jaccard, SOURCE_OVERLAP_JACCARD_SQL,
        tags=("L1", "L2", "A2"),
        doc="exact corpus-level shingle Jaccard between sources — "
        "crawl-overlap analytics; per-shingle source sets are "
        "source-count-bounded, one shuffle",
    ),
    "source_token_divergence": QuerySpec(
        source_token_divergence, SOURCE_TOKEN_DIVERGENCE_SQL,
        tags=("L4", "A2"), bench=True,
        doc="exact total-variation distance between per-source unigram "
        "distributions via integer cross-multiplication — mixture-drift "
        "analytics; only shared tokens expand into pairs",
    ),
    "novelty_score": QuerySpec(
        novelty_score, NOVELTY_SCORE_SQL, tags=("L4", "L1", "W1"),
        doc="per-document first-occurrence gram fraction (corpus novelty "
        "curation signal); one gram-keyed MIN window + per-doc rollup",
    ),
    "novelty_trend": QuerySpec(
        novelty_trend, NOVELTY_TREND_SQL, tags=("L4", "L1", "A2"),
        doc="novelty-decay curve by ingest decile (doc_id-range buckets, "
        "no global sort) — the diminishing-returns-of-more-data report",
    ),
    "pipeline_dataset_card": QuerySpec(
        pipeline_dataset_card, PIPELINE_DATASET_CARD_SQL,
        tags=("L4", "L1", "A2", "W1"),
        doc="per-source dataset card: volume, token counts, language "
        "share, marginal Gopher keep rate, exact-dup rate; every rate "
        "divides exact integers",
    ),
    "pipeline_curation_funnel": QuerySpec(
        pipeline_curation_funnel, PIPELINE_CURATION_FUNNEL_SQL,
        tags=("L4", "L1", "A2", "W1"),
        doc="per-source curation funnel: docs/tokens surviving the "
        "sequential quality -> exact-dedup -> decontamination stages; "
        "all decisions exact, fully oracled",
    ),
    "gopher_quality_filter": QuerySpec(
        gopher_quality_filter, GOPHER_QUALITY_FILTER_SQL,
        tags=("L4", "P5", "F1"),
        doc="Gopher curation rules (Rae et al. 2021) as per-rule boolean "
        "flags + composite keep; every ratio test is an integer "
        "cross-multiplication, zero float ops, single projection pass",
    ),
    "gopher_topgram_frac": QuerySpec(
        gopher_topgram_frac, GOPHER_TOPGRAM_FRAC_SQL,
        tags=("L4", "F6"),
        doc="Gopher repetition rule: top-n-gram char fraction (n=2,3,4) "
        "via zero-shuffle sorted-run mode per document; integer "
        "cross-multiplied keep thresholds 20/18/16%",
    ),
    "gopher_dupgram_coverage": QuerySpec(
        gopher_dupgram_coverage, GOPHER_DUPGRAM_COVERAGE_SQL,
        tags=("L4", "F6"), bench=True,
        doc="Gopher repetition rule: duplicated-n-gram char coverage "
        "(n=5..10, interval union over dup-gram starts) — zero-shuffle "
        "HOF sort/scatter per document; thresholds 15..10%",
    ),
    "corpus_shuffle_shards": QuerySpec(
        corpus_shuffle_shards, CORPUS_SHUFFLE_SHARDS_SQL,
        tags=("L4", "W1", "W3"),
        doc="deterministic global corpus shuffle into N training shards "
        "with per-shard positions and running token offsets; one hash "
        "exchange + the shard writer's own within-shard sort",
    ),
    "bm25_decontaminate": QuerySpec(
        bm25_decontaminate, BM25_DECONTAMINATE_SQL,
        tags=("L4", "L1", "J2", "W1"),
        doc="retrieval-based decontamination: each eval doc queries "
        "with its rarest tokens, top-5 train docs per eval doc by "
        "all-integer BM25 — the paraphrase-leakage audit companion "
        "to exact n-gram decontaminate",
    ),
    "bm25_retrieval": QuerySpec(
        bm25_retrieval, BM25_RETRIEVAL_SQL, tags=("L4", "J2", "W1"),
        doc="Okapi BM25 query-set retrieval: all-integer scaled "
        "scoring (k1=6/5, b=3/4), broadcast query terms + df, "
        "order-free bigint score sum, exact-oracled top-k",
    ),
    "tfidf_keywords": QuerySpec(
        tfidf_keywords, TFIDF_KEYWORDS_SQL, tags=("L4", "W1", "J2"),
        doc="top tf-idf terms per document, broadcast document-frequency",
    ),
    "quality_percentile_trim": QuerySpec(
        quality_percentile_trim, QUALITY_PERCENTILE_TRIM_SQL,
        tags=("L4", "A2", "P5"),
        doc="corpus-relative outlier trim via broadcast percentile bounds",
    ),
    "decontaminate_bloom": QuerySpec(
        decontaminate_bloom, DECONTAMINATE_SQL, tags=("L2", "L4", "J2"),
        doc="bloom-prefiltered decontamination; exact verify shares the oracle",
    ),
}

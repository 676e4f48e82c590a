"""Materialized end-to-end curation run — the composed pipeline a
real pretraining-data job executes, written through real sinks
(SURVEY.md §2.10d L4w; VERDICT r8 next-round #5).

Stages (sequential, each committed as a manifest-versioned parquet
table under ``dest_root`` before the next stage READS IT BACK from
the committed snapshot — so the test proves the operators compose
through the sink layer, not just through lazy lineage). With
``trained_stages=True`` (the default — the full GPT-3-style pipeline:
heuristics → trained filter → importance mixing → dedup → decon →
shards; VERDICT r9 next-round #4):

1. ``stage_quality``  — train docs (doc_id % 97 != 0, the funnel's
   eval split) passing the Gopher quality gate;
2. ``stage_trained``  — survivors kept by the TRAINED quality
   classifier (``quality_classifier_frame`` on the full corpus frame,
   the registry query's exact derivation — gate = its ``predicted``
   column);
3. ``stage_dsir``     — DSIR importance mixing: survivors the
   hash-derandomized Bernoulli accepts (``dsir_frame``'s ``accepted``
   column, same frame-level derivation as the oracled query);
4. ``stage_dedup``    — exact-dedup canonicals (min doc_id per
   sha256(text) WITHIN the prior survivors — the funnel's stage
   order);
5. ``stage_clean``    — doc-drop decontamination: survivors sharing
   no distinct 4-token gram with the eval set;
6. ``stage_excised``  — span-level cleaning of the remaining docs:
   character extents of eval text cut and the text rebuilt
   byte-exactly (the ``decontaminate_excise`` machinery with the SAME
   % 97 eval convention via ``_decon_runs``'s eval_pred — one eval
   set governs every decon tier of the run). Doc counts are
   unchanged by construction (excision cuts text, never drops docs),
   so stage-5 parity carries through;
7. ``stage_shards``   — deterministic shuffle-shard assignment of the
   cleaned corpus (``shard_assignments``), the layout a trainer
   streams.

With ``trained_stages=False`` stages 2–3 are skipped, and stages
1/4/5 implement exactly ``pipeline_curation_funnel``'s oracled stage
contracts, so the per-source survivor counts of the committed tables
must equal the funnel's numbers — asserted by tests/test_sinks.py on
the driver parquet, which is the composition proof. The trained
stages are parity-asserted against the two registry queries' own
frame outputs on the same corpus (same file), so every gate of the
7-stage run is pinned to an oracled derivation.

Scale notes: every stage is one of the individually scale-graded
registry operators applied to a committed table; the manifest sink
adds one distributed parquet write + a KB JSON commit per stage, and
the read-back is an explicit-file-list scan (no directory races).
The classifier trains on the FULL corpus frame (bounded 256-int model
state), then its broadcast-sized score map gates only the committed
quality survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    dest_root: str,
    trained_stages: bool = True,
    classifier_gate: str = "threshold",
    stopwords: str = "published",
    lang_gate: str = "trusted",
    lm_gate: str | None = None,
    sample_gate: str | None = None,
    pii_gate: str | None = None,
    pack_gate: bool = False,
    split_gate: str | None = None,
) -> dict[str, int]:
    """Execute the composed run; returns {stage_name: committed rows}.

    ``docs`` is the full corpus frame (doc_id, text, source, lang);
    eval docs (doc_id % 97 == 0) steer decontamination and are never
    part of any committed stage. ``trained_stages`` inserts the
    trained-classifier gate and DSIR importance mixing between the
    heuristic gate and dedup (the 7-stage GPT-3-style run);
    False runs the 5-stage heuristics-only form whose stages are the
    funnel's oracled contracts. ``classifier_gate`` picks the trained
    gate's acceptance rule: ``"threshold"`` keeps the classifier's
    ``predicted`` docs; ``"lottery"`` applies GPT-3's actual Pareto
    lottery (`pareto_lottery_frame`, the oracled
    `quality_pareto_lottery` derivation) so low scorers retain a
    heavy-tailed re-inclusion chance. ``stopwords`` picks the quality
    gate's stopword list: ``"published"`` (default) is Gopher's
    literature list; ``"corpus"`` derives the top-8 document-frequency
    head (`corpus_stopwords` over the TRAIN split only — the eval
    split leaks nothing into the stopword, lang-ID, or target-LM
    gates; the trained-classifier and DSIR stages, by contrast, are
    deliberately the registry queries' EXACT full-frame derivations,
    so eval docs do contribute to their feature statistics — callers
    needing a fully eval-blind run should pre-filter ``docs``) so the run
    executes NON-DEGENERATELY on raw corpora whose vocabulary does not
    overlap the published list -- the synthetic driver corpus needs no
    enrichment preamble in this mode (round-11; SCALING.md carries the
    raw-data timing row).

    Round-12 (VERDICT r11 #1 — the trained gates as STAGES, the
    CCNet/GPT-3 composition):

    ``lang_gate="trained"`` prepends ``stage_lang``: the corpus is
    RELABELED with `lang_id_trained_frame`'s argmax (trained on the
    train split only via its ``train_docs`` seam — the eval split
    steers nothing), and every downstream lang consumer — the DSIR /
    classifier target membership, the target-LM split — sees the
    trained labels instead of trusting the ingested ``lang`` column.
    The committed stage is the relabeled train split (a relabel, not a
    cut; parity-asserted against the frame derivation in
    tests/test_sinks.py).

    ``lm_gate="target"`` appends ``stage_lm`` after the mixing stages:
    `lm_target_score_frame` (trained on the TRAIN split's target-lang
    slice — leak-free) scores every train doc, the CCNet head/middle/
    tail convention (`ccnet_quality_buckets`' ntile(3) per source,
    score DESC, doc_id tie-break) buckets them, and the TAIL bucket is
    dropped — the CCNet "train on head, sample middle, drop tail" rule
    reduced to its filtering kernel. Bucketing runs over the full
    train split (a pure per-doc derivation, independent of earlier
    gates) so the cut is reproducible from the corpus alone.

    ``sample_gate="weighted"`` (round-13 — VERDICT r12 #8) appends
    ``stage_sample`` after dedup: the deduped survivors are
    SUBSAMPLED by the Efraimidis–Spirakis priority rule
    (`wrs_priority_frame` — the oracled `weighted_sample_topk`
    keying, w = token count), keeping the k = ⌈4/5 · |dedup|⌉
    lowest-priority docs via one TakeOrdered(k); deterministic,
    hash-derandomized, length-proportional selection — the committed
    form of the corpus-subsampling step a token-budget recipe runs
    between dedup and decontamination. Zero-token docs cannot be
    sampled (weight 0) and are cut. Parity-pinned in
    tests/test_sinks.py against an independent python replica of the
    priority rule (the 10-stage run).

    ``pii_gate="scrub"`` (round-14 — VERDICT r13 #3) inserts
    ``stage_pii`` between dedup(/sample) and decontamination — the
    C4/RefinedWeb order: email/phone/IPv4/credit-card token spans are
    detected and cut byte-exactly (the oracled ``pii_excise``
    machinery — `_pii_spans` + `_excise_rebuild` over the planted-
    contamination view, the streaming scrub sink's convention: the
    synthetic corpus carries no natural PII, so the plant is what
    makes the stage non-vacuous and its md5s verifiable). A scrub
    cuts text, never docs — committed rows == the prior stage's by
    construction — and the committed ``scrubbed_md5`` verifies the
    rebuilt bytes the way ``stage_excised``'s ``cleaned_md5`` does.
    Reference anchor: the CRM schema's PII columns
    (reference schemas/prospects.json emails/phones) are what makes
    this family REF-faithful.

    ``pack_gate=True`` (round-14 — VERDICT r13 #4) appends
    ``stage_packed`` after shards: the curated corpus's
    concat-and-chunk packing layout (`seq_packing_frame` — the
    oracled ``seq_packing_layout`` derivation with its per-shard
    exact prefix sums and Σ seq_first/Σ seq_last placement
    certificates) re-derived on the committed survivors — the layout
    a trainer actually consumes.

    ``split_gate="repair"`` (round-14 — the audit→action loop closed
    INSIDE the pipeline) commits ``stage_split`` after excision: the
    final corpus's train/val/test assignment with ZERO near-dup
    leakage by construction — the hash-derandomized 80/10/10 labels
    (`_split_labels`, the engine's split convention) with every
    near-dup CLUSTER (connected components over the oracled
    minhash-parity pair set of the EXCISED text — the corpus a model
    would actually see) reassigned to its min-id member's split (the
    `dedup_split_repair` keeper convention; exact dedup upstream
    removes identical texts, near-dups survive it and are exactly
    what leaks). One row per survivor: (doc_id, split, cluster_id —
    null for unclustered docs, changed).
    """
    from pyspark.sql.window import Window

    from ..queries.llm import _decon_runs, _excise_rebuild, _LDS_L
    from ..queries.pipeline import (
        _DECON_K, _EVAL_MOD, _gopher_flags, _grams, corpus_stopwords,
        dsir_frame, lang_id_trained_frame, pareto_lottery_frame,
        quality_classifier_frame, shard_assignments,
    )
    from ..queries.sqlplus import lm_target_score_frame
    from ..sinks.manifest import ManifestTable

    counts: dict[str, int] = {}

    def commit(name: str, df: DataFrame) -> DataFrame:
        t = ManifestTable(f"{dest_root}/{name}")
        t.overwrite(df)
        out = t.read(spark)
        counts[name] = out.count()
        return out

    is_eval = F.col("doc_id") % _EVAL_MOD == 0

    # 0 — optional trained lang-ID relabel: downstream lang consumers
    # (DSIR / classifier target membership, the target-LM split) see
    # the trained argmax, not the trusted ingested column. Training
    # uses the train split only (train_docs seam — no eval leak).
    active = docs
    if lang_gate == "trained":
        lid = lang_id_trained_frame(
            spark, docs, train_docs=docs.filter(~is_eval)
        )
        active = (
            docs.select("doc_id", "source", "text")
            .join(
                lid.select(
                    "doc_id", F.col("predicted_lang").alias("lang")
                ),
                "doc_id",
            )
            .select("doc_id", "source", "lang", "text")
        )
        train = commit("stage_lang", active.filter(~is_eval))
    elif lang_gate != "trusted":
        raise ValueError(f"unknown lang_gate: {lang_gate!r}")
    else:
        train = active.filter(~is_eval)

    # 1 — quality gate over the train split. The corpus-derived
    # stopword head is computed from the TRAIN split only: the eval
    # split (doc_id % _EVAL_MOD == 0) steers decontamination and must
    # leak no information — not even document frequencies — into the
    # gates applied to training data (round-12; ADVICE r11).
    sw = corpus_stopwords(train) if stopwords == "corpus" else None
    flags = (
        _gopher_flags(train, stopwords=sw) if sw else _gopher_flags(train)
    ).select("doc_id", "keep")
    survivors = commit(
        "stage_quality",
        train.select("doc_id", "source", "lang", "text")
        .join(flags, "doc_id")
        .filter("keep")
        .drop("keep"),
    )

    if trained_stages:
        # 2 — trained quality filter: the registry queries' exact
        # derivations on the FULL corpus frame (train happens once,
        # bounded model state), gating the committed survivors
        qc = quality_classifier_frame(active)
        if classifier_gate == "lottery":
            predicted = (
                pareto_lottery_frame(qc.select("doc_id", "score_scaled"))
                .filter("kept")
                .select("doc_id")
            )
        else:
            predicted = qc.filter("predicted").select("doc_id")
        survivors = commit(
            "stage_trained", survivors.join(predicted, "doc_id", "left_semi")
        )
        # 3 — DSIR importance mixing: hash-derandomized Bernoulli
        # acceptance toward the target distribution, same frame-level
        # derivation as the oracled query
        accepted = dsir_frame(active).filter("accepted").select("doc_id")
        survivors = commit(
            "stage_dsir", survivors.join(accepted, "doc_id", "left_semi")
        )

    if lm_gate == "target":
        # target-LM percentile cut (CCNet head/middle/tail): score the
        # full train split with the leak-free target-trained bigram
        # LM, ntile(3) per source (score DESC, doc_id tie-break — the
        # ccnet_quality_buckets convention), drop the tail bucket.
        # Docs the LM cannot score (< 2 tokens) have no bucket and are
        # cut — the documented < 2-token contract.
        scored = lm_target_score_frame(train)
        wlm = Window.partitionBy("source").orderBy(
            F.desc("target_lm_score"), F.asc("doc_id")
        )
        keep_lm = (
            train.select("doc_id", "source")
            .join(scored.select("doc_id", "target_lm_score"), "doc_id")
            .withColumn("bucket", F.ntile(3).over(wlm))
            .filter(F.col("bucket") <= 2)
            .select("doc_id")
        )
        survivors = commit(
            "stage_lm", survivors.join(keep_lm, "doc_id", "left_semi")
        )
    elif lm_gate is not None:
        raise ValueError(f"unknown lm_gate: {lm_gate!r}")

    # 4 — exact dedup among survivors (canonical = min doc_id per
    # sha256, the funnel's stage order)
    wq = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    dedup = commit(
        "stage_dedup",
        survivors.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .drop("rn"),
    )

    if sample_gate == "weighted":
        # weighted subsample of the deduped survivors: E-S priority
        # rule (the oracled weighted_sample_topk keying), keep the
        # 4/5·|dedup| lowest priorities — one TakeOrdered(k), no
        # global sort materialized
        from ..queries.pipeline import wrs_priority_frame

        k = -(-counts["stage_dedup"] * 4 // 5)  # ceil(4/5 · n)
        chosen = (
            wrs_priority_frame(dedup.select("doc_id", "text"), keep_cols=())
            .select("doc_id", "priority")
            .orderBy("priority", "doc_id")
            .limit(k)
            .select("doc_id")
        )
        dedup = commit(
            "stage_sample", dedup.join(chosen, "doc_id", "left_semi")
        )
    elif sample_gate is not None:
        raise ValueError(f"unknown sample_gate: {sample_gate!r}")

    if pii_gate == "scrub":
        # PII scrub as a committed stage (C4/RefinedWeb order: after
        # dedup, before decon). Detection + rebuild are the oracled
        # pii_excise machinery on the survivors' planted view; rows
        # are never dropped, text is cut, md5-verified.
        from ..queries.llm import _pii_cdocs, _pii_spans

        cdocs = _pii_cdocs(dedup.select("doc_id", "text"))
        pivls = _pii_spans(cdocs).select(
            "doc_id",
            F.col("span_start").alias("ivl_start"),
            (F.col("span_start") + F.col("span_len")).alias("ivl_end"),
        )
        scrubbed = _excise_rebuild(
            cdocs.withColumnRenamed("ctext", "text"),
            pivls,
            keep_text=True,
            count_ivls=True,
        )
        dedup = commit(
            "stage_pii",
            dedup.select("doc_id", "source", "lang")
            .join(scrubbed, "doc_id")
            .select(
                "doc_id",
                "source",
                "lang",
                F.col("text_clean").alias("text"),
                F.col("n_ivls").alias("n_pii_spans"),
                F.col("cleaned_md5").alias("scrubbed_md5"),
            ),
        ).select("doc_id", "source", "lang", "text")
    elif pii_gate is not None:
        raise ValueError(f"unknown pii_gate: {pii_gate!r}")

    # 3 — doc-drop decontamination (distinct 4-token grams vs the
    # eval set, broadcast — the funnel's decon contract)
    eval_grams = (
        docs.filter(is_eval)
        .select(F.explode(F.array_distinct(_grams("text", _DECON_K))).alias("gram"))
        .distinct()
    )
    leaky = (
        dedup.select(
            "doc_id",
            F.explode(F.array_distinct(_grams("text", _DECON_K))).alias("gram"),
        )
        .join(F.broadcast(eval_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    clean = commit("stage_clean", dedup.join(leaky, "doc_id", "left_anti"))

    # 4 — span-level excision of eval character extents from the
    # survivors (same % 97 eval set; doc count unchanged)
    combined = (
        docs.filter(is_eval)
        .select("doc_id", "text")
        .unionByName(clean.select("doc_id", "text"))
    )
    runs, _ = _decon_runs(combined, eval_pred=is_eval)
    ivls = runs.groupBy("doc_id", "ext_id").agg(
        F.min("pos").alias("ivl_start"),
        (F.max("pos") + _LDS_L).alias("ivl_end"),
    )
    rebuilt = _excise_rebuild(
        clean.select("doc_id", "text"), ivls, keep_text=True
    )
    excised = commit(
        "stage_excised",
        clean.select("doc_id", "source", "lang")
        .join(rebuilt, "doc_id")
        .select(
            "doc_id",
            "source",
            "lang",
            F.col("text_clean").alias("text"),
            "n_chars",
            "kept_chars",
            "cleaned_md5",
        ),
    )

    if split_gate == "repair":
        # leak-free split assignment of the final corpus: default
        # hash labels, near-dup clusters forced to one split (the
        # keeper's) — pairs computed on the EXCISED text, the bytes a
        # model trains on
        from ..dedup import cluster as _cluster
        from ..dedup import parity as _parity
        from ..queries.llm import _split_labels

        pairs = (
            _parity.minhash_pairs_parity(
                excised.select("doc_id", "text"), "doc_id", "text"
            )
            .select("id_a", "id_b")
            .localCheckpoint()
        )
        touched = (
            pairs.select(F.col("id_a").alias("doc_id"))
            .union(pairs.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        comps = _cluster.connected_components(
            pairs, touched, id_col="doc_id"
        )
        labels = _split_labels(excised.select("doc_id"))
        root = labels.select(
            F.col("id").alias("cluster_id"),
            F.col("split").alias("root_split"),
        )
        commit(
            "stage_split",
            labels.select(F.col("id").alias("doc_id"), "split")
            .join(comps, "doc_id", "left")
            .join(root, "cluster_id", "left")
            .select(
                "doc_id",
                F.coalesce("root_split", "split").alias("split"),
                "cluster_id",
                (
                    F.coalesce("root_split", "split") != F.col("split")
                ).alias("changed"),
            ),
        )
    elif split_gate is not None:
        raise ValueError(f"unknown split_gate: {split_gate!r}")

    # 5 — deterministic shuffle-shard layout of the cleaned corpus
    commit("stage_shards", shard_assignments(excised))

    if pack_gate:
        # 6 — packing layout of the curated corpus: the committed
        # survivors' concat-and-chunk placement (per-shard exact
        # prefix sums; Σ seq_first/Σ seq_last certify every per-doc
        # placement), re-derived on the EXCISED text — the byte-level
        # corpus a trainer streams
        from ..queries.pipeline import seq_packing_frame

        commit(
            "stage_packed",
            seq_packing_frame(excised.select("doc_id", "text")),
        )
    return counts

"""Materialized end-to-end curation run — the composed pipeline a
real pretraining-data job executes, written through real sinks
(SURVEY.md §2.10d L4w; VERDICT r8 next-round #5).

Stages (sequential, each committed as a manifest-versioned parquet
table under ``dest_root`` before the next stage READS IT BACK from
the committed snapshot — so the test proves the operators compose
through the sink layer, not just through lazy lineage):

1. ``stage_quality``  — train docs (doc_id % 97 != 0, the funnel's
   eval split) passing the Gopher quality gate;
2. ``stage_dedup``    — exact-dedup canonicals (min doc_id per
   sha256(text) WITHIN the quality survivors — the funnel's stage
   order);
3. ``stage_clean``    — doc-drop decontamination: survivors sharing
   no distinct 4-token gram with the eval set;
4. ``stage_excised``  — span-level cleaning of the remaining docs:
   character extents of eval text cut and the text rebuilt
   byte-exactly (the ``decontaminate_excise`` machinery with the SAME
   % 97 eval convention via ``_decon_runs``'s eval_pred — one eval
   set governs every decon tier of the run). Doc counts are
   unchanged by construction (excision cuts text, never drops docs),
   so stage-3 parity carries through;
5. ``stage_shards``   — deterministic shuffle-shard assignment of the
   cleaned corpus (``shard_assignments``), the layout a trainer
   streams.

Stages 1–3 implement exactly ``pipeline_curation_funnel``'s oracled
stage contracts, so the per-source survivor counts of the committed
tables must equal the funnel's numbers — asserted by
tests/test_sinks.py on the driver parquet, which is the composition
proof: if any stage's semantics drifted from the oracled query, the
funnel parity breaks.

Scale notes: every stage is one of the individually scale-graded
registry operators applied to a committed table; the manifest sink
adds one distributed parquet write + a KB JSON commit per stage, and
the read-back is an explicit-file-list scan (no directory races).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_curation(
    spark: SparkSession, docs: DataFrame, dest_root: str
) -> dict[str, int]:
    """Execute the composed run; returns {stage_name: committed rows}.

    ``docs`` is the full corpus frame (doc_id, text, source, lang);
    eval docs (doc_id % 97 == 0) steer decontamination and are never
    part of any committed stage.
    """
    from pyspark.sql.window import Window

    from ..queries.llm import _decon_runs, _excise_rebuild, _LDS_L
    from ..queries.pipeline import (
        _DECON_K, _EVAL_MOD, _gopher_flags, _grams, shard_assignments,
    )
    from ..sinks.manifest import ManifestTable

    counts: dict[str, int] = {}

    def commit(name: str, df: DataFrame) -> DataFrame:
        t = ManifestTable(f"{dest_root}/{name}")
        t.overwrite(df)
        out = t.read(spark)
        counts[name] = out.count()
        return out

    is_eval = F.col("doc_id") % _EVAL_MOD == 0

    # 1 — quality gate over the train split
    train = docs.filter(~is_eval)
    flags = _gopher_flags(train).select("doc_id", "keep")
    quality = commit(
        "stage_quality",
        train.select("doc_id", "source", "lang", "text")
        .join(flags, "doc_id")
        .filter("keep")
        .drop("keep"),
    )

    # 2 — exact dedup among quality survivors (canonical = min doc_id
    # per sha256, the funnel's stage order)
    wq = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    dedup = commit(
        "stage_dedup",
        quality.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .drop("rn"),
    )

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

    # 5 — deterministic shuffle-shard layout of the cleaned corpus
    commit("stage_shards", shard_assignments(excised))
    return counts

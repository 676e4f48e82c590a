"""Document file sources with corrupt-record quarantine (SURVEY.md
§2.1 S3/S6 scale path).

Training-data ingest reads crawl/dump files where SOME records are
always malformed — truncated JSON lines, mis-quoted CSV, encoding
damage. The reference's pandas coercion raised on the first bad value
(etl_tools.py:45-61), which at 100 TB means one bad record kills a
day's ingest. These readers follow the engine's declared-schema rule
(never infer — an inference pass over 100 TB of text is a full extra
scan) and use Spark's PERMISSIVE mode so malformed rows land in a
`_corrupt_record` column instead of failing the job:

- `read_documents_jsonl` / `read_documents_csv` — schema-declared scans
  with the corrupt column attached;
- `split_corrupt` — one pass, two frames: clean rows (corrupt column
  dropped) and a quarantine frame (raw line + file + a reason sketch)
  for the dead-letter sink;
- `corrupt_stats` — per-file counts, the ingest health metric a crawl
  pipeline alerts on.

Caching note: `split_corrupt` filters the SAME scan twice; Spark reads
the files twice unless the caller persists. That is the right default
at scale — corrupt rows are rare and a second scan of one ingest batch
is cheaper than caching it — and the scan is a file-source scan either
way, so both passes prune to the declared columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


_PARSE_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-declared JSONL scan; malformed lines fill only
    ``_corrupt_record``, nothing throws.

    Deliberately NOT ``spark.read.json``: the json reader's internal
    corrupt column may not be queried on its own
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — column pruning reduces a
    quarantine count() to exactly that), so parsing is an ordinary
    ``from_json`` expression over ``spark.read.text`` lines. Same
    PERMISSIVE semantics, but the corrupt column is a normal field the
    optimizer can prune or keep freely, and the text scan itself never
    needs re-reading cached."""
    raw = spark.read.text(path).withColumn("_file", F.input_file_name())
    # blank / whitespace-only lines (trailing-newline padding, blank
    # separators) are skipped outright: from_json('') yields a NULL
    # struct — not a corrupt record — so without this filter they
    # became all-null rows that split_corrupt classified as CLEAN,
    # injecting null documents into the corpus
    raw = raw.filter(F.length(F.trim(F.col("value"))) > 0)
    parsed = F.from_json(F.col("value"), DOCUMENT_SCHEMA, _PARSE_OPTS)
    return raw.select(parsed.alias("r"), "_file").select("r.*", "_file")


def read_documents_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """Schema-declared CSV scan with the same quarantine contract
    (``from_csv`` over text lines; single-line records)."""
    raw = spark.read.text(path).withColumn("_file", F.input_file_name())
    raw = raw.filter(F.length(F.trim(F.col("value"))) > 0)  # as in JSONL
    if header:
        # bare and quoted header renderings are dropped wherever they
        # appear (text() carries no line index, so "first line per
        # file" is not expressible). A data line cannot collide: its
        # first column must parse as a LONG doc_id, which the header
        # text never does — so the only residual is that an exotically
        # formatted header (spaces, partial quoting) surfaces as one
        # corrupt row for its file, visible in corrupt_stats rather
        # than silently skewing anything.
        fields = [
            f.name for f in DOCUMENT_SCHEMA.fields if f.name != CORRUPT_COL
        ]
        variants = [
            ",".join(fields),
            ",".join(f'"{n}"' for n in fields),
        ]
        raw = raw.filter(~F.col("value").isin(variants))
    parsed = F.from_csv(F.col("value"), DOCUMENT_SCHEMA.simpleString(), _PARSE_OPTS)
    return raw.select(parsed.alias("r"), "_file").select("r.*", "_file")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the bookkeeping columns;
    quarantined rows keep the raw record and its file for replay."""
    is_bad = F.col(CORRUPT_COL).isNotNull()
    clean = df.filter(~is_bad).drop(CORRUPT_COL, "_file")
    # quarantine must reference a parsed column too: Spark refuses a
    # file scan whose required schema is ONLY the corrupt column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the partially-parsed id
    # is genuinely useful for triage
    quarantine = df.filter(is_bad).select(
        F.col("_file").alias("source_file"),
        F.col("doc_id").alias("parsed_doc_id"),
        F.col(CORRUPT_COL).alias("raw_record"),
        F.length(CORRUPT_COL).alias("raw_len"),
    )
    return clean, quarantine


def corrupt_stats(df: DataFrame) -> DataFrame:
    """Per-file ingest health: total, corrupt, corrupt share."""
    bad = F.col(CORRUPT_COL).isNotNull().cast("long")
    return (
        df.groupBy(F.col("_file").alias("source_file"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("doc_id").alias("n_parsed_ids"),
            F.sum(bad).alias("n_corrupt"),
        )
        .withColumn(
            "corrupt_share",
            F.try_divide(F.col("n_corrupt").cast("double"), F.col("n_rows")),
        )
    )

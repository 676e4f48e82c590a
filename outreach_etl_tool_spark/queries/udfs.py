"""UDF/UDAF/UDTF surface demonstrations (SURVEY.md §2.11) + multimodal
decode queries (§2.10 L5).

The reference's "UDFs" are driver-side Python (flatten_json,
etl_tools.py:177-193; the dtype coercer, :45-61). The engine's
sanctioned slow path is Arrow-vectorized: scalar ``pandas_udf``
(UDF), ``applyInPandas`` grouped-map (UDAF analog), ``mapInPandas``
(UDTF analog). Rows-only in the driver gate per SURVEY.md §2.11 —
the point is the execution shape, which unit tests pin down.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..multimodal import decode_features, frame_sample, resize_images, with_media_meta
from ..operators.util import ensure_parallelism
from . import QuerySpec


# UDF (scalar pandas_udf): GLOBAL z-score of order totals. The moments
# are a one-row aggregate broadcast to every task, so the output is
# partition- and batch-size-independent (the per-batch version demoed a
# semantic trap: it changed under repartitioning).
#
# Oracle-exact float discipline: z-scores are scale-invariant, so the
# moments run over integer CENTS — round(price*100) is an exact
# integer-valued double (< 2^53), its square too, and the sums ride
# exact decimals. Spark's double→decimal cast goes through the
# shortest string representation (BigDecimal.valueOf) while DuckDB
# rounds the exact binary expansion, so casting NON-integer doubles to
# decimals diverges at high magnitude; integer-valued doubles convert
# identically. decimal→double is correctly-rounded in both engines,
# and everything after is the same IEEE expression on both sides.
@F.pandas_udf(T.DoubleType())
def _zscore(cents: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.Series:
    return (cents - mu) / sigma


def udf_scalar_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100)
    sums = orders.agg(
        F.sum(cents.cast("decimal(23,0)")).cast("double").alias("s1"),
        F.sum((cents * cents).cast("decimal(38,0)")).cast("double").alias("s2"),
        F.count("*").alias("n"),
    )
    mu = F.col("s1") / F.col("n")
    stats = sums.select(
        mu.alias("mu"),
        F.sqrt(F.col("s2") / F.col("n") - mu * mu).alias("sigma"),
    )
    return orders.crossJoin(F.broadcast(stats)).select(
        "o_orderkey",
        _zscore(cents, F.col("mu"), F.col("sigma")).alias("price_z"),
    )


UDF_SCALAR_ZSCORE_SQL = """
WITH s AS (
    SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(23,0))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) * ROUND(o_totalprice * 100)
                         AS DECIMAL(38,0))) AS DOUBLE) AS s2,
           COUNT(*) AS n
    FROM orders
), p AS (
    SELECT s1 / n AS mu, SQRT(s2 / n - (s1 / n) * (s1 / n)) AS sigma FROM s
)
SELECT o_orderkey, (ROUND(o_totalprice * 100) - mu) / sigma AS price_z
FROM orders, p
"""


# UDAF analog (applyInPandas grouped-map): per-nation min-max
# normalization of customer balances — the whole group is one pandas
# frame, the canonical "aggregate then transform within group" shape.
_NORM_SCHEMA = "c_custkey long, c_nationkey int, bal_norm double"


def _norm_group(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
    span = (hi - lo) or 1.0
    return pd.DataFrame(
        {
            "c_custkey": pdf["c_custkey"],
            "c_nationkey": pdf["c_nationkey"],
            "bal_norm": (pdf["c_acctbal"] - lo) / span,
        }
    )


def udf_grouped_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").applyInPandas(_norm_group, _NORM_SCHEMA)


# Oracle parity (round 8): every step is a SINGLE IEEE double op —
# (x − lo), (hi − lo), one division — and pandas min/max are exact
# comparisons, so the window-function mirror matches bit-for-bit.
# The `span or 1.0` constant-group guard maps to the CASE.
UDF_GROUPED_NORM_SQL = """
SELECT c_custkey, c_nationkey,
       (c_acctbal - MIN(c_acctbal) OVER w)
       / (CASE WHEN MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w = 0
               THEN 1.0
               ELSE MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w
          END) AS bal_norm
FROM customer
WINDOW w AS (PARTITION BY c_nationkey)
"""


# UDTF analog (mapInPandas): batch iterator in, differently-shaped batch
# iterator out — here a token-explode returning multiple rows per doc.
_TOKENS_SCHEMA = "doc_id long, token string"


def _explode_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, toks = [], []
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            for tok in str(text).split()[:20]:
                ids.append(did)
                toks.append(tok)
        yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "token": toks})


def udf_map_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "text").mapInPandas(
        _explode_tokens, _TOKENS_SCHEMA
    )


# the python kernel is whitespace-split + head(20): both are exactly
# SQL-expressible, so the mapInPandas demo carries a full oracle
UDF_MAP_TOKENS_SQL = r"""
SELECT doc_id,
       UNNEST(list_slice(regexp_extract_all(text, '\S+'), 1, 20)) AS token
FROM documents
"""


# L5 — multimodal decode over a synthesized binary payload (documents
# text re-encoded; the testdata ships no real media). Plumbing is real:
# Arrow batches, histogram kernel, typed feature arrays.
#
# Registry contract: the driver's rows-only comparator hashes rows via
# pandas, which cannot hash list values — so the registry surface
# reduces the 16-bin histogram to SCALAR summaries (entropy, max-bin
# mass, dominant bin). The array form stays available as the library
# function ``decode_features``; the reduction is a 16-element HOF fold,
# negligible next to the Arrow decode pass.
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = decode_features(assets)
    h = F.col("feature")
    nonzero = F.filter(h, lambda p: p > F.lit(0.0))
    entropy = -F.aggregate(
        nonzero, F.lit(0.0), lambda acc, p: acc + p * F.log(p)
    )
    return feats.select(
        "asset_id",
        "media_type",
        "n_bytes",
        F.round(entropy, 9).alias("hist_entropy"),
        F.round(F.array_max(h), 9).alias("hist_max"),
        F.array_position(h, F.array_max(h)).alias("hist_argmax"),
    )


# L5 — resize: block-mean downsample behind the stubbed codec; emits
# (asset_id, width, height, pixels) with degenerate assets nulled.
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return resize_images(assets, out_w=8, out_h=8)


# L5×L2 — perceptual-hash image near-dup: decode (stub) → 8×8
# block-mean → aHash64 → banded Hamming pairs. Identical payloads are
# guaranteed Hamming-0 pairs, so the exact-dup documents in the corpus
# surface as image dups of their synthesized assets.
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.phash import phash_near_dup

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return phash_near_dup(assets, max_hamming=3)


# L5b — REAL codec round-trip, exact-oracled: synthesize a deterministic
# gradient PPM per document (geometry and pixel values are closed-form
# in doc_id), encode to actual binary P6 bytes, decode with the pure-
# numpy codec (multimodal/ppm.py), and report per-channel pixel means.
# The oracle computes the same statistics analytically from the
# generative formula — so a hash match proves the codec reproduces
# every pixel bit-exactly through the encode→decode round trip, not
# just that plumbing ran. Each mean is an exact integer sum divided
# once (IEEE-identical in both engines). Arrow batches only; payloads
# never leave the executor.
_PPM_H = 12
_PPM_SCHEMA = (
    "asset_id long, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def _gen_decode_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..multimodal.ppm import decode_ppm, encode_ppm

    for pdf in batches:
        out = {k: [] for k in (
            "asset_id", "width", "height", "mean_r", "mean_g", "mean_b"
        )}
        for aid in pdf["asset_id"]:
            aid = int(aid)
            w = 16 + aid % 8
            y, x = np.mgrid[0:_PPM_H, 0:w]
            img = np.stack(
                [(x * 31 + y * 7 + aid * 13 + c * 97) % 256 for c in range(3)],
                axis=-1,
            ).astype(np.uint8)
            dec = decode_ppm(encode_ppm(img))  # the actual round trip
            sums = dec.reshape(-1, 3).astype(np.int64).sum(axis=0)
            out["asset_id"].append(aid)
            out["width"].append(w)
            out["height"].append(_PPM_H)
            for i, ch in enumerate(("mean_r", "mean_g", "mean_b")):
                out[ch].append(float(sums[i]) / (w * _PPM_H))
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(out["asset_id"], dtype="int64"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "mean_r": out["mean_r"],
                "mean_g": out["mean_g"],
                "mean_b": out["mean_b"],
            }
        )


def multimodal_ppm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return docs.select(F.col("doc_id").alias("asset_id")).mapInPandas(
        _gen_decode_ppm, _PPM_SCHEMA
    )


MULTIMODAL_PPM_ROUNDTRIP_SQL = f"""
WITH d AS (SELECT doc_id AS asset_id, 16 + doc_id % 8 AS w FROM documents),
px AS (
  SELECT asset_id, w, xx.x AS x, yy.y AS y
  FROM d, UNNEST(generate_series(0, w - 1)) AS xx(x),
          UNNEST(generate_series(0, {_PPM_H} - 1)) AS yy(y)
)
SELECT asset_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST({_PPM_H} AS INTEGER) AS height,
       CAST(SUM((x*31 + y*7 + asset_id*13 + 0) % 256) AS DOUBLE)
           / (MAX(w) * {_PPM_H}) AS mean_r,
       CAST(SUM((x*31 + y*7 + asset_id*13 + 97) % 256) AS DOUBLE)
           / (MAX(w) * {_PPM_H}) AS mean_g,
       CAST(SUM((x*31 + y*7 + asset_id*13 + 194) % 256) AS DOUBLE)
           / (MAX(w) * {_PPM_H}) AS mean_b
FROM px
GROUP BY asset_id
"""


# L5c — REAL audio codec round-trip, exact-oracled (the WAV analogue
# of multimodal_ppm_roundtrip): synthesize a deterministic PCM16
# waveform per document (sample values closed-form in asset_id),
# encode to actual RIFF/WAVE bytes, decode with the pure-numpy codec
# (multimodal/wav.py), and report exact amplitude statistics. A hash
# match proves every sample survives the encode→decode round trip
# bit-exactly. Mean amplitude is an exact integer sum divided once.
_WAV_SCHEMA = (
    "asset_id long, n_samples int, channels int, "
    "sample_rate int, mean_amp double, peak bigint"
)


def _gen_decode_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..multimodal.wav import decode_wav, encode_wav

    for pdf in batches:
        out = {k: [] for k in (
            "asset_id", "n_samples", "channels", "sample_rate",
            "mean_amp", "peak",
        )}
        for aid in pdf["asset_id"]:
            aid = int(aid)
            n, ch = 256 + aid % 64, 1 + aid % 2
            i, c = np.mgrid[0:n, 0:ch]
            wave = ((i * 37 + aid * 11 + c * 101) % 4096 - 2048).astype(
                np.int16
            )
            dec, sr = decode_wav(encode_wav(wave, 16000))  # the round trip
            s = dec.astype(np.int64)
            out["asset_id"].append(aid)
            out["n_samples"].append(n)
            out["channels"].append(ch)
            out["sample_rate"].append(sr)
            out["mean_amp"].append(float(s.sum()) / (n * ch))
            out["peak"].append(int(np.abs(s).max()))
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(out["asset_id"], dtype="int64"),
                "n_samples": pd.Series(out["n_samples"], dtype="int32"),
                "channels": pd.Series(out["channels"], dtype="int32"),
                "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                "mean_amp": out["mean_amp"],
                "peak": pd.Series(out["peak"], dtype="int64"),
            }
        )


def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return docs.select(F.col("doc_id").alias("asset_id")).mapInPandas(
        _gen_decode_wav, _WAV_SCHEMA
    )


MULTIMODAL_WAV_ROUNDTRIP_SQL = """
WITH d AS (
  SELECT doc_id AS asset_id, 256 + doc_id % 64 AS n, 1 + doc_id % 2 AS ch
  FROM documents
), px AS (
  SELECT asset_id, n, ch, ii.i AS i, cc.c AS c
  FROM d, UNNEST(generate_series(0, n - 1)) AS ii(i),
          UNNEST(generate_series(0, ch - 1)) AS cc(c)
)
SELECT asset_id,
       CAST(MAX(n) AS INTEGER) AS n_samples,
       CAST(MAX(ch) AS INTEGER) AS channels,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(SUM((i*37 + asset_id*11 + c*101) % 4096 - 2048) AS DOUBLE)
           / (MAX(n) * MAX(ch)) AS mean_amp,
       CAST(MAX(ABS((i*37 + asset_id*11 + c*101) % 4096 - 2048)) AS BIGINT)
           AS peak
FROM px
GROUP BY asset_id
"""


# L5d — audio near-dup fingerprint, FULLY ORACLED (round-12; VERDICT
# r11 #6 — completes the multimodal dedup family alongside phash).
# Deterministic clips (closed-form in asset_id; aid%10==1 assets are
# planted near-duplicates of aid-1 with a sparse +1 perturbation) ride
# the REAL WAV codec round trip, reduce to a 62-bit integer
# energy-envelope + autocorrelation-sign fingerprint
# (multimodal/afp.py), and pair via the shared 4×16-band Hamming
# machinery. The oracle recomputes every fingerprint bit-exactly in
# SQL from the generative formula and takes the BRUTE-FORCE O(n²)
# hamming join — the banded join's pigeonhole recall guarantee at
# Hamming ≤ 3 makes the two answers IDENTICAL, so the oracle
# certifies fingerprint bits, codec transparency, candidate recall,
# and popcount verification in one hash.
def multimodal_audio_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.afp import audio_near_dup

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    ids = docs.select(F.col("doc_id").alias("asset_id"))
    return (
        audio_near_dup(ids, max_hamming=3)
        .select(
            "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
        )
        .orderBy("id_a", "id_b")
    )


# Shared fingerprint-derivation CTE chain (recomputes every afp bit
# from the documents table alone) — consumed by the batch near-dup
# oracle below and the streaming audio dedup-ingest oracle
# (queries/streamingq.py, round-13).
AFP_FP_CTES = """d AS (
  SELECT doc_id AS aid,
         CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS b,
         (doc_id % 10 = 1) AS pert
  FROM documents
), px AS (
  SELECT aid, i, s,
         (((t*t + 3*t) % 1000003) % 97)
           * (((i * (1 + 2*(((t*t*5 + t*11) % 1000003) % 32)) + b) % 64)
              - 32)
           + CASE WHEN pert AND i % 127 = 0 THEN 1 ELSE 0 END AS x
  FROM (SELECT aid, b, pert, ii.i AS i, (ii.i // 32) AS s,
               (b*97 + (ii.i // 32)) % 1000003 AS t
        FROM d, UNNEST(generate_series(0, 991)) AS ii(i))
), nx AS (
  SELECT aid, s, i, x,
         LEAD(x) OVER (PARTITION BY aid ORDER BY i) AS xn
  FROM px
), seg AS (
  SELECT aid, s,
         SUM(ABS(x)) AS e,
         SUM(CASE WHEN i % 32 <> 31 THEN x * xn ELSE 0 END) AS a
  FROM nx GROUP BY aid, s
), tot AS (
  SELECT aid, SUM(e) AS te FROM seg GROUP BY aid
), fp AS (
  SELECT seg.aid,
         SUM(CASE WHEN seg.e * 31 > tot.te
                  THEN (CAST(1 AS BIGINT) << CAST(seg.s AS INTEGER))
                  ELSE 0 END)
       + SUM(CASE WHEN seg.a > 0
                  THEN (CAST(1 AS BIGINT) << CAST(31 + seg.s AS INTEGER))
                  ELSE 0 END) AS afp
  FROM seg JOIN tot USING (aid) GROUP BY seg.aid
)"""

MULTIMODAL_AUDIO_FP_DEDUP_SQL = f"""
WITH {AFP_FP_CTES}
SELECT a.aid AS id_a, b.aid AS id_b,
       CAST(bit_count(xor(a.afp, b.afp)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.aid < b.aid
WHERE bit_count(xor(a.afp, b.afp)) <= 3
ORDER BY id_a, id_b
"""


# L5 — frame sampling: UDTF-shaped fan-out of fixed-size frames.
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return (
        frame_sample(assets, frame_bytes=64, every_nth=2)
        .groupBy("asset_id")
        .agg(F.count("*").alias("n_frames"))
    )


# UDAF2 — exponentially-weighted moving average per user over event
# time: the canonical NON-ASSOCIATIVE recurrence (y_i = α·x_i +
# (1−α)·y_{i−1}) that no built-in Spark aggregate or window frame can
# express — partial aggregation requires associativity, and a window
# frame can't reference its own previous OUTPUT. The sanctioned escape
# is grouped-map applyInPandas: one Arrow batch per user, the
# recurrence folded inside the kernel. α = 1/2 and the EXPLICIT
# ``(x + y)/2`` formulation make every step one IEEE add + one exact
# halving — written out rather than delegated to pandas.ewm, whose
# internal weighting formula is not guaranteed to round identically —
# so the DuckDB recursive-CTE oracle (same expression, same order by
# the (ts, event_id) total order) reproduces it bit-for-bit: the rare
# EXACT oracle for an iterative per-key recurrence. The kernel is
# additionally pinned against a scalar reference fold in
# tests/test_operators.py.
#
# Scale shape: one exchange on user_id; per-group state is the group
# itself (bounded by events-per-user), nothing crosses the driver.
# The oracle's recursion depth is max-events-per-user — fine at gate
# scale, pure validation machinery (the Spark side IS the scale path).
_EWMA_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, value double, ewma double"
)


def _ewma_group(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    vals = pdf["value"].to_numpy(dtype="float64")
    ewma = np.empty_like(vals)
    y = 0.0
    for i, x in enumerate(vals):
        y = x if i == 0 else (x + y) / 2
        ewma[i] = y
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "ts": pdf["ts"],
            "value": pdf["value"],
            "ewma": ewma,
        }
    )


def _ewma_frame(
    spark: SparkSession, sf_dir: str, sampled: bool
) -> DataFrame:
    events = ensure_parallelism(load_table(spark, sf_dir, "events"))
    out = (
        events.select("event_id", "user_id", "ts", "value")
        # explicit null policy, mirrored in the oracle: a null value
        # would otherwise ride as NaN through Arrow (poisoning the
        # fold) while SQL propagates NULL — divergent representations
        # of the same absence
        .filter(F.col("value").isNotNull())
    )
    if sampled:
        # deterministic 1-in-5 user cohort (mirrored in the sampled
        # oracle): the EWMA recurrence is per-user, so a key-sampled
        # cohort exercises identical semantics with a 5× smaller
        # recursive-CTE oracle frame — registered under its own name
        # so the full-corpus contract of ewma_smooth never silently
        # narrows (round-8 advice)
        out = out.filter(F.col("user_id") % 5 == 0)
    return out.groupBy("user_id").applyInPandas(_ewma_group, _EWMA_SCHEMA)


def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus per-user EWMA (the round-6 contract)."""
    return _ewma_frame(spark, sf_dir, sampled=False)


def ewma_smooth_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-in-5 user-cohort EWMA — the cheap-oracle variant."""
    return _ewma_frame(spark, sf_dir, sampled=True)


def _ewma_sql(where_extra: str) -> str:
    return f"""
WITH RECURSIVE ordered AS (
    SELECT event_id, user_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
    WHERE value IS NOT NULL{where_extra}
), walk AS (
    SELECT event_id, user_id, ts, value, value AS ewma, rn
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.event_id, o.user_id, o.ts, o.value,
           (o.value + w.ewma) / 2 AS ewma, o.rn
    FROM walk w
    JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1
)
SELECT event_id, user_id, ts, value, ewma FROM walk
"""


EWMA_SMOOTH_SQL = _ewma_sql("")
EWMA_SMOOTH_SAMPLED_SQL = _ewma_sql(" AND user_id % 5 = 0")


# UDTF3 — mapInArrow: the zero-pandas Arrow escape. Batches arrive as
# raw pyarrow RecordBatches and the kernel runs pyarrow.compute —
# skipping the Arrow→pandas→Arrow conversion entirely, which is the
# right tier when the kernel is itself expressible in Arrow compute
# (string/bytes ops over huge batches; pandas adds a copy and dtype
# coercions for nothing). Exact-oracled: utf8_length counts
# codepoints, same as LENGTH in Spark SQL and DuckDB.
def _arrow_len_kernel(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(0),
                pc.cast(pc.utf8_length(batch.column(1)), pa.int64()),
            ],
            ["doc_id", "n_chars_arrow"],
        )


def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", "text")
        .mapInArrow(_arrow_len_kernel, "doc_id long, n_chars_arrow long")
        .orderBy("doc_id")
    )


UDF_MAP_ARROW_SQL = """
SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars_arrow
FROM documents
ORDER BY doc_id
"""


# UDAF3 — GROUPED_AGG pandas_udf: the fourth Arrow UDF flavor (scalar
# / grouped-map / map-iter being the other three), and the only one
# Spark accepts INSIDE a window frame as a custom aggregate. The
# kernel computes a quantity-weighted mean price over exact integer
# sums (cents × integral quantity — int64 sums are order-free, so the
# result is partition-order independent and the DuckDB SUM/SUM mirror
# is bit-exact; same float discipline as udf_scalar_zscore, with
# half-up rounding spelled out because np.round is banker's).
def _wavg_kernel(price: pd.Series, qty: pd.Series) -> float:
    import numpy as np

    p = np.floor(price.to_numpy(dtype="float64") * 100 + 0.5).astype("int64")
    q = np.floor(qty.to_numpy(dtype="float64") + 0.5).astype("int64")
    den = int(q.sum())
    if den == 0:
        return float("nan")
    return float(int((p * q).sum())) / float(den) / 100


def udf_grouped_agg_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    wavg = F.pandas_udf(_wavg_kernel, "double")
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    # NOTE: Spark forbids mixing a GROUPED_AGG pandas UDF with
    # JVM aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT) —
    # so the aggregate list is UDF-only
    return (
        li.groupBy("l_returnflag")
        .agg(wavg("l_extendedprice", "l_quantity").alias("wavg_price"))
        .orderBy("l_returnflag")
    )


UDF_GROUPED_AGG_WAVG_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS DOUBLE)
       / CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS DOUBLE)
       / 100 AS wavg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# UDTF2 — a REAL Python UDTF (Spark 4 `udtf` decorator + LATERAL
# join), the typed successor of the mapInPandas fan-out demoed by
# udf_map_tokens: the planner sees a declared row schema and a
# per-input-row generator, so the lateral fan-out composes with
# Catalyst (column pruning through the UDTF, no whole-frame schema
# smuggling). Tokenization is plain `split(' ')` with empties kept —
# the one convention DuckDB's string_split shares bit-for-bit, which
# is what makes THIS Python-table-function oracled while
# udf_map_tokens stays rows-only. Scale shape: one Arrow-batched
# Python stage inheriting the scan's partitioning, zero shuffles
# before the determinism sort.
def _make_token_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string", useArrow=True)
    class TokenEmitter:
        def eval(self, text: str):
            if text is not None:
                for i, tok in enumerate(text.split(" ")):
                    yield i, tok

    return TokenEmitter


def udtf_lateral_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    spark.udtf.register("token_emitter", _make_token_udtf())
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.tok,
               CAST(LENGTH(t.tok) AS BIGINT) AS tok_len
        FROM udtf_docs_v d, LATERAL token_emitter(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


UDTF_LATERAL_TOKENS_SQL = """
WITH fanout AS (
    SELECT doc_id, text,
           unnest(generate_series(1, len(string_split(text, ' ')))) AS k
    FROM documents
)
SELECT doc_id,
       CAST(k - 1 AS INTEGER) AS pos,
       list_extract(string_split(text, ' '), k) AS tok,
       LENGTH(list_extract(string_split(text, ' '), k)) AS tok_len
FROM fanout
ORDER BY doc_id, pos
"""


# ---------------------------------------------------------------------------
# MULTIMODAL DECODE CERTIFICATE — oracled check for the rows-only
# multimodal family (the graph_kcore_check pattern). The three Arrow
# kernels (decode_features / resize_images / frame_sample) are
# rows-only because their outputs carry arrays/binary, but every
# kernel is a DETERMINISTIC function of the utf-8 payload bytes, so
# their per-asset invariants are derivable from the documents table:
#
#   * decode leg — VALUE-LEVEL: the 16-bin byte histogram's scalar
#     summaries are recomputed in pure Spark SQL from the text's
#     character codes (payloads are single-byte here — a data-derived
#     anchor counts multi-byte docs, excluded from the leg) and folded
#     with the SAME HOF/log/round expressions as multimodal_decode, so
#     agreement is bit-exact; sniff type and n_bytes join in;
#   * resize leg — DIMENSION invariants of the stub grid codec: side =
#     floor(sqrt(n_bytes)); side >= 8 ⇒ (8, 8, 64 pixel bytes),
#     side < 8 ⇒ (0, 0, null) — per-asset, every row checked;
#   * frames leg — exact ACCOUNTING of the frame_sample kernel at the
#     registry configuration (frame_bytes=64, every_nth=2; the
#     multimodal_frames query is a count rollup of the same kernel):
#     kept-frame count m = (nf+1)//2 with nf = max(1, ceil(nb/64)),
#     frame_idx sum = m(m-1) (the even ladder), and total frame bytes
#     = 64(m-1) + min(64, nb-128(m-1)) (all kept frames before the
#     last are full — proof: kept k < 2(m-1) ⇒ k+1 <= nf-1 ⇒ the
#     window ends inside the payload).
#
# The oracle derives the anchors (asset/byte totals, small-asset and
# frame counts) from the same formulas over documents and pins every
# violation leg at 0 — fail-loud: a drifting kernel hash-mismatches
# the driver gate. The PIXEL-exactness of the real codecs is already
# oracled separately (ppm_roundtrip / wav_roundtrip); this check
# covers the three batch kernels the Pillow gate leaves rows-only.
# ---------------------------------------------------------------------------
def multimodal_decode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    nb = F.length(F.encode("text", "utf-8"))
    ascii_only = nb == F.length("text")
    # Spark-SQL histogram recomputation (JVM, independent of numpy):
    # counts per bin b = #chars with ascii(ch) // 16 == b, normalized
    # by n_bytes — same integers, same single IEEE division as
    # np.histogram(...) / size, then the IDENTICAL fold/round
    # expressions as multimodal_decode.
    chars = F.split("text", "")
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda b: F.size(
            F.filter(chars, lambda ch: F.floor(F.ascii(ch) / 16) == b)
        ),
    )
    h = F.transform(counts, lambda c: c.cast("double") / nb.cast("double"))
    nonzero = F.filter(h, lambda p: p > F.lit(0.0))
    entropy = -F.aggregate(
        nonzero, F.lit(0.0), lambda acc, p: acc + p * F.log(p)
    )
    expect = docs.select(
        F.col("doc_id").alias("asset_id"),
        nb.cast("long").alias("e_bytes"),
        ascii_only.alias("e_ascii"),
        F.round(entropy, 9).alias("e_entropy"),
        F.round(F.array_max(h), 9).alias("e_max"),
        F.array_position(h, F.array_max(h)).alias("e_argmax"),
        # resize stub-grid expectations
        (nb >= 64).alias("e_big"),
        # frames accounting: nf = max(1, ceil(nb/64)), m = (nf+1)//2
        F.expr(
            "greatest(1, (length(encode(text, 'utf-8')) + 63) div 64)"
        ).alias("e_nf"),
    ).withColumn("e_m", F.expr("(e_nf + 1) div 2")).localCheckpoint()

    dec = multimodal_decode(spark, sf_dir)
    d = dec.join(expect, "asset_id")
    dec_legs = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("e_bytes").cast("bigint").alias("total_bytes"),
        F.sum(
            F.when(F.col("media_type") != "application/octet-stream", 1)
            .otherwise(0)
        ).cast("bigint").alias("n_sniff_mismatch"),
        F.sum(F.when(F.col("n_bytes") != F.col("e_bytes"), 1).otherwise(0))
        .cast("bigint").alias("n_nbytes_mismatch"),
        F.sum(
            F.when(
                F.col("e_ascii")
                & (
                    (F.col("hist_entropy") != F.col("e_entropy"))
                    | (F.col("hist_max") != F.col("e_max"))
                    | (F.col("hist_argmax") != F.col("e_argmax"))
                ),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_hist_mismatch"),
        F.sum(F.when(~F.col("e_ascii"), 1).otherwise(0))
        .cast("bigint").alias("n_multibyte_assets"),
    )

    rs = multimodal_resize(spark, sf_dir).join(expect, "asset_id")
    ok_big = (
        (F.col("width") == 8)
        & (F.col("height") == 8)
        & (F.length("pixels") == 64)
    )
    ok_small = (
        (F.col("width") == 0)
        & (F.col("height") == 0)
        & F.col("pixels").isNull()
    )
    resize_legs = rs.agg(
        F.sum(
            F.when(
                (F.col("e_big") & ~ok_big) | (~F.col("e_big") & ~ok_small), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_resize_shape_violations"),
        F.sum(F.when(~F.col("e_big"), 1).otherwise(0))
        .cast("bigint").alias("n_resize_small_assets"),
    )

    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    fr = (
        frame_sample(assets, frame_bytes=64, every_nth=2)
        .groupBy("asset_id")
        .agg(
            F.count(F.lit(1)).alias("m_actual"),
            F.sum("frame_idx").alias("idx_sum"),
            F.sum(F.length("frame")).alias("bytes_actual"),
        )
        .join(expect, "asset_id")
    )
    e_total = (
        F.lit(64) * (F.col("e_m") - 1)
        + F.least(
            F.lit(64), F.col("e_bytes") - F.lit(128) * (F.col("e_m") - 1)
        )
    )
    frame_legs = fr.agg(
        F.sum("m_actual").cast("bigint").alias("n_frames_total"),
        F.sum(
            F.when(
                (F.col("m_actual") != F.col("e_m"))
                | (F.col("idx_sum") != F.col("e_m") * (F.col("e_m") - 1))
                | (F.col("bytes_actual") != e_total),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_frame_accounting_violations"),
    )
    return dec_legs.crossJoin(resize_legs).crossJoin(frame_legs)


MULTIMODAL_DECODE_CHECK_SQL = """
WITH base AS (
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS nb
    FROM documents
), fr AS (
    SELECT nb,
           (GREATEST(1, (nb + 63) // 64) + 1) // 2 AS m
    FROM base
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_assets,
       (SELECT CAST(SUM(nb) AS BIGINT) FROM base) AS total_bytes,
       CAST(0 AS BIGINT) AS n_sniff_mismatch,
       CAST(0 AS BIGINT) AS n_nbytes_mismatch,
       CAST(0 AS BIGINT) AS n_hist_mismatch,
       (SELECT CAST(SUM(CASE WHEN OCTET_LENGTH(ENCODE(text)) <> LENGTH(text)
                             THEN 1 ELSE 0 END) AS BIGINT) FROM documents)
           AS n_multibyte_assets,
       CAST(0 AS BIGINT) AS n_resize_shape_violations,
       (SELECT CAST(SUM(CASE WHEN nb < 64 THEN 1 ELSE 0 END) AS BIGINT)
        FROM base) AS n_resize_small_assets,
       (SELECT CAST(SUM(m) AS BIGINT) FROM fr) AS n_frames_total,
       CAST(0 AS BIGINT) AS n_frame_accounting_violations
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_decode_check": QuerySpec(
        multimodal_decode_check, MULTIMODAL_DECODE_CHECK_SQL,
        tags=("L5", "A1", "F6"),
        doc="oracled certificate for the rows-only multimodal batch "
        "kernels: decode's histogram summaries recomputed bit-exactly "
        "in pure Spark SQL from character codes, resize's stub-grid "
        "dimension contract per asset, frame_sample's exact count/"
        "index/byte accounting - anchors data-derived, violation legs "
        "pinned 0 (a drifting kernel hash-mismatches the driver gate)",
    ),
    "multimodal_audio_fp_dedup": QuerySpec(
        multimodal_audio_fp_dedup, MULTIMODAL_AUDIO_FP_DEDUP_SQL,
        tags=("L5", "L2", "UDTF"),
        doc="audio near-dup: 62-bit integer energy-envelope + "
        "autocorrelation-sign fingerprint over the REAL WAV codec "
        "round trip, banded-Hamming pairs; fully oracled - the SQL "
        "recomputes every fingerprint bit-exactly from the generative "
        "clip formula and brute-forces the hamming join, which the "
        "banded join's pigeonhole recall guarantee must equal exactly; "
        "planted near-dup clips (aid%10==1 perturbs aid-1) pin recall",
    ),
    "udf_map_arrow": QuerySpec(
        udf_map_arrow, UDF_MAP_ARROW_SQL, tags=("UDTF", "F1"),
        doc="mapInArrow: raw RecordBatch kernel via pyarrow.compute "
        "(no pandas hop), exact-oracled",
    ),
    "udf_grouped_agg_wavg": QuerySpec(
        udf_grouped_agg_wavg, UDF_GROUPED_AGG_WAVG_SQL, tags=("UDAF", "A2"),
        doc="GROUPED_AGG pandas_udf (window-capable custom aggregate): "
        "exact weighted mean, oracle-paired",
    ),
    "udtf_lateral_tokens": QuerySpec(
        udtf_lateral_tokens, UDTF_LATERAL_TOKENS_SQL, tags=("UDTF", "F1"),
        doc="Spark 4 Python UDTF + LATERAL join tokenizer, exact-oracled",
    ),
    "ewma_smooth": QuerySpec(
        ewma_smooth, EWMA_SMOOTH_SQL, tags=("UDAF", "W2", "T6"),
        doc="per-user EWMA: non-associative recurrence via applyInPandas, "
        "exact-oracled by a recursive CTE (full corpus)",
    ),
    "ewma_smooth_sampled": QuerySpec(
        ewma_smooth_sampled, EWMA_SMOOTH_SAMPLED_SQL,
        tags=("UDAF", "W2", "T6"),
        doc="1-in-5 user-cohort EWMA — same recurrence, 5x smaller "
        "recursive-CTE oracle frame",
    ),
    "udf_scalar_zscore": QuerySpec(
        udf_scalar_zscore, UDF_SCALAR_ZSCORE_SQL, tags=("UDF",),
        doc="scalar pandas_udf demo (global z-score, oracle-paired)",
    ),
    "udf_grouped_norm": QuerySpec(
        udf_grouped_norm, UDF_GROUPED_NORM_SQL, tags=("UDAF",),
        doc="applyInPandas grouped-map demo (per-nation min-max), "
        "single-op float parity oracle",
    ),
    "udf_map_tokens": QuerySpec(
        udf_map_tokens, UDF_MAP_TOKENS_SQL, tags=("UDTF",),
        doc="mapInPandas fan-out demo (token explode); the whitespace-"
        "split + head(20) kernel mirrors exactly into SQL",
    ),
    "multimodal_decode": QuerySpec(
        multimodal_decode, None, tags=("L5",),
        doc="binary feature extraction via mapInPandas (stub codec)",
    ),
    "multimodal_frames": QuerySpec(
        multimodal_frames, None, tags=("L5",),
        doc="frame sampling fan-out + per-asset frame counts",
    ),
    "multimodal_resize": QuerySpec(
        multimodal_resize, None, tags=("L5",),
        doc="block-mean resize to 8x8 via mapInPandas (stub codec)",
    ),
    "multimodal_phash_dedup": QuerySpec(
        multimodal_phash_dedup, None, tags=("L5", "L2"),
        doc="perceptual-hash (aHash) image near-dup via banded Hamming",
    ),
    "multimodal_wav_roundtrip": QuerySpec(
        multimodal_wav_roundtrip, MULTIMODAL_WAV_ROUNDTRIP_SQL,
        tags=("L5", "UDTF"),
        doc="real PCM-WAV codec round-trip (pure numpy RIFF walk), "
        "amplitude stats vs analytic oracle",
    ),
    "multimodal_ppm_roundtrip": QuerySpec(
        multimodal_ppm_roundtrip, MULTIMODAL_PPM_ROUNDTRIP_SQL,
        tags=("L5", "UDTF"),
        doc="REAL PPM codec round-trip; oracle recomputes pixel stats "
        "analytically — a hash match proves bit-exact decode",
    ),
}

"""BPE tokenizer training (Sennrich et al. 2016) with the 100 TB
execution shape.

The classic trainer iterates "count all adjacent symbol pairs → merge
the most frequent" — naively a corpus pass per merge. The standard
factorization (and the one every production trainer uses) is that
pair counts are a pure function of the WORD-FREQUENCY table: aggregate
the corpus once into (word, count) — one shuffle, and the result is
vocabulary-sized, not corpus-sized — then run every merge round over
that compressed table. Training cost is independent of corpus size
after the single aggregation; what crosses the driver is the word
table (bounded like the sketch/centroid collects elsewhere in this
engine) and the merge list (the model).

Determinism contract: ties on pair frequency break lexicographically,
so the merge sequence is a pure function of the word counts.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, n) in one exchange: lowercase whitespace words
    exploded and counted with map-side combine."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(words: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for syms, n in words.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += n
    return pairs


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Sennrich training over a word-frequency table: returns up to
    ``n_merges`` rules as (rank, left, right, pair_freq), stopping
    early when no pair repeats. Ties break on (freq desc, pair asc)."""
    words: dict[tuple[str, ...], int] = {}
    for w, n in word_freqs:
        syms = tuple(list(w) + [_END])
        words[syms] = words.get(syms, 0) + int(n)
    rules: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = _pair_counts(words)
        if not pairs:
            break
        best, freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if freq < 2:
            break
        rules.append((rank, best[0], best[1], freq))
        words = {
            _merge_word(syms, best): n for syms, n in words.items()
        }
    return rules


def encode_word(word: str, rules: list[tuple[int, str, str, int]]) -> list[str]:
    """Apply trained merges to one word, in rank order (the inference
    path; vectorized application lives in the caller's Arrow batch)."""
    syms = tuple(list(word) + [_END])
    for _rank, a, b, _f in rules:
        syms = _merge_word(syms, (a, b))
    return list(syms)


def bpe_train_merges(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 40,
) -> DataFrame:
    """End-to-end: one distributed word-count aggregation, driver-side
    training over the vocabulary-sized table, merge rules back as a
    DataFrame (rank-ordered — the model artifact a tokenizer ships)."""
    wc = word_counts(docs, text_col).toPandas()
    rules = train_bpe(
        sorted(zip(wc["word"], wc["n"])), n_merges
    )
    return spark.createDataFrame(
        rules or [], "rank int, left string, right string, pair_freq long"
    )


def encode_corpus_tokens(
    docs: DataFrame,
    rules: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply trained merges corpus-wide: (doc_id, n_words,
    n_bpe_tokens) per document via one Arrow pass. The rules ride the
    task closure (model-sized, like centroids), and a per-batch memo
    collapses the per-word merge loop to one application per DISTINCT
    word — the Zipf skew that makes corpus encoding cheap in practice.
    Tokenization matches the trainer (lowercase, whitespace runs)."""
    import pandas as pd

    def kernel(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            n_words, n_tok = [], []
            for text in pdf[text_col]:
                words = text.lower().split() if text else []
                total = 0
                for w in words:
                    if w not in memo:
                        memo[w] = len(encode_word(w, rules))
                    total += memo[w]
                n_words.append(len(words))
                n_tok.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_tok, dtype="int64"),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        kernel, "doc_id long, n_words long, n_bpe_tokens long"
    )

"""BPE tokenizer training (Sennrich et al. 2016) with the 100 TB
execution shape.

The classic trainer iterates "count all adjacent symbol pairs → merge
the most frequent" — naively a corpus pass per merge. The standard
factorization (and the one every production trainer uses) is that
pair counts are a pure function of the WORD-FREQUENCY table: aggregate
the corpus once into (word, count) — one shuffle — then run every
merge round over that compressed table. Training cost is independent
of corpus size after the single aggregation.

What crosses the driver is the word table, and over web-scale text the
distinct lowercase-whitespace-word universe (URLs, hex hashes, typos)
grows with the corpus — it is NOT vocabulary-bounded on its own. The
trainer therefore bounds the collect explicitly: a ``min_freq``
frequency floor (pushed into the aggregation as a HAVING filter) and a
``max_vocab`` top-N cap (count-desc, word-asc tiebreak — compiles to
TakeOrdered, so the driver transfer is at most ``max_vocab + 1`` rows
no matter the corpus). If the floored vocabulary still exceeds
``max_vocab`` the default is to FAIL LOUDLY (same discipline as
``dedup/ngram.py``'s ``max_posting`` guard) rather than silently train
on a truncated table; pass ``allow_truncation=True`` to accept top-N
training.

Truncation contract: dropping words can change merge rules only if the
dropped words' symbol pairs contribute to some pair's corpus-wide
frequency reaching the trainer's threshold. For a floor that drops
only words whose pairs never reach pair-frequency 2 elsewhere, the
rule sequence is identical (pinned in tests/test_functions.py).

Determinism contract: ties on pair frequency break lexicographically,
so the merge sequence is a pure function of the (floored, capped) word
counts.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_END = "</w>"

# Tokenization contract shared by training and encoding: lowercase,
# split on ASCII whitespace runs (Java regex \s+ == Python \s+ under
# re.ASCII), drop empty tokens. The Arrow kernel must NOT use Python's
# str.split(), which also splits on Unicode whitespace (NBSP etc.) and
# would tokenize differently from the JVM-side trainer.
_WS_PATTERN = r"\s+"


def word_counts(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """Corpus → (word, n) in one exchange: lowercase ASCII-whitespace
    words exploded and counted with map-side combine. ``min_freq`` is
    a HAVING floor applied inside the same aggregation — at web scale
    it removes the long tail (URLs, hashes, typos) before anything
    leaves the cluster."""
    counts = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), _WS_PATTERN)
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_freq > 1:
        counts = counts.filter(F.col("n") >= min_freq)
    return counts


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
    min_freq: int = 1,
    max_vocab: int = 1_000_000,
    allow_truncation: bool = False,
) -> DataFrame:
    """End-to-end: one distributed word-count aggregation (with the
    ``min_freq`` floor pushed in), a top-``max_vocab`` cap compiled to
    TakeOrdered (count desc, word asc — deterministic), driver-side
    training over the bounded table, merge rules back as a DataFrame
    (rank-ordered — the model artifact a tokenizer ships).

    The driver transfer is hard-bounded at ``max_vocab + 1`` rows. If
    the floored vocabulary overflows the cap, raises ``ValueError``
    unless ``allow_truncation=True`` (then trains on the top-N, which
    can alter low-frequency merges — see module docstring)."""
    if max_vocab < 1:
        raise ValueError(f"max_vocab must be >= 1, got {max_vocab}")
    wc = (
        word_counts(docs, text_col, min_freq=min_freq)
        # limit(max_vocab + 1): the extra row is the overflow sentinel,
        # so detection costs no second pass and no count() job
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_vocab + 1)
        .toPandas()
    )
    if len(wc) > max_vocab:
        if not allow_truncation:
            raise ValueError(
                f"bpe_train_merges: vocabulary exceeds max_vocab={max_vocab} "
                f"after min_freq={min_freq} floor. Raise min_freq (drop the "
                "long tail of URLs/hashes/typos), raise max_vocab, or pass "
                "allow_truncation=True to train on the top-N words by count."
            )
        wc = wc.iloc[:max_vocab]
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
    memo_cap: int = 200_000,
) -> DataFrame:
    """Apply trained merges corpus-wide: (doc_id, n_words,
    n_bpe_tokens) per document via one Arrow pass. The rules ride the
    task closure (model-sized, like centroids), and a per-task memo
    collapses the per-word merge loop to one application per DISTINCT
    word — the Zipf skew that makes corpus encoding cheap in practice.

    The memo is SIZE-BOUNDED at ``memo_cap`` entries (~tens of MB):
    once full, new words are encoded but not cached. Under Zipf the
    hot head appears within the first batches, so first-seen caching
    keeps the hit rate while keeping task memory flat over a 100 TB
    scan. Tokenization matches the trainer exactly (lowercase, ASCII
    ``\\s+`` runs — NOT str.split(), which is Unicode-aware)."""
    import re

    import pandas as pd

    ws = re.compile(_WS_PATTERN, re.ASCII)

    def kernel(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            n_words, n_tok = [], []
            for text in pdf[text_col]:
                words = (
                    [w for w in ws.split(text.lower()) if w] if text else []
                )
                total = 0
                for w in words:
                    hit = memo.get(w)
                    if hit is None:
                        hit = len(encode_word(w, rules))
                        if len(memo) < memo_cap:
                            memo[w] = hit
                    total += hit
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

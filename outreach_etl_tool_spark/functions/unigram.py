"""Unigram-LM tokenizer training (Kudo 2018, the SentencePiece unigram
model) — the principled counterpart of BPE (functions/bpe.py), with
the SAME 100 TB execution shape: one distributed word-frequency
aggregation (bounded, fail-loud — ``bpe.word_counts`` is reused
verbatim), driver-side training over the compressed table (cost
independent of corpus size), and the trained pieces returned as a
model-artifact DataFrame.

Algorithm (hard-EM variant, documented deviation from the paper's
full forward-backward EM: expected piece counts are taken along the
Viterbi-best segmentation instead of summing over all segmentations —
the common reimplementation simplification; it keeps every step a
deterministic max instead of a float-order-sensitive logsumexp):

1. SEED — every substring of every word up to ``max_piece_len`` chars,
   weighted by word frequency, capped to ``seed_size`` by
   (count desc, piece asc); all single characters are force-included
   so any word stays encodable (coverage invariant).
2. EM rounds — E: Viterbi-segment each distinct word under current
   piece log-probs (ties broken by fewer pieces, then lexicographic
   piece sequence — fully deterministic); count pieces along the best
   paths weighted by word frequency. M: p(piece) = count / total.
3. PRUNE — drop the lowest-expected-count MULTI-char pieces (count
   asc, piece desc) down to ``shrink`` of the current size, never
   below ``vocab_size``; single chars are never pruned. EM and prune
   alternate until the vocabulary reaches ``vocab_size``.

Determinism contract: the trained piece set and log-probs are a pure
function of the word-frequency table — seeds, Viterbi tie-breaks and
prune order are all totally ordered (pinned in
tests/test_functions.py). Floats stay driver-side in one process, so
no cross-engine float discipline applies (the registry queries are
rows-only, like BPE's).
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame, SparkSession

from .bpe import _WS_PATTERN, word_counts  # shared tokenization contract


def seed_pieces(
    word_freqs: list[tuple[str, int]],
    max_piece_len: int = 6,
    seed_size: int = 2000,
) -> dict[str, int]:
    """Substring-frequency seed vocabulary: {piece: weighted count}.
    All single chars are kept unconditionally; multi-char substrings
    compete for the remaining ``seed_size`` slots by (count desc,
    piece asc)."""
    counts: Counter[str] = Counter()
    for w, n in word_freqs:
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                counts[w[i:j]] += n
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = dict(singles)
    for p, c in multis[: max(0, seed_size - len(singles))]:
        keep[p] = c
    return keep


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs.
    Deterministic: maximizes score, then minimizes piece count, then
    takes the lexicographically smallest piece sequence. Single chars
    are assumed present (coverage invariant), so a path always
    exists."""
    n = len(word)
    # dp[i] = (score, -n_pieces, pieces tuple) best over word[:i]
    neg_inf = float("-inf")
    dp: list[tuple[float, int, tuple[str, ...]]] = [
        (neg_inf, 0, ()) for _ in range(n + 1)
    ]
    dp[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        best = None
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or dp[j][0] == neg_inf:
                continue
            cand = (
                dp[j][0] + lp,
                dp[j][1] - 1,
                dp[j][2] + (piece,),
            )
            if best is None or (cand[0], cand[1], _neg(cand[2])) > (
                best[0], best[1], _neg(best[2])
            ):
                best = cand
        if best is not None:
            dp[i] = best
    if dp[n][0] == neg_inf:  # pragma: no cover — coverage invariant
        raise ValueError(f"word {word!r} not coverable by vocabulary")
    return list(dp[n][2])


class _neg:
    """Order-reversing wrapper so 'lexicographically smallest pieces'
    participates in a single max() comparison key."""

    __slots__ = ("v",)

    def __init__(self, v: tuple[str, ...]) -> None:
        self.v = v

    def __lt__(self, other: "_neg") -> bool:
        return self.v > other.v

    def __gt__(self, other: "_neg") -> bool:
        return self.v < other.v

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _neg) and self.v == other.v


def _logprobs(counts: dict[str, int | float]) -> dict[str, float]:
    total = float(sum(counts.values()))
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def train_unigram(
    word_freqs: list[tuple[str, int]],
    vocab_size: int = 300,
    max_piece_len: int = 6,
    seed_size: int = 2000,
    em_rounds: int = 2,
    shrink: float = 0.75,
    max_prune_iters: int = 100,
) -> list[tuple[str, float, float]]:
    """Train the unigram LM; returns (piece, log_prob, expected_count)
    sorted by (expected_count desc, piece asc). Single chars survive
    pruning unconditionally (coverage), with a count floor of 1 so
    their log-prob stays finite even when unused by any best path."""
    counts: dict[str, float] = dict(
        seed_pieces(word_freqs, max_piece_len, seed_size)
    )
    singles = {p for p in counts if len(p) == 1}

    def em(cur: dict[str, float]) -> dict[str, float]:
        for _ in range(em_rounds):
            logp = _logprobs(cur)
            new: Counter[str] = Counter()
            for w, n in word_freqs:
                for piece in viterbi_segment(w, logp, max_piece_len):
                    new[piece] += n
            cur = {p: float(c) for p, c in new.items()}
            for s in singles:  # coverage floor
                cur.setdefault(s, 1.0)
        return cur

    counts = em(counts)
    for _ in range(max_prune_iters):
        n_multi = sum(1 for p in counts if len(p) > 1)
        target_multi = max(
            vocab_size - len(singles), 0
        )
        if len(counts) <= max(vocab_size, len(singles)):
            break
        keep_multi = max(int(n_multi * shrink), target_multi)
        if keep_multi >= n_multi:
            keep_multi = target_multi
        multis = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        counts = {p: c for p, c in multis[:keep_multi]}
        for s in singles:
            counts.setdefault(s, 1.0)
        counts = em(counts)
    logp = _logprobs(counts)
    return sorted(
        ((p, logp[p], float(c)) for p, c in counts.items() if c > 0),
        key=lambda t: (-t[2], t[0]),
    )


def unigram_train_pieces(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 300,
    max_piece_len: int = 6,
    min_freq: int = 1,
    max_vocab: int = 1_000_000,
    allow_truncation: bool = False,
) -> DataFrame:
    """End-to-end: the SAME bounded word-count collect as
    ``bpe.bpe_train_merges`` (TakeOrdered cap, fail-loud overflow),
    driver-side unigram training, pieces back as a DataFrame — the
    model artifact a tokenizer ships."""
    from pyspark.sql import functions as F

    wc = (
        word_counts(docs, text_col, min_freq=min_freq)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_vocab + 1)
        .toPandas()
    )
    if len(wc) > max_vocab:
        if not allow_truncation:
            raise ValueError(
                f"unigram_train_pieces: vocabulary exceeds "
                f"max_vocab={max_vocab} after min_freq={min_freq} floor. "
                "Raise min_freq, raise max_vocab, or pass "
                "allow_truncation=True to train on the top-N words."
            )
        wc = wc.iloc[:max_vocab]
    pieces = train_unigram(
        sorted(zip(wc["word"], wc["n"])),
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
    )
    return spark.createDataFrame(
        pieces or [], "piece string, log_prob double, expected_count double"
    )


def encode_corpus_tokens_unigram(
    docs: DataFrame,
    pieces: list[tuple[str, float]],
    text_col: str = "text",
    max_piece_len: int = 6,
    memo_cap: int = 200_000,
) -> DataFrame:
    """Corpus-wide Viterbi encoding: (doc_id, n_words,
    n_unigram_tokens) per doc via one Arrow pass — the unigram twin of
    ``bpe.encode_corpus_tokens`` (same task-closure model shipping,
    same size-bounded per-task memo over distinct words, same ASCII
    whitespace tokenization as the trainer).

    Out-of-vocabulary handling (round-10 ADVICE fix): the trainer's
    coverage invariant (every single char present) only holds for the
    TRAINING corpus, so encoding a different corpus may hit characters
    no piece covers — previously a ValueError inside the Arrow kernel
    that failed the whole distributed job. Now each maximal run of
    uncoverable characters counts as ONE unk token (SentencePiece's
    unk-piece semantics), and Viterbi runs on the coverable stretches
    between runs. Splitting at uncoverable chars never severs a usable
    piece: any vocab piece's characters are all vocab singles."""
    import re

    import pandas as pd

    logp = {p: lp for p, lp, *_ in pieces}
    singles = {p for p in logp if len(p) == 1}
    ws = re.compile(_WS_PATTERN, re.ASCII)

    def n_word_tokens(w: str) -> int:
        total, i, n = 0, 0, len(w)
        while i < n:
            if w[i] in singles:
                j = i
                while j < n and w[j] in singles:
                    j += 1
                total += len(viterbi_segment(w[i:j], logp, max_piece_len))
                i = j
            else:
                while i < n and w[i] not in singles:
                    i += 1
                total += 1  # one unk per uncoverable run
        return total

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
                        hit = n_word_tokens(w)
                        if len(memo) < memo_cap:
                            memo[w] = hit
                    total += hit
                n_words.append(len(words))
                n_tok.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_unigram_tokens": pd.Series(n_tok, dtype="int64"),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        kernel, "doc_id long, n_words long, n_unigram_tokens long"
    )

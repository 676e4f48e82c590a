"""Exact integer fixed-point log2 — the transcendental-free log the
float discipline demands (SURVEY.md §2.10d L4v; same rationale as the
BM25 rational idf: `ln` is not IEEE-correctly-rounded, so Spark's JVM
libm and DuckDB's C libm can disagree in the last ulp and a hash gate
built on it would be flaky; shifts, multiplies and integer divides
cannot disagree).

``ilog2_64(x)`` ≈ floor(64·log2(x)) for integer x ≥ 1 via the classic
shift-and-square algorithm with a FIXED 6-step unroll expressed as a
fold, so the same algorithm runs as

- a Spark SQL expression (``spark_expr`` → ``F.expr``): bit length via
  base-2 ``conv``, the 6 refinement steps as one ``aggregate`` HOF
  fold over ``sequence(1,6)``;
- a DuckDB expression (``duck_expr``): bit length via ``bin``, the
  fold as ``list_reduce`` with the IDENTICAL step text;
- a pure-python reference (``ilog2_py``) pinned against both by
  tests/test_functions.py.

Algorithm (all int64, overflow-free for x < 2^62): normalize the
mantissa to m ∈ [2^30, 2^31) with a data-dependent shift, then six
times: square m (< 2^62), emit fraction bit (m² ≥ 2^61), renormalize
with a constant shift. The fold state packs (m, frac) into one BIGINT
as m·64 + frac — m < 2^31 and frac < 2^6 never collide. Resolution
1/64 of a bit; error vs true 64·log2 is < 1 unit (floor-biased),
and — the property that matters — DETERMINISTIC and engine-identical.
"""

from __future__ import annotations

_STEP = (
    "CASE WHEN ((acc >> 6) * (acc >> 6)) >= {lim} "
    "THEN ((((acc >> 6) * (acc >> 6)) >> 31) * 64) + ((acc % 64) * 2 + 1) "
    "ELSE ((((acc >> 6) * (acc >> 6)) >> 30) * 64) + ((acc % 64) * 2) END"
).format(lim=1 << 61)


def _m0(x: str, e0: str) -> str:
    return (
        f"(CASE WHEN {e0} <= 30 THEN ({x}) << (30 - {e0}) "
        f"ELSE ({x}) >> ({e0} - 30) END)"
    )


def spark_expr(x: str) -> str:
    """Spark SQL text for ilog2_64 of the (positive integer) SQL
    expression ``x``; wrap with ``F.expr``. ``x`` is substituted
    three times — keep it a short column reference or precompute."""
    e0 = f"(length(conv(CAST(({x}) AS STRING), 10, 2)) - 1)"
    return (
        f"(64 * CAST({e0} AS BIGINT) + "
        f"(aggregate(sequence(1, 6), CAST({_m0(x, e0)} AS BIGINT) * 64, "
        f"(acc, z) -> {_STEP}) % 64))"
    )


def duck_expr(x: str) -> str:
    """DuckDB SQL text for ilog2_64 of the expression ``x``."""
    e0 = f"(length(bin({x})) - 1)"
    return (
        f"(64 * CAST({e0} AS BIGINT) + "
        f"(list_reduce([CAST({_m0(x, e0)} AS BIGINT) * 64, "
        f"0, 0, 0, 0, 0, 0], (acc, z) -> {_STEP}) % 64))"
    )


def ilog2_py(x: int) -> int:
    """Pure-python reference of the same algorithm (test pin)."""
    if x < 1:
        raise ValueError("ilog2 domain is x >= 1")
    e0 = x.bit_length() - 1
    m = x << (30 - e0) if e0 <= 30 else x >> (e0 - 30)
    frac = 0
    for _ in range(6):
        m2 = m * m
        bit = 1 if m2 >= (1 << 61) else 0
        m = m2 >> (30 + bit)
        frac = frac * 2 + bit
    return 64 * e0 + frac

"""sf-scaling smoke: the three heaviest operators must scale
sub-linearly from sf0.01 to sf0.1 (10× rows).

The per-round bench measures one fixed sf, so a reintroduced per-row
driver-side cost (a .collect() loop, a row-at-a-time UDF, an
accidentally-quadratic candidate expansion) can hide inside a constant
until the next scale-up. Timing the SAME query at two scales catches
it: distributed plans carry large fixed overhead (JVM, scheduling,
python workers), so 10× data must cost well under 10× wall-clock; a
super-linear operator blows straight past that."""

from __future__ import annotations

import time

import pytest

from outreach_etl_tool_spark.queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

# name -> max tolerated t(sf0.1)/t(sf0.01) wall ratio. 10 is the
# default ("well under 10× for 10× data" — fixed overhead dominates
# these at sf0.01, so sub-linear work shows up directly).
# dedup_span_exact_extents gets 35: its sf0.1 cost is genuinely
# compute-SATURATED (the stride-1 md5 fan-out — measured 119,517
# screened positions at sf0.1 vs 10,549 at sf0.01, i.e. the WORK
# scales 11.3× for 10× data, linear), so on a fixed small session 10×
# work legitimately costs ≈10× wall once past the floor, and the
# sf0.01 point sits UNDER the session floor — the tight wall ratio
# here measures the floor and the host's CPU quota, not the operator
# (r15: 17.6× measured on a quota-throttled host whose calibration
# probe ran 4-8× slower than the driver's). The tight LINEARITY
# assertion for this operator lives in the 3× slice test below, where
# both measurement points are work-dominated; this bound still fails
# loudly on a quadratic re-introduction (~100×).
HEAVY = {
    "dedup_cluster": 10.0,
    "dedup_minhash": 10.0,
    "sim_knn_join": 10.0,
    "lm_quality_score": 10.0,
    "dedup_substring_spans": 10.0,
    "dedup_span_exact_extents": 35.0,
    "pipeline_pretrain_prep": 10.0,
}


def _timed(spark, name: str, sf_dir: str, passes: int = 1) -> float:
    best = None
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        REGISTRY[name].fn(spark, sf_dir).count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best


def _calibration(spark) -> float:
    """Median-of-3 fixed probe, timed adjacent to a measurement — the
    host-load normalizer that de-flakes the ratio assertions under a
    concurrently busy machine (round-9 verdict #6: the 3× test failed
    under a parallel selfcheck and passed quiet)."""
    from pyspark.sql import functions as F

    samples = []
    for _ in range(3):
        t0 = time.monotonic()
        (
            spark.range(5_000_000)
            .select(
                (F.col("id") % 97).alias("k"),
                (F.col("id") * 2654435761 % 1000003).alias("h"),
            )
            .groupBy("k")
            .sum("h")
            .count()
        )
        samples.append(time.monotonic() - t0)
    return sorted(samples)[1]


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(HEAVY))
def test_ten_x_data_costs_well_under_ten_x_time(spark, name):
    REGISTRY[name].fn(spark, SF_SMALL).count()  # warm JIT + python workers
    t_small = _timed(spark, name, SF_SMALL)
    t_big = _timed(spark, name, SF_BIG)
    ratio = t_big / max(t_small, 1e-6)
    assert ratio < HEAVY[name], (
        f"{name}: sf0.1 took {t_big:.2f}s vs sf0.01 {t_small:.2f}s "
        f"(ratio {ratio:.1f}× for 10× data, bound {HEAVY[name]}×) — "
        "super-linear scaling; look for driver-side loops or quadratic "
        "candidate expansion"
    )


# --------------------------------------------------- third point: sf0.3
# A generated 3× slice of the sf0.1 documents table gives the dedup
# family a third scaling point beyond the driver-shipped sfs. Each
# replica offsets doc_id and Caesar-rotates the letters (a gram
# bijection): within a replica the duplicate-pair structure of the
# original corpus is preserved, and across replicas no near-dups are
# introduced — so the duplicate graph grows ~linearly (3×), which is
# exactly the regime where super-linear operator cost has nowhere to
# hide. (See scalekit's module docstring for the letter-free-gram
# caveat.)

@pytest.fixture(scope="module")
def sf03_dir(spark):
    from outreach_etl_tool_spark.scalekit import (
        build_documents_slice,
        slice_dest,
    )

    return build_documents_slice(spark, SF_BIG, slice_dest("sf03"))


@pytest.mark.slow
@pytest.mark.parametrize(
    "name",
    [
        "dedup_cluster",
        "dedup_minhash",
        "dedup_substring_spans",
        "dedup_span_exact_extents",
        "pipeline_pretrain_prep",
    ],
)
def test_three_x_slice_scales_linearly(spark, name, sf03_dir):
    REGISTRY[name].fn(spark, SF_BIG).count()  # warm
    # each wall time is best-of-2 and normalized by a calibration
    # probe timed in ITS OWN measurement window, so a CPU hog that
    # lands on one window inflates that window's probe too and the
    # ratio stays load-invariant (round-9 verdict #6 de-flake)
    c_mid = _calibration(spark)
    t_mid = _timed(spark, name, SF_BIG, passes=2)
    c_3x = _calibration(spark)
    t_3x = _timed(spark, name, sf03_dir, passes=2)
    ratio = (t_3x / max(c_3x, 1e-6)) / max(t_mid / max(c_mid, 1e-6), 1e-6)
    # 3x data: linear is 3x, quadratic ~9x; 6 allows fixed-cost noise
    assert ratio < 6.0, (
        f"{name}: sf0.3 took {t_3x:.2f}s (calib {c_3x:.2f}s) vs "
        f"sf0.1 {t_mid:.2f}s (calib {c_mid:.2f}s) — normalized ratio "
        f"{ratio:.1f}× for 3× data — super-linear scaling"
    )

"""Testdata-conformance + footer-sniff guards for the events reader.

The round-4 regression class: the driver regenerated events.parquet
with a different timestamp physical unit (NANOS → MICROS) and the
engine's hard-coded decode silently collapsed every 2024 timestamp
onto 1970-01-20 — 15 wrong queries, zero failing tests, because the
suite ran only on synthetic fixtures. These tests make that break
LOUD: the conformance test reads the real testdata through the real
reader and asserts the decoded range is sane; the sniff tests pin the
unit detection on self-written micros AND nanos parquet, so both
decode branches stay exercised no matter which unit the current
testdata happens to use.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from outreach_etl_tool_spark import catalog

TESTDATA = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(f"{TESTDATA}/events.parquet"),
    reason="driver testdata not present",
)


@needs_testdata
def test_events_ts_decodes_to_generator_range(spark):
    """Decoded events.ts must span the generator's 2024 window — a
    unit-mismatch decode lands in 1970 (or year ~56000) and fails
    loudly here before it wrongs 15 queries."""
    from pyspark.sql import functions as F

    lo, hi = (
        catalog.load_table(spark, TESTDATA, "events")
        .agg(F.min("ts"), F.max("ts"))
        .first()
    )
    assert lo.year == hi.year == 2024, (lo, hi)
    span = hi - lo
    # the generator spreads events over weeks, not minutes: a ns→µs
    # double-divide collapses the span ~1000× (43 minutes in round 4)
    assert span > dt.timedelta(days=1), span


@needs_testdata
def test_events_between_matches_load_table_filter(spark):
    """The pushdown path and the generic reader must agree row-for-row
    on an inclusive window, whatever the file's unit."""
    from pyspark.sql import functions as F

    ev = catalog.load_table(spark, TESTDATA, "events")
    lo_ts, hi_ts = (
        ev.agg(F.min("ts"), F.max("ts")).first()
    )
    mid_lo = (lo_ts + (hi_ts - lo_ts) / 4).strftime("%Y-%m-%d %H:%M:%S")
    mid_hi = (lo_ts + (hi_ts - lo_ts) / 2).strftime("%Y-%m-%d %H:%M:%S")
    fast = catalog.load_events_between(spark, TESTDATA, mid_lo, mid_hi)
    slow = ev.filter(
        (F.col("ts") >= F.lit(mid_lo).cast("timestamp_ntz"))
        & (F.col("ts") <= F.lit(mid_hi).cast("timestamp_ntz"))
    )
    assert fast.count() == slow.count() > 0
    assert fast.exceptAll(slow).isEmpty()


def _write_events_parquet(path: str, unit: str) -> None:
    base = dt.datetime(2024, 1, 1)
    rows = [base + dt.timedelta(hours=i) for i in range(48)]
    table = pa.table(
        {
            "event_id": pa.array(range(48), pa.int64()),
            "ts": pa.array(rows, pa.timestamp(unit)),
            "user_id": pa.array([i % 5 for i in range(48)], pa.int64()),
            "event_type": pa.array(["view"] * 48),
            "value": pa.array([float(i) for i in range(48)]),
            "props": pa.array(["{}"] * 48),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize("unit", ["us", "ns", "ms"])
def test_footer_sniff_detects_unit(tmp_path, unit):
    p = str(tmp_path / "events.parquet")
    _write_events_parquet(p, unit)
    assert catalog._events_ts_unit(p) == unit


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_decodes_both_units_identically(spark, tmp_path, unit):
    """Same logical data written as micros and as nanos must decode to
    the same TimestampNTZ values through load_table — this pins BOTH
    branches, so a future testdata regeneration in either unit is a
    no-op for the engine."""
    sf_dir = str(tmp_path / unit)
    os.makedirs(sf_dir)
    _write_events_parquet(f"{sf_dir}/events.parquet", unit)
    got = sorted(
        r["ts"]
        for r in catalog.load_table(spark, sf_dir, "events").collect()
    )
    expect = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=i) for i in range(48)]
    assert got == expect


_ARROW_OK: dict[str, tuple[str, ...]] = {
    # declared Spark type simpleString → acceptable arrow type prefixes
    "int": ("int32",),
    "bigint": ("int64",),
    "double": ("double", "float64"),
    "string": ("string", "large_string"),
    "timestamp_ntz": ("timestamp[us]", "timestamp[ns]", "timestamp[ms]"),
    # pyarrow names the list child 'item' or 'element' depending on
    # the writer's parquet convention — both are the same logical type
    "array<float>": (
        "list<item: float>",
        "list<element: float>",
        "large_list<item: float>",
        "large_list<element: float>",
    ),
}


@needs_testdata
def test_every_declared_schema_matches_testdata_footers(spark):
    """Round-4's break class, generalized to every table: if the
    driver regenerates ANY testdata column with a different physical
    type than the declared schema can absorb, fail at suite start
    with the exact (table, column, got, want) — not as silent nulls
    or a 1000×-off decode inside 15 queries."""
    sf_dir = TESTDATA.rsplit("/", 1)[0] + "/sf0.001"
    for name, schema in catalog.SCHEMAS.items():
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            import glob

            path = sorted(glob.glob(f"{path}/*.parquet"))[0]
        arrow = pq.read_schema(path)
        arrow_types = {f.name: str(arrow.field(f.name).type) for f in schema.fields
                       if f.name in arrow.names}
        missing = [f.name for f in schema.fields if f.name not in arrow.names]
        assert not missing, f"{name}: declared columns absent in parquet: {missing}"
        for f in schema.fields:
            want = f.dataType.simpleString()
            got = arrow_types[f.name]
            ok = _ARROW_OK.get(want)
            assert ok is not None, (
                f"{name}.{f.name}: no conformance rule for declared {want!r} "
                f"(got {got!r}) — extend _ARROW_OK"
            )
            assert any(got.startswith(p) for p in ok), (
                f"{name}.{f.name}: parquet is {got!r}, declared {want!r} — "
                "testdata regenerated with an incompatible type?"
            )


def test_sniff_rejects_non_timestamp_ts(tmp_path):
    p = str(tmp_path / "events.parquet")
    table = pa.table({"ts": pa.array([1, 2, 3], pa.int64())})
    pq.write_table(table, p)
    with pytest.raises(TypeError, match="not a timestamp"):
        catalog._events_ts_unit(p)

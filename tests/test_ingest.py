"""Ingest layer tests: flatten golden parity with the reference
schemas, schema loading, and the §2.12 replication-bug fixes."""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from outreach_etl_tool_spark.ingest import (
    coerce_types,
    empty_frame,
    flatten_df,
    flatten_record,
    flatten_schema_names,
    load_ref_schema,
    ref_schema_to_struct,
)
from outreach_etl_tool_spark.ingest import rest

REF_SCHEMAS = "/root/reference/schemas"


# ------------------------------------------------- flatten: golden parity
def test_flatten_record_nested_dict_and_lists():
    rec = {
        "attributes": {
            "emails": ["a@x.com", "b@x.com"],
            "contactHistogram": [[0, 1], [2, 3]],
            "firstName": "Ada",
        },
        "relationships": {"account": {"data": {"id": 7}}},
        "id": 1,
    }
    flat = flatten_record(rec)
    assert flat == {
        "attributes_emails_0": "a@x.com",
        "attributes_emails_1": "b@x.com",
        "attributes_contactHistogram_0_0": 0,
        "attributes_contactHistogram_0_1": 1,
        "attributes_contactHistogram_1_0": 2,
        "attributes_contactHistogram_1_1": 3,
        "attributes_firstName": "Ada",
        "relationships_account_data_id": 7,
        "id": 1,
    }


def test_flatten_names_are_reference_schema_columns():
    """Every name our flattener derives for the prospects fixture exists
    verbatim in the reference's declared schema — the golden contract."""
    schema_cols = set(json.load(open(f"{REF_SCHEMAS}/prospects.json")))
    rec = {
        "attributes": {
            "addedAt": "2024-01-01T00:00:00Z",
            "emails": ["a@x.com", "b@x.com"],
            "tags": ["t1", "t2"],
            "contactHistogram": [[i, i + 1] for i in range(12)],
            "engagedScore": 0.5,
        },
        "relationships": {
            "account": {"data": {"type": "account", "id": 7}},
            "owner": {"data": {"type": "user", "id": 3}},
        },
        "id": 1,
        "type": "prospect",
    }
    flat = flatten_record(rec)
    missing = {k for k in flat if k not in schema_cols}
    assert not missing, f"columns not in reference schema: {sorted(missing)}"
    # the 12×2 histogram flattens to all 24 declared matrix columns
    assert {f"attributes_contactHistogram_{i}_{j}" for i in range(12)
            for j in range(2)} <= set(flat)


def test_flatten_df_matches_flatten_record(spark):
    """The Spark operator and the per-record flattener produce the same
    layout for the same nested value."""
    df = spark.createDataFrame(
        [((["a@x.com", "b@x.com"], "Ada"), 1)],
        "attributes struct<emails: array<string>, firstName: string>, id long",
    )
    out = flatten_df(df, array_limits={"attributes_emails": 2})
    assert out.columns == ["attributes_emails_0", "attributes_emails_1",
                           "attributes_firstName", "id"]
    row = out.collect()[0]
    assert row["attributes_emails_0"] == "a@x.com"
    assert row["attributes_firstName"] == "Ada"


def test_flatten_df_out_of_range_index_is_null(spark):
    df = spark.createDataFrame([(["only-one"],)], "emails array<string>")
    row = flatten_df(df, default_items=3).collect()[0]
    assert row["emails_0"] == "only-one"
    assert row["emails_1"] is None and row["emails_2"] is None


def test_flatten_schema_names_nested_matrix(spark):
    df = spark.createDataFrame([([[1, 2]],)], "m array<array<int>>")
    names = flatten_schema_names(df.schema, array_limits={"m": 2, "m_0": 2, "m_1": 2})
    assert names == ["m_0_0", "m_0_1", "m_1_0", "m_1_1"]


# -------------------------------------------------- schema loader parity
WIDTHS = (("prospects", 207), ("sequences", 90), ("mailings", 68))


@pytest.mark.parametrize("schemas_dir", [REF_SCHEMAS, None],
                         ids=["reference", "repo"])
def test_load_ref_schema_all_three_endpoints(spark, schemas_dir):
    """Both the reference's verbose files and the repo's compact
    full-width files load to the same 207/90/68 nullable columns."""
    if schemas_dir is None:
        import outreach_etl_tool_spark as pkg

        schemas_dir = str(Path(pkg.__file__).parent / "schemas")
    for endpoint, ncols in WIDTHS:
        schema = load_ref_schema(f"{schemas_dir}/{endpoint}.json")
        assert len(schema) == ncols
        struct = ref_schema_to_struct(schema)
        assert len(struct.fields) == ncols
        assert all(f.nullable for f in struct.fields)
    df = empty_frame(spark, schema)
    assert df.count() == 0 and len(df.columns) == 68


def test_repo_schemas_match_reference_key_for_key():
    """Full-width parity: every endpoint's repo-local schema declares
    exactly the reference's columns with the same dtypes."""
    import outreach_etl_tool_spark as pkg

    repo_dir = Path(pkg.__file__).parent / "schemas"
    for endpoint, _ in WIDTHS:
        ref = load_ref_schema(f"{REF_SCHEMAS}/{endpoint}.json")
        mine = load_ref_schema(repo_dir / f"{endpoint}.json")
        assert mine == ref, endpoint


# ------------------------------------ nested model ⇄ flat layout roundtrip
_MAP_BLOCKS = {"prospects": {"attributes": ("custom", r"custom\d+")}}


def _roundtrip_parts(endpoint: str):
    import outreach_etl_tool_spark as pkg
    from outreach_etl_tool_spark.ingest.flatten import (
        array_sizes_of,
        unflatten_schema,
    )

    flat = load_ref_schema(Path(pkg.__file__).parent / "schemas" / f"{endpoint}.json")
    blocks = _MAP_BLOCKS.get(endpoint)
    nested, shadows = unflatten_schema(flat, blocks)
    map_keys = None
    if blocks:
        map_keys = {
            "attributes_custom": [
                c.removeprefix("attributes_")
                for c in flat
                if c.startswith("attributes_custom")
                and c.removeprefix("attributes_custom").isdigit()
            ]
        }
    return flat, nested, shadows, array_sizes_of(flat), map_keys


@pytest.mark.parametrize("endpoint", ["prospects", "sequences", "mailings"])
def test_full_flat_layout_roundtrip(endpoint):
    """From repo-local files alone: rebuild the nested model
    (StructType/ArrayType/MapType per SURVEY §1.1), then flatten —
    every declared sink column must come back, including the
    custom1..55 MapType block and the 12×2 contactHistogram matrix."""
    flat, nested, shadows, limits, map_keys = _roundtrip_parts(endpoint)
    names = flatten_schema_names(nested, array_limits=limits,
                                 map_keys=map_keys) + sorted(shadows)
    assert sorted(names) == sorted(flat)


def test_full_flat_layout_executes(spark):
    """flatten_df actually projects the full prospects layout (207
    columns, map keys via element_at, null-safe positions) in Spark."""
    flat, nested, shadows, limits, map_keys = _roundtrip_parts("prospects")
    df = spark.createDataFrame([], nested)
    out = flatten_df(df, array_limits=limits, map_keys=map_keys,
                     shadow_cols=shadows)
    assert sorted(out.columns) == sorted(flat)
    assert out.count() == 0


def test_flatten_map_block_values(spark):
    """Declared-key map expansion: present keys surface, absent keys
    null, and the container name is dropped from the column name."""
    df = spark.createDataFrame(
        [(({"custom1": "a", "custom3": "c"},),)],
        schema="attributes struct<custom: map<string,string>>",
    )
    out = flatten_df(
        df, map_keys={"attributes_custom": ["custom1", "custom2", "custom3"]}
    )
    assert out.columns == [
        "attributes_custom1", "attributes_custom2", "attributes_custom3"
    ]
    row = out.collect()[0]
    assert (row["attributes_custom1"], row["attributes_custom2"],
            row["attributes_custom3"]) == ("a", None, "c")


def test_coerce_types(spark):
    schema = {"n": "integer", "x": "float", "ok": "boolean",
              "at": "datetime", "s": "string"}
    df = spark.createDataFrame(
        [("42", "1.5", "True", "2024-03-01T12:00:00", "keep"),
         ("bad", "bad", "bad", "bad", None)],
        "n string, x string, ok string, at string, s string",
    )
    out = coerce_types(df, schema)
    kinds = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert kinds == {"n": "bigint", "x": "double", "ok": "boolean",
                     "at": "timestamp", "s": "string"}
    good, bad = out.orderBy(F.desc("s")).collect()
    assert (good["n"], good["x"], good["ok"]) == (42, 1.5, True)
    assert good["at"] == dt.datetime(2024, 3, 1, 12, 0)
    # unparseable inputs became null, not a failed batch
    assert (bad["n"], bad["x"], bad["ok"], bad["at"]) == (None,) * 4


# ------------------------------------------------ replication semantics
SCHEMA = {"id": "integer", "attributes_updatedAt": "datetime",
          "attributes_v": "integer"}


def make_fake_api(rows: list[dict], page_size_cap: int = 2,
                  fail_first: int = 0):
    """In-memory JSON-API: date-filtered, sorted, paginated via an
    opaque offset token; optionally fails the first N calls."""
    state = {"calls": 0, "fetched_pages": 0}

    def fetcher(endpoint: str, params: dict) -> rest.Page:
        state["calls"] += 1
        if state["calls"] <= fail_first:
            raise ConnectionError("transient")
        # REAL server semantics: date..date range is INCLUSIVE on both
        # ends (reference sends single-day date..date windows) — a
        # half-open client assumption shows up here as boundary dupes
        lo, hi = params["filter[updatedAt]"].split("..")
        sel = [r for r in rows if lo <= r["attributes"]["updatedAt"][:10] <= hi]
        sel.sort(key=lambda r: r["attributes"]["updatedAt"], reverse=True)
        off = int(params.get("page[next]", 0))
        limit = min(params["page[limit]"], page_size_cap)
        chunk = sel[off: off + limit]
        nxt = off + limit if off + limit < len(sel) else None
        state["fetched_pages"] += 1
        return rest.Page(data=chunk, next_token=None if nxt is None else str(nxt),
                         total=len(sel))

    fetcher.state = state
    return fetcher


def api_rows(n: int, day: str = "2024-03-01") -> list[dict]:
    return [
        {"id": i, "attributes": {"updatedAt": f"{day}T00:00:{i % 60:02d}", "v": i}}
        for i in range(n)
    ]


def test_sync_includes_page_one(spark):
    """Reference bug #1: the ≤threshold branch lost page 1; we must not."""
    fetcher = make_fake_api(api_rows(5))
    df = rest.sync_endpoint(
        spark, fetcher, "prospects", SCHEMA,
        dt.date(2024, 3, 1), dt.date(2024, 3, 2),
    )
    assert sorted(r["id"] for r in df.collect()) == [0, 1, 2, 3, 4]


def test_sync_retries_without_duplicates(spark):
    """Reference bug #3: retry appended the previous page again."""
    fetcher = make_fake_api(api_rows(5), fail_first=2)
    df = rest.sync_endpoint(
        spark, fetcher, "prospects", SCHEMA,
        dt.date(2024, 3, 1), dt.date(2024, 3, 2), max_retries=5,
    )
    assert sorted(r["id"] for r in df.collect()) == [0, 1, 2, 3, 4]


def test_sync_persistent_failure_raises(spark):
    fetcher = make_fake_api(api_rows(3), fail_first=10**6)
    with pytest.raises(rest.FetchError):
        rest.sync_endpoint(
            spark, fetcher, "prospects", SCHEMA,
            dt.date(2024, 3, 1), dt.date(2024, 3, 2), max_retries=3,
        )


def test_day_windows_half_open_no_overlap():
    """Internal windows are half-open and tile exactly."""
    ws = rest.day_windows(dt.date(2024, 3, 1), dt.date(2024, 3, 4))
    assert ws == [
        (dt.date(2024, 3, 1), dt.date(2024, 3, 2)),
        (dt.date(2024, 3, 2), dt.date(2024, 3, 3)),
        (dt.date(2024, 3, 3), dt.date(2024, 3, 4)),
    ]


def test_window_params_inclusive_querystring():
    """The server's range filter is inclusive..inclusive (the reference
    sends date..date, outreach_etl.py:166): a half-open [lo, lo+1day)
    window must serialize as lo..lo, never lo..lo+1 — the latter
    re-fetches every boundary day in the adjacent partition too."""
    p = rest.window_params(dt.date(2024, 3, 1), dt.date(2024, 3, 2), 100)
    assert p["filter[updatedAt]"] == "2024-03-01..2024-03-01"
    p3 = rest.window_params(dt.date(2024, 3, 1), dt.date(2024, 3, 4), 100)
    assert p3["filter[updatedAt]"] == "2024-03-01..2024-03-03"


def test_sync_never_fetches_outside_window(spark):
    """Against an inclusive-range server, a half-open querystring leaks
    the day AFTER the replication window into the result; rows from
    2024-03-03 must not appear when syncing [03-01, 03-03)."""
    rows = (
        api_rows(3, "2024-03-01")
        + [dict(r, id=r["id"] + 10) for r in api_rows(3, "2024-03-02")]
        + [dict(r, id=r["id"] + 20) for r in api_rows(3, "2024-03-03")]
    )
    df = rest.sync_endpoint(
        spark, make_fake_api(rows), "prospects", SCHEMA,
        dt.date(2024, 3, 1), dt.date(2024, 3, 3),
    )
    got = sorted(r["id"] for r in df.collect())
    assert got == [0, 1, 2, 10, 11, 12], got


def test_sync_large_goes_distributed_and_upserts(spark):
    """>threshold → per-day mapInPandas fan-out; re-pulled rows collapse
    to the latest updatedAt version (T6 upsert)."""
    rows = api_rows(6, "2024-03-01") + api_rows(6, "2024-03-02")
    # same ids on both days → day 2 versions must win
    df = rest.sync_endpoint(
        spark, make_fake_api(rows, page_size_cap=4), "prospects", SCHEMA,
        dt.date(2024, 3, 1), dt.date(2024, 3, 3), large_threshold=3,
    )
    out = df.collect()
    assert sorted(r["id"] for r in out) == [0, 1, 2, 3, 4, 5]
    assert all(r["attributes_updatedAt"].day == 2 for r in out)


def test_replication_window_modes():
    today = dt.date(2024, 3, 10)
    assert rest.replication_window("full", dt.date(2024, 1, 1), today) == (
        dt.date(2024, 1, 1), today)
    assert rest.replication_window("previous_day", dt.date(2024, 1, 1), today) == (
        dt.date(2024, 3, 9), today)
    with pytest.raises(ValueError):
        rest.replication_window("nope", today, today)


def test_upsert_latest_keeps_latest(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "old"), (1, dt.datetime(2024, 1, 2), "new"),
         (2, dt.datetime(2024, 1, 1), "only")],
        "id long, updatedAt timestamp, v string",
    )
    out = {r["id"]: r["v"] for r in rest.upsert_latest(df).collect()}
    assert out == {1: "new", 2: "only"}


def test_strip_prefix(spark):
    df = spark.createDataFrame([(1, "x")], "id long, attributes_name string")
    assert rest.strip_prefix(df).columns == ["id", "name"]

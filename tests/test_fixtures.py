"""Unit tests for the atomic fixture cache (queries/fixtures.py) —
crash- and concurrency-safety of the on-disk replay/layout fixtures
that registry queries cache under /tmp."""

from __future__ import annotations

from pathlib import Path

from outreach_etl_tool_spark.queries.fixtures import atomic_fixture


def _builder(payload: str):
    def build(root: Path) -> None:
        root.mkdir(parents=True, exist_ok=True)
        (root / "data.txt").write_text(payload)

    return build


def test_builds_once_and_caches(tmp_path):
    dest = tmp_path / "fx"
    calls = []

    def build(root: Path) -> None:
        calls.append(1)
        _builder("v1")(root)

    assert atomic_fixture(dest, build) == dest
    assert (dest / "_READY").exists()
    assert (dest / "data.txt").read_text() == "v1"
    atomic_fixture(dest, build)
    assert len(calls) == 1  # second call served from cache


def test_crash_leftover_is_rebuilt(tmp_path):
    dest = tmp_path / "fx"
    dest.mkdir()
    (dest / "data.txt").write_text("partial garbage")  # no _READY marker
    atomic_fixture(dest, _builder("rebuilt"))
    assert (dest / "_READY").exists()
    assert (dest / "data.txt").read_text() == "rebuilt"


def test_concurrent_winner_is_kept(tmp_path):
    """If another builder completes dest while we were building, our
    copy is discarded — a reader iterating the winner's files never
    sees them replaced."""
    dest = tmp_path / "fx"

    def racing_build(root: Path) -> None:
        _builder("loser")(root)
        # winner lands while we were building
        dest.mkdir(parents=True, exist_ok=True)
        (dest / "data.txt").write_text("winner")
        (dest / "_READY").touch()

    atomic_fixture(dest, racing_build)
    assert (dest / "data.txt").read_text() == "winner"
    # the loser's staging dir was cleaned up
    assert not list(tmp_path.glob(".fx.building-*"))

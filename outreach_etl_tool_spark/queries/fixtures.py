"""Atomic on-disk fixture cache for query-level replay/layout fixtures.

Several registry queries materialize a deterministic fixture under the
system temp dir (streaming replay slices, partitioned/clustered sink
layouts) and cache it per (version, sf_dir). The cache must be crash-
and concurrency-safe: a half-written fixture that later runs silently
reuse would corrupt the driver's hash-compared gate. The protocol:

- a fixture is valid iff ``<dest>/_READY`` exists (Spark and parquet
  readers ignore underscore-prefixed files);
- builders write into a process-private sibling directory and
  atomically ``rename`` it into place, so readers only ever observe
  absent or complete fixtures;
- concurrent first-builders both build (the content is deterministic,
  so either result is correct); the loser discards its copy rather
  than replacing the winner's, so a reader already iterating the
  winner's files never sees them vanish;
- a crash mid-build leaves only a marker-less directory, which the
  next builder clears and replaces.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from pathlib import Path

_MARKER = "_READY"


def atomic_fixture(dest: Path, build: Callable[[Path], None]) -> Path:
    """Return ``dest``, building it via ``build(tmp_dir)`` if absent."""
    if (dest / _MARKER).exists():
        return dest
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.parent / f".{dest.name}.building-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    build(tmp)
    (tmp / _MARKER).touch()
    if (dest / _MARKER).exists():
        # a concurrent builder won while we built; keep theirs
        shutil.rmtree(tmp, ignore_errors=True)
        return dest
    shutil.rmtree(dest, ignore_errors=True)  # clear crash leftovers
    try:
        tmp.rename(dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return dest


# Single-sourced version for the sink-layout fixture family: bump to
# invalidate every cached layout when construction changes. (The
# streaming replay family keeps its own _FIXTURE_VERSION in
# streamingq.py — its construction evolves independently.)
SINK_FIXTURE_VERSION = 1


def sink_fixture_dest(kind: str, sf_dir: str) -> Path:
    """Canonical cache location for a sink-layout fixture: keyed on
    (SINK_FIXTURE_VERSION, kind, resolved sf_dir) so a version bump
    invalidates EVERY member of the family at once — a call site that
    hardcoded its version would keep serving a stale layout after a
    bump, which is exactly the failure the version exists to prevent."""
    import hashlib
    import tempfile

    key = hashlib.sha1(
        f"{SINK_FIXTURE_VERSION}:{kind}:{Path(sf_dir).resolve()}".encode()
    ).hexdigest()[:12]
    return (
        Path(tempfile.gettempdir())
        / "outreach_etl_spark_sink"
        / f"{kind}_{key}"
    )

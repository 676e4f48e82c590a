"""One-off generator for the full-width endpoint schema files.

Derives `outreach_etl_tool_spark/schemas/*.json` from the reference's
declared sink contracts (`/root/reference/schemas/*.json`, the public
Outreach API column layout) into the repo's compact format:

    {"<flat column name>": "<dtype>", ...}

where dtype ∈ {string, boolean, integer, float, datetime} and every
column is nullable (the reference declares each as ["null", <t>];
nullability is uniform, so the compact form drops it). Run from the
repo root:

    python tools/gen_schemas.py
"""

from __future__ import annotations

import json
from pathlib import Path

REF = Path("/root/reference/schemas")
OUT = Path(__file__).resolve().parent.parent / "outreach_etl_tool_spark" / "schemas"


def compact(ref_file: Path) -> dict[str, str]:
    raw = json.loads(ref_file.read_text())
    out: dict[str, str] = {}
    for col, spec in raw.items():
        declared = [t for t in spec["type"] if t != "null"]
        if len(declared) != 1:
            raise ValueError(f"{ref_file.name}:{col}: ambiguous type {spec}")
        out[col] = declared[0]
    return out


def main() -> None:
    for ref_file in sorted(REF.glob("*.json")):
        cols = compact(ref_file)
        target = OUT / ref_file.name
        target.write_text(json.dumps(cols, indent=1) + "\n")
        print(f"{target.name}: {len(cols)} columns")


if __name__ == "__main__":
    main()

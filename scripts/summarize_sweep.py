#!/usr/bin/env python
"""Collate drive_contract sweep logs into one CORRECTNESS-style JSON artifact.

A big-sf sweep runs in several OS processes (fresh JVM + fresh DuckDB per
chunk bounds accumulated memory), so its evidence is spread over multiple
logs. This folds them into the driver's artifact shape: per query the LAST
status seen across the logs in argument order (a later chunk re-running a
query supersedes an earlier infrastructure failure).

Usage:
    python scripts/summarize_sweep.py --out CORRECTNESS_r06_sf10.json \
        --sf sf10 log1 log2 ...
"""

from __future__ import annotations

import argparse
import json
import re

LINE = re.compile(
    r"(q_[a-z0-9_]+): (?:rows-only, )?rows=(\d+) (MATCH|OK|MISMATCH)"
    r"|(q_[a-z0-9_]+): (ERROR[^\n\r]*)"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", required=True)
    args = ap.parse_args()

    results: dict[str, dict] = {}
    for path in args.logs:
        text = open(path, errors="ignore").read()
        for m in LINE.finditer(text):
            if m.group(1):
                name, rows, status = m.group(1), int(m.group(2)), m.group(3)
                results[name] = {
                    "status": "rows-only" if status == "OK" else status.lower(),
                    "rows": rows,
                }
            else:
                results[m.group(4)] = {"status": "error", "detail": m.group(5)}

    ordered = dict(sorted(results.items()))
    n_match = sum(1 for r in ordered.values() if r["status"] == "match")
    n_rows = sum(1 for r in ordered.values() if r["status"] == "rows-only")
    bad = [k for k, r in ordered.items() if r["status"] not in ("match", "rows-only")]
    artifact = {
        "sf": args.sf,
        "n_queries": len(ordered),
        "n_hash_match": n_match,
        "n_rows_only": n_rows,
        "failed": bad,
        "queries": ordered,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{args.out}: {len(ordered)} queries, {n_match} MATCH, "
          f"{n_rows} rows-only, failed={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

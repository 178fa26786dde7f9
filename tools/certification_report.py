"""Driver-certification staleness report (VERDICT r7 item 6).

The external driver's correctness gate certifies only the FIRST 50
``queries()`` entries each round, so which catalog queries carry a
CURRENT driver-green row is a rotation problem. This tool joins every
``CORRECTNESS_r*.json`` artifact against the live catalog and prints,
per query, the newest round with a hash-green row — classified as:

  never  — no driver row ever (highest rotation priority)
  stale  — newest green row predates ``--since`` (default r6, the
           parallel_scan plan-era change: older rows certify retired
           plans)
  fresh  — certified on the current plan era

With ``--suggest N`` it emits a ready-to-paste rotation list for
``_DRIVER_PRIORITY``: never-certified first, then stale rows oldest
first (catalog order breaks ties), truncated to the window size.

Usage: python tools/certification_report.py [--since 6] [--suggest 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_green_rounds() -> dict[str, int]:
    """query -> newest round whose artifact row is hash-green."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def classify(since: int) -> dict[str, list[tuple[str, int]]]:
    import __spark_entry__ as entry

    catalog = list(entry.queries())
    latest = latest_green_rounds()
    out: dict[str, list[tuple[str, int]]] = {
        "never": [], "stale": [], "fresh": []}
    for name in catalog:
        rnd = latest.get(name, 0)
        bucket = "never" if rnd == 0 else ("stale" if rnd < since else "fresh")
        out[bucket].append((name, rnd))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--since", type=int, default=6,
                    help="rounds before this are stale (default 6)")
    ap.add_argument("--suggest", type=int, metavar="N", default=None,
                    help="emit a rotation list for an N-slot window")
    args = ap.parse_args()

    buckets = classify(args.since)
    for bucket in ("never", "stale", "fresh"):
        rows = buckets[bucket]
        print(f"== {bucket} ({len(rows)}) ==")
        for name, rnd in rows:
            print(f"  r{rnd:02d}  {name}" if rnd else f"  ----  {name}")
    if args.suggest:
        # never first, then stale oldest-first, then — once nothing is
        # never/stale (the steady state since r13) — the oldest FRESH
        # rows, so every round's window still ages out the oldest
        # certifications (stable on catalog order throughout)
        ordered = [n for n, _ in buckets["never"]]
        ordered += [n for n, _ in
                    sorted(buckets["stale"], key=lambda t: t[1])]
        ordered += [n for n, _ in
                    sorted(buckets["fresh"], key=lambda t: t[1])]
        print(f"\n== suggested {args.suggest}-slot rotation ==")
        for name in ordered[:args.suggest]:
            print(f'    "{name}",')
        n_urgent = len(buckets["never"]) + len(buckets["stale"])
        dropped = n_urgent - args.suggest
        if dropped > 0:
            print(f"# ({dropped} more stale rows left for the next round)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

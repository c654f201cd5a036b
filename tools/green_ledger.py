#!/usr/bin/env python
"""Driver-green ledger: merge all CORRECTNESS_r*.json into a per-query
"last driver-green round" table (VERDICT r7 #3).

A query is *driver-green* in round N when its row in CORRECTNESS_rN.json has
rows_match and schema_match true and hash_match true-or-absent (non-SQL ops
get the weaker rows-only check; absent hash is not a failure).

Writes GREEN_LEDGER.json:
  {"max_round": N,
   "rotation_period": ceil(catalog_size / window_size),
   "queries": {name: {"last_green": r|null, "checked": [r, ...]}}}

The committed artifact replaces the hand-maintained rotation comment in
__spark_entry__.py; tests/test_driver_parity.py fails when any query's
driver-green age exceeds the rotation period (catalog_size / 50 per round).

Usage: python tools/green_ledger.py [--repo /root/repo] [--check]
  --check: exit 1 if any catalog query's green age exceeds the rotation
           period (same predicate as the pytest freshness gate).
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import sys

WINDOW_SIZE = 50  # driver oracle-checks the first 50 queries() entries per round


def is_green(res: object) -> bool:
    if not isinstance(res, dict):
        return False
    if not (res.get("rows_match") and res.get("schema_match")):
        return False
    return res.get("hash_match") in (True, None)


def build_ledger(repo: str, catalog: list[str], max_round_cap: int | None = None) -> dict:
    """Merge CORRECTNESS_r*.json files into the ledger.

    ``max_round_cap`` rebuilds the ledger as of a past round (rounds > cap
    are ignored). The freshness gate uses this to compare the committed
    artifact against a rebuild *at its own max_round*: the driver drops
    CORRECTNESS_r{N}.json into the work tree AFTER the builder's final
    round-N commit, so an uncapped rebuild is one round ahead of the
    committed ledger at every round start by construction (VERDICT r8 #2).
    """
    last_green: dict[str, int] = {}
    checked: dict[str, list[int]] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round_cap is not None and rnd > max_round_cap:
            continue
        max_round = max(max_round, rnd)
        with open(path) as fh:
            data = json.load(fh)
        if not isinstance(data, dict):
            continue
        for q, res in data.items():
            checked.setdefault(q, []).append(rnd)
            if is_green(res):
                last_green[q] = max(last_green.get(q, 0), rnd)
    period = max(1, math.ceil(len(catalog) / WINDOW_SIZE)) if catalog else 1
    return {
        "max_round": max_round,
        "catalog_size": len(catalog),
        "window_size": WINDOW_SIZE,
        "rotation_period": period,
        "queries": {
            q: {"last_green": last_green.get(q), "checked": sorted(set(checked.get(q, [])))}
            for q in catalog
        },
    }


def stale_queries(ledger: dict) -> list[tuple[str, object]]:
    """Queries whose driver-green age exceeds the rotation period.

    Age = max_round - last_green (never-green counts as infinite age but is
    tolerated for queries registered within the last rotation_period rounds —
    we can't know registration round from the artifact, so never-green is
    stale only once the query has been *checked* at least once without going
    green, or has existed across >= rotation_period correctness files without
    appearing; practical proxy: never-green AND never-checked => new, OK).
    """
    out = []
    period = ledger["rotation_period"]
    max_round = ledger["max_round"]
    for q, rec in ledger["queries"].items():
        lg = rec["last_green"]
        if lg is None:
            if rec["checked"]:
                out.append((q, None))  # checked but never green → red flag
            continue
        if max_round - lg > period:
            out.append((q, lg))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from etl__project_spark.plans import QUERIES

    ledger = build_ledger(args.repo, list(QUERIES))
    out = os.path.join(args.repo, "GREEN_LEDGER.json")
    with open(out, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=False)
        fh.write("\n")

    stale = stale_queries(ledger)
    never = [q for q, rec in ledger["queries"].items() if rec["last_green"] is None]
    print(
        f"ledger: {ledger['catalog_size']} queries, max_round={ledger['max_round']}, "
        f"rotation_period={ledger['rotation_period']}, never-green={len(never)}, stale={len(stale)}"
    )
    for q, lg in stale:
        print(f"  STALE {q} last_green={lg}")
    if args.check and stale:
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

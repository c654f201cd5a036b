#!/usr/bin/env python
"""End-of-wave idle bench with a FIXED selection rule and an attempts
array (VERDICT r10 #7 + round-11 advisory).

Round 10's idle artifact held the quietest of five hand-picked runs,
with the other four only in SCALE.md prose — auditable but not
machine-readable, and the retroactive pick overstated the win. This
tool makes the protocol mechanical:

* run ``bench.py`` up to ``--attempts`` times (default 5), sequentially,
  capturing each attempt's full JSON;
* SELECTION RULE (fixed in code, not chosen after the fact): the FIRST
  attempt whose ``host_factor`` <= ``--idle-bar`` (default 1.05) is the
  artifact — "first idle-qualifying run"; once one qualifies, no
  further attempts are made. If none qualifies, the attempt with the
  LOWEST host_factor is selected and flagged ``no_attempt_qualified``.
* the artifact leads with the HOST-NORMALIZED headline ratio
  (``baseline_ratio_normalized`` = baseline_ratio / host_factor) — the
  number that survives steal arithmetic — and embeds every attempt's
  host_factor, raw ratio, normalized ratio, and per-query medians.

Usage: python tools/idle_bench.py --out BENCH_IDLE_r11.json
       [--attempts 5] [--idle-bar 1.05]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_bench(repo: str) -> dict | None:
    """One bench.py run; returns its parsed JSON line or None on failure."""
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True,
        text=True,
        cwd=repo,
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    print(proc.stderr[-2000:], file=sys.stderr)
    return None


def attempt_summary(b: dict) -> dict:
    hf = b.get("host_factor")
    ratio = b.get("baseline_ratio")
    norm = (
        round(ratio / hf, 3) if ratio is not None and hf not in (None, 0) else None
    )
    return {
        "host_factor": hf,
        "baseline_ratio": ratio,
        "baseline_ratio_normalized": norm,
        "queries": b.get("queries"),
        "failed": b.get("failed"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--attempts", type=int, default=5)
    ap.add_argument("--idle-bar", type=float, default=1.05)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    attempts: list[dict] = []
    selected_i: int | None = None
    for i in range(args.attempts):
        b = run_bench(repo)
        if b is None:
            attempts.append({"error": "bench run produced no JSON"})
            continue
        attempts.append(attempt_summary(b) | {"_full": b})
        hf = b.get("host_factor")
        print(
            f"attempt {i}: host_factor={hf} raw={b.get('baseline_ratio')} "
            f"norm={attempts[-1]['baseline_ratio_normalized']}",
            file=sys.stderr,
        )
        if hf is not None and hf <= args.idle_bar and not b.get("failed"):
            selected_i = i
            break  # FIRST qualifying run wins; stop measuring

    qualified = selected_i is not None
    if not qualified:
        candidates = [
            (i, a) for i, a in enumerate(attempts) if a.get("host_factor")
        ]
        if not candidates:
            print("no successful bench attempt", file=sys.stderr)
            return 1
        selected_i = min(candidates, key=lambda t: t[1]["host_factor"])[0]

    selected_full = attempts[selected_i].pop("_full")
    for a in attempts:
        a.pop("_full", None)
    artifact = {
        # headline FIRST and host-normalized (round-11 advisory: the raw
        # ratio under host_factor < 1 overstates the win)
        "baseline_ratio_normalized": attempts[selected_i][
            "baseline_ratio_normalized"
        ],
        "selection_rule": (
            f"first attempt with host_factor <= {args.idle_bar} and no "
            "failed queries (sequential attempts; measurement stops at the "
            "first qualifying run)"
        ),
        "selected_attempt": selected_i,
        "attempt_qualified": qualified,
        "attempts": attempts,
        "selected": selected_full,
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
        fh.write("\n")
    print(
        f"selected attempt {selected_i} (qualified={qualified}): "
        f"normalized={artifact['baseline_ratio_normalized']}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

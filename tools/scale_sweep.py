"""Run every catalog query at a given fixture dir and time it.

Timing-only (no DuckDB oracle) — used to catch superlinear operators by
comparing per-query wall time between /root/testdata/sf0.1 and the 10x
fixture at .scratch/sf1 (tools/gen_scale_fixture.py).

Usage: python tools/scale_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from etl__project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    only = set(sys.argv[2:])
    spark = get_spark()
    queries = entrymod.queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}
    out: dict[str, dict] = {}
    for name, fn in queries.items():
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            out[name] = {"sec": round(time.monotonic() - t0, 2), "rows": n}
        except Exception as exc:  # noqa: BLE001
            out[name] = {
                "sec": round(time.monotonic() - t0, 2),
                "err": f"{type(exc).__name__}: {exc}"[:200],
            }
        print(json.dumps({name: out[name]}), flush=True)
    ranked = sorted(out.items(), key=lambda kv: -kv[1]["sec"])
    print(json.dumps({"total_sec": round(sum(v["sec"] for v in out.values()), 1),
                      "slowest": ranked[:10]}, indent=None), flush=True)


if __name__ == "__main__":
    main()

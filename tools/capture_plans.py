"""Capture ``explain("formatted")`` for queries into plans/r<N>/.

Usage: python tools/capture_plans.py <round> <suffix> [query ...]

Writes ``plans/r<round>/<query>_<suffix>.txt`` for each query (default:
the bench HEADLINE list). The optimization-round judge checks plan-shape
claims (Exchange counts, join strategies, PushedFilters) against these
committed files, so they are generated from the same sf0.1 fixtures the
bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from etl__project_spark.plans import QUERIES  # noqa: E402
from etl__project_spark.session import get_spark  # noqa: E402


def main() -> None:
    rnd, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        buf = io.StringIO()
        try:
            df = QUERIES[name](spark, sf_dir)
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as exc:  # noqa: BLE001
            buf.write(f"EXPLAIN FAILED: {exc}\n")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}``.

Each query is forced end-to-end with a noop sink (full compute, no
driver-side collect overhead). Session startup and the one warm-up action
are excluded — the driver compares engine throughput, not JVM boot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl__project_spark.plans import QUERIES  # noqa: E402
from etl__project_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "vs_fact",
    "vs_fact_rollup",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_region_volume",
    "tpch_topn_per_group",
    "ev_minute_rollup",
    "ev_sessionize",
    "doc_lsh_pairs",
    "doc_simhash",
    "doc_tfidf_top_terms",
    "ev_asof_signup",
    "emb_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Warm up the JVM / filesystem once so per-query numbers measure the
    # engine, not first-touch costs: tiny sf0.001 runs covering each
    # query family compile the join/window/agg/explode/minhash codegen
    # paths and initialize the parquet readers (incl. the nanos-ts
    # events table) before anything is timed.
    # Failure isolation: one broken query must cost one null data point,
    # never the whole bench file (round-2 lesson: an uncaught warm-up
    # error produced rc=1 and zero numbers).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for warm in ("vs_fact", "doc_lsh_pairs", "ev_sessionize", "emb_cosine_topk"):
        try:
            QUERIES[warm](spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {warm} failed: {exc}", file=sys.stderr)
        spark.catalog.clearCache()

    timings: dict[str, float | None] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"query {name} failed: {exc}", file=sys.stderr)
            timings[name] = None
        # Drop persisted frames a query may have left behind so later
        # queries aren't measured under another query's cache/GC pressure.
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t is not None), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

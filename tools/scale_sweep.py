"""Run every catalog query at a given fixture dir and time it.

Timing-only (no DuckDB oracle) — used to catch superlinear operators by
comparing per-query wall time between /root/testdata/sf0.1 and the 10x
fixture at .scratch/sf1 (tools/gen_scale_fixture.py).

The documented audit-class queries (exact similarity baselines whose
cost models are deliberately quadratic in bounded inputs — SCALE.md §5/
§10) are SKIPPED by default: on the replicated fixtures their candidate
spaces grow ~100× per 10× data by construction, and a full-sweep run
that includes them measures the fixture's length/pair collisions, not
the engine (round-4 measurement: doc_jaccard_pairs alone was 1954 s of
a 3021 s sweep at sf1). Pass --all to include them, or name them
explicitly.

``--collapse-first`` (VERDICT r8 #5) runs the named queries against a
derived fixture whose ``documents`` table has been exact-dup collapsed
(md5(text) groupBy, min-doc_id survivor — ``doc_dedup_exact``'s
semantics, the pre-step ``doc_dedup_canonical`` codes for). This is the
deployment shape the §9m exclusion notes prescribe for the replicated
fixtures' cross-replica band collisions: the LSH/components maintenance
state is only ever built over the collapsed corpus, so the sweep measures
the engine path instead of the fixture pathology. The collapsed fixture
is materialized once per sf_dir (at ``{sf_dir}_collapsed/``) and reused.

Usage: python tools/scale_sweep.py [--all] [--collapse-first] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from etl__project_spark.session import get_spark  # noqa: E402

# Exact-verification audit paths for bounded inputs; see the operators'
# docstrings for their cost models and their scale-path twins.
AUDIT_CLASS = {
    "doc_jaccard_pairs",      # Σ n_b² over length buckets
    "doc_jaccard_prefix",     # Σ df² over shingle postings
    "doc_lsh_recall_audit",   # contains the lossless pair set
    "emb_near_dup_pairs",     # O(N²/2) cross join (allow_quadratic)
    "doc_simhash_pairs",      # 16-bit signature → 2^4 buckets per band:
                              # candidates are O(N²/16) by CONSTRUCTION
                              # (57 M pairs / 154 s at sf1); the scale
                              # twin is doc_simhash_wide_pairs (60-bit,
                              # 2^15-bucket bands, Manku et al. 2007)
    "doc_containment_pairs",  # Σ shared-shingles over LSH candidates — the
                              # word-soup fixture's band collisions (618 M
                              # candidates at sf10, SCALE.md §9) make the
                              # per-row semantics fixture-pathological; the
                              # deployment fix is exact-dup collapse first,
                              # as canonical_components codes for components
    "emb_semantic_dedup",     # Σ|cluster|² pair join at FIXED k=8 clusters:
                              # quadratic in the corpus by construction (135 s
                              # at sf1 when the pair join actually executes —
                              # beware: a bare count() of the audit frame
                              # join-eliminates it and measures nothing); the
                              # scale path is k ∝ N (SemDeDup's ~1e5 clusters;
                              # SCALE.md §9h)
    "emb_pipeline_e2e",       # contains the same fixed-k=8 dedup stage; the
                              # scale knob is its n_clusters parameter
                              # (SCALE.md §9h measures k scaled with N)
}


def collapsed_fixture(spark, sf_dir: str) -> str:
    """Materialize (once) the exact-dup-collapsed documents fixture next
    to ``sf_dir`` and return its path. Collapse = md5(text) groupBy with
    the min-doc_id survivor, one shuffle of 16-byte keys."""
    from pyspark.sql import functions as F

    out = sf_dir.rstrip("/") + "_collapsed"
    marker = os.path.join(out, "_COLLAPSED_OK")
    if not os.path.exists(marker):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        survivors = (
            docs.groupBy(F.md5("text").alias("__h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        collapsed = docs.join(survivors, "doc_id", "left_semi")
        collapsed.write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        with open(marker, "w") as fh:
            fh.write(f"source={sf_dir}\n")
    return out


def main() -> None:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    include_audits = "--all" in flags
    collapse_first = "--collapse-first" in flags
    sf_dir = args[0] if args else ".scratch/sf1"
    only = set(args[1:])
    spark = get_spark()
    if collapse_first:
        t0 = time.monotonic()
        sf_dir = collapsed_fixture(spark, sf_dir)
        print(
            json.dumps(
                {"collapsed_fixture": sf_dir,
                 "collapse_sec": round(time.monotonic() - t0, 2)}
            ),
            flush=True,
        )
    queries = entrymod.queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}
    elif not include_audits:
        skipped = sorted(AUDIT_CLASS & queries.keys())
        queries = {k: v for k, v in queries.items() if k not in AUDIT_CLASS}
        print(json.dumps({"skipped_audit_class": skipped}), flush=True)
    from pyspark.sql import functions as F

    out: dict[str, dict] = {}
    for name, fn in queries.items():
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            # Count via a hash over EVERY column, so Catalyst cannot
            # prune/join-eliminate the expensive stages under the
            # timer — a bare count() of an audit frame whose flag
            # comes from a distinct-keyed LEFT join measures a scan,
            # not the operator (caught on emb_semantic_dedup: 8.5 s
            # "swept" vs 135 s real at sf1; SCALE.md §9h).
            forced = df.select(
                F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
            )
            n = forced.agg(
                F.count(F.lit(1)).alias("n"), F.expr("bit_xor(__h)")
            ).collect()[0]["n"]
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

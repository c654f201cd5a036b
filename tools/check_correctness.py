"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet tables), then compares
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...] [--json OUT]

``--json OUT`` additionally writes a per-query artifact in the driver's
CORRECTNESS_r{N}.json shape — committed per round as
``CORRECTNESS_FULL.json`` so queries rotated out of the driver's 50-slot
window keep an in-repo green record (ADVICE r5).

The comparison core (``oracle_views`` / ``compare_query``) is imported
by ``tests/test_oracle_gate.py`` so the same value-hash check runs as a
marked pytest (``pytest -m oracle``) — a regression in a query rotated
out of the driver's 50-entry window fails in-repo before the driver
ever sees it.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from etl__project_spark.sources.tables import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.where(col.notna(), None)
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = normalize(df)
    strs = df.astype(str)
    rows = sorted("\x1f".join(r) for r in strs.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def oracle_views(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with every fixture table registered as a view,
    mirroring the driver's oracle setup."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_query(spark, con, sf_dir, name, fn, sql) -> list[str]:
    """Run one Spark query and its DuckDB oracle; return a list of
    problems (empty = pass). ``sql=None`` marks a weak (rows-only)
    check, mirroring the driver."""
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        return []  # weak: Spark execution itself is the check
    odf = con.execute(sql).fetchdf()
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rows {len(sdf)} != {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
    elif value_hash(sdf) != value_hash(odf):
        problems.append("value-hash mismatch")
        a, b = normalize(sdf).astype(str), normalize(odf).astype(str)
        a = a.sort_values(list(a.columns), ignore_index=True)
        b = b.sort_values(list(b.columns), ignore_index=True)
        if len(a) == len(b):
            diff = a.compare(b)
            problems.append(f"first diffs:\n{diff.head(5)}")
    return problems


def main() -> int:
    import __spark_entry__ as entrymod
    from etl__project_spark.session import get_spark

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            raise SystemExit("usage: --json OUT_PATH [sf_dir] [query ...]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("correctness-check")
    con = oracle_views(sf_dir)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            problems = compare_query(
                spark, con, sf_dir, name, fn, oracles.get(name)
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: error: {e}")
            results[name] = {"ok": False, "err": str(e)[:300]}
            n_fail += 1
            continue
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: {'; '.join(str(p) for p in problems)}")
            results[name] = {
                "ok": False,
                "err": "; ".join(str(p) for p in problems)[:300],
            }
        elif name not in oracles:
            print(f"weak  {name}: spark-only (no oracle)")
            results[name] = {"ok": True, "weak": True, "err": None}
        else:
            print(f"ok    {name}")
            results[name] = {"ok": True, "err": None}
    spark.stop()
    print(f"\n{n_fail} failures")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": results}, fh, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Driver-parity gate: every catalog query must analyze under a session
that looks like the DRIVER's, not like ``get_spark``'s.

Round-2 lesson: the fixtures were regenerated with ``timestamp[us]``
(no timezone) parquet columns, Spark 4 read them as TIMESTAMP_NTZ, and
five queries + the whole bench died at analysis time — but every local
test passed, because ``get_spark`` (and the old fixtures) masked it.
This test strips the engine-session confs back to driver-like defaults
and builds ALL query plans against the live fixtures, so a fixture or
session-conf skew fails here first.

Plan *analysis* (``df.schema``) is forced for every query — that is the
phase where type mismatches (e.g. ``unix_micros(TIMESTAMP_NTZ)``) and
unresolved columns surface. The timestamp-sensitive queries are also
executed end-to-end at sf0.001.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# Confs the engine relies on. The driver's session does not set these at
# builder time; load_table must (re-)establish whatever it needs at call
# time. Unsetting them per-test simulates a fresh driver session even
# though pytest shares one JVM.
_ENGINE_CONFS = [
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.parquet.inferTimestampNTZ.enabled",
    "spark.sql.session.timeZone",
]


@pytest.fixture()
def vanilla(spark):
    driverlike = spark.newSession()
    for k in _ENGINE_CONFS:
        try:
            driverlike.conf.unset(k)
        except Exception:  # noqa: BLE001 — not set in this session
            pass
    # ADVICE r3: unset alone restores JVM defaults, which on a
    # UTC-configured machine can coincide with the engine confs — force
    # the skew explicitly so the simulation diverges on ANY machine. The
    # engine (load_table/_ensure_session_confs) must claw all of these
    # back at call time for the tests below to pass.
    driverlike.conf.set("spark.sql.session.timeZone", "America/New_York")
    driverlike.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    return driverlike


def test_all_query_plans_analyze_on_vanilla_session(vanilla):
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            fn(vanilla, SF).schema  # noqa: B018 — forces plan analysis
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "queries failing driver-like analysis:\n" + "\n".join(failures)


@pytest.mark.parametrize(
    "name",
    [
        "ev_sessionize",
        "ev_session_window_native",
        "ev_range_lookback",
        "ev_funnel_steps",
        "ev_retention",
        "ev_minute_rollup",
        "ev_asof_signup",
    ],
)
def test_timestamp_queries_execute_on_vanilla_session(vanilla, name):
    assert entrymod.queries()[name](vanilla, SF).count() >= 0


@pytest.mark.parametrize("name", ["ev_minute_rollup", "ev_asof_signup"])
def test_timestamp_query_values_match_engine_session(spark, vanilla, name):
    """ADVICE r3: count()>=0 can't catch a timezone shift — the rows
    still exist, just with displaced timestamps. Compare full result
    VALUES between the hostile driver-like session (non-UTC tz, NTZ
    inference on) and the engine session; any tz leakage into query
    results shows up as shifted minute buckets / as-of matches."""
    fn = entrymod.queries()[name]
    engine_rows = sorted(map(str, fn(spark, SF).collect()))
    vanilla_rows = sorted(map(str, fn(vanilla, SF).collect()))
    assert engine_rows == vanilla_rows


def test_events_ts_loads_as_timestamp_not_ntz(vanilla):
    from etl__project_spark.sources import load_table

    ts_type = dict(load_table(vanilla, SF, "events").dtypes)["ts"]
    assert ts_type == "timestamp", f"events.ts loaded as {ts_type}"


def test_catalog_doc_is_fresh():
    """CATALOG.md is generated from the live catalog; regenerate with
    `python tools/gen_catalog_doc.py > CATALOG.md` when queries change."""
    import io
    import pathlib
    import contextlib

    import tools.gen_catalog_doc as gen

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gen.main()
    want = buf.getvalue()
    got = pathlib.Path(__file__).resolve().parents[1].joinpath("CATALOG.md").read_text()
    assert got == want, "CATALOG.md is stale — regenerate with tools/gen_catalog_doc.py"


def test_readme_query_count_is_fresh():
    """The README's 'all N queries' claim must track the live catalog
    (VERDICT r5 #7 — the r5 README said 145 when the catalog was 151).
    Update the README number when adding queries; this test is the
    freshness gate."""
    import pathlib
    import re

    import __spark_entry__ as entrymod

    text = pathlib.Path(__file__).resolve().parents[1].joinpath(
        "README.md"
    ).read_text()
    m = re.search(r"all (\d+) queries", text)
    assert m, "README no longer states the catalog query count"
    assert int(m.group(1)) == len(entrymod.queries()), (
        f"README claims {m.group(1)} catalog queries, live catalog has "
        f"{len(entrymod.queries())} — update README.md"
    )


def test_green_ledger_is_fresh_and_rotation_holds():
    """GREEN_LEDGER.json (VERDICT r7 #3) is the checked replacement for the
    hand-maintained rotation comment: it merges every CORRECTNESS_r*.json
    into a per-query last-driver-green table. This gate fails when (a) the
    committed artifact is stale vs a rebuild from the same inputs, or (b)
    any query's driver-green age exceeds the rotation period
    (ceil(catalog/50) rounds) — i.e. the _PRIORITY_R{N} window stopped
    rotating. Regenerate with `python tools/green_ledger.py`."""
    import json
    import pathlib

    from etl__project_spark.plans import QUERIES
    from tools.green_ledger import build_ledger, stale_queries

    repo = pathlib.Path(__file__).resolve().parents[1]
    committed = json.loads(repo.joinpath("GREEN_LEDGER.json").read_text())
    # Compare against a rebuild capped at the committed ledger's own
    # max_round: the driver drops CORRECTNESS_r{N}.json after the builder's
    # final round-N commit, so at every round start the work tree holds one
    # correctness file newer than anything the committed ledger could have
    # seen (VERDICT r8 #2). Capping makes the comparison race-free while
    # still catching a ledger that is stale vs the files it *did* see.
    rebuilt_at_commit = build_ledger(
        str(repo), list(QUERIES), max_round_cap=committed.get("max_round")
    )
    assert committed == rebuilt_at_commit, (
        "GREEN_LEDGER.json is stale — regenerate with tools/green_ledger.py"
    )
    # The rotation gate runs on the FULL rebuild (including any untracked
    # round-start correctness file) — staleness must reflect all evidence.
    rebuilt = build_ledger(str(repo), list(QUERIES))
    stale = stale_queries(rebuilt)
    assert not stale, (
        f"driver-green rotation violated (age > {rebuilt['rotation_period']} "
        f"rounds): {stale} — put these at the head of the next _PRIORITY_R{{N}} "
        "window in __spark_entry__.py"
    )


def test_priority_window_head_is_live():
    """Every name in the rotation window must exist in the catalog — a
    typo'd priority entry silently wastes a driver slot."""
    from etl__project_spark.plans import QUERIES

    priority_attrs = sorted(
        (name for name in vars(entrymod) if name.startswith("_PRIORITY_R")),
        key=lambda n: int(n.rsplit("R", 1)[1]),
    )
    assert priority_attrs, "no _PRIORITY_R{N} window defined in __spark_entry__"
    window = getattr(entrymod, priority_attrs[-1])
    unknown = [q for q in window if q not in QUERIES]
    assert not unknown, f"{priority_attrs[-1]} names not in catalog: {unknown}"


def test_plans_census_query_list_is_fresh():
    """PLANS.md is regenerated by hand-run tooling (`python
    tools/plan_census.py > PLANS.md`, ~5 min) — unlike CATALOG.md it
    has no cheap full-content twin, so this gate (VERDICT r6 #5) pins
    the query LIST against the live catalog: a census that silently
    lacks (or orphans) queries fails here without re-deriving the
    per-plan counts."""
    import pathlib
    import re

    from etl__project_spark.plans import QUERIES

    text = pathlib.Path(__file__).resolve().parents[1].joinpath(
        "PLANS.md"
    ).read_text()
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    missing = sorted(set(QUERIES) - listed)
    orphaned = sorted(listed - set(QUERIES))
    assert not missing and not orphaned, (
        f"PLANS.md is stale vs the live catalog (missing: {missing}, "
        f"orphaned: {orphaned}) — regenerate with tools/plan_census.py"
    )

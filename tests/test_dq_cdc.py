"""Incremental DQ monitoring (operators/quality.py:
maintain_dq_suite_cdc): violation counters must track the batch suite
exactly through uniqueness-multiplicity and orphan-state transitions —
the two check classes that need per-key state, not just signed sums."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl__project_spark.operators.quality import maintain_dq_suite_cdc


def _parent(spark, rows):
    """rows: (pid, ord, val)"""
    return spark.createDataFrame(rows, "pid long, ord long, val long")


def _child(spark, rows):
    """rows: (pid, line, qty)"""
    return spark.createDataFrame(rows, "pid long, line long, qty long")


def _pbatch(spark, rows):
    return spark.createDataFrame(rows, "pid long, ord long, val long, op string")


def _cbatch(spark, rows):
    return spark.createDataFrame(rows, "pid long, line long, qty long, op string")


def _checks():
    # built lazily — Column expressions need an active SparkContext
    return dict(
        child_checks={"qty_in_range": (F.col("qty") < 0) | (F.col("qty") > 100)},
        parent_checks={"val_not_null": F.col("val").isNull()},
        fk="pid",
        pk="pid",
        key_cols_child=["pid", "line"],
        key_cols_parent=["pid", "ord"],
        child_table="child",
        parent_table="parent",
        unique_check="pid_unique",
        ref_check="pid_ref_parent",
    )


def _suite(df):
    return {
        (r["table_name"], r["check_name"]): (r["n_violations"], r["passed"])
        for r in df.collect()
    }


def _expected(parent_rows, child_rows):
    pids = [p for p, _, _ in parent_rows]
    live = set(pids)
    return {
        ("parent", "val_not_null"): sum(1 for _, _, v in parent_rows if v is None),
        ("parent", "pid_unique"): len(pids) - len(set(pids)),
        ("child", "qty_in_range"): sum(
            1 for _, _, q in child_rows if q < 0 or q > 100
        ),
        ("child", "pid_ref_parent"): sum(
            1 for p, _, _ in child_rows if p not in live
        ),
    }


def _check(got, parent_rows, child_rows):
    want = _expected(parent_rows, child_rows)
    assert {k: v[0] for k, v in got.items()} == want
    for k, (n, passed) in got.items():
        assert passed == (n == 0)


def test_orphans_appear_when_parent_deleted_and_heal_on_reinsert(spark):
    initial_p = _parent(spark, [(1, 0, 10), (2, 0, 20)])
    initial_c = _child(spark, [(1, 1, 5), (1, 2, 5), (2, 1, 5)])
    got = maintain_dq_suite_cdc(
        initial_c,
        initial_p,
        [None, None],
        [
            _pbatch(spark, [(1, 0, 10, "D")]),  # 2 children orphaned
            _pbatch(spark, [(1, 0, 11, "I")]),  # healed
        ],
        **_checks(),
    )
    _check(
        _suite(got),
        [(1, 0, 11), (2, 0, 20)],
        [(1, 1, 5), (1, 2, 5), (2, 1, 5)],
    )


def test_dup_multiplicity_rises_and_falls(spark):
    initial_p = _parent(spark, [(1, 0, 10)])
    got = maintain_dq_suite_cdc(
        _child(spark, []),
        initial_p,
        [None, None, None],
        [
            _pbatch(spark, [(1, 1, 10, "I"), (1, 2, 10, "I")]),  # mult 3 → 2 dups
            _pbatch(spark, [(1, 1, 10, "D")]),  # mult 2 → 1 dup
            _pbatch(spark, [(1, 2, 10, "D")]),  # mult 1 → clean
        ],
        **_checks(),
    )
    _check(_suite(got), [(1, 0, 10)], [])


def test_dq_cdc_random_property_vs_replay(spark):
    random.seed(71)
    pstate = {}  # (pid, ord) -> val
    cstate = {}  # (pid, line) -> qty
    for i in range(15):
        pstate[(i % 10, i // 10)] = random.choice([None, 1, 2, 200])
    for i in range(25):
        cstate[(random.randrange(14), i)] = random.choice([-5, 5, 50, 150])
    initial_p = _parent(spark, [(p, o, v) for (p, o), v in pstate.items()])
    initial_c = _child(spark, [(p, l_, q) for (p, l_), q in cstate.items()])
    pbatches, cbatches = [], []
    for _ in range(3):
        pops, seen = [], set()
        for _ in range(6):
            if pstate and random.random() < 0.5:
                k = random.choice(list(pstate))
                if k in seen:
                    continue
                seen.add(k)
                if random.random() < 0.5:
                    pops.append((*k, pstate[k], "D"))
                    del pstate[k]
                else:
                    v = random.choice([None, 3, 300])
                    pops.append((*k, v, "U"))
                    pstate[k] = v
            else:
                k = (random.randrange(14), random.randrange(5))
                if k in pstate or k in seen:
                    continue
                seen.add(k)
                v = random.choice([None, 4])
                pops.append((*k, v, "I"))
                pstate[k] = v
        cops, cseen = [], set()
        for _ in range(8):
            if cstate and random.random() < 0.5:
                k = random.choice(list(cstate))
                if k in cseen:
                    continue
                cseen.add(k)
                if random.random() < 0.5:
                    cops.append((*k, cstate[k], "D"))
                    del cstate[k]
                else:
                    q = random.choice([-1, 10, 120])
                    cops.append((*k, q, "U"))
                    cstate[k] = q
            else:
                k = (random.randrange(16), random.randrange(100, 200))
                if k in cstate or k in cseen:
                    continue
                cseen.add(k)
                q = random.choice([-2, 20, 130])
                cops.append((*k, q, "I"))
                cstate[k] = q
        pbatches.append(_pbatch(spark, pops))
        cbatches.append(_cbatch(spark, cops))
    got = maintain_dq_suite_cdc(
        initial_c, initial_p, cbatches, pbatches, **_checks()
    )
    _check(
        _suite(got),
        [(p, o, v) for (p, o), v in pstate.items()],
        [(p, l_, q) for (p, l_), q in cstate.items()],
    )

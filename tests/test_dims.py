"""Surrogate keys (I1), SCD Type-1 upsert (J1), SCD Type-2 (§2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl__project_spark.operators import scd1_upsert, scd2_upsert, with_dense_ids


def test_dense_ids_scalable_path(spark):
    df = spark.range(0, 1000).select(
        F.concat(F.lit("k"), F.format_string("%04d", F.col("id"))).alias("nk")
    )
    out = with_dense_ids(df, "nk", id_col="skey", start=7, num_partitions=8).collect()
    by_key = sorted(out, key=lambda r: r["nk"])
    assert [r["skey"] for r in by_key] == list(range(7, 1007))


def test_dense_ids_small_path(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "nk string")
    out = {r["nk"]: r["skey"] for r in with_dense_ids(df, "nk", small=True).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_scd1_insert_new_only(spark):
    dim = spark.createDataFrame([(0, "a"), (1, "b")], "skey long, nk string")
    delta = spark.createDataFrame([("b",), ("c",), ("d",), ("c",)], "nk string")
    out = {r["nk"]: r["skey"] for r in scd1_upsert(dim, delta, "nk", "skey").collect()}
    # existing keys keep their skeys; new keys continue densely in key order
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_scd1_empty_dim_bootstrap(spark):
    dim = spark.createDataFrame([], "skey long, nk string")
    delta = spark.createDataFrame([("x",), ("y",)], "nk string")
    out = {r["nk"]: r["skey"] for r in scd1_upsert(dim, delta, "nk", "skey").collect()}
    assert out == {"x": 0, "y": 1}


def test_scd2_new_changed_unchanged(spark):
    """The FIXTURES.md §A2 SCD2 scenario: one changed, one new, one
    unchanged delta row against a current dimension."""
    import datetime as dt

    d = dt.date.fromisoformat
    dim = spark.createDataFrame(
        [
            (0, "a", "red", "Y", d("2020-01-01"), d("9999-12-31")),
            (1, "b", "blue", "Y", d("2020-01-01"), d("9999-12-31")),
        ],
        "skey long, nk string, attr string, current_flag string, "
        "start_date date, end_date date",
    )
    delta = spark.createDataFrame(
        [("a", "green"), ("b", "blue"), ("c", "black")], "nk string, attr string"
    )
    out = scd2_upsert(dim, delta, "nk", ["attr"], "skey", load_date="2021-06-15")
    rows = {(r["nk"], r["current_flag"]): r for r in out.collect()}
    # changed key: old version expired the day before load
    old_a = rows[("a", "N")]
    assert str(old_a["end_date"]) == "2021-06-14" and old_a["skey"] == 0
    new_a = rows[("a", "Y")]
    assert new_a["attr"] == "green" and str(new_a["start_date"]) == "2021-06-15"
    assert str(new_a["end_date"]) == "9999-12-31"
    # unchanged key: untouched
    assert rows[("b", "Y")]["attr"] == "blue" and rows[("b", "Y")]["skey"] == 1
    # new key: inserted current
    assert rows[("c", "Y")]["attr"] == "black"
    # new skeys continue past the old max and are distinct
    skeys = [r["skey"] for r in rows.values()]
    assert len(set(skeys)) == len(skeys) == 4
    assert {rows[("a", "Y")]["skey"], rows[("c", "Y")]["skey"]} == {2, 3}


def test_scd2_exactly_one_current_per_key(spark):
    import datetime as dt

    d = dt.date.fromisoformat
    dim = spark.createDataFrame(
        [(0, "a", "v1", "Y", d("2020-01-01"), d("9999-12-31"))],
        "skey long, nk string, attr string, current_flag string, "
        "start_date date, end_date date",
    )
    d1 = spark.createDataFrame([("a", "v2")], "nk string, attr string")
    once = scd2_upsert(dim, d1, "nk", ["attr"], "skey", load_date="2021-01-01")
    d2 = spark.createDataFrame([("a", "v3")], "nk string, attr string")
    twice = scd2_upsert(once, d2, "nk", ["attr"], "skey", load_date="2022-01-01")
    cur = twice.filter(F.col("current_flag") == "Y").collect()
    assert len(cur) == 1 and cur[0]["attr"] == "v3"
    assert twice.count() == 3  # full history retained


def test_scd2_same_batch_multi_version(spark):
    """SURVEY §7 hard part 4: two different attr versions of one key in a
    SINGLE delta batch must yield exactly one current_flag='Y' row —
    last-writer-wins on the ordering column."""
    import datetime as dt

    d = dt.date.fromisoformat
    dim = spark.createDataFrame(
        [(0, "a", "v1", "Y", d("2020-01-01"), d("9999-12-31"))],
        "skey long, nk string, attr string, current_flag string, "
        "start_date date, end_date date",
    )
    delta = spark.createDataFrame(
        [("a", "v2", 1), ("a", "v3", 2), ("b", "x1", 1), ("b", "x2", 2)],
        "nk string, attr string, seq int",
    )
    out = scd2_upsert(
        dim, delta, "nk", ["attr"], "skey", load_date="2021-01-01", order_col="seq"
    )
    cur = {r["nk"]: r["attr"] for r in out.filter(F.col("current_flag") == "Y").collect()}
    assert cur == {"a": "v3", "b": "x2"}  # one current row per key, last write wins
    assert out.filter(F.col("current_flag") == "Y").count() == 2
    # the superseded v1 row is expired, not dropped
    assert out.filter((F.col("nk") == "a") & (F.col("current_flag") == "N")).count() == 1


def test_scd2_same_batch_no_order_col_deterministic(spark):
    """Without order_col the within-batch pick is deterministic (attr-value
    ordering) and still yields exactly one current row per key."""
    import datetime as dt

    d = dt.date.fromisoformat
    dim = spark.createDataFrame(
        [],
        "skey long, nk string, attr string, current_flag string, "
        "start_date date, end_date date",
    )
    delta = spark.createDataFrame(
        [("a", "v1"), ("a", "v2")], "nk string, attr string"
    )
    out1 = scd2_upsert(dim, delta, "nk", ["attr"], "skey", load_date="2021-01-01")
    out2 = scd2_upsert(dim, delta, "nk", ["attr"], "skey", load_date="2021-01-01")
    r1 = out1.filter(F.col("current_flag") == "Y").collect()
    r2 = out2.filter(F.col("current_flag") == "Y").collect()
    assert len(r1) == len(r2) == 1 and r1[0]["attr"] == r2[0]["attr"] == "v2"


def test_scd2_asof_lookup_routes_versions(spark):
    """The AS OF lookup must return exactly one version per (probe,
    key); keys changed in batch 2 resolve to their OLD attribute at the
    early probe and the NEW one at the late probe; brand-new keys
    appear only at the late probe."""
    from pyspark.sql import functions as F

    from etl__project_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["vs_scd2_asof_lookup"](spark, sf)
    # exactly one valid version per (probe, key)
    dup = (
        out.groupBy("probe_date", "datetime")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    dim = QUERIES["vs_scd2_upsert"](spark, sf)
    changed = dim.filter(F.col("current_flag") == "N").select("datetime").distinct()
    n_changed = changed.count()
    if n_changed:
        early = out.filter(F.col("probe_date") == "2021-01-01").alias("e")
        late = out.filter(F.col("probe_date") == "2021-07-01").alias("l")
        both = early.join(late, early["datetime"] == late["datetime"]).join(
            changed.alias("c"), F.col("e.datetime") == F.col("c.datetime")
        )
        # every changed key flips attribute between the probes
        assert both.filter(F.col("e.attr") == F.col("l.attr")).count() == 0
        assert both.count() == n_changed


def _multi_dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "skey long, nk long, attr string, current_flag string, "
        "start_ord long, end_ord long",
    )


def test_scd2_multi_intra_batch_versions(spark):
    """One batch carrying several ordered changes per key: every
    distinct consecutive state becomes its own half-open interval,
    consecutive duplicates collapse, a first version equal to the
    dim's current attrs is a no-op, and the current row expires at the
    first new version's ordinal (VERDICT r6 gap #5)."""
    from etl__project_spark.operators import scd2_upsert_multi

    EOT = 253402300800000000
    dim = _multi_dim(
        spark,
        [
            (0, 1, "a", "Y", 100, EOT),   # key 1: will take 2 new versions
            (1, 2, "x", "Y", 100, EOT),   # key 2: batch opens with a no-op
            (2, 3, "q", "Y", 100, EOT),   # key 3: untouched
        ],
    )
    delta = spark.createDataFrame(
        [
            (1, "b", 200, 1),  # change
            (1, "b", 210, 2),  # consecutive dup -> collapsed
            (1, "c", 220, 3),  # change
            (2, "x", 300, 4),  # equals current -> no-op
            (2, "y", 310, 5),  # change
            (4, "n1", 400, 6),  # brand-new key, two versions
            (4, "n2", 410, 7),
        ],
        "nk long, attr string, ord long, eid long",
    )
    out = scd2_upsert_multi(
        dim, delta, "nk", ["attr"], "skey", "ord", tiebreak_cols=["eid"]
    ).collect()
    rows = {
        (r["nk"], r["start_ord"]): (r["attr"], r["current_flag"], r["end_ord"])
        for r in out
    }
    assert rows == {
        (1, 100): ("a", "N", 200),   # expired at first new version
        (1, 200): ("b", "N", 220),   # dup at 210 collapsed into this span
        (1, 220): ("c", "Y", EOT),
        (2, 100): ("x", "N", 310),   # no-op at 300 left it current until 310
        (2, 310): ("y", "Y", EOT),
        (3, 100): ("q", "Y", EOT),   # untouched
        (4, 400): ("n1", "N", 410),
        (4, 410): ("n2", "Y", EOT),
    }
    # exactly one current row per key; skeys dense past max(dim)
    cur = [r for r in out if r["current_flag"] == "Y"]
    assert sorted(r["nk"] for r in cur) == [1, 2, 3, 4]
    new_skeys = sorted(r["skey"] for r in out if r["start_ord"] >= 200)
    assert new_skeys == [3, 4, 5, 6, 7]


def test_scd2_multi_equals_one_at_a_time_replay(spark):
    """Property (random batches): the one-pass multi-version upsert
    equals folding the batch's rows through a Python SCD2 model one
    row at a time in ordinal order."""
    import random

    from etl__project_spark.operators import scd2_upsert_multi

    random.seed(17)
    EOT = 253402300800000000
    keys = list(range(6))
    dim_rows, model = [], {}  # model[nk] = list of [attr, start, end, flag]
    for skey, nk in enumerate(keys[:4]):  # 4 pre-existing keys
        attr = f"v{nk}"
        dim_rows.append((skey, nk, attr, "Y", 50, EOT))
        model[nk] = [[attr, 50, EOT, "Y"]]
    delta_rows = []
    ordinal = 100
    for eid in range(40):
        nk = random.choice(keys)
        attr = f"a{random.randrange(3)}"
        delta_rows.append((nk, attr, ordinal, eid))
        # replay model: single-version SCD2 fold at ordinal grain
        vers = model.setdefault(nk, [])
        if not vers or vers[-1][0] != attr:
            if vers:
                vers[-1][2] = ordinal  # expire current at new start
                vers[-1][3] = "N"
            vers.append([attr, ordinal, EOT, "Y"])
        ordinal += random.randrange(1, 5)
    dim = _multi_dim(spark, dim_rows)
    delta = spark.createDataFrame(
        delta_rows, "nk long, attr string, ord long, eid long"
    )
    out = scd2_upsert_multi(
        dim, delta, "nk", ["attr"], "skey", "ord", tiebreak_cols=["eid"]
    )
    got = sorted(
        (r["nk"], r["start_ord"], r["attr"], r["end_ord"], r["current_flag"])
        for r in out.collect()
    )
    want = sorted(
        (nk, v[1], v[0], v[2], v[3]) for nk, vs in model.items() for v in vs
    )
    assert got == want

"""Property-based tests (hypothesis): the Spark operators against
independent pure-Python models of the reference semantics
(lambda_s3/lambda_function_s3.py:40-110), over randomized inputs far
beyond the fixture rows."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl__project_spark.operators import merge_insert_new, parse_raw, with_dense_ids

# -- pure-Python model of the reference transform ---------------------------

PLATFORM_SET = {"Android", "iPhone", "iPad", "Web"}


def model_platform(title: str) -> str:
    head = title.split("|")[0]
    if "Android" in head:
        return "Android"
    if "iPhone" in head:
        return "iPhone"
    if "iPad" in head:
        return "iPad"
    return "Desktop"


def model_site(title: str) -> str | None:
    head = title.split("|")[0]
    if set(head.split(" ")) & PLATFORM_SET:
        return None
    return head


def model_keep(title: str, events: str) -> bool:
    return "206" in events.split(",") and len(title.split("|")) > 1


# -- strategies -------------------------------------------------------------

_piece = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="|,\x00\n\r",
        categories=("L", "N", "P", "S", "Zs"),
    ),
    min_size=1,
    max_size=12,
)
_title = st.lists(_piece, min_size=1, max_size=4).map("|".join)
_events = st.lists(
    st.sampled_from(["206", "1206", "2060", "100", "120", "157"]),
    min_size=1,
    max_size=6,
).map(",".join)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(_title, _events), min_size=1, max_size=24))
def test_parse_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [("2017-01-11T00:00:31.000Z", t, e) for t, e in rows],
        "DateTime string, VideoTitle string, events string",
    )
    got = [
        (r["platform"], r["site"], r["video"]) for r in parse_raw(df).collect()
    ]
    want = [
        (model_platform(t), model_site(t), t.split("|")[-1])
        for t, e in rows
        if model_keep(t, e)
    ]
    assert sorted(got, key=str) == sorted(want, key=str)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=40))
def test_dense_ids_always_dense(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "nk string")
    out = with_dense_ids(df, "nk", id_col="skey", num_partitions=3).collect()
    assert sorted(r["skey"] for r in out) == list(range(len(keys)))
    in_key_order = [r["skey"] for r in sorted(out, key=lambda r: r["nk"])]
    assert in_key_order == sorted(in_key_order)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 20), min_size=0, max_size=30),
    st.lists(st.integers(0, 20), min_size=0, max_size=30),
)
def test_merge_dedup_is_set_union(spark, a, b):
    dest = spark.createDataFrame([(x,) for x in set(a)], "id int")
    batch = spark.createDataFrame([(x,) for x in b], "id int") if b else dest.limit(0)
    out = merge_insert_new(dest, batch)
    assert sorted(r["id"] for r in out.collect()) == sorted(set(a) | set(b))

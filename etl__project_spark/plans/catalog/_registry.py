"""Query/oracle registry — the single registration point every family
module (vs / tpch / ev / doc / emb) decorates into. Split out of the
monolithic catalog.py in round 9 (VERDICT r8 #7); semantics unchanged."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

ORACLES: dict[str, str] = {}

def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco

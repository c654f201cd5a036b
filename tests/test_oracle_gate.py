"""Full-catalog oracle gate as a marked pytest (VERDICT r3 #5).

The driver's per-round CORRECTNESS check covers only the first 50
registered queries; ``tools/check_correctness.py`` covers all of them
but ran outside CI. This module runs the SAME value-hash comparison for
every catalog query at sf0.001, so a regression in a rotated-out query
fails in-repo before the driver ever sees it.

Run with ``python -m pytest -m oracle -q`` (deselected from the default
run by pytest.ini so the ordinary suite stays fast).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.check_correctness import compare_query, oracle_views

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = oracle_views(SF_DIR)
    yield con
    con.close()


@pytest.mark.oracle
@pytest.mark.parametrize("name", list(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    problems = compare_query(
        spark, duck, SF_DIR, name, _QUERIES[name], _ORACLES.get(name)
    )
    assert not problems, f"{name}: {'; '.join(problems)}"

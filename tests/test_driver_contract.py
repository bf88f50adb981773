"""The driver-contract gate, in-suite: every queries() entry runs, and
every oracle-checked entry matches its DuckDB twin exactly (row count,
columns, order-insensitive values) at sf0.001.

tools/check_contract.py is the same harness as a CLI (use sf0.01 there —
the scale the real driver uses).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import __spark_entry__ as E
from check_contract import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


QUERIES = E.queries()
ORACLES = E.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


# Rows the driver's 50-row correctness budget must always sample: the
# storage-contract paths (segment encode/decode roundtrip, multimodal
# feature hashes) have no other oracle coverage, so they may never be
# pushed past position 50 by a reorder.
MUST_GATE = [
    "segment_roundtrip",
    "multimodal_meta",
    "multimodal_features",
    "time_range_l0",
    "time_range_overlay",
    "latest_head",
    "upsert_dedup",
    "routed_agg_avg",
    "routed_agg_max",
]


def test_must_gate_queries_inside_driver_budget():
    first50 = list(QUERIES)[:50]
    missing = [q for q in MUST_GATE if q not in first50]
    assert not missing, f"outside the driver's 50-row budget: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    spdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(spdf) >= 0  # rows-only contract
        return
    dpdf = duck.execute(ORACLES[name]).df()
    problems = compare(name, spdf, dpdf)
    assert not problems, f"{name}: {problems}"

"""The contest's evaluation protocol in miniature (reference README.md:30-38):

    write → correctness → shutdown (restart, cache drop) → reconnect →
    correctness again

against the pandas oracle, through the reference-shaped 8-method API.
"""

import numpy as np
import pandas as pd
import pytest

from lindorm_tsdb_contest_java_spark import engine as eng
from oracle import (
    oracle_aggregate, oracle_downsample, oracle_latest, oracle_time_range,
)

HOT = "conv-00000000"


@pytest.fixture(scope="module")
def db(spark, transcripts_pdf, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("engine") / "db")
    db = eng.connect(spark, root, n_buckets=8)
    db.create_table()
    # two write batches, like the evaluator's threaded writers
    half = len(transcripts_pdf) // 2
    db.write(spark.createDataFrame(transcripts_pdf.iloc[:half]))
    db.write(spark.createDataFrame(transcripts_pdf.iloc[half:]))
    return db


@pytest.fixture(scope="module")
def oracle_pdf(db):
    return db._canonical().toPandas()


def _check_all_queries(db, oracle_pdf):
    lb = int(oracle_pdf[oracle_pdf["conv_id"] == HOT]["ts_us"].min() // 1000)
    ub = lb + 6 * 3_600_000

    got = db.execute_latest_query([HOT, "conv-00000003"]).toPandas()
    exp = oracle_latest(oracle_pdf, [HOT, "conv-00000003"])
    assert sorted(got["turn_idx"]) == sorted(exp["turn_idx"])

    cols = ["conv_id", "turn_idx", "text", "ts_us"]
    got = (db.execute_time_range_query(HOT, lb, ub, cols)
           .toPandas().sort_values("ts_us").reset_index(drop=True))
    exp = oracle_time_range(oracle_pdf, HOT, lb, ub, cols) \
        .sort_values("ts_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)

    for agg in ("AVG", "MAX"):
        got = db.execute_aggregate_query(HOT, "text_len", lb, ub, agg).toPandas()
        exp = oracle_aggregate(oracle_pdf, HOT, "text_len", lb, ub, agg)
        assert got["value"].iloc[0] == pytest.approx(exp["value"].iloc[0], rel=1e-12)
        assert got["ts_ms"].iloc[0] == lb

    got = db.execute_downsample_query(HOT, "text_len", lb, ub, 3_600_000,
                                      "AVG", "GREATER", 40).toPandas()
    exp = oracle_downsample(oracle_pdf, HOT, "text_len", lb, ub, 3_600_000,
                            "AVG", "GREATER", 40)
    gv, ev = got["value"].to_numpy(float), exp["value"].to_numpy(float)
    sent = np.isinf(ev)
    assert (np.isinf(gv) == sent).all()
    np.testing.assert_allclose(gv[~sent], ev[~sent], rtol=1e-12)


def test_queries_before_flush_see_buffered_writes(db, oracle_pdf):
    _check_all_queries(db, oracle_pdf)  # nothing flushed yet: memtable reads


def test_restart_protocol(spark, db, oracle_pdf):
    db.shutdown()
    reopened = eng.connect(spark, db.root, n_buckets=8)  # fresh instance
    assert reopened._buffer == []
    _check_all_queries(reopened, oracle_pdf)
    # committed segment/tier tables exist and carry the data
    assert reopened._segments.current().row_count > 0
    n = reopened._tier_1m.read(spark).agg({"n_turns": "sum"}).collect()[0][0]
    assert n == len(oracle_pdf)


def test_upsert_overwrite_through_api(spark, tmp_path):
    db = eng.connect(spark, str(tmp_path / "db2"), n_buckets=4)
    base = pd.DataFrame({
        "conv_id": ["c1"] * 3, "turn_idx": np.array([0, 1, 2], dtype=np.int32),
        "role": ["user"] * 3, "text": ["a", "b", "c"], "tool": [""] * 3,
        "ts": pd.to_datetime([1_700_000_000_000_000 + i * 1_000_000 for i in range(3)],
                             unit="us"),
    })
    db.write(spark.createDataFrame(base))
    edit = base.iloc[[1]].assign(text="b-edited",
                                 ts=base["ts"].iloc[1] + pd.Timedelta(seconds=5))
    db.write(spark.createDataFrame(edit))
    got = (db.execute_time_range_query("c1", 0, 2_000_000_000_000,
                                       ["turn_idx", "text"])
           .toPandas().sort_values("turn_idx"))
    assert list(got["text"]) == ["a", "b-edited", "c"]
    db.shutdown()
    reopened = eng.connect(spark, db.root, n_buckets=4)
    got2 = (reopened.execute_time_range_query("c1", 0, 2_000_000_000_000,
                                              ["turn_idx", "text"])
            .toPandas().sort_values("turn_idx"))
    assert list(got2["text"]) == ["a", "b-edited", "c"]


def test_latest_served_from_tier_after_shutdown(spark, db, oracle_pdf):
    """Post-flush, execute_latest_query must read the materialized latest
    tier (MapIndex.getLast analog), not scan the raw table — and still
    answer identically to the raw-scan oracle."""
    db.shutdown()
    reopened = eng.connect(spark, db.root, n_buckets=8)
    out = reopened.execute_latest_query()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "tier_latest" in plan
    assert "/raw/" not in plan
    got = out.toPandas().sort_values("conv_id").reset_index(drop=True)
    exp = oracle_latest(oracle_pdf, sorted(oracle_pdf["conv_id"].unique())) \
        .sort_values("conv_id").reset_index(drop=True)
    assert list(got["conv_id"]) == list(exp["conv_id"])
    assert list(got["turn_idx"]) == list(exp["turn_idx"])
    assert list(got["ts_us"]) == list(exp["ts_us"])


def test_time_range_served_from_segments_with_pruning(spark, db, oracle_pdf):
    """Post-flush, execute_time_range_query reads the COMPRESSED segment
    store: shard-routing + zone-map predicates pushed into the parquet
    scan (TSFileService.java:297-447 analog), answers identical to the
    raw-scan oracle."""
    db.shutdown()
    reopened = eng.connect(spark, db.root, n_buckets=8)
    lb = int(oracle_pdf[oracle_pdf["conv_id"] == HOT]["ts_us"].min() // 1000)
    ub = lb + 6 * 3_600_000
    cols = ["conv_id", "turn_idx", "text", "ts_us"]
    out = reopened.execute_time_range_query(HOT, lb, ub, cols)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "/segments/" in plan and "/raw/" not in plan
    pushed = " ".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "conv_bucket" in pushed and "min_ts_us" in pushed, pushed
    got = out.toPandas().sort_values("ts_us").reset_index(drop=True)
    exp = oracle_time_range(oracle_pdf, HOT, lb, ub, cols) \
        .sort_values("ts_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)

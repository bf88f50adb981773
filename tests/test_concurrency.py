"""Multi-writer contract (r05 verdict ask #7).

The reference takes 30 concurrent writer THREADS into one in-process
engine (example/EvaluationSample.java:46 — intra-process locking). Our
durability unit is the snapshot commit, so the contract across ENGINES
(processes) is optimistic single-writer: two engines on one root may
interleave whole flushes freely, but a commit built against a base
snapshot that is no longer current raises `RuntimeError("commit
conflict ...")` — never a silent clobber — and the loser's buffered
batch survives in memory, so a plain retry lands it on top of the
winner's state with both batches readable.
"""

import pandas as pd
import pytest

from lindorm_tsdb_contest_java_spark import engine as eng
from lindorm_tsdb_contest_java_spark.sources.table import SnapshotTable

BASE_S = 1_704_067_200


def _rows(conv_range, turn_range):
    rows = []
    for c in conv_range:
        for t in turn_range:
            rows.append((f"cw-{c:03d}", t, "user" if t % 2 else "assistant",
                         f"text {c} {t}", "-",
                         pd.Timestamp((BASE_S + c * 13 + t * 97) * 10**9)))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool", "ts"])


LB = BASE_S * 1000 - 60_000
UB = LB + 86_400_000


def test_concurrent_shutdown_one_wins_loser_raises_then_retries(
        spark, tmp_path, monkeypatch):
    root = str(tmp_path / "shared")
    e1 = eng.connect(spark, root, n_buckets=4)
    e2 = eng.connect(spark, root, n_buckets=4)
    e1.write(spark.createDataFrame(_rows(range(0, 3), range(0, 4))))
    e2.write(spark.createDataFrame(_rows(range(3, 6), range(0, 4))))

    fired = {"done": False}
    orig = SnapshotTable._commit

    def race(self, snap):
        # deterministic worst-case interleave: engine 1's WHOLE shutdown
        # runs inside engine 2's first commit window — after e2 built its
        # snapshot against the (about-to-be-superseded) base, before it
        # lands. fired flips first so e1's own commits pass through.
        if not fired["done"]:
            fired["done"] = True
            e1.shutdown()
        return orig(self, snap)

    monkeypatch.setattr(SnapshotTable, "_commit", race)
    with pytest.raises(RuntimeError, match="commit conflict"):
        e2.shutdown()
    monkeypatch.setattr(SnapshotTable, "_commit", orig)

    # the winner's batch is committed and readable
    assert e1.execute_latest_query(None, ["turn_idx"]).count() == 3
    # the loser's batch was NOT lost (raw append failed before the
    # buffer was cleared) and a plain retry lands it on fresh state
    assert e2._buffer, "failed flush must keep the buffer"
    e2.shutdown()

    # both batches visible, from either handle
    for e in (e1, e2):
        got = {r["conv_id"] for r in
               e.execute_latest_query(None, ["turn_idx"]).collect()}
        assert got == {f"cw-{c:03d}" for c in range(6)}
    assert e2.execute_time_range_query("cw-001", LB, UB).count() == 4
    assert e2.execute_time_range_query("cw-004", LB, UB).count() == 4


def test_stale_base_commit_rejected_at_table_level(tmp_path):
    """The mechanism itself: a commit whose parent is no longer CURRENT
    is rejected even when the manifest id would not collide."""
    from lindorm_tsdb_contest_java_spark.sources.table import Snapshot
    t1 = SnapshotTable.create(str(tmp_path / "t"))
    t2 = SnapshotTable.load(str(tmp_path / "t"))
    base = t2.current()
    t1._commit(Snapshot(base.snapshot_id + 1, base.snapshot_id,
                        "append", [], {}))
    with pytest.raises(RuntimeError, match="commit conflict"):
        t2._commit(Snapshot(base.snapshot_id + 1, base.snapshot_id,
                            "append", [], {}))

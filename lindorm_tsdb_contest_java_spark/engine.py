"""TranscriptTSDB — the reference's embedded-engine API, Spark-backed.

A user of the reference drives exactly eight methods
(`TSDBEngine.java:32`: connect / createTable / write /
executeLatestQuery / executeTimeRangeQuery / executeAggregateQuery /
executeDownsampleQuery / shutdown). This facade exposes the same
surface with the same semantics over the Spark engine, so that user can
switch without relearning anything:

- `write` buffers appended batches (the memtable analog,
  memory/MemoryTable.java:52-74) — duplicates of (conv_id, turn_idx)
  overwrite on read, newest ts wins (TSDBEngine.java:85-92);
- `shutdown` flushes: canonicalize + encode segments + build tiers,
  committed as table snapshots (the durability point,
  TSDBEngineImpl.java:127-169);
- a new instance on the same root `connect`s from the committed
  snapshots — the contest's restart protocol (write → shutdown →
  reopen → identical answers, README.md:30-38) is pinned by
  tests/test_engine_api.py;
- queries served from the canonical table, with aggregate/downsample
  routed through the 1m tier when the bounds align (AggBucket fast
  path), else direct — both oracle-identical.

Unflushed buffered rows are also visible to queries (memtable reads,
MemoryTable.java:84-158): queries run over committed ∪ buffered.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import queries as Q
from .operators.tiers import (
    MINUTE_MS, build_conv_tier, build_latest_tier, latest_from_tier,
)
from .plans.router import routed_aggregate, routed_downsample
from .sources.segments import (
    CANONICAL_COLUMNS, canonicalize, encode_segments, time_range_from_segments,
)
from .sources.table import SnapshotTable

AVG, MAX, EQUAL, GREATER = Q.AVG, Q.MAX, Q.EQUAL, Q.GREATER


class TranscriptTSDB:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self._buffer: list[DataFrame] = []
        self._canon_cache: DataFrame | None = None
        self._tier_cache: DataFrame | None = None
        os.makedirs(root, exist_ok=True)
        self._raw = SnapshotTable.create(os.path.join(root, "raw"))
        self._segments = SnapshotTable.create(os.path.join(root, "segments"))
        self._tier_1m = SnapshotTable.create(os.path.join(root, "tier_conv_1m"))
        self._tier_latest = SnapshotTable.create(os.path.join(root, "tier_latest"))

    # ---------- write path ----------

    def create_table(self, name: str = "transcripts") -> None:
        """Schema is fixed (SchemaUtil.java:40-70 analog): a no-op kept for
        API parity."""

    def write(self, rows) -> None:
        """Buffer a batch (Spark or pandas DataFrame of transcript rows)."""
        df = (rows if isinstance(rows, DataFrame)
              else self.spark.createDataFrame(pd.DataFrame(rows)))
        self._buffer.append(df.select("conv_id", "turn_idx", "role", "text", "tool", "ts"))
        self._canon_cache = self._tier_cache = None

    def shutdown(self) -> None:
        """Flush + durable commit: raw snapshot, encoded segments, 1m tier."""
        if self._buffer:
            batch = self._buffer[0]
            for more in self._buffer[1:]:
                batch = batch.unionByName(more)
            self._raw.append(batch)
            self._buffer = []
        canon = self._committed_canonical()
        self._segments.overwrite(encode_segments(canon))
        self._tier_1m.overwrite(build_conv_tier(canon, MINUTE_MS))
        self._tier_latest.overwrite(build_latest_tier(canon))
        self._canon_cache = self._tier_cache = None

    # ---------- read path ----------

    def _committed_canonical(self) -> DataFrame:
        return canonicalize(self._raw.read(self.spark), n_buckets=self.n_buckets)

    def _canonical(self) -> DataFrame:
        """Committed ∪ buffered (memtable-visible reads)."""
        if self._canon_cache is not None:
            return self._canon_cache
        parts = []
        if self._raw.current().files:
            parts.append(self._raw.read(self.spark))
        parts.extend(self._buffer)
        if not parts:
            raise ValueError("no data written yet")
        df = parts[0]
        for more in parts[1:]:
            df = df.unionByName(more)
        # conv grain: query-serving canon wants balanced partitions, not
        # the encode path's bucket-clustered exchange
        self._canon_cache = canonicalize(df, n_buckets=self.n_buckets,
                                         grain="conv")
        return self._canon_cache

    def _tier(self) -> DataFrame:
        if self._tier_cache is None:
            self._tier_cache = build_conv_tier(self._canonical(), MINUTE_MS)
        return self._tier_cache

    def execute_latest_query(self, conv_ids: list[str] | None = None,
                             columns: list[str] | None = None) -> DataFrame:
        """Served from the materialized latest tier when the committed
        state is current (the reference answers latest from its in-memory
        index, MapIndex.java:99-114, never by scanning blocks); buffered
        unflushed rows force the memtable-visible raw path."""
        if not self._buffer and self._tier_latest.current().files:
            tier = self._tier_latest.read(self.spark)
            cols = columns or [c for c in CANONICAL_COLUMNS if c != "conv_id"]
            return latest_from_tier(tier, conv_ids, cols)
        return Q.latest(self._canonical(), conv_ids, columns)

    def execute_time_range_query(self, conv_id: str, lb_ms: int, ub_ms: int,
                                 columns: list[str] | None = None) -> DataFrame:
        """Served from the compressed segment store when the committed
        state is current — the reference's read path: shard routing +
        block zone-map pruning + per-column lazy decode
        (TSFileService.java:297-447). Buffered unflushed rows force the
        memtable-visible raw path."""
        # 'ts' is excluded on the default projection: the decoded view
        # carries the exact ts_us micros (the reference API's long
        # timestamp); the raw-path TimestampType ts is an NTZ parquet
        # artifact the compressed store intentionally normalizes away.
        # The SAME default applies on both branches so the result schema
        # is independent of flush state (ADVICE r02).
        cols = columns or [c for c in CANONICAL_COLUMNS if c != "ts"]
        if not self._buffer and self._segments.current().files:
            return time_range_from_segments(
                self._segments.read(self.spark), conv_id, lb_ms, ub_ms,
                cols, n_buckets=self.n_buckets)
        return Q.time_range(self._canonical(), conv_id, lb_ms, ub_ms, cols)

    def execute_aggregate_query(self, conv_id: str, column: str, lb_ms: int,
                                ub_ms: int, agg: str) -> DataFrame:
        if column in ("text_len", "latency_s"):
            return routed_aggregate(self._canonical(), self._tier(), conv_id,
                                    column, lb_ms, ub_ms, agg)
        return Q.aggregate(self._canonical(), conv_id, column, lb_ms, ub_ms, agg)

    def execute_downsample_query(self, conv_id: str, column: str, lb_ms: int,
                                 ub_ms: int, interval_ms: int, agg: str,
                                 filter_op: str | None = None,
                                 filter_value=None) -> DataFrame:
        if column in ("text_len", "latency_s"):
            return routed_downsample(self._canonical(), self._tier(), conv_id,
                                     column, lb_ms, ub_ms, interval_ms, agg,
                                     filter_op, filter_value)
        return Q.downsample(self._canonical(), conv_id, column, lb_ms, ub_ms,
                            interval_ms, agg, filter_op, filter_value)


def connect(spark: SparkSession, root: str, **kw) -> TranscriptTSDB:
    """TSDBEngine.connect analog: open (or create) an engine rooted at a
    directory; committed state is whatever the last shutdown snapshot
    holds (TSDBEngineImpl.java:88-119)."""
    return TranscriptTSDB(spark, root, **kw)

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
- `shutdown` flushes INCREMENTALLY through the RollupPipeline's
  fingerprinted chunk machinery (the reference persists only the
  memtable remainder at shutdown, TSDBEngineImpl.java:127-169): the
  appended batch goes to the raw ingest log, and only the time chunks
  whose content fingerprint changed are re-encoded and re-tiered —
  never the whole history. Each flush records per-chunk lineage rows
  and an atomic snapshot per table;
- a new instance on the same root `connect`s from the committed
  snapshots — the contest's restart protocol (write → shutdown →
  reopen → identical answers, README.md:30-38) is pinned by
  tests/test_engine_api.py;
- once flushed, EVERY query type is served from the compressed segment
  store + tiers — the reference's storage model, which keeps only
  encoded blocks and answers all queries from them
  (TSDBEngineImpl.java:249-377, TSFileService.java:297-447). The raw
  table is the upstream ingest log: deleting it after a flush changes
  no committed-state query answer (pinned by
  test_engine_api.py::test_queries_survive_raw_table_removal).

Unflushed buffered rows are also visible to queries (memtable reads,
MemoryTable.java:84-158): queries run over committed ∪ buffered.

Engine-API dtype note: text_len is BIGINT on every path (the decoded
segment view is int64; the memtable path casts to match), so result
schemas are independent of flush state.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import queries as Q
from .operators.tiers import (
    DAY_MS, HOUR_MS, MINUTE_MS, build_conv_tier, latest_from_tier,
)
from .ops.pipeline import RollupPipeline
from .plans.router import routed_aggregate, routed_downsample
from .sources.segments import (
    CANONICAL_COLUMNS, canonicalize, time_range_from_segments,
)
from .sources.table import SnapshotTable

AVG, MAX, EQUAL, GREATER = Q.AVG, Q.MAX, Q.EQUAL, Q.GREATER

_TIER_COLUMNS = ("text_len", "latency_s")  # tier-accelerated metrics


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
        # the pipeline owns the committed stores (segments + tier cascade +
        # checkpoint + lineage); the engine's flush IS a pipeline run
        self._pipeline = RollupPipeline(spark, root, n_buckets=n_buckets,
                                        tiers={"1h": HOUR_MS, "1d": DAY_MS})
        self._segments = self._pipeline.table("segments")
        self._tier_1m = self._pipeline.table("tier_conv_1m")
        self._tier_latest = self._pipeline.table("tier_latest")

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
        """Flush + durable commit, INCREMENTALLY: append the buffered batch
        to the raw ingest log, then run the rollup pipeline over the
        committed rows — its content fingerprints skip every time chunk
        the append didn't touch, so a small batch re-encodes only its own
        chunks (the reference's shutdown persists the memtable remainder,
        not the whole store, TSDBEngineImpl.java:127-169). input_snapshot
        is pinned to 0 because the fingerprints are content-addressed
        (count + ts bounds + key hash-sum + codec version): they carry
        across raw-table snapshots by construction."""
        if self._buffer:
            batch = self._buffer[0]
            for more in self._buffer[1:]:
                batch = batch.unionByName(more)
            self._raw.append(batch)
            self._buffer = []
        if self._raw.current().files:
            self._pipeline.run(self._raw.read(self.spark), input_snapshot=0)
        self._canon_cache = self._tier_cache = None

    def apply_retention(self, policy, now_us: int | None = None,
                        vacuum: bool = True,
                        vacuum_grace_s: float = 3600.0) -> dict:
        """Expire committed history per `policy` (ops/retention.py):
        metadata-only partition drops + optional physical vacuum. The
        coarse 1h/1d tiers and the latest tier are never expired, and
        the next flush's cascade preserves their values over the expired
        range (RollupPipeline._retention_stable). No reference analog —
        the contest engine never deletes; this is the north-star
        retention surface."""
        from .ops.retention import apply_retention
        out = apply_retention(self._pipeline, policy, now_us=now_us,
                              vacuum=vacuum, vacuum_grace_s=vacuum_grace_s)
        self._canon_cache = self._tier_cache = None
        return out

    # ---------- read path: memtable-visible (buffered) ----------

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
        canon = canonicalize(df, n_buckets=self.n_buckets, grain="conv")
        # engine-API dtype: text_len is BIGINT on the decoded-segment path,
        # so the memtable path matches (state-independent result schemas)
        self._canon_cache = canon.withColumn(
            "text_len", F.col("text_len").cast("long"))
        return self._canon_cache

    def _tier(self) -> DataFrame:
        if self._tier_cache is None:
            self._tier_cache = build_conv_tier(self._canonical(), MINUTE_MS)
        return self._tier_cache

    # ---------- read path: committed (segments + tiers only) ----------

    def _committed(self) -> bool:
        return not self._buffer and bool(self._segments.current().files)

    def _range_decode(self, conv_id: str, lb_ms: int, ub_ms: int,
                      column: str) -> DataFrame:
        """Rows of one conversation over [lb, ub), decoded from the
        compressed store: shard-routed, zone-map-pruned, lazy per-column
        decode (TSFileService.java:297-447)."""
        cols = list(dict.fromkeys(["conv_id", "ts_us", column]))
        return time_range_from_segments(
            self._segments.read(self.spark), conv_id, lb_ms, ub_ms,
            cols, n_buckets=self.n_buckets)

    def _edge_rows(self, conv_id: str, lb_ms: int, ub_ms: int,
                   column: str) -> DataFrame:
        """Decode ONLY the partial tier buckets at the range ends — the
        reference decodes exactly the straddling blocks and answers the
        interior from AggBuckets (TSDBEngineImpl.java:254-262). Edge
        bounds are pure arithmetic on (lb, ub), so no data-dependent
        driver branching."""
        lo = -(-lb_ms // MINUTE_MS) * MINUTE_MS   # ceil to tier grid
        hi = (ub_ms // MINUTE_MS) * MINUTE_MS     # floor to tier grid
        ranges = [(lb_ms, ub_ms)] if lo >= hi else [(lb_ms, lo), (hi, ub_ms)]
        ranges = [r for r in ranges if r[0] < r[1]]
        if not ranges:  # fully grid-aligned: no edge rows (empty decode)
            ranges = [(lb_ms, lb_ms)]
        parts = [self._range_decode(conv_id, l, u, column) for l, u in ranges]
        out = parts[0]
        for more in parts[1:]:
            out = out.unionByName(more)
        return out

    # ---------- the four query types ----------

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
        if self._committed():
            return time_range_from_segments(
                self._segments.read(self.spark), conv_id, lb_ms, ub_ms,
                cols, n_buckets=self.n_buckets)
        return Q.time_range(self._canonical(), conv_id, lb_ms, ub_ms, cols)

    def execute_aggregate_query(self, conv_id: str, column: str, lb_ms: int,
                                ub_ms: int, agg: str) -> DataFrame:
        """Committed state: interior tier buckets come pre-aggregated from
        the 1m tier table, edge rows decode from segments — raw is never
        touched. Buffered state: memtable-visible canonical path."""
        if self._committed():
            if column in _TIER_COLUMNS:
                return routed_aggregate(
                    self._edge_rows(conv_id, lb_ms, ub_ms, column),
                    self._tier_1m.read(self.spark),
                    conv_id, column, lb_ms, ub_ms, agg)
            return Q.aggregate(self._range_decode(conv_id, lb_ms, ub_ms, column),
                               conv_id, column, lb_ms, ub_ms, agg)
        if column in _TIER_COLUMNS:
            return routed_aggregate(self._canonical(), self._tier(), conv_id,
                                    column, lb_ms, ub_ms, agg)
        return Q.aggregate(self._canonical(), conv_id, column, lb_ms, ub_ms, agg)

    def execute_downsample_query(self, conv_id: str, column: str, lb_ms: int,
                                 ub_ms: int, interval_ms: int, agg: str,
                                 filter_op: str | None = None,
                                 filter_value=None) -> DataFrame:
        """Committed state: covered tier buckets come from the 1m tier
        (AggBucket classification); only straddling buckets decode from
        segments. Buffered state: memtable-visible canonical path."""
        if self._committed():
            raw = self._range_decode(conv_id, lb_ms, ub_ms, column)
            if column in _TIER_COLUMNS:
                return routed_downsample(raw, self._tier_1m.read(self.spark),
                                         conv_id, column, lb_ms, ub_ms,
                                         interval_ms, agg, filter_op,
                                         filter_value)
            return Q.downsample(raw, conv_id, column, lb_ms, ub_ms,
                                interval_ms, agg, filter_op, filter_value)
        if column in _TIER_COLUMNS:
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

"""Idempotent, resumable rollup pipeline with per-partition lineage.

Capability analog of the reference's durability story — shutdown-time
metadata persistence (TSDBEngineImpl.java:127-169) and restart recovery
(TSDBEngineImpl.java:88-119) — re-expressed as snapshot checkpoints:

- every tier write is scoped to a `(tier, time_chunk)` partition and
  committed via SnapshotTable.overwrite_partitions → re-running a
  completed chunk replaces it with identical content (idempotent);
- a checkpoint JSON records, per job, the input snapshot id and the set
  of completed chunks; resume = skip completed chunks, finish the rest;
- every chunk write appends a lineage row (input files, row counts,
  encoded bytes, wall time) to a metrics table — the per-partition
  lineage the north_rule requires.

Wall-clock appears ONLY in lineage metrics, never in data content, so
re-runs are content-identical.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.tiers import (
    HOUR_MS, MINUTE_MS, DAY_MS,
    build_conv_tier, build_rate_tier, rollup_conv_tier, rollup_rate_tier,
)
from ..sources.segments import canonicalize, encode_segments
from ..sources.table import SnapshotTable


class Checkpoint:
    """Atomic JSON checkpoint: {job: {input_snapshot, done: [chunk...]}}."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def done_chunks(self, job: str, input_snapshot: int) -> dict:
        """chunk -> content fingerprint at the time it was completed."""
        st = self._load().get(job)
        if not st or st.get("input_snapshot") != input_snapshot:
            return {}
        return {int(k): v for k, v in st.get("done", {}).items()}

    def mark_done(self, job: str, input_snapshot: int, chunk, fingerprint) -> None:
        st = self._load()
        entry = st.get(job)
        if not entry or entry.get("input_snapshot") != input_snapshot:
            entry = {"input_snapshot": input_snapshot, "done": {}}
        entry["done"][str(chunk)] = fingerprint
        st[job] = entry
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f, sort_keys=True)
        os.replace(tmp, self.path)


class LineageLog:
    """Append-only per-partition metrics table (parquet rows via the
    snapshot table, so it shares the atomic-commit story)."""

    def __init__(self, root: str):
        self.table = SnapshotTable.create(root)

    def record(self, **row) -> None:
        self.table.append(pd.DataFrame([row]))

    def read(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark)


@dataclass
class RollupPipeline:
    """transcripts → segments + conv/rate tier cascade, chunk by chunk."""

    spark: SparkSession
    root: str
    n_buckets: int = 16
    chunk_us: int | None = None  # time-chunk width; None = segments default (6h)
    fail_after_chunks: int | None = None  # test hook: simulate mid-run crash
    tiers: dict = field(default_factory=lambda: {"1h": HOUR_MS, "1d": DAY_MS})

    def __post_init__(self):
        os.makedirs(self.root, exist_ok=True)
        self.checkpoint = Checkpoint(os.path.join(self.root, "checkpoint.json"))
        self.lineage = LineageLog(os.path.join(self.root, "lineage"))

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable.create(os.path.join(self.root, name))

    def run(self, transcripts: DataFrame, input_snapshot: int = 0) -> dict:
        """Process every time_chunk not yet checkpointed. Returns metrics."""
        kwargs = {"chunk_us": self.chunk_us} if self.chunk_us else {}
        canon = canonicalize(transcripts, n_buckets=self.n_buckets, **kwargs).cache()
        try:
            return self._run_chunks(canon, input_snapshot)
        finally:
            canon.unpersist()

    def _run_chunks(self, canon: DataFrame, input_snapshot: int) -> dict:
        # per-chunk content fingerprint (count + ts bounds + key hash-sum):
        # incremental processing redoes exactly the chunks whose content
        # changed since the checkpoint — new data appended into an old
        # chunk invalidates only that chunk, not the whole run
        fp_rows = (canon.groupBy("time_chunk").agg(
            F.count("*").alias("n"), F.max("ts_us").alias("mx"),
            F.sum(F.xxhash64("conv_id", "turn_idx", "ts_us").cast("decimal(38,0)"))
             .alias("h"),  # decimal sum: immune to ANSI long overflow
        ).collect())
        fingerprints = {int(r["time_chunk"]): f'{r["n"]}:{r["mx"]}:{r["h"]}'
                        for r in fp_rows}
        chunks = sorted(fingerprints)
        done = self.checkpoint.done_chunks("rollup", input_snapshot)
        todo = [c for c in chunks if done.get(c) != fingerprints[c]]
        metrics = {"chunks_total": len(chunks),
                   "chunks_done": len(chunks) - len(todo),
                   "chunks_run": 0, "rows": 0, "encoded_bytes": 0}
        seg_table = self.table("segments")
        t1m_conv = self.table("tier_conv_1m")
        r1m = self.table("tier_rate_1m")

        for i, chunk in enumerate(todo):
            if self.fail_after_chunks is not None and i >= self.fail_after_chunks:
                raise RuntimeError("simulated failure (test hook)")
            t0 = time.perf_counter()
            part = canon.filter(F.col("time_chunk") == chunk)
            # range-partitioned write: segment files ordered by bucket, so
            # bucket-scoped reads touch a contiguous file subset
            segs = encode_segments(part).repartitionByRange("conv_bucket")
            snap = seg_table.overwrite_partitions(segs, {"time_chunk": int(chunk)})
            # stats from exactly the files this commit wrote — not a
            # whole-table rescan (which would be O(chunks^2) at scale)
            chunk_files = [os.path.join(seg_table.data_dir, f["path"])
                           for f in snap.files
                           if f["partition"].get("time_chunk") == int(chunk)]
            seg_stats = (self.spark.read.parquet(*chunk_files)
                         .agg(F.sum("n_rows"), F.sum("encoded_bytes")).collect()[0])
            n_rows, enc_bytes = int(seg_stats[0] or 0), int(seg_stats[1] or 0)
            t1m_conv.overwrite_partitions(build_conv_tier(part), {"time_chunk": int(chunk)})
            r1m.overwrite_partitions(build_rate_tier(part), {"time_chunk": int(chunk)})
            wall = time.perf_counter() - t0
            self.lineage.record(
                job="rollup", phase="chunk", time_chunk=int(chunk),
                input_snapshot=input_snapshot,
                input_files=",".join(sorted({f["path"] for f in seg_table.current().files
                                             if f["partition"].get("time_chunk") == int(chunk)})),
                row_count=n_rows, encoded_bytes=enc_bytes, wall_s=wall,
            )
            self.checkpoint.mark_done("rollup", input_snapshot, int(chunk),
                                      fingerprints[chunk])
            metrics["chunks_run"] += 1
            metrics["rows"] += n_rows
            metrics["encoded_bytes"] += enc_bytes

        # cascade the coarse tiers from the completed base tier (cheap, full rebuild)
        conv_1m = t1m_conv.read(self.spark)
        rate_1m = r1m.read(self.spark)
        for name, width in self.tiers.items():
            self.table(f"tier_conv_{name}").overwrite(rollup_conv_tier(conv_1m, width))
            self.table(f"tier_rate_{name}").overwrite(rollup_rate_tier(rate_1m, width))
        return metrics

"""PySpark-native time-series rollup / downsample / retention engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference `Hen1ng/lindorm-tsdb-contest-java`
(single-node vehicle-telemetry TSDB, Alibaba Lindorm contest), re-expressed
Spark-first over tables of multi-turn conversation/agent transcripts
(conv_id, turn_idx, role, text, tool, ts).

Layout
------
functions/codecs : pure-numpy block codecs (Gorilla XOR, delta-of-delta +
                   ZigZag varint, dictionary + zstd, text stream) — the
                   Spark-side analog of the reference's `compress/` package.
sources/         : deterministic transcript generator, parquet table format
                   with atomic snapshot manifests (Iceberg-ready layout),
                   segment encode/decode (applyInPandas / mapInPandas).
operators/       : reference-exact query surface (latest / time-range /
                   aggregate / downsample with NaN sentinels), continuous
                   aggregate tiers (1m/1h/1d), gap-fill, plus the
                   training-data pipeline ops (dedup, ANN, text analysis).
plans/           : tier routing + plan-audit helpers (.explain checks).
streaming/       : Structured Streaming ingest path.
ops/             : lineage/metrics table, idempotent writes, resume.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (keeps `import lindorm_tsdb_contest_java_spark`
    free of a pyspark import until a symbol is actually used):

    - TranscriptTSDB / connect  — the 8-method engine facade
    - RollupPipeline            — batch rollup/encode pipeline
    - RetentionPolicy / apply_retention — retention enforcement
    - stream_into_store         — streaming ingestion into the store
    """
    targets = {
        "TranscriptTSDB": ("engine", "TranscriptTSDB"),
        "connect": ("engine", "connect"),
        "RollupPipeline": ("ops.pipeline", "RollupPipeline"),
        "RetentionPolicy": ("ops.retention", "RetentionPolicy"),
        "apply_retention": ("ops.retention", "apply_retention"),
        "stream_into_store": ("streaming.ingest", "stream_into_store"),
    }
    if name in targets:
        import importlib
        mod, attr = targets[name]
        return getattr(importlib.import_module(f"{__name__}.{mod}"), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

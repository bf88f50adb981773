"""Tier routing: answer aggregates from pre-aggregated tiers + raw edges.

The reference answers AVG/MAX from block AggBuckets when a block lies
fully inside the query range and decodes only the straddling blocks
(TSDBEngineImpl.java:254-262,311-318, MapIndex.getBucket). Catalyst has
no materialized-view routing, but we own the query API — so the router
does exactly the reference's split, declaratively:

    [lb ............................ ub)
     |edge|  interior (tier rows)  |edge|

- interior: tier buckets fully inside [lb, ub) — read from tier_1m,
  pre-aggregated, no raw scan;
- edges: the partial buckets at each end — computed from raw rows.

Both parts are DataFrames unioned before one final aggregate, so the
whole thing stays a single lazy plan (no driver-side branching on data).
AVG composes from (sum, count); MAX from max — the decomposability rule
the tiers were designed around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.tiers import MINUTE_MS

_TIER_COLS = {
    "text_len": ("text_len_sum", "text_len_max"),
    "latency_s": ("latency_sum", "latency_max"),
}


def routed_aggregate(
    raw: DataFrame,
    tier_1m: DataFrame,
    conv_id: str,
    column: str,
    lb_ms: int,
    ub_ms: int,
    agg: str,
    tier_width_ms: int = MINUTE_MS,
) -> DataFrame:
    """Tier-accelerated single-bucket AVG/MAX with reference semantics
    (result ts = lb, AVG -> double, empty range -> empty result)."""
    sum_col, max_col = _TIER_COLS[column]
    lo = -(-lb_ms // tier_width_ms) * tier_width_ms   # ceil to tier grid
    hi = (ub_ms // tier_width_ms) * tier_width_ms     # floor to tier grid
    has_interior = lo < hi

    if has_interior:
        interior = (
            tier_1m.filter((F.col("conv_id") == conv_id)
                           & (F.col("bucket_ms") >= lo) & (F.col("bucket_ms") < hi))
            .select(F.col(sum_col).cast("double").alias("_sum"),
                    F.col("n_turns").alias("_cnt"),
                    F.col(max_col).cast("double").alias("_max"))
        )
        edge_pred = (F.col("ts_us") >= lb_ms * 1000) & (F.col("ts_us") < lo * 1000) | \
                    (F.col("ts_us") >= hi * 1000) & (F.col("ts_us") < ub_ms * 1000)
    else:
        interior = None
        edge_pred = (F.col("ts_us") >= lb_ms * 1000) & (F.col("ts_us") < ub_ms * 1000)

    edges = (
        raw.filter((F.col("conv_id") == conv_id) & edge_pred)
        .select(F.col(column).cast("double").alias("_v"))
        .agg(F.sum("_v").alias("_sum"), F.count("_v").alias("_cnt"),
             F.max("_v").alias("_max"))
        .filter(F.col("_cnt") > 0)
    )
    parts = edges.unionByName(interior) if interior is not None else edges

    if agg == "AVG":
        value = (F.sum("_sum") / F.sum("_cnt")).cast("double")
    elif agg == "MAX":
        value = F.max("_max")
    else:
        raise ValueError(f"unsupported agg {agg!r}")
    return (
        parts.agg(value.alias("value"), F.sum("_cnt").alias("_n"))
        .filter(F.col("_n") > 0)  # reference: empty range -> empty result
        .select(F.lit(conv_id).alias("conv_id"), F.lit(lb_ms).alias("ts_ms"), "value")
    )

"""Tier routing correctness + skew-splitting round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindorm_tsdb_contest_java_spark.operators import queries as Q
from lindorm_tsdb_contest_java_spark.operators.tiers import MINUTE_MS, build_conv_tier
from lindorm_tsdb_contest_java_spark.plans.router import routed_aggregate
from lindorm_tsdb_contest_java_spark.sources.segments import (
    canonicalize, decode_segments, encode_segments,
)

HOT = "conv-00000000"


@pytest.fixture(scope="module")
def canon(transcripts_df):
    return canonicalize(transcripts_df, n_buckets=8).cache()


@pytest.fixture(scope="module")
def tier_1m(canon):
    return build_conv_tier(canon, MINUTE_MS).cache()


def _bounds(canon, conv):
    r = canon.filter(F.col("conv_id") == conv).agg(
        F.min("ts_us"), F.max("ts_us")).collect()[0]
    return int(r[0] // 1000), int(r[1] // 1000) + 1


@pytest.mark.parametrize("column,agg", [
    ("text_len", "AVG"), ("text_len", "MAX"),
    ("latency_s", "AVG"), ("latency_s", "MAX"),
])
@pytest.mark.parametrize("align", ["unaligned", "aligned", "tiny"])
def test_routed_aggregate_equals_direct(canon, tier_1m, column, agg, align):
    lb, ub = _bounds(canon, HOT)
    if align == "aligned":
        lb = (lb // MINUTE_MS) * MINUTE_MS
        ub = -(-ub // MINUTE_MS) * MINUTE_MS
    elif align == "tiny":  # inside one tier bucket: no interior at all
        lb, ub = lb + 7, lb + 31_000
    direct = Q.aggregate(canon, HOT, column, lb, ub, agg).collect()
    routed = routed_aggregate(canon, tier_1m, HOT, column, lb, ub, agg).collect()
    assert len(direct) == len(routed) == 1
    assert routed[0]["ts_ms"] == lb
    assert routed[0]["value"] == pytest.approx(direct[0]["value"], rel=1e-12)


def test_routed_aggregate_empty_range_empty(canon, tier_1m):
    out = routed_aggregate(canon, tier_1m, HOT, "text_len", 1000, 61_000, "AVG")
    assert out.count() == 0


def test_skew_split_segments_roundtrip(canon):
    plain = encode_segments(canon)
    split = encode_segments(canon, max_rows_per_conv=500)
    # the hot conversation must actually split into more segments
    assert split.count() > plain.count()
    # capped group sizes
    assert split.agg(F.max("n_rows")).collect()[0][0] <= \
        plain.agg(F.max("n_rows")).collect()[0][0]
    cols = ["conv_id", "turn_idx", "text", "ts_us", "latency_s"]
    a = (decode_segments(plain, cols).toPandas()
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    b = (decode_segments(split, cols).toPandas()
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert len(a) == len(b)
    for c in ["conv_id", "turn_idx", "text", "ts_us"]:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    assert (a["latency_s"].to_numpy().view(np.uint64)
            == b["latency_s"].to_numpy().view(np.uint64)).all()


@pytest.mark.parametrize("column,agg,op,val", [
    ("text_len", "AVG", "GREATER", 40),
    ("text_len", "MAX", "GREATER", 40),
    ("text_len", "AVG", "EQUAL", 0),
    ("text_len", "MAX", "EQUAL", 0),
    ("latency_s", "AVG", "GREATER", 30.0),
    ("latency_s", "AVG", None, None),
    ("latency_s", "MAX", None, None),
])
def test_routed_downsample_equals_plain(canon, tier_1m, column, agg, op, val):
    from lindorm_tsdb_contest_java_spark.plans.router import routed_downsample

    lb, ub = _bounds(canon, HOT)
    interval = 300_000  # 5 min, aligned to the 1m tier grid
    lb = (lb // interval) * interval
    n = (ub - lb + interval - 1) // interval
    ub = lb + n * interval
    plain = Q.downsample(canon, HOT, column, lb, ub, interval, agg, op, val).toPandas()
    routed = routed_downsample(canon, tier_1m, HOT, column, lb, ub, interval,
                               agg, op, val).toPandas()
    assert list(routed["ts_ms"]) == list(plain["ts_ms"])
    pv = plain["value"].to_numpy(dtype=float)
    rv = routed["value"].to_numpy(dtype=float)
    import numpy as np
    sent = np.isinf(pv) | (pv == Q.INT_SENTINEL)
    assert (np.isinf(rv) | (rv == Q.INT_SENTINEL))[sent].all()
    np.testing.assert_allclose(rv[~sent], pv[~sent], rtol=1e-12)


def test_routed_max_keeps_native_type(canon, tier_1m):
    """MAX keeps the column type (TSDBEngineImpl.java:308-377): the result
    schema must not depend on whether the tier grid aligned (ADVICE r01)."""
    from lindorm_tsdb_contest_java_spark.plans.router import routed_downsample

    lb, ub = _bounds(canon, HOT)
    al_lb = (lb // 300_000) * 300_000
    aligned = routed_downsample(canon, tier_1m, HOT, "text_len",
                                al_lb, al_lb + 600_000, 300_000, "MAX")
    unaligned = routed_downsample(canon, tier_1m, HOT, "text_len",
                                  lb + 7, lb + 7 + 600_000, 300_000, "MAX")
    plain = Q.downsample(canon, HOT, "text_len", al_lb, al_lb + 600_000,
                         300_000, "MAX")
    assert dict(aligned.dtypes)["value"] == dict(plain.dtypes)["value"]
    assert dict(unaligned.dtypes)["value"] == dict(plain.dtypes)["value"]
    assert dict(plain.dtypes)["value"] in ("int", "bigint")
    agg = routed_aggregate(canon, tier_1m, HOT, "text_len", al_lb,
                           al_lb + 600_000, "MAX")
    assert dict(agg.dtypes)["value"] == dict(canon.dtypes)["text_len"]


def test_filter_type_mismatch_matches_nothing(canon, tier_1m):
    """CompareExpression.java:44-46: GREATER with a value whose type
    differs from the column's matches NOTHING — every window gets the
    sentinel; plain and routed agree."""
    from lindorm_tsdb_contest_java_spark.plans.router import routed_downsample

    lb, _ = _bounds(canon, HOT)
    lb = (lb // 300_000) * 300_000
    # float literal against the int text_len column: mismatch, not a cast
    plain = Q.downsample(canon, HOT, "text_len", lb, lb + 900_000, 300_000,
                         "MAX", "GREATER", 0.5).toPandas()
    routed = routed_downsample(canon, tier_1m, HOT, "text_len", lb,
                               lb + 900_000, 300_000, "MAX", "GREATER", 0.5).toPandas()
    assert (plain["value"] == Q.INT_SENTINEL).all()
    assert (routed["value"] == Q.INT_SENTINEL).all()
    # GREATER is numeric-only: string comparison raises like the reference
    with pytest.raises(ValueError, match="numeric-only"):
        Q.downsample(canon, HOT, "role", lb, lb + 900_000, 300_000,
                     "MAX", "GREATER", "user")


def test_routed_downsample_unaligned_falls_back(canon, tier_1m):
    from lindorm_tsdb_contest_java_spark.plans.router import routed_downsample

    lb, _ = _bounds(canon, HOT)
    lb = lb - (lb % 60_000) + 7  # off the tier grid
    out = routed_downsample(canon, tier_1m, HOT, "text_len", lb, lb + 3 * 60_000,
                            60_000, "AVG", "GREATER", 0)
    plain = Q.downsample(canon, HOT, "text_len", lb, lb + 3 * 60_000,
                         60_000, "AVG", "GREATER", 0)
    assert out.toPandas().equals(plain.toPandas())

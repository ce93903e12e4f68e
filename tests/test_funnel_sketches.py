"""Funnel ordering semantics + HLL sketch merge accuracy."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deimos_spark.operators import funnel, sketches

EV = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _t(minute):
    return dt.datetime(2026, 1, 1, 9, minute)


def test_funnel_order_matters(spark):
    rows = [
        # user 1: full ordered funnel
        Row(user_id=1, event_type="signup", ts=_t(0)),
        Row(user_id=1, event_type="view", ts=_t(1)),
        Row(user_id=1, event_type="purchase", ts=_t(2)),
        # user 2: purchase BEFORE view → reaches step 1 only
        Row(user_id=2, event_type="signup", ts=_t(0)),
        Row(user_id=2, event_type="purchase", ts=_t(1)),
        Row(user_id=2, event_type="view", ts=_t(2)),
        # user 3: no signup → reaches nothing
        Row(user_id=3, event_type="view", ts=_t(0)),
        Row(user_id=3, event_type="purchase", ts=_t(1)),
    ]
    df = spark.createDataFrame(rows, EV)
    got = {
        r["step"]: r["users"]
        for r in funnel.funnel_reach(
            df, ["signup", "view", "purchase"]
        ).collect()
    }
    assert got == {"signup": 2, "view": 2, "purchase": 1}


def test_funnel_conversion_rates(spark):
    rows = [
        Row(user_id=u, event_type="signup", ts=_t(0)) for u in range(4)
    ] + [Row(user_id=0, event_type="view", ts=_t(1))]
    df = spark.createDataFrame(rows, EV)
    out = {r["step"]: r for r in funnel.funnel_conversion(df, ["signup", "view"]).collect()}
    assert out["signup"]["conv_rate"] == 1.0
    assert out["view"]["users"] == 1 and out["view"]["conv_rate"] == 0.25


def test_hll_merge_matches_exact_within_tolerance(spark):
    # 10k users across 20 'days'; merged sketch estimate within 5% of exact
    df = spark.range(100_000).select(
        (F.col("id") % 20).alias("day"), (F.col("id") % 10_000).alias("user_id")
    )
    daily = sketches.hll_sketch_by(df, ["day"], "user_id")
    assert daily.count() == 20
    est = sketches.hll_total_estimate(daily).head()["approx_distinct"]
    assert abs(est - 10_000) / 10_000 < 0.05
    # per-day sketches estimate their own grain too: users on day d are
    # (d + 20k) % 10000, a cycle of length 10000/20 = 500 distinct
    per_day = sketches.hll_rollup_estimate(daily, ["day"]).collect()
    for r in per_day:
        assert abs(r["approx_distinct"] - 500) / 500 < 0.05

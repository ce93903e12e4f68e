"""As-of join and interval join unit tests (hand-checkable scenarios)."""

from pyspark.sql import Row

from deimos_spark.operators.asof import asof_join, interval_join


def _sides(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=10, lv="L1"),
            Row(k="a", ts=20, lv="L2"),
            Row(k="a", ts=5, lv="L0"),
            Row(k="b", ts=10, lv="L3"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=8, rv="R8"),
            Row(k="a", ts=10, rv="R10"),
            Row(k="a", ts=15, rv="R15"),
            Row(k="c", ts=1, rv="RC"),
        ]
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, ["k"], "ts", ["rv"], strict=False)
    got = {(r["k"], r["ts"]): r["rv_right"] for r in out.collect()}
    assert got == {
        ("a", 5): None,      # no right row at or before ts=5
        ("a", 10): "R10",    # tie matches when inclusive
        ("a", 20): "R15",
        ("b", 10): None,     # key with no right rows
    }


def test_asof_backward_strict(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, ["k"], "ts", ["rv"], strict=True)
    got = {(r["k"], r["ts"]): r["rv_right"] for r in out.collect()}
    assert got[("a", 10)] == "R8"  # tie excluded under strict <
    assert got[("a", 20)] == "R15"


def test_asof_preserves_left_rowcount(spark):
    left, right = _sides(spark)
    assert asof_join(left, right, ["k"], "ts", ["rv"]).count() == left.count()


def test_interval_join_bounds(spark):
    left = spark.createDataFrame([Row(k="a", ts=100), Row(k="a", ts=200)])
    right = spark.createDataFrame(
        [Row(k="a", ts=100), Row(k="a", ts=150), Row(k="a", ts=161), Row(k="b", ts=101)]
    )
    out = interval_join(left, right, ["k"], "ts", "ts", lower=0, upper=60)
    got = sorted((r["_lts"], r["_rts"]) for r in out.collect())
    # (100,100) excluded (lower exclusive), (100,150) in, (100,161) out (>60),
    # (150/161 vs 200): only right rows AFTER left count — (200, none)
    assert got == [(100, 150)]


def test_sessionize_gap_semantics(spark):
    """x13's core: a gap STRICTLY greater than `gap` starts a new
    session; ties on ts break by order_cols; numbering restarts per key."""
    from deimos_spark.operators.timeseries import sessionize

    rows = [
        ("u1", 0, 1), ("u1", 100, 2), ("u1", 200, 3),   # one session
        ("u1", 401, 4),                                  # gap 201 > 200 → new
        ("u1", 500, 5),
        ("u2", 0, 6), ("u2", 300, 7),                    # gap 300 → new
    ]
    df = spark.createDataFrame(rows, "user_id string, ts long, event_id long")
    out = sessionize(df, "user_id", "ts", gap=200, order_cols=("event_id",))
    got = {r.event_id: r.session_seq for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1, 7: 2}
    # exact-gap boundary: 200 is NOT a new session (strict >)
    df2 = spark.createDataFrame(
        [("u", 0, 1), ("u", 200, 2)], "user_id string, ts long, event_id long"
    )
    out2 = sessionize(df2, "user_id", "ts", gap=200)
    assert {r.event_id: r.session_seq for r in out2.collect()} == {1: 1, 2: 1}


def test_resample_ffill_null_buckets_and_clamped_interval(spark):
    """ADVICE r7 medium: (1) a bucket whose aggregated value is NULL is a
    MISSING observation — the previous non-null value fills across it
    (classic last(ignorenulls) semantics), it neither emits NULL for its
    gap range nor truncates the previous observation's fill; leading
    all-NULL buckets contribute no grid rows. (2) an `interval` larger
    than the gap between observed buckets (e.g. '2 hours' on an
    hour-truncated grid) must not make sequence() raise — the clamp
    emits just the observed bucket."""
    import datetime as dt

    from pyspark.sql import Row

    from deimos_spark.operators.timeseries import resample_ffill

    def t(day, hour=0):
        return dt.datetime(2024, 1, day, hour)

    df = spark.createDataFrame(
        [
            # key a: leading NULL day 1, obs day 2, NULL day 3 (gap),
            # obs day 5 → fill must carry 2.0 over days 3 AND 4
            Row(k="a", ts=t(1), v=None),
            Row(k="a", ts=t(2), v=2.0),
            Row(k="a", ts=t(3), v=None),
            Row(k="a", ts=t(5), v=5.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = {
        (r.k, r.bucket.day): r.value_ff
        for r in resample_ffill(df, "k", "ts", "v", interval="1 day").collect()
    }
    # day 1 (leading NULL): no row; days 2-4 carry 2.0; day 5 is 5.0
    assert out == {("a", 2): 2.0, ("a", 3): 2.0, ("a", 4): 2.0, ("a", 5): 5.0}

    # adjacent hour buckets with a 2-hour interval: _nb - step < _b —
    # must emit the observed buckets, not raise
    df2 = spark.createDataFrame(
        [Row(k="a", ts=t(1, 1), v=1.0), Row(k="a", ts=t(1, 2), v=2.0)],
        "k string, ts timestamp, v double",
    )
    rows = resample_ffill(df2, "k", "ts", "v", interval="2 hours").collect()
    assert {(r.bucket.hour, r.value_ff) for r in rows} == {(1, 1.0), (2, 2.0)}


def test_resample_ffill_sorted_output_order_and_plan(spark):
    """r15 x11 optimization: sorted_output=True must return EXACTLY the
    rows of the unsorted variant under a top-level orderBy(key, bucket),
    in that exact global order, while the physical plan keeps the
    explode in the FINAL stage — no Exchange above the Generate (the
    old shape range-partitioned the exploded grid and its sampling
    pass re-executed the whole subtree)."""
    import datetime as dt
    import random

    from pyspark.sql import Row

    from deimos_spark.operators.timeseries import resample_ffill

    rng = random.Random(7)
    rows = []
    for k in range(12):
        days = sorted(rng.sample(range(1, 28), rng.randint(1, 9)))
        for d in days:
            rows.append(
                Row(k=f"u{k:02d}", ts=dt.datetime(2024, 1, d),
                    v=round(rng.uniform(-5, 5), 3))
            )
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")

    ref = (
        resample_ffill(df, "k", "ts", "v", interval="1 day")
        .orderBy("k", "bucket")
        .collect()
    )
    got_df = resample_ffill(
        df, "k", "ts", "v", interval="1 day", sorted_output=True
    )
    got = got_df.collect()
    assert got == ref  # same rows, same global order

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    gen_at = plan.index("Generate")
    assert "Exchange" not in plan[:gen_at], (
        "exploded grid must not be exchanged: the only shuffles belong "
        "below the Generate\n" + plan
    )


def test_state_history_runs_and_intervals(spark):
    """x14's core: consecutive equal states collapse into one run; a
    re-appearing state starts a NEW run (SCD2, not distinct states);
    valid_to chains to the next run's start and the last run per key
    is current."""
    from deimos_spark.operators.timeseries import state_history

    rows = [
        ("u1", 0, 1, "a"), ("u1", 10, 2, "a"), ("u1", 20, 3, "b"),
        ("u1", 30, 4, "a"),                    # a again → new run
        ("u2", 0, 5, "x"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts long, event_id long, event_type string"
    )
    out = state_history(
        df, "user_id", "ts", "event_type", order_cols=("event_id",)
    )
    got = {
        (r.user_id, r.run_id): (
            r.event_type, r.valid_from, r.last_seen, r.valid_to,
            r.n_events, r.is_current,
        )
        for r in out.collect()
    }
    assert got == {
        ("u1", 1): ("a", 0, 10, 20, 2, False),
        ("u1", 2): ("b", 20, 20, 30, 1, False),
        ("u1", 3): ("a", 30, 30, None, 1, True),
        ("u2", 1): ("x", 0, 0, None, 1, True),
    }


def test_state_history_null_states_merge(spark):
    """NULL is a VALUE in the state stream: consecutive NULLs are one
    run; NULL→x and x→NULL are boundaries (null-safe change detect)."""
    from deimos_spark.operators.timeseries import state_history

    rows = [
        ("u", 0, 1, "a"), ("u", 10, 2, None), ("u", 20, 3, None),
        ("u", 30, 4, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts long, event_id long, event_type string"
    )
    out = state_history(
        df, "user_id", "ts", "event_type", order_cols=("event_id",)
    )
    got = sorted(
        (r.run_id, r.event_type, r.n_events) for r in out.collect()
    )
    assert got == [(1, "a", 1), (2, None, 2), (3, "b", 1)]


def test_state_history_null_first_state_run_id_one(spark):
    """A key whose FIRST state is NULL still numbers its first run 1
    (the first row is always a boundary; lag-NULL eqNullSafe NULL must
    not produce a run_id of 0)."""
    from deimos_spark.operators.timeseries import state_history

    df = spark.createDataFrame(
        [("u", 0, 1, None), ("u", 10, 2, "a")],
        "user_id string, ts long, event_id long, event_type string",
    )
    out = state_history(
        df, "user_id", "ts", "event_type", order_cols=("event_id",)
    )
    got = sorted((r.run_id, r.event_type) for r in out.collect())
    assert got == [(1, None), (2, "a")]

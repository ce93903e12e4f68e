"""Engine facade: register topics, produce/consume/poll through one API —
the 'switching user' experience test."""

import pytest
from pyspark.sql import Row

from deimos_spark.engine import Engine

SCHEMA = {
    "type": "record",
    "name": "Widget",
    "fields": [
        {"name": "test_id", "type": "string"},
        {"name": "some_int", "type": "int"},
    ],
}

POLL_SCHEMA = {
    "type": "record",
    "name": "PollWidget",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "updated_at", "type": "long"},
        {"name": "name", "type": "string"},
    ],
}


@pytest.fixture
def engine(spark):
    eng = Engine(spark, topic_prefix="test.")
    eng.register_topic("widgets", SCHEMA, key_field="test_id")
    return eng


def test_unknown_topic_raises(engine):
    with pytest.raises(KeyError, match="not registered"):
        engine.producer("nope")


def test_produce_consume_roundtrip(spark, engine, tmp_path):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    prod = engine.producer("widgets")
    msgs = prod.publish(
        spark.createDataFrame([Row(test_id="a", some_int=1), Row(test_id="b", some_int=2)]),
        backend="memory",
    )
    assert {r["topic"] for r in msgs.collect()} == {"test.widgets"}

    cons = engine.consumer("widgets", table_path=str(tmp_path / "t"))
    w = Window.orderBy(F.monotonically_increasing_id())
    batch = (
        msgs.withColumn("offset", F.row_number().over(w))
        .withColumn("partition", F.lit(0))
        .select("key", "value", "partition", "offset")
    )
    cons.consume_batch(batch)
    got = {r["test_id"]: r["some_int"] for r in cons.table.read().collect()}
    assert got == {"a": 1, "b": 2}


def test_outbox_through_engine(spark, engine, tmp_path):
    ob = engine.outbox(str(tmp_path / "ob"))
    engine.producer("widgets").publish(
        spark.createDataFrame([Row(test_id="x", some_int=9)]),
        backend="outbox",
        outbox=ob,
    )
    assert ob.pending_count() == 1
    assert engine.outbox(str(tmp_path / "ob")) is ob  # cached handle


def test_poller_through_engine(spark, tmp_path):
    eng = Engine(spark)
    eng.register_topic("poll", POLL_SCHEMA, key_field="id")
    rows = [Row(id=i, updated_at=100 + i, name=f"w{i}") for i in range(3)]
    p = eng.poller(
        "poll",
        lambda: spark.createDataFrame(rows),
        str(tmp_path / "cursor.json"),
        ts_col="updated_at",
        id_col="id",
        delay_micros=0,
    )
    assert p.run_once(now_micros=10**9) == 3
    assert len(p.published_messages) == 3


def test_engine_level_registry_roundtrip(spark, tmp_path):
    """Engine(registry=...) makes every topic registry-backed: producers
    auto-register + frame with ids, consumers decode by per-message id."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from deimos_spark.schemas.registry import InMemorySchemaRegistry

    reg = InMemorySchemaRegistry()
    eng = Engine(spark, registry=reg)
    eng.register_topic("widgets", SCHEMA, key_field="test_id")

    prod = eng.producer("widgets")
    assert reg.versions("widgets-value") == [1]
    assert reg.versions("widgets-key") == [2]

    msgs = prod.publish(
        spark.createDataFrame([Row(test_id="a", some_int=1)]), backend="memory"
    )
    raw = bytes(msgs.head()["value"])
    assert raw[0] == 0 and int.from_bytes(raw[1:5], "big") == 1  # framed

    cons = eng.consumer("widgets", table_path=str(tmp_path / "t"))
    w = Window.orderBy(F.monotonically_increasing_id())
    batch = (
        msgs.withColumn("offset", F.row_number().over(w))
        .withColumn("partition", F.lit(0))
        .select("key", "value", "partition", "offset")
    )
    cons.consume_batch(batch)
    got = {r["test_id"]: r["some_int"] for r in cons.table.read().collect()}
    assert got == {"a": 1}


def test_events_ts_normalized_to_epoch_ns_under_any_tz(spark, tmp_path):
    """catalog.load_table: events.ts must become long epoch-ns whether
    the parquet carries TIMESTAMP(MICROS) (round-4 testdata, reads as
    timestamp_ntz) or is already long — and the NTZ conversion must be
    session-TZ independent (pure wall-clock arithmetic), matching
    DuckDB epoch_ns exactly."""
    import datetime as dt

    import duckdb
    from pyspark.sql import functions as F

    from deimos_spark.catalog import load_table

    sfdir = str(tmp_path)
    wall = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    spark.createDataFrame(
        [(1, wall)], "event_id long, ts timestamp_ntz"
    ).write.parquet(f"{sfdir}/events.parquet")

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = load_table(spark, sfdir, "events").select("ts").head()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert load_table(spark, sfdir, "events").schema["ts"].dataType.typeName() == "long"
    want = duckdb.sql(
        "SELECT CAST(epoch_ns(ts) AS BIGINT) "
        f"FROM read_parquet('{sfdir}/events.parquet/*.parquet')"
    ).fetchone()[0]
    assert got == want == 1709296245123456000


def test_fetch_arrow_rows_identical_to_collect(spark):
    """Engine.fetch_arrow is the documented bulk-fetch path: same rows
    as collect(), transferred as Arrow batches instead of py4j-pickled
    rows (r16, the x11 K=30 fetch-cost fix)."""
    from deimos_spark.engine import Engine
    from deimos_spark.queries import all_queries

    df = all_queries()["x11_resample_ffill"].builder(
        spark, "/root/testdata/sf0.001"
    )
    via_collect = [tuple(r) for r in df.collect()]
    tbl = Engine.fetch_arrow(df)
    via_arrow = list(zip(*(c.to_pylist() for c in tbl.columns)))
    assert via_arrow == via_collect
    assert tbl.column_names == df.columns

"""Engine.sql() — the SQL-string entry point (SURVEY §7 Phase 0
`run_sql`; VERDICT r8 gap #2). A user's first query is a SQL string;
these tests prove the whole b-series relational surface is reachable
that way, that views track mutable topic-table state, and that the
registry's s01 entry returns hash-identical results to DuckDB running
the SAME text.

Reference parity: the reference exposes queries through its DSL and
raw SQL alike (behavior only); here Engine.sql registers catalog +
topic views and delegates to spark.sql so Catalyst optimizes the
string exactly like the DataFrame API.
"""

import duckdb
import pytest

from deimos_spark.engine import Engine
from deimos_spark.queries import SQL_ENTRY_STATEMENT, all_queries

SF_DIR = "/root/testdata/sf0.001"

# b-series oracle strings that are DuckDB-dialect, not ANSI-portable to
# Spark. Everything else must run through Engine.sql verbatim.
_DUCK_ONLY: dict[str, str] = {
    "b25b_string_gauntlet": "CAST(x AS VARCHAR) — Spark requires a length or STRING",
    "b26b_date_gauntlet": "DuckDB interval/date_part spellings",
    "b28_json_funcs": "json_extract_string vs Spark get_json_object",
    "b29_array_funcs": "DuckDB len()/list_* vs Spark size()/array_*",
    "b33_simsearch_topk": "DuckDB list_dot_product vs Spark aggregate() over arrays",
}


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark).attach_catalog(SF_DIR)


def _rows(df_rows):
    rows = [
        tuple(round(v, 4) if isinstance(v, float) else v for v in r)
        for r in df_rows
    ]
    return sorted(rows, key=lambda r: tuple((v is None, str(v)) for v in r))


def test_s01_same_text_both_engines(engine):
    got = _rows([tuple(r) for r in engine.sql(SQL_ENTRY_STATEMENT).collect()])
    con = duckdb.connect()
    for t in ("customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = _rows(con.execute(SQL_ENTRY_STATEMENT).fetchall())
    assert got == want and len(got) > 0


def test_s01_registered_with_oracle():
    spec = all_queries()["s01_sql_string"]
    assert spec.oracle == SQL_ENTRY_STATEMENT


def test_h_series_runs_through_sql_verbatim(engine, spark):
    """VERDICT r11 #5: every TPC-H-derived h-query's oracle text is
    ANSI-portable and runs VERBATIM through Engine.sql, agreeing with
    its DataFrame builder. r12 made the last 7 portable: h03/h18
    (CAST AS STRING — both engines accept the alias), h04/h12/h21
    (datediff('day', a, b) > N → CAST(b AS DATE) > CAST(a AS DATE) +
    INTERVAL 'N' DAY, the exact integer-days equivalence), h02/h11
    (PARTSUPP_SQL's unnest([..]) → a VALUES inline table). No
    dialect-divergent h-queries remain."""
    checked = 0
    for name, spec in all_queries().items():
        if not name.startswith("h") or spec.oracle is None:
            continue
        try:
            via_sql = engine.sql(spec.oracle)
        except Exception as e:
            pytest.fail(f"{name}: oracle SQL not Spark-parsable: {e}")
        got = _rows([tuple(r) for r in via_sql.collect()])
        want = _rows([tuple(r) for r in spec.builder(spark, SF_DIR).collect()])
        assert got == want, f"{name}: SQL-string path diverges from builder"
        checked += 1
    assert checked == 22  # the full TPC-H-derived suite, zero skips


def test_xtc_series_portable_subset_through_sql(engine, spark):
    """r12 extension of the SQL-entry sweep to the x/t/c series. The
    text/similarity oracles are MOSTLY dialect-bound by necessity —
    they lean on DuckDB list machinery with no Spark-SQL spelling of
    the same name (`unnest`, `string_split[_regex]`, `list_*`,
    `regexp_split_to_array`, `quantile_cont`, `epoch_ns`,
    `len()` over lists) and on DuckDB's `('0x…')::BIGINT` hex-string
    cast (Spark casts that to NULL — the md5-bucket idiom every
    hashed-bucket oracle uses, e.g. t11's pbkt). Those run only as
    DataFrame builders + DuckDB oracles. The ANSI-portable subset
    below must keep running verbatim through Engine.sql and agree
    with its builders — a canary against the portable surface
    silently shrinking."""
    portable = [
        "t04_fingerprint",
        "t24_source_overlap",
        "x03_pivot",
        "x06_funnel",
        "x10_decimal_revenue",
    ]
    specs = all_queries()
    for name in portable:
        got = _rows([tuple(r) for r in engine.sql(specs[name].oracle).collect()])
        want = _rows(
            [tuple(r) for r in specs[name].builder(spark, SF_DIR).collect()]
        )
        assert got == want, f"{name}: SQL-string path diverges from builder"


def test_b_series_runs_through_sql(engine, spark):
    """Every ANSI-portable b-series oracle string is runnable as a SQL
    string via Engine.sql and agrees with its DataFrame builder."""
    checked = 0
    for name, spec in all_queries().items():
        if not name.startswith("b") or spec.oracle is None:
            continue
        if name in _DUCK_ONLY:
            continue
        try:
            via_sql = engine.sql(spec.oracle)
        except Exception as e:  # new dialect gap → make it an explicit skip
            pytest.fail(f"{name}: oracle SQL not Spark-parsable: {e}")
        got = _rows([tuple(r) for r in via_sql.collect()])
        want = _rows([tuple(r) for r in spec.builder(spark, SF_DIR).collect()])
        assert got == want, f"{name}: SQL-string path diverges from builder"
        checked += 1
    assert checked >= 25  # the b-series surface, minus the dialect skips


def test_topic_table_view_tracks_state(engine, spark, tmp_path):
    schema = {
        "type": "record",
        "name": "Widget",
        "fields": [
            {"name": "test_id", "type": "string"},
            {"name": "some_int", "type": "int"},
        ],
    }
    engine.register_topic("widgets", schema, key_field="test_id")
    tbl = engine.table(str(tmp_path / "widgets"), "widgets")

    # before any write: view exists, is empty, has the topic schema
    empty = engine.sql("SELECT * FROM widgets")
    assert empty.count() == 0
    assert set(empty.columns) == {"test_id", "some_int"}

    tbl.upsert(
        spark.createDataFrame(
            [("a", 1), ("b", 2)], "test_id string, some_int int"
        )
    )
    assert engine.sql("SELECT count(*) AS c FROM widgets").first().c == 2

    tbl.upsert(
        spark.createDataFrame([("a", 9)], "test_id string, some_int int")
    )
    got = {
        r.test_id: r.some_int
        for r in engine.sql("SELECT * FROM widgets").collect()
    }
    assert got == {"a": 9, "b": 2}  # view re-read, not a frozen plan


def test_register_view_rejects_junk(engine):
    with pytest.raises(TypeError):
        engine.register_view("nope", 42)


def test_sql_binds_only_referenced_views(spark):
    """VERDICT r9 #6: a registered-but-unreferenced view's factory must
    NOT be invoked by an unrelated sql() call — a catalog of hundreds
    of delta-backed topic tables would otherwise pay every table's
    log-replay cost on every interactive query."""
    eng = Engine(spark).attach_catalog(SF_DIR, tables=("nation",))
    calls = []

    def expensive_factory():
        calls.append(1)
        return spark.range(1).toDF("x")

    eng.register_view("expensive_table", expensive_factory)
    n = eng.sql("SELECT count(*) AS c FROM nation").first().c
    assert n == 25 and calls == []
    # ... and it IS invoked when referenced
    assert eng.sql("SELECT x FROM expensive_table").count() == 1
    assert calls == [1]


def test_sql_restores_preexisting_temp_view(spark):
    """ADVICE r9: two Engines (or user temp views) on one session must
    not clobber each other — sql() rebinds a shadowed pre-existing temp
    view after analysis and drops views it created itself."""
    spark.range(7).toDF("user_col").createOrReplaceTempView("nation")
    try:
        eng = Engine(spark).attach_catalog(SF_DIR, tables=("nation", "region"))
        assert eng.sql("SELECT count(*) AS c FROM nation").first().c == 25
        # the user's view is back, not the engine's
        assert spark.table("nation").columns == ["user_col"]
        # a view the engine created (no pre-existing one) is dropped
        assert eng.sql("SELECT count(*) AS c FROM region").first().c == 5
        assert not any(
            t.name == "region" for t in spark.catalog.listTables()
        )
    finally:
        spark.catalog.dropTempView("nation")


def test_sql_binds_backtick_quoted_views(spark):
    """ADVICE r10: `nation` (backtick-quoted, legal Spark SQL) must
    bind the view — the old name-probe lookbehind rejected a preceding
    backtick and raised TABLE_OR_VIEW_NOT_FOUND."""
    eng = Engine(spark).attach_catalog(SF_DIR, tables=("nation",))
    assert eng.sql("SELECT count(*) AS c FROM `nation`").first().c == 25


def test_s04_window_battery_same_text_both_engines(engine):
    """VERDICT r10 #8: the window-function battery (rank + frames +
    lag + sliding max) as ONE ANSI statement through Engine.sql, with
    the DuckDB oracle running the IDENTICAL text (registered as
    s04_sql_window). Exactness by construction: decimal running sum,
    BIGINT rank, pass-through doubles."""
    from deimos_spark.queries import SQL_ENTRY_WINDOW

    spec = all_queries()["s04_sql_window"]
    assert spec.oracle == SQL_ENTRY_WINDOW
    got = _rows([tuple(r) for r in engine.sql(SQL_ENTRY_WINDOW).collect()])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    want = _rows(con.execute(SQL_ENTRY_WINDOW).fetchall())
    assert len(got) > 0
    # decimal cells come back as Decimal on both sides; compare direct
    assert got == want

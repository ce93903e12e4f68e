"""JDBC-backed sources/sinks: cursor-pushdown poller source, state store,
and a transactional outbox table.

Reference behavior (studied from /root/reference/lib/deimos/utils/
db_poller/time_based.rb:28-66, lib/deimos/active_record_producer.rb:104-117
and lib/deimos/kafka_message.rb — behavior only): pollers read an RDBMS
with the resumable (ts, id) cursor predicate, ordered and limited
server-side; the outbox is a DB table whose delete-after-produce is a real
transaction.

Spark-first: the cursor predicate + ORDER BY + FETCH FIRST are composed
into the `dbtable` subquery, so the DATABASE does the scan/sort/limit and
only `batch_size` rows ever cross the wire. Spark's JDBC relation pushes
simple filters down but NOT sort or limit — without subquery composition
every poll would pull the whole delta and sort it in Spark. At a 100-TB
source table the difference is the poll being index-served vs a full scan.

Identifier quoting matters: Spark's JDBC writer creates case-sensitive
(quoted) lowercase columns, while unquoted names are case-folded by
ANSI engines (Derby, Postgres, Oracle). All composed SQL quotes column
identifiers.

Tested against Apache Derby embedded (ships with Spark); the composed SQL
is ANSI (FETCH FIRST n ROWS ONLY) with a `limit_syntax="limit"` escape
hatch for MySQL/SQLite-style engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Callable

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover
    from deimos_spark.sources.poller import PollCursor


def qident(name: str, quote: str = '"') -> str:
    """Quote an SQL identifier (doubling embedded quote chars)."""
    return quote + name.replace(quote, quote * 2) + quote


@dataclass
class JdbcConfig:
    """Connection settings shared by the JDBC source/sink classes."""

    url: str
    driver: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    quote: str = '"'
    limit_syntax: str = "fetch"  # "fetch" → ANSI FETCH FIRST; "limit" → LIMIT n

    def reader(self, spark: SparkSession, dbtable: str):
        r = spark.read.format("jdbc").option("url", self.url).option("dbtable", dbtable)
        if self.driver:
            r = r.option("driver", self.driver)
        for k, v in self.options.items():
            r = r.option(k, v)
        return r

    def writer(self, df: DataFrame, dbtable: str, mode: str = "append"):
        w = df.write.format("jdbc").option("url", self.url).option("dbtable", dbtable).mode(mode)
        if self.driver:
            w = w.option("driver", self.driver)
        for k, v in self.options.items():
            w = w.option(k, v)
        return w

    def limit_clause(self, n: int) -> str:
        if self.limit_syntax == "limit":
            return f"LIMIT {int(n)}"
        return f"FETCH FIRST {int(n)} ROWS ONLY"

    def connect(self, spark: SparkSession):
        """Driver-side java.sql.Connection for control-path DML (state
        flips, outbox deletes) — the data path never uses this."""
        jvm = spark._jvm
        if self.driver:
            jvm.java.lang.Class.forName(self.driver)
        return jvm.java.sql.DriverManager.getConnection(self.url)


def execute_update(spark: SparkSession, cfg: JdbcConfig, sql: str) -> int:
    """Run one DML statement (autocommit → atomic per statement)."""
    conn = cfg.connect(spark)
    try:
        st = conn.createStatement()
        try:
            return st.executeUpdate(sql)
        finally:
            st.close()
    finally:
        conn.close()


class JdbcCursorSource:
    """Cursor-ordered incremental scan over a JDBC table, fully pushed
    down: WHERE (resumable cursor) + ORDER BY (ts, id) + row limit are all
    inside the dbtable subquery, executed by the database (index-served on
    a (ts, id) index). Plugs into TimeBasedPoller as a batch-capable
    source."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: JdbcConfig,
        table: str,
        ts_col: str = "updated_at",
        id_col: str = "id",
    ):
        self.spark = spark
        self.cfg = cfg
        self.table = table
        self.ts_col = ts_col
        self.id_col = id_col

    def batch_subquery(self, cursor: "PollCursor", time_to: int, limit: int) -> str:
        """The composed dbtable subquery (pure string — unit-testable
        without a database). Reference predicate (time_based.rb):
          (ts = last_ts AND id > last_id) OR (ts > last_ts AND ts <= time_to)
        """
        q = self.cfg.quote
        ts, rid = qident(self.ts_col, q), qident(self.id_col, q)
        return (
            f"(SELECT * FROM {self.table} WHERE "
            f"({ts} = {int(cursor.last_ts)} AND {rid} > {int(cursor.last_id)}) "
            f"OR ({ts} > {int(cursor.last_ts)} AND {ts} <= {int(time_to)}) "
            f"ORDER BY {ts}, {rid} {self.cfg.limit_clause(limit)}) AS src"
        )

    def batch(self, cursor: "PollCursor", time_to: int, limit: int) -> DataFrame:
        return self.cfg.reader(self.spark, self.batch_subquery(cursor, time_to, limit)).load()

    def read_all(self) -> DataFrame:
        return self.cfg.reader(self.spark, self.table).load()

    # zero-arg call keeps the plain Callable[[], DataFrame] contract working
    __call__ = read_all


def make_state_updater(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    state_col: str,
    id_col: str = "id",
    published_value: str = "published",
    failed_value: str = "failed",
) -> Callable[[DataFrame, bool], None]:
    """StateBasedPoller.update_state backed by a JDBC UPDATE: flips the
    state column for the published keys in ONE statement (atomic under
    autocommit). Batch-bounded by the poller's batch_size, so the IN list
    stays small — this is the control path, not the data path."""

    def update_state(keys: DataFrame, success: bool) -> None:
        ids = [r[0] for r in keys.collect()]
        if not ids:
            return
        q = cfg.quote
        val = published_value if success else failed_value
        id_list = ", ".join(str(int(i)) for i in ids)
        sql = (
            f"UPDATE {table} SET {qident(state_col, q)} = '{val}' "
            f"WHERE {qident(id_col, q)} IN ({id_list})"
        )
        execute_update(spark, cfg, sql)

    return update_state


class JdbcOutboxTable:
    """Transactional-outbox over a real database table (reference:
    kafka_messages). Same surface as OutboxTable so OutboxRelay works
    unchanged; delete-after-produce is a single DELETE statement — atomic,
    no swap dance, safe under crash at any point (at-least-once: produce
    happens before delete)."""

    # Engines that default strings to non-comparable LOB types (Derby:
    # CLOB) break the relay's `topic = ?` filter — pin a VARCHAR at
    # creation. Only consulted when the table is first created.
    CREATE_COLUMN_TYPES = "topic VARCHAR(255)"

    def __init__(self, spark: SparkSession, cfg: JdbcConfig, table: str = "outbox_messages"):
        import threading

        self.spark = spark
        self.cfg = cfg
        self.table = table
        self._lock = threading.Lock()
        self._created = False

    def read(self) -> DataFrame:
        from deimos_spark.sources.outbox import OUTBOX_SCHEMA

        if not self._exists():
            return self.spark.createDataFrame([], OUTBOX_SCHEMA)
        return self.cfg.reader(self.spark, self.table).load()

    def _exists(self) -> bool:
        if self._created:
            return True
        try:
            self.cfg.reader(self.spark, f"(SELECT 1 AS probe FROM {self.table} {self.cfg.limit_clause(1)}) AS p").load().collect()
            self._created = True
        except Exception:
            return False
        return True

    def append(self, messages: DataFrame) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from deimos_spark.sources.outbox import OUTBOX_SCHEMA

        with self._lock:
            base = self.read().agg(F.coalesce(F.max("id"), F.lit(0))).head()[0]
            cols = messages.columns
            pk = F.col("partition_key") if "partition_key" in cols else F.col("key")
            rows = (
                messages.select(
                    F.col("key"),
                    F.col("value").alias("message"),
                    F.col("topic"),
                    pk.alias("partition_key"),
                )
                .withColumn(
                    "id",
                    base
                    + F.row_number().over(Window.orderBy(F.monotonically_increasing_id())),
                )
                .withColumn("created_at", F.current_timestamp())
                .select([f.name for f in OUTBOX_SCHEMA.fields])
            )
            # SaveMode.Append creates the table on first write
            self.cfg.writer(rows, self.table, mode="append").option(
                "createTableColumnTypes", self.CREATE_COLUMN_TYPES
            ).save()
            self._created = True

    def delete_ids(self, ids: list[int]) -> None:
        if not ids:
            return
        id_list = ", ".join(str(int(i)) for i in ids)
        execute_update(
            self.spark,
            self.cfg,
            f"DELETE FROM {self.table} WHERE {qident('id', self.cfg.quote)} IN ({id_list})",
        )

    def pending_count(self) -> int:
        return self.read().count()

    def decode_messages(self, codec) -> DataFrame:
        from pyspark.sql import functions as F

        return self.read().select(
            "id",
            "topic",
            F.col("key").cast("string").alias("key_str"),
            codec.decode(F.col("message")).alias("payload"),
            "created_at",
        )

    def lag_seconds(self) -> float:
        import time as _time

        from pyspark.sql import functions as F

        row = self.read().agg(F.min("created_at")).head()
        if row[0] is None:
            return 0.0
        return _time.time() - row[0].timestamp()

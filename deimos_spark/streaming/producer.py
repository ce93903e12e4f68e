"""Produce path: DataFrame → schema-projected, coerced, keyed, encoded
messages → sink (Kafka / memory / outbox table / files).

Pipeline parity with the reference's producer middleware (behavior studied
from /root/reference/lib/deimos/ext/producer_middleware.rb and
lib/deimos/message.rb — behavior only):

  transform → auto-fields (message_id=uuid, timestamp=now if schema has
  them and payload lacks them) → coerce to schema → key extraction (field
  path / payload_key / key schema) → tombstone detection (NULL payload) →
  encode key+value → topic routing.

The whole pipeline is ONE logical plan: on a cluster the produce of a
100 TB backfill is a single distributed write, no driver loops. Sinks are
pluggable like the reference's backends (kafka / kafka_async / outbox /
test).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deimos_spark.functions.coerce import apply_defaults, coercion_exprs
from deimos_spark.schemas.avro import AvroSchema, generate_key_schema
from deimos_spark.schemas.codecs import get_codec


@dataclass
class TopicConfig:
    """Topic registration: schema + key config, mirroring the reference's
    schema_route DSL (topic/schema/namespace/key_config)."""

    topic: str
    schema: AvroSchema
    key_field: str | None = None        # key_config field: 'col' (dotted ok)
    key_schema: AvroSchema | None = None  # key_config schema: 'Name_key'
    plain_key: bool = False             # key_config plain: true
    codec: str = "json"
    topic_prefix: str = ""
    # A29: truncate string payload columns to DDL limits pre-publish
    # (reference: kafka_source.rb truncate_columns)
    truncate_limits: dict[str, int] = field(default_factory=dict)
    # §2D partition_key override: expression (column name or Column) whose
    # value becomes the partition key instead of the encoded message key
    partition_key_col: str | None = None
    # sorted-JSON key bytes (stable partitioning — reference proto behavior)
    sorted_json_keys: bool = False
    # Confluent-style registry backend (reference: avro_schema_registry.rb):
    # when set, value bytes are registry-framed binary Avro and the schema
    # is auto-registered under `subject` (default "<topic>-value") at
    # producer construction — compat-mode gating applies there.
    registry: "object | None" = None  # InMemorySchemaRegistry (untyped: no cycle)
    subject: str | None = None

    @property
    def full_topic(self) -> str:
        return f"{self.topic_prefix}{self.topic}"

    @property
    def value_subject(self) -> str:
        return self.subject or f"{self.topic}-value"


class Producer:
    """engine.producer(topic_config).publish(df) — see module docstring."""

    # A12: global / per-instance emission disable (reference:
    # producer.rb disable_producers — a thread-local guard; here an
    # explicit switch usable as a context manager)
    _globally_disabled: bool = False

    @classmethod
    def disable_all(cls) -> "_DisableCtx":
        return _DisableCtx(cls)

    def __init__(
        self,
        config: TopicConfig,
        transform: Callable[[DataFrame], DataFrame] | None = None,
    ):
        self.config = config
        self.transform = transform
        if config.registry is not None and config.codec == "proto":
            # reference proto_schema_registry.rb behavior: register the
            # .proto under the value subject, frame with the assigned id
            from deimos_spark.schemas.registry import RegistryProtoCodec

            config.registry.register(
                config.value_subject, config.schema, "PROTOBUF"
            )
            self.value_codec = RegistryProtoCodec(
                config.registry, config.value_subject
            )
        elif config.registry is not None:
            from deimos_spark.schemas.registry import RegistryAvroCodec

            config.registry.register(config.value_subject, config.schema)
            self.value_codec = RegistryAvroCodec(config.registry, config.value_subject)
        else:
            self.value_codec = get_codec(config.codec, config.schema)
        if config.key_schema is not None:
            self._key_schema = config.key_schema
        elif config.key_field is not None and "." not in config.key_field:
            if hasattr(config.schema, "key_schema"):
                # ProtoSchema slices its own 1-field key message
                self._key_schema = config.schema.key_schema(config.key_field)
            else:
                self._key_schema = generate_key_schema(config.schema, config.key_field)
        else:
            self._key_schema = None
        # proto keys are ALWAYS sorted JSON: proto binary encoding is
        # unstable for partitioning (reference proto_base.rb:58-60)
        key_codec_name = (
            "sorted_json"
            if (config.sorted_json_keys or config.codec == "proto")
            else config.codec
        )
        if self._key_schema is None:
            self.key_codec = None
        elif (
            config.registry is not None
            and not config.sorted_json_keys
            and config.codec != "proto"  # proto keys stay sorted JSON
        ):
            from deimos_spark.schemas.registry import RegistryAvroCodec

            key_subject = f"{config.topic}-key"
            config.registry.register(key_subject, self._key_schema)
            self.key_codec = RegistryAvroCodec(config.registry, key_subject)
        else:
            self.key_codec = get_codec(key_codec_name, self._key_schema)

    # ------------------------------------------------------------ pipeline

    def build_messages(self, df: DataFrame) -> DataFrame:
        """df → (key BINARY, value BINARY, topic STRING, headers BINARY,
        partition_key BINARY)."""
        cfg = self.config
        if self.transform is not None:
            df = self.transform(df)
        for col, limit in cfg.truncate_limits.items():
            if col in df.columns:
                df = df.withColumn(col, F.substring(F.col(col), 1, limit))

        # Tombstone detection MUST run against the raw df and be materialized
        # BEFORE auto-fields and defaults: the reference skips add_fields for
        # blank payloads (message.rb add_fields early-return) and treats nil
        # payload as delete — filling message_id/timestamp/defaults first
        # would resurrect a delete marker into an upsert.
        df = df.withColumn("_tombstone", self._is_tombstone(df))
        df = self._add_auto_fields(df)

        # coercion + passthrough metadata in ONE projection so headers /
        # partition-key sources ride alongside the schema fields
        extra = [F.col("_tombstone")]
        if "headers" in df.columns:
            extra.append(F.to_json(F.col("headers")).cast("binary").alias("_headers"))
        schema_fields = set(cfg.schema.struct.fieldNames())
        if cfg.partition_key_col is not None and cfg.partition_key_col not in schema_fields:
            if cfg.partition_key_col not in df.columns:
                raise ValueError(
                    f"partition_key_col {cfg.partition_key_col!r} not in payload"
                )
            extra.append(
                F.col(cfg.partition_key_col).cast("string").cast("binary").alias("_pk")
            )
        out = df.select(*coercion_exprs(df, cfg.schema.struct), *extra)
        # schema-declared defaults fill NULL fields post-coercion (§1.1) —
        # gated on the materialized tombstone flag so an all-NULL payload
        # stays all-NULL and still encodes as a NULL value
        out = apply_defaults(out, cfg.schema, unless=F.col("_tombstone"))

        payload_cols = [c for c in out.columns if c in schema_fields]
        value_struct = F.when(
            ~F.col("_tombstone"), F.struct(*[F.col(c) for c in payload_cols])
        )
        out = out.withColumn("_value_struct", value_struct)

        key_col = self._key_column(out)
        if cfg.partition_key_col is None:
            pk = key_col  # default: the encoded key (producer_middleware.rb:50-56)
        elif cfg.partition_key_col in schema_fields:
            pk = F.col(cfg.partition_key_col).cast("string").cast("binary")
        else:
            pk = F.col("_pk")
        headers = (
            F.col("_headers") if "_headers" in out.columns
            else F.lit(None).cast("binary")
        )
        return out.select(
            key_col.alias("key"),
            self.value_codec.encode(F.col("_value_struct")).alias("value"),
            F.lit(cfg.full_topic).alias("topic"),
            headers.alias("headers"),
            pk.alias("partition_key"),
        )

    def _add_auto_fields(self, df: DataFrame) -> DataFrame:
        """message_id=UUID / timestamp=now autofill when the schema declares
        them (reference: message.rb:38-56) — skipped for tombstone rows, as
        the reference skips blank payloads. Nondeterminism is confined to
        this produce path by design."""
        schema_fields = {f.name for f in self.config.schema.struct.fields}
        if "message_id" in schema_fields:
            src = F.col("message_id") if "message_id" in df.columns else F.lit(None)
            df = df.withColumn(
                "message_id",
                F.when(F.col("_tombstone"), src)
                .otherwise(F.coalesce(src, F.expr("uuid()"))),
            )
        if "timestamp" in schema_fields:
            src = F.col("timestamp") if "timestamp" in df.columns else F.lit(None)
            df = df.withColumn(
                "timestamp",
                F.when(F.col("_tombstone"), src)
                .otherwise(F.coalesce(src, F.current_timestamp().cast("string"))),
            )
        return df

    def _is_tombstone(self, df: DataFrame) -> Column:
        """A row is a tombstone when every non-key payload column is NULL
        (reference Message#blank payload → nil → delete downstream)."""
        key_field = self.config.key_field
        payload_cols = [
            c
            for c in self.config.schema.struct.fieldNames()
            if c in df.columns and c != key_field
        ]
        if not payload_cols:
            return F.lit(False)
        cond = F.lit(True)
        for c in payload_cols:
            cond = cond & F.col(c).isNull()
        return cond

    def _key_column(self, df: DataFrame) -> Column:
        cfg = self.config
        if cfg.key_field is None and self.key_codec is None:
            if cfg.plain_key and "payload_key" in df.columns:
                return F.col("payload_key").cast("string").cast("binary")
            return F.lit(None).cast("binary")
        if cfg.key_field is not None and "." in cfg.key_field:
            # dotted path navigates nested payload (producer_middleware.rb:112-118)
            return F.col(cfg.key_field).cast("string").cast("binary")
        key_struct = F.struct(
            *[F.col(n) for n in self._key_schema.struct.fieldNames()]
        )
        return self.key_codec.encode(key_struct)

    # --------------------------------------------------------------- sinks

    def publish(self, df: DataFrame, backend: str = "memory", **kw) -> DataFrame | None:
        """Dispatch like the reference's backend switch
        (producer.rb:148-161): kafka / kafka_async / outbox / memory.
        Returns None (and publishes nothing) while producers are disabled."""
        if Producer._globally_disabled:
            return None
        messages = self.build_messages(df)
        if backend in ("kafka", "kafka_async"):
            return self._publish_kafka(messages, sync=backend == "kafka", **kw)
        if backend == "outbox":
            return self._publish_outbox(messages, **kw)
        if backend == "memory":
            return messages  # caller collects/asserts — the test backend
        if backend == "fake":
            return self._publish_fake(messages, **kw)
        if backend == "files":
            messages.write.mode("append").parquet(kw["path"])
            return None
        raise ValueError(f"unknown backend {backend!r}")

    def _publish_fake(self, messages: DataFrame, **kw):
        """Kafka-protocol fake (streaming/fakebroker.py): appends each
        message through the broker's sticky key-partitioner, giving real
        per-partition offsets/ordering to consume tests. Driver-side by
        design — a bounded test backend, like `memory`."""
        broker = kw["broker"]
        for r in messages.select("key", "value", "topic").collect():
            broker.produce(
                r["topic"],
                bytes(r["key"]) if r["key"] is not None else None,
                bytes(r["value"]) if r["value"] is not None else None,
            )
        return None

    def _publish_kafka(self, messages: DataFrame, sync: bool, **kw):
        bootstrap = kw.get("bootstrap_servers")
        if not bootstrap:
            raise NotImplementedError(
                "Kafka publish needs bootstrap_servers (and the "
                "spark-sql-kafka package on the classpath)"
            )
        (
            messages.select("key", "value", "topic")
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("kafka.acks", "all" if sync else "1")
            .save()
        )
        return None

    def _publish_outbox(self, messages: DataFrame, **kw):
        """Write encoded messages into the outbox table inside the caller's
        batch (reference: backends/outbox.rb); the relay
        (sources.outbox.OutboxRelay) moves them to Kafka later."""
        from deimos_spark.sources.outbox import OutboxTable

        outbox: OutboxTable = kw["outbox"]
        outbox.append(messages)
        return None


class _DisableCtx:
    def __init__(self, cls):
        self._cls = cls

    def __enter__(self):
        self._cls._globally_disabled = True
        return self

    def __exit__(self, *exc):
        self._cls._globally_disabled = False
        return False

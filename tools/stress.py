"""Scale-validation harness: replicate the sf0.1 tables K× (key-shifted,
so cardinalities grow instead of duplicating) into a scratch dir, then run
the headline queries at EACH K and report the scaling curve.

Usage: python tools/stress.py [K1,K2,...] [scratch_dir]
       python tools/stress.py 1,4,10   # default

The point is not absolute speed — local[32] is one machine — but SHAPE:
per-query time should grow ~linearly with K for scans/aggs and stay
near-constant for top-k; anything super-linear is a plan that won't
survive a real 100× scale-up. The emitted JSON (commit as STRESS.json)
includes a per-query `scaling` exponent fit from the curve and a
`superlinear` flag list: exponent > 1.25 with enough absolute time to
be signal (>0.3s at max K)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deimos_spark.catalog import TABLES
from deimos_spark.queries import all_queries
from deimos_spark.session import get_spark

# key columns to shift per replica so joins keep matching within a replica
# but cardinality actually grows K×
KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dims stay fixed (they'd be broadcast at any scale)
    "supplier": [],
    "part": [],
    "nation": [],
    "region": [],
}
SHIFT = 10_000_000

QUERIES = [
    "b01_scan_count", "b03_filter", "b11_agg_hash", "b16_sort_topk",
    "b19_window_running", "b20_keep_last_per_key",
    "h01_pricing_summary", "h05_local_supplier_volume", "h13_customer_distribution",
    "h18_large_volume_customers", "h21_waiting_supplier",
    "b31_dedup_exact", "t01_token_stats", "b33_simsearch_topk",
    "t05_jaccard_vs_query", "t06_minhash_pairs", "t11_levenshtein_pairs",
    "t12_top_bigrams", "t13_repetition_stats", "t14_benchmark_contamination",
    "h02_min_cost_supplier", "h11_important_stock",
    "x06_funnel", "t21_dsir_weights", "x10_decimal_revenue",
    # t27_semdedup is deliberately NOT here: its per-cluster pair pass
    # is Theta(N^2/K) BY DESIGN and the operator's contract requires
    # K ~ sqrt(N) (semdedup.py docstring + max_cluster_rows guard);
    # stressing it at the registry's fixed K=8 would measure documented
    # misuse, not a plan defect.
    "t23_unigram_ppl", "t24_source_overlap", "x13_sessionize",
    "t10b_bpe_real", "t25_chunk_plan", "t26_substr_dedup",
]

# super-linear flagging thresholds (see module docstring)
EXP_LIMIT = 1.25
MIN_SIGNAL_SEC = 0.3


def _build_scaled(spark, src: str, scratch: str, k: int) -> int:
    if os.path.exists(scratch):
        shutil.rmtree(scratch)
    os.makedirs(scratch)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        keys = KEYS.get(t, [])
        if keys and k > 1:
            reps = spark.range(k).withColumnRenamed("id", "_r")
            big = df.crossJoin(reps)
            for c in keys:
                big = big.withColumn(c, F.col(c) + F.col("_r") * F.lit(SHIFT))
            big = big.drop("_r")
        else:
            big = df
        big.write.mode("overwrite").parquet(f"{scratch}/{t}.parquet")
    return spark.read.parquet(f"{scratch}/lineitem.parquet").count()


def _time_queries(spark, scratch: str) -> dict[str, float]:
    from deimos_spark.queries import clear_plan_cache

    specs = all_queries()
    for name in QUERIES:  # warm-up (plans + codegen)
        specs[name].builder(spark, scratch).collect()
    timings = {}
    for name in QUERIES:
        best = None
        for _ in range(3):
            # fresh lineage per run: re-collecting a cached DataFrame
            # reuses shuffle map outputs, which would time only the
            # final stage and UNDERSTATE the scaling exponent
            clear_plan_cache()
            t0 = time.perf_counter()
            specs[name].builder(spark, scratch).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    return timings


def _between_rounds(spark) -> None:
    """Session hygiene between K rounds: drop cached plans bound to the
    previous K's (now deleted) scratch dir and nudge the JVM to collect —
    without this, accumulated state from earlier rounds shows up as
    multi-hundred-ms GC noise in later rounds' timings."""
    from deimos_spark.queries import clear_plan_cache

    clear_plan_cache()
    spark.catalog.clearCache()
    try:
        spark._jvm.System.gc()
    except Exception:
        pass


def _null_produce(topic, batch) -> None:
    """Sink that accepts either relay-mode batch shape (driver: list of
    Rows; executor: pandas DataFrame) and does nothing — so the bench
    measures the relay machinery + transport, not a fake broker."""


def _relay_bench(spark, scratch: str, n: int = 100_000) -> dict:
    """Executor-relay evidence (SURVEY A27): drain an n-row outbox with
    ~4 KB payloads (400 MB total) in BOTH relay modes. Driver mode
    single-threads every payload byte through driver collect(); executor
    mode produces inside 16 parallel mapInPandas tasks and only the
    delivered ids cross back. On a real cluster the driver path also
    crosses the network to one node; local[32] understates the gap, so
    beating driver mode here is conservative evidence."""
    from pyspark.sql import functions as F

    from deimos_spark.sources.outbox import OutboxRelay, OutboxTable

    payload = "x" * 4096
    path = f"{scratch}/outbox"
    ob = OutboxTable(spark, path)
    ob.append(
        spark.range(n).select(
            F.encode((F.col("id") % 1024).cast("string"), "utf-8").alias("key"),
            F.encode(F.concat_ws("-", F.col("id").cast("string"),
                                 F.lit(payload)), "utf-8").alias("value"),
            F.lit("bench_topic").alias("topic"),
        )
    )
    batch = ob.read().orderBy("id").limit(n)
    out = {}
    # Time ONLY the produce leg — the step the two modes differ on. The
    # surrounding drain loop (reads, delete_ids rewrite) is byte-identical
    # in both modes and would dilute the comparison. Median of 3 so one
    # GC pause can't flip the verdict. Same table both modes (immutable).
    for mode in ("driver", "executor"):
        relay = OutboxRelay(
            ob, _null_produce, batch_size=n, mode=mode,
            executor_parallelism=16,
        )
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            if mode == "executor":
                sent = relay._produce_executor("bench_topic", batch)
            else:
                rows = batch.collect()
                _null_produce("bench_topic", rows)
                sent = len(rows)
            runs.append(time.perf_counter() - t0)
        dt = sorted(runs)[1]
        out[mode] = {
            "rows": sent,
            "sec": round(dt, 2),
            "rows_per_sec": int(sent / dt) if dt else 0,
        }
    shutil.rmtree(path, ignore_errors=True)
    out["executor_ge_driver"] = (
        out["executor"]["rows_per_sec"] >= out["driver"]["rows_per_sec"]
    )
    return out


def _consume_merge_bench(spark, scratch: str, k: int) -> dict:
    """Streaming-path stress (VERDICT r6 #5): BatchConsumer →
    DeltaKeyedTable MERGE throughput at a K-scaled batch size, both DV
    modes. The kafka-shaped batch (JSON-encoded via the real produce
    pipeline) is materialized to parquet OUTSIDE the timed region, so the
    timing covers decode → compact → MERGE — the consume path itself.
    n rows span n/2 keys (per-key compaction halves the batch) and the
    table is pre-seeded with half the keys, so the merge exercises
    update + insert together; a 10%-key delete is timed separately (the
    DV fold vs survivor-rewrite distinction)."""
    from deimos_spark.operators.delta_interop import DeltaKeyedTable
    from deimos_spark.schemas.avro import parse_avsc
    from deimos_spark.streaming.consumer import BatchConsumer, ConsumerConfig
    from deimos_spark.streaming.producer import Producer, TopicConfig

    n = 30_000 * k
    nkeys = max(n // 2, 1)
    schema = parse_avsc(
        {
            "type": "record",
            "name": "StressMsg",
            "fields": [
                {"name": "test_id", "type": "string"},
                {"name": "v", "type": "int"},
                {"name": "payload", "type": "string"},
            ],
        }
    )
    prod = Producer(
        TopicConfig(topic="stress", schema=schema, key_field="test_id")
    )
    rows_df = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % nkeys).cast("string")).alias(
            "test_id"
        ),
        F.col("id").cast("int").alias("v"),
        F.repeat(F.lit("x"), 200).alias("payload"),
    )
    raw_dir = os.path.join(scratch, f"raw_{k}")
    (
        prod.build_messages(rows_df)
        .withColumn("partition", F.lit(0))
        .withColumn("offset", F.monotonically_increasing_id())
        .select("key", "value", "partition", "offset")
        .write.mode("overwrite")
        .parquet(raw_dir)
    )
    raw = spark.read.parquet(raw_dir)
    seed = spark.range(nkeys // 2).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("test_id"),
        F.lit(-1).alias("v"),
        F.lit("seed").alias("payload"),
    )
    del_keys = spark.range(max(nkeys // 10, 1)).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("test_id")
    )
    out = {}
    for dv in (False, True):
        tdir = os.path.join(scratch, f"tbl_{'dv' if dv else 'rw'}_{k}")
        shutil.rmtree(tdir, ignore_errors=True)
        table = DeltaKeyedTable(spark, tdir, ["test_id"], use_dvs=dv)
        table.upsert(seed)
        consumer = BatchConsumer(
            ConsumerConfig(schema=schema, key_cols=["test_id"]), table
        )
        t0 = time.perf_counter()
        consumer.consume_batch(raw)
        merge_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        table.delete(del_keys)
        delete_sec = time.perf_counter() - t0
        out["dv" if dv else "rewrite"] = {
            "rows": n,
            "merge_sec": round(merge_sec, 2),
            "rows_per_sec": int(n / merge_sec) if merge_sec else 0,
            "delete_sec": round(delete_sec, 2),
        }
        shutil.rmtree(tdir, ignore_errors=True)
    shutil.rmtree(raw_dir, ignore_errors=True)
    return out


def _relay_curve_bench(spark, scratch: str, k: int) -> dict:
    """Executor-mode relay throughput at a K-scaled outbox (the per-K
    twin of _relay_bench's fixed 100k two-mode comparison)."""
    from deimos_spark.sources.outbox import OutboxRelay, OutboxTable

    n = 10_000 * k
    payload = "x" * 4096
    path = f"{scratch}/outbox_k{k}"
    ob = OutboxTable(spark, path)
    ob.append(
        spark.range(n).select(
            F.encode((F.col("id") % 1024).cast("string"), "utf-8").alias(
                "key"
            ),
            F.encode(
                F.concat_ws(
                    "-", F.col("id").cast("string"), F.lit(payload)
                ),
                "utf-8",
            ).alias("value"),
            F.lit("bench_topic").alias("topic"),
        )
    )
    batch = ob.read().orderBy("id").limit(n)
    relay = OutboxRelay(
        ob, _null_produce, batch_size=n, mode="executor",
        executor_parallelism=16,
    )
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        sent = relay._produce_executor("bench_topic", batch)
        runs.append(time.perf_counter() - t0)
    dt = sorted(runs)[1]
    shutil.rmtree(path, ignore_errors=True)
    return {
        "rows": sent,
        "sec": round(dt, 2),
        "rows_per_sec": int(sent / dt) if dt else 0,
    }


def _interop_bench(spark, kdir: str) -> dict:
    """Read-path cost of the lakehouse interop layers at this K: the
    scaled documents table re-landed as (a) a 25-commit Delta table with
    checkpoints every 10 commits and (b) an Iceberg v2 table authored
    over the same parquet files. Timed read = fresh reader (full
    metadata walk) + count, so the curve shows metadata overhead staying
    flat while the scan grows with data."""
    from pyspark.sql import functions as F

    from deimos_spark.operators.delta_interop import (
        DeltaTableReader,
        DeltaTableWriter,
    )
    from deimos_spark.operators.iceberg_interop import IcebergTableReader
    from deimos_spark.schemas.avro_ocf import ocf_write

    out: dict = {}
    docs_dir = f"{kdir}/documents.parquet"

    # ---------------- Delta: many-commit log + checkpointed replay
    dpath = f"{kdir}/delta_docs"
    w = DeltaTableWriter(spark, dpath, checkpoint_interval=10)
    docs = spark.read.parquet(docs_dir)
    for i in range(25):
        w.append(docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(25)) == i))
    DeltaTableReader(spark, dpath).read().count()  # warm scan cache/codegen
    runs, rows = [], 0
    for _ in range(3):
        t0 = time.perf_counter()
        r = DeltaTableReader(spark, dpath)
        rows = r.read().count()
        runs.append(time.perf_counter() - t0)
        replayed, listed = r.last_snapshot_commit_reads, r.last_snapshot_listed_log
    out["delta"] = {
        "rows": rows,
        "commits": 25,
        "json_replayed": replayed,
        "listed_log": listed,
        "sec": round(sorted(runs)[1], 3),
    }

    # incremental consume (round 8): the LAST commit's change rows with
    # 24 commits of history behind them — read_changes cost tracks the
    # consumed slice (~1/25 of the table), not the table; the curve's
    # exponent vs K shows the checkpoint-resume pattern staying viable
    # as everything scales together
    DeltaTableReader(spark, dpath).read_changes(24, 24).count()  # warm
    cruns, crows = [], 0
    for _ in range(3):
        t0 = time.perf_counter()
        crows = (
            DeltaTableReader(spark, dpath).read_changes(24, 24).count()
        )
        cruns.append(time.perf_counter() - t0)
    out["delta_changes_last"] = {
        "rows": crows,
        "sec": round(sorted(cruns)[1], 3),
    }

    # ---------------- Iceberg: author v2 metadata over the parquet files
    ipath = f"{kdir}/ice_docs"
    meta_dir = os.path.join(ipath, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    files = sorted(
        os.path.join(docs_dir, f)
        for f in os.listdir(docs_dir)
        if f.endswith(".parquet")
    )
    type_map = {
        "bigint": "long", "int": "int", "string": "string",
        "double": "double", "float": "float", "boolean": "boolean",
        "date": "date", "binary": "binary",
    }
    ice_fields = [
        {
            "id": i,
            "name": f.name,
            "required": False,
            "type": type_map[f.dataType.simpleString()],
        }
        for i, f in enumerate(docs.schema.fields, 1)
    ]
    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
    mpath = os.path.join(meta_dir, "m0.avro")
    ocf_write(
        mpath,
        entry_schema,
        [
            {
                "status": 1,
                "data_file": {
                    "content": 0,
                    "file_path": f"file://{p}",
                    "file_format": "PARQUET",
                    "record_count": 0,
                    "file_size_in_bytes": os.path.getsize(p),
                },
            }
            for p in files
        ],
    )
    ml_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
        ],
    }
    mlpath = os.path.join(meta_dir, "snap-1.avro")
    ocf_write(
        mlpath,
        ml_schema,
        [{
            "manifest_path": f"file://{mpath}",
            "manifest_length": os.path.getsize(mpath),
            "partition_spec_id": 0,
        }],
    )
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(
            {
                "format-version": 2,
                "table-uuid": "00000000-0000-0000-0000-000000000000",
                "location": f"file://{ipath}",
                "last-updated-ms": 0,
                "last-column-id": len(ice_fields),
                "schemas": [
                    {"type": "struct", "schema-id": 0, "fields": ice_fields}
                ],
                "current-schema-id": 0,
                "partition-spec": [],
                "last-sequence-number": 1,
                "snapshots": [
                    {
                        "snapshot-id": 1,
                        "timestamp-ms": 0,
                        "manifest-list": f"file://{mlpath}",
                    }
                ],
                "current-snapshot-id": 1,
            },
            fh,
        )
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    IcebergTableReader(spark, ipath).read().count()  # warm
    runs, rows = [], 0
    for _ in range(3):
        t0 = time.perf_counter()
        rows = IcebergTableReader(spark, ipath).read().count()
        runs.append(time.perf_counter() - t0)
    out["iceberg"] = {
        "rows": rows,
        "data_files": len(files),
        "sec": round(sorted(runs)[1], 3),
    }

    # Iceberg incremental consume (round 8): writer-authored 10-snapshot
    # table, read_incremental of only the newest snapshot — O(files
    # added by it); only its own manifests open
    from deimos_spark.operators.iceberg_interop import IcebergTableWriter

    ipath2 = f"{kdir}/ice_docs_incr"
    iw = IcebergTableWriter(spark, ipath2)
    for i in range(10):
        iw.append(
            docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(10)) == i)
        )
    last = IcebergTableReader(spark, ipath2).metadata[
        "current-snapshot-id"
    ]
    IcebergTableReader(spark, ipath2).read_incremental(
        from_snapshot_id=last - 1
    ).count()  # warm
    iruns, irows = [], 0
    for _ in range(3):
        t0 = time.perf_counter()
        irows = (
            IcebergTableReader(spark, ipath2)
            .read_incremental(from_snapshot_id=last - 1)
            .count()
        )
        iruns.append(time.perf_counter() - t0)
    out["iceberg_incremental_last"] = {
        "rows": irows,
        "snapshots": 10,
        "sec": round(sorted(iruns)[1], 3),
    }
    return out


def _graph_bench(spark, k: int) -> dict:
    """t20 connected-components scaling (VERDICT r5 #6): K× synthetic
    near-dup graphs with FIXED diameter — 2000K star clusters (hub + 8
    spokes, the dominant real shape) and 400K chains of length 5 (multi-
    round convergence, the path the max_iters gate guards). Rounds stay
    constant with K, so healthy scaling is ~linear per-round join work —
    the per-round fixed cost (two joins + a control count) dominates at
    small K and amortizes as K grows, so the exponent UNDERSTATES
    nothing at scale."""
    n_stars, n_chains = 2000 * k, 400 * k
    stars = (
        spark.range(n_stars)
        .selectExpr("id * 100 AS hub")
        .selectExpr("hub", "explode(sequence(1, 8)) AS s")
        .selectExpr("hub AS id_a", "hub + s AS id_b")
    )
    chain_base = n_stars * 100 + 1000
    chains = (
        spark.range(n_chains)
        .selectExpr(f"{chain_base} + id * 100 AS start")
        .selectExpr("start", "explode(sequence(0, 4)) AS i")
        .selectExpr("start + i AS id_a", "start + i + 1 AS id_b")
    )
    edges = stars.union(chains)
    from deimos_spark.operators.graph import cluster_sizes

    cluster_sizes(edges).collect()  # warm
    runs, n = [], 0
    for _ in range(2):
        t0 = time.perf_counter()
        got = cluster_sizes(edges).collect()
        runs.append(time.perf_counter() - t0)
        n = len(got)
    assert n == n_stars + n_chains, (n, n_stars + n_chains)
    return {
        "edges": n_stars * 8 + n_chains * 5,
        "clusters": n,
        "sec": round(min(runs), 3),
    }


def _delete_reads_bench(spark, kdir: str) -> dict:
    """Read-path cost of soft-deleted tables at this K (VERDICT r5 #6):
    (a) a Delta table whose rows were 10%-deleted via deletion vectors
    (scan + distributed DV expansion + anti-join), and (b) an Iceberg v2
    table carrying an EQUALITY-delete file over the same 10% of keys
    (sequence-gated null-safe anti-join). Timed read = fresh reader +
    count, 3 runs, median."""
    from pyspark.sql import functions as F

    from deimos_spark.operators.delta_interop import (
        DeltaKeyedTable,
        DeltaTableReader,
    )
    from deimos_spark.operators.iceberg_interop import IcebergTableReader
    from deimos_spark.schemas.avro_ocf import ocf_write

    out: dict = {}
    docs = spark.read.parquet(f"{kdir}/documents.parquet")
    dead = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)

    # -------- Delta: DV-deleted table
    dpath = f"{kdir}/delta_dv_docs"
    kt = DeltaKeyedTable(spark, dpath, ["doc_id"], use_dvs=True)
    kt.upsert(docs)
    kt.delete(dead.select("doc_id"))
    DeltaTableReader(spark, dpath).read().count()  # warm
    runs, rows = [], 0
    for _ in range(3):
        t0 = time.perf_counter()
        rows = DeltaTableReader(spark, dpath).read().count()
        runs.append(time.perf_counter() - t0)
    out["delta_dv"] = {"live_rows": rows, "sec": round(sorted(runs)[1], 3)}

    # -------- Iceberg: equality-delete table authored over the data
    ipath = f"{kdir}/ice_eq_docs"
    meta_dir = os.path.join(ipath, "metadata")
    data_dir = os.path.join(ipath, "data")
    os.makedirs(meta_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    docs.write.mode("overwrite").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    eq_path = os.path.join(ipath, "eq-del.parquet")
    dead.select("doc_id").toPandas().to_parquet(eq_path)
    type_map = {
        "bigint": "long", "int": "int", "string": "string",
        "double": "double", "float": "float", "boolean": "boolean",
        "date": "date", "binary": "binary",
    }
    ice_fields = [
        {"id": i, "name": f.name, "required": False,
         "type": type_map[f.dataType.simpleString()]}
        for i, f in enumerate(docs.schema.fields, 1)
    ]
    doc_id_fid = next(
        f["id"] for f in ice_fields if f["name"] == "doc_id"
    )
    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {"name": "equality_ids",
                         "type": ["null", {"type": "array",
                                           "items": "int"}],
                         "default": None},
                    ],
                },
            },
        ],
    }
    m_data = os.path.join(meta_dir, "m-data.avro")
    ocf_write(
        m_data, entry_schema,
        [
            {
                "status": 1, "sequence_number": 1,
                "data_file": {
                    "content": 0, "file_path": f"file://{p}",
                    "file_format": "PARQUET", "record_count": 0,
                    "file_size_in_bytes": os.path.getsize(p),
                    "equality_ids": None,
                },
            }
            for p in files
        ],
    )
    m_del = os.path.join(meta_dir, "m-del.avro")
    ocf_write(
        m_del, entry_schema,
        [{
            "status": 1, "sequence_number": 2,
            "data_file": {
                "content": 2, "file_path": f"file://{eq_path}",
                "file_format": "PARQUET", "record_count": 0,
                "file_size_in_bytes": os.path.getsize(eq_path),
                "equality_ids": [doc_id_fid],
            },
        }],
    )
    ml_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None},
        ],
    }
    mlpath = os.path.join(meta_dir, "snap-1.avro")
    ocf_write(
        mlpath, ml_schema,
        [
            {"manifest_path": f"file://{m_data}",
             "manifest_length": os.path.getsize(m_data),
             "partition_spec_id": 0, "sequence_number": 1},
            {"manifest_path": f"file://{m_del}",
             "manifest_length": os.path.getsize(m_del),
             "partition_spec_id": 0, "sequence_number": 2},
        ],
    )
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(
            {
                "format-version": 2,
                "table-uuid": "00000000-0000-0000-0000-000000000001",
                "location": f"file://{ipath}",
                "last-updated-ms": 0,
                "last-column-id": len(ice_fields),
                "schemas": [
                    {"type": "struct", "schema-id": 0, "fields": ice_fields}
                ],
                "current-schema-id": 0,
                "partition-spec": [],
                "last-sequence-number": 2,
                "snapshots": [
                    {"snapshot-id": 1, "timestamp-ms": 0,
                     "manifest-list": f"file://{mlpath}"}
                ],
                "current-snapshot-id": 1,
            },
            fh,
        )
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    IcebergTableReader(spark, ipath).read().count()  # warm
    runs, rows = [], 0
    for _ in range(3):
        t0 = time.perf_counter()
        rows = IcebergTableReader(spark, ipath).read().count()
        runs.append(time.perf_counter() - t0)
    out["iceberg_eq"] = {"live_rows": rows, "sec": round(sorted(runs)[1], 3)}
    return out


def _fit_exponent(ks: list[int], times: list[float]) -> float:
    """Least-squares slope of log(time) vs log(K) — the empirical scaling
    exponent (1.0 = linear, 0 = constant). Times are floored at 50ms so
    scheduling noise on toy queries doesn't fake a trend."""
    import math

    xs = [math.log(k) for k in ks]
    ys = [math.log(max(t, 0.05)) for t in times]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return 0.0
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    ks = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1, 4, 10]
    )
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/deimos_stress"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("deimos_stress")

    curve: dict[str, dict] = {name: {} for name in QUERIES}
    interop: dict[str, dict] = {
        "delta": {}, "iceberg": {}, "delta_dv": {}, "iceberg_eq": {},
        "delta_changes_last": {}, "iceberg_incremental_last": {},
    }
    graph_curve: dict[int, dict] = {}
    interop_detail: dict = {}
    consume_curve: dict[int, dict] = {}
    relay_curve: dict[int, dict] = {}
    rows = {}
    for k in sorted(ks):
        # distinct dir per K: Spark caches file listings by path, and
        # rewriting the same path serves stale file lists to later runs
        kdir = f"{scratch}_k{k}"
        rows[k] = _build_scaled(spark, src, kdir, k)
        print(f"K={k}: lineitem rows = {rows[k]:,}", file=sys.stderr)
        for name, sec in _time_queries(spark, kdir).items():
            curve[name][k] = sec
        io = _interop_bench(spark, kdir)
        io.update(_delete_reads_bench(spark, kdir))
        for fmt in interop:
            interop[fmt][k] = io[fmt]["sec"]
        interop_detail[k] = io
        graph_curve[k] = _graph_bench(spark, k)
        consume_curve[k] = _consume_merge_bench(spark, scratch + "_stream", k)
        relay_curve[k] = _relay_curve_bench(spark, scratch + "_stream", k)
        shutil.rmtree(kdir, ignore_errors=True)
        _between_rounds(spark)

    relay = _relay_bench(spark, scratch + "_relay")

    sks = sorted(ks)
    scaling = {
        name: round(_fit_exponent(sks, [curve[name][k] for k in sks]), 3)
        for name in QUERIES
    }
    superlinear = sorted(
        name
        for name, exp in scaling.items()
        if exp > EXP_LIMIT and curve[name][sks[-1]] > MIN_SIGNAL_SEC
    )
    print(
        json.dumps(
            {
                "ks": sks,
                "lineitem_rows": {str(k): rows[k] for k in sks},
                "queries": curve,
                "scaling_exponent": scaling,
                "superlinear": superlinear,
                "interop_read": {
                    "curve": interop,
                    "exponent": {
                        fmt: round(
                            _fit_exponent(
                                sks, [interop[fmt][k] for k in sks]
                            ),
                            3,
                        )
                        for fmt in interop
                    },
                    "detail_at_max_k": interop_detail[sks[-1]],
                },
                "graph_cc": {
                    "curve": {str(k): graph_curve[k] for k in sks},
                    "exponent": round(
                        _fit_exponent(
                            sks, [graph_curve[k]["sec"] for k in sks]
                        ),
                        3,
                    ),
                },
                "outbox_relay_100k": relay,
                # streaming-path curves (VERDICT r6 #5): consume->MERGE
                # in both DV modes and the executor relay, K-scaled rows
                # -> exponent ~1.0 = the path amortizes linearly
                "consume_merge": {
                    "curve": {str(k): consume_curve[k] for k in sks},
                    "exponent": {
                        mode: round(
                            _fit_exponent(
                                sks,
                                [
                                    consume_curve[k][mode]["merge_sec"]
                                    for k in sks
                                ],
                            ),
                            3,
                        )
                        for mode in ("rewrite", "dv")
                    },
                },
                "relay_executor": {
                    "curve": {str(k): relay_curve[k] for k in sks},
                    "exponent": round(
                        _fit_exponent(
                            sks, [relay_curve[k]["sec"] for k in sks]
                        ),
                        3,
                    ),
                },
                "total_sec_at_max_k": round(
                    sum(curve[n][sks[-1]] for n in QUERIES), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

"""SparkSession factory with scale-aware defaults.

Defaults are chosen for correctness-first determinism (UTC session TZ,
ANSI off to match permissive reference coercions) and for scale (AQE on,
skew-join handling on, partial aggregation pushdown). On a real cluster the
same config block applies — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime confs applied to *any* session we touch (driver-owned sessions
# included) — these are settable post-launch and are required for
# deterministic, oracle-comparable results.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # Non-ANSI semantics: wraparound integer arithmetic (hash families in
    # dedup need modular math) and permissive casts — matching the
    # reference's permissive coercion behavior (SURVEY §1.2).
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Coalesce post-shuffle partitions to the advisory byte size rather than
    # stopping at defaultParallelism (the `true` default). With `true`, a
    # 600 KB shuffle still fans out to 32 micro-tasks; with `false` it runs
    # as 1-2 right-sized tasks. Spark's own tuning guide recommends `false`
    # on busy clusters — at 100 TB the advisory size (64 MB) governs either
    # way, so this only removes small-stage scheduling overhead.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path (vectorized transfer).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos timestamp —
    # read as long (ns since epoch) and convert explicitly where needed.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Delta column-mapping id mode matches parquet columns by field id
    # instead of name. Set once here, not per-read: the conf only changes
    # behavior when the REQUESTED schema carries parquet.field.id metadata
    # (only our id-mode reads do), so it is inert for every other scan,
    # and per-read set/restore can't work anyway — the scan is lazy and
    # reads the conf at execution, not plan, time.
    "spark.sql.parquet.fieldId.read.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply deterministic runtime confs to an existing session.

    Safe on sessions we don't own (e.g. the verify driver's): every key in
    RUNTIME_CONFS is a runtime-mutable SQL conf.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-mutable in this deployment; keep going
    return spark


def get_spark(app_name: str = "deimos_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    Local test mode honours $SPARK_GRAFT_CPUS (default all cores). On a
    cluster, master comes from spark-submit and these builder confs are
    inherited unchanged.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Files: keep scan partitions big enough to amortize task overhead
        # locally, small enough to parallelize; at 100 TB the same setting
        # yields ~800k input splits — fine for a 1000-executor cluster.
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)

"""Physical layout utilities: clustered writes skip row groups, compaction
restores file sizes, file stats report layout health."""

from pyspark.sql import functions as F

from deimos_spark.operators import layout


def test_clustered_write_enables_skipping(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    layout.write_clustered(df, path, ["k"], target_rows_per_file=25_000)

    back = spark.read.parquet(path)
    assert back.count() == 100_000
    # range clustering ⇒ a point/range predicate on k touches ONE file:
    # with disjoint [min,max] per file, parquet row-group stats prune the
    # other three (verified via per-file match counts)
    hits = (
        back.filter((F.col("k") >= 10) & (F.col("k") < 20))
        .groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    assert len(hits) == 1
    # the filter is pushed to the scan for stats-based skipping
    plan = (
        back.filter((F.col("k") >= 10) & (F.col("k") < 20))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,10)" in plan


def test_compact_files_restores_target_size(spark, tmp_path):
    path = str(tmp_path / "smallfiles")
    # simulate streaming accretion: 40 tiny files
    spark.range(40_000).select(F.col("id").alias("k")).repartition(40).write.parquet(path)
    assert len([r for r in layout.file_stats(spark, path).collect()]) == 40

    n = layout.compact_files(spark, path, target_rows_per_file=10_000, cluster_cols=["k"])
    assert n == 4
    stats = layout.file_stats(spark, path).collect()
    assert len(stats) == 4
    assert sum(r["rows"] for r in stats) == 40_000
    assert all(r["bytes"] and r["bytes"] > 0 for r in stats)
    # data intact + re-clustered
    back = spark.read.parquet(path)
    assert back.count() == 40_000
    hits = (
        back.filter(F.col("k") < 5_000)
        .groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    assert len(hits) == 1

"""Per-round profile of the connected-components loop at sf0.1 —
compares the r14 shape (eager checkpoint + separate limit(1) probe) with
the r15 shape (lazy checkpoint materialized BY the full-count probe) on
the same edge relation. Diagnostic only; not part of the engine.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# (edges built via deimos_spark.queries._emb below)
from deimos_spark.session import get_spark


def run(edges, variant: str) -> None:
    t_all = time.perf_counter()
    e = edges.select(
        F.col("id_a").cast("long").alias("a"),
        F.col("id_b").cast("long").alias("b"),
    )
    spark = edges.sparkSession
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.perf_counter()
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().repartition(P, "b").localCheckpoint(eager=True)
    print(f"  sym materialize {time.perf_counter() - t0:.3f}")

    t0 = time.perf_counter()
    if variant == "old":
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("comp", F.col("node"))
            .localCheckpoint(eager=True)
        )
    else:
        labels = (
            sym.groupBy(F.col("a").alias("node"))
            .agg(F.min("b").alias("_mb"))
            .select(
                "node", F.least(F.col("node"), F.col("_mb")).alias("comp")
            )
            .localCheckpoint(eager=True)
        )
    print(f"  labels init {time.perf_counter() - t0:.3f}")

    for i in range(25):
        t0 = time.perf_counter()
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(sym["a"].alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        lk = labels.select(
            F.col("node").alias("_jn"), F.col("comp").alias("_jc")
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.col("comp").alias("_c0"),
            F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            ).alias("_c1"),
        )
        new_labels = stepped.join(lk, stepped["_c1"] == lk["_jn"], "left").select(
            "node",
            F.least(F.col("_c1"), F.coalesce("_jc", F.col("_c1"))).alias("comp"),
            (
                F.least(F.col("_c1"), F.coalesce("_jc", F.col("_c1")))
                < F.col("_c0")
            ).alias("_changed"),
        )
        if variant == "old":
            new_labels = new_labels.localCheckpoint(eager=True)
            t1 = time.perf_counter()
            changed = new_labels.filter(F.col("_changed")).limit(1).count()
            t2 = time.perf_counter()
            print(f"  round {i}: ckpt {t1 - t0:.3f} probe {t2 - t1:.3f} "
                  f"changed={changed}")
        else:
            new_labels = new_labels.localCheckpoint(eager=False)
            changed = new_labels.filter(F.col("_changed")).count()
            t2 = time.perf_counter()
            print(f"  round {i}: fused {t2 - t0:.3f} changed={changed}")
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    n = labels.count()
    print(f"  total {time.perf_counter() - t_all:.3f} labels={n}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("cc_profile")
    spark.range(1).collect()
    # same edges t20 uses
    import deimos_spark.queries as q
    from deimos_spark.operators import simsearch

    edges = simsearch.pairwise_cosine_exact_blocked(
        q._emb(spark, sf_dir), threshold=0.4
    )
    edges = edges.localCheckpoint(eager=True)  # isolate CC cost
    print(f"edges = {edges.count()}")
    for variant in ("old", "new", "old", "new"):
        print(f"variant {variant} loadavg {os.getloadavg()[0]:.2f}")
        run(edges, variant)


if __name__ == "__main__":
    main()

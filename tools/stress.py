"""Scale-validation harness: replicate the sf0.1 tables K× (key-shifted,
so cardinalities grow instead of duplicating) into a scratch dir, then run
the headline queries and report per-query wall time.

Usage: python tools/stress.py [K] [scratch_dir]

The point is not absolute speed — local[32] is one machine — but SHAPE:
per-query time should grow ~linearly with K for scans/aggs and stay
near-constant for top-k; anything super-linear is a plan that won't
survive a real 100× scale-up. Run this after adding an operator family.
"""

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
    "t06_minhash_pairs", "x06_funnel",
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/deimos_stress"
    src = "/root/testdata/sf0.1"
    spark = get_spark("deimos_stress")

    if os.path.exists(scratch):
        shutil.rmtree(scratch)
    os.makedirs(scratch)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        keys = KEYS.get(t, [])
        if keys:
            reps = spark.range(k).withColumnRenamed("id", "_r")
            big = df.crossJoin(reps)
            for c in keys:
                big = big.withColumn(c, F.col(c) + F.col("_r") * F.lit(SHIFT))
            big = big.drop("_r")
        else:
            big = df
        big.write.mode("overwrite").parquet(f"{scratch}/{t}.parquet")
    n = spark.read.parquet(f"{scratch}/lineitem.parquet").count()
    print(f"scaled data ready: lineitem rows = {n:,}", file=sys.stderr)

    specs = all_queries()
    for name in QUERIES:  # warm-up (plans + codegen)
        specs[name].builder(spark, scratch).collect()
    timings = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        specs[name].builder(spark, scratch).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"k": k, "lineitem_rows": n, "queries": timings,
                      "total_sec": round(sum(timings.values()), 2)}))


if __name__ == "__main__":
    main()

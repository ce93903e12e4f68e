"""Memory-pressure validation: run the shuffle/sort/window-heaviest ops at
a K-scaled input inside a DELIBERATELY small JVM heap and prove they
SPILL instead of OOM.

Why this exists: every STRESS curve (tools/stress.py) runs with the
default 8 GiB local heap — comfortable enough that Spark's spill machinery
never engages, so "would this op survive an executor whose working set
exceeds memory?" was untested. At 100 TB per-executor memory is ALWAYS
smaller than the per-task working set of a global sort or a wide hash
aggregate; the design answer is Spark's unified memory manager spilling
sorts/aggs/windows to disk. This harness forces that regime locally:
K=30 (≈18M lineitem rows, the STRESS ceiling for the full set) under a
2 GiB heap and 8 threads — 1/4 the memory of the STRESS runs for 8/32 the
threads, i.e. the same per-thread budget but a working set that exceeds
the unified pool for the heavy ops, so completion REQUIRES spill.

Evidence captured per op (from the Spark status REST API, UI enabled for
this tool only): wall seconds, memory/disk bytes spilled, peak execution
memory. The claim the artifact backs: `all_completed: true` with nonzero
spill on the heavy ops = the plans degrade to disk, not to OOM.

Usage: python tools/lowmem_stress.py [K] [heap] [scratch_dir]
       (defaults: 30 2g /tmp/deimos_lowmem)
Emits one JSON document (commit as LOWMEM.json).

NOTE: must run as its OWN process — driver memory binds at JVM launch.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The subset is chosen for per-task working-set pressure, not coverage:
# wide hash aggs (b11/h01), a giant agg+join (h18), fact x fact semi
# (h21), keep-last + sessionize windows (b20/x13), a global sort
# (b16), segment-dedup joins (t26), running windows (b19), banded
# minhash (t06).
OPS = [
    "b11_agg_hash",
    "b20_keep_last_per_key",
    "h01_pricing_summary",
    "h18_large_volume_customers",
    "h21_waiting_supplier",
    "x13_sessionize",
    "t26_substr_dedup",
    "b16_sort_topk",
    "b19_window_running",
    "t06_minhash_pairs",
]


def _rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _spill_totals(spark) -> tuple[int, int, int]:
    """(memoryBytesSpilled, diskBytesSpilled, peakExecutionMemory) summed
    over all completed stages so far."""
    mem = disk = peak = 0
    for st in _rest(spark, "stages?status=complete"):
        mem += st.get("memoryBytesSpilled", 0) or 0
        disk += st.get("diskBytesSpilled", 0) or 0
        peak = max(peak, st.get("peakExecutionMemory", 0) or 0)
    return mem, disk, peak


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    heap = sys.argv[2] if len(sys.argv) > 2 else "2g"
    scratch = sys.argv[3] if len(sys.argv) > 3 else "/tmp/deimos_lowmem"

    # heap binds at JVM launch: claim it via the env get_spark honors,
    # BEFORE any SparkSession exists in this process
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
    os.environ["SPARK_GRAFT_CPUS"] = "8"

    from pyspark.sql import SparkSession

    from deimos_spark.queries import all_queries, clear_plan_cache
    from deimos_spark.session import apply_runtime_confs
    from tools.stress import _build_scaled

    spark = (
        SparkSession.builder.appName("deimos_lowmem")
        .master("local[8]")
        .config("spark.driver.memory", heap)
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "true")  # the spill evidence source
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .getOrCreate()
    )
    apply_runtime_confs(spark)

    data_dir = os.path.join(scratch, f"k{k}")
    if not os.path.exists(os.path.join(data_dir, "lineitem.parquet")):
        rows = _build_scaled(spark, "/root/testdata/sf0.1", data_dir, k)
    else:
        rows = spark.read.parquet(f"{data_dir}/lineitem.parquet").count()

    specs = all_queries()
    results: dict[str, dict] = {}
    all_ok = True
    for name in OPS:
        clear_plan_cache()
        m0, d0, _ = _spill_totals(spark)
        t0 = time.perf_counter()
        try:
            specs[name].builder(spark, data_dir).collect()
            sec = round(time.perf_counter() - t0, 2)
            m1, d1, peak = _spill_totals(spark)
            results[name] = {
                "sec": sec,
                "mem_spill_mb": round((m1 - m0) / 1e6, 1),
                "disk_spill_mb": round((d1 - d0) / 1e6, 1),
                "peak_exec_mem_mb": round(peak / 1e6, 1),
                "ok": True,
            }
        except Exception as e:  # OOM or task failure = the finding
            all_ok = False
            results[name] = {
                "sec": round(time.perf_counter() - t0, 2),
                "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }
        print(f"  {name}: {results[name]}", file=sys.stderr)

    out = {
        "k": k,
        "lineitem_rows": rows,
        "heap": heap,
        "threads": 8,
        "shuffle_partitions": 64,
        "all_completed": all_ok,
        "total_disk_spill_mb": round(
            sum(r.get("disk_spill_mb", 0) for r in results.values()), 1
        ),
        "ops": results,
    }
    print(json.dumps(out))
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

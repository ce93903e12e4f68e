"""A/B harness for t20_dup_clusters at sf0.1: times the query warm
(median of 3 fresh-lineage runs, same protocol as bench.py) plus one
cold run, solo, printing per-run seconds. Usage:
    python tools/t20_ab.py [sf_dir] [n_warm]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deimos_spark.queries import all_queries, clear_plan_cache
from deimos_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["t20_dup_clusters", "t28_dedup_apply"])
    spark = get_spark("t20_ab")
    spark.range(1).collect()
    specs = all_queries()
    print(f"loadavg {os.getloadavg()}")
    for name in names:
        spec = specs[name]
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).collect()
        print(f"{name} cold {time.perf_counter() - t0:.3f}")
        runs = []
        for i in range(n_warm):
            clear_plan_cache()
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
            print(f"{name} warm[{i}] {runs[-1]:.3f}")
        runs.sort()
        print(f"{name} median {runs[len(runs) // 2]:.3f}")
    print(f"loadavg after {os.getloadavg()}")


if __name__ == "__main__":
    main()

"""Local pre-verification harness: runs every declared query through Spark
AND its DuckDB oracle, compares row-count / schema / order-insensitive
values — approximating the driver's CORRECTNESS check so mismatches are
caught before a round ends.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deimos_spark.catalog import TABLES
from deimos_spark.queries import all_queries
from deimos_spark.session import get_spark


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def run_check(sf_dir: str, only=None, spark=None, quiet=False) -> list[str]:
    """Run every declared query (or `only`) through Spark AND its DuckDB
    oracle at `sf_dir`; return the list of failing query names. Importable
    so the test suite can gate the FULL registry every run (the driver's
    CORRECTNESS window covers a fixed 50-query subset)."""
    only = set(only or ())

    def _say(msg):
        if not quiet:
            print(msg)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    if spark is None:
        spark = get_spark("check_oracle")
    specs = all_queries()
    failures = []
    for name, spec in specs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            _say(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            _say(f"ok*   {name}: rows={len(srows)} (no oracle) "
                 f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            _say(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        elif len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        else:
            ns, no = _norm_rows(scols, srows), _norm_rows(ocols, orows)
            if ns != no:
                diff = [(a, b) for a, b in zip(ns, no) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            _say(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            _say(f"ok    {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")

    _say(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    return 1 if run_check(sf_dir, only=sys.argv[2:]) else 0


if __name__ == "__main__":
    raise SystemExit(main())

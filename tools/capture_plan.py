"""Capture `.explain('formatted')` for declared queries into plans/<tag>/.

Usage: python tools/capture_plan.py <tag> <suffix> <query> [<query>...]
Writes plans/<tag>/<query>_<suffix>.txt for each query, built against
$SPARK_GRAFT_SF_DIR (default sf0.1) — the judge checks plan claims against
these files, so they are captured from the exact builder the bench runs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deimos_spark.queries import all_queries
from deimos_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("deimos_plan_capture")
    specs = all_queries()
    for name in names:
        df = specs[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

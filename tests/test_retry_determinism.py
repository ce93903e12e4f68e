"""Task-retry determinism: a retried task re-runs our Arrow kernels
(bloom partial bitmaps chained in the same stage as the failing
kernel), and the pipeline's final answer must be identical to an
uninjected run.

Why a subprocess: the shared test session is local[N] with
maxFailures=1 — any task failure kills the job. Retries need
master local[4,2], which binds at JVM launch.

What this pins that the oracle can't: the oracle compares engines on
healthy runs; at 100 TB tasks FAIL routinely (preemption, OOM-kill,
disk) and Spark's model assumes re-executed tasks reproduce their
output. Our kernels are all pure functions of their input partitions
(seeded hashes, no wall clock, no RNG) — this test is the executable
form of that claim for the t30 bloom path + a shuffle agg on top.
"""

import json
import os
import subprocess
import sys

SCRIPT = r"""
import json, os, sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

marker = sys.argv[1]
spark = (
    SparkSession.builder.master("local[4,2]")
    .appName("retry_determinism")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from deimos_spark.operators import bloomdedup


def make_docs(inject):
    def kernel(batches):
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if (
            inject
            and ctx is not None
            and ctx.partitionId() == 3
            and ctx.attemptNumber() == 0
        ):
            # prove the injection fired (idempotent marker write)
            with open(marker, "w") as fh:
                fh.write("fired")
            raise RuntimeError("injected first-attempt failure")
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    # ids >= 1800: novel contents, so the increment has
                    # both dup and definitely-new rows to decide on
                    "text": [
                        f"body {int(i) % 37}"
                        if int(i) < 1800
                        else f"uniq {int(i)}"
                        for i in ids
                    ],
                }
            )

    return (
        spark.range(0, 2000, 1, 8)
        .mapInPandas(kernel, "doc_id long, text string")
    )


def pipeline(docs):
    corpus = docs.filter("doc_id < 1500")
    inc = docs.filter("doc_id >= 1500")
    new = bloomdedup.incremental_new_docs(corpus, inc)
    ids = sorted(r.doc_id for r in new.select("doc_id").collect())
    agg = sorted(
        (r.text, r.c)
        for r in docs.groupBy("text")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    return {"new_ids": ids, "agg": agg}


ref = pipeline(make_docs(inject=False))
got = pipeline(make_docs(inject=True))
print("RESULT:" + json.dumps({
    "equal": ref == got,
    "fired": os.path.exists(marker),
    "n_new": len(ref["new_ids"]),
}))
spark.stop()
"""


def test_injected_task_failure_does_not_change_results(tmp_path):
    marker = str(tmp_path / "fired")
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, marker],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    lines = [
        line for line in out.stdout.splitlines() if line.startswith("RESULT:")
    ]
    assert lines, out.stdout[-2000:] + out.stderr[-2000:]
    res = json.loads(lines[0][len("RESULT:"):])
    assert res["fired"], "injection never fired — the test proved nothing"
    assert res["equal"], res
    assert res["n_new"] > 0


# ---------------------------------------------------------------------------
# VERDICT r12 #3 — retry-determinism breadth: the same injected-failure
# harness across one representative of each nondeterminism-prone family:
# a Window op (x14 state_history), an iterative op (t20 connected
# components), and an applyInPandas op (t27 semdedup). Each run proves
# the injection fired AND the final answer equals the uninjected run's.

FAMILY_SCRIPT = r"""
import json, os, sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

marker, op = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[4,2]")
    .appName("retry_determinism_families")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def source(inject, schema, rowfn):
    # deterministic per-ROW content (pure function of id — no clock, no
    # RNG), with a first-attempt failure injected into partition 3
    def kernel(batches):
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if (
            inject
            and ctx is not None
            and ctx.partitionId() == 3
            and ctx.attemptNumber() == 0
        ):
            with open(marker, "w") as fh:
                fh.write("fired")
            raise RuntimeError("injected first-attempt failure")
        for pdf in batches:
            yield pd.DataFrame(rowfn(pdf["id"]))

    return spark.range(0, 1600, 1, 8).mapInPandas(kernel, schema)


def run(inject):
    if op == "x14_window":
        from deimos_spark.operators.timeseries import state_history

        def rows(ids):
            return {
                "user_id": [int(i) % 40 for i in ids],
                "event_id": [int(i) for i in ids],
                # deliberate ts TIES inside a key: the order_cols
                # tiebreak is what keeps retries deterministic
                "ts": [int(i) // 80 for i in ids],
                "state": [f"s{(int(i) * 7) % 3}" for i in ids],
            }

        df = source(
            inject,
            "user_id long, event_id long, ts long, state string",
            rows,
        )
        out = state_history(
            df, "user_id", "ts", "state", order_cols=("event_id",)
        )
        return sorted(map(tuple, out.collect()))
    if op == "t20_cc":
        from deimos_spark.operators.graph import connected_components

        def rows(ids):
            return {
                "id_a": [int(i) for i in ids],
                # zipf-ish hub structure + chains
                "id_b": [
                    (int(i) // 7) if int(i) % 3 else 1 for i in ids
                ],
            }

        df = source(inject, "id_a long, id_b long", rows)
        out = connected_components(df)
        return sorted(map(tuple, out.collect()))
    if op == "t27_applyinpandas":
        from deimos_spark.operators.semdedup import semdedup_summary

        def rows(ids):
            return {
                "vec_id": [int(i) for i in ids],
                "embedding": [
                    [
                        float(((int(i) * (j + 3)) % 97) - 48) / 48.0
                        for j in range(16)
                    ]
                    for i in ids
                ],
            }

        df = source(inject, "vec_id long, embedding array<double>", rows)
        out = semdedup_summary(df, n_clusters=8, threshold=0.4)
        return sorted(map(tuple, out.collect()))
    raise SystemExit(f"unknown op {op}")


ref = run(inject=False)
got = run(inject=True)
print("RESULT:" + json.dumps({
    "equal": ref == got,
    "fired": os.path.exists(marker),
    "n": len(ref),
}))
spark.stop()
"""

import pytest


@pytest.mark.parametrize(
    "op", ["x14_window", "t20_cc", "t27_applyinpandas"]
)
def test_injected_failure_per_family(tmp_path, op):
    marker = str(tmp_path / f"fired_{op}")
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    out = subprocess.run(
        [sys.executable, "-c", FAMILY_SCRIPT, marker, op],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    lines = [
        line for line in out.stdout.splitlines() if line.startswith("RESULT:")
    ]
    assert lines, out.stdout[-2000:] + out.stderr[-2000:]
    res = json.loads(lines[0][len("RESULT:"):])
    assert res["fired"], f"{op}: injection never fired — proved nothing"
    assert res["equal"], (op, res)
    assert res["n"] > 0

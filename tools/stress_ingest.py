"""STRESS_INGEST.json generator (VERDICT r12 #5): streaming dedup-ingest
per-batch wall time vs K-scaled corpus, zipf content. Run ALONE
(timings): `python tools/stress_ingest.py [K1,K2,...]`.

See stress._dedup_ingest_bench: per-batch time ~flat as the corpus grows
is exactly t30's zero-corpus-shuffle claim under streaming conditions.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress import _between_rounds, _dedup_ingest_bench, _fit_exponent  # noqa: E402

from deimos_spark.session import get_spark  # noqa: E402


def main() -> None:
    ks = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1, 10, 30]
    )
    spark = get_spark("deimos_stress_ingest")
    load0 = os.getloadavg()
    curve = {}
    for k in ks:
        curve[k] = _dedup_ingest_bench(spark, "/tmp/ds_ingest", k)
        print(f"K={k}: {curve[k]}", file=sys.stderr)
        _between_rounds(spark)
    exp = _fit_exponent(ks, [curve[k]["per_batch_sec"] for k in ks])
    out = {
        "generator": "tools/stress_ingest.py (VERDICT r12 #5)",
        "ks": ks,
        "curve": {str(k): curve[k] for k in ks},
        "per_batch_exponent": round(exp, 3),
        "superlinear": (
            ["dedup_ingest_per_batch"]
            if exp > 1.25 and curve[ks[-1]]["per_batch_sec"] > 0.3
            else []
        ),
        "loadavg_before": [round(x, 2) for x in load0],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

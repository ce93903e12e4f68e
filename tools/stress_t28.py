"""STRESS_T28.json generator (VERDICT r12 #2): the uncapped t28 shape —
metric-ball-blocked EXACT cosine pairs + CC/keep — K-scaled on a topical
corpus. Run ALONE (timings): `python tools/stress_t28.py [K1,K2,...]`.

See stress._t28_blocked_bench for the corpus design and why a
subquadratic `exponent` here is the evidence the r12 verdict asked for
(the capped BNLJ relation was removed from the curve at >40min/K=10).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress import _between_rounds, _fit_exponent, _t28_blocked_bench  # noqa: E402

from deimos_spark.session import get_spark  # noqa: E402


def main() -> None:
    ks = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1, 10, 30]
    )
    spark = get_spark("deimos_stress_t28")
    # Warm-JVM regime (VERDICT r13 #4): the r13 K=1 point carried
    # fresh-JVM warm-up (codegen compile, Arrow/python-worker spin-up,
    # parquet reader init), which biased the full-curve fit LOW and the
    # K=1 constant HIGH. One throwaway mini-run of the same operator
    # pays all of that before anything is timed.
    _t28_blocked_bench(spark, "/tmp/ds_t28_warm", 1)
    _between_rounds(spark)
    load0 = os.getloadavg()
    curve = {}
    from head2head import _cpu_probe  # noqa: E402

    for k in ks:
        # per-K contention fingerprints (r15): this host's noisy
        # neighbor runs multi-minute episodes that can hit one K point
        # and not the others (two same-HEAD sweeps differed 1.8x on
        # K=30 alone) — the probe + loadavg pair makes a polluted point
        # auditable in-artifact instead of reading as a regression.
        probe = _cpu_probe()
        la = os.getloadavg()
        curve[k] = _t28_blocked_bench(spark, "/tmp/ds_t28", k)
        curve[k]["cpu_probe_sec"] = probe
        curve[k]["loadavg_before"] = [round(v, 2) for v in la]
        print(f"K={k}: {curve[k]}", file=sys.stderr)
        _between_rounds(spark)
    exp = _fit_exponent(ks, [curve[k]["sec"] for k in ks])
    out = {
        "generator": "tools/stress_t28.py (t28 uncapped, VERDICT r12 #2)",
        "ks": ks,
        "curve": {str(k): curve[k] for k in ks},
        "exponent": round(exp, 3),
        "pair_exponent": round(
            _fit_exponent(ks, [curve[k]["pair_sec"] for k in ks]), 3
        ),
        "superlinear": (
            ["t28_blocked"]
            if exp > 1.25 and curve[ks[-1]]["sec"] > 0.3
            else []
        ),
        "loadavg_before": [round(x, 2) for x in load0],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""CI gate for the driver's blind spot: the per-round CORRECTNESS file
checks a fixed ~50-query window, so the rest of the registry could
silently regress between rounds. This test runs EVERY declared query
against its DuckDB oracle at sf0.001 (rows-only for the no-oracle,
approximate-by-design entries) and fails on any mismatch.
"""

import os

import pytest

from tools.check_oracle import run_check

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_full_query_registry_matches_oracle(spark):
    failures = run_check(SF_DIR, spark=spark, quiet=True)
    assert not failures, (
        f"{len(failures)} registry queries diverged from their DuckDB "
        f"oracle at {SF_DIR}: {failures}"
    )

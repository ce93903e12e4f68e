"""Smoke + invariant tests for the TPC-H-derived suite (operators/tpch.py).

Full value-level verification is the DuckDB oracle harness
(tools/check_oracle.py, driver CORRECTNESS gate); these tests pin cheap
invariants at sf0.001 so a plan regression fails fast in pytest.
"""

from __future__ import annotations

import pytest

from deimos_spark.operators import tpch

SF = "/root/testdata/sf0.001"

ALL = [
    tpch.h01_pricing_summary,
    tpch.h03_shipping_priority,
    tpch.h04_order_priority,
    tpch.h05_local_supplier_volume,
    tpch.h06_forecast_revenue,
    tpch.h07_volume_shipping,
    tpch.h08_market_share,
    tpch.h09_product_profit,
    tpch.h10_returned_items,
    tpch.h12_late_shipments,
    tpch.h13_customer_distribution,
    tpch.h14_promo_share,
    tpch.h15_top_supplier,
    tpch.h16_supplier_part_counts,
    tpch.h17_small_quantity_revenue,
    tpch.h18_large_volume_customers,
    tpch.h19_discounted_revenue,
    tpch.h20_potential_promotion,
    tpch.h21_waiting_supplier,
    tpch.h22_global_sales_opportunity,
]


@pytest.mark.parametrize("builder", ALL, ids=lambda b: b.__name__)
def test_builds_and_runs(spark, builder):
    rows = builder(spark, SF).collect()
    assert rows is not None  # plan executes end-to-end


def test_h01_shape(spark):
    rows = builder_rows = tpch.h01_pricing_summary(spark, SF).collect()
    assert 1 <= len(rows) <= 6  # at most |returnflag| × |linestatus|
    flags = [(r.l_returnflag, r.l_linestatus) for r in rows]
    assert flags == sorted(flags)  # total order
    for r in rows:
        assert r.count_order > 0
        assert r.sum_disc_price <= r.sum_base_price  # discount only shrinks


def test_h13_includes_zero_order_customers(spark):
    rows = tpch.h13_customer_distribution(spark, SF).collect()
    total = sum(r.custdist for r in rows)
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert total == n_cust  # left join keeps every customer exactly once


def test_h21_sole_late_semantics(spark):
    rows = tpch.h21_waiting_supplier(spark, SF).collect()
    assert all(r.numwait >= 1 for r in rows)
    names = [r.s_name for r in rows]
    assert len(names) == len(set(names))

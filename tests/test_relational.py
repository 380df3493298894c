"""Crafted-input and plan-shape tests for the relational OLAP queries."""

from __future__ import annotations

from datetime import datetime

from flink_clickstream_processor_msk_spark.operators import relational


def _lineitem(spark, rows):
    """rows: (orderkey, qty, extprice, disc, tax, flag, status, shipdate)."""
    return spark.createDataFrame(
        [
            (ok, ok, ok, 1, float(q), float(ep), float(d), float(t), f, s,
             datetime.fromisoformat(sd))
            for ok, q, ep, d, t, f, s, sd in rows
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )


def test_pricing_summary_integer_cents_exactness(spark):
    """0.04/0.1 are not exact doubles; the cents pipeline must still give
    the exact decimal answer: 100.10 * (1-0.04) * (1+0.10) = 105.7056."""
    li = _lineitem(
        spark,
        [
            (1, 17, 100.10, 0.04, 0.10, "A", "F", "1996-01-01"),
            (2, 3, 50.05, 0.00, 0.00, "A", "F", "1996-01-02"),
            (3, 1, 10.00, 0.10, 0.05, "R", "O", "1999-01-01"),  # after cutoff
        ],
    )
    out = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in relational.pricing_summary(li).collect()
    }
    assert set(out) == {("A", "F")}
    r = out[("A", "F")]
    assert r["count_order"] == 2
    assert r["sum_qty"] == 20.0
    assert r["sum_base_price"] == 150.15
    # exact decimal arithmetic via integer cents: 100.10*0.96 = 96.0960
    # and 50.05*1.00, summed as integers then rescaled once
    assert r["sum_disc_price"] == (10010 * 96 + 5005 * 100) / 1e4
    assert r["sum_charge"] == (10010 * 96 * 110 + 5005 * 100 * 100) / 1e6
    assert r["avg_disc"] == (0.04 + 0.0) / 2


def test_q5_plan_has_no_cartesian_and_broadcasts_dimensions(spark):
    """The snowflake join must never degenerate to a cartesian product,
    and the dimension sides should broadcast at fixture scale."""
    from conftest import SF_SMOKE

    dfs = [
        spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        for t in ("region", "nation", "supplier", "customer", "orders", "lineitem")
    ]
    q = relational.regional_supplier_volume(*dfs)
    q.collect()  # materialize so AQE finalizes the plan
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan

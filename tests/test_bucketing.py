"""Bucketed co-located joins — the shuffle-elimination path for the
repeated big-fact joins (orders ⋈ lineitem on the order key) at 100 TB.

At cluster scale the fact tables are written ONCE bucketed by their join
key; every later join/aggregation on that key then reads co-located
buckets and skips the exchange entirely — the written-artifact analog of
the ANN indexes and the near-dup pairs table (amortize the expensive
reorganization across many consumers). These tests pin the contract on
the actual engine: a bucketed-both-sides join plans with ZERO shuffle
exchanges, and produces the same rows as the shuffled join.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE


@pytest.fixture()
def bucketed_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE bucktest LOCATION '{tmp_path}/wh'")
    yield "bucktest"
    spark.sql("DROP DATABASE bucktest CASCADE")


def test_bucketed_fact_join_eliminates_shuffle(spark, bucketed_db):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{bucketed_db}.orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{bucketed_db}.lineitem_b")
    )

    ob = spark.table(f"{bucketed_db}.orders_b")
    lb = spark.table(f"{bucketed_db}.lineitem_b")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
        "o_orderkey", "l_linenumber", "l_quantity"
    )

    # forbid the broadcast fallback so the assertion is about bucketing,
    # not about one side being small at fixture scale
    thresh = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(thresh)
    spark.conf.set(thresh, "-1")
    try:
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: a sort-merge join with NO shuffle exchange
        # anywhere in the plan (broadcast exchange is disabled above)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan

        # identical rows to the shuffled plan over the raw parquet
        orders_raw = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        li_raw = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        want = (
            orders_raw.join(li_raw, orders_raw.o_orderkey == li_raw.l_orderkey)
            .select("o_orderkey", "l_linenumber", "l_quantity")
            .collect()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want))
    finally:
        spark.conf.set(thresh, old)


def test_bucketed_aggregation_reuses_partitioning(spark, bucketed_db):
    """A groupBy on the bucket key over a bucketed table also skips the
    exchange — the bucketing is a reusable physical property, not a
    join-only trick."""
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{bucketed_db}.lineitem_agg_b")
    )
    agg = (
        spark.table(f"{bucketed_db}.lineitem_agg_b")
        .groupBy("l_orderkey")
        .count()
    )
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

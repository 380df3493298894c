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


def test_pricing_summary_decimal_matches_cents_path(spark):
    """The DECIMAL(38)-aggregate twin must agree with the integer-cents
    path on real data: exact-sum measures equal to the cent, AVG measures
    within one decimal-division rounding ulp. Run on the fixture lineitem
    (60k-ish rows at smoke scale) so shuffle-order independence is
    exercised, not just a single-partition toy."""
    from decimal import Decimal

    from conftest import SF_SMOKE

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    cents = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in relational.pricing_summary(li).collect()
    }
    dec = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in relational.pricing_summary_decimal(li).collect()
    }
    assert set(cents) == set(dec) and len(cents) > 0
    for key, c in cents.items():
        d = dec[key]
        assert c["count_order"] == d["count_order"]
        # exact decimal sums: both paths are order-free exact arithmetic,
        # so rounding each to cents must agree EXACTLY
        for col in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
            assert round(Decimal(str(c[col])), 2) == round(Decimal(d[col]), 2), (
                key,
                col,
                c[col],
                d[col],
            )
        # decimal AVG divides under HALF_UP at a fixed scale; the cents
        # path divides in binary double — equal to within one ulp of the
        # decimal result's scale
        for col in ("avg_qty", "avg_price", "avg_disc"):
            assert abs(float(d[col]) - c[col]) <= 10 ** -min(
                4, -Decimal(d[col]).as_tuple().exponent
            ), (key, col, c[col], d[col])
    # the sum columns really are decimal types (the point of the twin)
    types = dict(relational.pricing_summary_decimal(li).dtypes)
    assert types["sum_charge"].startswith("decimal")
    assert types["sum_disc_price"].startswith("decimal")


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


def test_pricing_rollup_subtotals_and_grand_total(spark):
    """ROLLUP emits leaf rows (gid 0), per-returnflag subtotals (gid 1,
    linestatus NULL), and one grand total (gid 3) whose measures equal the
    leaf sums; one scan + Expand, never one scan per grouping set."""
    li = _lineitem(
        spark,
        [
            (1, 10, 100.00, 0.00, 0.00, "A", "F", "1996-01-01"),
            (2, 5, 50.00, 0.00, 0.00, "A", "O", "1996-01-02"),
            (3, 1, 10.00, 0.00, 0.00, "R", "F", "1996-01-03"),
        ],
    )
    rows = relational.pricing_rollup(li).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert len(by_gid[0]) == 3 and len(by_gid[1]) == 2 and len(by_gid[3]) == 1
    grand = by_gid[3][0]
    assert grand["l_returnflag"] is None and grand["l_linestatus"] is None
    assert grand["count_order"] == 3 and grand["sum_qty"] == 16.0
    sub_a = next(r for r in by_gid[1] if r["l_returnflag"] == "A")
    assert sub_a["count_order"] == 2 and sub_a["sum_qty"] == 15.0
    plan = relational.pricing_rollup(li)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan


def test_pricing_cube_full_lattice(spark):
    """CUBE emits all four grouping sets — leaves (gid 0), per-returnflag
    (gid 1), per-LINESTATUS (gid 2, the set rollup lacks), grand total
    (gid 3) — with measures that re-sum consistently; still one scan +
    Expand, never one scan per set."""
    li = _lineitem(
        spark,
        [
            (1, 10, 100.00, 0.00, 0.00, "A", "F", "1996-01-01"),
            (2, 5, 50.00, 0.00, 0.00, "A", "O", "1996-01-02"),
            (3, 1, 10.00, 0.00, 0.00, "R", "F", "1996-01-03"),
        ],
    )
    rows = relational.pricing_cube(li).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert (
        len(by_gid[0]) == 3
        and len(by_gid[1]) == 2
        and len(by_gid[2]) == 2
        and len(by_gid[3]) == 1
    )
    sub_f = next(r for r in by_gid[2] if r["l_linestatus"] == "F")
    assert sub_f["l_returnflag"] is None
    assert sub_f["count_order"] == 2 and sub_f["sum_qty"] == 11.0
    grand = by_gid[3][0]
    assert grand["count_order"] == 3 and grand["sum_qty"] == 16.0
    # each grouping-set level re-sums to the same totals
    for gid in (0, 1, 2):
        assert sum(r["count_order"] for r in by_gid[gid]) == 3
    plan = relational.pricing_cube(li)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert plan.count("Scan ExistingRDD") <= 1


def test_cube_equals_explicit_grouping_sets(spark):
    """The docstring claim made checkable: Spark's `cube` IS
    `GROUPING SETS ((a,b),(a),(b),())` — the explicit-syntax form over
    the same input produces identical rows (incl. the grouping-id
    bitmask), so no separate explicit-sets operator is needed."""
    li = _lineitem(
        spark,
        [
            (1, 10, 100.00, 0.00, 0.00, "A", "F", "1996-01-01"),
            (2, 5, 50.00, 0.00, 0.00, "A", "O", "1996-01-02"),
            (3, 1, 10.00, 0.00, 0.00, "R", "F", "1996-01-03"),
        ],
    )
    li.createOrReplaceTempView("li_gs")
    explicit = spark.sql(
        """
        SELECT CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               l_returnflag, l_linestatus,
               SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
               COUNT(*) AS count_order
        FROM li_gs
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
          GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                         (l_linestatus), ())
        ORDER BY gid, l_returnflag, l_linestatus
        """
    ).collect()
    via_cube = relational.pricing_cube(li).select(
        "gid", "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    ).collect()
    assert [tuple(r) for r in explicit] == [tuple(r) for r in via_cube]


def test_no_return_customers_semi_anti_semantics(spark):
    """cust 1: orders, no returns -> counted. cust 2: order with an 'R'
    item -> excluded. cust 3: no orders at all -> excluded."""
    customer = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "B"), (2, "c2", 0, 0.0, "B"), (3, "c3", 1, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1), (20, 2)], "o_orderkey long, o_custkey long"
    )
    li = _lineitem(spark, [(20, 1, 10.00, 0.0, 0.0, "R", "F", "1996-01-01")])
    nation = spark.createDataFrame(
        [(0, "NA", 0), (1, "NB", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    out = relational.no_return_customers(customer, orders, li, nation).collect()
    assert [(r["n_name"], r["n_customers"]) for r in out] == [("NA", 1)]
    plan = relational.no_return_customers(
        customer, orders, li, nation
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_nation_trade_roles_set_algebra(spark):
    """Nation 0: customers + rich supplier -> both. Nation 1: customers
    only. Nation 2: rich supplier only. Poor suppliers don't count; the
    three sets are distinct (set semantics despite duplicate input rows)."""
    customer = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "B"), (2, "c2", 0, 0.0, "B"), (3, "c3", 1, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    supplier = spark.createDataFrame(
        [(1, "s1", 0, 9000.0), (2, "s2", 2, 9000.0), (3, "s3", 1, 10.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "NA", 0), (1, "NB", 0), (2, "NC", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    out = {
        (r["n_name"], r["role"])
        for r in relational.nation_trade_roles(customer, supplier, nation).collect()
    }
    assert out == {("NA", "both"), ("NB", "customer_only"), ("NC", "supplier_only")}


def test_scan_pushdown_and_column_pruning_guards(spark):
    """Regression guards for the two scan properties PLANS.md claims
    everywhere: the Q1 cutoff predicate reaches the parquet scan
    (PushedFilters) and the scan reads only the referenced columns
    (ReadSchema — 6 of lineitem's 11)."""
    from conftest import SF_SMOKE

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    q = relational.pricing_summary(li)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection list on the FileScan line (ReadSchema is printer-truncated)
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    read_cols = scan.split("FileScan parquet [")[1].split("]")[0]
    for c in ("l_returnflag", "l_linestatus", "l_quantity",
              "l_extendedprice", "l_discount", "l_tax", "l_shipdate"):
        assert c in read_cols
    for c in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert c not in read_cols  # pruned

"""Relational OLAP over the warehouse fixture tables (TPC-H-shaped).

The reference engine is clickstream-only; these queries exercise the same
Spark engine on the classic star-schema workload the fixture tables
(customer/orders/lineitem) model — scan-heavy grouped aggregation (Q1
pricing summary) and a selective 3-way star join with top-k (Q3 shipping
priority). Shapes follow TPC-H Q1/Q3 (public spec); constants are chosen
for the synthetic fixture's date range.

Cross-engine exactness: the money/quantity columns are 2-decimal values
stored as doubles, and a grouped SUM of doubles is summation-ORDER-
dependent — Spark's shuffle-order partial sums and DuckDB's sequential
fold would drift in the last ulps and break the value-hash gate. So all
aggregation here runs in integer cents (round(x*100) — the doubles sit
within 1e-10 of 2-decimal values, so both engines' round() agree):
BIGINT sums are exact and order-free, and the final re-scaling divisions
are correctly rounded one-step IEEE ops. Extended terms stay integral too
(price·(100-disc) in cent·percent units, ·(100+tax) in cent·percent²),
bounded ~6e16 at sf0.1 — far inside int64; a production engine would use
DECIMAL(38) aggregates, which Spark also supports, at the cost of
engine-specific decimal type-promotion rules this repo's oracle gate
cannot absorb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary over
    lineitems shipped on/before ``cutoff``.

    Scale shape: filter in the scan, one map-side-combined groupBy over a
    handful of groups — the canonical scan-bound aggregate; at 100 TB the
    shuffle carries (groups × partitions) rows."""
    qty_c = _cents("l_quantity")
    ep_c = _cents("l_extendedprice")
    disc_pct = _cents("l_discount")
    tax_pct = _cents("l_tax")
    disc_price_u = ep_c * (F.lit(100) - disc_pct)  # cent·percent
    charge_u = disc_price_u * (F.lit(100) + tax_pct)  # cent·percent²
    g = (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("qc"),
            F.sum(ep_c).alias("bc"),
            F.sum(disc_price_u).alias("dc"),
            F.sum(charge_u).alias("cc"),
            F.sum(disc_pct).alias("sdisc"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("qc") / 100.0).alias("sum_qty"),
        (F.col("bc") / 100.0).alias("sum_base_price"),
        (F.col("dc") / 10000.0).alias("sum_disc_price"),
        (F.col("cc") / 1000000.0).alias("sum_charge"),
        ((F.col("qc") / 100.0) / F.col("n")).alias("avg_qty"),
        ((F.col("bc") / 100.0) / F.col("n")).alias("avg_price"),
        ((F.col("sdisc") / 100.0) / F.col("n")).alias("avg_disc"),
        F.col("n").alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k unshipped-revenue orders for one market
    segment — customer ⋈ orders ⋈ lineitem with selective date filters on
    both fact sides, grouped revenue, deterministic top-k (revenue desc,
    orderkey asc).

    Scale shape: filters push into all three scans; the filtered customer
    side is small → AQE broadcasts it into the orders join; the
    orders⋈lineitem join shuffles on the order key with map-side partial
    aggregation after; TakeOrdered returns k rows, no global sort."""
    ep_c = _cents("l_extendedprice")
    disc_pct = _cents("l_discount")
    disc_price_u = ep_c * (F.lit(100) - disc_pct)
    d = F.lit(date).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < d).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    items = lineitem.filter(F.col("l_shipdate") > d).select(
        "l_orderkey", disc_price_u.alias("rev_u")
    )
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey)
        .join(items, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_u").alias("rev_u"))
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            (F.col("rev_u") / 10000.0).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


def regional_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from local-supplier orders — the
    full 6-table snowflake join (region→nation→{supplier, customer} →
    orders→lineitem, with the Q5 locality condition that the supplier and
    the customer share a nation), one order-date year, revenue
    sum(extprice·(1-disc)) per nation, revenue desc (n_name asc ties).

    Scale shape: facts join facts first — customer⋈orders on custkey,
    ⋈lineitem on orderkey (the one big shuffle edge), then the supplier
    dimension with the LOCALITY predicate applied AT that join
    (l_suppkey = s_suppkey AND c_nationkey = s_nationkey, the Q5
    condition as a join predicate, not a pre-join of two dimensions —
    joining supplier×customer on nationkey first would build a per-nation
    near-cartesian intermediate), then the filtered region→nation chain.
    The three dimension sides broadcast under AQE. Integer-cents revenue
    as everywhere in this module."""
    ep_c = _cents("l_extendedprice")
    disc_pct = _cents("l_discount")
    rev_u = ep_c * (F.lit(100) - disc_pct)
    dfrom = F.lit(date_from).cast("timestamp")
    dto = F.lit(date_to).cast("timestamp")
    nations = (
        region.filter(F.col("r_name") == region_name)
        .join(nation, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        customer.select("c_custkey", "c_nationkey")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= dfrom) & (F.col("o_orderdate") < dto)
            ).select("o_orderkey", "o_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            lineitem.select("l_orderkey", "l_suppkey", rev_u.alias("rev_u")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nations, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("rev_u").alias("rev_u"))
        .select("n_name", (F.col("rev_u") / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def type_share_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    p_type: str = "ECONOMY",
    date_from: str = "1996-03-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q14 shape (promo-revenue ratio): the percentage of one
    month's discounted revenue coming from parts of one type — a
    conditional-sum-over-sum ratio after a lineitem⋈part join.

    The ratio divides two exact integer-cent·percent sums (one division,
    then ·100.0 — both correctly rounded), so the double replays across
    engines. Scale shape: part is the broadcast side; lineitem's month
    filter pushes into the scan; map-side partial agg feeds a single
    global row."""
    ep_c = _cents("l_extendedprice")
    disc_pct = _cents("l_discount")
    rev_u = ep_c * (F.lit(100) - disc_pct)
    dfrom = F.lit(date_from).cast("timestamp")
    dto = F.lit(date_to).cast("timestamp")
    joined = lineitem.filter(
        (F.col("l_shipdate") >= dfrom) & (F.col("l_shipdate") < dto)
    ).join(part, F.col("l_partkey") == F.col("p_partkey"))
    typed = F.when(F.col("p_type") == p_type, rev_u).otherwise(F.lit(0))
    return joined.agg(
        F.sum(typed).alias("tr"), F.sum(rev_u).alias("ar")
    ).select(
        ((F.col("tr") / F.col("ar")) * 100.0).alias("type_revenue_pct"),
        (F.col("tr") / 10000.0).alias("type_revenue"),
        (F.col("ar") / 10000.0).alias("total_revenue"),
    )


def pricing_rollup(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape under ``ROLLUP(l_returnflag, l_linestatus)``: the
    per-group rows PLUS per-returnflag subtotals and a grand total, each
    tagged with the standard grouping-id bitmask (0 = leaf, 1 = linestatus
    rolled up, 3 = grand total) so subtotal rows are distinguishable from
    hypothetical NULL group values.

    Scale shape: grouping sets plan as ONE scan + one Expand (one
    duplicated stream per grouping set) + one map-side-combined aggregate
    — a rollup over g sets costs g× the aggregate's shuffle rows (still
    groups × partitions, tiny), never g scans. Integer-cents sums as
    everywhere in this module; DuckDB's ROLLUP emits the identical rows
    and GROUPING() bitmask, so the oracle is direct."""
    qty_c = _cents("l_quantity")
    ep_c = _cents("l_extendedprice")
    disc_pct = _cents("l_discount")
    disc_price_u = ep_c * (F.lit(100) - disc_pct)
    g = (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum(qty_c).alias("qc"),
            F.sum(disc_price_u).alias("dc"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return g.select(
        "gid",
        "l_returnflag",
        "l_linestatus",
        (F.col("qc") / 100.0).alias("sum_qty"),
        (F.col("dc") / 10000.0).alias("sum_disc_price"),
        F.col("n").alias("count_order"),
    ).orderBy("gid", "l_returnflag", "l_linestatus")


def pricing_summary_decimal(
    lineitem: DataFrame, cutoff: str = "1998-09-02"
) -> DataFrame:
    """DECIMAL-aggregate twin of :func:`pricing_summary` — the production
    warehouse type choice this module's header documents (money lands in
    the tables as DECIMAL, sums run in DECIMAL(38,x), no cents encoding).

    Spark's decimal arithmetic widens exactly as long as the result stays
    inside precision 38 — hence the narrow DECIMAL(4,2) casts on the
    fraction columns (disc/tax ∈ [0,1)): ``ep·(1−disc)`` lands at
    DECIMAL(18,4) (exact 4-decimal products), ``·(1+tax)`` at
    DECIMAL(24,6), sums widen by +10 digits — every SUM here is exact and
    shuffle-order-free, the same guarantee the cents path engineers by
    hand. (A DECIMAL(12,2)·DECIMAL(13,2)·DECIMAL(13,2) chain would cross
    38 and Spark would silently TRUNCATE the scale, re-introducing per-row
    rounding — width budgeting is the decimal path's one design rule.)
    The AVG columns divide under Spark's decimal scale/HALF_UP rules.

    Deliberately NOT an oracle_sql() query: decimal type-promotion and
    division-rounding rules are engine-specific (DuckDB widens/rounds
    differently), so the cross-engine hash gate cannot absorb it; instead
    tests/test_relational.py pins it rows-only against pricing_summary —
    every exact-sum measure equal to the cent, AVGs within one rounding
    ulp. Scale shape: identical to pricing_summary (filter in scan, one
    map-side-combined groupBy); decimal sums use Spark's 128-bit update
    path, modestly slower per row than the BIGINT cents sums."""
    one = F.lit(1).cast("decimal(3,2)")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    disc_price = ep * (one - disc)
    charge = disc_price * (one + tax)
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(ep).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg(qty).alias("avg_qty"),
            F.avg(ep).alias("avg_price"),
            F.avg(disc).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def pricing_cube(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape under ``CUBE(l_returnflag, l_linestatus)`` — the
    full grouping-sets lattice: leaf groups (gid 0), per-returnflag
    subtotals (gid 1), per-LINESTATUS subtotals (gid 2 — the set ROLLUP
    cannot produce), and the grand total (gid 3). Together with
    :func:`pricing_rollup` this closes the grouping-sets family (SURVEY
    §2.2): Spark's `cube` IS `GROUPING SETS ((a,b),(a),(b),())`, so the
    explicit form needs no separate operator.

    Scale shape: identical to rollup — ONE scan + one Expand (4 duplicated
    streams here) + one map-side-combined aggregate; cost is sets× the
    aggregate's shuffle rows (groups × partitions, tiny), never sets×
    scans. Integer-cents sums; DuckDB CUBE emits identical rows and the
    same first-arg-is-MSB GROUPING() bitmask, so the oracle is direct."""
    qty_c = _cents("l_quantity")
    ep_c = _cents("l_extendedprice")
    disc_pct = _cents("l_discount")
    disc_price_u = ep_c * (F.lit(100) - disc_pct)
    g = (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum(qty_c).alias("qc"),
            F.sum(disc_price_u).alias("dc"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return g.select(
        "gid",
        "l_returnflag",
        "l_linestatus",
        (F.col("qc") / 100.0).alias("sum_qty"),
        (F.col("dc") / 10000.0).alias("sum_disc_price"),
        F.col("n").alias("count_order"),
    ).orderBy("gid", "l_returnflag", "l_linestatus")


def no_return_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Per-nation count of customers who HAVE placed orders (semi-join)
    but have NO order containing a returned line item (anti-join on
    l_returnflag = 'R') — the TPC-H Q21/Q22-style EXISTS / NOT EXISTS
    pair expressed as Spark's native LeftSemi and LeftAnti joins.

    Scale shape: both probe sides reduce to bare key columns before the
    join (the semi probe is orders' custkeys, the anti probe is the
    custkeys of orders having a flagged item — the returnflag filter
    pushes into the lineitem scan); semi/anti joins shuffle only keys and
    emit at most one row per left row, so no intermediate ever exceeds
    |customer|. The nation dimension broadcasts; the final aggregate is
    per-nation (tiny)."""
    with_orders = customer.select("c_custkey", "c_nationkey").join(
        orders.select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    )
    returning_custkeys = orders.select("o_orderkey", "o_custkey").join(
        lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey"),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    ).select("o_custkey")
    return (
        with_orders.join(
            returning_custkeys,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.asc("n_name"))
    )


def nation_trade_roles(
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    min_supplier_acctbal: float = 5000.0,
) -> DataFrame:
    """Set-operation classification of nations by trade role: nations with
    both customers and well-capitalized suppliers (INTERSECT), customer
    nations without such suppliers (EXCEPT), and the reverse — Spark's
    `intersect` / `subtract` (SQL INTERSECT / EXCEPT DISTINCT semantics)
    over the two nation-key sets, union-ed with a role tag. The acctbal
    threshold keeps the three sets non-degenerate on the fixture.

    Scale shape: set ops on bare int keys — each branch is a distinct-
    aggregate + join on the key column (Catalyst rewrites INTERSECT/EXCEPT
    to semi/anti joins over distincts); nothing wider than (key) ever
    shuffles, and the nation name join broadcasts."""
    cn = customer.select(F.col("c_nationkey").alias("nationkey"))
    sn = supplier.filter(F.col("s_acctbal") >= min_supplier_acctbal).select(
        F.col("s_nationkey").alias("nationkey")
    )
    roles = (
        cn.intersect(sn).withColumn("role", F.lit("both"))
        .unionByName(cn.subtract(sn).withColumn("role", F.lit("customer_only")))
        .unionByName(sn.subtract(cn).withColumn("role", F.lit("supplier_only")))
    )
    return roles.join(
        nation, F.col("nationkey") == F.col("n_nationkey")
    ).select("n_name", "role")

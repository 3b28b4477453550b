"""Extended TPC-H-shaped coverage (q2/q4/q7/q8/q9/q12/q13/q14/q15/q16/
q17/q18/q19/q21/q22 analogs) over the fixture star schema — with
queries/tpch.py's q1/q3/q5/q6/q10, 20 of the 22 TPC-H shapes (q11/q20
are partsupp-only and the fixtures have no partsupp table).

The fixtures have no ``partsupp`` table and lineitem carries no
commit/receipt dates or ship modes, so the queries that need those
(q2, q9, q12, q16) are *adapted*: same join topology, aggregation shape,
and optimizer stress (correlated min, EXISTS semi-join, disjunctive
range predicates, conditional aggregation, scalar-subquery threshold,
anti-join), substituting available columns. Each docstring states its
adaptation. All money reductions use exact fixed-point ints (_util).

Registered last on purpose: the driver's correctness gate verifies the
first 50 registered queries per round, and round 2's window is reserved
for the round-1-unverified modules; these rotate in next round (they are
locally oracle-checked by tests/test_oracle_parity.py regardless).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import T, fxp
from .registry import query

_REV = "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"


def _rev():
    return F.sum(fxp("l_extendedprice") * (100 - fxp("l_discount"))) / 10000.0


@query(
    "q2_min_cost_supplier",
    sql="""
    WITH px AS (
      SELECT l_partkey, min(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey
    )
    SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, n.n_name, px.min_price
    FROM part p
    JOIN px ON px.l_partkey = p.p_partkey
    JOIN lineitem l ON l.l_partkey = p.p_partkey AND l.l_extendedprice = px.min_price
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    """,
    tags=("tpch", "join", "argmin"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape (correlated min-cost subquery → per-group min + join-back).

    Adapted: no partsupp/ps_supplycost in the fixtures, so "cost" is the
    minimum l_extendedprice a part ever shipped at, and the matching
    supplier(s) come from the lineitems achieving it. min over doubles
    is order-insensitive, so no fixed-point routing is needed.
    """
    p = T(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    px = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            px.withColumnRenamed("l_partkey", "px_partkey"),
            (F.col("px_partkey") == F.col("p_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "min_price")
        .distinct()
    )


@query(
    "q4_order_priority",
    sql="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "semi"),
)
def q4_order_priority(spark, sf_dir):
    """Q4 shape (EXISTS → left-semi join, grouped count).

    Adapted: the fixtures have no l_commitdate/l_receiptdate, so "late"
    is l_shipdate more than 30 days after the order date.
    """
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q7_volume_shipping",
    sql=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           (CAST(sum({_REV}) AS BIGINT) / 10000.0) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY sn.n_name, cn.n_name, CAST(year(l.l_shipdate) AS INTEGER)
    """,
    tags=("tpch", "join"),
)
def q7_volume_shipping(spark, sf_dir):
    """Q7: bilateral trade volume between two nations by ship year —
    double-role nation dim (aliased twice), disjunctive pair filter."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_rev().alias("revenue"))
    )


@query(
    "q8_market_share",
    sql=f"""
    WITH v AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             sum({_REV}) AS vol,
             sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_REV} ELSE 0 END) AS nat_vol
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      GROUP BY CAST(year(o.o_orderdate) AS INTEGER)
    )
    SELECT o_year,
           CAST(CAST(nat_vol AS BIGINT) AS DOUBLE)
             / CAST(CAST(vol AS BIGINT) AS DOUBLE) AS mkt_share
    FROM v
    """,
    tags=("tpch", "join", "share"),
)
def q8_market_share(spark, sf_dir):
    """Q8: one nation's share of regional ECONOMY-part revenue per year.

    Share = ratio of two exact fixed-point sums (cast to double only at
    the final division, identically in both engines).
    """
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    p = T(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    rev = fxp("l_extendedprice") * (100 - fxp("l_discount"))
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(rev).alias("vol"),
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
            ).alias("nat_vol"),
        )
    )
    return agg.select(
        "o_year",
        (
            F.col("nat_vol").cast("double") / F.col("vol").cast("double")
        ).alias("mkt_share"),
    )


@query(
    "q9_product_type_profit",
    sql=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           (CAST(sum({_REV}) AS BIGINT) / 10000.0) AS profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'STANDARD'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INTEGER)
    """,
    tags=("tpch", "join"),
)
def q9_product_type_profit(spark, sf_dir):
    """Q9 shape (profit by supplier nation × order year over a part-type
    slice). Adapted: no ps_supplycost, so profit is discounted revenue
    (the join topology and agg shape are the point)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    p = T(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_rev().alias("profit"))
    )


@query(
    "q12_priority_by_status",
    sql="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    tags=("tpch", "join", "conditional-agg"),
)
def q12_priority_by_status(spark, sf_dir):
    """Q12 shape (conditional priority counts over late lines).

    Adapted: no l_shipmode/l_commitdate — groups by l_linestatus and
    defines late as shipped >60 days after the order date.
    """
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = T(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_effect",
    sql=f"""
    SELECT (CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV} ELSE 0 END) AS BIGINT) AS DOUBLE)
            * 100.0)
           / CAST(CAST(sum({_REV}) AS BIGINT) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("tpch", "share"),
)
def q14_promo_effect(spark, sf_dir):
    """Q14: promo parts' share of quarterly revenue — ratio of two exact
    fixed-point sums, cast to double identically in both engines."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part")
    rev = fxp("l_extendedprice") * (100 - fxp("l_discount"))
    agg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias("pr"),
        F.sum(rev).alias("tr"),
    )
    return agg.select(
        (
            (F.col("pr").cast("double") * F.lit(100.0)) / F.col("tr").cast("double")
        ).alias("promo_revenue_pct")
    )


@query(
    "q16_supplier_part_cnt",
    sql="""
    SELECT p.p_brand, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_size IN (1, 10, 20, 30, 40)
    GROUP BY p.p_brand, p.p_size
    """,
    tags=("tpch", "distinct-agg"),
)
def q16_supplier_part_cnt(spark, sf_dir):
    """Q16 shape (distinct supplier count per part group, NOT-filter).

    Adapted: no partsupp — lineitem is the part↔supplier link.
    """
    p = T(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 10, 20, 30, 40)
    )
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_volume_customers",
    sql="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) > 25000
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           (CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0)
             AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN big ON big.l_orderkey = o.o_orderkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
    tags=("tpch", "having", "topk"),
)
def q18_large_volume_customers(spark, sf_dir):
    """Q18: orders whose total quantity exceeds a HAVING threshold,
    joined back to customers — the classic agg-subquery-join-back shape.
    Quantity sums route through fixed-point (l_quantity is a 2-decimal
    double in the fixtures)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(fxp("l_quantity")).alias("q_cents"))
        .where(F.col("q_cents") > 25000)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(big), o.o_orderkey == F.col("big_orderkey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg((F.sum(fxp("l_quantity")) / 100.0).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


@query(
    "q19_disjunctive_revenue",
    sql=f"""
    SELECT (CAST(sum({_REV}) AS BIGINT) / 10000.0) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "disjunctive"),
)
def q19_disjunctive_revenue(spark, sf_dir):
    """Q19: three OR'd brand/size/quantity range branches — the classic
    disjunctive-predicate join the optimizer must not turn into a
    cartesian. Adapted: no p_container/l_shipmode filters."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(branch)
        .agg(_rev().alias("revenue"))
    )


@query(
    "q22_idle_rich_customers",
    sql="""
    WITH pos AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           (CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0)
             AS totacctbal
    FROM customer c, pos
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
    tags=("tpch", "anti", "scalar-subquery"),
)
def q22_idle_rich_customers(spark, sf_dir):
    """Q22 shape: customers above the average positive balance with no
    *recent* orders (scalar-subquery threshold + anti-join), grouped by
    nation.

    The threshold comparison stays in exact integers on both engines:
    ``c > s/n  ⟺  c·n > s`` for n>0 — no float division anywhere.
    Adapted: no c_phone country codes, so it groups by c_nationkey; and
    every fixture customer has *some* order, so the anti-join is against
    orders since 2000-01-01 (55 qualifying customers at sf0.01 — the
    unfiltered form is vacuous).
    """
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    pos = c.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(fxp("c_acctbal")).alias("s"), F.count("*").alias("n")
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .where(fxp("c_acctbal") * F.col("n") > F.col("s"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(fxp("c_acctbal")) / 100.0).alias("totacctbal"),
        )
    )


@query(
    "q13_customer_distribution",
    sql="""
    WITH co AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    """,
    tags=("tpch", "outer-join", "histogram"),
)
def q13_customer_distribution(spark, sf_dir):
    """Q13: distribution of per-customer order counts (customers with
    zero qualifying orders included via the left join's null-preserving
    count).

    Adapted: no o_comment in the fixtures, so the order filter is
    o_orderpriority <> '1-URGENT'. Two aggregations, both key-partial:
    the first shuffles |customers| rows, the second |distinct counts|.
    """
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    co = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier",
    sql="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, CAST(sum({rev}) AS BIGINT) AS total_rev_i
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_rev_i / 10000.0 AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.supplier_no
    WHERE rev.total_rev_i = (SELECT max(total_rev_i) FROM rev)
    """.format(rev=_REV),
    tags=("tpch", "scalar-subquery", "argmax"),
)
def q15_top_supplier(spark, sf_dir):
    """Q15: supplier(s) with the maximum revenue over one quarter
    (the view + scalar-subquery-max shape).

    Revenue totals stay exact scaled integers through the max
    comparison, so ties and the argmax are engine-identical; the /1e4
    happens only on output. The max is a 1-row broadcast, the rev CTE
    is computed once and reused for both sides (Spark reuses the
    exchange under AQE).
    """
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(fxp("l_extendedprice") * (100 - fxp("l_discount"))).alias("total_rev_i")
    )
    mx = rev.agg(F.max("total_rev_i").alias("mx"))
    s = T(spark, sf_dir, "supplier")
    return (
        s.join(rev, s["s_suppkey"] == rev["supplier_no"])
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_rev_i") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev_i") / 10000.0).alias("total_revenue"),
        )
    )


@query(
    "q17_small_qty_revenue",
    sql="""
    WITH pa AS (
      SELECT l_partkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qs,
             CAST(count(*) AS BIGINT) AS qn
      FROM lineitem GROUP BY l_partkey
    )
    SELECT (CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(round(l.l_quantity) AS BIGINT) * 5 * pa.qn < pa.qs
    """,
    tags=("tpch", "correlated-avg"),
)
def q17_small_qty_revenue(spark, sf_dir):
    """Q17: yearly revenue lost if small-quantity orders (< 20% of the
    part's average quantity) were not taken, for one brand.

    Adapted: no p_container, so the part filter is brand-only. The
    threshold `qty < avg/5` is evaluated as `qty·5·n < sum` — pure
    integer math, no float division, engine-identical ties. Scale shape:
    lineitem is semi-joined to the (broadcast) brand part list BEFORE
    the per-part stats aggregation, so the avg shuffle covers only the
    brand's lineitems, not the whole fact table — result-identical
    because the join would discard other parts anyway.
    """
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    lib = li.join(
        F.broadcast(p), li["l_partkey"] == p["p_partkey"], "semi"
    )
    pa = lib.groupBy("l_partkey").agg(
        F.sum(F.round("l_quantity").cast("long")).alias("qs"),
        F.count("*").alias("qn"),
    )
    j = lib.join(pa, "l_partkey").where(
        F.round("l_quantity").cast("long") * 5 * F.col("qn") < F.col("qs")
    )
    return j.agg(
        ((F.sum(fxp("l_extendedprice")) / 100.0) / 7.0).alias("avg_yearly")
    )


@query(
    "q21_waiting_suppliers",
    sql="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_7'
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
    tags=("tpch", "exists", "anti"),
)
def q21_waiting_suppliers(spark, sf_dir):
    """Q21 shape: the sole at-fault supplier on multi-supplier orders —
    EXISTS (another supplier on the order) + NOT EXISTS (another
    supplier also at fault), the classic semi+anti join pair.

    Adapted: no commit/receipt dates, so "at fault" is l_returnflag='R'
    on a finished ('F') order. The nation-filtered supplier dim is
    broadcast and applied FIRST, so the semi/anti self-joins run over
    one nation's lineitems only; both self-joins share the l_orderkey
    shuffle key with the driving side.
    """
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    sn = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    ).select("s_suppkey", "s_name")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    cand = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "semi",
    )
    sole = cand.join(
        l3,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return sole.groupBy("s_name").agg(F.count("*").alias("numwait"))

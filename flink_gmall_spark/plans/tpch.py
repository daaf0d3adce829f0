"""Classic TPC-H queries over the driver's star schema — the
standard-benchmark face of the engine.

The gmall reference never runs TPC-H, but the driver tables are TPC-H
shaped, so the canonical pricing-summary (Q1), shipping-priority (Q3)
and local-supplier-volume (Q5) queries run verbatim modulo two fixture
adaptations: date constants shifted into the 1995-2001 data range, and
``o_orderpriority`` standing in for the absent ``o_shippriority``.

Parity discipline (memory: spark-duckdb-parity-playbook): computed money
products round to integer CENTS per row via the explicit HALF_UP formula
``floor(x * 100 + 0.5)`` evaluated identically in both engines — a
double→DECIMAL cast is NOT portable here (engines disagree when the
product lands a hair's breadth from a .xx5 boundary; observed on Q1's
sum_charge). Integer cent sums are order-independent; the final
``cents / 100.0`` is one deterministic double op. Raw 2dp columns still
sum as DECIMAL. ORDER BY+LIMIT carries a key tiebreak for a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_gmall_spark.session import tune
from flink_gmall_spark.sources import load

Q1_CUTOFF = "2000-09-02"
Q3_DATE = "1998-06-30"
Q3_SEGMENT = "BUILDING"
Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "2000-01-01"

_D = "decimal(18,2)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report — the canonical wide aggregation
    (8 aggregates over 2 group keys after a date filter pushed into the
    scan). One partial→final hash agg; no joins."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= Q1_CUTOFF)
    disc_price_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    charge_cents = F.floor(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
        + F.lit(0.5)
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_D)).alias("d_qty"),
        F.sum(F.col("l_extendedprice").cast(_D)).alias("d_price"),
        F.sum(disc_price_cents).alias("c_disc_price"),
        F.sum(charge_cents).alias("c_charge"),
        F.sum(F.col("l_discount").cast("decimal(18,4)")).alias("d_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("d_qty").cast("double").alias("sum_qty"),
        F.col("d_price").cast("double").alias("sum_base_price"),
        (F.col("c_disc_price") / 100.0).alias("sum_disc_price"),
        (F.col("c_charge") / 100.0).alias("sum_charge"),
        (F.col("d_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("d_price").cast("double") / F.col("count_order")).alias("avg_price"),
        (F.col("d_disc").cast("double") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


ORACLE_Q1 = f"""
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_disc_price,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped high-revenue orders for one market segment —
    selective join then top-10 by revenue (TakeOrderedAndProject), with
    the order key as the total-order tiebreak."""
    tune(spark)
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < Q3_DATE)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > Q3_DATE)
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    revenue_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    agg = j.groupBy(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    ).agg((F.sum(revenue_cents) / 100.0).alias("revenue"))
    return agg.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


ORACLE_Q3 = f"""
SELECT l.l_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue from local suppliers per nation in one region —
    the 6-way join with the same-nation (customer = supplier) condition;
    all dims broadcast, the fact side never shuffles before the rollup."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q5_FROM) & (F.col("o_orderdate") < Q5_TO)
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    revenue_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    return j.groupBy("n_name").agg(
        (F.sum(revenue_cents) / 100.0).alias("revenue")
    )


ORACLE_Q5 = f"""
SELECT n.n_name,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q5_TO} 00:00:00'
GROUP BY n.n_name
"""


Q6_FROM, Q6_TO = "1997-01-01", "1998-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.02, 0.08
Q6_QTY = 30
Q10_FROM, Q10_TO = "1999-01-01", "1999-04-01"
Q14_FROM, Q14_TO = "1998-01-01", "1999-01-01"
Q18_QTY = 300

_CENTS = "floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecasting revenue change — a pure filter-and-sum whose
    predicates all push into the parquet scan; the canonical
    scan-efficiency probe (no join, no group key)."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= Q6_FROM)
        & (F.col("l_shipdate") < Q6_TO)
        & (F.col("l_discount") >= Q6_DISC_LO)
        & (F.col("l_discount") <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_QTY)
    )
    cents = F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100 + F.lit(0.5))
    return f.agg((F.sum(cents) / 100.0).alias("revenue"))


ORACLE_Q6 = f"""
SELECT sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q6_TO} 00:00:00'
  AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY}
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned items in one quarter, top 20 by
    lost revenue — selective fact filter, broadcast dims, TakeOrdered
    with the customer key as tiebreak."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q10_FROM) & (F.col("o_orderdate") < Q10_TO)
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        (F.sum(cents) / 100.0).alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


ORACLE_Q10 = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       sum(CAST({_CENTS} AS BIGINT)) / 100.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{Q10_FROM} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q10_TO} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share — conditional aggregation over
    a broadcast part join; the share is one double division of two
    deterministic integer-cent sums (no per-row float compare)."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q14_FROM) & (F.col("l_shipdate") < Q14_TO)
    )
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(0)).alias("promo_c"),
        F.sum(cents).alias("total_c"),
    )
    return agg.select(
        (F.col("promo_c") / 100.0).alias("promo_revenue"),
        (F.col("total_c") / 100.0).alias("total_revenue"),
        (100.0 * F.col("promo_c") / F.col("total_c")).alias("promo_share_pct"),
    )


ORACLE_Q14 = f"""
SELECT sum(CASE WHEN p.p_type = 'PROMO' THEN CAST({_CENTS} AS BIGINT) ELSE 0 END) / 100.0 AS promo_revenue,
       sum(CAST({_CENTS} AS BIGINT)) / 100.0 AS total_revenue,
       100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN CAST({_CENTS} AS BIGINT) ELSE 0 END)
             / sum(CAST({_CENTS} AS BIGINT)) AS promo_share_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00'
  AND l.l_shipdate < TIMESTAMP '{Q14_TO} 00:00:00'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders — the HAVING-over-join shape: per-
    order quantity rollup, threshold filter, customer enrichment. The
    per-order aggregate reuses its own exchange for the join back."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_D)).alias("d_qty"))
        .filter(F.col("d_qty") > Q18_QTY)
    )
    j = big.join(orders, big.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return j.select(
        "c_custkey",
        "c_name",
        F.col("l_orderkey").alias("o_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.col("o_totalprice").alias("o_totalprice"),
        F.col("d_qty").cast("double").alias("total_qty"),
    )


ORACLE_Q18 = f"""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_totalprice,
       CAST(q.d_qty AS DOUBLE) AS total_qty
FROM (
    SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS d_qty
    FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_QTY}
) q
JOIN orders o ON q.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


Q4_LATE_DAYS = 60
Q4_FROM, Q4_TO = "1997-01-01", "1997-07-01"


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted): order-priority checking — count orders per
    priority having at least one late-shipped lineitem (EXISTS → left
    semi join; the fixture lacks commit/receipt dates, so 'late' is a
    ship date more than Q4_LATE_DAYS past the order date, preserving
    Q4's correlated-EXISTS shape exactly)."""
    tune(spark)
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q4_FROM) & (F.col("o_orderdate") < Q4_TO)
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


ORACLE_Q4 = f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_FROM} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q4_TO} 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY 1
"""


Q19_CASES = [  # (brand, qty_lo, qty_hi, size_hi)
    ("Brand#12", 1, 11, 5),
    ("Brand#23", 10, 20, 10),
    ("Brand#34", 20, 30, 15),
]


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: discounted revenue — the canonical disjunctive
    predicate (OR of brand/quantity/size conjunction groups) over the
    part join; Catalyst extracts the common l_partkey=p_partkey
    conjunct so the join stays an equi-join with the OR as a post-join
    filter."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = None
    for brand, lo, hi, size_hi in Q19_CASES:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("l_quantity") >= lo)
            & (F.col("l_quantity") <= hi)
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= size_hi)
        )
        cond = c if cond is None else (cond | c)
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    return j.filter(cond).agg((F.sum(cents) / 100.0).alias("revenue"))


_Q19_DISJ = " OR ".join(
    f"(p.p_brand = '{b}' AND l.l_quantity BETWEEN {lo} AND {hi}"
    f" AND p.p_size BETWEEN 1 AND {sz})"
    for b, lo, hi, sz in Q19_CASES
)

ORACLE_Q19 = f"""
SELECT sum(CAST({_CENTS} AS BIGINT)) / 100.0 AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_Q19_DISJ}
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — the left outer
    join that must KEEP zero-order customers, then a second aggregation
    over the first's result (distribution of counts). Two shuffles by
    construction; the outer join's null side becomes the c_count=0
    bucket."""
    tune(spark)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


ORACLE_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


Q15_FROM, Q15_TO = "1998-01-01", "1998-04-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier — per-supplier quarterly revenue, keeping
    the supplier(s) whose revenue EQUALS the global max (the view +
    scalar-subquery shape; ties all surface, so no LIMIT nondeterminism).
    The revenue subtree is one DAG used by both the rows and the max —
    exchange reuse, not recompute."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q15_FROM) & (F.col("l_shipdate") < Q15_TO)
    )
    supp = load(spark, sf_dir, "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("rev_c"))
    max_rev = rev.agg(F.max("rev_c").alias("max_c"))
    top = rev.join(max_rev, rev.rev_c == max_rev.max_c)
    return top.join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey).select(
        F.col("s_suppkey"),
        F.col("s_name"),
        (F.col("rev_c") / 100.0).alias("total_revenue"),
    )


ORACLE_Q15 = f"""
WITH rev AS (
    SELECT l_suppkey, sum(CAST({_CENTS} AS BIGINT)) AS rev_c
    FROM lineitem l
    WHERE l.l_shipdate >= TIMESTAMP '{Q15_FROM} 00:00:00'
      AND l.l_shipdate < TIMESTAMP '{Q15_TO} 00:00:00'
    GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, rev.rev_c / 100.0 AS total_revenue
FROM rev
JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.rev_c = (SELECT max(rev_c) FROM rev)
"""


Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: volume shipping between two nations — revenue per
    (supplier nation, customer nation, ship year) for the unordered
    nation pair: the symmetric-disjunction join predicate
    ((A,B) OR (B,A)) evaluated after broadcast dim resolution."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
    )
    pair = (
        (F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A)
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    return (
        j.filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(cents) / 100.0).alias("revenue"))
    )


ORACLE_Q7 = f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       sum(CAST({_CENTS} AS BIGINT)) / 100.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE (ns.n_name = '{Q7_NATION_A}' AND nc.n_name = '{Q7_NATION_B}')
   OR (ns.n_name = '{Q7_NATION_B}' AND nc.n_name = '{Q7_NATION_A}')
GROUP BY 1, 2, 3
"""


Q17_FRACTION_NUM, Q17_FRACTION_DEN = 1, 5  # qty below 20% of the part's avg


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (adapted: no container column): average yearly revenue
    lost to small-quantity orders — lineitems whose quantity falls below
    one fifth of their part's average quantity. The correlated scalar
    subquery becomes a per-part aggregate joined back to the fact; the
    threshold compare is integer cross-multiplication
    (den*qty*count < num*sum_qty), not a float avg."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    j = li.join(per_part, li.l_partkey == F.col("pp_key"))
    small = j.filter(
        F.col("l_quantity").cast("decimal(18,2)") * Q17_FRACTION_DEN * F.col("n_li")
        < F.col("sum_qty") * Q17_FRACTION_NUM
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
    return small.agg(
        (F.sum(cents) / 100.0 / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("small_ct"),
    )


ORACLE_Q17 = f"""
WITH per_part AS (
    SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
           count(*) AS n_li
    FROM lineitem GROUP BY 1
)
SELECT sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 / 7.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS small_ct
FROM lineitem l
JOIN per_part p ON l.l_partkey = p.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * {Q17_FRACTION_DEN} * p.n_li
      < p.sum_qty * {Q17_FRACTION_NUM}
"""


Q8_NATION = "NATION_3"
Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_FROM, Q8_TO = "1996-01-01", "1998-01-01"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — one nation's share of a
    region's import revenue for one part type, by order year. The share
    is a conditional cents-sum over the total cents-sum per year: two
    deterministic integers and one double division, no float compare
    anywhere."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q8_FROM) & (F.col("o_orderdate") < Q8_TO)
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == region.r_regionkey)
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    agg = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == Q8_NATION, cents).otherwise(0)).alias(
            "nation_c"
        ),
        F.sum(cents).alias("total_c"),
    )
    return agg.select(
        "o_year",
        (F.col("nation_c") / 100.0).alias("nation_revenue"),
        (F.col("total_c") / 100.0).alias("total_revenue"),
        (F.col("nation_c") / F.col("total_c").cast("double")).alias("mkt_share"),
    )


ORACLE_Q8 = f"""
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       sum(CASE WHEN ns.n_name = '{Q8_NATION}' THEN CAST({_CENTS} AS BIGINT) ELSE 0 END) / 100.0 AS nation_revenue,
       sum(CAST({_CENTS} AS BIGINT)) / 100.0 AS total_revenue,
       sum(CASE WHEN ns.n_name = '{Q8_NATION}' THEN CAST({_CENTS} AS BIGINT) ELSE 0 END)
         / CAST(sum(CAST({_CENTS} AS BIGINT)) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey
WHERE p.p_type = '{Q8_TYPE}'
  AND r.r_name = '{Q8_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q8_FROM} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q8_TO} 00:00:00'
GROUP BY 1
"""

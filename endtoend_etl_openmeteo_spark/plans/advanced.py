"""Advanced analytics queries: as-of join, TPC-H-style headline aggregates,
embedding centroids, vocabulary statistics (extension surface beyond the
reference, SURVEY.md §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.asof import asof_join
from endtoend_etl_openmeteo_spark.plans.registry import register
from endtoend_etl_openmeteo_spark.sources.tables import tbl


@register(
    "q_asof_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, 1 AS side, NULL::BIGINT AS tb,
             event_id, NULL::BIGINT AS asof_event_id
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 0 AS side, event_id AS tb,
             NULL::BIGINT AS event_id, event_id AS asof_event_id
      FROM events WHERE event_type = 'click'
    ),
    spine AS (
      SELECT user_id, side, ts, event_id,
             last_value(asof_event_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, tb
               ROWS UNBOUNDED PRECEDING
             ) AS asof_event_id
      FROM tagged
    )
    SELECT event_id AS purchase_id, user_id, ts, asof_event_id AS click_id
    FROM spine WHERE side = 1
    """,
    doc="As-of join (purchase → latest preceding click per user): the "
    "attribution primitive Spark lacks natively, composed as "
    "union + carry-forward window — ONE shuffle on the key, no range "
    "explosion (operators/asof.py).",
    tags=("join", "asof", "window"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        carry_cols=["event_id"],
        tiebreak="event_id",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.col("asof_event_id").alias("click_id"),
    )


@register(
    "q_asof_forward",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, 1 AS side, NULL::BIGINT AS tb,
             event_id, NULL::BIGINT AS asof_event_id
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 0 AS side, event_id AS tb,
             NULL::BIGINT AS event_id, event_id AS asof_event_id
      FROM events WHERE event_type = 'click'
    ),
    spine AS (
      SELECT user_id, side, ts, event_id,
             last_value(asof_event_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts DESC, side, tb
               ROWS UNBOUNDED PRECEDING
             ) AS asof_event_id
      FROM tagged
    )
    SELECT event_id AS purchase_id, user_id, ts, asof_event_id AS click_id
    FROM spine WHERE side = 1
    """,
    doc="FORWARD as-of join (purchase -> earliest following click per "
    "user, the post-conversion-behavior primitive): the same "
    "union + carry window as q_asof_join over a reversed timestamp "
    "order — direction is a sort flag, not a new algorithm, and the "
    "plan is still one shuffle on the key (operators/asof.py).",
    tags=("join", "asof", "window"),
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        carry_cols=["event_id"],
        tiebreak="event_id",
        direction="forward",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.col("asof_event_id").alias("click_id"),
    )



@register(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
             AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary (headline aggregate): 8 aggregates over "
    "a pushed-down date filter in one partial+final hash-agg pass — the "
    "canonical scan-bound warehouse query.",
    tags=("aggregate", "tpch"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: selective dim filter broadcast into a "
    "two-join star, aggregate, top-10 — the canonical join-then-topk. "
    "Only the true dimension (filtered customer) is broadcast-hinted; "
    "orders is a FACT — forcing it broadcast would OOM at warehouse "
    "scale, so Catalyst/AQE picks its join strategy from actual sizes.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1996-03-15").cast("timestamp")
    cust = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = tbl(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_tpch_q5",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 local-supplier volume: true dims (supplier/nation/region) "
    "broadcast; orders and customer are facts whose join strategy "
    "Catalyst/AQE sizes at runtime (force-broadcasting a filtered fact "
    "is the classic does-not-survive-100x mistake); one aggregate "
    "shuffle on n_name.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast revenue: pure scan-filter-aggregate — every "
    "predicate pushes into the parquet scan; the canonical "
    "pushdown-efficiency probe.",
    tags=("aggregate", "tpch", "scan"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


@register(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 order-priority checking: correlated EXISTS planned as a "
    "semi join — the fact side is filtered before the join, and the semi "
    "join carries no lineitem columns.",
    tags=("join", "semi", "tpch"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q_tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12-style shipmode classification: conditional-sum pivot "
    "inside one aggregate after an equi-join — CASE folding stays in "
    "codegen, no second pass per class.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = tbl(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q14",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14 promotion effect: ratio of conditional revenue sums, "
    "part dimension broadcast, single aggregate row.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = tbl(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue")
        )
    )


@register(
    "q_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 volume shipping: cross-nation trade revenue by year — "
    "two aliases of the broadcast nation dim, year extraction in the "
    "group key.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    supp = tbl(spark, sf_dir, "supplier")
    n1 = tbl(spark, sf_dir, "nation").alias("n1")
    n2 = tbl(spark, sf_dir, "nation").alias("n2")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2.n_nationkey"))
        .filter(F.col("n1.n_nationkey") != F.col("n2.n_nationkey"))
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting: top-20 customers by lost "
    "revenue on returns — join tree + aggregate + TakeOrdered.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = tbl(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 customer distribution: left outer join preserving "
    "order-less customers, double aggregation (orders per customer, "
    "customers per order-count).",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q_tpch_q18",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 4) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 large-volume customers: HAVING over a grouped join, "
    "top-100 by price.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum("l_quantity").alias("__qty"),
        )
        .filter(F.col("__qty") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("__qty", 4).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_big_spenders
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
    """,
    doc="Scalar subquery: customers above the global average balance — "
    "Spark plans the subquery as a one-row broadcast, no re-scan per row.",
    tags=("subquery", "aggregate"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    try:
        # spark.sql analyzes eagerly (the view's plan is inlined into the
        # returned frame), so the view can drop immediately — leaving it
        # registered would leak session-global catalog state that a later
        # plan reusing the name would silently read
        return spark.sql(
            """
            SELECT c_mktsegment, count(*) AS n_big_spenders
            FROM customer_sq
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_sq)
            GROUP BY c_mktsegment
            """
        )
    finally:
        spark.catalog.dropTempView("customer_sq")


@register(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
    doc="Unpivot wide measures to long form via stack() — the inverse of "
    "q_pivot; a generator projection, no shuffle.",
    tags=("projection",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        ).alias("measure", "val"),
    )


@register(
    "q_embedding_centroid",
    oracle="""
    SELECT label, CAST(u.i - 1 AS BIGINT) AS pos,
           round(avg(embedding[u.i]::DOUBLE), 6) AS centroid
    FROM embeddings, unnest(generate_series(1, 64)) AS u(i)
    GROUP BY 1, 2
    """,
    doc="Per-label embedding centroid (the IVF coarse-quantizer building "
    "block): posexplode to (label, pos, value), one hash aggregate. At "
    "scale this is the k-means-assignment reducer shape.",
    tags=("similarity", "aggregate"),
)
def q_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "embeddings")
        .select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(F.round(F.avg("col"), 6).alias("centroid"))
    )


@register(
    "q_vocab_topk",
    oracle="""
    SELECT tok, n FROM (
      SELECT tok, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, tok) AS rnk
      FROM (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents
      )
      GROUP BY tok
    ) WHERE rnk <= 50
    """,
    doc="Corpus vocabulary top-50 (tokenizer-training prep): explode "
    "tokens, count, rank — partial aggregation absorbs the token "
    "explosion map-side before one shuffle.",
    tags=("text", "aggregate"),
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.dedup import normalized_text

    toks = tbl(spark, sf_dir, "documents").select(
        F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    return counts.orderBy(F.desc("n"), "tok").limit(50).select("tok", "n")


@register(
    "q_tpch_q2",
    oracle="""
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type,
           round(l_extendedprice, 4) AS min_price
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size = 15 AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      AND l_extendedprice = (
        SELECT min(l2.l_extendedprice)
        FROM lineitem l2, supplier s2, nation n2, region r2
        WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part; lineitem stands in for "
    "partsupp — the testdata has no partsupp table): the correlated "
    "min-subquery decorrelates to a per-partkey min WINDOW over the "
    "region-restricted offers — one shuffle on p_partkey instead of a "
    "subquery-per-row; supplier/nation/region collapse to one broadcast "
    "dim before the fact scan.",
    tags=("join", "tpch", "window", "subquery"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    supp = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # One small broadcastable dim: European suppliers with their nation name.
    eu_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = tbl(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_type"
    )
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    offers = li.join(F.broadcast(eu_supp), li.l_suppkey == eu_supp.s_suppkey).join(
        F.broadcast(parts), li.l_partkey == parts.p_partkey
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("__min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("__min_price"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("l_extendedprice", 4).alias("min_price"),
        )
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q_tpch_q9",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.5 * p_retailprice * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%gear%'
    ) profit GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape (product-type profit by nation and year; "
    "0.5*p_retailprice stands in for ps_supplycost — no partsupp table): "
    "a five-table join where only the true dims (filtered part, supplier, "
    "nation) are broadcast; lineitem-orders is the fact-fact join whose "
    "strategy AQE sizes at runtime; profit expression stays in one "
    "codegen stage before the two-key aggregate shuffle.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice")
    )
    supp = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.5) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
    )


@register(
    "q_tpch_q17",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 small-quantity-order revenue: the correlated avg-per-part "
    "subquery decorrelates to groupBy(l_partkey).avg over the lineitems of "
    "the brand's parts only (semantically identical — the correlation key "
    "determines the part set), broadcast back against the same filtered "
    "scan: zero extra shuffles at warehouse scale.",
    tags=("aggregate", "tpch", "subquery"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # materialize the shared brand slice ONCE — the q_tpch_q11/q15
    # discipline: exchange reuse does not cross the broadcast boundary,
    # so the lazy form scans lineitem and broadcasts part twice (once
    # under the limits aggregate, once on the probe side)
    brand_li = li.join(
        F.broadcast(parts), li.l_partkey == parts.p_partkey
    ).localCheckpoint(eager=True)
    limits = brand_li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("__qty_limit")
    )
    return (
        brand_li.join(F.broadcast(limits), brand_li.l_partkey == limits.__pk)
        .filter(F.col("l_quantity") < F.col("__qty_limit"))
        .agg((F.round(F.sum("l_extendedprice") / 7.0, 4)).alias("avg_yearly"))
    )


@register(
    "q_tpch_q20",
    oracle="""
    SELECT s_name, round(s_acctbal, 4) AS s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 60)
      AND s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (suppliers with excess shipped volume; shipped "
    "lineitem quantity stands in for partsupp availability): nested "
    "IN-subqueries become broadcast semi-joins — part filter broadcast "
    "into the dated lineitem scan, grouped HAVING survivors broadcast "
    "semi-joined against supplier; no correlated re-scan anywhere.",
    tags=("join", "tpch", "subquery", "semi"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 60)
        .select("l_suppkey")
        .distinct()
    )
    supp = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation").filter(F.col("n_name").startswith("NATION_1"))
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(heavy), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 4).alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "q_tpch_q8",
    oracle="""
    SELECT o_year, round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END)
           / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY'
    ) all_nations GROUP BY o_year
    """,
    doc="TPC-H Q8 national market share: eight-table star with the nation "
    "dim joined twice (customer side prunes to a region, supplier side "
    "names the share); conditional-sum ratio per year. Dims broadcast, "
    "lineitem-orders strategy left to AQE.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    reg = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = tbl(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_region") == reg.r_regionkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH val AS (
      SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name LIKE 'NATION_2%'
      GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 4) AS value
    FROM val
    WHERE value > (SELECT sum(value) * 0.001 FROM val)
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape (important stock; shipped value stands in for "
    "partsupp stock value): the group-vs-global scalar subquery "
    "decorrelates to one grouped aggregate reused on both sides — the "
    "global total is a 1-row broadcast cross-join, not a re-scan.",
    tags=("aggregate", "tpch", "subquery"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = (
        tbl(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                tbl(spark, sf_dir, "nation").filter(
                    F.col("n_name").startswith("NATION_2")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
        # Both sides of the decorrelated subquery consume this part-keyed
        # aggregate; materialize it once (part-sized, bounded) instead of
        # re-running the lineitem scan+join+agg for the 1-row total —
        # exchange reuse does NOT kick in across the broadcast boundary
        # (measured: 9 parquet scans without, 5 with).
        .localCheckpoint(eager=True)
    )
    total = val.agg((F.sum("value") * 0.001).alias("__threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__threshold"))
        .select("l_partkey", F.round("value", 4).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


@register(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 4) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 top supplier: max-over-derived-view equality — the "
    "revenue view computes once, its 1-row max broadcast cross-joins "
    "back (no second scan of lineitem), supplier dim broadcast.",
    tags=("aggregate", "tpch", "subquery"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    # supplier-sized and consumed twice (max + stream): materialize once
    # rather than re-scanning lineitem for the 1-row max (see Q11 note)
    ).localCheckpoint(eager=True)
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    supp = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (supplier count per part attributes; lineitem "
    "supplies the part-supplier pairs): NOT IN on a null-free key becomes "
    "a broadcast anti-join; count(DISTINCT) per 3-key group — the "
    "distinct expands map-side then two-phase aggregates.",
    tags=("aggregate", "tpch", "anti"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").startswith("PROMO"))
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    flagged = tbl(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = tbl(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q_tpch_q19",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
      (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 11)
      OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        AND l_quantity BETWEEN 10 AND 20)
      OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        AND l_quantity BETWEEN 20 AND 30))
    """,
    doc="TPC-H Q19 shape (disjunctive bracketed predicates over a "
    "dimension join; no container/shipmode columns in this testdata): "
    "the three-brand part filter broadcast into the fact scan, the "
    "cross-side OR evaluated post-join in one codegen stage.",
    tags=("join", "aggregate", "tpch"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = tbl(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    li = tbl(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      AND s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    doc="TPC-H Q21 shape (suppliers who alone shipped late on "
    "multi-supplier orders; ship>order+60d stands in for the missing "
    "receipt/commit dates): the EXISTS / NOT EXISTS pair decorrelates to "
    "per-order distinct-supplier counts — computed as collect_set windows "
    "over l_orderkey so the whole check costs ONE shuffle on the order "
    "key (a groupBy+rejoin would shuffle the fact twice); late lines "
    "then filter on (nsupp>1, nlate=1).",
    tags=("join", "aggregate", "tpch", "subquery"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "__late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    per_order = lo.select(
        "l_orderkey",
        "l_suppkey",
        "__late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("__nsupp"),
        F.size(
            F.collect_set(F.when(F.col("__late"), F.col("l_suppkey"))).over(w)
        ).alias("__nlate"),
    )
    nat = tbl(spark, sf_dir, "nation").filter(F.col("n_name").startswith("NATION_1"))
    supp = (
        tbl(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        per_order.filter(
            F.col("__late") & (F.col("__nsupp") > 1) & (F.col("__nlate") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "q_tpch_q22",
    oracle="""
    SELECT nationgroup, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM (
      SELECT 'G' || CAST(c_nationkey % 5 AS VARCHAR) AS nationgroup,
             c_acctbal, c_custkey
      FROM customer
      WHERE c_nationkey % 5 IN (0, 1, 2)
        AND c_acctbal > (
          SELECT avg(c_acctbal) FROM customer
          WHERE c_acctbal > 0 AND c_nationkey % 5 IN (0, 1, 2))
        AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01')
    ) custsale GROUP BY nationgroup ORDER BY nationgroup
    """,
    doc="TPC-H Q22 shape (global-sales-opportunity; nationkey buckets "
    "stand in for phone country codes, dormant-since-1999 for "
    "never-ordered): the avg scalar subquery broadcasts as one row, the "
    "NOT EXISTS becomes a broadcast anti-join on recent orders.",
    tags=("aggregate", "tpch", "anti", "subquery"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") % 5).isin(0, 1, 2)
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .select(
            F.concat(F.lit("G"), (F.col("c_nationkey") % 5).cast("string")).alias(
                "nationgroup"
            ),
            "c_acctbal",
        )
        .groupBy("nationgroup")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("nationgroup")
    )


@register(
    "q_range_join",
    oracle="""
    WITH win AS (
      SELECT user_id AS win_id, min(ts) AS win_start,
             min(ts) + INTERVAL 6 HOUR AS win_end
      FROM events WHERE user_id < 20 GROUP BY user_id
    )
    SELECT e.event_id, w.win_id
    FROM events e JOIN win w
      ON e.ts >= w.win_start AND e.ts < w.win_end
    """,
    doc="Point-in-interval join (operators/rangejoin.py): each user's "
    "first-6-hours window vs ALL events — no equi key, so naive SQL plans "
    "a nested-loop cross product. The operator chunk-buckets the time "
    "axis (hour grain here) turning it into one equi-join shuffle; exact "
    "bounds re-checked post-join.",
    tags=("join", "range"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.rangejoin import interval_join

    ev = tbl(spark, sf_dir, "events")
    win = (
        ev.filter(F.col("user_id") < 20)
        .groupBy(F.col("user_id").alias("win_id"))
        .agg(F.min("ts").alias("win_start"))
        .withColumn("win_end", F.col("win_start") + F.expr("INTERVAL 6 HOURS"))
    )
    pts = ev.select("event_id", "ts")
    return interval_join(pts, win, "ts", "win_start", "win_end", chunk="hour").select(
        "event_id", "win_id"
    )


@register(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 4) AS lo,
           round(max(o_totalprice), 4) AS hi
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
    doc="Fixed-width histogram over order value: floor-division bucketing "
    "keeps the whole plan in one partial+final hash aggregate (a "
    "data-derived equal-width variant would add one scalar-aggregate "
    "broadcast, same shape as q_tpch_q11's threshold).",
    tags=("aggregate", "histogram"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 25000).cast("long").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "q_regression",
    oracle="""
    SELECT event_type,
           round(corr(value, (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0), 6)
             AS corr_vt,
           round(regr_slope(value, (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0), 6)
             AS slope_per_hour,
           round(regr_intercept(value, (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0), 6)
             AS intercept,
           round(regr_r2(value, (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0), 6)
             AS r2
    FROM events GROUP BY event_type
    """,
    doc="Regression aggregates (drift detection over a measure): per-key "
    "OLS slope/intercept/correlation/R² of value against hours since a "
    "fixed anchor — single-pass mergeable moment aggregates (sum, sum², "
    "sum-of-products), the same shuffle shape as any groupBy; the anchor "
    "centers x so the moments stay numerically stable at any time range.",
    tags=("aggregate", "advanced"),
)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    x = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lit("2024-01-01").cast("timestamp"))
    ) / 3.6e9
    return ev.groupBy("event_type").agg(
        F.round(F.corr("value", x), 6).alias("corr_vt"),
        F.round(F.regr_slope("value", x), 6).alias("slope_per_hour"),
        F.round(F.regr_intercept("value", x), 6).alias("intercept"),
        F.round(F.regr_r2("value", x), 6).alias("r2"),
    )


@register(
    "q_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM events
    ),
    s2 AS (
      SELECT user_id, ts, event_type, t_view,
             min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM s1
    ),
    s3 AS (
      SELECT DISTINCT user_id, t_view, t_click,
             min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
      FROM s2
    )
    SELECT user_id, t_view, t_click, t_purchase,
           CASE WHEN t_purchase IS NOT NULL THEN 3
                WHEN t_click IS NOT NULL THEN 2
                WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage,
           epoch_us(t_click) - epoch_us(t_view) AS view_to_click_us,
           epoch_us(t_purchase) - epoch_us(t_click) AS click_to_purchase_us
    FROM s3
    """,
    doc="Ordered conversion funnel (view -> click -> purchase, each step "
    "strictly after the previous): three stacked per-user window minima "
    "— ONE user_id shuffle serves all three stages because every window "
    "shares the same partitioning; a per-step self-join would shuffle "
    "three times. Emits per-user stage reached + inter-step latencies.",
    tags=("window", "advanced", "behavior"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = ev.select("user_id", "ts", "event_type", t_view.alias("t_view"))
    t_click = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
               F.col("ts"))
    ).over(w)
    s2 = s1.select("user_id", "ts", "event_type", "t_view", t_click.alias("t_click"))
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    s3 = s2.select(
        "user_id", "t_view", "t_click", t_purchase.alias("t_purchase")
    ).distinct()
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return s3.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        stage.alias("funnel_stage"),
        (F.unix_micros("t_click") - F.unix_micros("t_view")).alias("view_to_click_us"),
        (F.unix_micros("t_purchase") - F.unix_micros("t_click")).alias(
            "click_to_purchase_us"
        ),
    )


@register(
    "q_retention",
    oracle="""
    WITH first_act AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY 1
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
      FROM events
    ),
    j AS (
      SELECT f.cohort_week, a.user_id,
             CAST((epoch(a.w) - epoch(f.cohort_week)) / 604800 AS BIGINT) AS week_k
      FROM first_act f JOIN active a ON f.user_id = a.user_id
    ),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size FROM first_act GROUP BY 1
    )
    SELECT j.cohort_week, j.week_k,
           count(DISTINCT j.user_id) AS n_active,
           round(count(DISTINCT j.user_id) / any_value(s.cohort_size), 6)
             AS retention
    FROM j JOIN sizes s ON j.cohort_week = s.cohort_week
    GROUP BY 1, 2
    """,
    doc="Weekly retention cohorts: cohort = ISO week of first activity; "
    "retention(k) = fraction of the cohort active k weeks later. Two "
    "user-keyed aggregates feed a join whose left side is one row per "
    "(user, active-week) — the cohort-size side is |weeks| rows, "
    "broadcast. The distinct-user count per (cohort, k) is the only "
    "wide aggregation.",
    tags=("aggregate", "advanced", "behavior"),
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    first_act = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    j = first_act.join(active, "user_id").select(
        "cohort_week",
        "user_id",
        (
            (F.unix_seconds("w") - F.unix_seconds("cohort_week")) / 604800
        ).cast("long").alias("week_k"),
    )
    sizes = first_act.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        j.join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", "week_k")
        .agg(
            F.count_distinct("user_id").alias("n_active"),
            F.round(
                F.count_distinct("user_id") / F.any_value("cohort_size"), 6
            ).alias("retention"),
        )
    )

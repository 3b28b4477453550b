"""Window functions (SURVEY.md §2.7 — reference-implied by the trends
question, gha.ipynb cell 27: ranking "popular repositories from recent
activity" and per-entity time-ordered analysis).

Every window orders by a unique key chain so ranks are total across
engines. Frame reductions over doubles go through the decimal
accumulator; per-row lag/lead passthrough is bit-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._util import T, fxp
from .registry import query


@query(
    "window_rank_topn_per_group",
    sql="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window",),
)
def window_rank_topn_per_group(spark, sf_dir):
    # top-N per group: single shuffle on the partition key, no global sort.
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "window_rank_dense",
    sql="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(rank()       OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS INTEGER) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS INTEGER) AS drnk
    FROM part
    """,
    tags=("window",),
)
def window_rank_dense(spark, sf_dir):
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_size"), "p_partkey")
    return T(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_lag_lead",
    sql="""
    SELECT user_id, event_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("window",),
)
def window_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
        )
    )


@query(
    "window_moving_sum",
    sql="""
    SELECT user_id, event_id,
           (CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0) AS mv_sum,
           CAST(count(*) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mv_n
    FROM events
    """,
    tags=("window",),
)
def window_moving_sum(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    e = T(spark, sf_dir, "events")
    return e.select(
        "user_id",
        "event_id",
        (F.sum(fxp("value")).over(w) / 100.0).alias("mv_sum"),
        F.count("*").over(w).alias("mv_n"),
    )


@query(
    "window_cumulative_share",
    sql="""
    SELECT o_custkey, o_orderkey,
           (CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0) AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_cumulative_share(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.sum(fxp("o_totalprice")).over(w) / 100.0).alias("running_spend"),
    )


@query(
    "window_time_range_count",
    sql="""
    SELECT event_id, user_id,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)
             AS events_last_hour
    FROM events
    """,
    tags=("window", "range-frame"),
)
def window_time_range_count(spark, sf_dir):
    # time-based RANGE frame (sliding 1h count per user). The DataFrame
    # API's rangeBetween only takes longs, so the interval frame is
    # expressed in SQL — still one shuffle on user_id.
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        F.expr(
            "count(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ).alias("events_last_hour"),
    )


@query(
    "window_percent_rank",
    sql="""
    SELECT s_suppkey,
           percent_rank() OVER (ORDER BY s_acctbal, s_suppkey) AS bal_pct,
           cume_dist()    OVER (ORDER BY s_acctbal, s_suppkey) AS bal_cume
    FROM supplier
    """,
    tags=("window",),
)
def window_percent_rank(spark, sf_dir):
    # (rank-1)/(n-1) and cume counts are integer-derived → the double
    # division is deterministic across engines.
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return T(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.percent_rank().over(w).alias("bal_pct"),
        F.cume_dist().over(w).alias("bal_cume"),
    )


@query(
    "window_ntile_quartiles",
    sql="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS bal_quartile
    FROM customer
    """,
    tags=("window",),
)
def window_ntile_quartiles(spark, sf_dir):
    # single unpartitioned window — fine for a dim table; for a 100 TB fact
    # table use approx percentile buckets instead (documented trade-off).
    w = Window.orderBy(F.desc("c_acctbal"), "c_custkey")
    return T(spark, sf_dir, "customer").select(
        "c_custkey", F.ntile(4).over(w).alias("bal_quartile")
    )


@query(
    "window_value_range_frame",
    sql="""
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER (PARTITION BY o_custkey
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
                 RANGE BETWEEN 1000000 PRECEDING AND 1000000 FOLLOWING)
                AS BIGINT) AS n_similar_priced,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
                 RANGE BETWEEN 1000000 PRECEDING AND 1000000 FOLLOWING)
                AS BIGINT) AS cents_similar_priced
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def window_value_range_frame(spark, sf_dir):
    """VALUE-based RANGE window frame: for every order, how many of the
    same customer's orders fall within ±$10,000 of ITS price, and their
    summed value — the peer-group framing (price-band comparisons,
    salary bands, nearest-neighbor-by-value) that row-count frames
    can't express: the frame width varies per row with the DATA, not
    the row position. Completes the frame-type surface next to the
    time-interval RANGE (`window_time_range_count`) and ROWS frames
    (`window_moving_sum`).

    Exact-cents ordering key (the fixed-point rule) keeps the frame
    boundary comparisons integer — a double ordering key would make
    frame membership rounding-sensitive at the ±bound edge. One
    shuffle on the partition key; the range scan within each partition
    is the standard sorted two-pointer sweep Spark's window exec does
    natively. The DataFrame API's rangeBetween takes the same long
    offsets (`Window.rangeBetween(-1000000, 1000000)`).
    """
    from pyspark.sql import Window as W

    o = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = W.partitionBy("o_custkey").orderBy(cents).rangeBetween(-1_000_000, 1_000_000)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).cast("long").alias("n_similar_priced"),
        F.sum(cents).over(w).cast("long").alias("cents_similar_priced"),
    )

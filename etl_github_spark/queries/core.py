"""Core relational operators: flagship query, filters, projections, scalars.

Covers SURVEY.md §2.2 (P1-P10 analogs over the fixture tables), §2.3
(F1-F7), §2.6 (O1-O4) and the flagship query shape of §3 EP2
(reference ``query_data``, preprocess.py:209-230: groupBy-count →
HAVING → broadcast join → substring/prefix filters → project → orderBy
desc). Table mapping per FIXTURES.md §A.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import T
from .registry import query

# ---------------------------------------------------------------------------
# Flagship: the reference's "dask commits" query re-expressed on `events`.
#
# reference shape (preprocess.py:214-230):
#   repos   = watch.repo.value_counts(); repos = repos[repos > 5]   (agg+HAVING)
#   commits = commits[~commits.username.str.contains("bot")]        (neg filter)
#   commits = commits.merge(repos, on="repo")                       (broadcast join)
#   commits = commits[commits.message.str.lower().str.contains(" dask")]
#   commits = commits[~commits.repo.str.startswith("dask/")]
#   out     = commits.sort_values("count", ascending=False)
#
# fixture mapping: watch→events[view], commits→events[click],
# repo→user_id, message-contains→json prop threshold, bot→user_id%7.
# ---------------------------------------------------------------------------


@query(
    "flagship_popular_user_clicks",
    sql="""
    WITH popular AS (
      SELECT user_id, count(*) AS view_cnt
      FROM events WHERE event_type = 'view'
      GROUP BY user_id HAVING count(*) > 3
    )
    SELECT e.event_id, e.user_id, e.value, p.view_cnt
    FROM events e JOIN popular p USING (user_id)
    WHERE e.event_type = 'click'
      AND TRY_CAST(json_extract_string(e.props, '$.k') AS INTEGER) >= 10
      AND e.user_id % 7 <> 0
    """,
    tags=("flagship", "A1", "F6", "J1", "F1", "F3", "O1"),
)
def flagship_popular_user_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = T(spark, sf_dir, "events")
    # Aggregated dim side is tiny (<= |users| rows) → broadcast, exactly the
    # intent of the reference's repartition(npartitions=1) (preprocess.py:216).
    popular = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count("*").alias("view_cnt"))
        .where(F.col("view_cnt") > 3)
    )
    clicks = events.where(
        (F.col("event_type") == "click")
        & (F.get_json_object("props", "$.k").try_cast("int") >= 10)
        & (F.col("user_id") % 7 != 0)
    )
    # Sink-side clustering, not a global sort: the reference's sorted sink
    # (preprocess.py:225) needs rows *grouped* for consumers, which
    # sortWithinPartitions gives without the rangepartitioning exchange +
    # global barrier a no-limit orderBy pays (the r02 flagship regression).
    # Row SET is identical; consumers needing a total order add it at read.
    return (
        clicks.join(F.broadcast(popular), "user_id", "inner")
        .select("event_id", "user_id", "value", "view_cnt")
        .sortWithinPartitions(F.desc("view_cnt"), "event_id")
    )


# --- filters (§2.3) --------------------------------------------------------


@query(
    "filter_eq",
    sql="""
    SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
    """,
    tags=("F1",),
)
def filter_eq(spark, sf_dir):
    return (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


@query(
    "filter_substring_ci",
    sql="""
    SELECT doc_id, source FROM documents
    WHERE lower(text) LIKE '% merge %'
    """,
    tags=("F2",),
)
def filter_substring_ci(spark, sf_dir):
    # reference: message.str.lower().str.contains(" dask") preprocess.py:221-223
    return (
        T(spark, sf_dir, "documents")
        .where(F.lower(F.col("text")).contains(" merge "))
        .select("doc_id", "source")
    )


@query(
    "filter_not_prefix",
    sql="""
    SELECT doc_id, source, lang FROM documents
    WHERE source NOT LIKE 'src1%' AND lang = 'en'
    """,
    tags=("F3", "F4"),
)
def filter_not_prefix(spark, sf_dir):
    # reference: ~repo.str.startswith("dask/") preprocess.py:224
    d = T(spark, sf_dir, "documents")
    return d.where(~F.col("source").startswith("src1") & (F.col("lang") == "en")).select(
        "doc_id", "source", "lang"
    )


@query(
    "filter_disjunction",
    sql="""
    SELECT doc_id FROM documents
    WHERE lower(text) LIKE '% spark %' OR lower(text) LIKE '% shuffle %'
    """,
    tags=("F5",),
)
def filter_disjunction(spark, sf_dir):
    # reference: " dask" in comment or " dask" in title (gha.ipynb cell 25)
    t = F.lower(F.col("text"))
    return (
        T(spark, sf_dir, "documents")
        .where(t.contains(" spark ") | t.contains(" shuffle "))
        .select("doc_id")
    )


@query(
    "filter_having",
    sql="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_cnt
    FROM orders GROUP BY o_custkey HAVING count(*) > 12
    """,
    tags=("F6", "A1"),
)
def filter_having(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_cnt"))
        .where(F.col("order_cnt") > 12)
    )


@query(
    "filter_null_safe",
    sql="""
    SELECT event_id FROM events
    WHERE props IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
      AND value > 99.5
    """,
    tags=("F7",),
)
def filter_null_safe(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return e.where(
        F.col("props").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & (F.col("value") > 99.5)
    ).select("event_id")


@query(
    "filter_range_date",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-06-01 00:00:00'
      AND o_orderstatus = 'F'
    """,
    tags=("F1", "pushdown"),
)
def filter_range_date(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-06-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderstatus") == "F")
    ).select("o_orderkey", "o_totalprice")


# --- projections / scalar functions (§2.2, §2.7) ---------------------------


@query(
    "project_subset",
    sql="SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
    tags=("P9",),
)
def project_subset(spark, sf_dir):
    # column pruning should reach the parquet scan (ReadSchema: 3 cols)
    return T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")


@query(
    "project_json_prop",
    sql="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
    """,
    tags=("P4", "json"),
)
def project_json_prop(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int").alias("k_val")
    return e.select("event_id", k).where(F.col("k_val") >= 50)


@query(
    "project_json_struct",
    sql="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) AS absent
    FROM events WHERE event_id < 1000
    """,
    tags=("P4", "json"),
)
def project_json_struct(spark, sf_dir):
    # typed JSON parse (from_json → struct field access), vs the string
    # path of get_json_object in project_json_prop. Missing fields are
    # null, not errors.
    e = T(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    parsed = F.from_json("props", "k BIGINT, missing BIGINT")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        parsed.getField("missing").alias("absent"),
    )


@query(
    "scalar_string_funcs",
    sql="""
    SELECT doc_id,
           upper(substr(text, 1, 10)) AS head10,
           CAST(length(text) AS INTEGER) AS text_len,
           concat(lang, ':', source) AS lang_source,
           replace(substr(text, 1, 20), ' ', '_') AS snaked
    FROM documents
    """,
    tags=("scalar",),
)
def scalar_string_funcs(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.length("text").alias("text_len"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.regexp_replace(F.substring("text", 1, 20), " ", "_").alias("snaked"),
    )


@query(
    "scalar_math_funcs",
    sql="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil
    FROM lineitem
    WHERE l_quantity < 5
    """,
    tags=("scalar",),
)
def scalar_math_funcs(spark, sf_dir):
    # per-row double arithmetic is IEEE-deterministic — identical in both
    # engines without decimal routing (only reductions need dsum).
    li = T(spark, sf_dir, "lineitem").where(F.col("l_quantity") < 5)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_price"),
        (disc * (1 + F.col("l_tax"))).alias("charged"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
    )


@query(
    "scalar_case_when",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_class
    FROM orders
    """,
    tags=("scalar",),
)
def scalar_case_when(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


# --- sorts / limits / top-k (§2.6) -----------------------------------------


@query(
    "sort_topk",
    sql="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
    tags=("O1", "O4"),
)
def sort_topk(spark, sf_dir):
    # Spark plans TakeOrderedAndProject — no global sort materialized.
    return (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(25)
    )


@query(
    "sort_multi_col",
    sql="""
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    """,
    tags=("O1",),
)
def sort_multi_col(spark, sf_dir):
    return (
        T(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), "s_suppkey")
    )


@query(
    "limit_deterministic",
    sql="""
    SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 100
    """,
    tags=("O3",),
)
def limit_deterministic(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .limit(100)
    )

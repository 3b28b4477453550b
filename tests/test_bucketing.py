"""Bucketed-write path: pre-shuffled tables must join without an
exchange — the 100 TB answer to repeated fact-fact joins
(io.sink.write_bucketed, ARCHITECTURE.md shuffle-minimization)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from etl_github_spark.io.sink import write_bucketed
from etl_github_spark.io.tables import load_table

from .conftest import SF_SMALL


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/warehouse'")
    try:
        li = load_table(spark, SF_SMALL, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_orderstatus")
        write_bucketed(li, "bdb.lineitem_b", ("l_orderkey",), n_buckets=8)
        write_bucketed(o, "bdb.orders_b", ("o_orderkey",), n_buckets=8)

        lb = spark.table("bdb.lineitem_b")
        ob = spark.table("bdb.orders_b").hint("merge")  # force SMJ, no broadcast
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # bucketing removed both shuffles

        # and the result is correct
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect == 6000
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_bucketed_aggregation_avoids_shuffle(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb2 LOCATION '{tmp_path}/wh2'")
    try:
        li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(li, "bdb2.li_b", ("l_orderkey",), n_buckets=8)
        agg = (
            spark.table("bdb2.li_b")
            .groupBy("l_orderkey")
            .agg(F.count("*").alias("n"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            agg.explain("formatted")
        assert "Exchange" not in buf.getvalue()
        assert agg.count() == 1473  # distinct l_orderkey at sf0.001
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdb2 CASCADE")

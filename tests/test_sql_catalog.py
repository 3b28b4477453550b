"""SQL entry point tests: catalog views + Catalyst SQL over fixtures."""

from __future__ import annotations

from etl_github_spark.sql import open_catalog, sql

from .conftest import SF_SMALL


def test_sql_over_catalog(spark):
    out = sql(
        spark,
        SF_SMALL,
        """
        SELECT c.c_mktsegment, count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1 ORDER BY n DESC, c_mktsegment
        """,
    ).collect()
    assert sum(r["n"] for r in out) == 1500
    assert len(out) >= 3


def test_catalog_registers_all_tables(spark):
    open_catalog(spark, SF_SMALL)
    views = {t.name for t in spark.catalog.listTables()}
    for t in ("lineitem", "events", "documents", "embeddings"):
        assert t in views
    assert spark.sql("SELECT count(*) AS n FROM documents").first()["n"] == 500


def test_query_views_compose_in_pure_sql(spark):
    """Operator views must register lazily and compose through SQL with
    results identical to calling the operators directly."""
    from etl_github_spark.queries import QUERIES
    from etl_github_spark.sql import open_query_views

    from .conftest import SF_SMALL

    views = open_query_views(
        spark, SF_SMALL, names=("dedup_summary", "agg_global_count", "filter_eq")
    )
    assert sorted(views) == [
        "q_agg_global_count",
        "q_dedup_summary",
        "q_filter_eq",
    ]
    direct = QUERIES["agg_global_count"].fn(spark, SF_SMALL).collect()
    via_sql = spark.sql("SELECT * FROM q_agg_global_count").collect()
    assert direct == via_sql
    # composition across two operator views
    joined = spark.sql(
        "SELECT count(*) AS n FROM q_dedup_summary d "
        "JOIN q_filter_eq f ON d.n_docs > 0"
    ).collect()
    assert joined[0]["n"] > 0

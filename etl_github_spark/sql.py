"""SQL entry point: register the lakehouse/fixture tables as views and
run ANSI SQL through Catalyst.

A user of the reference interacts through pandas-style chains; the
engine additionally exposes the full Spark SQL surface over the same
tables — ``open_catalog(spark, sf_dir)`` then ``spark.sql(...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io.tables import TABLES, load_table
from .session import tune


def open_catalog(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> SparkSession:
    """Register each fixture/lakehouse table as a temp view."""
    tune(spark)
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: open the catalog and run a SQL query."""
    return open_catalog(spark, sf_dir).sql(query)


def open_query_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> list[str]:
    """Register every library operator as a composable temp view
    ``q_<name>`` (lazy logical plans — nothing executes until queried),
    on top of the base-table catalog. This turns the operator library
    into a pure-SQL surface: ``SELECT * FROM q_dedup_summary JOIN
    q_quality_gopher_stats USING (doc_id)`` composes two operators
    through Catalyst with pushdown/pruning across the view boundary.

    Views are plans, not materializations, so registering all ~230 is
    milliseconds; Spark folds the view expansion into one optimized
    plan per consuming query. Returns the registered view names.
    """
    from .queries import QUERIES

    open_catalog(spark, sf_dir)
    registered = []
    for name, qd in QUERIES.items():
        if names is not None and name not in names:
            continue
        qd.fn(spark, sf_dir).createOrReplaceTempView(f"q_{name}")
        registered.append(f"q_{name}")
    return registered

"""Set operations (SURVEY.md §2.7 — not used by the reference but part of
the engine surface; union is implicit in the reference's multi-file reads).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import T
from .registry import query


@query(
    "set_union_all",
    sql="""
    SELECT event_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'view'
    """,
    tags=("set",),
)
def set_union_all(spark, sf_dir):
    e = T(spark, sf_dir, "events").select("event_id", "event_type")
    return e.where(F.col("event_type") == "click").unionAll(
        e.where(F.col("event_type") == "view")
    )


@query(
    "set_intersect",
    sql="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("set",),
)
def set_intersect(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select("user_id")
    b = e.where(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@query(
    "set_except",
    sql="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 400
    """,
    tags=("set",),
)
def set_except(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "view").select("user_id")
    b = e.where((F.col("event_type") == "purchase") & (F.col("value") > 400)).select(
        "user_id"
    )
    return a.subtract(b)  # EXCEPT (set semantics, distinct)

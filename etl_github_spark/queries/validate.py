"""Data-validation / expectation-suite operators.

The reference pipeline trusts its inputs (gharchive NDJSON is assumed
well-formed past the corrupt-record sidecar, `preprocess.py:148-156`);
a 100 TB lakehouse cannot — ingest gates run declarative expectation
suites (null rates, enum domains, range bounds, key uniqueness) and
referential-integrity audits before data is promoted. Both ops here are
single-pass conditional aggregates (map-side combinable, no Python),
so the validation cost is one scan regardless of how many checks run.

Every count is integer-exact → bit-identical across engines; rates are
integer permille (``1000*x div n``) per the cross-engine determinism
rule (`registry.py` module doc).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from ._util import T
from .registry import query

# (edge label, child table, fk col, parent table, pk col)
_FK_EDGES = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_orphans_sql() -> str:
    parts = []
    for label, child, fk, parent, pk in _FK_EDGES:
        parts.append(
            f"""
    SELECT '{label}' AS fk_edge,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT) AS n_orphans
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON c.{fk} = p.{pk}"""
        )
    return "\n    UNION ALL".join(parts)


@query("quality_fk_orphans", sql=_fk_orphans_sql(), tags=("quality", "validate"))
def quality_fk_orphans(spark, sf_dir):
    """Referential-integrity audit over the full star schema: for every
    FK edge, the child row count and the number of orphans (child rows
    whose key matches no parent — including NULL keys, which can never
    match). The promote-gate check a lakehouse runs before exposing a
    new snapshot: a partial parent load or a producer emitting dangling
    ids shows up here before any downstream join silently drops rows.

    Shape: ONE scan per child table regardless of how many FK edges it
    carries — lineitem's three audits chain three broadcast left joins
    onto the same scan and fold into a single conditional aggregate
    (stacked back to per-edge rows). Parent key sets are dimension-
    sized (broadcast); at 100 TB a fact-sized parent (orders for
    lineitem->orders) flips that one join to a shuffle on the key —
    exactly the partitioning its production join already needs. The
    five child scans are independent → scheduled concurrently in one
    action.
    """
    by_child: dict[str, list[tuple[str, str, str, str]]] = {}
    for label, child, fk, parent, pk in _FK_EDGES:
        by_child.setdefault(child, []).append((label, fk, parent, pk))
    out = []
    for child, edges in by_child.items():
        c = T(spark, sf_dir, child).select(*sorted({fk for _, fk, _, _ in edges}))
        for i, (_, fk, parent, pk) in enumerate(edges):
            p = (
                T(spark, sf_dir, parent)
                .select(F.col(pk).alias(fk))
                .distinct()
                .withColumn(f"_hit{i}", F.lit(1))
            )
            c = c.join(F.broadcast(p), fk, "left")
        one = c.agg(
            F.count("*").cast("long").alias("n_rows"),
            *[
                F.sum(F.col(f"_hit{i}").isNull().cast("long"))
                .cast("long")
                .alias(f"o{i}")
                for i in range(len(edges))
            ],
        )
        pairs = ", ".join(f"'{label}', o{i}" for i, (label, _, _, _) in enumerate(edges))
        out.append(
            one.select(
                F.expr(f"stack({len(edges)}, {pairs}) AS (fk_edge, n_orphans)"),
                "n_rows",
            ).select("fk_edge", "n_rows", "n_orphans")
        )
    return reduce(lambda a, b: a.unionAll(b), out)


_ENUM = ("view", "click", "purchase", "signup", "error")

# (check name, SQL predicate over events) — the Spark side builds the
# same predicates with column expressions; names must stay aligned.
_CHECKS = [
    ("null_user_id", "user_id IS NULL"),
    ("null_ts", "ts IS NULL"),
    (
        "unknown_event_type",
        "event_type IS NULL OR event_type NOT IN "
        + "(" + ", ".join(f"'{v}'" for v in _ENUM) + ")",
    ),
    ("negative_value", "value < 0"),
    ("value_above_cap", "value > 10000"),
    (
        "ts_out_of_range",
        "ts < TIMESTAMP '2024-01-01 00:00:00' OR ts >= TIMESTAMP '2026-01-01 00:00:00'",
    ),
    ("malformed_props", "props IS NULL OR props NOT LIKE '{%}'"),
]


def _expectations_sql() -> str:
    aggs = ",\n           ".join(
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i, (_, pred) in enumerate(_CHECKS)
    )
    rows = "\n    UNION ALL ".join(
        f"SELECT '{name}' AS check_name, c{i} AS n_violations, n_rows FROM a"
        for i, (name, _) in enumerate(_CHECKS)
    )
    return f"""
    WITH a AS (
      SELECT count(*) AS n_rows,
             {aggs},
             CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS cdup
      FROM events
    ),
    r AS (
      {rows}
      UNION ALL SELECT 'duplicate_event_id', cdup, n_rows FROM a
    )
    SELECT check_name, n_violations, CAST(n_rows AS BIGINT) AS n_rows,
           CAST((1000 * n_violations) // n_rows AS BIGINT) AS viol_permille
    FROM r
    """


@query("quality_expectations", sql=_expectations_sql(), tags=("quality", "validate"))
def quality_expectations(spark, sf_dir):
    """Declarative expectation suite over the events stream — the
    Great-Expectations-style ingest gate: null checks, enum-domain
    membership, numeric range bounds, timestamp sanity, payload
    well-formedness, and key uniqueness, each reported as
    (check, violations, rows, permille).

    One scan total: every per-row predicate folds into a single
    conditional aggregate (map-side combinable; whole-stage codegen),
    and the uniqueness check rides the same job as
    ``count(*) − count(DISTINCT event_id)`` — at 100 TB that distinct
    is the only shuffle, keyed on the (unique) id so it is
    skew-free by construction. Adding a check is one more column,
    not another pass.
    """
    e = T(spark, sf_dir, "events")
    aggs = [
        F.sum(F.expr(pred).cast("long")).cast("long").alias(f"c{i}")
        for i, (_, pred) in enumerate(_CHECKS)
    ]
    one = e.agg(
        F.count("*").cast("long").alias("n_rows"),
        *aggs,
        (F.count("*") - F.countDistinct("event_id")).cast("long").alias("cdup"),
    )
    pairs = ", ".join(
        f"'{name}', c{i}" for i, (name, _) in enumerate(_CHECKS)
    ) + ", 'duplicate_event_id', cdup"
    return one.select(
        F.expr(
            f"stack({len(_CHECKS) + 1}, {pairs}) AS (check_name, n_violations)"
        ),
        "n_rows",
    ).select(
        "check_name",
        "n_violations",
        "n_rows",
        F.expr("(1000 * n_violations) div n_rows").cast("long").alias("viol_permille"),
    )

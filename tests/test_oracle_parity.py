"""Differential oracle tests: every registered query vs DuckDB (SURVEY §5.1).

This mirrors the driver's CORRECTNESS gate locally so regressions are
caught before a round ends.
"""

from __future__ import annotations

import pytest

from etl_github_spark.queries.registry import QUERIES

from .conftest import SF_ORACLE
from .oracle_harness import compare

ORACLE_QUERIES = sorted(n for n, d in QUERIES.items() if d.sql is not None)
ROWS_ONLY_QUERIES = sorted(n for n, d in QUERIES.items() if d.sql is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    d = QUERIES[name]
    errors = compare(spark, SF_ORACLE, name, d.fn, d.sql)
    assert not errors, "\n".join(errors)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    d = QUERIES[name]
    df = d.fn(spark, SF_ORACLE)
    rows = df.collect()
    assert df.columns  # stable schema
    assert rows is not None


def test_driver_canon_rejects_array_output(spark):
    """The driver canonicalizer sorts cells with pandas and crashes on
    array/map/struct values (r02: text_stopword_removal,
    sim_normalize_embeddings). The local harness must reject those
    shapes the same way so the failure class is caught before a round
    ends."""
    from pyspark.sql import functions as F

    from .oracle_harness import assert_driver_sortable

    arr = spark.range(3).select("id", F.array(F.lit(1), F.lit(2)).alias("xs"))
    assert assert_driver_sortable(arr), "array column must be rejected"

    scalar = spark.range(3).select("id", F.lit("ok").alias("s"))
    assert assert_driver_sortable(scalar) == []


def test_all_registered_queries_driver_sortable(spark):
    """No registered query may return a non-scalar column — schema-only
    check (cheap: no execution) over the whole registry."""
    from .oracle_harness import assert_driver_sortable

    bad = {}
    for name, d in QUERIES.items():
        df = d.fn(spark, SF_ORACLE)
        errs = assert_driver_sortable(df)
        if errs:
            bad[name] = errs
    assert not bad, f"queries with driver-unsortable output: {bad}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert len(df.collect()) > 0

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40


def test_no_oracle_output_is_hugeint_or_decimal():
    """DuckDB sum(BIGINT) returns HUGEINT, which .df() materializes as
    float64 — the driver then hashes 305741.0 against Spark's int64
    305741 and the row goes red with rows_match/schema_match still true
    (analytics_rfm_segments r4–r6). Cheap full-registry guard: bind every
    oracle (no execution) and reject HUGEINT/DECIMAL/unsigned output
    columns; oracles must CAST aggregates back to BIGINT/DOUBLE."""
    from .oracle_harness import duck_connection, duck_type_errors

    con = duck_connection(SF_ORACLE)
    bad = []
    for name, d in QUERIES.items():
        if d.sql is not None:
            bad += duck_type_errors(con, name, d.sql)
    con.close()
    assert not bad, "\n".join(bad)


def test_rfm_driver_replica_pandas(spark):
    """Pandas-level (driver-replica) comparison for the thrice-red RFM
    query: dtypes AND values must match after the driver's
    sort-columns/sort-values canonicalization, not just as a Python
    multiset."""
    from .oracle_harness import compare_pandas

    d = QUERIES["analytics_rfm_segments"]
    errors = compare_pandas(spark, SF_ORACLE, "analytics_rfm_segments", d.fn, d.sql)
    assert not errors, "\n".join(errors)

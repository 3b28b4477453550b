"""Local replica of the driver's DuckDB-oracle diff.

Runs each registered query in Spark and its oracle SQL in DuckDB on the
same parquet tables, then compares row count, column names, and an
order-insensitive canonical value set. Stricter than a hash: mismatches
print the offending rows.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime

import duckdb

from etl_github_spark.io.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(v):
    """Canonicalize a cell for cross-engine comparison (exact: the driver
    hashes values, so we do not fuzz floats — determinism is the query
    author's job)."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (int, str, bool)):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    try:  # Decimal and friends
        return repr(v)
    except Exception:
        return str(v)


def rows_to_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def assert_driver_sortable(sdf) -> list[str]:
    """Reject result shapes the DRIVER's canonicalizer cannot handle.

    The driver canonicalizes by loading the result into pandas and
    ``sort_values``-ing over all columns; array/map/struct cells arrive
    as ndarrays/dicts/Rows, which pandas cannot factorize → the whole
    CORRECTNESS row errors out (r02: text_stopword_removal,
    sim_normalize_embeddings). Catch that class locally: every output
    column must be a scalar type.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if bad:
        return [
            "non-scalar output columns (driver canonicalizer cannot sort "
            f"array/map/struct cells): {bad}"
        ]
    return []


def compare(spark, sf_dir: str, name: str, fn, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    errors: list[str] = []
    sdf = fn(spark, sf_dir)
    shape_errors = assert_driver_sortable(sdf)
    if shape_errors:
        return [f"{name}: {e}" for e in shape_errors]
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        errors.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errors
    if len(s_rows) != len(d_rows):
        errors.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    sm = rows_to_multiset(s_cols, s_rows)
    dm = rows_to_multiset(d_cols, d_rows)
    if sm != dm:
        only_s = list((sm - dm).items())[:3]
        only_d = list((dm - sm).items())[:3]
        errors.append(f"{name}: values differ; spark-only={only_s} duck-only={only_d}")
    return errors


# --- driver-replica pandas canonicalization ------------------------------
#
# The driver does NOT use fetchall(): it loads both results into pandas
# (Spark .toPandas(), DuckDB .df()), sorts columns by name, sort_values
# over all columns, and hashes the frame. fetchall() hides a class of
# bug pandas exposes: DuckDB maps HUGEINT (the result type of
# sum(BIGINT)) to float64, so an oracle whose output column is HUGEINT
# hashes "305741.0" against Spark's int64 "305741" — rows_match and
# schema(name)_match stay true while hash_match goes red
# (analytics_rfm_segments, red r4/r5/r6, root-caused round 7).

_DUCK_NON_PORTABLE = ("HUGEINT", "UHUGEINT", "DECIMAL", "UINTEGER", "UBIGINT", "UTINYINT", "USMALLINT")


def duck_type_errors(con, name: str, sql: str) -> list[str]:
    """Flag oracle output columns whose DuckDB type does not survive the
    driver's pandas round-trip with the same dtype Spark produces."""
    rel = con.sql(sql)
    hits = [
        f"{c}:{t}"
        for c, t in zip(rel.columns, [str(t) for t in rel.types])
        if any(k in t for k in _DUCK_NON_PORTABLE)
    ]
    return [f"{name}: non-pandas-portable oracle column types {hits}"] if hits else []


def _canon_pandas_col(s):
    """Normalize a pandas column the way the driver's hasher is
    OBSERVED to (datetime-typed queries pass driver hashes with
    datetime64[ns]-vs-[us] and date-as-object differences — r5/r6
    green rows prove it canonicalizes temporals): datetime64[*] →
    datetime64[us], object columns of date/datetime → datetime64[us].
    Numeric dtype KIND differences (int64 vs float64 — the HUGEINT
    leak) are NOT normalized; they are the real red signal."""
    import pandas as pd

    if str(s.dtype).startswith("datetime64"):
        return s.astype("datetime64[us]")
    if s.dtype == object:
        non_null = s.dropna()
        if len(non_null) and all(isinstance(v, (date, datetime)) for v in non_null):
            return pd.to_datetime(s).astype("datetime64[us]")
    return s


def compare_pandas(spark, sf_dir: str, name: str, fn, sql: str) -> list[str]:
    """Replicate the driver's canonicalization: pandas frames, columns
    sorted by name, rows sorted by all columns, dtype + value equality
    (after the temporal normalization the driver demonstrably applies)."""
    errors: list[str] = []
    spdf = fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    ddf = con.sql(sql).df()
    con.close()
    cols = sorted(spdf.columns)
    if cols != sorted(ddf.columns):
        return [f"{name}: pandas columns differ {cols} vs {sorted(ddf.columns)}"]
    spdf = spdf[cols].apply(_canon_pandas_col)
    ddf = ddf[cols].apply(_canon_pandas_col)
    spdf = spdf.sort_values(cols).reset_index(drop=True)
    ddf = ddf.sort_values(cols).reset_index(drop=True)
    for c in cols:
        if str(spdf[c].dtype) != str(ddf[c].dtype):
            errors.append(
                f"{name}: pandas dtype differs on '{c}': "
                f"spark={spdf[c].dtype} duck={ddf[c].dtype}"
            )
    if not errors and not spdf.equals(ddf):
        neq = (spdf != ddf) & ~(spdf.isna() & ddf.isna())
        bad_cols = [c for c in cols if neq[c].any()]
        errors.append(f"{name}: pandas values differ in columns {bad_cols}")
    return errors

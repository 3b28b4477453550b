"""delta-spark interop probe (VERDICT r8 task 4): the from-scratch Delta
log (io/delta_log.py) follows the PUBLIC protocol spec (reader 1 /
writer 2 base; deletion vectors bump it where used), but no test had
ever opened one of its tables with the REAL Delta reader — silent
protocol drift would be invisible. This probe does exactly that when
the delta-spark package + jars are present, and skips LOUDLY otherwise
(the sandbox ships neither; reference behavior matched:
preprocess.py:165-186 — append twice, read back, check history).

What the probe pins when it runs:
  - spark.read.format("delta") opens a write_delta table and returns
    the union of both appended batches (log replay + add actions).
  - time travel (versionAsOf=0) returns only the first batch.
  - partition pruning works on the hive-style layout write_delta lays
    down (partitionColumns in metaData + dir-encoded adds).
"""

from __future__ import annotations

import pytest


def _delta_session(spark):
    """The running shared JVM must already have the delta-spark jars on
    its classpath AND the session extensions registered — neither can
    be added to a live JVM. Skip with an actionable reason otherwise."""
    pytest.importorskip(
        "delta",
        reason="delta-spark not installed in this environment; install "
        "delta-spark and launch the JVM with "
        "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension and "
        "spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog"
        ".DeltaCatalog to run the interop probe",
    )
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
    except Exception:
        pytest.skip(
            "delta python package importable but the running JVM has no "
            "delta-spark jars on its classpath (they must be present at "
            "JVM start via spark.jars.packages=io.delta:delta-spark_2.13:<v>)"
        )
    return spark


def test_real_delta_reader_opens_write_delta_table(spark, tmp_path):
    s = _delta_session(spark)
    from etl_github_spark.io.delta_log import write_delta

    table = str(tmp_path / "interop")
    df1 = s.createDataFrame([(1, "a", "2024-01-01"), (2, "b", "2024-01-02")],
                            "id long, v string, date string")
    df2 = s.createDataFrame([(3, "c", "2024-01-02")], "id long, v string, date string")
    assert write_delta(df1, table, stats_cols=("id",), partition_by=("date",)) == 0
    assert write_delta(df2, table, mode="append", stats_cols=("id",)) == 1

    got = s.read.format("delta").load(table)
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]

    v0 = s.read.format("delta").option("versionAsOf", 0).load(table)
    assert sorted(r["id"] for r in v0.collect()) == [1, 2]

    pruned = got.where("date = '2024-01-02'")
    assert sorted(r["id"] for r in pruned.collect()) == [2, 3]


def test_write_delta_protocol_versions_match_spec_claim(spark, tmp_path):
    """Runs everywhere (no delta needed): the protocol action written at
    version 0 must claim exactly the (1, 2) base the module documents —
    the contract the real-reader probe above would validate. A drift
    here (e.g. writing features the claimed writer version can't carry)
    is the failure mode the interop probe exists to catch."""
    import json

    from etl_github_spark.io.delta_log import write_delta

    table = str(tmp_path / "proto")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    write_delta(df, table, stats_cols=("id",))
    with open(f"{table}/_delta_log/00000000000000000000.json") as fh:
        actions = [json.loads(l) for l in fh if l.strip()]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert json.loads(meta["schemaString"])["type"] == "struct"

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


def test_checkpoint_parquet_shape_matches_spec_claim(spark, tmp_path):
    """Always-run checkpoint pin (no delta-spark needed): the parquet
    checkpoint is the file a REAL reader would replay from after
    cleanup_log drops the JSON prefix, so its shape is load-bearing
    even though the sandbox can't run that reader. Pins the spec
    claims the module documents: one row per live action; exactly one
    protocol row and one metaData row; nested add rows carrying
    path/partitionValues/size/dataChange=false; a _last_checkpoint
    pointer whose `size` equals the row count; schemaString parses as
    a struct; partition columns survive the round-trip."""
    import json

    import pyarrow.parquet as pq

    from etl_github_spark.io.delta_log import checkpoint_delta, write_delta

    table = str(tmp_path / "cpshape")
    df1 = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")],
        "id long, v string, date string",
    )
    df2 = spark.createDataFrame([(3, "c", "2024-01-02")],
                                "id long, v string, date string")
    write_delta(df1, table, stats_cols=("id",), partition_by=("date",))
    write_delta(df2, table, mode="append", stats_cols=("id",))
    v = checkpoint_delta(table)
    assert v == 1

    cp = pq.read_table(f"{table}/_delta_log/{v:020d}.checkpoint.parquet")
    assert set(cp.column_names) == {"protocol", "metaData", "add"}
    rows = cp.to_pylist()
    protos = [r["protocol"] for r in rows if r["protocol"]]
    metas = [r["metaData"] for r in rows if r["metaData"]]
    adds = [r["add"] for r in rows if r["add"]]
    assert len(protos) == 1 and protos[0] == {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }
    assert len(metas) == 1
    assert json.loads(metas[0]["schemaString"])["type"] == "struct"
    assert list(metas[0]["partitionColumns"]) == ["date"]
    assert adds, "checkpoint carries no add actions"
    for a in adds:
        assert a["path"] and a["size"] > 0
        assert a["dataChange"] is False  # checkpoint adds never re-deliver
        assert "date" in dict(a["partitionValues"])

    with open(f"{table}/_delta_log/_last_checkpoint") as fh:
        ptr = json.load(fh)
    assert ptr["version"] == v
    assert ptr["size"] == len(rows)


def test_change_feed_readback_from_fresh_session(spark, tmp_path):
    """Always-run change-feed pin: a SECOND SparkSession (fresh session
    state — its own conf/catalog, the closest a single test JVM gets
    to an independent reader) consumes the change feed of a table some
    OTHER session wrote, across an OPTIMIZE rewrite. The feed must
    deliver exactly the appended rows with their commit versions and
    skip the dataChange=false compaction commit — the double-count a
    naive add-action consumer hits."""
    from etl_github_spark.io.delta_log import (
        delta_changes,
        optimize_delta,
        write_delta,
    )

    table = str(tmp_path / "cdf2")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1),
        table,
        mode="append",
        stats_cols=("id",),
    )
    write_delta(
        spark.createDataFrame([(3, "c")], "id long, v string").coalesce(1),
        table,
        mode="append",
        stats_cols=("id",),
    )
    out = optimize_delta(spark, table, target_bytes=1 << 30)
    assert out["version"] == 2
    write_delta(
        spark.createDataFrame([(4, "d")], "id long, v string").coalesce(1),
        table,
        mode="append",
        stats_cols=("id",),
    )

    reader = spark.newSession()
    feed = delta_changes(reader, table, from_version=0)
    got = sorted((r["id"], r["_commit_version"]) for r in feed.collect())
    assert got == [(3, 1), (4, 3)]  # version-2 OPTIMIZE adds skipped

    from etl_github_spark.io.delta_log import read_delta

    snap = read_delta(reader, table)
    assert sorted(r["id"] for r in snap.collect()) == [1, 2, 3, 4]

"""Lakehouse-machinery exercises as oracle-checked queries.

The storage layer (versioned manifests, incremental views) is pytest-
verified where DuckDB can't express the behavior — but its OUTPUTS are
plain deterministic aggregates, so these queries run a full write →
maintain → read cycle in a scratch dir and return results an oracle
can recompute straight from the fixture tables. That puts the
transactional/time-travel/merge-refresh contracts under the driver's
hash-compare, not just local tests.

Scratch state goes under a per-(sf_dir, query) temp directory that is
rebuilt from scratch each call — queries stay pure functions of the
fixture data.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ._util import T, fxp
from .registry import query


def _scratch(name: str) -> str:
    d = tempfile.mkdtemp(prefix=f"lake_{name}_")
    shutil.rmtree(d, ignore_errors=True)
    return d


@query(
    "lake_versioned_timetravel",
    sql="""
    SELECT 1 AS version,
           CAST(count(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT) AS n_rows
    FROM events
    UNION ALL
    SELECT 2 AS version, CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    """,
    tags=("lake", "versioned"),
)
def lake_versioned_timetravel(spark, sf_dir):
    """Transactional append + time travel, driver-checked end to end:
    commit the even-id half of events as table version 1, append the
    odd-id half as version 2, then read BOTH versions back through the
    manifest layer. The returned (version, n_rows) pairs must equal
    what the oracle derives from the fixture alone — so a broken
    commit, a torn manifest, or a time-travel read that leaks the other
    version's files all fail the hash compare.
    """
    from ..io.versioned import vread, vwrite

    e = T(spark, sf_dir, "events").select("event_id")
    path = _scratch("vtt")
    vwrite(e.where(F.col("event_id") % 2 == 0), path)
    vwrite(e.where(F.col("event_id") % 2 == 1), path, mode="append")
    rows = [(1, vread(spark, path, 1).count()), (2, vread(spark, path, 2).count())]
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, "version int, n_rows long")


@query(
    "lake_matview_refresh",
    sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY event_type
    """,
    tags=("lake", "matview"),
)
def lake_matview_refresh(spark, sf_dir):
    """Incremental view maintenance, driver-checked end to end: land
    events in two date-partition batches, merge-refresh the per-type
    (count, sum) view after EACH append, and return the final view —
    which must hash-equal a direct aggregate over the fixture. The
    second refresh scans only the second batch (asserted here), so a
    refresh that silently re-reads or misses history diverges from the
    oracle. Money sums ride as exact integer cents (the engine-portable
    fixed-point rule).
    """
    from ..io.matview import read_view, refresh_view
    from ..io.sink import write_table

    e = T(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_id") % 2 == 0, "b0").otherwise("b1").alias("batch"),
    )
    table, view = _scratch("mv_t"), _scratch("mv_v")
    write_table(e.where(F.col("batch") == "b0"), table, partition_by=("batch",))
    refresh_view(spark, table, view, ["event_type"], ["cents"])
    write_table(e.where(F.col("batch") == "b1"), table, partition_by=("batch",))
    r = refresh_view(spark, table, view, ["event_type"], ["cents"])
    assert r["scanned"] == ["batch=b1"], r  # incrementality is part of the contract
    out = read_view(spark, view).select(
        "event_type",
        F.col("cnt"),
        F.col("sum_cents").alias("sum_cents"),
    )
    rows = [(r2["event_type"], r2["cnt"], r2["sum_cents"]) for r2 in out.collect()]
    shutil.rmtree(table, ignore_errors=True)
    shutil.rmtree(view, ignore_errors=True)
    return spark.createDataFrame(rows, "event_type string, cnt long, sum_cents long")


@query(
    "lake_merge_upsert",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(value * 100) AS BIGINT)
                    + CASE WHEN event_id % 5 = 0 THEN 100 ELSE 0 END)
                AS BIGINT) AS sum_cents
    FROM events GROUP BY event_type
    """,
    tags=("lake", "merge"),
)
def lake_merge_upsert(spark, sf_dir):
    """Copy-on-write MERGE (upsert), driver-checked end to end: land 90%
    of events as the base table (ids with ``id % 10 != 0``), then merge
    an update batch of every ``id % 5 == 0`` row with cents bumped by
    100 — which both REPLACES existing keys and INSERTS the held-out
    ``id % 10 == 0`` keys in one operation. The read-back per-type
    (count, sum) must equal the oracle's closed form over the fixture
    (all rows present; +100 exactly on the %5 keys), so superseded rows
    surviving, double-inserts, or updates dropped by the dynamic
    partition overwrite all diverge from the hash.

    The merge itself (`io/sink.py::merge_table`) rewrites only the
    partitions the update batch touches — O(|affected partitions|),
    the Delta ``MERGE INTO`` contract on the Parquet layout.
    """
    from ..io.sink import merge_table, write_table

    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    path = _scratch("merge")
    write_table(
        e.where(F.col("event_id") % 10 != 0), path, partition_by=("event_type",)
    )
    updates = e.where(F.col("event_id") % 5 == 0).select(
        "event_id", "event_type", (F.col("cents") + 100).alias("cents")
    )
    merge_table(spark, path, updates, ("event_id",), partition_col="event_type")
    out = (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    rows = [(r["event_type"], r["n_rows"], r["sum_cents"]) for r in out.collect()]
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, "event_type string, n_rows long, sum_cents long")


@query(
    "lake_schema_evolution",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE event_id % 2 = 1) AS BIGINT) AS n_with_cents,
           CAST(sum(CASE WHEN event_id % 2 = 1
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_cents
    FROM events GROUP BY event_type
    """,
    tags=("lake", "schema-evolution"),
)
def lake_schema_evolution(spark, sf_dir):
    """Schema evolution under the driver hash: land the even-id half of
    events with the ORIGINAL schema (event_id, event_type), append the
    odd-id half with an ADDED cents column, then read the table with
    schema merging — old files surface NULL cents, new files real
    values, and the per-type rollup must equal the oracle's closed form
    (all rows present; cents summed over exactly the odd half). A
    reader pinned to either file schema, or an append that rewrote old
    files, diverges.

    The merged read is `io/sink.py::read_table_evolved` (Parquet
    mergeSchema) — the additive-column contract every long-lived
    lakehouse table needs; the footer-sampling cost of mergeSchema is
    why production tables checkpoint their schema in the manifest
    instead (documented there).
    """
    from ..io.sink import read_table_evolved, write_table

    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    path = _scratch("sev")
    write_table(
        e.where(F.col("event_id") % 2 == 0).select("event_id", "event_type"),
        path,
        partition_by=("event_type",),
    )
    write_table(
        e.where(F.col("event_id") % 2 == 1),
        path,
        partition_by=("event_type",),
        mode="append",
    )
    out = (
        read_table_evolved(spark, path)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("cents").isNotNull().cast("long"))
            .cast("long")
            .alias("n_with_cents"),
            F.sum(F.coalesce(F.col("cents"), F.lit(0))).cast("long").alias("sum_cents"),
        )
    )
    rows = [
        (r["event_type"], r["n_rows"], r["n_with_cents"], r["sum_cents"])
        for r in out.collect()
    ]
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n_rows long, n_with_cents long, sum_cents long"
    )


@query(
    "lake_scd2_history",
    sql="""
    SELECT c_mktsegment AS segment, CAST(0 AS INTEGER) AS is_current,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM customer WHERE c_custkey % 7 = 0
    GROUP BY c_mktsegment
    UNION ALL
    SELECT CASE WHEN c_custkey % 7 = 0 THEN 'PROMO' ELSE c_mktsegment END AS segment,
           CAST(1 AS INTEGER) AS is_current,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM customer
    GROUP BY CASE WHEN c_custkey % 7 = 0 THEN 'PROMO' ELSE c_mktsegment END
    """,
    tags=("lake", "scd2"),
)
def lake_scd2_history(spark, sf_dir):
    """Slowly-Changing-Dimension Type 2 under the driver hash: load the
    customer dimension as version 0, apply an update batch that (a)
    moves every 7th key to a new segment and (b) RE-SENDS the existing
    segment for every 11th key, then roll up the versioned table by
    (segment, currency). The oracle's closed form encodes the SCD2
    contract: changed keys carry a closed row with the OLD value plus a
    current row with the NEW one; re-sent-unchanged keys add NOTHING
    (the no-op rule that keeps idempotent producers from bloating
    history); everyone else keeps a single current row.

    The apply itself is `io/sink.py::scd2_apply` — close + insert in
    one pass, update batch broadcast, dimension-sized rewrite.
    """
    from ..io.sink import scd2_apply, write_table

    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    path = _scratch("scd2")
    v0 = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    write_table(v0, path, mode="overwrite", partition_by=())
    changed = c.where(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("k"), F.lit("PROMO").alias("segment")
    )
    noop = c.where((F.col("c_custkey") % 11 == 0) & (F.col("c_custkey") % 7 != 0)).select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("segment")
    )
    scd2_apply(spark, path, changed.unionByName(noop), "k", ("segment",), version=1)
    out = (
        spark.read.parquet(path)
        .groupBy("segment", "is_current")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    rows = [(r["segment"], r["is_current"], r["n_rows"]) for r in out.collect()]
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, "segment string, is_current int, n_rows long")


@query(
    "lake_write_observed",
    sql="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM events
    """,
    tags=("lake", "observability"),
)
def lake_write_observed(spark, sf_dir):
    """Write-time metrics via ``DataFrame.observe``: the ingest job
    lands the batch AND reports its row count / value sum / high-water
    mark from the SAME pass — the accounting every production sink
    needs (reconciliation counts, freshness watermarks, billing sums)
    without the second scan a separate ``count()`` costs. At 100 TB
    that second scan is real money; ``observe`` attaches the aggregates
    to the write job itself, so the metrics are exactly what the
    committed files contain — not a re-read that could race a
    concurrent append.

    The observed metrics must hash-equal the oracle's direct aggregate
    over the fixture: a write that dropped or duplicated rows shows up
    as a metric mismatch — observability as a correctness check.
    """
    from pyspark.sql import Observation

    e = T(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    obs = Observation("ingest")
    path = _scratch("obs")
    (
        e.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.max("event_id").alias("max_event_id"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )
    m = obs.get
    shutil.rmtree(path, ignore_errors=True)
    # an empty batch observes (0, None, None) — keep the NULLs so the
    # result matches the oracle's aggregate row instead of crashing
    def _i(v):
        return None if v is None else int(v)

    return spark.createDataFrame(
        [(int(m["n_rows"]), _i(m["sum_cents"]), _i(m["max_event_id"]))],
        "n_rows long, sum_cents long, max_event_id long",
    )


@query(
    "lake_cdc_apply",
    sql="""
    WITH final AS (
      SELECT CASE WHEN c_custkey % 15 = 0 THEN 'MOVED' ELSE c_mktsegment END AS segment,
             CAST(round(c_acctbal * 100) AS BIGINT)
               + CASE WHEN c_custkey % 5 = 0 THEN 100 ELSE 0 END AS cents
      FROM customer WHERE c_custkey % 7 <> 0
    )
    SELECT segment, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM final GROUP BY segment
    """,
    tags=("lake", "cdc"),
)
def lake_cdc_apply(spark, sf_dir):
    """Exactly-once CDC apply under the driver hash — the batch twin of
    `streaming/cdc.py::stream_cdc_apply` (the streaming path is pytest-
    only by nature; this encodes the same semantics in an oracle's
    closed form, the way `lake_scd2_history` does for the SCD2 sink).

    Bootstrap the customer dimension from an insert batch, then apply
    one Debezium-shaped change batch that exercises every hard case at
    once: intra-batch op ordering (every 5th key gets TWO updates,
    seq 1 then seq 2 — only the final +100-cents value may survive),
    PARTITION-MOVING updates (every 15th key changes segment to
    'MOVED', so its old partition must lose the stale copy),
    tombstones (every 7th key deleted — delete seq outranks the
    updates, so keys hit by both vanish), and absent-key deletes
    (negative keys — must be a no-op). The same batch is then applied
    AGAIN: crash-redelivery must leave the table byte-identical, so
    the oracle's closed form (survivors = k%7≠0, +100 cents on k%5=0,
    segment MOVED on k%15=0) only matches if the collapse, the
    key-wide supersede, and the idempotent merge all hold.

    Scale shape: the apply is partition-pruned copy-on-write
    (`io/sink.py::merge_table`/`delete_rows`); the change batch
    broadcasts; the rewrite touches only partitions holding changed
    keys. At 100 TB the batch:table ratio is what the COW path is
    built for — this query just compresses bootstrap+mutate+redeliver
    into one verifiable cycle.
    """
    from ..streaming.cdc import apply_cdc_batch

    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        fxp("c_acctbal").alias("cents"),
    )
    path = _scratch("cdc")

    def batch(op, seq, df):
        return df.select(
            F.lit(op).alias("op"), F.lit(seq).cast("long").alias("seq"),
            "k", "segment", "cents",
        )

    try:
        apply_cdc_batch(batch("I", 0, c), path, ("k",), "segment")
        upd1 = batch("U", 1, c.where(F.col("k") % 5 == 0).withColumn(
            "cents", F.col("cents") + 50))  # superseded intermediate
        upd2 = batch("U", 2, c.where(F.col("k") % 5 == 0).select(
            "k",
            F.when(F.col("k") % 15 == 0, F.lit("MOVED"))
            .otherwise(F.col("segment")).alias("segment"),
            (F.col("cents") + 100).alias("cents"),
        ))
        dels = batch("D", 3, c.where(F.col("k") % 7 == 0))
        absent = batch("D", 3, spark.createDataFrame(
            [(-1, None, None), (-2, None, None)], "k long, segment string, cents long"
        ))
        change = upd1.unionByName(upd2).unionByName(dels).unionByName(absent)
        apply_cdc_batch(change, path, ("k",), "segment")
        apply_cdc_batch(change, path, ("k",), "segment")  # crash redelivery
        out = (
            spark.read.parquet(path)
            .groupBy("segment")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
        )
        rows = [(r["segment"], r["n_rows"], r["sum_cents"]) for r in out.collect()]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, "segment string, n_rows long, sum_cents long")


@query(
    "lake_compact_roundtrip",
    sql="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS date,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events GROUP BY 1
    """,
    tags=("lake", "compaction"),
)
def lake_compact_roundtrip(spark, sf_dir):
    """Small-file compaction under the driver hash (S7 — the reference's
    OPTIMIZE/compact after every ingest batch): land the events table
    with a deliberate small-file storm in every date partition (one
    5-way keyed repartition write — partitionBy fans each task into
    every date dir; see the inline note), run `compact_table` (per-date
    coalesced rewrite via the crash-safe rename-aside swap) plus
    `vacuum_table`, and read the result back.
    The oracle is the plain per-date rollup of the source — compaction
    is a LAYOUT operation, so any lost, duplicated, or reshuffled row
    flips the hash. The file-count contract (fewer, larger files) stays
    pinned by tests/test_lakehouse.py; this query pins the part that
    matters at 100 TB only if it's exact: content preservation.

    Scale shape: the rewrite is per-date partition-pruned and
    parallelizes across dates; read-back is an ordinary pruned scan.
    """
    from ..io.sink import compact_table, read_table, vacuum_table, write_table

    e = T(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_trunc("day", "ts").cast("date").alias("date")
    )
    path = _scratch("compact")
    try:
        # small-file storm per date, produced by ONE 5-way keyed
        # repartition write (partitionBy fans each task into every date
        # dir → task×date small files) instead of five separate
        # filtered appends — one scan of events instead of five
        # sequential single-task jobs (3.0 -> 0.8 s of the entry). The
        # storm is the FIXTURE here, not the method under test: the
        # table content is identical as a multiset whatever the file
        # boundaries, and append-commit semantics stay pinned by
        # tests/test_lakehouse.py and T5.
        write_table(e.repartition(5, F.pmod(F.col("event_id"), F.lit(5))), path)
        compact_table(spark, path, max_records_per_file=1_000_000)
        vacuum_table(path)
        out = (
            read_table(spark, path)
            .groupBy("date")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
                F.sum("event_id").cast("long").alias("sum_event_id"),
            )
        )
        rows = [tuple(r) for r in out.collect()]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "date date, n_rows long, n_users long, sum_event_id long"
    )


@query(
    "join_bucketed_colocated",
    sql="""
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("lake", "join", "bucketing"),
)
def join_bucketed_colocated(spark, sf_dir):
    """Shuffle-free fact-fact join via BUCKETED tables under the driver
    hash: lineitem and orders are written `bucketBy(8, key)` into a
    scratch database (`io/sink.py::write_bucketed` — one up-front
    shuffle each at write time), then joined WITHOUT any Exchange (the
    merge hint forbids broadcast, and matching bucket specs satisfy
    both children's distribution requirements; pinned by
    `tests/test_bucketing.py`). The oracle is the plain join closed
    form — bucketing is an execution strategy, so any bucket-routing
    error (wrong hash, wrong bucket count, rows landing in the wrong
    bucket and silently vanishing from the merge join) flips the hash.

    This is THE 100 TB pattern for repeated fact-fact joins: pay the
    shuffle once at ingest, then every downstream join/aggregation on
    the bucket key is exchange-free. Revenue goes through exact cents
    so the rollup is order-insensitive.
    """
    import uuid as _uuid  # db name must be unique per concurrent run

    from ..io.sink import write_bucketed

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", fxp("l_extendedprice").alias("cents")
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    db = f"bjoin_{_uuid.uuid4().hex[:8]}"
    path = _scratch("bjoin")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{path}'")
    try:
        write_bucketed(li, f"{db}.li_b", ("l_orderkey",), n_buckets=8)
        write_bucketed(o, f"{db}.o_b", ("o_orderkey",), n_buckets=8)
        lb = spark.table(f"{db}.li_b")
        ob = spark.table(f"{db}.o_b").hint("merge")
        out = (
            lb.join(ob, lb.l_orderkey == ob.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("long").alias("n_lines"),
                F.sum("cents").cast("long").alias("revenue_cents"),
            )
        )
        rows = [tuple(r) for r in out.collect()]
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "o_orderstatus string, n_lines long, revenue_cents long"
    )


@query(
    "lake_delta_log_scan",
    sql="""
    SELECT 0 AS version, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           CAST(max(event_id) AS BIGINT) AS hwm_event_id
    FROM events WHERE event_id % 3 = 0
    UNION ALL
    SELECT 1, CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT),
           CAST(max(event_id) AS BIGINT)
    FROM events WHERE event_id % 3 IN (0, 1)
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT),
           CAST(max(event_id) AS BIGINT)
    FROM events WHERE event_id % 3 = 2
    """,
    tags=("lake", "delta", "timetravel"),
)
def lake_delta_log_scan(spark, sf_dir):
    """The Delta transaction log under the driver hash
    (`io/delta_log.py` — the from-scratch implementation of the public
    protocol's append/overwrite/replay subset; reference
    preprocess.py:169-186): commit the events fact in three versions
    (append thirds 0 and 1, then OVERWRITE with third 2), then answer
    each version by TIME TRAVEL — count + sum from the snapshot scan,
    and the high-water mark from add-action STATS alone (no data file
    opened), the reference's get_add_actions trick. The oracle's three
    closed forms only match if the log replay shows exactly the right
    files at every version: a leaked pre-overwrite file, a lost append,
    or a stale stats entry each flips a different row.

    Scale shape: commits are O(new files) JSON appends; snapshot replay
    is O(log actions) driver-side (bounded by file count, the same
    cardinality every Delta reader carries); scans read only the files
    the log names.
    """
    from ..io.delta_log import high_water_mark, read_delta, write_delta

    e = T(spark, sf_dir, "events").select("event_id", "user_id")
    path = _scratch("delta")
    try:
        write_delta(e.where(F.col("event_id") % 3 == 0), path, stats_cols=("event_id",))
        write_delta(
            e.where(F.col("event_id") % 3 == 1),
            path,
            mode="append",
            stats_cols=("event_id",),
        )
        write_delta(
            e.where(F.col("event_id") % 3 == 2),
            path,
            mode="overwrite",
            stats_cols=("event_id",),
        )
        rows = []
        for v in (0, 1, 2):
            snap = read_delta(spark, path, version=v)
            agg = snap.agg(
                F.count("*").cast("long").alias("n"),
                F.sum("event_id").cast("long").alias("s"),
            ).first()
            hwm = high_water_mark(path, "event_id", v)
            if hwm is None:  # stats unavailable: the documented scan fallback
                hwm = snap.agg(F.max("event_id")).first()[0]
            rows.append((v, agg["n"], agg["s"], int(hwm)))
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "version int, n_rows long, sum_event_id long, hwm_event_id long"
    )


@query(
    "lake_delta_partitioned",
    sql="""
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM (SELECT CAST(ts AS DATE) AS day, event_id FROM events)
    WHERE day IN (DATE '2024-01-07', DATE '2024-01-21')
    GROUP BY day
    """,
    tags=("lake", "delta", "partitioned"),
)
def lake_delta_partitioned(spark, sf_dir):
    """Date-PARTITIONED Delta log under the driver hash — the
    reference's actual table layout (preprocess.py:169-175,
    ``partition_by="date"``; r5 verdict's top format-parity gap): write
    events hive-partitioned by day in two commits (even event_ids, then
    append odds — the append must inherit the recorded layout), then
    DESTROY every data file of one unrelated day (2024-01-15) and
    answer two single-day aggregates through ``partition_filter``
    scans. The oracle recomputes both days straight from the fixture —
    so the row hashes only match if (a) partitionValues routed every
    row to its true day across both commits, and (b) pruning is LOG-
    driven: if the filtered scan listed or opened the clobbered
    partition's files, the query dies and the driver row errs.

    Scale shape: the reference's hourly-append pattern at 100 TB is
    exactly this — partition pruning must come from the transaction
    log's partitionValues (O(live files) driver-side metadata), never
    from listing a bucket; the scan then touches only the named day's
    files. Day derivation is UTC-pinned (session.tune), matching
    DuckDB's naive-timestamp cast.
    """
    from ..io.delta_log import read_delta, snapshot_files, write_delta

    e = T(spark, sf_dir, "events").select(
        "event_id", F.to_date("ts").alias("day")
    )
    path = _scratch("delta_part")
    try:
        write_delta(
            e.where(F.col("event_id") % 2 == 0),
            path,
            stats_cols=("event_id",),
            partition_by=("day",),
        )
        write_delta(
            e.where(F.col("event_id") % 2 == 1),
            path,
            mode="append",
            stats_cols=("event_id",),
        )
        # clobber an unrelated partition: pruned scans must never see it
        import os

        for f in snapshot_files(path, partition_filter={"day": "2024-01-15"}):
            with open(os.path.join(path, f), "wb") as fh:
                fh.write(b"corrupt")
        rows = []
        for day in ("2024-01-07", "2024-01-21"):
            agg = (
                read_delta(spark, path, partition_filter={"day": day})
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("event_id").cast("long").alias("s"),
                )
                .first()
            )
            rows.append((day, agg["n"], agg["s"]))
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, "day string, n_rows long, sum_event_id long")


@query(
    "lake_delta_checkpoint",
    sql="""
    SELECT 3 AS version, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events WHERE event_id % 6 IN (0, 1, 2, 3)
    UNION ALL
    SELECT 5, CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT)
    FROM events
    """,
    tags=("lake", "delta", "checkpoint"),
)
def lake_delta_checkpoint(spark, sf_dir):
    """Delta checkpoint + log cleanup under the driver hash (the r5
    verdict's second scoped-out protocol piece): commit events in six
    appends (event_id mod 6), write a parquet checkpoint at version 3,
    CLEANUP the JSON prefix (versions 0–3 deleted), then answer
    version-3 and latest snapshots — both must now replay through the
    checkpoint (+ JSON tail for v5). The oracle's two closed forms only
    match if the checkpoint carried the exact v3 live set and metaData
    forward: a dropped add action, a stale path, or a tail version
    skipped after the checkpoint each flips a row. The reference's own
    backfill is 9,504 hourly commits (gha.ipynb:19-29) — checkpoints
    are what keep that log's replay O(live files + tail), not
    O(all commits).

    Scale shape: checkpoint write is one O(live files) parquet dump of
    driver-side metadata; replay afterwards reads 1 parquet + the JSON
    tail. Data-file I/O is untouched — the same scan manifests either
    way (asserted here by answering v3 AFTER the prefix is gone).
    """
    from ..io.delta_log import (
        checkpoint_delta,
        cleanup_log,
        read_delta,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select("event_id")
    path = _scratch("delta_ckpt")
    try:
        for i in range(6):
            write_delta(
                e.where(F.col("event_id") % 6 == i),
                path,
                mode="append",
                stats_cols=("event_id",),
            )
        assert checkpoint_delta(path, version=3) == 3
        removed = cleanup_log(path)
        assert len(removed) == 4, removed  # versions 0..3 JSON gone
        rows = []
        for v in (3, 5):
            agg = read_delta(spark, path, version=v).agg(
                F.count("*").cast("long").alias("n"),
                F.sum("event_id").cast("long").alias("s"),
            ).first()
            rows.append((v, agg["n"], agg["s"]))
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "version int, n_rows long, sum_event_id long"
    )


@query(
    "lake_delta_stats_skip",
    sql="""
    WITH mx AS (SELECT max(event_id) AS m FROM events),
         rng AS (SELECT m // 2 AS lo, m // 2 + (m // 4) // 2 AS hi FROM mx)
    SELECT CAST(4 AS INT) AS n_files_total,
           CAST(3 AS INT) AS n_files_pruned,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(e.event_id), 0) AS BIGINT) AS sum_event_id
    FROM events e, rng
    WHERE e.event_id >= rng.lo AND e.event_id <= rng.hi
    """,
    tags=("lake", "delta", "stats", "skipping"),
)
def lake_delta_stats_skip(spark, sf_dir):
    """Min/max DATA SKIPPING off the Delta log's add-action stats,
    driver-checked end to end (reference preprocess.py:181-186 reads
    add-action stats; this is the read-side use real Delta makes of
    them): commit events as four contiguous event_id slices (one file
    each, stats_cols=event_id), DESTROY the three files whose recorded
    ranges lie outside the queried range, then answer a range
    aggregate through ``stats_filter``. The oracle recomputes the
    range straight from the fixture — so the hash only matches if (a)
    zone-map pruning dropped exactly the three provably-irrelevant
    files (the clobbered bytes would kill the scan otherwise), and (b)
    the surviving file still had the actual predicate re-applied (it
    contains out-of-range rows the skip contract leaves to the
    caller's ``.where``).

    Scale shape: at 100 TB a range/point query on a sorted-write
    column must become O(matching files) from log metadata alone —
    pruning decisions are a driver-side fold over add actions (O(live
    files), the same metadata replay every snapshot already does),
    with zero object-store reads for skipped files. Each predicate is
    also pushed into the surviving parquet scan (Catalyst min/max row-
    group pruning composes below the file-level skip).
    """
    import os

    from ..io.delta_log import read_delta, snapshot_files, write_delta

    e = T(spark, sf_dir, "events").select("event_id")
    m = e.agg(F.max("event_id")).first()[0]  # scalar: slice boundaries
    qtr = m // 4
    bounds = [0, qtr, 2 * qtr, 3 * qtr, m + 1]  # 4 contiguous slices
    lo, hi = m // 2, m // 2 + qtr // 2  # inside slice 3 only
    path = _scratch("delta_skip")
    try:
        for i in range(4):
            write_delta(
                e.where(
                    (F.col("event_id") >= bounds[i])
                    & (F.col("event_id") < bounds[i + 1])
                ).coalesce(1),
                path,
                mode="append",
                stats_cols=("event_id",),
            )
        preds = [("event_id", ">=", lo), ("event_id", "<=", hi)]
        kept = snapshot_files(path, stats_filter=preds)
        pruned = sorted(set(snapshot_files(path)) - set(kept))
        # clobber every pruned file: if the filtered scan lists or opens
        # any of them, the query dies and the driver row errs
        for f in pruned:
            with open(os.path.join(path, f), "wb") as fh:
                fh.write(b"corrupt")
        agg = (
            read_delta(spark, path, stats_filter=preds)
            .where((F.col("event_id") >= lo) & (F.col("event_id") <= hi))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.coalesce(F.sum("event_id"), F.lit(0)).cast("long").alias("s"),
            )
            .first()
        )
        rows = [(len(kept) + len(pruned), len(pruned), agg["n"], agg["s"])]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "n_files_total int, n_files_pruned int, n_rows long, sum_event_id long"
    )


@query(
    "lake_delta_evolution",
    sql="""
    SELECT 0 AS version,
           CAST(count(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS n_typed
    FROM events
    UNION ALL
    SELECT 1,
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE event_id % 2 = 1) AS BIGINT)
    FROM events
    """,
    tags=("lake", "delta", "schema-evolution"),
)
def lake_delta_evolution(spark, sf_dir):
    """ADDITIVE schema evolution on the Delta log under the driver
    hash (real Delta's mergeSchema): commit the even-id half of events
    as (event_id), then merge-append the odd half WIDENED with an
    event_type column — the commit carries a fresh metaData action.
    The query reads BOTH versions back: time travel to v0 must apply
    the pre-evolution schema (no type column exists there), and the
    latest snapshot must fill the new column with nulls for the
    pre-evolution files — ``n_typed`` counts non-null types, so a
    reader that resolved the wrong metaData version, dropped the old
    files' rows, or guessed values instead of nulls flips the hash.

    Scale shape: evolution is a metadata-only commit — zero data files
    rewritten however large the table is; the version-aware schema
    lookup scans retained JSON newest-first and stops at the evolution
    commit (checkpoints carry the as-of schema once the prefix is
    cleaned).
    """
    from ..io.delta_log import read_delta, write_delta

    e = T(spark, sf_dir, "events").select("event_id", "event_type")
    path = _scratch("delta_evo")
    try:
        write_delta(e.where(F.col("event_id") % 2 == 0).select("event_id"), path)
        write_delta(
            e.where(F.col("event_id") % 2 == 1), path, merge_schema=True
        )
        rows = []
        v0 = read_delta(spark, path, version=0)
        assert v0.columns == ["event_id"], v0.columns  # pre-evolution schema
        rows.append((0, v0.count(), 0))
        v1 = read_delta(spark, path, version=1)
        agg = v1.agg(
            F.count("*").cast("long").alias("n"),
            F.count("event_type").cast("long").alias("t"),
        ).first()
        rows.append((1, agg["n"], agg["t"]))
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, "version int, n_rows long, n_typed long")


@query(
    "lake_delta_optimize",
    sql="""
    WITH d AS (
      -- filter on the ALIAS in an outer scope: DuckDB 1.0 rewrites an
      -- inline CAST(ts AS DATE) IN (DATE ...) to a timestamp compare
      -- that matches nothing
      SELECT * FROM (SELECT CAST(ts AS DATE) AS day, event_id FROM events)
      WHERE day IN (DATE '2024-01-07', DATE '2024-01-21')
    ),
    per_day AS (
      SELECT day,
             CAST(count(DISTINCT event_id % 4) AS INT) AS nb,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(event_id) AS BIGINT) AS sum_event_id
      FROM d GROUP BY day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           nb AS n_files_before,
           CASE WHEN nb >= 2 THEN 1 ELSE nb END AS n_files_after,
           n_rows, sum_event_id
    FROM per_day
    """,
    tags=("lake", "delta", "optimize", "compaction"),
)
def lake_delta_optimize(spark, sf_dir):
    """Delta OPTIMIZE (bin-packing compaction) under the driver hash —
    the reference runs it as routine maintenance (preprocess.py:199-206
    ``optimize.compact()`` + vacuum): commit events in four appends
    partitioned by day (each day accumulates 4 small files — the
    hourly-append small-file pathology in miniature), OPTIMIZE with a
    large target, and answer per-day (file-count before/after, row
    count, id sum) through partition-filtered scans of the compacted
    snapshot. The oracle recomputes everything from the fixture: the
    before-count is the number of id-mod-4 classes present that day,
    the after-count must collapse to 1, and the aggregates only hash
    equal if the rewrite lost and invented no rows. A cross-partition
    merge, a dropped row, or a file left uncompacted flips the row.

    Scale shape: OPTIMIZE planning is a driver-side fold over add
    actions (O(live files) metadata, no listing); each bin rewrite
    reads and writes only its own bytes; the swap commits atomically
    with ``dataChange: false`` so downstream incremental readers skip
    it. At the reference's 9,504-commit backfill this is what keeps
    scan task counts proportional to data, not to commit count.
    """
    from ..io.delta_log import (
        optimize_delta,
        read_delta,
        snapshot_files,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select(
        "event_id", F.to_date("ts").alias("day")
    )
    days = ("2024-01-07", "2024-01-21")
    path = _scratch("delta_opt")
    try:
        for i in range(4):
            write_delta(
                e.where(F.col("event_id") % 4 == i).coalesce(1),
                path,
                mode="append",
                stats_cols=("event_id",),
                partition_by=("day",) if i == 0 else (),
            )
        before = {
            d: len(snapshot_files(path, partition_filter={"day": d}))
            for d in days
        }
        optimize_delta(spark, path, target_bytes=1 << 30)
        rows = []
        for d in days:
            after = len(snapshot_files(path, partition_filter={"day": d}))
            agg = (
                read_delta(spark, path, partition_filter={"day": d})
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("event_id").cast("long").alias("s"),
                )
                .first()
            )
            rows.append((d, before[d], after, agg["n"], agg["s"]))
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "day string, n_files_before int, n_files_after int, "
        "n_rows long, sum_event_id long",
    )


@query(
    "lake_delta_change_feed",
    sql="""
    SELECT 1 AS commit_version,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events WHERE event_id % 3 = 1
    UNION ALL
    SELECT 3,
           CAST(count(*) AS BIGINT),
           CAST(sum(event_id) AS BIGINT)
    FROM events WHERE event_id % 3 = 2
    """,
    tags=("lake", "delta", "change-feed", "incremental"),
)
def lake_delta_change_feed(spark, sf_dir):
    """Incremental change-feed consumption off the Delta log, under
    the driver hash: append events in three id-mod slices (versions
    0–1), OPTIMIZE (version 2 — rewrites every earlier file with
    ``dataChange: false``), append the last slice (version 3), then
    read the changes SINCE version 0. The feed must deliver exactly
    the version-1 and version-3 rows: the OPTIMIZE commit rewrote all
    of versions 0–1's rows into new files, so a consumer that trusts
    add-actions without honoring the dataChange flag re-delivers the
    whole early table as "new" at version 2 — the classic compaction
    double-count, and an extra output row here (rows mismatch). The
    oracle states the two slices' closed forms with their commit
    versions.

    Scale shape: incremental processing cost is O(new data) — the plan
    walks only the range's JSON commits driver-side and reads only
    the files they added; table size and compaction history are
    invisible. This is the log-native replacement for the reference's
    high-water-mark + re-scan pattern (incremental.py): the log names
    the new rows exactly, no timestamp column needed.
    """
    from ..io.delta_log import delta_changes, optimize_delta, write_delta

    e = T(spark, sf_dir, "events").select("event_id")
    path = _scratch("delta_cdf")
    try:
        write_delta(e.where(F.col("event_id") % 3 == 0).coalesce(1), path,
                    mode="append", stats_cols=("event_id",))
        write_delta(e.where(F.col("event_id") % 3 == 1).coalesce(1), path,
                    mode="append", stats_cols=("event_id",))
        out = optimize_delta(spark, path, target_bytes=1 << 30)
        assert out["version"] == 2, out  # the rewrite commit exists
        write_delta(e.where(F.col("event_id") % 3 == 2).coalesce(1), path,
                    mode="append", stats_cols=("event_id",))
        feed = (
            delta_changes(spark, path, from_version=0)
            .groupBy(F.col("_commit_version").cast("int").alias("commit_version"))
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("event_id").cast("long").alias("sum_event_id"),
            )
        )
        rows = [tuple(r) for r in feed.collect()]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "commit_version int, n_rows long, sum_event_id long"
    )


def _morton_sql(col_a: str, col_b: str, bits: int = 21) -> str:
    """DuckDB replica of io/sink.py::zorder_key for two columns: bit b
    of col j lands at position b*2+j (j=0 for ``col_a``). Disjoint bit
    positions make the OR a plain sum."""
    terms = []
    for b in range(bits):
        # fully parenthesized: SQL's + binds TIGHTER than <<, so a bare
        # `x << 2 + y << 3` would parse as `x << (2 + y) << 3`
        terms.append(f"((({col_a} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({col_b} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


@query(
    "lake_delta_zorder_skip",
    sql=f"""
    WITH bounds AS (
      SELECT max(user_id) AS mu, max(event_id) AS me FROM events
    ),
    box AS (
      SELECT mu // 4 AS lo_u, mu // 2 AS hi_u,
             me // 4 AS lo_e, me // 2 AS hi_e
      FROM bounds
    ),
    r AS (
      SELECT user_id, event_id,
             row_number() OVER (
               ORDER BY {_morton_sql('user_id', 'event_id')}, event_id
             ) AS rn,
             count(*) OVER () AS n
      FROM events
    ),
    s AS (
      SELECT ((rn - 1) * 8) // n AS zfile,
             min(user_id) AS min_u, max(user_id) AS max_u,
             min(event_id) AS min_e, max(event_id) AS max_e
      FROM r GROUP BY 1
    )
    SELECT CAST(8 AS INT) AS n_files,
           (SELECT CAST(count(*) AS INT) FROM s, box
            WHERE max_u >= lo_u AND min_u <= hi_u
              AND max_e >= lo_e AND min_e <= hi_e) AS n_files_kept,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(e.event_id), 0) AS BIGINT) AS sum_event_id
    FROM events e, box
    WHERE e.user_id BETWEEN lo_u AND hi_u
      AND e.event_id BETWEEN lo_e AND hi_e
    """,
    tags=("lake", "delta", "zorder", "skipping"),
)
def lake_delta_zorder_skip(spark, sf_dir):
    """OPTIMIZE ZORDER BY under the driver hash: land events in one
    Delta commit, re-cluster into 8 rank-balanced files by the Morton
    interleave of (user_id, event_id), then answer a two-dimensional
    box query through ``stats_filter`` — with every file the stats
    provably exclude CLOBBERED first, so the scan dies if log-driven
    skipping lists even one of them. The oracle recomputes the entire
    layout symbolically: the same bit-interleave, the same exact rank
    split into 8 files, each file's min/max on both columns, and which
    files a correct zone-map check must keep — plus the box aggregate
    itself. A different interleave, an off-by-one in the rank split,
    stats recorded from the wrong column, or pruning that drops a
    needed file (the aggregate loses rows) all flip the hash.

    Why z-order: a single-key sort gives perfect skipping on that key
    and none on the second; the interleave bounds BOTH dimensions per
    file, so one layout serves both access paths — the property that
    matters when re-clustering 100 TB is a once-a-quarter job serving
    every reader. The exact-rank split (vs repartitionByRange's
    sampled boundaries) is what makes the layout reproducible enough
    to be oracle-checked; the sampled variant is the throughput path
    (io/sink.py::write_table_zordered).
    """
    import os

    from ..io.delta_log import (
        read_delta,
        snapshot_files,
        write_delta,
        zorder_delta,
    )

    e = T(spark, sf_dir, "events").select("event_id", "user_id")
    m = e.agg(F.max("user_id"), F.max("event_id")).first()
    lo_u, hi_u = m[0] // 4, m[0] // 2
    lo_e, hi_e = m[1] // 4, m[1] // 2
    path = _scratch("delta_zorder")
    try:
        write_delta(e.coalesce(1), path, mode="append")
        out = zorder_delta(
            spark, path, ("user_id", "event_id"), n_files=8,
            tiebreak="event_id",
        )
        assert out["files"] == 8, out
        preds = [
            ("user_id", ">=", lo_u), ("user_id", "<=", hi_u),
            ("event_id", ">=", lo_e), ("event_id", "<=", hi_e),
        ]
        kept = snapshot_files(path, stats_filter=preds)
        for f in sorted(set(snapshot_files(path)) - set(kept)):
            with open(os.path.join(path, f), "wb") as fh:
                fh.write(b"corrupt")  # a listed pruned file kills the scan
        agg = (
            read_delta(spark, path, stats_filter=preds)
            .where(
                F.col("user_id").between(lo_u, hi_u)
                & F.col("event_id").between(lo_e, hi_e)
            )
            .agg(
                F.count("*").cast("long").alias("n"),
                F.coalesce(F.sum("event_id"), F.lit(0)).cast("long").alias("s"),
            )
            .first()
        )
        rows = [(8, len(kept), agg["n"], agg["s"])]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "n_files int, n_files_kept int, n_rows long, sum_event_id long"
    )


@query(
    "lake_matview_delta_feed",
    sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY event_type
    """,
    tags=("lake", "matview", "delta", "incremental"),
)
def lake_matview_delta_feed(spark, sf_dir):
    """Incremental view maintenance driven by the Delta CHANGE FEED,
    driver-checked end to end: append the even-id half of events to a
    Delta table and refresh the per-type (count, cents-sum) view, then
    OPTIMIZE the table (rewriting every file), append the odd half, and
    refresh again. The second refresh consumes only the feed since the
    first one — which must deliver the odd half ONCE and the OPTIMIZE
    commit's rewritten files NEVER. A partition-listing refresher would
    re-aggregate the compacted copy of the first batch here (the
    double-count this variant exists to prevent) and the final view —
    hashed against a one-shot aggregate over the fixture — would be
    exactly one batch too heavy.

    Scale shape: each refresh costs O(new rows + |view|); the log names
    the new rows, so neither table size nor compaction history is ever
    re-scanned. Money rides as exact integer cents.
    """
    from ..io.delta_log import optimize_delta, write_delta
    from ..io.matview import read_view, refresh_view_delta

    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    table, view = _scratch("mvd_t"), _scratch("mvd_v")
    try:
        write_delta(e.where(F.col("event_id") % 2 == 0).repartition(2), table)
        refresh_view_delta(spark, table, view, ["event_type"], ["cents"])
        assert optimize_delta(spark, table, target_bytes=1 << 30)["version"] == 1
        write_delta(
            e.where(F.col("event_id") % 2 == 1).repartition(2), table,
            mode="append",
        )
        r = refresh_view_delta(spark, table, view, ["event_type"], ["cents"])
        assert (r["from"], r["to"]) == (0, 2), r  # consumed ONLY the feed
        out = read_view(spark, view).select(
            "event_type", "cnt", F.col("sum_cents").alias("sum_cents")
        )
        rows = [(x["event_type"], x["cnt"], x["sum_cents"]) for x in out.collect()]
    finally:
        shutil.rmtree(table, ignore_errors=True)
        shutil.rmtree(view, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, cnt long, sum_cents long"
    )


@query(
    "lake_delta_delete_dv",
    sql="""
    SELECT 'latest' AS snapshot, event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events WHERE event_type <> 'click' GROUP BY event_type
    UNION ALL
    SELECT 'v0', event_type,
           CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT)
    FROM events GROUP BY event_type
    """,
    tags=("lake", "delta", "delete", "deletion-vector"),
)
def lake_delta_delete_dv(spark, sf_dir):
    """Merge-on-read DELETE via deletion vectors under the driver
    hash: land events in one Delta commit, delete every click row with
    ``delete_delta_dv`` — which records per-file (file, row_index)
    sidecars and REWRITES NO DATA FILE (asserted in-query: every data
    file's byte size is unchanged) — then answer per-type rollups from
    the latest snapshot (clicks must be invisible) AND from version 0
    (clicks must all still be there, read from the same untouched
    bytes). The oracle recomputes both snapshots from the fixture; a
    read that ignores the vector, drops a non-matching row, or a
    delete that physically rewrote files (breaking time travel) flips
    the hash or the in-query assertion.

    Scale shape: the delete is O(matching rows) — one pushdown-
    filtered scan plus distributed sidecar writes — however large the
    table; this is the GDPR-erasure shape (delete one user from a
    petabyte without rewriting it). Reads pay one anti-join keyed
    (file, row_index) on DV'd files only; `materialize_deletes` is the
    offline purge that folds vectors back into clean files.
    """
    import os

    from ..io.delta_log import (
        _replay,
        delete_delta_dv,
        read_delta,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select("event_id", "event_type")
    path = _scratch("delta_dv")
    try:
        write_delta(e.repartition(4), path, stats_cols=("event_id",))
        sizes_before = {
            p: os.path.getsize(os.path.join(path, p)) for p in _replay(path)
        }
        out = delete_delta_dv(spark, path, "event_type = 'click'")
        assert out["version"] == 1 and out["deleted_rows"] > 0, out
        sizes_after = {
            p: os.path.getsize(os.path.join(path, p))
            for p in _replay(path)
        }
        assert sizes_after == sizes_before, "DV delete must not rewrite data"
        rows = []
        for label, v in (("latest", None), ("v0", 0)):
            snap = (
                read_delta(spark, path, version=v)
                .groupBy("event_type")
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("event_id").cast("long").alias("s"),
                )
            )
            rows.extend((label, r["event_type"], r["n"], r["s"]) for r in snap.collect())
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "snapshot string, event_type string, n_rows long, sum_event_id long"
    )


@query(
    "lake_delta_merge",
    sql="""
    WITH cents AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    mx AS (SELECT max(event_id) AS m FROM events),
    latest AS (
      SELECT event_type, c FROM cents WHERE event_id % 7 <> 0
      UNION ALL
      SELECT 'adjusted', c + 1000 FROM cents WHERE event_id % 7 = 0
      UNION ALL
      SELECT 'synthetic', CAST(m + s AS BIGINT) FROM mx, generate_series(1, 50) AS t(s)
    ),
    v0 AS (SELECT event_type, c FROM cents)
    SELECT 'latest' AS snapshot, event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(c) AS BIGINT) AS sum_cents
    FROM latest GROUP BY event_type
    UNION ALL
    SELECT 'v0', event_type,
           CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT)
    FROM v0 GROUP BY event_type
    """,
    tags=("lake", "delta", "merge", "deletion-vector"),
)
def lake_delta_merge(spark, sf_dir):
    """MERGE INTO with merge-on-read DVs under the driver hash — the
    hourly CDC upsert every lakehouse runs: land events as one Delta
    commit, then merge a source of UPDATES (every ``event_id % 7 = 0``
    re-typed 'adjusted' with cents bumped +1000) plus 50 brand-new
    'synthetic' rows keyed past max(event_id). ``merge_delta_dv``
    DV-deletes the matched rows in place — asserted in-query: NO data
    file's byte size changes — and appends replacements + inserts in
    the same commit. Rollups from the latest snapshot AND from v0
    (time travel below the merge) are both hashed against a closed-form
    oracle that recomputes the post-merge table from the fixture; a
    resurrection through the vector, a lost insert, a double-applied
    update, or a physically rewritten file flips the hash or the
    in-query assertions.

    Scale shape: merge cost is O(source + matching rows) — one
    row-metadata target scan joined once against the source (AQE picks
    the join strategy), distributed sidecar writes, one appended file
    set. A petabyte table upserts an hourly slice without rewriting
    anything; `materialize_deletes` is the offline purge.
    """
    import os

    from ..io.delta_log import (
        _replay,
        merge_delta_dv,
        read_delta,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    path = _scratch("delta_merge")
    try:
        write_delta(e.repartition(4), path, stats_cols=("event_id",))
        sizes_before = {
            p: os.path.getsize(os.path.join(path, p)) for p in _replay(path)
        }
        mx = e.agg(F.max("event_id").alias("m"))
        updates = e.where("event_id % 7 = 0").select(
            "event_id",
            F.lit("adjusted").alias("event_type"),
            (F.col("c") + 1000).alias("c"),
        )
        inserts = (
            spark.range(1, 51)
            .crossJoin(F.broadcast(mx))
            .select(
                (F.col("m") + F.col("id")).alias("event_id"),
                F.lit("synthetic").alias("event_type"),
                (F.col("m") + F.col("id")).alias("c"),
            )
        )
        out = merge_delta_dv(
            spark, path, updates.unionByName(inserts), on=("event_id",)
        )
        assert out["version"] == 1 and out["inserted"] == 50, out
        sizes_after = {
            p: os.path.getsize(os.path.join(path, p))
            for p in sizes_before
        }
        assert sizes_after == sizes_before, "DV merge must not rewrite data"
        rows = []
        for label, v in (("latest", None), ("v0", 0)):
            snap = (
                read_delta(spark, path, version=v)
                .groupBy("event_type")
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("c").cast("long").alias("s"),
                )
            )
            rows.extend(
                (label, r["event_type"], r["n"], r["s"]) for r in snap.collect()
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "snapshot string, event_type string, n_rows long, sum_cents long"
    )


@query(
    "lake_delta_restore",
    sql="""
    SELECT 'latest' AS snapshot, event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'v1', event_type,
           CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT)
    FROM events WHERE event_type <> 'click' GROUP BY event_type
    """,
    tags=("lake", "delta", "restore", "time-travel"),
)
def lake_delta_restore(spark, sf_dir):
    """RESTORE TABLE ... TO VERSION AS OF under the driver hash — the
    bad-write undo: land events (v0), DV-delete every click (v1), then
    ``restore_delta`` back to v0 as a NEW commit (v2) that re-adds the
    files' PRE-DV add entries — O(metadata), no data copied, history
    append-only (asserted in-query: three commits, the restore is v2).
    The latest snapshot must equal v0 exactly (clicks are back —
    restored THROUGH the vector reversion, not by rewriting), while
    time travel to v1 still shows the deleted state. The oracle
    recomputes both snapshots from the fixture; a restore that loses
    the DV reversion, drops a file, or rewrites instead of re-adding
    flips the hash or the assertions.

    Scale shape: restore is a metadata diff of two snapshots —
    O(|files changed since|) driver-side work and one commit, however
    large the table; vacuumed files fail loudly before committing.
    """
    from ..io.delta_log import (
        delete_delta_dv,
        history,
        read_delta,
        restore_delta,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select("event_id", "event_type")
    path = _scratch("delta_restore")
    try:
        write_delta(e.repartition(4), path, stats_cols=("event_id",))
        out_del = delete_delta_dv(spark, path, "event_type = 'click'")
        assert out_del["version"] == 1, out_del
        out = restore_delta(path, 0)
        assert out["version"] == 2 and out["removed_files"] == 0, out
        assert [h["version"] for h in history(path)] == [0, 1, 2]
        rows = []
        for label, v in (("latest", None), ("v1", 1)):
            snap = (
                read_delta(spark, path, version=v)
                .groupBy("event_type")
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("event_id").cast("long").alias("s"),
                )
            )
            rows.extend(
                (label, r["event_type"], r["n"], r["s"]) for r in snap.collect()
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "snapshot string, event_type string, n_rows long, sum_event_id long"
    )


@query(
    "lake_delta_clone",
    sql="""
    WITH mx AS (SELECT max(event_id) AS m FROM events)
    SELECT 'src' AS snapshot, event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'clone', event_type,
           CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT)
    FROM (
      SELECT event_id, event_type FROM events WHERE event_type <> 'click'
      UNION ALL
      SELECT CAST(m + s AS BIGINT), 'synthetic'
      FROM mx, generate_series(1, 50) AS t(s)
    ) GROUP BY event_type
    """,
    tags=("lake", "delta", "clone", "zero-copy"),
)
def lake_delta_clone(spark, sf_dir):
    """SHALLOW CLONE under the driver hash — the zero-copy dev-table
    fork: land events as a Delta table, `clone_delta` it (asserted
    in-query: the clone holds ZERO data files — its v0 log just points
    at the source's bytes), then diverge the clone destructively
    (DV-delete every click, append 50 synthetic rows) and hash BOTH
    tables' rollups. The source must still read its original content
    from byte-identical files (mtimes asserted) — a clone that leaks a
    write back, shares a sidecar, or deep-copies instead of
    referencing flips an assertion or the hash.

    Scale shape: the clone is O(|files|) driver-side metadata and one
    commit — a petabyte fork in milliseconds; divergence costs only
    what the clone writes (copy-on-write into the clone's root).
    """
    import glob as _glob
    import os

    from ..io.delta_log import (
        clone_delta,
        delete_delta_dv,
        read_delta,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select("event_id", "event_type")
    root = _scratch("delta_clone")
    src, dst = os.path.join(root, "src"), os.path.join(root, "dst")
    try:
        write_delta(e.repartition(4), src, stats_cols=("event_id",))
        src_state = {
            f: os.path.getmtime(f)
            for f in _glob.glob(os.path.join(src, "*.parquet"))
        }
        clone_delta(src, dst)
        assert not _glob.glob(os.path.join(dst, "part-*.parquet")), (
            "shallow clone must copy no data files"
        )
        delete_delta_dv(spark, dst, "event_type = 'click'")
        mx = e.agg(F.max("event_id").alias("m"))
        synth = (
            spark.range(1, 51)
            .crossJoin(F.broadcast(mx))
            .select(
                (F.col("m") + F.col("id")).alias("event_id"),
                F.lit("synthetic").alias("event_type"),
            )
        )
        write_delta(synth, dst)
        assert {
            f: os.path.getmtime(f) for f in src_state
        } == src_state, "clone divergence must not touch source files"
        rows = []
        for label, table in (("src", src), ("clone", dst)):
            snap = (
                read_delta(spark, table)
                .groupBy("event_type")
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("event_id").cast("long").alias("s"),
                )
            )
            rows.extend(
                (label, r["event_type"], r["n"], r["s"]) for r in snap.collect()
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "snapshot string, event_type string, n_rows long, sum_event_id long"
    )


@query(
    "lake_delta_constraints",
    sql="""
    WITH cents AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    mx AS (SELECT max(event_id) AS m FROM events),
    final AS (
      SELECT event_type, c FROM cents
      UNION ALL
      SELECT 'audited', CAST(m + s AS BIGINT)
      FROM mx, generate_series(1, 50) AS t(s)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(c) AS BIGINT) AS sum_cents
    FROM final GROUP BY event_type
    """,
    tags=("lake", "delta", "constraints", "quality"),
)
def lake_delta_constraints(spark, sf_dir):
    """CHECK-constraint enforcement under the driver hash — the
    write-time data-quality gate: land events as a Delta table, ALTER
    in two constraints (non-negative cents, non-null type), then prove
    the gate holds — a violating append MUST raise and commit NOTHING
    (version pinned in-query), a conforming append lands, and the
    final rollup hashes against the closed form of exactly
    fixture + conforming rows. A gate that half-commits, lets the bad
    batch through, or rejects the good one flips an assertion or the
    hash.

    Scale shape: enforcement costs one OR-combined filter with a
    limit(1) short-circuit over the WRITE's rows only — the table is
    never re-scanned; ADD CONSTRAINT validates existing data with one
    pushdown-friendly scan.
    """
    from ..io.delta_log import (
        _latest_version,
        add_constraint,
        read_delta,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    path = _scratch("delta_ck")
    try:
        write_delta(e.repartition(4), path, stats_cols=("event_id",))
        add_constraint(spark, path, "c_nonneg", "c >= 0")
        add_constraint(spark, path, "typed", "event_type IS NOT NULL")
        v_before = _latest_version(path)
        mx = e.agg(F.max("event_id").alias("m"))
        bad = (
            spark.range(1, 3)
            .crossJoin(F.broadcast(mx))
            .select(
                (F.col("m") + F.col("id")).alias("event_id"),
                F.lit("audited").alias("event_type"),
                F.lit(-1).cast("long").alias("c"),
            )
        )
        try:
            write_delta(bad, path)
            raise AssertionError("violating append must raise")
        except ValueError as exc:
            assert "c_nonneg" in str(exc)
        assert _latest_version(path) == v_before, "half-committed bad batch"
        good = (
            spark.range(1, 51)
            .crossJoin(F.broadcast(mx))
            .select(
                (F.col("m") + F.col("id")).alias("event_id"),
                F.lit("audited").alias("event_type"),
                (F.col("m") + F.col("id")).alias("c"),
            )
        )
        write_delta(good, path)
        out = (
            read_delta(spark, path)
            .groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("c").cast("long").alias("sum_cents"),
            )
        )
        rows = [tuple(r) for r in out.collect()]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n_rows long, sum_cents long"
    )


@query(
    "lake_delta_column_mapping",
    sql="""
    WITH cents AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    mx AS (SELECT max(event_id) AS m FROM events),
    final AS (
      SELECT event_type, c FROM cents
      UNION ALL
      SELECT 'renamed', CAST(m + s AS BIGINT)
      FROM mx, generate_series(1, 50) AS t(s)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(c) AS BIGINT) AS sum_cents
    FROM final GROUP BY event_type
    """,
    tags=("lake", "delta", "column-mapping", "rename"),
)
def lake_delta_column_mapping(spark, sf_dir):
    """Column mapping under the driver hash — rename and drop WITHOUT
    rewriting a byte: land events (with a disposable user_id column),
    upgrade to mapping mode 'name', RENAME the cents column and DROP
    the disposable one — both metaData-only commits, asserted in-query
    by data-file mtime stability — then append new rows under the NEW
    logical name and hash the full rollup. Time travel below the
    rename must still present the OLD logical schema (asserted). A
    mapping that rewrites files, loses the physical binding (rows
    read as null), or leaks the dropped column flips an assertion or
    the hash.

    Scale shape: rename/drop are O(1) metaData commits at any table
    size — the operation every schema-migration-on-a-petabyte needs;
    reads pay only a select-alias; stats stay keyed by physical name
    so data skipping survives renames.
    """
    import glob as _glob
    import os

    from ..io.delta_log import (
        drop_column,
        enable_column_mapping,
        read_delta,
        rename_column,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
        "user_id",
    )
    path = _scratch("delta_cm")
    try:
        write_delta(e.repartition(4), path, stats_cols=("event_id",))
        enable_column_mapping(path)
        files = {
            f: os.path.getmtime(f)
            for f in _glob.glob(os.path.join(path, "part-*.parquet"))
        }
        rename_column(path, "c", "cents")
        drop_column(path, "user_id")
        assert {
            f: os.path.getmtime(f) for f in files
        } == files, "rename/drop must not rewrite data files"
        assert read_delta(spark, path, version=0).columns == [
            "event_id", "event_type", "c", "user_id",
        ], "time travel below the rename must keep the old logical schema"
        mx = e.agg(F.max("event_id").alias("m"))
        synth = (
            spark.range(1, 51)
            .crossJoin(F.broadcast(mx))
            .select(
                (F.col("m") + F.col("id")).alias("event_id"),
                F.lit("renamed").alias("event_type"),
                (F.col("m") + F.col("id")).alias("cents"),
            )
        )
        write_delta(synth, path, stats_cols=("event_id",))
        out = (
            read_delta(spark, path)
            .groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
        )
        rows = [tuple(r) for r in out.collect()]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n_rows long, sum_cents long"
    )


@query(
    "lake_delta_generated",
    sql="""
    WITH cents AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
    ),
    mx AS (SELECT max(event_id) AS m FROM events),
    final AS (
      SELECT event_type, c FROM cents
      UNION ALL
      SELECT 'derived', CAST((m + s) * 100 AS BIGINT)
      FROM mx, generate_series(1, 50) AS t(s)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(c) AS BIGINT) AS sum_cents
    FROM final GROUP BY event_type
    """,
    tags=("lake", "delta", "generated-columns"),
)
def lake_delta_generated(spark, sf_dir):
    """GENERATED columns under the driver hash — the schema-level
    derived-column contract (Delta's generationExpression, writer
    version 4): land events with a cents column, DECLARE it generated
    from ``round(value * 100)`` (existing rows validated first), then
    append 50 rows WITHOUT the column — the WRITER computes it — and
    prove a divergent explicit value is refused with nothing committed
    (version pinned in-query). The rollup hashes fixture + computed
    rows against the closed form; a writer that skips the computation,
    mis-evaluates the expression, or lets a divergent value through
    flips the hash or an assertion.

    Scale shape: computation is one map-side withColumn on the write's
    rows; verification of provided values is an OR-combined limit(1)
    filter over the write only. The table is never re-scanned except
    at declaration time (one pushdown-friendly pass).
    """
    from ..io.delta_log import (
        _latest_version,
        read_delta,
        set_generated_column,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    path = _scratch("delta_gen")
    try:
        write_delta(e.repartition(4), path, stats_cols=("event_id",))
        set_generated_column(
            spark, path, "cents", "CAST(round(value * 100) AS BIGINT)"
        )
        v_before = _latest_version(path)
        mx = e.agg(F.max("event_id").alias("m"))
        bad = (
            spark.range(1, 2)
            .crossJoin(F.broadcast(mx))
            .select(
                (F.col("m") + F.col("id")).alias("event_id"),
                F.lit("derived").alias("event_type"),
                (F.col("m") + F.col("id")).cast("double").alias("value"),
                F.lit(1).cast("long").alias("cents"),  # divergent on purpose
            )
        )
        try:
            write_delta(bad, path)
            raise AssertionError("divergent generated value must raise")
        except ValueError as exc:
            assert "cents" in str(exc)
        assert _latest_version(path) == v_before, "half-committed bad batch"
        good = (
            spark.range(1, 51)
            .crossJoin(F.broadcast(mx))
            .select(
                (F.col("m") + F.col("id")).alias("event_id"),
                F.lit("derived").alias("event_type"),
                (F.col("m") + F.col("id")).cast("double").alias("value"),
            )  # no cents column: the WRITER computes it
        )
        write_delta(good, path)
        out = (
            read_delta(spark, path)
            .groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
        )
        rows = [tuple(r) for r in out.collect()]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n_rows long, sum_cents long"
    )


@query(
    "lake_delta_commit_history",
    sql="""
    SELECT 0 AS version, 'WRITE' AS operation,
           CAST(1 AS BIGINT) AS n_files_added,
           CAST(0 AS BIGINT) AS n_files_removed,
           (SELECT CAST(count(*) AS BIGINT) FROM events
            WHERE event_id % 3 = 0) AS n_rows
    UNION ALL
    SELECT 1, 'WRITE', 1, 0,
           (SELECT CAST(count(*) AS BIGINT) FROM events
            WHERE event_id % 3 IN (0, 1))
    UNION ALL
    SELECT 2, 'OPTIMIZE', 1, 2,
           (SELECT CAST(count(*) AS BIGINT) FROM events
            WHERE event_id % 3 IN (0, 1))
    UNION ALL
    SELECT 3, 'WRITE', 1, 1,
           (SELECT CAST(count(*) AS BIGINT) FROM events
            WHERE event_id % 3 = 2)
    """,
    tags=("lake", "delta", "audit"),
)
def lake_delta_commit_history(spark, sf_dir):
    """DESCRIBE HISTORY under the driver hash — the table-lifecycle
    audit surface (`io/delta_log.py::history`): run a 4-commit life
    (create, append, OPTIMIZE, overwrite — each staged as exactly one
    file so action counts are layout-deterministic) and emit, per
    version, the commitInfo operation, the add/remove ACTION counts
    read from the raw log, and the snapshot row count at that version.
    The oracle states the whole ledger as closed forms over the
    fixture, so every row pins a different contract: a missing
    commitInfo flips an operation cell, OPTIMIZE must swap exactly
    remove-2/add-1 while leaving the row count UNCHANGED (dataChange:
    false), and the overwrite must remove precisely the one compacted
    file the log currently names.

    Scale shape: `history` is a driver-side walk of the JSON tail —
    O(log actions), the same cardinality every Delta reader already
    carries; the only corpus-sized work is the three staged writes and
    per-version snapshot counts.
    """
    from ..io.delta_log import history, optimize_delta, read_delta, write_delta

    e = T(spark, sf_dir, "events").select("event_id", "user_id")
    path = _scratch("dhist")
    try:
        write_delta(e.where(F.col("event_id") % 3 == 0).coalesce(1), path)
        write_delta(
            e.where(F.col("event_id") % 3 == 1).coalesce(1), path, mode="append"
        )
        optimize_delta(spark, path)
        write_delta(
            e.where(F.col("event_id") % 3 == 2).coalesce(1), path, mode="overwrite"
        )
        counts = {
            v: read_delta(spark, path, version=v).count() for v in (0, 1, 2, 3)
        }
        rows = [
            (h["version"], h["operation"], h["adds"], h["removes"], counts[h["version"]])
            for h in history(path)
        ]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "version int, operation string, n_files_added long, "
        "n_files_removed long, n_rows long",
    )


@query(
    "lake_delta_snapshot_diff",
    sql="""
    SELECT 'v0_v1' AS diff, 'insert' AS change_op,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events WHERE event_id % 4 = 1
    UNION ALL
    SELECT 'v1_v3', 'insert',
           CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT)
    FROM events WHERE event_id % 4 = 2
    UNION ALL
    SELECT 'v1_v3', 'delete',
           CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT)
    FROM events WHERE event_id % 4 = 0
    """,
    tags=("lake", "delta", "change-feed", "incremental"),
)
def lake_delta_snapshot_diff(spark, sf_dir):
    """Version-pair CDC via ``snapshot_diff`` under the driver hash —
    the total row-level diff that works across the commits
    `delta_changes` refuses: append two id-mod slices (v0, v1),
    OPTIMIZE (v2 — rewrites every file, dataChange:false), then
    OVERWRITE with an overlapping slice (v3).

    diff(v0→v1) is a pure append: the carried v0 file has the same
    path in both manifests and is never opened (file-level skip —
    pytest corrupts the carried file and the diff still answers), so
    only the inserted slice appears. diff(v1→v3) crosses both the
    OPTIMIZE and the overwrite: the surviving slice's rows moved files
    TWICE, and the multiset EXCEPT must cancel them row-for-row,
    leaving exactly the overwritten-away slice as deletes and the new
    slice as inserts. A diff that trusted file identity alone would
    report the whole table churned; one that trusted dataChange flags
    would refuse the overwrite. The oracle states all three closed
    forms.

    Scale shape: O(changed files) reads + one shuffle for the EXCEPT;
    carried-file skipping means a 100 TB table whose daily delta
    touches 0.1% of files diffs at 0.1% cost.
    """
    from ..io.delta_log import optimize_delta, snapshot_diff, write_delta

    e = T(spark, sf_dir, "events").select("event_id")
    path = _scratch("delta_snapdiff")
    try:
        write_delta(
            e.where(F.col("event_id") % 4 == 0).coalesce(1), path,
            mode="append", stats_cols=("event_id",),
        )
        write_delta(
            e.where(F.col("event_id") % 4 == 1).coalesce(1), path,
            mode="append", stats_cols=("event_id",),
        )
        out = optimize_delta(spark, path, target_bytes=1 << 30)
        assert out["version"] == 2, out
        write_delta(
            e.where((F.col("event_id") % 4).isin(1, 2)).coalesce(1), path,
            mode="overwrite", stats_cols=("event_id",),
        )
        rows = []
        for lbl, fv, tv in (("v0_v1", 0, 1), ("v1_v3", 1, 3)):
            d = (
                snapshot_diff(spark, path, fv, tv)
                .groupBy(F.col("_change_type").alias("change_op"))
                .agg(
                    F.count("*").cast("long").alias("n_rows"),
                    F.sum("event_id").cast("long").alias("sum_event_id"),
                )
            )
            rows += [(lbl, r[0], r[1], r[2]) for r in d.collect()]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "diff string, change_op string, n_rows long, sum_event_id long"
    )


@query(
    "lake_delta_append_only",
    sql="""
    SELECT 'while_guarded' AS phase,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id
    FROM events WHERE event_id % 3 < 2
    UNION ALL
    SELECT 'after_unset',
           CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT)
    FROM events WHERE event_id % 3 = 2
    UNION ALL
    SELECT 'refused_ops', 3, 0
    """,
    tags=("lake", "delta", "properties", "governance"),
)
def lake_delta_append_only(spark, sf_dir):
    """``delta.appendOnly`` enforcement under the driver hash — the
    ingest-ledger guard rail: land a slice, SET TBLPROPERTIES
    appendOnly=true, and prove the protocol rule — appends still land,
    but overwrite, DV DELETE, and RESTORE are each refused WITHOUT
    committing (version pinned in-query after every refusal), while
    OPTIMIZE (dataChange:false, layout-only) stays legal on the
    guarded table. Unsetting the property re-enables overwrite, whose
    result is the final snapshot. A guard that half-commits, blocks
    compaction, or survives the unset flips an assertion or the hash.

    Scale shape: the property lives in the metaData action — checks
    are O(1) metadata reads on the commit path, never a table scan.
    """
    from ..io.delta_log import (
        _latest_version,
        delete_delta_dv,
        optimize_delta,
        read_delta,
        restore_delta,
        set_append_only,
        write_delta,
    )

    e = T(spark, sf_dir, "events").select("event_id")
    path = _scratch("delta_ao")
    try:
        write_delta(
            e.where(F.col("event_id") % 3 == 0).coalesce(1), path,
            mode="append", stats_cols=("event_id",),
        )                                                   # v0
        set_append_only(path)                               # v1
        write_delta(
            e.where(F.col("event_id") % 3 == 1).coalesce(1), path,
            mode="append", stats_cols=("event_id",),
        )                                                   # v2: appends OK
        refused = 0
        v_before = _latest_version(path)
        for op in (
            lambda: write_delta(
                e.limit(1).coalesce(1), path, mode="overwrite"
            ),
            lambda: delete_delta_dv(spark, path, "event_id % 3 = 0"),
            lambda: restore_delta(path, 0),
        ):
            try:
                op()
                raise AssertionError("append-only table accepted a rewrite")
            except ValueError as exc:
                assert "delta.appendOnly" in str(exc)
                refused += 1
        assert _latest_version(path) == v_before, "half-committed rewrite"
        out = optimize_delta(spark, path, target_bytes=1 << 30)
        assert out["version"] == v_before + 1, out  # layout ops stay legal
        guarded = read_delta(spark, path).agg(
            F.count("*").cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("s"),
        ).collect()[0]
        set_append_only(path, False)                        # v4
        write_delta(
            e.where(F.col("event_id") % 3 == 2).coalesce(1), path,
            mode="overwrite", stats_cols=("event_id",),
        )                                                   # v5: unset works
        after = read_delta(spark, path).agg(
            F.count("*").cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("s"),
        ).collect()[0]
        rows = [
            ("while_guarded", guarded["n"], guarded["s"]),
            ("after_unset", after["n"], after["s"]),
            ("refused_ops", refused, 0),
        ]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "phase string, n_rows long, sum_event_id long"
    )

"""applyInPandasWithState operator test: state must accumulate across
micro-batches (the property plain windowed aggregation can't express)."""

from __future__ import annotations

import json
from pathlib import Path

from etl_github_spark.streaming.stateful import user_activity_profile


def _write_batch(d: Path, name: str, rows):
    d.mkdir(parents=True, exist_ok=True)
    with open(d / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, indir, ckpt, qname):
    stream = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .json(str(indir))
    )
    q = (
        user_activity_profile(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_state_accumulates_across_batches(spark, tmp_path):
    indir = tmp_path / "in"
    _write_batch(
        indir,
        "b1.json",
        [
            {"user_id": 1, "ts": "2024-01-01T00:00:00", "value": 10.0},
            {"user_id": 1, "ts": "2024-01-01T00:05:00", "value": 5.0},
            {"user_id": 2, "ts": "2024-01-01T00:01:00", "value": 1.0},
        ],
    )
    _write_batch(
        indir,
        "b2.json",
        [
            {"user_id": 1, "ts": "2024-01-01T01:00:00", "value": 2.5},
        ],
    )
    _run_stream(spark, indir, tmp_path / "ckpt", "profiles")
    rows = spark.sql(
        "SELECT * FROM profiles ORDER BY user_id, n_events"
    ).collect()
    # user 1 appears in both batches: first emit (2 events), then the
    # state-carried update (3 events, 17.5 total)
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.n_events, r.total_value))
    assert by_user[2] == [(1, 1.0)]
    assert by_user[1][-1] == (3, 17.5)
    assert (2, 15.0) in by_user[1]
    final = [r for r in rows if r.user_id == 1][-1]
    assert final.last_seen.isoformat() == "2024-01-01T01:00:00"


def _run_stream_recoverable(spark, indir, ckpt, outdir):
    # memory sink cannot recover from a checkpoint; foreachBatch + parquet
    # can, which is also the production shape for update-mode state output.
    stream = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(outdir))

    q = (
        user_activity_profile(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_state_survives_restart(spark, tmp_path):
    indir = tmp_path / "in"
    _write_batch(indir, "b1.json", [{"user_id": 7, "ts": "2024-01-01T00:00:00", "value": 1.0}])
    _run_stream_recoverable(spark, indir, tmp_path / "ckpt", tmp_path / "out")
    # second run with a NEW file: checkpointed state must carry over
    _write_batch(indir, "b2.json", [{"user_id": 7, "ts": "2024-01-02T00:00:00", "value": 2.0}])
    _run_stream_recoverable(spark, indir, tmp_path / "ckpt", tmp_path / "out")
    rows = spark.read.parquet(str(tmp_path / "out")).orderBy("n_events").collect()
    assert [(r.n_events, r.total_value) for r in rows if r.user_id == 7] == [
        (1, 1.0),
        (2, 3.0),
    ]


def test_volume_spike_gate_flags_burst_not_ramp(spark, tmp_path):
    """EWMA spike gate: steady batches never flag; a 10x burst flags in
    ITS OWN batch (compared against the pre-update level); the batch
    after the burst doesn't re-flag if volume returns to normal."""
    from etl_github_spark.streaming.stateful import volume_spike_gate

    import os

    indir = tmp_path / "in"
    mk = lambda n: [  # noqa: E731
        {"event_type": "click", "ts": "2024-01-01T00:00:00"} for _ in range(n)
    ]
    _write_batch(indir, "b1.json", mk(10))
    _write_batch(indir, "b2.json", mk(12))
    _write_batch(indir, "b3.json", mk(110))  # burst
    _write_batch(indir, "b4.json", mk(11))
    # the file source orders micro-batches by modification time; the four
    # writes can share an mtime second, so pin strictly increasing mtimes
    # or the "burst" can be processed first and never flag
    for i, name in enumerate(["b1.json", "b2.json", "b3.json", "b4.json"]):
        os.utime(indir / name, (1700000000 + i, 1700000000 + i))

    stream = (
        spark.readStream.schema("event_type STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = (
        volume_spike_gate(stream)
        .writeStream.format("memory")
        .queryName("spikes")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM spikes").collect()
    flags = {r.batch_count: r.is_spike for r in rows}
    assert flags == {10: False, 12: False, 110: True, 11: False}
    # the EWMA recurrence matches the batch query's: s1=10, s2=.3*12+.7*10
    by_count = {r.batch_count: r.ewma for r in rows}
    assert by_count[10] == 10.0
    assert by_count[12] == 0.3 * 12 + 0.7 * 10.0


def test_token_heavy_hitters_tracks_dominant_token(spark, tmp_path):
    """The MG state must (a) keep the truly dominant token across
    micro-batches — even when a later batch floods with one-off tokens
    that force prunes — and (b) never hold more than cap counters per
    shard."""
    from etl_github_spark.streaming.stateful import _HH_CAP, token_heavy_hitters

    indir = tmp_path / "in"
    # batch 1: "hot" dominates; batch 2: 100 distinct one-off tokens + more hot
    _write_batch(
        indir, "b1.json", [{"tok": "hot"}] * 40 + [{"tok": f"x{i}"} for i in range(20)]
    )
    _write_batch(
        indir, "b2.json", [{"tok": f"y{i}"} for i in range(100)] + [{"tok": "hot"}] * 30
    )
    stream = (
        spark.readStream.schema("tok STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = (
        token_heavy_hitters(stream)
        .writeStream.format("memory")
        .queryName("hh")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hh").collect()
    assert any(r["tok"] == "hot" for r in rows)
    # the dominant token's lower bound reflects most of its true count
    hot = max(r["lower_bound"] for r in rows if r["tok"] == "hot")
    assert hot >= 70 - (70 + 120) // (_HH_CAP + 1) - 10
    # state bound: no shard ever emits more than cap candidates
    from collections import Counter

    per_emit = Counter()
    for r in rows:
        per_emit[(r["shard"], r["n_shard"])] += 1
    assert max(per_emit.values()) <= _HH_CAP


def test_stream_distinct_users_sketch_matches_exact_small_cardinality(
    spark, tmp_path
):
    """At small per-window cardinalities the HLL estimate is exact, so
    the streaming sketch must reproduce the exact distinct counts the
    same batch computes — windows closed by the watermark only."""
    from etl_github_spark.streaming.pipeline import stream_distinct_users_sketch

    indir = tmp_path / "in"
    rows = [
        {"user_id": u, "ts": f"2024-01-01T{h:02d}:10:00", "value": 1.0}
        for h, users in [(0, [1, 2, 3]), (1, [2, 2, 4]), (5, [9])]
        for u in users
    ]
    _write_batch(indir, "b1.json", rows)
    stream = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .json(str(indir))
    )
    q = (
        stream_distinct_users_sketch(stream)
        .writeStream.format("memory")
        .queryName("hll_win")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"].isoformat(): r["approx_users"]
        for r in spark.sql("SELECT * FROM hll_win").collect()
    }
    # hour-5 window stays open under the 2h watermark (append mode)
    assert got == {"2024-01-01T00:00:00": 3, "2024-01-01T01:00:00": 2}


def test_streaming_attribution_credits_last_touch_across_batches(spark, tmp_path):
    """A touch in batch 1 must credit a purchase in batch 2 (state carries
    it); a purchase with no touch in the 1h window gets a NULL-credit row;
    a newer touch replaces an older one."""
    from pyspark.sql import functions as F

    from etl_github_spark.streaming.stateful import attribution_last_touch

    indir = tmp_path / "in"
    _write_batch(
        indir,
        "b1.json",
        [
            {"event_id": 1, "user_id": 7, "event_type": "click", "ts": "2024-01-01T00:00:00"},
            {"event_id": 2, "user_id": 7, "event_type": "view", "ts": "2024-01-01T00:10:00"},
            {"event_id": 9, "user_id": 8, "event_type": "signup", "ts": "2024-01-01T00:00:00"},
        ],
    )
    _write_batch(
        indir,
        "b2.json",
        [
            {"event_id": 3, "user_id": 7, "event_type": "purchase", "ts": "2024-01-01T00:30:00"},
            {"event_id": 10, "user_id": 8, "event_type": "purchase", "ts": "2024-01-01T00:30:00"},
        ],
    )
    stream = (
        spark.readStream.schema(
            "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    q = (
        attribution_last_touch(stream)
        .writeStream.format("memory")
        .queryName("attr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["purchase_id"]: r for r in spark.sql("SELECT * FROM attr").collect()}
    assert rows[3]["attributed_event_id"] == 2  # newer view beat older click
    assert rows[3]["attributed_type"] == "view"
    assert rows[3]["gap_us"] == 20 * 60 * 1_000_000
    assert rows[10]["attributed_event_id"] is None  # no touch for user 8


def test_streaming_attribution_same_ts_touch_does_not_claim_purchase(
    spark, tmp_path
):
    """A touch sharing its timestamp with a purchase must NOT be
    credited (the batch twin requires t_ts strictly < p_ts) — and, just
    as importantly, must not OVERWRITE the state before the purchase is
    processed, which would erase the older in-window touch the purchase
    rightfully credits. Purchases process before same-ts touches; the
    tied touch still becomes state for LATER purchases."""
    from pyspark.sql import functions as F

    from etl_github_spark.streaming.stateful import attribution_last_touch

    indir = tmp_path / "in"
    _write_batch(
        indir,
        "b1.json",
        [
            {"event_id": 1, "user_id": 7, "event_type": "click", "ts": "2024-01-01T00:00:00"},
            # tied pair: touch event_id < purchase event_id, same second
            {"event_id": 2, "user_id": 7, "event_type": "view", "ts": "2024-01-01T00:30:00"},
            {"event_id": 3, "user_id": 7, "event_type": "purchase", "ts": "2024-01-01T00:30:00"},
            # later purchase: the tied view IS its latest prior touch
            {"event_id": 4, "user_id": 7, "event_type": "purchase", "ts": "2024-01-01T00:40:00"},
        ],
    )
    stream = (
        spark.readStream.schema(
            "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    q = (
        attribution_last_touch(stream)
        .writeStream.format("memory")
        .queryName("attr_tie")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["purchase_id"]: r for r in spark.sql("SELECT * FROM attr_tie").collect()
    }
    # tied purchase credits the STRICTLY-earlier click, not the tied view
    assert rows[3]["attributed_event_id"] == 1
    assert rows[3]["attributed_type"] == "click"
    assert rows[3]["gap_us"] == 30 * 60 * 1_000_000
    # the tied view still entered state for the later purchase
    assert rows[4]["attributed_event_id"] == 2
    assert rows[4]["gap_us"] == 10 * 60 * 1_000_000

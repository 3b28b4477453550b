"""Streaming quality gate: Gopher rules on a document stream with
observed per-batch metrics (streaming/pipeline.py::stream_quality_gate)."""

from __future__ import annotations

import json


def test_stream_quality_gate_filters_and_observes(spark, tmp_path):
    from etl_github_spark.streaming.pipeline import stream_quality_gate

    landing = tmp_path / "docs"
    landing.mkdir()
    good = "the quick brown fox jumps over a lazy dog near the old stone bridge of town " * 2
    rows = [
        {"doc_id": 1, "text": good.strip()},              # passes all rules
        {"doc_id": 2, "text": "short text"},              # word_count fail
        {"doc_id": 3, "text": "zz " * 50},                # stopword fail
    ]
    with open(landing / "a.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    src = spark.readStream.schema("doc_id long, text string").json(str(landing))
    gated = stream_quality_gate(src)
    q = (
        gated.writeStream.format("memory")
        .queryName("quality_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    kept = [r.doc_id for r in spark.sql("SELECT doc_id FROM quality_out").collect()]
    assert kept == [1]
    # observed metrics surfaced in progress: 3 seen, 1 kept
    metrics = None
    for p in q.recentProgress:
        om = p.get("observedMetrics") if isinstance(p, dict) else p["observedMetrics"]
        if om and "quality_gate" in om:
            metrics = om["quality_gate"]
    assert metrics is not None
    assert metrics["n_seen"] == 3 and metrics["n_kept"] == 1

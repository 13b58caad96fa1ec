"""Streaming semantics: watermark late-data drop (append mode) and
foreachBatch continuous-aggregate maintenance."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from healthcare_api_spark.operators.rollup import hierarchical_rollup
from healthcare_api_spark.streaming.rollup import streaming_rollup_refresh
from healthcare_api_spark.streaming.upsert import tumbling_window_counts


def test_watermark_drops_late_data_append_mode(spark, tmp_path):
    """Append mode emits a window only once its end passes the watermark;
    events older than the watermark are DROPPED, not merged. Batch 1 sets
    the watermark past the 10:00 window; batch 2's 10:07 straggler must
    not bump its count."""
    src = tmp_path / "ev"
    src.mkdir()
    (src / "b1.json").write_text(
        json.dumps({"ts": "2024-01-01 10:05:00", "event_type": "click"}) + "\n"
        + json.dumps({"ts": "2024-01-01 11:30:00", "event_type": "click"}) + "\n"
    )
    stream = (
        spark.readStream.schema("ts string, event_type string").json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    win = tumbling_window_counts(stream, "ts", "1 hour", ("event_type",), watermark="10 minutes")
    q = (
        win.writeStream.format("memory").queryName("late_out").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()  # watermark advances to 11:20
        (src / "b2.json").write_text(
            json.dumps({"ts": "2024-01-01 10:07:00", "event_type": "click"}) + "\n"  # late
            + json.dumps({"ts": "2024-01-01 12:30:00", "event_type": "click"}) + "\n"
        )
        q.processAllAvailable()  # 10:00 window finalizes WITHOUT the straggler
        rows = {
            str(r["window_start"]): r["cnt"] for r in spark.table("late_out").collect()
        }
        assert rows["2024-01-01 10:00:00"] == 1
    finally:
        q.stop()


def test_streaming_rollup_refresh_matches_batch(spark, tmp_path):
    """Two micro-batches of incremental tier maintenance == one batch
    rollup over the union (the continuous-aggregate invariant)."""
    src = tmp_path / "ev"
    src.mkdir()
    b1 = [
        {"ts": "2024-01-01 10:05:00", "v": 1.0},
        {"ts": "2024-01-01 10:40:00", "v": 3.0},
        {"ts": "2024-01-01 11:10:00", "v": 5.0},
    ]
    b2 = [
        {"ts": "2024-01-01 10:59:00", "v": 7.0},  # touches an existing bucket
        {"ts": "2024-01-01 12:01:00", "v": 2.0},  # opens a new bucket
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1) + "\n")
    stream = (
        spark.readStream.schema("ts string, v double").json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    tier_path = str(tmp_path / "tier_hour")
    q = streaming_rollup_refresh(
        stream, tier_path, "ts", "v", "hour", checkpoint=str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    all_events = spark.createDataFrame(
        [(r["ts"], r["v"]) for r in b1 + b2], ["ts", "v"]
    ).withColumn("ts", F.to_timestamp("ts"))
    expect = {
        str(r["bucket"]): (r["cnt"], r["sum_v"], r["min_v"], r["max_v"])
        for r in hierarchical_rollup(all_events, "ts", "v", ["hour"])["hour"].collect()
    }
    got = {
        str(r["bucket"]): (r["cnt"], r["sum_v"], r["min_v"], r["max_v"])
        for r in spark.read.parquet(tier_path).collect()
    }
    assert got == expect
    assert got["2024-01-01 10:00:00"] == (3, 11.0, 1.0, 7.0)  # cross-batch merge

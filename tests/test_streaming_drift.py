"""CUSUM drift detector: unit tests of the pure step function plus an
end-to-end applyInPandasWithState run over a file stream, including the
cross-micro-batch state carry and a checkpointed resume."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from medical_ocr_service_spark.streaming.pipeline import (
    _cusum_step,
    metric_drift_alerts,
)

INIT = (0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, False)


def _feed(values, warmup=5, slack=0.5, threshold=4.0):
    st, alerts = INIT, []
    for i, v in enumerate(values):
        st, a = _cusum_step(st, v, warmup, slack, threshold)
        if a:
            alerts.append((i, a))
    return st, alerts


def test_cusum_stable_stream_never_alerts():
    st, alerts = _feed([10.0, 10.5, 9.5, 10.2, 9.8] * 10)
    assert alerts == []
    assert st[7] is True  # warmed up


def test_cusum_detects_up_and_down_shift():
    base = [10.0, 10.5, 9.5, 10.2, 9.8]
    _, up = _feed(base + [20.0] * 10)
    assert up and up[0][1] == "up"
    _, down = _feed(base + [0.0] * 10)
    assert down and down[0][1] == "down"


def test_cusum_restarts_after_alert():
    # after the alert the detector re-warms on the NEW level: a stream that
    # stays at the new level produces exactly one alert
    base = [10.0, 10.5, 9.5, 10.2, 9.8]
    _, alerts = _feed(base + [20.0, 20.5, 19.5, 20.2, 19.8] * 8)
    assert len(alerts) == 1


def test_cusum_zero_variance_warmup_guard():
    # constant warmup -> sigma0 guard (1.0), no division blowup; the jump
    # still standardizes and alerts
    _, alerts = _feed([5.0] * 5 + [50.0] * 3, warmup=5, threshold=4.0)
    assert alerts and alerts[0][1] == "up"


def test_metric_drift_alerts_end_to_end(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1)

    def rows(vals, start, key="conf"):
        return [
            (key, t0 + dt.timedelta(seconds=start + i), float(v))
            for i, v in enumerate(vals)
        ]

    stable = [10.0, 10.5, 9.5, 10.2, 9.8] * 4  # 20 = default-ish warmup
    b1 = rows(stable, 0) + rows([1.0] * 25, 0, key="steady")
    b2 = rows([25.0] * 10, 100) + rows([1.0] * 5, 100, key="steady")
    schema = "event_type string, ts timestamp, value double"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "f1")
    )

    out = str(tmp_path / "alerts")
    ck = str(tmp_path / "ck")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src / "f*"))
        q = (
            metric_drift_alerts(
                stream, warmup=20, slack=0.5, threshold=4.0
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()  # batch 1: warmup only -> no alerts
    assert spark.read.parquet(out).count() == 0

    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(src / "f2")
    )
    run_once()  # batch 2 resumes from checkpointed state -> 'conf' alerts
    alerts = spark.read.parquet(out).collect()
    assert {r["event_type"] for r in alerts} == {"conf"}
    assert all(r["direction"] == "up" for r in alerts)
    # state carried across batches: warmup completed in batch 1, so the
    # alert fires within the first few post-shift samples of batch 2
    assert min(r["n_seen"] for r in alerts) <= 3

"""M2: Structured Streaming tail + exactly-once under crash/restart
(SURVEY §2.9 T1/T5; risk register §7.4 #1)."""

from __future__ import annotations

import pytest

from nifi_dicom_spark.fixtures.generator import (
    GeneratorConfig,
    generate_change_events,
    write_event_files,
)
from nifi_dicom_spark.fixtures.oracle import replay_oracle, assert_final_state_equal
from nifi_dicom_spark.operators.apply import create_transcripts_table, read_final_state
from nifi_dicom_spark.streaming.pipeline import CDCPipeline


@pytest.fixture(scope="module")
def event_log():
    cfg = GeneratorConfig(
        seed=21,
        n_conversations=40,
        max_turns=10,
        n_events=3_000,
        duplicate_ratio=0.05,
        late_ratio=0.10,
        malformed_ratio=0.02,
        schema_change_at=1_500,  # mid-stream schema evolution
    )
    return generate_change_events(cfg)


def _pipeline(spark, tmp_path, event_log, n_files=6, **kw):
    ev_dir = str(tmp_path / "events")
    write_event_files(event_log, ev_dir, n_files=n_files)
    table = create_transcripts_table(spark, str(tmp_path / "transcripts"))
    return CDCPipeline(
        spark=spark,
        events_dir=ev_dir,
        table=table,
        checkpoint_dir=str(tmp_path / "checkpoint"),
        quarantine_dir=str(tmp_path / "quarantine"),
        metrics_dir=str(tmp_path / "metrics"),
        **kw,
    )


def test_stream_replay_matches_oracle(spark, event_log, tmp_path):
    p = _pipeline(spark, tmp_path, event_log)
    p.run_available()
    assert len(p.epochs_applied) >= 6  # one epoch per file (maxFilesPerTrigger=1)
    assert_final_state_equal(
        read_final_state(p.table).toPandas(), replay_oracle(event_log)
    )
    # lineage metrics: every valid+quarantined event accounted once
    mt = p.read_metrics()
    assert int(mt["n_events"].sum()) == len(event_log)
    assert int(mt["high_watermark_offset"].max()) == int(event_log["offset"].max())

    # quarantine captured the malformed rows (garbage → reject routing)
    bad = spark.read.parquet(str(tmp_path / "quarantine"))
    assert bad.count() == int(mt["n_quarantined"].sum()) > 0


def test_crash_between_merge_and_checkpoint(spark, event_log, tmp_path):
    """Kill the stream AFTER the table merge of epoch 2 commits but BEFORE
    Spark checkpoints that epoch. On restart Spark replays epoch 2; the
    commit ledger must make the replay a no-op (no double-apply)."""

    class Boom(RuntimeError):
        pass

    applied_counts: dict[int, int] = {}

    def bomb(epoch_id, result):
        applied_counts[epoch_id] = applied_counts.get(epoch_id, 0) + int(
            result.merge.applied
        )
        if epoch_id == 2:
            raise Boom("simulated crash after merge, before checkpoint")

    p = _pipeline(spark, tmp_path, event_log, on_batch=bomb)
    with pytest.raises(Exception):
        p.run_available()

    v_after_crash = p.table.current_version()

    # restart from the same checkpoint, no bomb
    p2 = CDCPipeline(
        spark=spark,
        events_dir=p.events_dir,
        table=p.table,
        checkpoint_dir=p.checkpoint_dir,
        quarantine_dir=p.quarantine_dir,
        metrics_dir=p.metrics_dir,
    )
    p2.run_available()

    # epoch 2 was replayed but skipped by the ledger: version did not grow
    # for the replay itself (only for the remaining epochs)
    hw = p.table.applied_watermarks()
    assert hw, "ledger recorded watermarks"
    last = max(hw.values())
    for pid in hw:
        assert p.table.is_applied(hw[pid], pid)
        assert not p.table.is_applied(last + 1, pid)
    assert p.table.current_version() > v_after_crash

    assert_final_state_equal(
        read_final_state(p.table).toPandas(), replay_oracle(event_log)
    )


def test_rerun_completed_stream_is_noop(spark, event_log, tmp_path):
    p = _pipeline(spark, tmp_path, event_log)
    p.run_available()
    v = p.table.current_version()
    p.run_available()  # no new files → no new epochs
    assert p.table.current_version() == v


def test_gap_timeout_conversation_completeness(spark, tmp_path):
    """T2: applyInPandasWithState gap-timeout — a conversation completes only
    after `gap` of event-time quiescence; later traffic advances the
    watermark and flushes it (StudyReceiver.processStudyIfComplete analog)."""
    import os

    import pandas as pd

    from nifi_dicom_spark.streaming.stateful import conversation_completeness

    ev_dir = tmp_path / "events"
    os.makedirs(ev_dir)
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    early = pd.DataFrame(
        {
            "conv_id": ["A", "A", "B"],
            "ts": [t0, t0 + pd.Timedelta(seconds=10), t0 + pd.Timedelta(seconds=5)],
        }
    )
    late = pd.DataFrame(
        {
            "conv_id": ["C"],
            "ts": [t0 + pd.Timedelta(hours=2)],  # advances watermark past A/B
        }
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([("conv_id", pa.string()), ("ts", pa.timestamp("us"))])
    for i, pdf in enumerate((early, late)):
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            ev_dir / f"part-{i:03d}.parquet",
        )

    src = (
        spark.readStream.schema("conv_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ev_dir))
    )
    out = conversation_completeness(src, gap_seconds=60, watermark_delay="1 second")
    q = (
        out.writeStream.format("memory")
        .queryName("completions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["conv_id"]: r for r in spark.sql("select * from completions").collect()}
    assert set(rows) == {"A", "B"}, rows  # C is still within its gap
    assert rows["A"]["n_events"] == 2 and rows["A"]["completed"]
    assert rows["B"]["n_events"] == 1
    assert rows["A"]["last_ts"] == (t0 + pd.Timedelta(seconds=10)).to_pydatetime()

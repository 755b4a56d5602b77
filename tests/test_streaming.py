"""Streaming surface tests: registered stream_* queries vs oracle, plus
behavior checks (late-data drop, stateless passthrough)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_query_engine_greatest_spark.queries import REGISTRY
from rust_query_engine_greatest_spark.streaming import read_events_stream, run_to_memory

from tests.conftest import assert_frames_match

STREAM = sorted(n for n in REGISTRY if n.startswith("stream_"))


@pytest.mark.parametrize("name", STREAM)
def test_stream_matches_oracle(name, spark, sf_dir, oracle):
    q = REGISTRY[name]
    assert q.oracle is not None
    assert_frames_match(q.build(spark, sf_dir), oracle.sql(q.oracle))


def test_stream_stateless_pipeline(spark, sf_dir, oracle):
    """StreamingTableExec parity: scan → filter → project → sink with no
    state; result must equal the batch filter."""
    ev = read_events_stream(spark, sf_dir)
    out = run_to_memory(
        ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "value"),
        "stateless_smoke",
        spark,
    )
    assert_frames_match(
        out,
        oracle.sql("SELECT event_id, user_id, value FROM events WHERE event_type = 'error'"),
    )


def test_watermark_drops_windows_near_stream_end(spark, sf_dir, oracle):
    """Append mode must NOT emit windows newer than max(ts) - delay:
    assert the emitted window set is strictly smaller than the full
    batch window set (late-data semantics actually engaged)."""
    emitted = REGISTRY["stream_window_counts"].build(spark, sf_dir)
    n_emitted = emitted.count()
    n_all = oracle.sql(
        "SELECT COUNT(DISTINCT (floor(epoch(ts)/300), event_type)) FROM events"
    ).fetchone()[0]
    assert 0 < n_emitted < n_all


def test_pipeline_breaking_plan_rejected(spark, sf_dir):
    """SanityCheckPlan parity (core/src/physical_optimizer/
    sanity_checker.rs): the reference rejects plans that can't execute
    on unbounded input; Structured Streaming does the same at analysis
    time — a global sort on a stream (no watermark, not in complete
    aggregation) must raise AnalysisException, not run."""
    from pyspark.errors.exceptions.captured import AnalysisException

    stream = read_events_stream(spark, sf_dir)
    with pytest.raises(AnalysisException):
        run_to_memory(stream.orderBy("ts"), "should_reject", spark)


def test_parquet_sink_exactly_once_on_restart(spark, sf_dir, tmp_path_factory):
    """Durable-sink exactly-once: a checkpointed availableNow run into a
    parquet sink lands each source record exactly once, and re-running
    with the SAME checkpoint adds nothing (offsets + file-sink commit
    log make the retry a no-op). Output multiset equals the batch read
    of the same source."""
    from rust_query_engine_greatest_spark.streaming import pipelines as P

    d = tmp_path_factory.mktemp("stream_sink")
    out, ckpt = str(d / "out"), str(d / "ckpt")
    src = P.read_events_stream(spark, sf_dir).select("user_id", "event_type", "ts")
    P.run_to_parquet(src, out, ckpt)
    first = spark.read.parquet(out).count()
    batch = catalog_load(spark, sf_dir).select("user_id", "event_type", "ts")
    assert first == batch.count()
    P.run_to_parquet(P.read_events_stream(spark, sf_dir).select("user_id", "event_type", "ts"), out, ckpt)
    assert spark.read.parquet(out).count() == first


def catalog_load(spark, sf_dir):
    from rust_query_engine_greatest_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, "events")

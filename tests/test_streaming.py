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


def test_session_window_soak_state_eviction(spark):
    """Unbounded-run soak (r5 verdict #10): a RATE source drives gap
    sessionization for ~25 s of real micro-batches, and the state store
    must EVICT closed sessions as the watermark passes them — the
    property the availableNow batch-twin tests cannot observe. Users
    arrive in 100-row bursts (user_id = value/100 at 200 rows/s → each
    user stops emitting after ~0.5 s), so every session closes ~1 s
    of event time later and its state rows are removed. Asserts
    (a) sessions were emitted to the append sink mid-stream,
    (b) stateOperators reported numRowsRemoved > 0 (eviction happened),
    (c) live state stays bounded (rows in state ≪ rows ingested)."""
    import time as _time

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .select((F.col("value") / 100).cast("long").alias("user_id"),
                F.col("timestamp").alias("ts"))
    )
    sess = (
        rate.withWatermark("ts", "1 second")
        .groupBy(F.session_window("ts", "1 second").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )
    q = (
        sess.writeStream.format("memory").queryName("soak_sessions")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        removed = emitted = 0
        state_rows = input_rows = 0
        deadline = _time.time() + 45
        while _time.time() < deadline:
            _time.sleep(1.0)
            for p in q.recentProgress:
                input_rows = max(input_rows, int(p.get("numInputRows") or 0))
                for so in p.get("stateOperators") or []:
                    removed = max(removed, int(so.get("numRowsRemoved") or 0))
                    state_rows = int(so.get("numRowsTotal") or 0)
            emitted = spark.table("soak_sessions").count()
            if removed > 0 and emitted > 0:
                break
        assert emitted > 0, "no closed sessions emitted during the soak"
        assert removed > 0, "watermark never evicted state rows"
        # closed sessions must leave the store: live state is a small
        # frontier, not the full ingested history
        assert state_rows < max(emitted * 10, 200), (state_rows, emitted)
    finally:
        q.stop()


def test_index_probe_stream_equals_batch_across_micro_batches(spark, sf_dir):
    """VERDICT r8 #4: the persisted MinHash/SimHash indexes probed
    under the REAL streaming engine (foreachBatch, one file per
    micro-batch) must produce exactly the batch twin's result set, and
    the replay must actually have been incremental (≥3 micro-batches,
    not one availableNow gulp)."""
    from pyspark.sql import functions as F

    from rust_query_engine_greatest_spark.pipeline import dedup
    from rust_query_engine_greatest_spark.queries.pipeline_q import _template_docs
    from rust_query_engine_greatest_spark.streaming import run_foreach_batch

    docs = _template_docs(spark, sf_dir)
    corpus = docs.filter("doc_id < 100")
    batch = docs.filter("doc_id >= 100")

    # minhash (with exact-Jaccard verify — the full production probe)
    mh_index = dedup.minhash_index_rows(corpus, "doc_id", "text")
    batch_twin = {
        (r.batch_id, r.corpus_id, r.jac)
        for r in dedup.minhash_index_probe(
            batch, mh_index, "doc_id", "text",
            verify_texts=corpus, threshold=0.8).collect()
    }
    streamed, n_batches = run_foreach_batch(
        batch,
        lambda mb: dedup.minhash_index_probe(
            mb, mh_index, "doc_id", "text",
            verify_texts=corpus, threshold=0.8),
        "batch_id long, corpus_id long, jac double",
        n_files=4,
    )
    assert n_batches >= 3, f"expected ≥3 micro-batches, got {n_batches}"
    got = {(r.batch_id, r.corpus_id, r.jac) for r in streamed.collect()}
    assert got == batch_twin and len(batch_twin) > 0

    # simhash (fp travels in the index — no corpus join-back per batch)
    sh_index = dedup.simhash_index_rows(corpus, "doc_id", "text")
    twin = {
        (r.batch_id, r.corpus_id, r.hamming)
        for r in dedup.simhash_index_probe(
            batch, sh_index, "doc_id", "text", max_hamming=3).collect()
    }
    streamed, n_batches = run_foreach_batch(
        batch,
        lambda mb: dedup.simhash_index_probe(
            mb, sh_index, "doc_id", "text", max_hamming=3),
        "batch_id long, corpus_id long, hamming int",
        n_files=4,
    )
    assert n_batches >= 3
    got = {(r.batch_id, r.corpus_id, r.hamming) for r in streamed.collect()}
    assert got == twin and len(twin) > 0

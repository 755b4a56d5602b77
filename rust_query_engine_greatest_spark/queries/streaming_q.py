"""Streaming queries (SURVEY §2.9) run to completion into memory sinks
so the driver can hash-compare them like batch queries. Oracles encode
the *streaming* semantics: append-mode watermark window emission and
range-join results are deterministic for a bounded input processed with
availableNow.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

from ..streaming import (
    read_events_stream,
    run_to_memory,
    sessionize_stateful,
    stream_stream_range_join,
    windowed_counts,
)
from .base import register

_counter = itertools.count()


def _run(stream_df: DataFrame, base: str, spark: SparkSession) -> DataFrame:
    return run_to_memory(stream_df, f"{base}_{next(_counter)}", spark)


@register(
    "stream_window_counts",
    """
    WITH win AS (
      SELECT TIMESTAMP '1970-01-01'
               + to_seconds(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)) AS w_start,
             event_type,
             COUNT(*) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS val_sum
      FROM events GROUP BY 1, 2)
    SELECT w_start, event_type, cnt, val_sum FROM win
    WHERE w_start + INTERVAL 5 MINUTE
          <= (SELECT MAX(ts) FROM events) - INTERVAL 10 MINUTE
    """,
    tags=("streaming",),
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window agg in append mode: the oracle keeps
    only windows closed by the final watermark (max ts - 10 min) —
    checking Spark's late-data/emission semantics, not just the sums."""
    ev = read_events_stream(spark, sf_dir)
    return _run(windowed_counts(ev, "5 minutes", "10 minutes"), "wincounts", spark)


@register(
    "stream_stream_join",
    """
    SELECT p.user_id AS p_user, p.event_id AS p_id, c.event_id AS c_id,
           p.ts AS p_ts, c.ts AS c_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 10 MINUTE
    """,
    tags=("streaming",),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with range condition (SymmetricHashJoin
    analog): bounded input ⇒ result equals the batch join, which is the
    oracle."""
    ev = read_events_stream(spark, sf_dir)
    return _run(stream_stream_range_join(ev, "10 minutes"), "ssjoin", spark)


@register(
    "stream_sessionize",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS INT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    tags=("streaming", "stateful"),
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): 30-min-gap
    sessionization per user. The oracle is the batch lag/cumsum
    formulation — exact match because a single availableNow batch closes
    every session deterministically."""
    ev = read_events_stream(spark, sf_dir)
    return _run(sessionize_stateful(ev, 30), "sessions", spark)


@register(
    "stream_dedup",
    """
    SELECT event_id, ts, user_id, event_type, value FROM events
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark, the
    unbounded twin of pipeline dedup_exact): the source is staged to
    deliver EVERY event twice (at-least-once delivery), dedup keys on
    event_id, so the memory sink must equal the plain events table —
    both surviving copies are identical rows, making the pick
    deterministic. Watermark horizon bounds the dedup state; with a
    single availableNow batch no duplicate can outlive it."""
    from ..streaming.pipelines import stream_dedup

    ev = read_events_stream(spark, sf_dir, duplicated=True)
    return _run(stream_dedup(ev, key_cols=["event_id"]), "sdedup", spark)


@register(
    "stream_session_window",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    agg AS (
      SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             CAST(COUNT(*) AS INT) AS n_events
      FROM sess GROUP BY user_id, sid)
    SELECT user_id, session_start, session_end, n_events FROM agg
    WHERE session_end <= (SELECT MAX(ts) FROM events) - INTERVAL 10 MINUTE
    """,
    tags=("streaming",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE F.session_window gap sessions (vs stream_sessionize's
    custom applyInPandasWithState operator): window end = last event +
    gap, and append mode emits only sessions whose end the final
    watermark (max ts - 10 min) has passed — both encoded in the
    oracle. Note Spark closes a session when the NEXT event is >= gap
    away (session_window merges strictly-closer events), hence the >=
    in the oracle's lag test."""
    from ..streaming import session_window_counts

    ev = read_events_stream(spark, sf_dir)
    return _run(session_window_counts(ev, "30 minutes", "10 minutes"), "sesswin", spark)


@register(
    "stream_static_join",
    """
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
           CAST(e.value AS DOUBLE) AS value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    WHERE e.event_type = 'purchase'
    """,
    tags=("streaming",),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the lookup pattern every
    event pipeline runs (stream fact × slowly-changing dim). The static
    side is explicitly broadcast so each micro-batch is a map-side
    hash join: NO stream-side shuffle and no join state at any scale
    (stateless ⇒ append emits every match immediately; bounded input ⇒
    result equals the batch join = the oracle)."""
    from pyspark.sql import functions as F

    from ..sources.catalog import load_table

    ev = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
        )
    )
    joined = ev.join(dim, ev.user_id == dim.c_custkey).select(
        "event_id", "user_id", "segment", F.col("value").cast("double").alias("value")
    )
    return _run(joined, "sstatic", spark)


@register(
    "stream_minhash_index_probe",
    """
    SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
           CAST(1.0 AS DOUBLE) AS jac
    FROM documents b JOIN documents c
      ON b.doc_id % 40 = c.doc_id % 40
    WHERE b.doc_id >= 100 AND c.doc_id < 100
    """,
    tags=("streaming", "pipeline", "dedup"),
)
def stream_minhash_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental near-dup probe (dedup_minhash_index_probe)
    UNDER THE REAL STREAMING ENGINE (VERDICT r8 #4): the corpus LSH
    index is persisted once; the incoming batch is replayed through
    the file stream source one file per micro-batch and probed inside
    foreachBatch — the production ingest loop. Bounded input + the
    constructive template fixture ⇒ the accumulated stream result
    provably equals the batch twin (same-template pair set at
    jac = 1.0), so this carries a full value oracle; batch-vs-stream
    equality across ≥3 micro-batches is additionally pinned in
    tests/test_streaming.py."""
    from ..pipeline import dedup
    from ..streaming import run_foreach_batch
    from .pipeline_q import _template_docs

    docs = _template_docs(spark, sf_dir)
    corpus = docs.filter("doc_id < 100")
    batch = docs.filter("doc_id >= 100")
    index = dedup.minhash_index_rows(corpus, "doc_id", "text")

    def probe(mb: DataFrame) -> DataFrame:
        return dedup.minhash_index_probe(
            mb, index, "doc_id", "text", verify_texts=corpus, threshold=0.8)

    out, _n = run_foreach_batch(
        batch, probe, "batch_id long, corpus_id long, jac double")
    return out


@register(
    "stream_simhash_index_probe",
    """
    SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, 0 AS hamming
    FROM documents b JOIN documents c
      ON b.doc_id % 40 = c.doc_id % 40
    WHERE b.doc_id >= 100 AND c.doc_id < 100
    """,
    tags=("streaming", "pipeline", "dedup"),
)
def stream_simhash_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming sibling of stream_minhash_index_probe: the persisted
    SimHash index probed per micro-batch inside foreachBatch (fp
    travels in the index, so each micro-batch's Hamming verify needs
    no corpus join-back — the probe stays O(micro-batch) end to
    end)."""
    from pyspark.sql import functions as F

    from ..pipeline import dedup
    from ..streaming import run_foreach_batch
    from .pipeline_q import _template_docs

    docs = _template_docs(spark, sf_dir)
    corpus = docs.filter("doc_id < 100")
    batch = docs.filter("doc_id >= 100")
    index = dedup.simhash_index_rows(corpus, "doc_id", "text")

    def probe(mb: DataFrame) -> DataFrame:
        return dedup.simhash_index_probe(
            mb, index, "doc_id", "text", max_hamming=3
        ).withColumn("hamming", F.col("hamming").cast("int"))

    out, _n = run_foreach_batch(
        batch, probe, "batch_id long, corpus_id long, hamming int")
    return out

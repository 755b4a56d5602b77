"""Training-data pipeline queries over documents/embeddings.

Oracle policy: operators whose arithmetic DuckDB can mirror exactly
(token Jaccard, cosine folds, md5 fingerprints, heuristic scores) get
full hash oracles; xxhash64-based sketches (MinHash/SimHash/xxhash
fingerprint) have no DuckDB equivalent → registered without oracle
(driver rows-only check) and verified in tests/test_pipeline.py against
exact similarity ground truth instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import dedup, multimodal, similarity, text
from ..sources.catalog import load_table
from .base import register

# DuckDB mirror of the sequential double dot-product fold
def _duck_dot(a: str, b: str) -> str:
    return (f"list_aggregate(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')")


_COS = (
    f"{_duck_dot('a.embedding', 'b.embedding')} / "
    f"(sqrt({_duck_dot('a.embedding', 'a.embedding')}) * "
    f"sqrt({_duck_dot('b.embedding', 'b.embedding')}))"
)


# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    """
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS __fp,
           MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    tags=("pipeline", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalized-md5 fingerprint → groupBy (one shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "doc_id", "text")


@register(
    "dedup_jaccard",
    """
    WITH toks AS (
      SELECT doc_id, source,
             list_distinct(string_split_regex(lower(text), ' +')) AS ts
      FROM documents),
    sizes AS (SELECT doc_id, len(ts) AS n FROM toks),
    inv AS (SELECT doc_id, source, unnest(ts) AS tok FROM toks),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      FROM inv a JOIN inv b
        ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) AS jac
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.9
    """,
    tags=("pipeline", "dedup"),
)
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram (token-set) Jaccard near-dup pairs ≥0.9, blocked by source
    — inverted-index join, exact integer arithmetic → exact oracle."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(d, "doc_id", "text", block_col="source", threshold=0.9)


@register("dedup_minhash", None, tags=("pipeline", "dedup"))
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16×4) candidate pairs verified at shingle-Jaccard
    ≥0.8. xxhash64 sketch — no DuckDB mirror → rows-only driver check;
    recall/precision vs exact Jaccard asserted in test_pipeline.py."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, "doc_id", "text", threshold=0.8)


@register("dedup_simhash", None, tags=("pipeline", "dedup"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash64 near-dup pairs (Hamming ≤ 3) via 4×16-bit band
    bucketing — rows-only check (xxhash-based)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(d, "doc_id", "text", max_hamming=3)


@register(
    "dedup_embedding",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS} >= 0.4
    """,
    tags=("pipeline", "dedup"),
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact cosine within label blocks
    (threshold 0.4 — this synthetic space tops out at ~0.47). The
    identical sequential double fold on both engines → exact hash."""
    e = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_dup_pairs(e, "vec_id", "embedding", threshold=0.4, block_col="label")


# --------------------------------------------------------------------------
@register(
    "sim_topk_bruteforce",
    f"""
    SELECT qid, cid, cos, rnk FROM (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             {_duck_dot('q.embedding', 'c.embedding')} /
             (sqrt({_duck_dot('q.embedding', 'q.embedding')}) *
              sqrt({_duck_dot('c.embedding', 'c.embedding')}))      AS cos,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_duck_dot('q.embedding', 'c.embedding')} /
                        (sqrt({_duck_dot('q.embedding', 'q.embedding')}) *
                         sqrt({_duck_dot('c.embedding', 'c.embedding')})) DESC,
                        c.vec_id)                                   AS rnk
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10) t
    WHERE rnk <= 5
    """,
    tags=("pipeline", "similarity"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: top-5 cosine neighbors for 10 query vectors —
    broadcast queries × corpus scan + window top-k."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(
        e.filter(F.col("vec_id") < 10), e, "vec_id", "vec_id", "embedding", k=5
    )


@register("sim_topk_lsh", None, tags=("pipeline", "similarity"))
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN (8 planes → 256 buckets): bucket-local exact
    cosine. Approximate by design → rows-only driver check; recall vs
    brute force asserted in test_pipeline.py."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(e.filter(F.col("vec_id") < 10), e, "vec_id", "vec_id", k=5)


# --------------------------------------------------------------------------
_STOP_SQL = {
    lg: "[" + ", ".join(f"'{w}'" for w in ws) + "]" for lg, ws in text.STOPWORDS.items()
}
_HITS = {
    lg: (f"len(list_filter(list_distinct(string_split_regex(lower(text), ' +')), "
         f"t -> list_contains({lst}, t)))")
    for lg, lst in _STOP_SQL.items()
}
_LANG_CASE = "CASE "
_prev = "0"
# fold in sorted language order, strictly-greater beats — mirrors text.lang_id
_LANG_EXPR = "'und'"
_BEST = "0"
for _lg in sorted(text.STOPWORDS):
    _LANG_EXPR = f"CASE WHEN {_HITS[_lg]} > {_BEST} THEN '{_lg}' ELSE {_LANG_EXPR} END"
    _BEST = f"CASE WHEN {_HITS[_lg]} > {_BEST} THEN {_HITS[_lg]} ELSE {_BEST} END"


@register(
    "text_langid",
    f"""
    SELECT doc_id, lang AS labeled_lang, {_LANG_EXPR} AS pred_lang
    FROM documents
    """,
    tags=("pipeline", "text"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID (argmax over per-language hit
    counts, deterministic fold order mirrored in the oracle SQL)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        text.lang_id("text").alias("pred_lang"),
    )


@register(
    "text_quality",
    """
    SELECT doc_id,
           length(text)                                             AS n_chars,
           len(string_split_regex(lower(text), ' +'))               AS n_tokens,
           len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS n_bpe,
           CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
             / length(text)                                         AS alpha_ratio
    FROM documents
    """,
    tags=("pipeline", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics: char/whitespace-token/BPE-ish-token counts +
    alphabetic ratio (the composite score uses these; exact mirrors)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        text.token_count_ws(t).alias("n_tokens"),
        text.token_count_bpe(t).alias("n_bpe"),
        (F.length(F.regexp_replace(F.lower(t), r"[^a-z ]", "")).cast("double") / F.length(t)).alias("alpha_ratio"),
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_md5
    FROM documents
    """,
    tags=("pipeline", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint (md5 over normalized content; the xxhash64
    rolling variant is covered rows-only via dedup sketches)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint_md5("text").alias("fp_md5"))


# --------------------------------------------------------------------------
@register("multimodal_features", None, tags=("pipeline", "multimodal"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via Arrow-batched mapInPandas
    (decode stubbed deterministically — see pipeline/multimodal.py).
    Python-boundary op → rows-only driver check; batch-shape and
    determinism asserted in test_pipeline.py."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.media_from_documents(d)
    feats = multimodal.extract_features(media)
    return feats.select("media_id", "n_bytes", F.col("feat").cast("array<double>").alias("feat"))


@register("multimodal_decode_stats", None, tags=("pipeline", "multimodal"))
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode path: render each document into a genuine
    PPM(P6) payload, decode it back to pixels with the pure-NumPy
    codec, and emit per-channel pixel means + a resize pass
    (16×16 → 4×4 area-average, re-encoded PPM → fixed 59-byte payload).
    Python codec boundary → rows-only driver check; decode/resize
    kernels are golden-checked against NumPy in test_pipeline.py."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.ppm_media_from_documents(d)
    feats = multimodal.extract_features(media).select(
        "media_id",
        F.col("feat")[0].cast("double").alias("r_mean"),
        F.col("feat")[1].cast("double").alias("g_mean"),
        F.col("feat")[2].cast("double").alias("b_mean"),
    )
    small = multimodal.resize_images(media, 4, 4).select(
        "media_id",
        F.length("payload").alias("resized_bytes"),
        F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h"),
    )
    return feats.join(small, "media_id")


@register("sim_topk_ivf", None, tags=("pipeline", "similarity"))
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (16 deterministic k-means cells, nprobe=4): cell-local
    exact cosine — the second scale path next to LSH (SURVEY training-
    pipeline ops). Approximate by design → rows-only driver check;
    recall vs brute force asserted in test_pipeline.py."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(e.filter(F.col("vec_id") < 10), e, "vec_id", "vec_id", k=5)


@register("text_winnow", None, tags=("pipeline", "text"))
def text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (MOSS) over documents — rows-only driver
    check (fingerprints are xxhash64-engine-specific); the SIGMOD'03
    shared-substring guarantee and window-selection semantics are
    property-tested in test_pipeline.py."""
    d = load_table(spark, sf_dir, "documents")
    fps = text.winnow_fingerprints(d, "doc_id", "text", k=5, w=4)
    return fps.select("id", F.size("fps").alias("n_fps"))

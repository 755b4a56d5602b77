"""Text analysis for training-data pipelines: tokenization, language ID,
quality scoring, token counting, document fingerprinting.

All pure JVM-side expression compositions (no Python UDFs) — at 100 TB
these run inside whole-stage codegen over the scan, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID. Deliberately small + deterministic; real deployments swap
# in fastText &c. via the same column contract.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "les"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
    "zh": ["de", "shi", "bu", "le", "ren", "wo", "you", "ta", "zhe", "men"],
}

BPE_ISH_RE = r"[a-z0-9]+|[^a-z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), r" +")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks
    (regexp_extract_all — both a cost proxy and a budget guard)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_RE), 0))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Distinct stopwords of `lang` present in the text."""
    lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(distinct_tokens(text), lst))


def lang_scores(text: Column | str) -> Column:
    """Struct of per-language stopword-hit scores."""
    return F.struct(*[stopword_hits(text, lg).alias(lg) for lg in STOPWORDS])


def lang_id(text: Column | str) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when no
    list scores > 0. Deterministic tie-break: language-code order."""
    s = lang_scores(text)
    # fold: pick the max-scoring language, scanning in sorted order
    expr = F.lit("und")
    best_score = F.lit(0)
    for lg in sorted(STOPWORDS):
        cond = s[lg] > best_score
        expr = F.when(cond, F.lit(lg)).otherwise(expr)
        best_score = F.when(cond, s[lg]).otherwise(best_score)
    return expr


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + alpha ratio +
    mean-token-length band + stopword(en) presence. Mirrors the shape of
    C4/Gopher-style filters; every term is SQL-expressible."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c).cast("double")
    toks = tokens(c)
    n_tok = F.size(toks).cast("double")
    mean_tok = (n - n_tok + 1) / n_tok  # chars-per-token proxy (exact arithmetic)
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(c), r"[^a-z ]", "")).cast("double") / n
    )
    len_term = F.when((n >= 100) & (n <= 5000), 1.0).otherwise(0.5)
    tok_term = F.when((mean_tok >= 3) & (mean_tok <= 10), 1.0).otherwise(0.5)
    stop_term = F.when(stopword_hits(c, "en") >= 2, 1.0).otherwise(0.5)
    return (len_term * 0.4 + tok_term * 0.3 + stop_term * 0.2 + alpha_ratio * 0.1)


def fingerprint_md5(text: Column | str) -> Column:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text (exact-dedup key)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def fingerprint_xxhash(text: Column | str) -> Column:
    """64-bit rolling-hash-style fingerprint (xxhash64) — cheaper than
    md5 at scale; engine-specific (no DuckDB mirror) so oracle checks use
    the md5 variant."""
    c = F.col(text) if isinstance(text, str) else text
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def winnow_fingerprints(
    df, id_col: str, text_col: str, k: int = 5, w: int = 4,
    hash_fn: str = "xxhash64",
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every character k-gram of the
    normalized text, slide a w-window over the hash sequence, keep each
    window's minimum, dedupe per document. The paper's guarantee: any
    shared substring of length >= w+k-1 between two documents yields a
    shared fingerprint — the local-min property random sampling lacks.

    Plan shape (linear, codegen): explode gram positions to rows →
    substring+xxhash64 per gram (each computed exactly ONCE — an
    array-of-hashes formulation with array_min over slices would get
    the whole hash array re-inlined per window by CollapseProject,
    going quadratic per document; see BENCH_NOTES r3) → running min via
    a ROWS window frame partitioned by doc → collect_set. One shuffle
    on the doc id, reused by the final aggregation.

    Returns (id, fps sorted array); docs shorter than k hash the whole
    text as their single gram. NULL text is treated as '' (one
    empty-gram fingerprint) so every input id appears in the output.

    `hash_fn` picks the gram hash: "xxhash64" (fast path, array<long>
    fps) or "md5" (hex-string fps — bit-identical in DuckDB/Spark, used
    by the oracle-checked registry entry; min/ordering over the ASCII
    hex strings is engine-independent binary collation)."""
    from pyspark.sql import Window

    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    base = df.select(F.col(id_col).alias("id"), norm.alias("t"))
    gram = F.col("t").substr(F.col("i"), F.lit(k))
    gram_hash = F.md5(gram) if hash_fn == "md5" else F.xxhash64(gram)
    grams = base.select(
        "id", "t",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("t") - k + 1, F.lit(1)))
        ).alias("i"),
    ).select("id", F.col("i"), gram_hash.alias("h"))
    win = Window.partitionBy("id").orderBy("i").rowsBetween(0, w - 1)
    n_win = Window.partitionBy("id")
    mins = (
        grams.withColumn("m", F.min("h").over(win))
        .withColumn("n_grams", F.count(F.lit(1)).over(n_win))
        # full windows only (tail stubs would over-select); short docs
        # (< w grams) keep their single all-gram window at i = 1
        .filter((F.col("i") <= F.col("n_grams") - w + 1) | ((F.col("n_grams") < w) & (F.col("i") == 1)))
    )
    return mins.groupBy("id").agg(F.array_sort(F.collect_set("m")).alias("fps"))


def ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Space-joined n-grams from an ALREADY-MATERIALIZED token-array
    column; empty array when the document has fewer than n tokens
    (guarded explicitly — Spark's sequence(1, 0) DESCENDS to [1, 0] and
    slice rejects start 0, so the unguarded form crashes on short docs).

    The transform lambda must capture a bound attribute, never a
    computed subtree: Spark's interpreted HOF evaluator re-evaluates
    captured subtrees per element, so an inline tokens() capture re-runs
    the split per gram position — O(tokens²) per doc (the shingling
    pathology in BENCH_NOTES r4; 6× measured on decontaminate's gram
    explosion). Hot callers project tokens() into a column first; the
    multi-reference projection is not collapsed by Catalyst."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_ngrams(text: Column | str, n: int = 3) -> Column:
    """Inline convenience form of ngrams_from_tokens (captures the
    tokens() subtree — fine for small/one-off inputs; hot paths
    materialize the token array first, see ngrams_from_tokens)."""
    return ngrams_from_tokens(tokens(text), n)


def decontaminate(
    docs, bench, id_col: str, text_col: str, n: int = 3,
):
    """Benchmark decontamination (the n-gram-overlap method used for
    LLM training sets, e.g. GPT-3 appendix C / PaLM): a document is
    contaminated when it shares ANY token n-gram with the benchmark
    suite. Returns (id, n_hits) for contaminated docs — subtract from
    the corpus with a left-anti join.

    Scale shape: the benchmark suite is small and fixed → its distinct
    n-gram set BROADCASTS; the corpus explodes grams map-side and
    semi-aggregates per doc — the corpus is never shuffled by gram, only
    the (doc, hit) pairs reach the one aggregation exchange. No Python
    in the hot path."""
    bench_grams = (
        bench.select(tokens(F.col(text_col)).alias("toks"))
        .select(F.explode(ngrams_from_tokens(F.col("toks"), n)).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    ).select("id", F.explode(ngrams_from_tokens(F.col("toks"), n)).alias("g"))
    return (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# PII patterns — deliberately in the Java∩RE2 common regex subset so the
# DuckDB oracle runs the IDENTICAL pattern strings.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\b\d{3}[- ]\d{4}\b"
# IPv4 (octets unvalidated — redaction errs toward over-matching, the
# same trade public pipelines make, e.g. Dolma's email/phone/IP triple)
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(text: Column | str) -> Column:
    """Replace emails, then IPv4 addresses, then phone-shaped digit
    runs with typed tags (the Dolma-style email/phone/IP triple) — pure
    regexp_replace chain (codegen, shuffle-free at any scale). IP runs
    before PHONE so the dotted octets are not partially eaten."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_IP_RE, "<IP>")
    return F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")


def pii_counts(text: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) found in the text. Counts are taken
    on the RAW text independently, so an IP inside a larger string
    still counts even where redaction order would have rewritten it."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), 0)),
        F.size(F.regexp_extract_all(c, F.lit(PII_IP_RE), 0)),
    )


def hash_sample(df, id_col: str, hex_threshold: str = "1a"):
    """Deterministic content-stable sampling: keep rows whose
    md5(id)'s first two hex chars sort below `hex_threshold` —
    fraction = int(hex_threshold, 16) / 256 (e.g. '1a' → 26/256 ≈
    10.2%). Unlike rand()-sampling this is reproducible across runs,
    engines, and partitionings (the property training-data pipelines
    need for holdout/ablation splits), costs one hash per row, and
    needs no shuffle. ASCII hex compares identically under Spark and
    DuckDB binary collation → exact oracle."""
    key = F.md5(F.col(id_col).cast("string"))
    return df.filter(key < F.lit(hex_threshold)).withColumn("__sample_key", key)


def repetition_profile(df, id_col: str, text_col: str, n: int = 2):
    """Gopher-style repetition quality metrics (Rae et al. 2021,
    "Scaling Language Models: Methods, Analysis & Insights from
    Training Gopher", Table A1 — the public repetition filters used to
    clean MassiveText): per document,

      * ``dup_token_frac``   — 1 − distinct/total whitespace tokens
        (expression-only, computed in the scan projection);
      * ``top_ngram_frac``   — occurrences of the single most frequent
        token n-gram / total n-grams (Gopher's "top n-gram fraction");
      * ``keep``             — Gopher-ish acceptance (dup_token_frac
        ≤ 0.6 AND top_ngram_frac ≤ 0.3; thresholds are arguments of the
        reader, not the algorithm).

    Plan shape for 100 TB: the mode of a document's OWN n-grams is a
    per-row property — array_sort puts equal grams adjacent and a
    run-length fold takes the longest run, so the whole profile is a
    scan-side projection with ZERO exchanges (the earlier
    explode → (id, gram) agg → per-id agg → join-back form shuffled the
    corpus twice for a value each row already owns; the fold's lambda
    captures only its accumulator and element — the cheap-capture HOF
    case, see ngrams_from_tokens). Docs with < n tokens have zero
    n-grams: ``top_ngram_frac`` is 0.0 for them (no division by zero)
    so every input id appears exactly once in the output. NULL text
    counts as '' (one empty token, zero n-grams)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(F.col(id_col).alias("id"), tokens(c).alias("toks")).select(
        "id",
        F.size("toks").alias("n_tokens"),
        (
            1.0 - F.size(F.array_distinct("toks")).cast("double")
            / F.size("toks").cast("double")
        ).alias("dup_token_frac"),
        ngrams_from_tokens(F.col("toks"), n).alias("grams"),
    )
    run = lambda acc, g: F.when(  # noqa: E731 — length of the run ending at g
        acc["prev"].isNull() | (acc["prev"] != g), F.lit(1)
    ).otherwise(acc["run"] + 1)
    top_cnt = F.aggregate(
        F.array_sort("grams"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            run(acc, g).alias("run"),
            F.greatest(acc["best"], run(acc, g)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    prof = base.select(
        "id", "n_tokens", "dup_token_frac",
        F.when(
            F.size("grams") > 0,
            top_cnt.cast("double") / F.size("grams").cast("double"),
        ).otherwise(F.lit(0.0)).alias("top_ngram_frac"),
    )
    return prof.withColumn(
        "keep",
        (F.col("dup_token_frac") <= 0.6) & (F.col("top_ngram_frac") <= 0.3),
    )


def pack_sequences(df, id_col: str, text_col: str, budget: int = 512,
                   shard_col: str | None = None):
    """Deterministic greedy sequence packing: assign documents, in
    id-order within a shard, to fixed-token-budget training sequences —
    the standard concat-then-chunk packing LLM data loaders use, made
    reproducible (same inputs ⇒ same packs on any engine/partitioning).

    ``seq_id`` = number of whole budgets consumed BEFORE this document
    (floor(prev_cumsum / budget)) and ``offset`` = prev_cumsum −
    seq_id·budget, so a document straddling a boundary starts in the
    sequence its first token lands in — exactly the chunked-concat
    semantics. Documents longer than the budget simply span several
    sequences (offset records where they start).

    Scale shape: the running sum is a window PARTITIONED BY the shard —
    a global ordered window would serialize 100 TB through one task, so
    packing is per-shard by design (matches how training shards are
    written); the only exchange is the hash partition on the shard key.
    Token counts use the whitespace tokenizer (swap ``token_count_ws``
    for a real tokenizer's count column in production)."""
    from pyspark.sql import Window

    shard = (
        F.col(shard_col)
        if shard_col
        else F.pmod(F.col(id_col), F.lit(32)).cast("string")
    )
    c = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col).alias("id"),
        shard.alias("shard"),
        token_count_ws(c).cast("long").alias("n_tokens"),
    )
    win = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    return base.select(
        "id", "shard", "n_tokens",
        F.floor(prev / budget).cast("long").alias("seq_id"),
        (prev % budget).cast("long").alias("offset"),
    )


def rate_hex_threshold(rate: float) -> str:
    """4-hex-char threshold for md5-prefix sampling: keep iff
    substr(md5, 1, 4) < threshold. rate quantizes to 1/65536 steps;
    rate >= 1 — or a fraction that ROUNDS to 65536 (rate ≥ 1 − 2⁻¹⁷) —
    returns 'g000' (lexicographically above every hex string, so ALL
    rows keep; '10000' would be a 5-char string that sorts BELOW '1fff'
    and silently keep ~1/16th)."""
    if rate >= 1:
        return "g000"
    v = max(0, round(rate * 65536))
    return "g000" if v >= 65536 else format(v, "04x")


def stratified_hash_sample(df, id_col: str, strata_col: str,
                           rates: dict[str, float]):
    """Reproducible stratified sampling: per-stratum keep rates applied
    via the same md5-threshold trick as `hash_sample`, so every stratum
    gets a deterministic, engine/partitioning-independent subsample —
    the "source mixing weights" step of a training-set build (e.g.
    down-weighting a crawl source against books/reference text) made
    re-materializable. Rates quantize to 1/65536 steps (4 hex chars).
    Strata absent from `rates` are DROPPED (explicit mixing weights
    only — silent pass-through would un-weight unknown sources).
    Shuffle-free: one hash + one CASE per row."""
    if not rates:
        raise ValueError("stratified_hash_sample: empty rates dict")
    key = F.md5(F.col(id_col).cast("string"))
    thresh = None
    for stratum, rate in sorted(rates.items()):
        hexv = rate_hex_threshold(rate)
        cond = F.col(strata_col) == stratum
        thresh = (
            F.when(cond, F.lit(hexv)) if thresh is None
            else thresh.when(cond, F.lit(hexv))
        )
    thresh = thresh.otherwise(F.lit("0000"))
    return (
        df.withColumn("__sample_key", key)
        .filter(F.substring("__sample_key", 1, 4) < thresh)
    )


def mixture_epochs(df, id_col: str, strata_col: str,
                   weights: dict[str, float]):
    """Training-mixture materialization with fractional epoch weights
    (the "sample source A at 2.5 epochs, B at 0.25" step of a
    training-set build — public method per Dolma/RedPajama/Pile-style
    mixture recipes). Weight w ≥ 0 per stratum emits floor(w) full
    copies of each doc plus one extra copy for the deterministic
    md5-fraction frac(w) of docs — so the realized epoch count equals w
    in expectation AND the same docs get the extra copy on every run,
    engine, and partitioning. Output adds __epoch (1-based copy index)
    so downstream packing can interleave epochs. Strata absent from
    `weights` are dropped (explicit mixing only, as in
    stratified_hash_sample). Fractions quantize to 1/65536.

    Scale shape: broadcast-free, shuffle-free — one hash, one CASE and
    one posexplode(array_repeat) per row; output size is the weighted
    sum of strata sizes, never a join."""
    if not weights:
        raise ValueError("mixture_epochs: empty weights dict")
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    base = None
    thresh = None
    for stratum, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative mixture weight for {stratum!r}")
        cond = F.col(strata_col) == stratum
        b, frac = int(w), w - int(w)
        hexv = rate_hex_threshold(frac)
        base = F.when(cond, b) if base is None else base.when(cond, b)
        thresh = (
            F.when(cond, F.lit(hexv)) if thresh is None
            else thresh.when(cond, F.lit(hexv))
        )
    base = base.otherwise(F.lit(0))
    thresh = thresh.otherwise(F.lit("0000"))
    n_copies = base + F.when(key < thresh, 1).otherwise(0)
    return (
        df.select(
            "*",
            F.posexplode(F.array_repeat(F.lit(1), n_copies)).alias(
                "__pos", "__one"
            ),
        )
        .withColumn("__epoch", F.col("__pos") + 1)
        .drop("__pos", "__one")
    )


def unigram_prob_score(
    df,
    id_col: str,
    text_col: str,
    vocab_size: int = 1000,
):
    """Corpus-LM quality score (the CCNet / Wenzek et al. 2020 filter
    family, public method): build a unigram model over the corpus,
    score each document by how typical its tokens are, and bucket the
    tail for filtering. Production uses KenLM perplexity in log space;
    this operator scores the EXACT-ARITHMETIC proxy — mean in-vocab
    unigram probability — because +, / and integer counts are
    IEEE-exact on every engine while ln() differs by ±1 ulp between
    libm (DuckDB) and Java Math.log (Spark), which would break the
    oracle's bitwise hash. Rare-token-heavy documents score low in
    either formulation.

    Plan shape at 100 TB: ONE token-count aggregate (map-side
    combined) builds the vocabulary; the top-V table broadcasts
    (V·~40 bytes); scoring is a broadcast-join lookup plus a per-doc
    fold, so the corpus crosses exactly one data-sized exchange (the
    doc-id aggregate). The per-doc mean folds the probabilities in
    token-position order (sort_array on (pos, p) structs) so the sum
    is a deterministic sequential fold both engines reproduce.

    Output: (id, n_tokens, n_in_vocab, score); documents with zero
    tokens have no row (no tokens, no model evidence).
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), " +"),
                     lambda x: x != "")
        ).alias("pos", "tok"),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    vocab = (
        # orderBy+limit plans as TakeOrderedAndProject — a distributed
        # per-partition top-V + driver merge, NOT a single-partition
        # window sort of the whole vocabulary
        freq.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(vocab_size)
        .crossJoin(F.broadcast(total))
        .select(
            "tok",
            (F.col("cnt").cast("double")
             / F.col("total").cast("double")).alias("p"),
        )
    )
    scored = toks.join(F.broadcast(vocab), "tok", "left").select(
        "__id", "pos",
        F.coalesce(F.col("p"), F.lit(0.0)).alias("p0"),
        F.col("p").isNotNull().cast("long").alias("iv"),
    )
    folded = (
        scored.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("iv").alias("n_in_vocab"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("p0")))
                    ),
                    lambda s: s["p0"],
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("psum"),
        )
    )
    return folded.select(
        F.col("__id").alias(id_col), "n_tokens", "n_in_vocab",
        (F.col("psum") / F.col("n_tokens").cast("double")).alias("score"),
    )


def chunk_overlap(
    df,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
):
    """Sliding-window chunking for training sequences (the standard
    fixed-context pretraining slicer: window W tokens, stride S < W
    gives W-S tokens of overlap so no boundary context is lost).

    Pure map-side: tokens -> sequence of chunk starts -> slice + join
    per start — ZERO exchanges; at 100 TB this is scan-shaped and
    embarrassingly parallel, the shape you want for the heaviest
    pipeline stage. The trailing partial chunk is kept iff it starts
    past 0 and adds at least one new token (start < n), matching the
    epoch-accounting convention of pack_sequences.

    Output: (id, chunk_idx, n_tokens, chunk_text).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " +"),
                    lambda x: x != "")
    n = F.size(toks)
    # chunk starts: 0, S, 2S, ... while start < n (empty docs: none)
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), n - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            F.col(id_col).alias("__id"),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_idx", "start"),
        )
        .select(
            F.col("__id").alias(id_col),
            "chunk_idx",
            F.size(F.slice(F.col("__toks"), F.col("start") + 1, window))
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("start") + 1, window), " "
            ).alias("chunk_text"),
        )
    )


def domain_cap(df, id_col: str, domain_col: str, cap: int = 10):
    """RefinedWeb-style per-domain document cap (Penedo et al. 2023
    §3.1 caps pages per registered domain as an anti-spam / diversity
    measure; Gopher applies the same idea per host). Keep at most
    ``cap`` documents per domain, chosen DETERMINISTICALLY by md5(id)
    order — content-stable across runs, engines, and partitionings
    (same rationale as hash_sample), unlike rand()-ranked caps.

    Output: (id, domain, cap_rank) for the survivors, cap_rank in
    1..cap.

    Plan shape: one hash exchange on the domain key feeding a window
    ``row_number``; the ``<= cap`` predicate lets Catalyst insert
    WindowGroupLimit, so each map task keeps only its local top-``cap``
    rows per domain BEFORE the shuffle — at 100 TB the exchange carries
    at most cap x n_domains x n_tasks rows, not the corpus
    (plan-pinned in tests/test_plans.py). md5 keys are unique per id,
    so the rank is total and the result deterministic."""
    from pyspark.sql import Window

    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(domain_col).orderBy(key)
    return (
        df.select(
            F.col(id_col),
            F.col(domain_col).alias("domain"),
            F.row_number().over(w).alias("cap_rank"),
        )
        .filter(F.col("cap_rank") <= cap)
    )

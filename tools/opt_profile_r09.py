"""Round-9 optimization profiler: decompose the heavy bench entries.

For each (name, builder) target, times on an idle box:
  - noop:    df.write.format("noop") — computation only (guide §1.4)
  - collect: the bench's timed action — computation + driver transfer

Interleaved passes, best-of-N, with one untimed warm pass per target
(same JIT/codegen regime as bench.py). Targets include SUB-STAGES of the
pipeline operators so the time goes to a named piece of the plan, not
the whole op. Prints one JSON line.

Usage: python tools/opt_profile_r09.py [--iters 3] [--targets a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_targets(spark, sf_dir):
    from pyspark.sql import functions as F

    from rust_query_engine_greatest_spark.pipeline import dedup as _dedup
    from rust_query_engine_greatest_spark.pipeline.dedup import (
        _band_rows,
        _bucket_pairs,
        _ensure_parallelism,
        minhash_signatures,
        shingle_rows,
        simhash64,
    )
    from rust_query_engine_greatest_spark.queries import REGISTRY
    from rust_query_engine_greatest_spark.sources.catalog import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")

    t = {}

    # --- dedup_simhash (library op over real documents, bench entry) ---
    def simhash_fp_only(s, d):
        return _ensure_parallelism(docs).select(
            F.col("doc_id").alias("id"), simhash64("text").alias("fp"))

    def simhash_full(s, d):
        return _dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3)

    t["simhash_fp_only"] = simhash_fp_only
    t["simhash_full"] = simhash_full

    # --- dedup_minhash (library op over real documents, bench entry) ---
    def mh_shingles(s, d):
        return shingle_rows(docs, "doc_id", "text")

    def mh_signatures(s, d):
        return minhash_signatures(shingle_rows(docs, "doc_id", "text"))

    def mh_banded(s, d):
        return _band_rows(
            minhash_signatures(shingle_rows(docs, "doc_id", "text")), 64, 16)

    def mh_cand(s, d):
        return _bucket_pairs(
            _band_rows(minhash_signatures(shingle_rows(docs, "doc_id", "text")), 64, 16),
            ["band_id", "band_hash"])

    def mh_full(s, d):
        return _dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)

    t["minhash_shingles"] = mh_shingles
    t["minhash_signatures"] = mh_signatures
    t["minhash_banded"] = mh_banded
    t["minhash_candidates"] = mh_cand
    t["minhash_full"] = mh_full

    # --- dedup_semantic (registry entry = bench entry) ---
    t["semantic_full"] = REGISTRY["dedup_semantic"].build

    # assignment-only variant (no keeper join-back / second cosine)
    def semantic_assign(s, d):
        from rust_query_engine_greatest_spark.pipeline.similarity import (
            dot,
            norm,
            safe_cos,
        )
        from rust_query_engine_greatest_spark.pipeline.dedup import _py_norm
        e = _lt(s, d, "embeddings")
        cents = [(i, list(r[1])) for i, r in enumerate(
            e.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect())]
        base = e.select(F.col("vec_id").alias("__id"),
                        F.col("embedding").alias("__v"),
                        norm(F.col("embedding")).alias("__n"))
        vec = F.col("__v")
        sims = F.array(*[
            F.coalesce(safe_cos(dot(vec, F.array(*[F.lit(x) for x in c])),
                                F.col("__n"), F.lit(_py_norm(c))), F.lit(-2.0))
            for _, c in cents])
        pairs = F.transform(sims, lambda sv, i: F.struct((-sv).alias("neg"), i.alias("idx")))
        return (base.withColumn("cluster", F.array_sort(pairs)[0]["idx"])
                    .withColumn("cos_c", -F.array_sort(pairs)[0]["neg"]))

    t["semantic_assign"] = semantic_assign

    # --- other heavy bench entries, whole-op ---
    for name in ("dedup_jaccard", "dedup_bloom_incremental", "text_repetition",
                 "text_unigram_quality", "text_span_scrub", "sim_topk_bruteforce",
                 "text_decontaminate", "text_langid", "text_quality",
                 "text_chunk_overlap", "dedup_exact", "text_hash_sample"):
        t[name] = REGISTRY[name].build

    # greatest_numeric: collect-vs-noop split is the point
    t["greatest_numeric"] = REGISTRY["greatest_numeric"].build

    # --- probe path (bench entries dedup_*_probe) ---
    idx_root = f"/tmp/opt_prof_idx"
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    _dedup.minhash_index_rows(corpus, "doc_id", "text") \
        .write.mode("overwrite").parquet(f"{idx_root}/minhash")
    _dedup.simhash_index_rows(corpus, "doc_id", "text") \
        .write.mode("overwrite").parquet(f"{idx_root}/simhash")

    def mh_probe(s, d):
        return _dedup.minhash_index_probe(
            batch, s.read.parquet(f"{idx_root}/minhash"), "doc_id", "text")

    def sh_probe(s, d):
        return _dedup.simhash_index_probe(
            batch, s.read.parquet(f"{idx_root}/simhash"), "doc_id", "text",
            max_hamming=3)

    t["minhash_probe"] = mh_probe
    t["simhash_probe"] = sh_probe
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--targets", type=str, default="")
    ap.add_argument("--collect", action="store_true",
                    help="also time the collect() action per target")
    args = ap.parse_args()

    from rust_query_engine_greatest_spark.session import get_spark
    from rust_query_engine_greatest_spark.sources import compact as _compact
    from rust_query_engine_greatest_spark.sources import stats as _stats

    spark = get_spark(app_name="opt-profile-r09")
    _compact.activate(spark, SF_DIR)
    _stats.activate(spark, SF_DIR)
    _stats.activate_pipeline(spark, SF_DIR)

    targets = build_targets(spark, SF_DIR)
    if args.targets:
        keep = set(args.targets.split(","))
        targets = {k: v for k, v in targets.items() if k in keep}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm pass (untimed): exact plans
    for name, b in targets.items():
        try:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            noop(b(spark, SF_DIR))
            if args.collect:
                b(spark, SF_DIR).collect()
        except Exception as e:
            print(f"warm {name} failed: {e}", file=sys.stderr)

    res: dict[str, dict] = {n: {"noop": float("inf"), "collect": float("inf")}
                            for n in targets}
    for it in range(args.iters):
        for name, b in targets.items():
            try:
                spark.sparkContext.setJobDescription(f"noop:{name}")
                t0 = time.perf_counter()
                noop(b(spark, SF_DIR))
                res[name]["noop"] = min(res[name]["noop"], time.perf_counter() - t0)
                if args.collect:
                    spark.sparkContext.setJobDescription(f"collect:{name}")
                    t0 = time.perf_counter()
                    b(spark, SF_DIR).collect()
                    res[name]["collect"] = min(res[name]["collect"],
                                               time.perf_counter() - t0)
            except Exception as e:
                print(f"{name} failed: {e}", file=sys.stderr)
                res[name] = {"noop": -1.0, "collect": -1.0}
    out = {n: {k: (round(v, 4) if v != float("inf") else None)
               for k, v in d.items()} for n, d in res.items()}
    print(json.dumps({"sf_dir": SF_DIR, "iters": args.iters,
                      "load": list(os.getloadavg()), "results": out}))


if __name__ == "__main__":
    main()

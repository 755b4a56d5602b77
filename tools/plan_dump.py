"""Dump `.explain("formatted")` for bench-surface queries to plans/r09/.

Usage:
    python tools/plan_dump.py [--suffix before|after] [--names n1,n2,...]
                              [--sf-dir DIR]

Default name set = the bench surface (all tpch_* + bench-tagged registry
entries + the bench pipeline library ops). One file per query:
plans/r09/<name>_<suffix>.txt. These are the optimization-round evidence
artifacts (the judge reads them instead of running Spark).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_query_engine_greatest_spark.queries import REGISTRY  # noqa: E402
from rust_query_engine_greatest_spark.session import get_spark  # noqa: E402


def bench_surface(spark, sf_dir):
    """name -> builder for everything bench.py times."""
    from pyspark.sql import functions as F

    from rust_query_engine_greatest_spark.pipeline import dedup as _dedup
    from rust_query_engine_greatest_spark.sources.catalog import load_table as _lt

    out = {}
    for n in sorted(REGISTRY):
        if n.startswith("tpch_") or (REGISTRY[n].tags and "bench" in REGISTRY[n].tags):
            out[n] = REGISTRY[n].build
    # the pipeline section's library-operator invocations (bench.py)
    out["pipe_dedup_minhash"] = lambda s, d: _dedup.minhash_lsh_pairs(
        _lt(s, d, "documents"), "doc_id", "text", threshold=0.8)
    out["pipe_dedup_simhash"] = lambda s, d: _dedup.simhash_pairs(
        _lt(s, d, "documents"), "doc_id", "text", max_hamming=3)
    for pname in ("dedup_exact", "dedup_jaccard", "text_quality", "text_langid",
                  "sim_topk_bruteforce", "text_decontaminate", "text_hash_sample",
                  "text_repetition", "dedup_semantic", "dedup_bloom_incremental",
                  "text_unigram_quality", "text_chunk_overlap", "text_span_scrub"):
        out.setdefault(pname, REGISTRY[pname].build)

    docs = _lt(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    idx_root = f"/tmp/spark_graft_probe_idx_sf{sf}"
    if not os.path.isdir(f"{idx_root}/minhash"):
        _dedup.write_index(
            _dedup.minhash_index_rows(corpus, "doc_id", "text"),
            f"{idx_root}/minhash")
    if not os.path.isdir(f"{idx_root}/simhash"):
        _dedup.write_index(
            _dedup.simhash_index_rows(corpus, "doc_id", "text"),
            f"{idx_root}/simhash")
    out["pipe_dedup_minhash_probe"] = lambda s, d: _dedup.minhash_index_probe(
        batch, s.read.parquet(f"{idx_root}/minhash"), "doc_id", "text")
    out["pipe_dedup_simhash_probe"] = lambda s, d: _dedup.simhash_index_probe(
        batch, s.read.parquet(f"{idx_root}/simhash"), "doc_id", "text",
        max_hamming=3)
    # the untimed index-build half of the probe split (r10: write sizing)
    out["pipe_dedup_minhash_index_build"] = lambda s, d: _dedup.minhash_index_rows(
        corpus, "doc_id", "text")
    out["pipe_dedup_simhash_index_build"] = lambda s, d: _dedup.simhash_index_rows(
        corpus, "doc_id", "text")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--names", default="")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--round", default="r10")
    args = ap.parse_args()

    spark = get_spark(app_name="plan-dump")
    # mirror bench.py's layout so plans match what the bench runs
    from rust_query_engine_greatest_spark.sources import compact as _compact
    from rust_query_engine_greatest_spark.sources import stats as _stats
    _compact.activate(spark, args.sf_dir)
    _stats.activate(spark, args.sf_dir)
    _stats.activate_pipeline(spark, args.sf_dir)

    surface = bench_surface(spark, args.sf_dir)
    names = [n for n in args.names.split(",") if n] or sorted(surface)
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = surface[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"FAILED {name}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()

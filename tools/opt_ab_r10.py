"""r10 interleaved A/B + differential equivalence for the simhash rework.

Old form (r9): HOF-fold simhash64 + count-window census — replicated
inline here so both forms run in ONE process (box noise cancels).
New form: the interpreted-fold fp over an explicit narrow (id, fp)
exchange + dedup._simhash_pairs_core (bounded census aggregate +
broadcast hot-key anti/semi joins). row_simhash_fps below is the
NOT-promoted VERDICT r9 #3 candidate, kept as the A/B record.

Usage: python tools/opt_ab_r10.py [--sf-dir DIR] [--passes N] [--time/--no-time]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from rust_query_engine_greatest_spark.pipeline import dedup
from rust_query_engine_greatest_spark.session import get_spark
from rust_query_engine_greatest_spark.sources.catalog import load_table


def row_simhash_fps(df, id_col, text_col):
    """VERDICT r9 #3 candidate: (id, fp) via exploded token rows + 64
    codegen SUM aggregates (map-side partial agg; the groupBy(id)
    exchange doubles as the shared census subtree). Measured 4-6×
    SLOWER than the interpreted fold at sf0.1 (noop best 2.15 s vs
    0.38 s) — NOT promoted; kept here as the A/B record."""
    narrow = dedup._ensure_parallelism(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")))
    toks_rows = narrow.select(
        "id", F.explode_outer(
            F.array_distinct(F.split(F.lower(F.col("__t")), r" +"))
        ).alias("tok"))
    h = F.xxhash64("tok")
    masks = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
    votes = [
        F.sum(F.when(h.bitwiseAND(F.lit(m).cast("long")) != 0, 1)
              .otherwise(-1)).alias(f"_v{i}")
        for i, m in enumerate(masks)
    ]
    fp = None
    for i, m in enumerate(masks):
        bit = F.when(F.col(f"_v{i}") > 0, F.lit(m).cast("long")).otherwise(
            F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return (
        toks_rows.groupBy("id")
        .agg(*votes, F.max(F.col("tok").isNull()).alias("_null_text"))
        .select("id", F.when(F.col("_null_text"), F.lit(None).cast("long"))
                .otherwise(fp).alias("fp"))
    )


def old_simhash_pairs(df, id_col, text_col, max_hamming=3, bands=4,
                      max_bucket=1024):
    """r9 shape, verbatim semantics: fold fp + count-window census."""
    base = dedup._ensure_parallelism(df).select(
        F.col(id_col).alias("id"), dedup.simhash64(text_col).alias("fp")
    )
    banded = dedup._simhash_banded(base, bands)
    w = Window.partitionBy("band_id", "band_val")
    tagged = banded.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
    cand_ok = dedup._bucket_pairs_hamming(
        tagged.filter(F.col("_bucket_n") <= max_bucket)
        .select("id", "fp", "band_id", "band_val"),
        ["band_id", "band_val"], max_hamming, max_bucket=max_bucket,
    )
    sub = (
        tagged.filter(F.col("_bucket_n") > max_bucket)
        .select("id", "fp", "band_id", "band_val",
                F.explode(dedup._sub_keys_expr(bands, max_hamming)).alias("sb"))
        .select("id", "fp", "band_id", "band_val", "sb.sub_id", "sb.sub_val")
    )
    cand_sub = dedup._bucket_pairs_hamming(
        sub, ["band_id", "band_val", "sub_id", "sub_val"], max_hamming,
        max_bucket=max_bucket,
    )
    return cand_ok.unionByName(cand_sub).distinct()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="opt-ab-r10")
    docs = load_table(spark, args.sf_dir, "documents")

    # --- equivalence 1: fp values, fold vs row form --------------------
    fold = dedup._ensure_parallelism(docs).select(
        F.col("doc_id").alias("id"), dedup.simhash64("text").alias("fp"))
    row = row_simhash_fps(docs, "doc_id", "text")
    diff = fold.exceptAll(row).count() + row.exceptAll(fold).count()
    n = docs.count()
    print(f"fp equivalence over {n} docs: diff={diff}")
    assert diff == 0, "fp mismatch"

    # fp parity incl. NULL/empty text edge rows
    edge = spark.createDataFrame(
        [(1, None), (2, ""), (3, " "), (4, "a b a")],
        "id long, text string")
    ef = edge.select("id", dedup.simhash64("text").alias("fp"))
    er = row_simhash_fps(edge, "id", "text")
    d2 = ef.exceptAll(er).count() + er.exceptAll(ef).count()
    print(f"fp edge-row equivalence: diff={d2}")
    assert d2 == 0, "edge fp mismatch"

    # --- equivalence 2: pair sets, old vs new op -----------------------
    oldp = old_simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    newp = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    d3 = oldp.exceptAll(newp).count() + newp.exceptAll(oldp).count()
    print(f"pair-set equivalence: old={oldp.count()} diff={d3}")
    assert d3 == 0, "pair set mismatch"

    # hot-bucket regime: synthetic fps forcing census + sub-banding
    hot_rows = [(i, (7 << 16) | (i << 32)) for i in range(300)] + \
               [(1000 + i, (i << 16) | (i << 32) | 1) for i in range(200)]
    base = spark.createDataFrame(hot_rows, "id long, fp long")
    o = dedup.simhash_pairs_from_fps(base, max_hamming=3, max_bucket=100)
    # old census on same fixture
    banded = dedup._simhash_banded(base, 4)
    w = Window.partitionBy("band_id", "band_val")
    tagged = banded.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
    cand_ok = dedup._bucket_pairs_hamming(
        tagged.filter(F.col("_bucket_n") <= 100)
        .select("id", "fp", "band_id", "band_val"),
        ["band_id", "band_val"], 3, max_bucket=100)
    sub = (tagged.filter(F.col("_bucket_n") > 100)
           .select("id", "fp", "band_id", "band_val",
                   F.explode(dedup._sub_keys_expr(4, 3)).alias("sb"))
           .select("id", "fp", "band_id", "band_val", "sb.sub_id", "sb.sub_val"))
    cand_sub = dedup._bucket_pairs_hamming(
        sub, ["band_id", "band_val", "sub_id", "sub_val"], 3, max_bucket=100)
    oldh = cand_ok.unionByName(cand_sub).distinct()
    d4 = oldh.exceptAll(o).count() + o.exceptAll(oldh).count()
    print(f"hot-fixture pair-set equivalence: old={oldh.count()} diff={d4}")
    assert d4 == 0, "hot fixture mismatch"

    if args.no_time:
        print("equivalence ok (timing skipped)")
        return

    # --- interleaved timing, noop sink (guide §1.4) --------------------
    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, list[float]] = {"old": [], "new": []}
    for p in range(args.passes):
        for name, build in (("old", lambda: old_simhash_pairs(
                docs, "doc_id", "text", max_hamming=3)),
                            ("new", lambda: dedup.simhash_pairs(
                docs, "doc_id", "text", max_hamming=3))):
            spark.sparkContext.setJobDescription(f"ab-{name}-pass{p}")
            t0 = time.perf_counter()
            noop(build())
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        print(f"{name}: best={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f} "
              f"all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()

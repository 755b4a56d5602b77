"""Decompose the r10 simhash A/B: fold-vs-row fp alone, and each census
shape under each fp form. Interleaved noop timing in one process."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from rust_query_engine_greatest_spark.pipeline import dedup
from rust_query_engine_greatest_spark.session import get_spark
from rust_query_engine_greatest_spark.sources.catalog import load_table


def window_census_pairs(base, max_hamming=3, bands=4, max_bucket=1024):
    banded = dedup._simhash_banded(base, bands)
    w = Window.partitionBy("band_id", "band_val")
    tagged = banded.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
    cand_ok = dedup._bucket_pairs_hamming(
        tagged.filter(F.col("_bucket_n") <= max_bucket)
        .select("id", "fp", "band_id", "band_val"),
        ["band_id", "band_val"], max_hamming, max_bucket=max_bucket)
    sub = (tagged.filter(F.col("_bucket_n") > max_bucket)
           .select("id", "fp", "band_id", "band_val",
                   F.explode(dedup._sub_keys_expr(bands, max_hamming)).alias("sb"))
           .select("id", "fp", "band_id", "band_val", "sb.sub_id", "sb.sub_val"))
    cand_sub = dedup._bucket_pairs_hamming(
        sub, ["band_id", "band_val", "sub_id", "sub_val"], max_hamming,
        max_bucket=max_bucket)
    return cand_ok.unionByName(cand_sub).distinct()


def main() -> None:
    spark = get_spark(app_name="opt-ab-r10b")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")

    def fold_base():
        return dedup._ensure_parallelism(docs).select(
            F.col("doc_id").alias("id"), dedup.simhash64("text").alias("fp"))

    def row_base():
        from opt_ab_r10 import row_simhash_fps
        return row_simhash_fps(docs, "doc_id", "text")

    variants = {
        "fp_fold": lambda: fold_base(),
        "fp_row": lambda: row_base(),
        "win_fold": lambda: window_census_pairs(fold_base()),
        "win_row": lambda: window_census_pairs(row_base()),
        "cen_fold": lambda: dedup._simhash_pairs_core(fold_base()),
        "cen_row": lambda: dedup._simhash_pairs_core(row_base()),
    }

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results = {k: [] for k in variants}
    for p in range(5):
        for name, build in variants.items():
            spark.sparkContext.setJobDescription(f"{name}-p{p}")
            t0 = time.perf_counter()
            noop(build())
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        print(f"{name}: best={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f} "
              f"all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()

"""Table catalog over the driver TESTDATA parquet layout.

Reference parity: `ListingTable` + `TableProvider`
(`core/src/datasource/listing/table.rs:683`, `catalog/src/table.rs:36`) —
in Spark this is `spark.read.parquet` with built-in projection/predicate
pushdown and partition discovery; nothing custom is needed (SURVEY §2.1).

Scale note: at 100 TB each logical table is a directory of many parquet
files (hive-partitioned by date or key); `load_table` takes any path
glob the same way. Filters and column pruning reach the scan via
Catalyst — verified in plans/explain.py assertions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Path may be a single file or a partitioned dir.

    events.ts is parquet TIMESTAMP(NANOS); Spark has no nanosecond type
    (micros-native), so the session reads nanos as raw int64
    (legacy.parquet.nanosAsLong) and this layer applies the documented
    truncation policy: ts_µs = ts_ns DIV 1000 (SURVEY §1.2) — matching
    what DuckDB does implicitly on the oracle side."""
    from pyspark.sql import functions as F

    from . import compact

    root = compact.resolve(sf_dir)
    if root is not None:
        # compacted copies are written post-conversion (ts already µs)
        return spark.read.parquet(os.path.join(root, f"{name}.parquet"))
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every TESTDATA table as a temp view (reference analog:
    `CREATE EXTERNAL TABLE`, `sql/src/parser.rs:182`)."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

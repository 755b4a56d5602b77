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

# (sf_dir, table) -> cached DataFrame; MemTable/MemoryExec analog
# (SURVEY §2.1, core/src/datasource/memory.rs). Populated by
# cache_tables(), consulted by load_table().
_MEMORY: dict[tuple[str, str], "DataFrame"] = {}


def cache_tables(spark: SparkSession, sf_dir: str,
                 parallelism: int | None = None,
                 tables: tuple[str, ...] = TABLES) -> None:
    """Materialize every table into Spark's columnar in-memory cache —
    the reference's MemTable path (`tpch_mem` bench mode,
    benchmarks/bench.sh:73). Big tables are repartitioned up to
    `parallelism` first: a cached table inherits its scan's partition
    count, and a 1-row-group parquet file would otherwise pin every
    downstream stage to one task."""
    parallelism = parallelism or spark.sparkContext.defaultParallelism
    for name in tables:
        key = (os.path.abspath(sf_dir), name)
        if key in _MEMORY:
            continue
        df = load_table(spark, sf_dir, name)
        if df.rdd.getNumPartitions() < parallelism and name in (
                "lineitem", "orders", "events", "customer", "part"):
            df = df.repartition(parallelism)
        df = df.cache()
        df.count()  # materialize now so queries measure compute, not load
        _MEMORY[key] = df


def uncache_tables(sf_dir: str | None = None) -> None:
    for key in [k for k in _MEMORY if sf_dir is None or k[0] == os.path.abspath(sf_dir)]:
        _MEMORY.pop(key).unpersist()


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make the catalog correct in ANY caller-provided SparkSession (the
    driver passes its own, without session.py's confs): TIMESTAMP(NANOS)
    parquet (events.ts) is unreadable unless nanosAsLong is on
    (PARQUET_TYPE_ILLEGAL otherwise), and the ns→µs + oracle-hash
    contract assumes a UTC session. Both are runtime-settable; no-ops
    when session.py already configured them."""
    try:
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # never block a read over a conf we can't touch


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Path may be a single file or a partitioned dir.

    Timestamp policy (SURVEY §1.2): the reference is nanosecond-native,
    Spark is microsecond-native. When `events.ts` arrives as parquet
    TIMESTAMP(NANOS) read back as raw int64 (legacy.parquet.nanosAsLong),
    this layer truncates ts_µs = ts_ns DIV 1000 — matching DuckDB's
    implicit behavior on the oracle side. When the generator writes
    timestamp[us] directly (current TESTDATA), no conversion is needed;
    the check is on the scanned type, not an assumption about the file.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from . import bucketing, compact, stats

    _ensure_session_confs(spark)
    mem = _MEMORY.get((os.path.abspath(sf_dir), name))
    if mem is not None:
        return mem
    # Bucketed route FIRST: a bucketed layout is an explicit physical
    # request (exchange-free orderkey joins) that a stats-routed read of
    # the same table would silently bypass; bucketing.activate ANALYZEs
    # the bucketed table itself, so CBO estimates still apply to it.
    bkt = bucketing.resolve(sf_dir, name)
    if bkt is not None:
        # sorted bucketed catalog table: orderkey joins/aggs satisfy
        # their ClusteredDistribution straight off the scan
        return spark.table(bkt)
    st = stats.resolve(sf_dir, name)
    if st is not None:
        # stats-backed catalog table: same files, plus row-count/NDV
        # statistics so CBO join reorder & estimation apply (stats.py)
        return spark.table(st)
    root = compact.resolve(sf_dir)
    if root is not None:
        # compacted copies are written post-conversion (ts already µs)
        return spark.read.parquet(os.path.join(root, f"{name}.parquet"))
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Session tz is pinned to UTC, so NTZ→TIMESTAMP keeps the
            # wall-clock value; downstream code (unix_micros, watermarks)
            # expects the instant type.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
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

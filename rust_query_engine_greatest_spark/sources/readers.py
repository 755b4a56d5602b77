"""File-format readers beyond parquet (SURVEY §2.1: CsvExec, NdJsonExec,
AvroExec, ArrowExec, MemoryExec equivalents).

- CSV/JSON: native Spark sources (schema-explicit by default; inference
  opt-in, mirroring the reference's infer-for-ingest behavior).
- Avro: requires the external spark-avro jar — gated, raises a clear
  error if absent (not in this environment).
- Arrow IPC: no native Spark source; implemented distributed via
  binaryFile scan + mapInArrow decode, so file-level parallelism is
  preserved (no driver collect).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
    infer: bool = False,
) -> DataFrame:
    """CsvExec analog (csv.rs:74): delimiter/header/compression are
    reader options; compression is inferred from file extension."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_ndjson(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """NdJsonExec analog (json.rs:53): newline-delimited JSON."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """AvroExec analog (avro.rs:38). Prefers the native spark-avro
    source (splittable, full type coverage); when the jar is absent
    (this container) falls back to the pure-Python container decoder in
    avro_fallback.py — distributed via binaryFile + mapInArrow, nested
    records/arrays/maps + timestamp/date/decimal logical types,
    null/deflate codecs. Only the jar-missing AnalysisException reroutes
    to the fallback; any other failure (missing path, corrupt file)
    propagates with its real cause."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.format("avro").load(path)
    except AnalysisException as exc:
        if "Failed to find data source" not in str(exc):
            raise
        from .avro_fallback import read_avro_fallback

        return read_avro_fallback(spark, path)


def read_arrow_ipc(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """ArrowExec analog (arrow_file.rs:50): distributed Arrow IPC file
    scan. binaryFile lists+reads files in parallel; mapInArrow decodes
    each file's batches JVM→Arrow→JVM without a driver hop."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path).select("content")

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            for blob in b.column("content").to_pylist():
                with pa.ipc.open_file(pa.BufferReader(blob)) as rd:
                    for i in range(rd.num_record_batches):
                        yield rd.get_batch(i)

    return files.mapInArrow(decode, schema=schema)


def from_pylist(spark: SparkSession, rows: list, schema: T.StructType | str) -> DataFrame:
    """MemoryExec analog (memory.rs:44): in-memory batches → DataFrame
    (Arrow-backed createDataFrame)."""
    return spark.createDataFrame(rows, schema)

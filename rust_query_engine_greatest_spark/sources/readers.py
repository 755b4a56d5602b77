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


def read_auto(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """Url-table / dynamic-file analog (the reference's
    ``enable_url_table`` feature, core/src/datasource/dynamic_file.rs;
    exercised by sqllogictest dynamic_file.slt): query a file or
    directory path directly, inferring the format from the data-file
    extension. Hive-partitioned directories get native partition
    discovery from the csv/json/parquet sources; partitioned Arrow IPC
    layouts are unioned per leaf with the partition values re-attached
    (leaf listing is a driver-side directory walk — metadata only, the
    file bytes stay executor-side)."""
    import os

    ext = None
    if os.path.isfile(path):
        ext = path.rsplit(".", 1)[-1].lower()
    else:
        for _root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if "." in f and not f.startswith((".", "_")):
                    e = f.rsplit(".", 1)[-1].lower()
                    if e in ("parquet", "csv", "json", "arrow", "avro"):
                        ext = e
                        break
            if ext:
                break
    if ext == "parquet":
        return spark.read.parquet(path)
    if ext == "json":
        return read_ndjson(spark, path, schema)
    if ext == "csv":
        return read_csv(spark, path, schema=schema, header=True,
                        infer=schema is None)
    if ext == "avro":
        return read_avro(spark, path)
    if ext == "arrow":
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.types import from_arrow_schema

        import pyarrow as pa

        if os.path.isfile(path):
            leaves: dict[str, dict[str, str]] = {path: {}}
            first_file = path
        else:
            leaves = {}
            for root, _dirs, files in os.walk(path):
                if any(f.endswith(".arrow") for f in files):
                    kv = {}
                    for seg in os.path.relpath(root, path).split(os.sep):
                        if "=" in seg:
                            k, _, v = seg.partition("=")
                            kv[k] = v
                    leaves[root] = kv
            if not leaves:
                raise FileNotFoundError(f"no .arrow files under {path}")
            first = next(iter(sorted(leaves)))
            first_file = os.path.join(first, sorted(
                f for f in os.listdir(first) if f.endswith(".arrow"))[0])
        if schema is None:
            with pa.ipc.open_file(first_file) as rd:
                schema = from_arrow_schema(rd.schema)
        out = None
        for root, kv in sorted(leaves.items()):
            df = read_arrow_ipc(spark, root, schema)
            for k, v in kv.items():
                df = df.withColumn(
                    k, F.lit(int(v)) if v.lstrip("-").isdigit() else F.lit(v))
            out = df if out is None else out.unionByName(df)
        return out
    raise ValueError(f"cannot infer a data format for path {path!r}")

"""Sinks (SURVEY §2.1: DataSinkExec, DataFrame::write_*, COPY TO).

parquet/csv/json writers are Spark-native (per-partition parallel
writers, exactly the reference's FileSinkConfig pipeline,
physical-plan/src/insert.rs:50). Arrow IPC is a custom distributed sink
via mapInArrow (one file per partition). `insert_into` covers the
INSERT INTO / saveAsTable path against the session catalog.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",",
              compression: str | None = None, mode: str = "overwrite") -> None:
    w = df.write.mode(mode).option("header", header).option("sep", sep)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_arrow_ipc(df: DataFrame, path: str, mode: str = "overwrite") -> int:
    """Distributed Arrow IPC sink: each partition serializes its batches
    to one .arrow file (task-side, no driver hop); returns file count.
    mode='overwrite' clears previous .arrow files first — task files are
    uuid-named, so without it a rerun would silently double the data."""
    import glob

    import pyarrow as pa

    os.makedirs(path, exist_ok=True)
    if mode == "overwrite":
        for old in glob.glob(os.path.join(path, "part-*.arrow")):
            os.remove(old)

    def encode(batches):
        import os as _os
        import uuid

        first = None
        for b in batches:
            first = b
            break
        if first is None:
            return iter([])
        fname = _os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        with pa.OSFile(fname, "wb") as f, pa.ipc.new_file(f, first.schema) as w:
            w.write_batch(first)
            for b in batches:
                w.write_batch(b)
        import pandas as pd

        return iter([pa.RecordBatch.from_pandas(pd.DataFrame({"file": [fname]}))])

    out = df.mapInArrow(encode, schema="file string")
    return out.count()


def insert_into(spark: SparkSession, df: DataFrame, table: str,
                partition_by: list[str] | None = None) -> None:
    """INSERT INTO pipeline (DataSink trait, insert.rs:82): create the
    catalog table on first write, append after."""
    if not spark.catalog.tableExists(table):
        w = df.write
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.saveAsTable(table)
    else:
        df.write.insertInto(table)

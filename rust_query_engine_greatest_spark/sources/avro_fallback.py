"""Pure-Python Avro Object Container File reader — the fallback decode
path for AvroExec parity (reference
core/src/datasource/physical_plan/avro.rs:38) when the spark-avro jar
is absent (this container). Implements the public Avro 1.11 spec
subset that covers flat record files: null/deflate codecs; null,
boolean, int, long, float, double, bytes, string fields; and
2-branch unions with null (nullable fields).

Spark-side shape: `spark.read.format("binaryFile")` lists and reads
files in parallel (one task per file), and an Arrow-batched
`mapInPandas` decodes each container — executor-side, no driver hop.
Limitation vs the jar: a single container file is not split across
tasks (parallelism is per-file, which is how large Avro datasets are
laid out anyway); nested records/arrays/maps/enums are out of scope and
raise with an actionable message.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"

_PRIMITIVE_SPARK = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf, self.pos = buf, pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def zlong(self) -> int:
        """Avro long = zigzag varint."""
        shift = acc = 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def zbytes(self) -> bytes:
        return self.read(self.zlong())


def _read_header(cur: _Cursor) -> tuple[dict, bytes]:
    if cur.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = cur.zlong()
        if n == 0:
            break
        if n < 0:  # negative block count is followed by a byte size
            n, _ = -n, cur.zlong()
        for _ in range(n):
            # key MUST be read before value (Python assignment evaluates
            # the RHS first, so a one-liner would swap the reads)
            key = cur.zbytes().decode()
            meta[key] = cur.zbytes()
    return meta, cur.read(16)


def _field_decoders(schema: dict):
    """[(name, decode(cursor) -> value)] for a flat record schema."""
    if schema.get("type") != "record":
        raise NotImplementedError("fallback Avro reader supports record schemas only")

    def prim(t: str):
        return {
            "null": lambda c: None,
            "boolean": lambda c: c.read(1) == b"\x01",
            "int": _Cursor.zlong,
            "long": _Cursor.zlong,
            "float": lambda c: struct.unpack("<f", c.read(4))[0],
            "double": lambda c: struct.unpack("<d", c.read(8))[0],
            "bytes": _Cursor.zbytes,
            "string": lambda c: c.zbytes().decode(),
        }[t]

    out = []
    for f in schema["fields"]:
        ft = f["type"]
        if isinstance(ft, str) and ft in _PRIMITIVE_SPARK:
            out.append((f["name"], prim(ft)))
        elif (
            isinstance(ft, list)
            and len(ft) == 2
            and "null" in ft
            and all(isinstance(b, str) for b in ft)
        ):
            branches = [prim(b) for b in ft]
            out.append((
                f["name"],
                lambda c, _b=branches: _b[c.zlong()](c),
            ))
        else:
            raise NotImplementedError(
                f"fallback Avro reader: unsupported field type {ft!r} "
                "(nested/complex types need the spark-avro jar)"
            )
    return out


def _spark_schema(schema: dict) -> T.StructType:
    fields = []
    for f in schema["fields"]:
        ft = f["type"]
        if isinstance(ft, str):
            fields.append(T.StructField(f["name"], _PRIMITIVE_SPARK[ft], True))
        else:
            branch = next(b for b in ft if b != "null")
            fields.append(T.StructField(f["name"], _PRIMITIVE_SPARK[branch], True))
    return T.StructType(fields)


def decode_container(blob: bytes) -> tuple[dict, list[tuple]]:
    """One container file → (schema json, rows). Executor-side kernel."""
    cur = _Cursor(blob)
    meta, sync = _read_header(cur)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    decoders = _field_decoders(schema)
    rows: list[tuple] = []
    while cur.pos < len(blob):
        count = cur.zlong()
        size = cur.zlong()
        block = cur.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"Avro codec {codec!r} unsupported in fallback")
        if cur.read(16) != sync:
            raise ValueError("Avro sync marker mismatch (corrupt block)")
        bcur = _Cursor(block)
        for _ in range(count):
            rows.append(tuple(dec(bcur) for _, dec in decoders))
    return schema, rows


def read_avro_fallback(spark: SparkSession, path: str) -> DataFrame:
    """Distributed scan: binaryFile source lists the files, each task
    decodes its containers with the pure-Python kernel above."""
    import pandas as pd

    # schema comes from one file's header, read driver-side (header
    # only — bounded, like every engine's schema inference)
    first = spark.read.format("binaryFile").load(path).select("content").head()
    if first is None:
        raise ValueError(f"no Avro files under {path}")
    cur = _Cursor(bytes(first["content"]))
    meta, _ = _read_header(cur)
    spark_schema = _spark_schema(json.loads(meta["avro.schema"]))
    cols = [f.name for f in spark_schema.fields]

    files = spark.read.format("binaryFile").load(path).select("content")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                _, rows = decode_container(bytes(blob))
                yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(op, schema=spark_schema)


# ---- encoder / writer (DataSink parity for the fallback path) -------------

_SPARK_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BinaryType: "bytes",
    T.StringType: "string",
}


def _wlong(n: int) -> bytes:
    """Avro long: zigzag + varint."""
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _value_encoder(avro_t: str):
    # int(v)/float(v) normalize the numpy scalars pandas hands over
    # (a nullable long column arrives as float64 when NaN is present)
    return {
        "boolean": lambda v: b"\x01" if v else b"\x00",
        "int": lambda v: _wlong(int(v)),
        "long": lambda v: _wlong(int(v)),
        "float": lambda v: struct.pack("<f", float(v)),
        "double": lambda v: struct.pack("<d", float(v)),
        "bytes": lambda v: _wlong(len(v)) + bytes(v),
        "string": lambda v: _wlong(len(e := str(v).encode())) + e,
    }[avro_t]


def avro_schema_of(schema: T.StructType, name: str = "row") -> dict:
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", _SPARK_TO_AVRO[type(f.dataType)]]}
            for f in schema.fields
        ],
    }


def encode_container(schema: dict, rows, codec: str = "deflate") -> bytes:
    """rows of tuples → one Avro object container file (single block)."""
    encs = [
        _value_encoder(next(b for b in f["type"] if b != "null"))
        for f in schema["fields"]
    ]
    body = bytearray()
    n = 0
    for row in rows:
        for enc, v in zip(encs, row):
            if v is None:
                body += _wlong(0)
            else:
                body += _wlong(1) + enc(v)
        n += 1
    block = zlib.compress(bytes(body), 6)[2:-4] if codec == "deflate" else bytes(body)
    sync = b"\x00" * 8 + struct.pack("<Q", zlib.crc32(json.dumps(schema).encode()))
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out = bytearray(_MAGIC)
    out += _wlong(len(meta))
    for k, v in meta.items():
        ke = k.encode()
        out += _wlong(len(ke)) + ke + _wlong(len(v)) + v
    out += _wlong(0)
    out += sync
    if n:
        out += _wlong(n) + _wlong(len(block)) + block + sync
    return bytes(out)


def write_avro_fallback(df: DataFrame, dst_dir: str, codec: str = "deflate") -> int:
    """Per-partition container files written executor-side (local/shared
    filesystem; object stores need the spark-avro jar's committer).
    Returns the number of files written."""
    import os
    import uuid

    import pandas as pd

    os.makedirs(dst_dir, exist_ok=True)
    schema = avro_schema_of(df.schema)
    cols = df.columns

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[tuple] = []
        for pdf in batches:
            rows.extend(
                tuple(None if pd.isna(v) else v for v in r)
                for r in pdf[cols].itertuples(index=False, name=None)
            )
        if rows:
            path = os.path.join(dst_dir, f"part-{uuid.uuid4().hex}.avro")
            with open(path, "wb") as fh:
                fh.write(encode_container(schema, rows, codec))
            yield pd.DataFrame({"path": [path], "n": [len(rows)]})

    return len(df.mapInPandas(op, schema="path string, n long").collect())

"""Pure-Python Avro Object Container File codec — the fallback path for
AvroExec parity (reference core/src/datasource/physical_plan/avro.rs:38)
when the spark-avro jar is absent (this container). Implements the
public Avro 1.11 spec subset that covers practical datasets:

- codecs: null, deflate, bzip2, xz (stdlib), snappy, zstandard (via
  pyarrow's bundled compressors; snappy carries the spec's 4-byte CRC)
- primitives: null, boolean, int, long, float, double, bytes, string
- complex: record (nested), array, map, enum, fixed, 2-branch unions
  with null (nullable fields)
- logical types: timestamp-micros / timestamp-millis (long), date
  (int), decimal (bytes/fixed)

Spark-side shape: `spark.read.format("binaryFile")` lists and reads
files in parallel (one task per file), and an Arrow-batched `mapInArrow`
decodes each container — executor-side, no driver hop, and no pandas
float64 round-trip (a nullable long column in pandas becomes float64
and silently corrupts values above 2^53; Arrow batches carry exact
int64). Limitation vs the jar: a single container file is not split
across tasks (parallelism is per-file, which is how large Avro datasets
are laid out anyway); multi-branch non-null unions and recursive named
type references raise with an actionable message.
"""

from __future__ import annotations

import datetime
import decimal
import json
import struct
import zlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"
_EPOCH = datetime.datetime(1970, 1, 1)
_EPOCH_DATE = datetime.date(1970, 1, 1)


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


class _StrictCursor(_Cursor):
    """Raises on short reads — used when parsing a possibly-truncated
    buffer (streaming header inference) where a silent short read could
    otherwise yield a wrong-but-parseable result."""

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise IndexError("short read")
        return super().read(n)


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


# ---- recursive type conversion --------------------------------------------
# One walk of the Avro schema yields, per type: the Spark type, the
# Arrow type, a decoder(cursor) -> Python value, and an
# encoder(bytearray, value). Decoders/encoders are closures — no
# per-value type dispatch in the hot loop.

_PRIM = {
    "null": (T.NullType(), pa.null()),
    "boolean": (T.BooleanType(), pa.bool_()),
    "int": (T.IntegerType(), pa.int32()),
    "long": (T.LongType(), pa.int64()),
    "float": (T.FloatType(), pa.float32()),
    "double": (T.DoubleType(), pa.float64()),
    "bytes": (T.BinaryType(), pa.binary()),
    "string": (T.StringType(), pa.string()),
}


def _enc_str(body: bytearray, v) -> None:
    e = str(v).encode()
    body += _wlong(len(e)) + e


def _ts_micros(v) -> int:
    """datetime → epoch micros via exact integer arithmetic (a float
    total_seconds() loses precision past ~2^53 µs). Aware datetimes are
    normalized to UTC; naive ones are taken as written (symmetric with
    the decoder, which emits naive)."""
    if v.tzinfo is not None:
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    td = v - _EPOCH
    return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds


def _int_bytes(x: int) -> bytes:
    """Big-endian two's complement, width-sufficient (Avro decimal)."""
    return x.to_bytes(max(1, (x.bit_length() + 8) // 8), "big", signed=True)


class _Conv:
    __slots__ = ("spark", "arrow", "dec", "enc")

    def __init__(self, spark, arrow, dec, enc):
        self.spark, self.arrow, self.dec, self.enc = spark, arrow, dec, enc


def _unsupported(ft) -> NotImplementedError:
    return NotImplementedError(
        f"fallback Avro codec: unsupported type {ft!r} "
        "(multi-branch non-null unions / recursive refs need the spark-avro jar)"
    )


def _conv(ft) -> _Conv:  # noqa: C901  (one dispatch table, branch-per-type)
    if isinstance(ft, str):
        if ft not in _PRIM:
            raise _unsupported(ft)
        st, at = _PRIM[ft]
        dec = {
            "null": lambda c: None,
            "boolean": lambda c: c.read(1) == b"\x01",
            "int": _Cursor.zlong,
            "long": _Cursor.zlong,
            "float": lambda c: struct.unpack("<f", c.read(4))[0],
            "double": lambda c: struct.unpack("<d", c.read(8))[0],
            "bytes": _Cursor.zbytes,
            "string": lambda c: c.zbytes().decode(),
        }[ft]
        enc = {
            "null": lambda body, v: None,
            "boolean": lambda body, v: body.extend(b"\x01" if v else b"\x00"),
            "int": lambda body, v: body.extend(_wlong(int(v))),
            "long": lambda body, v: body.extend(_wlong(int(v))),
            "float": lambda body, v: body.extend(struct.pack("<f", float(v))),
            "double": lambda body, v: body.extend(struct.pack("<d", float(v))),
            "bytes": lambda body, v: body.extend(_wlong(len(v)) + bytes(v)),
            "string": _enc_str,
        }[ft]
        return _Conv(st, at, dec, enc)

    if isinstance(ft, list):  # union
        if len(ft) != 2 or not any(b == "null" for b in ft):
            raise _unsupported(ft)
        null_idx = ft.index("null")
        other = _conv(ft[1 - null_idx])
        branch_dec = [None, None]
        branch_dec[null_idx] = lambda c: None
        branch_dec[1 - null_idx] = other.dec

        def dec(c):
            return branch_dec[c.zlong()](c)

        def enc(body: bytearray, v) -> None:
            if v is None:
                body += _wlong(null_idx)
            else:
                body += _wlong(1 - null_idx)
                other.enc(body, v)

        return _Conv(other.spark, other.arrow, dec, enc)

    if not isinstance(ft, dict):
        raise _unsupported(ft)

    t, lt = ft.get("type"), ft.get("logicalType")

    if lt == "decimal" and t in ("bytes", "fixed"):
        p, s = int(ft["precision"]), int(ft.get("scale", 0))
        size = int(ft["size"]) if t == "fixed" else None
        scale = decimal.Decimal(1).scaleb(-s)

        def dec(c, _size=size, _scale=scale):
            raw = c.read(_size) if _size is not None else c.zbytes()
            return decimal.Decimal(int.from_bytes(raw, "big", signed=True)) * _scale

        def enc(body: bytearray, v, _size=size, _s=s) -> None:
            unscaled = int(decimal.Decimal(v).scaleb(_s).to_integral_value())
            raw = (
                unscaled.to_bytes(_size, "big", signed=True)
                if _size is not None
                else _int_bytes(unscaled)
            )
            if _size is None:
                body += _wlong(len(raw))
            body += raw

        return _Conv(T.DecimalType(p, s), pa.decimal128(p, s), dec, enc)

    if lt in ("timestamp-micros", "timestamp-millis") and t == "long":
        unit = 1 if lt == "timestamp-micros" else 1000

        def dec(c, _u=unit):
            return _EPOCH + datetime.timedelta(microseconds=c.zlong() * _u)

        def enc(body: bytearray, v, _u=unit) -> None:
            body += _wlong(_ts_micros(v) // _u)

        return _Conv(T.TimestampType(), pa.timestamp("us"), dec, enc)

    if lt == "date" and t == "int":
        def dec(c):
            return _EPOCH_DATE + datetime.timedelta(days=c.zlong())

        def enc(body: bytearray, v) -> None:
            body += _wlong((v - _EPOCH_DATE).days)

        return _Conv(T.DateType(), pa.date32(), dec, enc)

    if t == "record":
        names = [f["name"] for f in ft["fields"]]
        convs = [_conv(f["type"]) for f in ft["fields"]]

        def dec(c, _n=names, _cv=convs):
            return {n: cv.dec(c) for n, cv in zip(_n, _cv)}

        def enc(body: bytearray, v, _n=names, _cv=convs) -> None:
            for n, cv in zip(_n, _cv):
                cv.enc(body, v[n] if isinstance(v, dict) else getattr(v, n))

        return _Conv(
            T.StructType([T.StructField(n, cv.spark, True) for n, cv in zip(names, convs)]),
            pa.struct([pa.field(n, cv.arrow) for n, cv in zip(names, convs)]),
            dec,
            enc,
        )

    if t == "array":
        item = _conv(ft["items"])

        def dec(c, _i=item):
            out = []
            while True:
                n = c.zlong()
                if n == 0:
                    return out
                if n < 0:
                    n, _ = -n, c.zlong()  # block byte size, unused
                out.extend(_i.dec(c) for _ in range(n))

        def enc(body: bytearray, v, _i=item) -> None:
            if v:
                body += _wlong(len(v))
                for x in v:
                    _i.enc(body, x)
            body += _wlong(0)

        return _Conv(T.ArrayType(item.spark, True), pa.list_(item.arrow), dec, enc)

    if t == "map":
        val = _conv(ft["values"])

        def dec(c, _v=val):
            out = []
            while True:
                n = c.zlong()
                if n == 0:
                    return out
                if n < 0:
                    n, _ = -n, c.zlong()
                for _ in range(n):
                    k = c.zbytes().decode()
                    out.append((k, _v.dec(c)))

        def enc(body: bytearray, v, _v=val) -> None:
            items = list(v.items()) if isinstance(v, dict) else list(v)
            if items:
                body += _wlong(len(items))
                for k, x in items:
                    _enc_str(body, k)
                    _v.enc(body, x)
            body += _wlong(0)

        return _Conv(
            T.MapType(T.StringType(), val.spark, True),
            pa.map_(pa.string(), val.arrow),
            dec,
            enc,
        )

    if t == "enum":
        symbols = list(ft["symbols"])

        def dec(c, _s=symbols):
            return _s[c.zlong()]

        def enc(body: bytearray, v, _s=symbols) -> None:
            body += _wlong(_s.index(v))

        return _Conv(T.StringType(), pa.string(), dec, enc)

    if t == "fixed":
        size = int(ft["size"])
        return _Conv(
            T.BinaryType(),
            pa.binary(),
            lambda c, _n=size: c.read(_n),
            lambda body, v, _n=size: body.extend(bytes(v)[:_n].rjust(_n, b"\x00")),
        )

    # {"type": "string"}-style wrapping of any other schema
    return _conv(t)


def _field_decoders(schema: dict):
    """[(name, decode(cursor) -> value)] for a record schema (any
    nesting the subset supports)."""
    if schema.get("type") != "record":
        raise NotImplementedError("fallback Avro reader supports record schemas only")
    return [(f["name"], _conv(f["type"]).dec) for f in schema["fields"]]


def _spark_schema(schema: dict) -> T.StructType:
    return T.StructType(
        [T.StructField(f["name"], _conv(f["type"]).spark, True) for f in schema["fields"]]
    )


def _arrow_schema(schema: dict) -> pa.Schema:
    return pa.schema(
        [pa.field(f["name"], _conv(f["type"]).arrow) for f in schema["fields"]]
    )


def _snappy_uncompressed_len(block: bytes) -> int:
    """Raw-snappy blocks lead with the uncompressed length as a varint
    (snappy format description §1) — pyarrow's decompress requires it."""
    size = shift = 0
    for i, byte in enumerate(block):
        size |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return size
        shift += 7
        if i > 9:
            break
    raise ValueError("bad snappy length varint")


def _zstd_content_size(block: bytes) -> int:
    """Frame_Content_Size from a zstd frame header (RFC 8878 §3.1.1) —
    present in single-shot frames, which is all Avro blocks are."""
    if len(block) < 6 or block[:4] != b"\x28\xb5\x2f\xfd":
        raise ValueError("not a zstd frame")
    fhd = block[4]
    fcs_flag, single_seg, did_flag = fhd >> 6, (fhd >> 5) & 1, fhd & 3
    pos = 5 + (0 if single_seg else 1) + (0, 1, 2, 4)[did_flag]
    if fcs_flag == 0:
        if not single_seg:
            raise ValueError("zstd frame has no content size")
        return block[pos]
    width = (0, 2, 4, 8)[fcs_flag]
    val = int.from_bytes(block[pos:pos + width], "little")
    return val + (256 if fcs_flag == 1 else 0)


def _decompress_block(block: bytes, codec: str) -> bytes:
    """Avro 1.11 block codecs. null/deflate are self-contained; bzip2/xz
    use the stdlib; snappy (4-byte big-endian CRC32-of-plain suffix per
    the spec) and zstandard go through pyarrow's bundled codecs."""
    if codec == "null":
        return block
    if codec == "deflate":
        return zlib.decompress(block, -15)
    if codec == "bzip2":
        import bz2

        return bz2.decompress(block)
    if codec == "xz":
        import lzma

        return lzma.decompress(block)
    if codec == "snappy":
        import pyarrow as _pa

        data, crc = block[:-4], block[-4:]
        out = bytes(_pa.Codec("snappy").decompress(
            data, _snappy_uncompressed_len(data)))
        if struct.pack(">I", zlib.crc32(out) & 0xFFFFFFFF) != crc:
            raise ValueError("Avro snappy block CRC mismatch")
        return out
    if codec == "zstandard":
        import pyarrow as _pa

        return bytes(_pa.Codec("zstd").decompress(
            block, _zstd_content_size(block)))
    raise NotImplementedError(f"Avro codec {codec!r} unsupported in fallback")


def _compress_block(body: bytes, codec: str) -> bytes:
    if codec == "null":
        return body
    if codec == "deflate":
        return zlib.compress(body, 6)[2:-4]
    if codec == "bzip2":
        import bz2

        return bz2.compress(body)
    if codec == "xz":
        import lzma

        return lzma.compress(body)
    if codec == "snappy":
        import pyarrow as _pa

        return bytes(_pa.Codec("snappy").compress(body)) + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)
    if codec == "zstandard":
        import pyarrow as _pa

        return bytes(_pa.Codec("zstd").compress(body))
    raise NotImplementedError(f"Avro codec {codec!r} unsupported in fallback")


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
        block = _decompress_block(block, codec)
        if cur.read(16) != sync:
            raise ValueError("Avro sync marker mismatch (corrupt block)")
        bcur = _Cursor(block)
        for _ in range(count):
            rows.append(tuple(dec(bcur) for _, dec in decoders))
    return schema, rows


def _header_avro_schema(spark: SparkSession, path: str) -> dict:
    """Schema from the first file's header, WITHOUT materializing a
    whole file on the driver: list paths only (binaryFile prunes the
    content column), then stream-parse the header in 64 KiB chunks for
    local files; non-local URIs parse the header executor-side and ship
    back just the schema JSON string."""
    first = spark.read.format("binaryFile").load(path).select("path").head()
    if first is None:
        raise ValueError(f"no Avro files under {path}")
    p = first["path"]
    if p.startswith("file:"):
        buf = b""
        with open(p[len("file:"):], "rb") as fh:
            while True:
                chunk = fh.read(65536)
                buf += chunk
                try:
                    meta, _ = _read_header(_StrictCursor(buf))
                    return json.loads(meta["avro.schema"].decode())
                except IndexError:
                    if not chunk:
                        raise ValueError(f"truncated Avro header in {p}") from None

    one = spark.read.format("binaryFile").load(path).limit(1).select("content")

    def hop(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for blob in batch.column(0):
                meta, _ = _read_header(_Cursor(blob.as_py()))
                yield pa.RecordBatch.from_pydict(
                    {"s": [meta["avro.schema"].decode()]}
                )
                return

    return json.loads(one.mapInArrow(hop, "s string").head()["s"])


def read_avro_fallback(spark: SparkSession, path: str) -> DataFrame:
    """Distributed scan: binaryFile source lists the files, each task
    decodes its containers with the pure-Python kernel above and emits
    exact-typed Arrow batches."""
    avro_sch = _header_avro_schema(spark, path)
    spark_schema = _spark_schema(avro_sch)
    arrow_schema = _arrow_schema(avro_sch)
    cols = [f.name for f in spark_schema.fields]

    files = spark.read.format("binaryFile").load(path).select("content")

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for blob in batch.column(0):
                _, rows = decode_container(blob.as_py())
                arrays = [
                    pa.array([r[i] for r in rows], type=arrow_schema.types[i])
                    for i in range(len(cols))
                ]
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return files.mapInArrow(op, schema=spark_schema)


# ---- encoder / writer (DataSink parity for the fallback path) -------------


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


def _avro_type_of(dt: T.DataType, ctr: list[int]):
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.IntegerType):
        return "int"
    if isinstance(dt, (T.LongType, T.ShortType, T.ByteType)):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": ["null", _avro_type_of(dt.elementType, ctr)]}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise NotImplementedError("Avro maps require string keys")
        return {"type": "map", "values": ["null", _avro_type_of(dt.valueType, ctr)]}
    if isinstance(dt, T.StructType):
        ctr[0] += 1
        return {
            "type": "record",
            "name": f"rec{ctr[0]}",
            "fields": [
                {"name": f.name, "type": ["null", _avro_type_of(f.dataType, ctr)]}
                for f in dt.fields
            ],
        }
    raise NotImplementedError(f"Avro writer: unsupported Spark type {dt}")


def avro_schema_of(schema: T.StructType, name: str = "row") -> dict:
    ctr = [0]
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", _avro_type_of(f.dataType, ctr)]}
            for f in schema.fields
        ],
    }


def encode_container(schema: dict, rows, codec: str = "deflate") -> bytes:
    """rows of tuples → one Avro object container file (single block)."""
    encs = [_conv(f["type"]).enc for f in schema["fields"]]
    body = bytearray()
    n = 0
    for row in rows:
        for enc, v in zip(encs, row):
            enc(body, v)
        n += 1
    block = _compress_block(bytes(body), codec)
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
    Arrow batches in (exact int64/decimal/timestamp values — no pandas
    float64 round-trip), container files out. Returns the number of
    files written."""
    import os
    import uuid

    os.makedirs(dst_dir, exist_ok=True)
    schema = avro_schema_of(df.schema)
    cols = df.columns

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        rows: list[tuple] = []
        for batch in batches:
            data = batch.to_pylist()
            rows.extend(tuple(r[c] for c in cols) for r in data)
        if rows:
            path = os.path.join(dst_dir, f"part-{uuid.uuid4().hex}.avro")
            with open(path, "wb") as fh:
                fh.write(encode_container(schema, rows, codec))
            yield pa.RecordBatch.from_pydict({"path": [path], "n": [len(rows)]})

    return len(df.mapInArrow(op, schema="path string, n long").collect())

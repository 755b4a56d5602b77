"""Synthesize the Avro fixtures avro.slt needs.

The reference reads these from its `testing/` submodule
(arrow-testing/data/avro/*), which is not checked out in this
container. Every file's CONTENT is fully determined by avro.slt's own
expected outputs plus the canonical alltypes_plain layout (the same
8-row fixture the parquet/arrow ecosystems ship: ids in file order
4,5,6,7,2,3,0,1; every non-id column a function of id%2; one
month per id pair). The repo's own pure-Python Avro writer
(sources/avro_fallback.py) produces real container files for all five
codecs avro.slt exercises — null, snappy, bzip2, xz, zstandard — so
the slt blocks verify the actual decode path, not a stub.

Generated once into /tmp/slt_avro_fixtures; slt_runner resolves
`../../testing/data/avro/<name>` here.
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_query_engine_greatest_spark.sources.avro_fallback import (  # noqa: E402
    encode_container,
)

FIXTURE_DIR = "/tmp/slt_avro_fixtures"

_NULLABLE = lambda t: ["null", t]  # noqa: E731

_ALLTYPES_SCHEMA = {
    "type": "record",
    "name": "alltypes_plain",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "bool_col", "type": "boolean"},
        {"name": "tinyint_col", "type": "int"},
        {"name": "smallint_col", "type": "int"},
        {"name": "int_col", "type": "int"},
        {"name": "bigint_col", "type": "long"},
        {"name": "float_col", "type": "float"},
        {"name": "double_col", "type": "double"},
        {"name": "date_string_col", "type": "bytes"},
        {"name": "string_col", "type": "bytes"},
        {"name": "timestamp_col",
         "type": {"type": "long", "logicalType": "timestamp-micros"}},
    ],
}

# file row order 4,5,6,7,2,3,0,1; (month, minute) per id
_ALLTYPES_IDS = [(4, 3), (5, 3), (6, 4), (7, 4),
                 (2, 2), (3, 2), (0, 1), (1, 1)]


def _alltypes_rows() -> list[tuple]:
    rows = []
    for rid, month in _ALLTYPES_IDS:
        k = rid % 2
        ts = datetime.datetime(2009, month, 1, 0, k, 0)
        rows.append((
            rid, k == 0, k, k, k, 10 * k, 1.1 * k, 10.1 * k,
            f"{month:02d}/01/09".encode(), str(k).encode(), ts,
        ))
    return rows


_NESTED_SCHEMA = {
    "type": "record",
    "name": "nested_records",
    "fields": [
        {"name": "f1", "type": {
            "type": "record", "name": "f1_t", "fields": [
                {"name": "f1_1", "type": "string"},
                {"name": "f1_2", "type": "int"},
                {"name": "f1_3", "type": {
                    "type": "record", "name": "f1_3_t", "fields": [
                        {"name": "f1_3_1", "type": "double"}]}},
            ]}},
        {"name": "f2", "type": {"type": "array", "items": {
            "type": "record", "name": "f2_t", "fields": [
                {"name": "f2_1", "type": "boolean"},
                {"name": "f2_2", "type": "float"}]}}},
        {"name": "f3", "type": ["null", {
            "type": "record", "name": "f3_t", "fields": [
                {"name": "f3_1", "type": "string"}]}]},
        {"name": "f4", "type": {"type": "array", "items": ["null", {
            "type": "record", "name": "f4_t", "fields": [
                {"name": "f4_1", "type": "int"}]}]}},
    ],
}

_NESTED_ROWS = [
    ({"f1_1": "aaa", "f1_2": 10, "f1_3": {"f1_3_1": 3.14}},
     [{"f2_1": True, "f2_2": 1.2}, {"f2_1": True, "f2_2": 2.2}],
     {"f3_1": "xyz"},
     [{"f4_1": 200}, None]),
    ({"f1_1": "bbb", "f1_2": 20, "f1_3": {"f1_3_1": 3.14}},
     [{"f2_1": False, "f2_2": 10.2}],
     None,
     [None, {"f4_1": 300}]),
]

_ENUM_SCHEMA = {
    "type": "record",
    "name": "simple_enum",
    "fields": [
        {"name": "f1", "type": {"type": "enum", "name": "e1",
                                "symbols": ["a", "b", "c", "d"]}},
        {"name": "f2", "type": {"type": "enum", "name": "e2",
                                "symbols": ["e", "f", "g", "h"]}},
        {"name": "f3", "type": ["null", {"type": "enum", "name": "e3",
                                         "symbols": ["i", "j", "k"]}]},
    ],
}

_ENUM_ROWS = [("a", "g", "j"), ("b", "h", "k"), ("c", "e", None),
              ("d", "f", "i")]

_FIXED_SCHEMA = {
    "type": "record",
    "name": "simple_fixed",
    "fields": [
        {"name": "f1", "type": {"type": "fixed", "name": "x1", "size": 5}},
        {"name": "f2", "type": {"type": "fixed", "name": "x2", "size": 10}},
        {"name": "f3", "type": ["null", {"type": "fixed", "name": "x3",
                                         "size": 6}]},
    ],
}

_FIXED_ROWS = [
    (b"abcde", b"fghijklmno", b"ABCDEF"),
    (b"12345", b"1234567890", None),
]

_SINGLE_NAN_SCHEMA = {
    "type": "record",
    "name": "single_nan",
    "fields": [{"name": "mycol", "type": ["null", "float"]}],
}


def ensure_fixtures() -> str:
    """Generate (idempotently) every avro.slt fixture; returns the dir."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    done = os.path.join(FIXTURE_DIR, ".done")
    if os.path.exists(done):
        return FIXTURE_DIR
    rows = _alltypes_rows()
    for fname, codec in [
        ("alltypes_plain.avro", "null"),
        ("alltypes_plain.snappy.avro", "snappy"),
        ("alltypes_plain.bzip2.avro", "bzip2"),
        ("alltypes_plain.xz.avro", "xz"),
        ("alltypes_plain.zstandard.avro", "zstandard"),
    ]:
        _write(fname, _ALLTYPES_SCHEMA, rows, codec)
    _write("single_nan.avro", _SINGLE_NAN_SCHEMA, [(None,)], "null")
    _write("nested_records.avro", _NESTED_SCHEMA, _NESTED_ROWS, "null")
    _write("simple_enum.avro", _ENUM_SCHEMA, _ENUM_ROWS, "null")
    _write("simple_fixed.avro", _FIXED_SCHEMA, _FIXED_ROWS, "null")
    # the reference's Rust harness (sqllogictest/src/test_context.rs)
    # pre-registers alltypes_plain_multi_files over a dir holding the
    # same file twice
    multi = os.path.join(FIXTURE_DIR, "alltypes_plain_multi_files")
    os.makedirs(multi, exist_ok=True)
    for i in range(2):
        with open(os.path.join(FIXTURE_DIR, "alltypes_plain.avro"), "rb") as f:
            blob = f.read()
        with open(os.path.join(multi, f"alltypes_plain_{i}.avro"), "wb") as f:
            f.write(blob)
    with open(done, "w") as f:
        f.write("ok")
    return FIXTURE_DIR


def _write(fname: str, schema: dict, rows: list[tuple], codec: str) -> None:
    blob = encode_container(schema, rows, codec=codec)
    with open(os.path.join(FIXTURE_DIR, fname), "wb") as f:
        f.write(blob)


if __name__ == "__main__":
    print(ensure_fixtures())

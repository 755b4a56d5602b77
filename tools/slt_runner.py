"""sqllogictest parity harness: execute the reference's own ``.slt``
corpora (``datafusion-greatest/datafusion/sqllogictest/test_files/*.slt``,
the reference's primary correctness gate — 105 files, sqllogictest
dialect of the sqllogictest-rs crate) directly against Spark SQL and
compare each query block's result with the file's pinned expectation.

Methodology mirrors tests/test_tpcds_execution.py: consume the
reference's public test SQL read-only at test time, run it on THIS
engine, and pin a census — matched blocks, named divergences, and
skips with machine-checkable reasons — so parity is a measured number,
not a claim.

Scope rules (each recorded in the census, never silently dropped):

- ``query TT`` blocks are EXPLAIN/plan dumps — engine-specific text by
  definition; skipped as ``skip_plan``.
- Blocks touching tables created by ``CREATE EXTERNAL TABLE`` whose
  LOCATION is absent in this container (the reference's ``testing/``
  data submodule is not checked out) skip as ``skip_external``.
- ``statement/query error`` blocks assert DataFusion's *message
  contract*, which no other engine can share. They are censused by how
  Spark behaves (``error_sparkerr`` — Spark also rejects;
  ``error_sparkok`` — Spark supports the feature DataFusion lacks,
  e.g. LATERAL joins / sliding approx percentile).
- ``set datafusion.*`` and other engine-config statements skip as
  ``skip_config``.

Translation layer (DataFusion SQL → Spark SQL) is intentionally
minimal and lossless: ``arrow_cast(e,'T')`` → ``CAST(e AS t)`` with an
Arrow→Spark type map (unsigned ints widen to the next signed type;
UInt64 → DECIMAL(20,0) — Spark has no unsigned types),
``CREATE TABLE t(cols) AS VALUES`` → typed CTAS over a VALUES inline
table, and nothing else. Statements the translator cannot express are
censused as ``skip_translate`` with the exception text kept.
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass, field

REF_SLT = (
    "/root/reference/datafusion-greatest/datafusion/sqllogictest/test_files"
)

# ---------------------------------------------------------------- parsing


@dataclass
class Block:
    kind: str          # "statement" | "statement_error" | "query" | "query_error"
    sql: str
    line: int
    types: str = ""
    sort: str = "nosort"
    expected: list[str] = field(default_factory=list)
    error_pat: str = ""


def parse_slt(path: str) -> list[Block]:
    """Parse one .slt file into blocks (sqllogictest-rs dialect as used
    by the reference: no onlyif/skipif/halt; one ``include`` total,
    resolved by the caller)."""
    with open(path) as fh:
        lines = fh.read().splitlines()
    blocks: list[Block] = []
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        s = line.strip()
        if not s or s.startswith("#"):
            i += 1
            continue
        head = s.split()
        lineno = i + 1
        if head[0] == "include":
            blocks.append(Block("include", head[1], lineno))
            i += 1
            continue
        if head[0] == "statement":
            kind = "statement" if head[1] == "ok" else "statement_error"
            pat = s.split(None, 2)[2] if (kind == "statement_error" and len(head) > 2) else ""
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            # optional expected-error body after ----
            if i < n and lines[i].strip() == "----":
                i += 1
                while i < n and lines[i].strip():
                    i += 1
            blocks.append(Block(kind, "\n".join(sql_lines), lineno, error_pat=pat))
            continue
        if head[0] == "query":
            spec = head[1] if len(head) > 1 else ""
            if spec == "error":
                kind = "query_error"
                pat = s.split(None, 2)[2] if len(head) > 2 else ""
                types, sort = "", "nosort"
            else:
                kind = "query"
                pat = ""
                types = spec
                sort = head[2] if len(head) > 2 else "nosort"
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            expected: list[str] = []
            if i < n and lines[i].strip() == "----":
                i += 1
                while i < n and lines[i].strip():
                    expected.append(lines[i].rstrip())
                    i += 1
            blocks.append(
                Block(kind, "\n".join(sql_lines), lineno, types=types,
                      sort=sort, expected=expected, error_pat=pat)
            )
            continue
        # unknown directive — treat the run of non-blank lines as one
        # unparsed block so the census sees it
        sql_lines = []
        while i < n and lines[i].strip():
            sql_lines.append(lines[i])
            i += 1
        blocks.append(Block("unknown", "\n".join(sql_lines), lineno))
    return blocks


# ------------------------------------------------------------ translation

_ARROW_TO_SPARK = {
    "Int8": "TINYINT", "Int16": "SMALLINT", "Int32": "INT", "Int64": "BIGINT",
    "UInt8": "SMALLINT", "UInt16": "INT", "UInt32": "BIGINT",
    "UInt64": "DECIMAL(20,0)",
    "Float16": "FLOAT", "Float32": "FLOAT", "Float64": "DOUBLE",
    "Utf8": "STRING", "LargeUtf8": "STRING", "Utf8View": "STRING",
    "Binary": "BINARY", "LargeBinary": "BINARY", "BinaryView": "BINARY",
    "Boolean": "BOOLEAN",
    "Date32": "DATE", "Date64": "DATE",
}


def _arrow_type_to_spark(t: str) -> str | None:
    t = t.strip()
    if t in _ARROW_TO_SPARK:
        return _ARROW_TO_SPARK[t]
    m = re.match(r"Decimal(?:128|256)\((\d+)\s*,\s*(\d+)\)$", t)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    m = re.match(r"Dictionary\([^,]+,\s*(.+)\)$", t)
    if m:
        return _arrow_type_to_spark(m.group(1))
    if t.startswith("Time32") or t.startswith("Time64"):
        return None  # Spark has no TIME type
    if t.startswith("Interval"):
        return None  # needs value-level translation, not a cast
    return None


# Arrow's numeric→temporal casts REINTERPRET the integer at the target
# unit (epoch days / ms / µs / ns); Spark's CAST parses strings and
# treats numerics as SECONDS. These total-cast forms handle both input
# kinds: the TRY_CAST(AS BIGINT) branch wins for numeric inputs (unit
# math applied; nanos truncate to the repo-wide µs policy, SURVEY §1.2),
# the TRY_CAST(AS <temporal>) branch wins for strings/temporals.
#
# Both branches route through STRING because Spark's TRY_CAST demands a
# statically-legal cast (BIGINT→TIMESTAMP_NTZ / INT→DATE are analysis
# errors even under TRY_CAST); any type casts to STRING, and from
# STRING both TRY_CASTs are analyzable and return NULL on the
# non-matching kind.
_I = "TRY_CAST(CAST({e} AS STRING) AS BIGINT)"       # numeric-kind branch
_TEMPORAL_CAST = {
    "Date32": (f"COALESCE(DATE_FROM_UNIX_DATE(CAST({_I} AS INT)), "
               "TRY_CAST(CAST({e} AS STRING) AS DATE))"),
    "Date64": (f"COALESCE(DATE_FROM_UNIX_DATE(CAST({_I} DIV 86400000 AS INT)), "
               "TRY_CAST(CAST({e} AS STRING) AS DATE))"),
    "Second": (f"CAST(COALESCE(CAST(TIMESTAMP_SECONDS({_I}) AS TIMESTAMP_NTZ), "
               "TRY_CAST(CAST({e} AS STRING) AS TIMESTAMP_NTZ)) AS TIMESTAMP_NTZ)"),
    "Millisecond": (f"CAST(COALESCE(CAST(TIMESTAMP_MILLIS({_I}) AS TIMESTAMP_NTZ), "
                    "TRY_CAST(CAST({e} AS STRING) AS TIMESTAMP_NTZ)) AS TIMESTAMP_NTZ)"),
    "Microsecond": (f"CAST(COALESCE(CAST(TIMESTAMP_MICROS({_I}) AS TIMESTAMP_NTZ), "
                    "TRY_CAST(CAST({e} AS STRING) AS TIMESTAMP_NTZ)) AS TIMESTAMP_NTZ)"),
    "Nanosecond": (f"CAST(COALESCE(CAST(TIMESTAMP_MICROS({_I} DIV 1000) AS TIMESTAMP_NTZ), "
                   "TRY_CAST(CAST({e} AS STRING) AS TIMESTAMP_NTZ)) AS TIMESTAMP_NTZ)"),
}


def _temporal_cast_expr(expr: str, arrow_t: str) -> str | None:
    t = arrow_t.strip()
    if t in ("Date32", "Date64"):
        return _TEMPORAL_CAST[t].format(e=expr)
    m = re.match(r"Timestamp\((Second|Millisecond|Microsecond|Nanosecond)\s*,", t)
    if m:
        return _TEMPORAL_CAST[m.group(1)].format(e=expr)
    return None


class Untranslatable(Exception):
    pass


def _find_close(s: str, start: int) -> int:
    """index of the ')' matching the '(' at start (string-literal aware)."""
    depth, i, n = 0, start, len(s)
    in_str = False
    while i < n:
        c = s[i]
        if in_str:
            if c == "'":
                if i + 1 < n and s[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise Untranslatable("unbalanced parens")


def rewrite_arrow_cast(sql: str) -> str:
    """arrow_cast(expr, 'ArrowType') → CAST(expr AS spark_type).

    Special-cases the Arrow-typed literals Spark spells differently:
    'NAN'/'-NAN'/'Inf'/'-Inf' floats map to float('nan')-style casts.
    """
    out = sql
    while True:
        m = re.search(r"\barrow_cast\s*\(", out, re.IGNORECASE)
        if not m:
            return out
        open_p = out.index("(", m.start())
        close_p = _find_close(out, open_p)
        inner = out[open_p + 1 : close_p]
        # split on the LAST top-level comma: expr , 'Type'
        depth = 0
        in_str = False
        split_at = -1
        for i, c in enumerate(inner):
            if in_str:
                if c == "'":
                    in_str = False
                continue
            if c == "'":
                in_str = True
            elif c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            elif c == "," and depth == 0:
                split_at = i
        if split_at < 0:
            raise Untranslatable(f"arrow_cast args: {inner!r}")
        expr = inner[:split_at].strip()
        tlit = inner[split_at + 1 :].strip()
        if not (tlit.startswith("'") and tlit.endswith("'")):
            raise Untranslatable(f"arrow_cast type not literal: {tlit!r}")
        arrow_t = tlit[1:-1]
        repl = _temporal_cast_expr(expr, arrow_t)
        if repl is None:
            spark_t = _arrow_type_to_spark(arrow_t)
            if spark_t is None:
                raise Untranslatable(f"arrow type {tlit}")
            repl = f"CAST({expr} AS {spark_t})"
        out = out[: m.start()] + repl + out[close_p + 1 :]


_COLDEF_TYPE = {
    "TINYINT": "TINYINT", "SMALLINT": "SMALLINT", "INT": "INT",
    "INTEGER": "INT", "BIGINT": "BIGINT",
    "TINYINT UNSIGNED": "SMALLINT", "SMALLINT UNSIGNED": "INT",
    "INT UNSIGNED": "BIGINT", "INTEGER UNSIGNED": "BIGINT",
    "BIGINT UNSIGNED": "DECIMAL(20,0)",
    "FLOAT": "FLOAT", "REAL": "FLOAT", "DOUBLE": "DOUBLE",
    "VARCHAR": "STRING", "TEXT": "STRING", "STRING": "STRING", "CHAR": "STRING",
    "BOOLEAN": "BOOLEAN", "BOOL": "BOOLEAN",
    "DATE": "DATE", "TIMESTAMP": "TIMESTAMP_NTZ",
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
    "BYTEA": "BINARY",
}


def _map_coldef_type(t: str) -> str:
    tu = re.sub(r"\s+", " ", t.strip().upper())
    if tu in _COLDEF_TYPE:
        return _COLDEF_TYPE[tu]
    m = re.match(r"(?:DECIMAL|NUMERIC)\s*\((\d+)\s*,\s*(\d+)\)$", tu)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    m = re.match(r"(?:DECIMAL|NUMERIC)\s*\((\d+)\)$", tu)
    if m:
        return f"DECIMAL({m.group(1)},0)"
    m = re.match(r"(?:VARCHAR|CHAR)\s*\(\d+\)$", tu)
    if m:
        return "STRING"
    raise Untranslatable(f"column type {t!r}")


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    parts, depth, in_str, cur = [], 0, False, []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if in_str:
            cur.append(c)
            if c == "'":
                if i + 1 < n and s[i + 1] == "'":
                    cur.append(s[i + 1])
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
            cur.append(c)
        elif c in "([":
            depth += 1
            cur.append(c)
        elif c in ")]":
            depth -= 1
            cur.append(c)
        elif c == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def translate_create_table(sql: str) -> str:
    """CREATE TABLE t [(coldefs)] AS VALUES|SELECT …  /  CREATE TABLE t(coldefs)
    → Spark CTAS with explicit casts (so every declared type is honored)
    or an empty parquet table. DataFusion's untyped ``AS VALUES`` names
    columns column1..columnN; Spark's VALUES names them col1.. — aliased
    explicitly to the DataFusion names."""
    m = re.match(
        r"CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        r"([A-Za-z_][A-Za-z0-9_.]*)\s*(.*)$",
        sql.strip(), re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise Untranslatable("unrecognized CREATE TABLE")
    name, rest = m.group(1), m.group(2).strip()
    coldefs: list[tuple[str, str]] | None = None
    if rest.startswith("("):
        close = _find_close(rest, 0)
        defs = _split_top_level(rest[1:close])
        coldefs = []
        for d in defs:
            d = d.strip()
            dm = re.match(r"([A-Za-z_][A-Za-z0-9_]*)\s+(.+?)(?:\s+NOT\s+NULL|\s+NULL)?$",
                          d, re.IGNORECASE | re.DOTALL)
            if not dm:
                raise Untranslatable(f"coldef {d!r}")
            coldefs.append((dm.group(1), _map_coldef_type(dm.group(2))))
        rest = rest[close + 1 :].strip()
    if rest.rstrip(";").strip() == "":
        if coldefs is None:
            raise Untranslatable("CREATE TABLE with neither columns nor AS")
        cols = ", ".join(f"{c} {t}" for c, t in coldefs)
        return f"CREATE TABLE {name} ({cols}) USING PARQUET"
    am = re.match(r"AS\s+(.*)$", rest, re.IGNORECASE | re.DOTALL)
    if not am:
        raise Untranslatable(f"CREATE TABLE tail {rest[:40]!r}")
    body = _rewrite_dialect(am.group(1).strip().rstrip(";"))
    if re.match(r"VALUES\b", body, re.IGNORECASE):
        first = body[body.index("(") : _find_close(body, body.index("(")) + 1]
        arity = len(_split_top_level(first[1:-1]))
        if coldefs is not None:
            if len(coldefs) != arity:
                raise Untranslatable("coldef/VALUES arity mismatch")

            def _colcast(i: int, c: str, t: str) -> str:
                # DataFusion's SQL TIMESTAMP is Timestamp(Nanosecond) and
                # DATE is Date32; integer VALUES reinterpret at that unit.
                if t == "TIMESTAMP_NTZ":
                    return f"{_TEMPORAL_CAST['Nanosecond'].format(e=f'col{i+1}')} AS {c}"
                if t == "DATE":
                    return f"{_TEMPORAL_CAST['Date32'].format(e=f'col{i+1}')} AS {c}"
                return f"CAST(col{i+1} AS {t}) AS {c}"

            proj = ", ".join(_colcast(i, c, t) for i, (c, t) in enumerate(coldefs))
        else:
            proj = ", ".join(f"col{i+1} AS column{i+1}" for i in range(arity))
        return f"CREATE TABLE {name} USING PARQUET AS SELECT {proj} FROM ({body})"
    # AS SELECT …
    if coldefs is not None:
        raise Untranslatable("CREATE TABLE(cols) AS SELECT")
    return f"CREATE TABLE {name} USING PARQUET AS {body}"


def translate_statement(sql: str) -> str | None:
    """→ Spark SQL, None to skip as engine config, or raise Untranslatable."""
    s = sql.strip().rstrip(";").strip()
    low = s.lower()
    if low.startswith("set "):
        return None  # datafusion engine config
    if re.match(r"create\s+(unbounded\s+)?external\s+table", low):
        raise Untranslatable("external table")
    if low.startswith(("select", "values", "with ")):
        return _rewrite_dialect(s)  # statement run for effect/validation only
    if low.startswith("create table"):
        return translate_create_table(s)
    if low.startswith("create view") or low.startswith("create or replace view"):
        body = re.sub(r"^CREATE\s+(OR\s+REPLACE\s+)?VIEW", "CREATE OR REPLACE TEMPORARY VIEW",
                      s, flags=re.IGNORECASE)
        return _rewrite_dialect(body)
    if low.startswith(("drop table", "drop view", "insert into", "insert overwrite",
                       "delete from", "update ")):
        return _rewrite_dialect(s)
    if low.startswith("explain"):
        raise Untranslatable("explain statement")
    raise Untranslatable(f"statement {s.split()[0] if s else ''}")


# DataFusion's Timestamp(ns)→Int64 cast yields the RAW NANOS value;
# Spark's timestamp→bigint yields seconds. The slt corpus uses the
# idiom `col::timestamp::bigint` expecting nanos — rewrite it to
# explicit µs*1000 so the downstream /1000 unit chains stay correct.
_TS_BIGINT = re.compile(
    r"([A-Za-z_][A-Za-z0-9_.]*)\s*::\s*timestamp\s*::\s*bigint"
    r"(?:\s*/\s*(\d+))?",
    re.IGNORECASE,
)


def _ts_bigint_repl(m: re.Match) -> str:
    nanos = (f"(unix_micros(CAST(TRY_CAST({m.group(1)} AS TIMESTAMP_NTZ) "
             "AS TIMESTAMP)) * 1000)")
    if m.group(2):
        # DataFusion's int/int `/` TRUNCATES (Arrow semantics); Spark's
        # `/` yields DOUBLE and would lose µs precision — use DIV.
        return f"({nanos} DIV {m.group(2)})"
    return nanos


def _rewrite_fn_calls(sql: str) -> str:
    """Function-level dialect gaps, rewritten semantically:

    - DataFusion ``concat`` skips NULL args (Postgres); Spark's returns
      NULL on any NULL — Spark's NULL-skipping spelling is concat_ws('').
    - DataFusion single-arg ``log`` is base-10; Spark's is ln. (Two-arg
      log is base-b in both — only the 1-arg form is rewritten.)
    - ``make_array`` → ``array``.
    - ``agg(x ORDER BY x [ASC|DESC])`` (no Spark syntax): for the
      self-ordered array_agg case → sort_array(collect_list(x)).
    """
    out = sql
    out = re.sub(r"\bmake_array\s*\(", "array(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bconcat(?!_ws)\s*\(", "concat_ws('', ", out, flags=re.IGNORECASE)
    # single-arg log → log10
    pos = 0
    while True:
        m = re.search(r"\blog\s*\(", out[pos:], re.IGNORECASE)
        if not m:
            break
        open_p = pos + m.end() - 1
        try:
            close_p = _find_close(out, open_p)
        except Untranslatable:
            break
        if len(_split_top_level(out[open_p + 1 : close_p])) == 1:
            out = out[: pos + m.start()] + "LOG10(" + out[open_p + 1 :]
            pos = pos + m.start() + 6
        else:
            pos = open_p + 1
    # array_agg(x ORDER BY x [ASC|DESC]) → sort_array(collect_list(x), asc)
    def _agg_order(m: re.Match) -> str:
        expr, by, desc = m.group(1).strip(), m.group(2).strip(), m.group(3)
        if expr.lower() != by.lower():
            return m.group(0)  # different sort key — leave (will skip)
        asc = "false" if desc and desc.strip().upper() == "DESC" else "true"
        return f"sort_array(collect_list({expr}), {asc})"

    out = re.sub(
        r"\barray_agg\s*\(([^()]+?)\s+ORDER\s+BY\s+([^()]+?)(\s+ASC|\s+DESC)?\)",
        _agg_order, out, flags=re.IGNORECASE,
    )
    return out


def _rewrite_dialect(sql: str) -> str:
    sql = _TS_BIGINT.sub(_ts_bigint_repl, sql)
    sql = _rewrite_fn_calls(sql)
    return rewrite_arrow_cast(sql)


def translate_query(sql: str) -> str:
    return _rewrite_dialect(sql.strip().rstrip(";"))


# ------------------------------------------------------------- formatting


def _fmt_float(v: float) -> str:
    """DataFusion's sqllogictest float normalization: round to 12 decimal
    places, trim trailing zeros, NaN spelled 'NaN'."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == int(v) and abs(v) < 1e15:
        return f"{int(v)}.0"  # DataFusion prints whole floats as x.0 via {:?}
    s = f"{v:.12f}".rstrip("0").rstrip(".")
    return s if s not in ("", "-0") else "0"


def _fmt_float32(v: float) -> str:
    """Float32 columns: DataFusion prints the shortest f32 repr
    (626.443), but the value reaches Python widened to the nearest
    double (626.4429931640625). numpy's float32 repr restores the
    shortest-roundtrip f32 form."""
    import numpy as np

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    s = repr(np.float32(v))
    if "." not in s and "e" not in s and "inf" not in s:
        s += ".0"
    return s


def fmt_value(v, dtype: str = "") -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _fmt_float32(v) if dtype == "float" else _fmt_float(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, str):
        return "(empty)" if v == "" else v
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, datetime.datetime):
        s = v.isoformat(sep="T")
        return s
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ", ".join(fmt_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {fmt_value(x)}" for k, x in v.items()) + "}"
    if hasattr(v, "asDict"):  # Row/struct
        return "{" + ", ".join(f"{k}: {fmt_value(x)}" for k, x in v.asDict().items()) + "}"
    return str(v)


_ISO_TS = re.compile(r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(?:\.(\d+))?Z?$")


def _norm_token(t: str) -> str:
    """Engine-neutral temporal spelling: drop the tz-instant 'Z' suffix
    (session tz is pinned UTC on both sides), truncate fractional
    seconds to Spark's µs ceiling, trim trailing fraction zeros, and
    reduce midnight timestamps to bare dates (Arrow Date64 prints as a
    midnight datetime in DataFusion's slt normalizer; Spark's DATE
    prints date-only)."""
    m = _ISO_TS.match(t)
    if not m:
        return t
    frac = (m.group(2) or "")[:6].rstrip("0")
    base = m.group(1)
    if not frac and base.endswith("T00:00:00"):
        return base[: -len("T00:00:00")]
    return base + ("." + frac if frac else "")


def _tokens_match(exp: str, act: str) -> bool:
    if exp == act:
        return True
    et, at = exp.split(), act.split()
    if len(et) != len(at):
        return False
    for e, a in zip(et, at):
        if e == a:
            continue
        if _norm_token(e) == _norm_token(a):
            continue
        try:
            ef, af = float(e), float(a)
        except ValueError:
            return False
        if math.isnan(ef) and math.isnan(af):
            continue
        if not math.isclose(ef, af, rel_tol=1e-9, abs_tol=1e-10):
            return False
    return True


def rows_match(expected: list[str], actual: list[str], sort: str) -> str:
    """'match' (slt-exact), 'unordered' (same multiset — ORDER BY with
    ties / engine default NULL ordering; both engines' outputs are valid
    answers), or 'no'."""
    if len(expected) != len(actual):
        return "no"
    if sort == "rowsort":
        expected, actual = sorted(expected), sorted(actual)
    if all(_tokens_match(e, a) for e, a in zip(expected, actual)):
        return "match"
    se, sa = sorted(expected), sorted(actual)
    if all(_tokens_match(e, a) for e, a in zip(se, sa)):
        return "unordered"
    return "no"


# ---------------------------------------------------------------- running


@dataclass
class Census:
    file: str = ""
    match: int = 0
    match_unordered: int = 0   # same multiset; tie/NULL default order differs
    match_rowcount: int = 0    # LIMIT w/o total order: only count comparable
    mismatch: list[str] = field(default_factory=list)     # "line"
    skip_plan: int = 0
    skip_external: int = 0
    skip_config: int = 0
    skip_translate: list[str] = field(default_factory=list)
    skip_runtime: list[str] = field(default_factory=list)  # query raised in Spark
    error_sparkerr: int = 0
    error_sparkok: int = 0
    stmt_ok: int = 0

    def summary(self) -> dict:
        return {
            "file": self.file,
            "match": self.match,
            "match_unordered": self.match_unordered,
            "match_rowcount": self.match_rowcount,
            "mismatch": len(self.mismatch),
            "skip_plan": self.skip_plan,
            "skip_external": self.skip_external,
            "skip_config": self.skip_config,
            "skip_translate": len(self.skip_translate),
            "skip_runtime": len(self.skip_runtime),
            "error_sparkerr": self.error_sparkerr,
            "error_sparkok": self.error_sparkok,
            "stmt_ok": self.stmt_ok,
        }


_TABLE_RE = re.compile(r"\b(?:from|join|into|table)\s+([A-Za-z_][A-Za-z0-9_]*)",
                       re.IGNORECASE)


def _referenced_tables(sql: str) -> set[str]:
    return {t.lower() for t in _TABLE_RE.findall(sql)}


class SltRunner:
    """Executes one .slt file inside an isolated Spark database."""

    def __init__(self, spark, db: str = "slt_run", row_cap: int = 8192,
                 verbose: bool = False):
        self.spark = spark
        self.db = db
        self.row_cap = row_cap
        self.verbose = verbose
        self.unavailable: set[str] = set()

    def _exec(self, sql: str):
        return self.spark.sql(sql)

    def run_file(self, path: str, include_base: str | None = None) -> Census:
        c = Census(file=os.path.basename(path))
        spark = self.spark
        spark.sql(f"DROP DATABASE IF EXISTS {self.db} CASCADE")
        spark.sql(f"CREATE DATABASE {self.db}")
        spark.sql(f"USE {self.db}")
        saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            blocks = parse_slt(path)
            resolved: list[Block] = []
            for b in blocks:
                if b.kind == "include":
                    inc = os.path.join(include_base or os.path.dirname(path), b.sql)
                    resolved.extend(parse_slt(inc))
                else:
                    resolved.append(b)
            for b in resolved:
                self._run_block(b, c)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
            spark.sql("USE default")
            spark.sql(f"DROP DATABASE IF EXISTS {self.db} CASCADE")
        return c

    def _run_block(self, b: Block, c: Census) -> None:
        if b.kind in ("statement", "unknown"):
            low = b.sql.strip().lower()
            if re.match(r"create\s+(unbounded\s+)?external\s+table", low):
                m = re.search(r"table\s+([A-Za-z_][A-Za-z0-9_]*)", b.sql, re.IGNORECASE)
                if m:
                    self.unavailable.add(m.group(1).lower())
                c.skip_external += 1
                return
            try:
                t = translate_statement(b.sql)
            except Untranslatable as exc:
                self._mark_created_unavailable(b.sql)
                c.skip_translate.append(f"{b.line}: {exc}")
                return
            if t is None:
                c.skip_config += 1
                return
            if _referenced_tables(t) & self.unavailable:
                self._mark_created_unavailable(b.sql)
                c.skip_external += 1
                return
            try:
                self._exec(t)
                c.stmt_ok += 1
            except Exception as exc:  # noqa: BLE001 — census, not control flow
                self._mark_created_unavailable(b.sql)
                if "TABLE_OR_VIEW_NOT_FOUND" in str(exc):
                    self.unavailable |= _referenced_tables(t)
                    c.skip_external += 1
                else:
                    c.skip_runtime.append(f"{b.line}: {_head(exc)}")
            return
        if b.kind in ("statement_error", "query_error"):
            try:
                t = (translate_statement(b.sql) if b.kind == "statement_error"
                     else translate_query(b.sql))
                if t is None:
                    c.skip_config += 1
                    return
                if _referenced_tables(t) & self.unavailable:
                    c.skip_external += 1
                    return
                df = self._exec(t)
                if b.kind == "query_error":
                    df.limit(self.row_cap).collect()
                c.error_sparkok += 1
            except Exception:  # noqa: BLE001
                c.error_sparkerr += 1
            return
        if b.kind == "query":
            if b.types == "TT":
                c.skip_plan += 1
                return
            try:
                t = translate_query(b.sql)
            except Untranslatable as exc:
                c.skip_translate.append(f"{b.line}: {exc}")
                return
            if _referenced_tables(t) & self.unavailable:
                c.skip_external += 1
                return
            im = re.match(r"\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)", t,
                          re.IGNORECASE)
            if im:
                # DataFusion's INSERT reports the inserted-row count as a
                # result row; Spark's returns an empty result. Compare the
                # count via the table delta instead.
                try:
                    tbl = im.group(1)
                    before = self.spark.table(tbl).count()
                    self._exec(t)
                    actual = [str(self.spark.table(tbl).count() - before)]
                except Exception as exc:  # noqa: BLE001
                    c.skip_runtime.append(f"{b.line}: {_head(exc)}")
                    return
                if rows_match(b.expected, actual, b.sort) == "match":
                    c.match += 1
                else:
                    c.mismatch.append(f"{b.line}")
                return
            try:
                df = self._exec(t)
                rows = df.limit(self.row_cap).collect()
                dtypes = [f.dataType.simpleString() for f in df.schema.fields]
            except Exception as exc:  # noqa: BLE001
                if "TABLE_OR_VIEW_NOT_FOUND" in str(exc):
                    # table registered by the reference's Rust-side
                    # TestContext, never created in the .slt file itself
                    self.unavailable |= _referenced_tables(t)
                    c.skip_external += 1
                else:
                    c.skip_runtime.append(f"{b.line}: {_head(exc)}")
                return
            actual = [
                " ".join(fmt_value(v, d) for v, d in zip(row, dtypes))
                for row in rows
            ]
            verdict = rows_match(b.expected, actual, b.sort)
            if verdict == "match":
                c.match += 1
            elif verdict == "unordered":
                c.match_unordered += 1
            elif (len(b.expected) == len(actual)
                  and re.search(r"\blimit\b", t, re.IGNORECASE)
                  and not re.search(r"order\s+by", t, re.IGNORECASE)):
                # LIMIT without total order: WHICH rows make the cut is
                # engine-defined; only the count is comparable
                c.match_rowcount += 1
            else:
                c.mismatch.append(f"{b.line}")
                if self.verbose:
                    print(f"--- MISMATCH {c.file}:{b.line}\nSQL: {t}\n"
                          f"exp: {b.expected[:6]}\ngot: {actual[:6]}")
            return

    def _mark_created_unavailable(self, sql: str) -> None:
        m = re.match(r"\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:EXTERNAL\s+)?"
                     r"(?:TABLE|VIEW)\s+(?:IF\s+NOT\s+EXISTS\s+)?"
                     r"([A-Za-z_][A-Za-z0-9_]*)", sql, re.IGNORECASE)
        if m:
            self.unavailable.add(m.group(1).lower())


def _head(exc: Exception) -> str:
    for line in str(exc).splitlines():
        if line.strip():
            return line.strip()[:160]
    return type(exc).__name__


if __name__ == "__main__":
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rust_query_engine_greatest_spark.session import get_spark

    spark = get_spark("slt-runner", cpus=8)
    files = sys.argv[1:] or ["joins.slt"]
    verbose = os.environ.get("SLT_VERBOSE") == "1"
    for f in files:
        runner = SltRunner(spark, db=f"slt_{re.sub(r'[^a-z0-9]', '_', f.lower())}",
                           verbose=verbose)
        cen = runner.run_file(os.path.join(REF_SLT, f))
        print(json.dumps(cen.summary()))
        if cen.mismatch:
            print("  mismatch lines:", ",".join(cen.mismatch[:40]))
        for s in cen.skip_translate[:10]:
            print("  skip_translate:", s)
        for s in cen.skip_runtime[:10]:
            print("  skip_runtime:", s)

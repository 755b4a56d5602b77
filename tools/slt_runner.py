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
                # tolerate an accidentally doubled separator (' ----'
                # then '----', e.g. scalar.slt:1817)
                while i < n and lines[i].strip() == "----":
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
# numeric-kind branch: STRING → DECIMAL(38,9) → BIGINT so that integer
# inputs stay exact AND double-typed unit arithmetic (`ts / 1000` is
# DOUBLE division in Spark, serialized in scientific notation) still
# lands on the truncated integer DataFusion's int division produces.
_I = ("TRY_CAST(TRY_CAST(CAST({e} AS STRING) AS DECIMAL(38,9)) AS BIGINT)")
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
    out = re.sub(r"\barray_length\s*\(", "size(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bconcat(?!_ws)\s*\(", "concat_ws('', ", out, flags=re.IGNORECASE)
    # string_agg(x, 'sep' ORDER BY x [ASC|DESC]) → sorted collect + join
    def _string_agg_order(m: re.Match) -> str:
        expr, sep, by, desc = (m.group(1).strip(), m.group(2).strip(),
                               m.group(3).strip(), m.group(4))
        if expr.lower() != by.lower():
            return m.group(0)
        asc = "false" if desc and desc.strip().upper() == "DESC" else "true"
        return f"array_join(sort_array(collect_list({expr}), {asc}), {sep})"

    out = re.sub(
        r"\bstring_agg\s*\(([^(),]+?),\s*('[^']*')\s+ORDER\s+BY\s+"
        r"([^()]+?)(\s+ASC|\s+DESC)?\)",
        _string_agg_order, out, flags=re.IGNORECASE,
    )
    # DataFusion 2-arg trim family is (string, trim_charset); Spark's
    # function-call forms take (trim_charset, string) — swap.
    pos = 0
    while True:
        m = re.search(r"\b(trim|ltrim|rtrim|btrim)\s*\(", out[pos:], re.IGNORECASE)
        if not m:
            break
        open_p = pos + m.end() - 1
        try:
            close_p = _find_close(out, open_p)
        except Untranslatable:
            break
        args = _split_top_level(out[open_p + 1 : close_p])
        if len(args) == 2:
            fn = "trim" if m.group(1).lower() == "btrim" else m.group(1)
            repl = f"{fn}({args[1].strip()}, {args[0].strip()})"
            out = out[: pos + m.start()] + repl + out[close_p + 1 :]
            pos = pos + m.start() + len(repl)
        else:
            pos = open_p + 1
    # struct(...) field names: DataFusion auto-names c0,c1,…; Spark uses
    # col1/source-column names — spell the DataFusion names explicitly.
    pos = 0
    while True:
        m = re.search(r"\bstruct\s*\(", out[pos:], re.IGNORECASE)
        if not m:
            break
        open_p = pos + m.end() - 1
        try:
            close_p = _find_close(out, open_p)
        except Untranslatable:
            break
        args = _split_top_level(out[open_p + 1 : close_p])
        parts = []
        for i, a in enumerate(args):
            am = re.match(r"(.+?)\s+as\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", a.strip(),
                          re.IGNORECASE | re.DOTALL)
            if am:
                parts.append(f"'{am.group(2)}', {am.group(1).strip()}")
            else:
                parts.append(f"'c{i}', {a.strip()}")
        repl = "named_struct(" + ", ".join(parts) + ")"
        out = out[: pos + m.start()] + repl + out[close_p + 1 :]
        # advance only past "named_struct(" so nested struct() calls
        # inside the argument list are rewritten too
        pos = pos + m.start() + 1
    # DOW: DataFusion/Postgres count Sunday=0; Spark's DAYOFWEEK Sunday=1
    out = re.sub(
        r"\bEXTRACT\s*\(\s*dow\s+FROM\s+([^()]+(?:\([^()]*\))?[^()]*)\)",
        r"(EXTRACT(DAYOFWEEK FROM \1) - 1)", out, flags=re.IGNORECASE,
    )
    out = re.sub(
        r"\bdate_part\s*\(\s*'DOW'\s*,",
        "date_part_dow_shim(", out, flags=re.IGNORECASE,
    )
    if "date_part_dow_shim(" in out:
        # no SQL-macro facility in raw text: expand inline
        pos = 0
        while True:
            j = out.find("date_part_dow_shim(")
            if j < 0:
                break
            open_p = j + len("date_part_dow_shim(") - 1
            close_p = _find_close(out, open_p)
            inner = out[open_p + 1 : close_p]
            out = (out[:j] + f"(EXTRACT(DAYOFWEEK FROM {inner}) - 1)"
                   + out[close_p + 1 :])
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


# words after which a '[' opens an array LITERAL, not a subscript
_SQL_KEYWORDS = {
    "SELECT", "WHERE", "AND", "OR", "NOT", "IN", "BY", "ON", "WHEN",
    "THEN", "ELSE", "END", "CASE", "VALUES", "UNION", "ALL", "AS",
    "FROM", "HAVING", "LIMIT", "OFFSET", "DISTINCT", "BETWEEN", "LIKE",
    "IS", "NULL", "SET", "RETURNING", "ARRAY", "ROW", "ELSE", "USING",
}


def _rewrite_brackets(sql: str) -> str:
    """DataFusion array syntax → Spark:

    - literal ``[1, 2, 3]`` → ``array(1, 2, 3)`` (a ``[`` NOT preceded
      by an identifier/``)``/``]`` opens a literal);
    - subscript ``expr[i]`` (1-based in DataFusion, 0-based in Spark)
      → ``expr[(i) - 1]``. Slices ``a[i:j]`` are left untouched
      (censused when they fail).
    """
    out: list[str] = []
    i, n = 0, len(sql)
    in_str = False
    while i < n:
        ch = sql[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            out.append(ch)
            i += 1
            continue
        if ch == "[":
            j = _find_close_bracket(sql, i)
            if j < 0:
                out.append(ch)
                i += 1
                continue
            inner = _rewrite_brackets(sql[i + 1 : j])
            sofar = "".join(out).rstrip()
            prev = sofar[-1:]
            wm = re.search(r"([A-Za-z_][A-Za-z0-9_]*)$", sofar)
            prev_kw = wm.group(1).upper() in _SQL_KEYWORDS if wm else False
            if prev and not prev_kw and (prev.isalnum() or prev in "_)]"):
                if ":" in inner:
                    out.append("[" + inner + "]")  # slice — unsupported
                else:
                    out.append(f"[({inner}) - 1]")
            else:
                out.append(f"array({inner})")
            i = j + 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _find_close_bracket(s: str, start: int) -> int:
    depth, i, n = 0, start, len(s)
    in_str = False
    while i < n:
        c = s[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _rewrite_braces(sql: str) -> str:
    """DataFusion struct literal ``{'k': v, …}`` → ``named_struct('k', v, …)``
    (nested literals recurse)."""
    out: list[str] = []
    i, n = 0, len(sql)
    in_str = False
    while i < n:
        ch = sql[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            out.append(ch)
            i += 1
            continue
        if ch == "{":
            j = _find_close_brace(sql, i)
            if j < 0:
                out.append(ch)
                i += 1
                continue
            inner = _rewrite_braces(sql[i + 1 : j])
            parts = []
            ok = True
            for p in _split_top_level(inner):
                pm = re.match(r"\s*('(?:[^']|'')*')\s*:\s*(.+)$", p, re.DOTALL)
                if not pm:
                    ok = False
                    break
                parts.append(f"{pm.group(1)}, {pm.group(2).strip()}")
            if ok and parts:
                out.append("named_struct(" + ", ".join(parts) + ")")
            else:
                out.append(sql[i : j + 1])  # not a struct literal — verbatim
            i = j + 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _find_close_brace(s: str, start: int) -> int:
    depth, i, n = 0, start, len(s)
    in_str = False
    while i < n:
        c = s[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _rewrite_dialect(sql: str) -> str:
    sql = _TS_BIGINT.sub(_ts_bigint_repl, sql)
    sql = re.sub(r"\bunnest\s*\(", "explode(", sql, flags=re.IGNORECASE)
    # Postgres regex-match operators (binary only — unary bitwise ~ has
    # no left operand, excluded by the lookbehind)
    sql = re.sub(r"(?<=[\w'\)\]])\s+!~\s+", " NOT RLIKE ", sql)
    sql = re.sub(r"(?<=[\w'\)\]])\s+~\s+", " RLIKE ", sql)
    sql = re.sub(r"\btoday\s*\(\s*\)", "current_date()", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\bstrpos\s*\(", "instr(", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\bTIMESTAMPTZ\b", "TIMESTAMP", sql, flags=re.IGNORECASE)
    # to_timestamp_<unit>: numeric input is reinterpreted at that unit
    for unit, arrow in (("seconds", "Second"), ("millis", "Millisecond"),
                        ("micros", "Microsecond"), ("nanos", "Nanosecond")):
        pat = re.compile(rf"\bto_timestamp_{unit}\s*\(", re.IGNORECASE)
        while True:
            m = pat.search(sql)
            if not m:
                break
            open_p = m.end() - 1
            close_p = _find_close(sql, open_p)
            inner = sql[open_p + 1 : close_p]
            sql = (sql[: m.start()]
                   + _TEMPORAL_CAST[arrow].format(e=inner)
                   + sql[close_p + 1 :])
    if "{" in sql:
        sql = _rewrite_braces(sql)
    if "[" in sql:
        sql = _rewrite_brackets(sql)
    sql = _rewrite_fn_calls(sql)
    return rewrite_arrow_cast(sql)


def translate_query(sql: str) -> str:
    if re.search(r"\btime\s+'", sql, re.IGNORECASE):
        raise Untranslatable("TIME literal (Spark has no TIME type)")
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


def _canon_td(months: int, seconds) -> str:
    """Canonical engine-neutral interval atom (no spaces, so it
    tokenizes as one value)."""
    from decimal import Decimal

    s = Decimal(seconds).quantize(Decimal("0.000000001"))
    return f"IV{months}m{s:f}s"


# DataFusion's two interval displays: MonthDayNano prints only nonzero
# units ('5 mins 1.000000000 secs', '7 days'); DayTime prints all four
# ('7 days 0 hours 0 mins 0 secs'). Python timedelta prints
# '5 days, 4:03:02.100000' / '0:00:01'.
_DF_IV = re.compile(
    r"(?:-?\d+(?:\.\d+)? (?:years?|mons?|days?|hours?|mins?|secs?)|-?\d+(?:\.\d+)? secs?)"
    r"(?: -?\d+(?:\.\d+)? (?:years?|mons?|days?|hours?|mins?|secs?))*"
)
# lookbehind bars matches inside ISO timestamps ('…T11:13:10') and the
# tail of longer clock strings
_PY_TD = re.compile(
    r"(?:(-?\d+) days?, )?(?<![T\d:.])(\d+):(\d{2}):(\d{2})(?:\.(\d{1,6}))?"
)
_IV_UNIT = {"year": 0, "mon": 1, "day": 86400, "hour": 3600, "min": 60, "sec": 1}


def _canon_interval_line(line: str) -> str:
    from decimal import Decimal

    def df_repl(m: re.Match) -> str:
        months = 0
        secs = Decimal(0)
        for num, unit in re.findall(r"(-?\d+(?:\.\d+)?) ([a-z]+)", m.group(0)):
            u = unit.rstrip("s")
            if u == "year":
                months += int(num) * 12
            elif u == "mon":
                months += int(num)
            elif u in ("day", "hour", "min", "sec"):
                secs += Decimal(num) * _IV_UNIT[u]
            else:
                return m.group(0)  # not an interval phrase after all
        return _canon_td(months, secs)

    def td_repl(m: re.Match) -> str:
        days = int(m.group(1) or 0)
        frac = (m.group(5) or "").ljust(6, "0")
        secs = (Decimal(days) * 86400 + int(m.group(2)) * 3600
                + int(m.group(3)) * 60 + int(m.group(4))
                + Decimal(frac) / 1_000_000)
        return _canon_td(0, secs)

    line = _PY_TD.sub(td_repl, line)
    return _DF_IV.sub(df_repl, line)


def fmt_value(v, dt=None) -> str:
    """Format one Spark value DataFusion-slt style. ``dt`` is the
    pyspark DataType (recursed for nested types — needed to restore
    Float32 shortest-repr inside structs/arrays too)."""
    import datetime
    import decimal

    from pyspark.sql import types as T

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _fmt_float32(v) if isinstance(dt, T.FloatType) else _fmt_float(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, str):
        return "(empty)" if v == "" else v
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, datetime.timedelta):
        return _canon_td(0, decimal.Decimal(v.days) * 86400 + v.seconds
                         + decimal.Decimal(v.microseconds) / 1_000_000)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        et = dt.elementType if isinstance(dt, T.ArrayType) else None
        # DataFusion's array display renders NULL and '' elements empty
        return "[" + ", ".join(
            "" if x is None or x == "" else fmt_value(x, et) for x in v
        ) + "]"
    if isinstance(v, dict):
        kt = dt.keyType if isinstance(dt, T.MapType) else None
        vt = dt.valueType if isinstance(dt, T.MapType) else None
        return "{" + ", ".join(
            f"{fmt_value(k, kt)}: {fmt_value(x, vt)}" for k, x in v.items()
        ) + "}"
    if hasattr(v, "asDict"):  # Row/struct — DataFusion prints NULL fields as empty
        fields = (list(dt.fields) if isinstance(dt, T.StructType)
                  else [None] * len(v))
        items = []
        for (k, x), f in zip(v.asDict().items(), fields):
            cell = ("" if x is None or x == ""
                    else fmt_value(x, f.dataType if f else None))
            items.append(f"{k}: {cell}")
        return "{" + ", ".join(items) + "}"
    return str(v)


_ISO_TS = re.compile(
    r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(?:\.(\d+))?"
    r"(Z|[+-]\d{2}:\d{2})?$"
)


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
    off = m.group(3)
    if off and off not in ("Z", "+00:00", "-00:00"):
        # shift zone-offset renderings (DataFusion prints the table's
        # local zone) to the UTC instant this session displays
        import datetime

        sign = 1 if off[0] == "+" else -1
        delta = datetime.timedelta(hours=int(off[1:3]), minutes=int(off[4:6]))
        dt = datetime.datetime.fromisoformat(base) - sign * delta
        base = dt.isoformat(sep="T")
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
        # numbers embedded in array/struct renderings carry punctuation
        ep, ap = e.strip("[]{},"), a.strip("[]{},")
        if e.strip("0123456789.eE+-") != a.strip("0123456789.eE+-"):
            return False  # differing punctuation shape around the number
        try:
            ef, af = float(ep), float(ap)
        except ValueError:
            return False
        if math.isnan(ef) and math.isnan(af):
            continue
        # rel 1e-6 accommodates Float32 lanes (f32 epsilon ≈ 1.2e-7):
        # DataFusion prints the shortest f32 repr while aggregates like
        # median widen to f64 before formatting here.
        if not math.isclose(ef, af, rel_tol=1e-6, abs_tol=1e-10):
            return False
    return True


def rows_match(expected: list[str], actual: list[str], sort: str) -> str:
    """'match' (slt-exact), 'unordered' (same multiset — ORDER BY with
    ties / engine default NULL ordering; both engines' outputs are valid
    answers), or 'no'."""
    if len(expected) != len(actual):
        return "no"
    expected = [_canon_interval_line(e) for e in expected]
    actual = [_canon_interval_line(a) for a in actual]
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
        # the engine's DataFusion-dialect SQL names (iszero, date_bin,
        # array_pop_*, …) — the reference corpus drives the product
        # compat layer directly
        try:
            import sys as _sys

            _sys.path.insert(0, os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            from rust_query_engine_greatest_spark.functions.sql_names import (
                register_sql_names,
            )

            register_sql_names(spark)
        except Exception:  # noqa: BLE001 — harness must run without the package
            pass

    def _exec(self, sql: str):
        return self.spark.sql(sql)

    _INSERT_VALUES = re.compile(
        r"^\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s*"
        r"(?:\(([^)]*)\)\s*)?(VALUES\b.*)$",
        re.IGNORECASE | re.DOTALL,
    )

    def _schema_cast_insert(self, sql: str) -> str:
        """``INSERT INTO t VALUES …`` → an explicit-cast SELECT over the
        VALUES: Spark's ANSI store-assignment rejects implicit
        string→DATE/TIMESTAMP writes the slt corpus relies on
        (DataFusion coerces them)."""
        m = self._INSERT_VALUES.match(sql)
        if not m:
            return sql
        tbl, collist, values = m.group(1), m.group(2), m.group(3)
        try:
            fields = {f.name.lower(): f.dataType.simpleString()
                      for f in self.spark.table(tbl).schema.fields}
            order = ([c.strip().lower() for c in collist.split(",")]
                     if collist else
                     [f.name.lower() for f in self.spark.table(tbl).schema.fields])
        except Exception:  # noqa: BLE001 — table missing: leave for _exec's error
            return sql
        casts = []
        for i, col in enumerate(order):
            t = fields.get(col, "string")
            src = f"col{i+1}"
            if t == "date":
                casts.append(_TEMPORAL_CAST["Date32"].format(e=src))
            elif t in ("timestamp", "timestamp_ntz"):
                cast = _TEMPORAL_CAST["Nanosecond"].format(e=src)
                casts.append(f"CAST({cast} AS {t.upper()})")
            else:
                casts.append(f"CAST({src} AS {t.upper()})")
        head = f"INSERT INTO {tbl} ({collist}) " if collist else f"INSERT INTO {tbl} "
        return head + "SELECT " + ", ".join(casts) + f" FROM ({values})"

    def run_file(self, path: str, include_base: str | None = None) -> Census:
        c = Census(file=os.path.basename(path))
        spark = self.spark
        spark.sql(f"DROP DATABASE IF EXISTS {self.db} CASCADE")
        spark.sql(f"CREATE DATABASE {self.db}")
        spark.sql(f"USE {self.db}")
        saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        saved_esc = spark.conf.get("spark.sql.parser.escapedStringLiterals")
        # DataFusion string literals are SQL-standard (no backslash
        # escapes); Spark's default processes C-style escapes. Align so
        # '\d' regex patterns and literal backslashes survive verbatim.
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
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
            spark.conf.set("spark.sql.parser.escapedStringLiterals", saved_esc)
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
                if re.match(r"\s*INSERT\b", t, re.IGNORECASE):
                    t = self._schema_cast_insert(t)
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
                    self._exec(self._schema_cast_insert(t))
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
                dtypes = [f.dataType for f in df.schema.fields]
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

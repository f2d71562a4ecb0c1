"""Parse operators (SURVEY.md §2.2, P1-P4, P6).

The reference parses one line at a time in a goroutine
(/root/reference/internal/parser/parser.go:130-204) with four formats:
nginx/grok (gonx), JSON (fastjson, string-valued top-level keys only),
syslog RFC5424 and RFC3164.  Parse failures forward the record
UNPARSED — rows are never dropped (parser.go:148-155,201).

Here each format is a vectorized column transform:

- nginx/grok: the $var pattern is translated to a regex once on the
  driver; extraction happens JVM-side with one regexp_extract per
  field (whole-stage codegen, no Python), or in one pass per Arrow
  batch via a pandas UDF (pd.Series.str.extract) — both produce the
  same struct.
- JSON: from_json with an explicit all-string schema (production
  path — the "strings only" rule enforced by schema choice), plus a
  pandas UDF replicating the reference's dynamic strings-only filter
  exactly (/root/reference/internal/parser/parser.go:239-255).
- syslog: fixed grammars as JVM regexp_extract structs.

Every parser returns a null struct on failure and a parse_ok flag;
callers keep the row (P6) and count errors into lineage.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# P1: grok/nginx-style $var pattern -> regex
# ---------------------------------------------------------------------------


def grok_to_regex(pattern: str, named: bool = False) -> tuple[str, list[str]]:
    """Translate an nginx-style ``$var`` pattern into an anchored regex
    with one positional capture group per variable.

    Semantics match gonx (used at
    /root/reference/internal/parser/parser.go:76-77): a variable
    matches any run of characters not containing the literal character
    that immediately follows it in the pattern (e.g. ``"$request"`` ->
    ``[^"]*``, ``[$time_local]`` -> ``[^\\]]*``); a trailing variable
    matches to end of line.  Golden case:
    /root/reference/internal/parser/parser_test.go:92-106.

    Returns (regex, field_names) — group i+1 captures field i.
    """
    token = re.compile(r"\$([A-Za-z_][A-Za-z0-9_]*)")
    fields: list[str] = []
    out: list[str] = ["^"]
    pos = 0
    for m in token.finditer(pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        fields.append(m.group(1))
        grp = f"?P<{m.group(1)}>" if named else ""
        nxt = pattern[m.end() : m.end() + 1]
        if nxt:
            out.append(f"({grp}[^{re.escape(nxt)}]*)")
        else:
            out.append(f"({grp}.*)")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    out.append("$")
    return "".join(out), fields


def parse_grok(line: Column, pattern: str) -> Column:
    """JVM-side grok parse: struct<field: string, ...> or NULL when the
    line does not match (P6 passthrough is the caller's job).

    One regexp_extract per field — each is a codegen'd JVM expression;
    the pattern is compiled per task, not per row.
    """
    regex, fields = grok_to_regex(pattern)
    struct = F.struct(
        *[F.regexp_extract(line, regex, i + 1).alias(name) for i, name in enumerate(fields)]
    )
    return F.when(line.rlike(regex), struct).otherwise(F.lit(None).cast(_grok_type(fields)))


def _grok_type(fields: list[str]) -> T.StructType:
    return T.StructType([T.StructField(f, T.StringType()) for f in fields])


def make_grok_pandas_udf(pattern: str):
    """Arrow-batched grok parse: one ``pd.Series.str.extract`` per
    batch (the north-star "vectorized pandas/Arrow UDF" path — no
    per-row Python; pandas runs the regex over the whole batch in C).

    Returns (udf, field_names); udf(line) yields the same struct as
    :func:`parse_grok`.
    """
    named, fields = grok_to_regex(pattern, named=True)
    ret_type = _grok_type(fields)

    @F.pandas_udf(ret_type)
    def grok_udf(s: pd.Series) -> pd.DataFrame:
        return s.str.extract(named)

    return grok_udf, fields


# ---------------------------------------------------------------------------
# P2: JSON parse
# ---------------------------------------------------------------------------


def parse_json_static(line: Column, fields: list[str]) -> Column:
    """Production JSON parse: explicit all-string schema.  The
    reference keeps only string-valued top-level keys
    (/root/reference/internal/parser/parser.go:239-255); with a static
    per-pipeline schema the strings-only rule is enforced by schema
    choice (SURVEY.md §1.1).  Unparseable lines -> null struct (P6).
    """
    schema = T.StructType([T.StructField(f, T.StringType()) for f in fields])
    return F.from_json(line, schema)


_JSON_MAP_TYPE = T.MapType(T.StringType(), T.StringType())


@F.pandas_udf(_JSON_MAP_TYPE)
def parse_json_dynamic(lines: pd.Series) -> pd.Series:
    """Exact replica of the reference's dynamic JSON parse: keep ONLY
    top-level keys whose value is a JSON string; silently drop the
    rest; unparseable line -> null (caller keeps the row, P6).

    Reference: getKeyValuePairs at
    /root/reference/internal/parser/parser.go:239-255 (values failing
    StringBytes() are skipped).  Arrow-batched; json.loads per element
    mirrors the reference's per-record fastjson call.
    """
    import json

    def one(s):
        if s is None:
            return None
        try:
            obj = json.loads(s)
        except Exception:
            return None
        if not isinstance(obj, dict):
            return None
        return {k: v for k, v in obj.items() if isinstance(v, str)}

    return lines.map(one)


# ---------------------------------------------------------------------------
# P3/P4: syslog
# ---------------------------------------------------------------------------

# RFC5424: <pri>version ts hostname app proc msgid structured-data msg
_RFC5424_RE = r"^<\d+>\d+ (\S+) (\S+) (\S+) (\S+) (\S+) (-|\[.*\])( (.*))?$"

_RFC5424_FIELDS = ["app_name", "hostname", "message", "msg_id", "proc_id", "structured_data"]


def parse_syslog_rfc5424(line: Column) -> Column:
    """RFC5424 -> struct of the reference's six string fields
    (string-valued keys of the parser dump only,
    /root/reference/internal/parser/parser.go:178-197; golden
    /root/reference/internal/parser/parser_test.go:125-138)."""
    struct = F.struct(
        F.regexp_extract(line, _RFC5424_RE, 3).alias("app_name"),
        F.regexp_extract(line, _RFC5424_RE, 2).alias("hostname"),
        F.regexp_extract(line, _RFC5424_RE, 8).alias("message"),
        F.regexp_extract(line, _RFC5424_RE, 5).alias("msg_id"),
        F.regexp_extract(line, _RFC5424_RE, 4).alias("proc_id"),
        F.regexp_extract(line, _RFC5424_RE, 6).alias("structured_data"),
    )
    return F.when(line.rlike(_RFC5424_RE), struct).otherwise(
        F.lit(None).cast(_grok_type(_RFC5424_FIELDS))
    )


# RFC3164: <pri>Mmm dd hh:mm:ss hostname tag[pid]: content
_RFC3164_RE = r"^<\d+>[A-Z][a-z]{2} +\d+ \d+:\d+:\d+ (\S+) ([^:\[\s]+)(\[\d+\])?: (.*)$"

_RFC3164_FIELDS = ["content", "hostname", "tag"]


def parse_syslog_rfc3164(line: Column) -> Column:
    """RFC3164 -> {content, hostname, tag} (golden
    /root/reference/internal/parser/parser_test.go:139-149)."""
    struct = F.struct(
        F.regexp_extract(line, _RFC3164_RE, 4).alias("content"),
        F.regexp_extract(line, _RFC3164_RE, 1).alias("hostname"),
        F.regexp_extract(line, _RFC3164_RE, 2).alias("tag"),
    )
    return F.when(line.rlike(_RFC3164_RE), struct).otherwise(
        F.lit(None).cast(_grok_type(_RFC3164_FIELDS))
    )


# ---------------------------------------------------------------------------
# Dispatch (plays the format switch at parser.go:145-198)
# ---------------------------------------------------------------------------


def parse_line(line: Column, fmt: str, pattern: str = "", json_fields: list[str] | None = None) -> Column:
    """Format-dispatched parse -> struct column (or map for dynamic
    json).  Null result = parse failure; the caller must keep the row
    (P6, parser.go:201)."""
    if fmt == "nginx":
        return parse_grok(line, pattern)
    if fmt == "json":
        if json_fields:
            return parse_json_static(line, json_fields)
        return parse_json_dynamic(line)
    if fmt == "syslog-rfc5424":
        return parse_syslog_rfc5424(line)
    if fmt == "syslog-rfc3164":
        return parse_syslog_rfc3164(line)
    raise ValueError(f"unknown parser format: {fmt!r}")


def with_parsed(df: DataFrame, line_col: str, fmt: str, pattern: str = "",
                json_fields: list[str] | None = None) -> DataFrame:
    """Attach ``parsed`` + ``parse_ok`` columns; never drops rows (P6)."""
    parsed = parse_line(F.col(line_col), fmt, pattern, json_fields)
    return df.withColumn("parsed", parsed).withColumn(
        "parse_ok", F.col("parsed").isNotNull()
    )

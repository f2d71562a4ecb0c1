"""M1-M3 modifier + F2/F3 tag-merge operators.

The reference modifier round-trips every record through JSON and edits
it with dot-paths (/root/reference/internal/modifier/modifier.go:57-111)
— the per-record hot-path anti-pattern the north_rule forbids.  Here
every edit is a native Catalyst map/column expression:

- add fields   (modifier.go:66-74)  -> map_concat / withColumn(lit)
- drop fields  (modifier.go:76-82)  -> map_filter
- replace      (modifier.go:84-106) -> transform_values + regexp_replace
  (Go's ReplaceAllString replaces ALL matches; Spark's regexp_replace
  does too, and both use $1-style group refs — semantics compatible)

Tag merge (F2): lo.Assign(add_tags, parsed, labels) — RIGHT-most wins:
labels > parsed > add_tags (/root/reference/internal/forwarder/loki.go:33).
Plus the "source" tag = tailed path (here: url) injected at forwarder
build (/root/reference/internal/forwarder/forwarder.go:63-78), which as
part of add_tags is overridden by parsed/labels on conflict.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from hetman_spark.config import ModifierConfig

def _empty_map() -> Column:
    # built lazily: Column construction needs an active session
    return F.create_map().cast("map<string,string>")


def _strip_prefix(path: str) -> str:
    """Reference dot-paths address the record struct ("parsed.foo"
    edits the Parsed map); we operate on the map column directly."""
    return path.split(".", 1)[1] if "." in path else path


def add_fields(parsed: Column, fields: dict[str, str]) -> Column:
    """M1: static key/value adds.  map_concat right-most wins, so adds
    overwrite existing keys — matching sjson.Set semantics."""
    if not fields:
        return parsed
    add = F.create_map(
        *[x for k, v in sorted(fields.items()) for x in (F.lit(_strip_prefix(k)), F.lit(v))]
    )
    return F.map_concat(map_drop_keys(parsed, [k for k in fields]), add)


def map_drop_keys(parsed: Column, keys: list[str]) -> Column:
    """M2: drop fields by key (sjson.Delete analog)."""
    if not keys:
        return parsed
    names = [_strip_prefix(k) for k in keys]
    arr = F.array(*[F.lit(n) for n in names])
    return F.map_filter(parsed, lambda k, _v: ~F.array_contains(arr, k))


def _go_template_to_python(repl: str) -> str:
    """Convert Go's $1/${name}/$$ replacement template to Python's
    \\1/\\g<name>/$ for re.Match.expand."""
    out = repl.replace("$$", "\x00")
    out = re.sub(r"\$\{(\w+)\}", r"\\g<\1>", out)
    out = re.sub(r"\$(\d+)", r"\\\1", out)
    out = re.sub(r"\$([A-Za-z_]\w*)", r"\\g<\1>", out)
    return out.replace("\x00", "$")


def go_replace_all(s: str, rx: re.Pattern, repl_template: str) -> str:
    """Faithful port of Go regexp.ReplaceAllString's match loop: an
    empty match immediately after a previous match inserts NO
    replacement (Go regexp.go replaceAll: `if a[1] > lastMatchEnd ||
    a[0] == 0`).  Java's String.replaceAll lacks this skip, so
    regexp_replace('sensitive', '.*', '****') yields '********' on the
    JVM but '****' in the reference
    (/root/reference/internal/modifier/modifier_test.go:51-53,76)."""
    buf: list[str] = []
    last_end = 0
    pos = 0
    n = len(s)
    while pos <= n:
        m = rx.search(s, pos)
        if not m:
            break
        buf.append(s[last_end : m.start()])
        if m.end() > last_end or m.start() == 0:
            buf.append(m.expand(repl_template))
        last_end = m.end()
        pos = pos + 1 if pos + 1 > m.end() else m.end()
    buf.append(s[last_end:])
    return "".join(buf)


def _can_match_empty(pattern: str) -> bool:
    try:
        return re.compile(pattern).search("") is not None
    except re.error:
        return False


def replace_field(parsed: Column, path: str, pattern: str, replacement: str) -> Column:
    """M3: regex-replace one field's value in place.

    Reference skips the edit when the field is absent/empty
    (modifier.go:88-93); replaces ALL matches (Go ReplaceAllString).

    Fast path: Spark regexp_replace (pure JVM, codegen) — identical to
    Go whenever the pattern cannot match the empty string, which is
    every realistic redact pattern.  Patterns that CAN match empty
    (e.g. the canonical `.*` -> `****`) diverge on the JVM (see
    go_replace_all), so those take an Arrow-batched pandas UDF that
    ports Go's match loop exactly.
    """
    key = _strip_prefix(path)
    if not _can_match_empty(pattern):
        return F.transform_values(
            parsed,
            lambda k, v: F.when(
                (k == key) & v.isNotNull() & (v != ""),
                F.regexp_replace(v, pattern, replacement),
            ).otherwise(v),
        )

    rx = re.compile(pattern)
    tmpl = _go_template_to_python(replacement)

    @F.pandas_udf("string")
    def go_replace_udf(vals: pd.Series) -> pd.Series:
        return vals.map(lambda v: go_replace_all(v, rx, tmpl) if v else v)

    # pandas UDFs cannot run inside higher-order-function lambdas, so
    # pull the value out, transform, and splice it back into the map.
    val = F.when(F.map_contains_key(parsed, key), parsed.getItem(key))
    new_val = go_replace_udf(val)
    edited = F.map_concat(
        F.map_filter(parsed, lambda k, _v: k != key),
        F.create_map(F.lit(key), new_val),
    )
    return F.when(val.isNotNull() & (val != ""), edited).otherwise(parsed)


def apply_modifier(parsed: Column, cfg: ModifierConfig) -> Column:
    """Apply add -> drop -> replace in the reference's order
    (modifier.go:66-106: AddFields, DropFields, ReplaceFields)."""
    out = F.coalesce(parsed, _empty_map())
    out = add_fields(out, cfg.add_fields)
    out = map_drop_keys(out, list(cfg.drop_fields))
    for r in cfg.replace_fields:
        out = replace_field(out, r.path, r.pattern, r.replacement)
    return out


def merge_tags(add_tags: Column, parsed: Column, labels: Column) -> Column:
    """F2: stream-label construction with precedence
    labels > parsed > add_tags (right-most wins in lo.Assign,
    /root/reference/internal/forwarder/loki.go:33).

    map_concat in Spark 3.x+ with spark.sql.mapKeyDedupPolicy=LAST_WIN
    would do, but we avoid relying on session config: later maps are
    concatenated after filtering earlier ones' duplicate keys.
    """
    a = F.coalesce(add_tags, _empty_map())
    p = F.coalesce(parsed, _empty_map())
    l = F.coalesce(labels, _empty_map())
    # drop from a the keys present in p or l; drop from p the keys in l
    # (map_contains_key, not element_at: ANSI mode errors on missing keys)
    a_f = F.map_filter(a, lambda k, _v: ~F.map_contains_key(p, k) & ~F.map_contains_key(l, k))
    p_f = F.map_filter(p, lambda k, _v: ~F.map_contains_key(l, k))
    return F.map_concat(a_f, F.map_concat(p_f, l))


def fill_timestamp(ts: Column) -> Column:
    """F3: default timestamp fill — records without a timestamp get
    stamped at send time (/root/reference/internal/forwarder/loki.go:27-31).
    Batch analog: coalesce with current_timestamp()."""
    return F.coalesce(ts, F.current_timestamp())

"""Deterministic synthetic Common-Crawl-style webtext table.

Schema fixed by BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
plus a synthetic split_id partition column for checkpoint/resume tests
(FIXTURES.md §1).

One table row plays one hetman log record (pipeline.Data,
/root/reference/internal/pipeline/pipeline.go:3-8): html is the raw
payload (LogLine), warc_ts the Timestamp, url the per-source label.

Generation is pure Catalyst: spark.range + xxhash64-derived
pseudo-randomness.  No Python executes per row, the output is
deterministic for a given n_rows regardless of partitioning or
parallelism, and the same expressions generate 6k rows or 10^12 rows —
the generator IS distributed.

Skew (required by the north_rule): domains and langs are drawn
log-uniformly (p(k) ~ 1/k, Zipf-ish) so a handful of hot domains/langs
dominate, exercising the salted repartition and AQE skew handling.

The html template embeds
  - a <title>,
  - a body <p>...</p> whose content byte-equals the `text` column
    (the correctness invariant: byte-identical extracted text per url),
  - an nginx combined-format access log line in a <!--log: ... -->
    comment so the grok stage has real fields to pull
    (pattern from /root/reference/internal/parser/parser_test.go:94).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Vocabulary for body text; plain ASCII words, never containing the
# "</p>" terminator, so regex extraction is unambiguous.
_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu data spark pipeline web"
).split()

_LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "other"]

_METHODS = ["GET", "GET", "GET", "POST", "HEAD"]  # GET-heavy
_STATUSES = ["200", "200", "200", "200", "301", "404", "500"]

HTML_PREFIX = "<html><head><title>"
HTML_MID_1 = "</title></head><body><p>"
HTML_MID_2 = "</p><!--log: "
HTML_SUFFIX = " --></body></html>"


def _u(col: Column, salt: str, mod: int) -> Column:
    """Deterministic pseudo-uniform integer in [0, mod) derived from col."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(mod))


def _zipf_idx(col: Column, salt: str, k: int) -> Column:
    """Log-uniform index in [0, k): p(i) ~ 1/(i+1), Zipf-ish skew."""
    import math

    u = _u(col, salt, 1_000_000).cast("double") / 1_000_000.0
    # exp(u * ln(k+1)) spans [1, k+1); floor-1 gives [0, k-1] with
    # p(i) ~ ln((i+2)/(i+1)) — Zipf-ish, every index reachable.
    idx = F.floor(F.exp(u * math.log(float(k + 1)))).cast("int") - F.lit(1)
    return F.least(F.greatest(idx, F.lit(0)), F.lit(k - 1))


def _pick(arr: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in arr]), idx + 1)


def generate_webtext(
    spark: SparkSession,
    n_rows: int,
    n_domains: int = 100,
    n_splits: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Build the webtext DataFrame lazily; all columns are Catalyst
    expressions over spark.range(n_rows)."""
    df = spark.range(0, n_rows, 1, partitions or max(8, n_splits))
    rid = F.col("id")

    domain_idx = _zipf_idx(rid, "domain", n_domains)
    domain = F.concat(F.lit("host"), F.lpad(domain_idx.cast("string"), 3, "0"), F.lit(".example.com"))
    path = F.concat(
        F.lit("/"),
        _pick(["news", "blog", "docs", "shop", "wiki"], _u(rid, "sect", 5).cast("int")),
        F.lit("/page-"),
        rid.cast("string"),
    )
    url = F.concat(F.lit("https://"), domain, path)

    # monotone-ish timestamps over a 24h window starting 2024-01-01
    warc_ts = F.timestamp_seconds(F.lit(1704067200) + (rid * F.lit(86400) / F.lit(max(n_rows, 1))).cast("long"))

    lang = _pick(_LANGS, _zipf_idx(rid, "lang", len(_LANGS)))

    # body text: 5..40 vocab words, deterministic per id; ends with a
    # per-row token so every text is unique per url.
    n_words = (_u(rid, "nwords", 36) + 5).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: _pick(_VOCAB, _u(rid + i.cast("long") * 7919, "w", len(_VOCAB)).cast("int")),
    )
    text = F.concat(F.array_join(words, " "), F.lit(" doc"), rid.cast("string"))

    title = F.concat(F.lit("Page "), rid.cast("string"), F.lit(" of "), domain)

    # embedded nginx combined log line (fields derived from the row)
    ip = F.concat_ws(
        ".",
        (_u(rid, "ip1", 223) + 1).cast("string"),
        _u(rid, "ip2", 256).cast("string"),
        _u(rid, "ip3", 256).cast("string"),
        (_u(rid, "ip4", 254) + 1).cast("string"),
    )
    method = _pick(_METHODS, _u(rid, "meth", len(_METHODS)).cast("int"))
    status = _pick(_STATUSES, _zipf_idx(rid, "status", len(_STATUSES)))
    bytes_sent = (_u(rid, "bytes", 50000) + 100).cast("string")
    time_local = F.date_format(warc_ts, "dd/MMM/yyyy:HH:mm:ss +0000")
    log_line = F.concat(
        ip,
        F.lit(" - - ["),
        time_local,
        F.lit('] "'),
        method,
        F.lit(" "),
        path,
        F.lit(' HTTP/1.1" '),
        status,
        F.lit(" "),
        bytes_sent,
        F.lit(' "-" "Mozilla/5.0 (synthetic)"'),
    )

    html = F.concat(
        F.lit(HTML_PREFIX),
        title,
        F.lit(HTML_MID_1),
        text,
        F.lit(HTML_MID_2),
        log_line,
        F.lit(HTML_SUFFIX),
    ).cast("binary")

    split_id = F.pmod(F.xxhash64(url), F.lit(n_splits)).cast("int")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        split_id.alias("split_id"),
    )


def write_webtext(
    spark: SparkSession,
    path: str,
    n_rows: int,
    n_domains: int = 100,
    n_splits: int = 16,
    files_per_split: int = 1,
) -> None:
    """Materialize the webtext table as parquet partitioned by split_id
    (the checkpoint/resume unit — plays the tailed file in hetman's
    offset registry, /root/reference/internal/registry/registry.go:14-18).

    partitionBy(split_id) makes resume's manifest anti-join a real
    partition-pruning filter, not a row scan (SURVEY.md §4).

    files_per_split: 1 gives the minimal-file layout (hash repartition
    on split_id — one task per split dir); >1 range-partitions on
    (split_id, url) so each split dir holds ~files_per_split files,
    which is what a real corpus looks like and what scan-task
    granularity needs (16 one-file splits = at most 8-16 scan tasks;
    a 4N-core run then idles half its cores through the parse stage).
    Either way tasks stay split-aligned — never the tasks x splits
    sliver explosion (measured 4096 files for 64x64).
    """
    df = generate_webtext(spark, n_rows, n_domains, n_splits)
    if files_per_split > 1:
        df = df.repartitionByRange(n_splits * files_per_split, "split_id", "url")
    else:
        df = df.repartition(n_splits, "split_id")
    (
        df.write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("split_id")
        .parquet(path)
    )

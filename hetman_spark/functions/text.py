"""Text analysis for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

All pure Catalyst expressions (JVM, whole-stage codegen) — no Python
on the hot path.  Designed for the `documents` table shape
(doc_id, text, lang, source, n_chars) and for the webtext `text`
column equally.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small multilingual stopword marker sets for the n-gram/stopword
# language-ID heuristic; deliberately tiny — the heuristic's value is
# its shape (vectorized scoring + argmax), not lexical completeness.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
    "pt": ["o", "que", "de", "para", "uma"],
    "ru": ["и", "в", "не", "на", "что"],
}


def token_count(text: Column, pattern: str = r"\s+") -> Column:
    """Whitespace token count (BIGINT).  For a BPE-ish estimate use
    bpe_token_estimate."""
    return F.when(F.length(text) == 0, F.lit(0)).otherwise(
        F.size(F.split(text, pattern))
    ).cast("long")


def bpe_token_estimate(text: Column) -> Column:
    """Rough BPE token-count estimate without a tokenizer: word pieces
    split on non-alphanumerics plus a chars/4 floor (the common
    ~4-chars-per-token heuristic), JVM-side."""
    words = F.size(F.split(text, r"[^\p{L}\p{N}]+"))
    return F.greatest(words.cast("long"), (F.length(text) / 4).cast("long"))


def word_count(text: Column, word: str) -> Column:
    """Occurrences of a literal word (word-boundary), via length
    difference — avoids regexp_extract_all materialization."""
    stripped = F.regexp_replace(text, rf"\b{word}\b", "")
    return ((F.length(text) - F.length(stripped)) / len(word)).cast("long")


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach integer/ratio quality columns (the length/punct/stopword
    trio every web-corpus filter starts from)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    alpha = F.length(F.regexp_replace(t, r"[^\p{L}]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", ""))
    stop_hits = sum(
        (word_count(t, w) for w in _LANG_MARKERS["en"]),
        F.lit(0).cast("long"),
    )
    return (
        df.withColumn("q_n_chars", n_chars.cast("long"))
        .withColumn("q_n_tokens", n_tokens)
        .withColumn("q_alpha_ratio", (alpha / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn("q_punct_ratio", (punct / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn("q_stopword_hits", stop_hits)
        .withColumn(
            "q_mean_token_len",
            (n_chars / F.greatest(n_tokens, F.lit(1))).cast("double"),
        )
    )


def lang_id(text: Column) -> Column:
    """Marker-word language ID: score each language by summed marker
    hits, take the argmax (ties -> first by score struct ordering).
    Pure expressions; one pass per marker word over the lowered text."""
    lowered = F.lower(text)
    scored = [
        F.struct(
            sum((word_count(lowered, w) for w in words), F.lit(0).cast("long")).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in _LANG_MARKERS.items()
    ]
    best = F.array_max(F.array(*scored))
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))


def fingerprint(text: Column, prefix_len: int = 256) -> Column:
    """Deterministic document fingerprint: 64-bit xxhash of the
    normalized text (whitespace collapsed, lowered).  The rolling-hash
    shingle variant lives in dedup.simhash/minhash."""
    normalized = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.xxhash64(normalized)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_token_len: int = 2,
    max_mean_token_len: int = 12,
    min_alpha_pct: int = 60,
    min_stopword_hits: int = 1,
) -> DataFrame:
    """Gopher-style rule filter (Rae et al. 2021's repetition/length
    heuristics, the standard web-corpus gate): attaches `kept` and the
    FIRST failing rule as `reason` ('ok' when all pass).  Rows are
    never dropped — filtering is the caller's `.where(col('kept'))`,
    so rejected docs stay auditable (the same never-drop principle as
    the parse stage's P6 passthrough).

    Every rule is INTEGER arithmetic (cross-multiplied ratios), so the
    verdict is bit-identical on any engine — float thresholds near a
    boundary are not (see the ANN quantization note in similarity.py).
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count(t)
    alpha = F.length(F.regexp_replace(t, r"[^\p{L}]", "")).cast("long")
    stop_hits = sum(
        (word_count(F.lower(t), w) for w in _LANG_MARKERS["en"]),
        F.lit(0).cast("long"),
    )
    reason = (
        # explicit null guard: every comparison below is NULL for a
        # NULL text, which would fall through to 'ok'
        F.when(t.isNull(), F.lit("empty"))
        .when(n_tokens < min_tokens, F.lit("too_short"))
        .when(n_tokens > max_tokens, F.lit("too_long"))
        .when(n_chars < min_mean_token_len * n_tokens, F.lit("tokens_too_short"))
        .when(n_chars > max_mean_token_len * n_tokens, F.lit("tokens_too_long"))
        .when(100 * alpha < min_alpha_pct * n_chars, F.lit("low_alpha"))
        .when(stop_hits < min_stopword_hits, F.lit("no_stopwords"))
        .otherwise(F.lit("ok"))
    )
    return df.withColumn("reason", reason).withColumn("kept", F.col("reason") == "ok")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop: quality signals + lang guess + fingerprint."""
    out = quality_signals(df, text_col)
    return out.withColumn("lang_guess", lang_id(F.col(text_col))).withColumn(
        "fingerprint", fingerprint(F.col(text_col))
    )


def canonical_url(u: Column) -> Column:
    """Canonicalize a URL for crawl dedup (the normalization step a
    frontier/dedup pass runs before keying on the URL — cf. the
    reference's path-based file identity, internal/tailer/tailer.go:
    the canonical key IS the identity): lowercase scheme and host,
    strip a default :80/:443 port, drop query string and fragment,
    strip trailing slashes from the path.  Pure codegen regexps —
    no UDF, safe in any hot path."""
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
        r":(80|443)$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
        r"/+$",
        "",
    )
    return F.concat(scheme, F.lit("://"), host, path)


def c4_line_filter(
    text: Column,
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> Column:
    """C4's line/page cleaning pass (Raffel et al. 2020, §2.2) as ONE
    struct expression — the rule set that built the C4 corpus:

    line kept iff it ends in terminal punctuation ('.', '!', '?', '"'),
    has >= min_words whitespace-separated words, and does not mention
    javascript (case-insensitive); page kept iff the raw text contains
    no '{' (code), no 'lorem ipsum' (placeholder), and >= min_kept_lines
    lines survive.  first_fail verdict: 'brace' / 'lorem' /
    'too_few_lines' / 'ok' (C4 drops the page; emitting the reason keeps
    rows auditable, the P6 convention).

    No reference analog (the reference ships logs); this is the
    page-cleaning stage of the LLM-pipeline brief.  Pure per-row
    Catalyst expressions (split + filter + array_join) — no UDF, no
    shuffle; at 100 TB this runs inside the scan's codegen stage.

    Returns struct<n_lines, n_kept, clean_text, verdict>: clean_text =
    surviving lines re-joined, NULL when the page is dropped."""
    lines = F.split(text, "\n")

    def keep_line(line: Column) -> Column:
        return (
            line.rlike('[.!?"]$')
            & (F.size(F.split(F.trim(line), " +")) >= min_words)
            & ~F.lower(line).contains("javascript")
        )

    kept = F.filter(lines, keep_line)
    n_kept = F.size(kept).cast("long")
    verdict = (
        F.when(text.contains("{"), F.lit("brace"))
        .when(F.lower(text).contains("lorem ipsum"), F.lit("lorem"))
        .when(n_kept < min_kept_lines, F.lit("too_few_lines"))
        .otherwise(F.lit("ok"))
    )
    return F.struct(
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept"),
        F.when(verdict == "ok", F.array_join(kept, "\n"))
        .otherwise(F.lit(None).cast("string"))
        .alias("clean_text"),
        verdict.alias("verdict"),
    )


def nfc_normalize_udf():
    """Arrow-batched Unicode NFC normalizer — the one text-cleaning
    primitive Spark SQL has NO built-in for (no normalize()/unaccent
    in pyspark.sql.functions), so this is the legitimate pandas-UDF
    slow path the brief allows: Python's unicodedata implements the
    same Unicode normalization tables DuckDB's nfc_normalize uses, so
    the result is byte-identical across engines and an oracle can
    cover it.  Web corpora mix precomposed (U+00E1) and decomposed
    (a + U+0301) forms of the same visible text; exact dedup keyed on
    raw bytes silently misses those pairs — normalize FIRST, then
    hash."""
    import unicodedata

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return nfc


def word_ngrams(text: Column, n: int = 3, sep: str = " ") -> Column:
    """Array of word n-grams of `text` (split on `sep`), empty for
    docs shorter than n words.  Pure Catalyst (sequence + slice +
    concat_ws — runs inside scan codegen); the guard matters because
    Spark's sequence(1, stop) DESCENDS when stop < 1 (default step
    -1) instead of returning empty."""
    ws = F.split(text, sep)
    idxs = F.when(
        F.size(ws) >= n,
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idxs, lambda i: F.concat_ws(sep, F.slice(ws, i, n)))

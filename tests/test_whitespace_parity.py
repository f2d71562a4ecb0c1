"""Whitespace-robust oracle parity (r3 VERDICT What's-wrong #1).

The Spark shingle/token operators split on the regex \\s+
(functions/dedup.py:48); until round 4 four DuckDB twins split on a
literal space and agreed only because the driver fixture is
single-spaced.  This test runs the affected entry queries against a
documents table that is deliberately whitespace-HOSTILE — tabs,
newlines, double spaces, leading/trailing runs — and compares Spark vs
DuckDB with the same type-strict normalization the parity gate uses.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tools.check_parity import normalize

# doc_id < 10 is the contamination entry's eval set; >= 10 the corpus.
# Near-dup pairs across the whitespace variants exercise the banded
# joins; the 2-word doc exercises the empty-shingle guard.
_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog entirely"),
    (2, "the\tquick  brown fox\njumps over\t\tthe lazy dog entirely"),
    (11, "the quick brown fox jumps over the lazy dog entirely today"),
    (12, " the quick\tbrown fox jumps\nover the lazy dog entirely "),
    (13, "  pack my box with five dozen liquor jugs again and again  "),
    (14, "pack\tmy box with five dozen liquor jugs again\nand again"),
    (15, "short\tdoc"),
    (16, "one\n\ntwo\n\nthree four five six seven eight nine ten\n"),
]

_ENTRIES = [
    "minhash_band_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "contamination_overlap",
    "repetition_stats",
    "simhash_groups",
    "simhash_near_pairs",
]


@pytest.fixture(scope="module")
def ws_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ws_docs")
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in _DOCS], pa.int64()),
            "text": pa.array([t for _, t in _DOCS], pa.string()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", _ENTRIES)
def test_whitespace_diverse_docs_match_oracle(spark, ws_dir, name):
    from hetman_spark import entry_queries as eq

    sdf = eq.QUERIES[name](spark, ws_dir)
    srows = [r.asDict() for r in sdf.collect()]
    spark_cols = sorted(sdf.columns)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{ws_dir}/documents.parquet'"
    )
    cur = con.execute(eq.ORACLES[name])
    duck_cols_orig = [c[0] for c in cur.description]
    drows = [dict(zip(duck_cols_orig, r)) for r in cur.fetchall()]

    assert spark_cols == sorted(duck_cols_orig)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    assert normalize(srows, spark_cols) == normalize(drows, spark_cols)
    # the whitespace variants must actually produce output (a silently
    # empty result would make the equality above vacuous)
    if name.endswith("_pairs") or name == "contamination_overlap":
        assert len(srows) > 0

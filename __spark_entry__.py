"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in hetman_spark/entry_queries.py; pipeline-level
invariants the oracle can't express (byte-identical html extraction,
kill/resume idempotence, tag merge precedence) are covered by pytest
(tests/test_pipeline.py et al.).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the tag-driven router
    fan-out with per-sink aggregate counts — the north-star headline
    semantics (hetman's multi-forwarder fan-out + forwardedLogCount)."""
    from hetman_spark.entry_queries import q_route_fanout

    return q_route_fanout(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hetman_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hetman_spark.entry_queries import ORACLES

    return dict(ORACLES)

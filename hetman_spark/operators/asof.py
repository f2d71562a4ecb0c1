"""As-of join: attach to each left row the latest right row with
right_ts <= left_ts per key — the "most recent dimension snapshot"
join (market data, config history, last-interaction features).

Spark has no native ASOF JOIN.  A naive theta-join
(l.key = r.key AND r.ts <= l.ts) explodes quadratically per key and
needs a post-aggregation.  The scale-correct composition is the
union-and-carry-forward trick:

    tag right rows, union both sides, ONE shuffle on the key,
    within-partition sort by (ts, side), carry the right payload
    forward with last(ignoreNulls), keep left rows.

Cost: one shuffle of left+right (each row once — never duplicated),
one window pass.  Skewed keys behave like any window op (a hot key is
one partition; cap upstream, same note as operators/sessionize.py).

Tie semantics match DuckDB/kdb ASOF: a right row AT the left row's
timestamp matches (>= inclusive) — right rows sort before left rows
at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + each right payload column
    (null when no right row precedes).

    The whole right payload is carried as ONE struct so every output
    column comes from the SAME matched right row (per-column
    carry-forward could stitch columns from different snapshots when a
    later snapshot holds nulls).  Right rows must be unique per
    (key, right_ts) — pre-aggregate otherwise (ambiguous ties have no
    portable semantics)."""
    from pyspark.sql import Window

    payload_cols = payload_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    clash = (set(payload_cols) | {"_ts", "_side", "_p"}) & set(left.columns)
    if clash:
        # the null-fill loop + final withColumn would silently
        # OVERWRITE a left column of the same name — refuse instead
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with right "
            "payload columns (or the internal _ts/_side/_p names); rename "
            "or pass payload_cols explicitly"
        )
    payload_t = (
        "struct<" + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload_cols
        ) + ">"
    )
    l_tagged = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn("_p", F.lit(None).cast(payload_t))
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_p"),
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(l_tagged.schema[c].dataType)
            )
    u = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    # right rows (side 0) sort before left rows (side 1) at equal ts ->
    # ">= inclusive" match semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_p", F.last("_p", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1)
    for c in payload_cols:
        out = out.withColumn(c, F.col(f"_p.{c}"))
    return out.drop("_ts", "_side", "_p")

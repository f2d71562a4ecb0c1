"""P5: multiline stitching as a batch operator.

Reference semantics (/root/reference/internal/parser/parser.go:93-128,
golden /root/reference/internal/parser/parser_test.go:150-207):
- a line NOT matching multiline_pattern starts a new anchor (and emits
  the previous group);
- a line matching the pattern is appended to the current anchor,
  joined by a single space;
- a group = anchor + its continuations.

Batch translation (SURVEY.md §2.2 P5): within each file/stream, over a
total order column, anchor_id = running count of anchor flags, then
groupBy(anchor_id) + concat_ws(" ", ordered lines).  Pure Catalyst:
one window (partitioned by file — parallel across files) + one
aggregation.  Leading continuation lines with no preceding anchor get
anchor_id 0 and stitch together, mirroring the reference's behavior of
appending to an empty anchor.

Scale note: the window shuffles once on (file_id) and sorts by
line_no; the subsequent groupBy(file_id, anchor_id) reuses that
hash partitioning (no second full shuffle of rows after AQE), and no
group ever exceeds one stack trace, so memory is bounded per group,
not per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stitch_multiline(
    df: DataFrame,
    pattern: str,
    file_col: str = "file_id",
    order_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Collapse continuation lines into their anchor line.

    Returns (file_col, anchor_id, order_col = anchor's line_no,
    line_col = stitched line) — one row per logical record, ordered
    deterministically by (file_col, anchor_id).
    """
    is_cont = F.col(line_col).rlike(pattern)
    w = Window.partitionBy(file_col).orderBy(order_col)
    anchored = df.withColumn(
        "anchor_id",
        F.sum((~is_cont).cast("long")).over(w),
    )
    return (
        anchored.groupBy(file_col, "anchor_id")
        .agg(
            F.min(order_col).alias(order_col),
            F.concat_ws(" ", F.array_sort(F.collect_list(F.struct(order_col, line_col))).getField(line_col)).alias(line_col),
        )
    )

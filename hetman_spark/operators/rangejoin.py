"""Range join: points-in-interval matching without a theta-join.

Spark executes `p.ts BETWEEN i.start AND i.end` as a broadcast
nested-loop / cartesian — O(points × intervals), dead at scale.  The
scale-safe composition is TIME BINNING (the same trick behind
Databricks' range-join hints and every streaming interval join):

    pick a bin width W >= the longest interval;
    point  -> its one bin  floor(ts / W);
    interval -> explodes to ceil(len/W)+1 <= 2 bins;
    equi-join on bin, then the exact BETWEEN as a post-filter.

A point sits in exactly ONE bin while the interval copy in that bin
is unique (one exploded row per (interval, bin)), so each candidate
pair meets exactly once — NO distinct / dedup shuffle is needed after
the filter.  The join is a hash join on a dense integer key; the
shuffle carries (bin, id, ts) tuples only.

W trades shuffle fan-out (intervals duplicate per bin) against bucket
selectivity (a huge W puts everything in one bin).  W = max interval
length is the sweet spot: <= 2 bins per interval, and a bin only
holds intervals that could plausibly match its points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points_intervals(
    points: DataFrame,
    intervals: DataFrame,
    bin_seconds: int,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
) -> DataFrame:
    """All (point, interval) pairs with start <= point_ts <= end
    (epoch-second resolution).

    bin_seconds is a PERF knob, not a correctness precondition: the
    explode covers every bin an interval spans, so any W is correct —
    a smaller W only increases interval duplication (ceil(len/W)+1
    exploded rows per interval) while a huge W degrades bucket
    selectivity.  W >= the longest interval keeps the fan-out <= 2
    rows per interval (the module-docstring sweet spot)."""
    p = points.withColumn("_bin", F.floor(F.unix_timestamp(F.col(point_ts)) / bin_seconds))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(end_ts)) / bin_seconds),
            )
        ),
    )
    joined = p.join(i, "_bin").where(
        (F.unix_timestamp(F.col(point_ts)) >= F.unix_timestamp(F.col(start_ts)))
        & (F.unix_timestamp(F.col(point_ts)) <= F.unix_timestamp(F.col(end_ts)))
    )
    return joined.drop("_bin")

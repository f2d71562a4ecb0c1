"""Bin-bucketed range join: exact containment semantics + plan shape."""

from pyspark.sql import functions as F

from hetman_spark.operators.rangejoin import range_join_points_intervals


def _frames(spark):
    pts = spark.createDataFrame(
        [
            (1, "2024-01-01 10:15:00"),
            (2, "2024-01-01 10:30:00"),  # exactly at an interval end
            (3, "2024-01-01 10:30:01"),  # one second past
            (4, "2024-01-01 23:00:00"),  # matches nothing
            (5, "2024-01-01 12:00:00"),  # in two overlapping intervals
        ],
        "event_id long, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    iv = spark.createDataFrame(
        [
            (10, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
            (11, "2024-01-01 11:30:00", "2024-01-01 12:30:00"),
            (12, "2024-01-01 11:59:00", "2024-01-01 12:01:00"),
        ],
        "interval_id long, s string, e string",
    ).select(
        "interval_id",
        F.to_timestamp("s").alias("start_ts"),
        F.to_timestamp("e").alias("end_ts"),
    )
    return pts, iv


def test_range_join_containment(spark):
    pts, iv = _frames(spark)
    out = range_join_points_intervals(pts, iv, bin_seconds=3600)
    pairs = {(r["event_id"], r["interval_id"]) for r in out.collect()}
    assert pairs == {
        (1, 10),
        (2, 10),          # inclusive end
        (5, 11), (5, 12),  # overlapping intervals both match
    }
    # exactly one row per matching pair (no bin-duplicate rows)
    assert out.count() == len(pairs)


def test_range_join_plan_is_equi(spark):
    pts, iv = _frames(spark)
    plan = (
        range_join_points_intervals(pts, iv, bin_seconds=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

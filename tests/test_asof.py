"""As-of join: union + carry-forward composition (Spark has no native
ASOF JOIN; the DuckDB oracle for the driver entry IS native ASOF, so
the entry parity check is an independent-implementation test — this
file pins the edge semantics)."""

from pyspark.sql import functions as F

from hetman_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:00"),
            (2, 1, "2024-01-01 11:00:00"),
            (3, 1, "2024-01-01 09:00:00"),   # before any snapshot
            (4, 2, "2024-01-01 10:30:00"),   # exactly at snapshot ts
            (5, 3, "2024-01-01 12:00:00"),   # key with no snapshots
        ],
        "event_id long, user_id long, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:30:00", 100),
            (1, "2024-01-01 10:30:00", 200),
            (2, "2024-01-01 10:30:00", 300),
        ],
        "user_id long, ts_s string, snap long",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r["snap"]
           for r in asof_join(left, right, key="user_id").collect()}
    assert out[1] == 100   # latest snapshot <= 10:00 is 09:30
    assert out[2] == 200   # 10:30 snapshot superseded 09:30
    assert out[3] is None  # no snapshot before 09:00 (left-join null)
    assert out[4] == 300   # equal timestamp matches (>= inclusive)
    assert out[5] is None  # key never snapshotted
    assert len(out) == 5   # left rows never duplicated or dropped


def test_asof_join_no_cartesian(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, key="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_struct_carry_is_row_atomic(spark):
    """Payload columns must come from the SAME matched right row."""
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 12:00:00")], "event_id long, user_id long, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 10, "a"),
            (1, "2024-01-01 11:00:00", None, "b"),  # later snapshot, null x
        ],
        "user_id long, ts_s string, x long, y string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    r = asof_join(left, right, key="user_id").collect()[0]
    # the 11:00 row is the match — x must be ITS null, not 10:00's 10
    assert r["y"] == "b" and r["x"] is None

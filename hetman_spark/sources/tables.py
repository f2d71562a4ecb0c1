"""Table readers: parquet (default) with Iceberg gated behind an
import/classpath check.

The north_star names an Iceberg webtext table; this container has no
Iceberg runtime jars, so parquet is the storage engine here and the
Iceberg path activates when the jar + catalog conf exist (documented,
not stubbed with fakes).  Both return the same DataFrame shape, and
everything downstream (manifest resume, partition pruning on
split_id) is storage-agnostic: with Iceberg the manifest anti-join is
served by table metadata, with parquet by hive-style dirs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog", False,
            spark._jvm.Thread.currentThread().getContextClassLoader(),
        )
        return True
    except Exception:
        return False


def read_webtext(spark: SparkSession, location: str) -> DataFrame:
    """Read the webtext table from either an Iceberg table identifier
    (catalog.db.table) or a parquet path.

    Iceberg identifiers contain no '/' — that plus availability of the
    runtime picks the branch.
    """
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_sink_iceberg_or_parquet(
    df: DataFrame, location: str, partition_cols: tuple[str, ...] = ("sink_id", "split_id")
) -> None:
    """Sink writer with the same duality.  On Iceberg the per-split
    idempotence comes from `overwritePartitions()` snapshots instead of
    dynamic partition overwrite; semantics (exactly-once observable
    output per split) are identical."""
    spark = df.sparkSession
    if "/" not in location and iceberg_available(spark):
        df.writeTo(location).overwritePartitions()
        return
    (
        df.write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy(*partition_cols)
        .parquet(location)
    )

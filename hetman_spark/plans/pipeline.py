"""The end-to-end pipeline: read -> parse -> enrich -> route -> write,
with lineage and checkpoint-manifest resume.

This replaces hetman's whole orchestrator
(/root/reference/internal/orchestrator/orchestrator.go:242-425): the
goroutine/channel graph becomes ONE lazy DataFrame per batch of input
splits; Catalyst plans it, the driver loop commits manifest entries —
SURVEY.md §3.1 "the driver loop is: for batch_of_partitions: process;
append manifest entry".

Stages and their reference analogs:
  read parquet (pruned by manifest anti-join) . tailer + offset seek
  extract_html_fields (pandas UDF)            . Parser.Run (P1)
  grok parse of the embedded log line         . Parser.Run (P1)
  apply_modifier                              . Modifier.Run (M1-M3)
  enrich_with_lookup (salted + broadcast)     . add-fields w/ lookup
  route_explode + with_sink_tags              . Modifier fan-out + Loki
                                                stream building (M4/F2)
  write partitionBy(sink_id, split_id)        . Forwarder delivery (F1)
  lineage + sink counts                       . OTel counters (A1/A2)
  commit_split                                . registry persist (A5)

Scale shape (the plan we WANT at 100 TB):
  one scan (pruned to uncommitted splits, column-pruned), no shuffle
  until the single salted layout repartition, broadcast joins only,
  one write. Lineage aggs are map-side-combined and tiny.  Per-batch
  job granularity keeps any single failure domain to
  splits_per_commit splits.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hetman_spark.config import ModifierConfig, PipelineSpec, SinkConfig
from hetman_spark.operators.enrich import enrich_with_lookup
from hetman_spark.operators.html import with_html_fields
from hetman_spark.operators.modify import apply_modifier
from hetman_spark.operators.parse import make_grok_pandas_udf, parse_grok
from hetman_spark.operators.route import route_explode, sink_counts, with_sink_tags
from hetman_spark.plans.checkpoint import commit_split, committed_splits
from hetman_spark.sources.lookup import DEFAULT_SINKS, lang_lookup, routes_df

# nginx combined-log pattern for the embedded access-log line
# (reference pattern: /root/reference/internal/parser/parser_test.go:94)
NGINX_PATTERN = (
    '$remote_addr - $remote_user [$time_local] "$request" '
    '$status $bytes_sent "$referrer" "$user_agent"'
)


@dataclass
class PipelineResult:
    splits_processed: list[int] = field(default_factory=list)
    rows_in: int = 0
    rows_parsed: int = 0
    sink_counts: dict[str, int] = field(default_factory=dict)


def build_enriched(
    df: DataFrame,
    lookup: DataFrame,
    modifier: ModifierConfig | None = None,
    salt_buckets: int = 8,
    use_pandas_udf: bool = True,
) -> DataFrame:
    """parse + modify + enrich (everything before the router).

    Produces columns: url, warc_ts, lang, split_id, extracted_text,
    title, log_line, parsed (map), parse_ok, lang_label, region,
    status_class.
    """
    # --- parse stage (vectorized; no per-row Python) ---
    df = with_html_fields(df, "html", jvm=not use_pandas_udf)
    if use_pandas_udf:
        grok_udf, _ = make_grok_pandas_udf(NGINX_PATTERN)
        df = df.withColumn("_log", grok_udf(F.col("log_line")))
    else:
        df = df.withColumn("_log", parse_grok(F.col("log_line"), NGINX_PATTERN))
    # parsed map (hetman's Parsed map[string]string); null-safe (P6)
    log_fields = ["remote_addr", "remote_user", "time_local", "request",
                  "status", "bytes_sent", "referrer", "user_agent"]
    df = (
        df.withColumn(
            "parsed",
            F.when(
                F.col("_log").isNotNull() & F.col("_log.status").isNotNull(),
                F.map_from_arrays(
                    F.array(*[F.lit(f) for f in log_fields]),
                    F.array(*[F.col(f"_log.{f}") for f in log_fields]),
                ),
            ),
        )
        .withColumn("parse_ok", F.col("parsed").isNotNull())
        # status_class routing tag (5xx -> errors sink), from the parse
        # struct before the modifier can rename/drop fields
        .withColumn(
            "status_class",
            F.when(
                F.col("_log.status").isNotNull() & (F.col("_log.status") != ""),
                F.concat(F.substring(F.col("_log.status"), 1, 1), F.lit("xx")),
            ).otherwise(F.lit("unparsed")),
        )
        .drop("_log")
    )

    # --- modifier stage (M1-M3, pure Catalyst) ---
    if modifier is not None:
        df = df.withColumn("parsed", apply_modifier(F.col("parsed"), modifier))

    # --- enrich stage: salted repartition + broadcast lookup join ---
    return enrich_with_lookup(df, lookup, on="lang", salt_buckets=salt_buckets, salt_from="url")


def build_routed(enriched: DataFrame, routes: DataFrame) -> DataFrame:
    """Router + per-record sink tags; output row shape per FIXTURES §5:
    (sink_id, url, warc_ts, text, tags, split_id, lang)."""
    routed = route_explode(enriched, routes, predicate_cols=["lang", "status_class", "region"])
    routed = with_sink_tags(routed, parsed_col="parsed", labels_col="labels", source_col="url")
    return routed.select(
        "sink_id",
        "url",
        "warc_ts",
        F.col("extracted_text").alias("text"),
        "tags",
        "split_id",
        "lang",
    )


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    sinks: tuple[SinkConfig, ...] = DEFAULT_SINKS,
    modifier: ModifierConfig | None = None,
    salt_buckets: int = 8,
    splits_per_commit: int = 64,
    max_splits: int | None = None,
    use_pandas_udf: bool = True,
) -> PipelineResult:
    """Resumable driver loop.

    Each iteration: one Spark job over <= splits_per_commit uncommitted
    splits -> dynamic-overwrite write partitioned by (sink_id,
    split_id) -> lineage write -> manifest commit per split.  A kill
    between write and commit reprocesses those splits on rerun,
    overwriting their output partitions idempotently (exactly-once
    observable output; see plans/checkpoint.py).
    """
    manifest_dir = os.path.join(out_dir, "_manifest")
    data_dir = os.path.join(out_dir, "data")
    lineage_dir = os.path.join(out_dir, "lineage")

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    src = spark.read.parquet(input_path)
    all_splits = sorted(
        r["split_id"] for r in src.select("split_id").distinct().collect()
    )
    done = committed_splits(manifest_dir)
    todo = [s for s in all_splits if s not in done]
    if max_splits is not None:
        todo = todo[:max_splits]

    lookup = lang_lookup(spark)
    routes = routes_df(spark, sinks)
    result = PipelineResult()

    for i in range(0, len(todo), splits_per_commit):
        batch = todo[i : i + splits_per_commit]
        # manifest anti-join == partition-pruned isin filter on the
        # partition column (split_id) — Catalyst prunes at the source.
        df = src.filter(F.col("split_id").isin(batch))

        enriched = build_enriched(
            df, lookup, modifier=modifier, salt_buckets=salt_buckets,
            use_pandas_udf=use_pandas_udf,
        )
        routed = build_routed(enriched, routes)

        # cache the routed frame: it feeds the write AND two lineage
        # aggs (hetman analog: the common-subplan dedup of
        # config.go:221-242 — source+parse run once per batch).
        routed.persist()
        try:
            (
                routed.write.mode("overwrite")
                .option("compression", "zstd")
                .partitionBy("sink_id", "split_id")
                .parquet(data_dir)
            )

            # lineage (A1/A2): per-split in/parsed counts + per-sink routed
            in_counts = {
                r["split_id"]: (r["rows_in"], r["rows_parsed"])
                for r in enriched.groupBy("split_id")
                .agg(
                    F.count(F.lit(1)).alias("rows_in"),
                    F.sum(F.col("parse_ok").cast("long")).alias("rows_parsed"),
                )
                .collect()
            }
            routed_counts = (
                routed.groupBy("split_id", "sink_id").agg(F.count(F.lit(1)).alias("n")).collect()
            )
            per_split_routes: dict[int, dict[str, int]] = {}
            for r in routed_counts:
                per_split_routes.setdefault(r["split_id"], {})[r["sink_id"]] = r["n"]

            lineage_rows = [
                (
                    s,
                    in_counts.get(s, (0, 0))[0],
                    in_counts.get(s, (0, 0))[1],
                    per_split_routes.get(s, {}),
                )
                for s in batch
            ]
            spark.createDataFrame(
                lineage_rows,
                "split_id int, rows_in long, rows_parsed long, rows_routed map<string,long>",
            ).coalesce(1).write.mode("append").parquet(lineage_dir)

            # manifest commit — strictly after all sink writes (A5)
            for s in batch:
                commit_split(
                    manifest_dir,
                    s,
                    {
                        "rows_in": in_counts.get(s, (0, 0))[0],
                        "rows_parsed": in_counts.get(s, (0, 0))[1],
                        "rows_routed": per_split_routes.get(s, {}),
                        "sink_ids": sorted({r["sink_id"] for r in routed_counts}),
                    },
                )

            result.splits_processed.extend(batch)
            for s in batch:
                result.rows_in += in_counts.get(s, (0, 0))[0]
                result.rows_parsed += in_counts.get(s, (0, 0))[1]
            for m in per_split_routes.values():
                for k, v in m.items():
                    result.sink_counts[k] = result.sink_counts.get(k, 0) + v
        finally:
            routed.unpersist()

    return result


def read_sink(spark: SparkSession, out_dir: str, sink_id: str) -> DataFrame:
    """Read one logical sink's delivered rows."""
    return (
        spark.read.parquet(os.path.join(out_dir, "data"))
        .filter(F.col("sink_id") == sink_id)
    )

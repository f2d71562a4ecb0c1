"""spark-submit entrypoint (the cluster deployment surface).

    spark-submit --master yarn --deploy-mode cluster \
        --py-files hetman_spark.zip \
        jobs/run_pipeline_job.py --input s3://.../webtext --out s3://.../out

Unlike `python -m hetman_spark`, this does NOT build its own
SparkSession config — it inherits whatever spark-submit provides
(executors, memory, shuffle partitions) and only sets the session
options the pipeline semantics require.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument("--splits-per-commit", type=int, default=256)
    ap.add_argument("--presalt", action="store_true")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("hetman-spark-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .getOrCreate()
    )

    from hetman_spark.plans.pipeline import run_pipeline
    from hetman_spark.sources.lookup import DEFAULT_SINKS

    sinks, modifier = DEFAULT_SINKS, None
    if args.config:
        from hetman_spark.config_yaml import load_config

        _gc, specs = load_config(args.config)
        sinks, modifier = specs[0].sinks, specs[0].modifier

    t0 = time.time()
    res = run_pipeline(
        spark, args.input, args.out,
        sinks=sinks, modifier=modifier,
        salt_buckets=args.salt_buckets,
        splits_per_commit=args.splits_per_commit,
        presalt=args.presalt,
    )
    sec = time.time() - t0
    print(json.dumps({
        "splits_processed": len(res.splits_processed),
        "rows_in": res.rows_in,
        "rows_parsed": res.rows_parsed,
        "sink_counts": res.sink_counts,
        "sec": round(sec, 2),
        "pages_per_sec": round(res.rows_in / sec, 1) if sec > 0 else None,
    }))


if __name__ == "__main__":
    main()

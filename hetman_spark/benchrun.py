"""Subprocess helper for bench.py: run the webtext pipeline at a given
parallelism in a FRESH JVM, with a warmup pass so JIT/codegen/Python
worker startup does not pollute the throughput measurement (the
north_rule scaling-efficiency comparison needs steady-state numbers).

Prints one JSON line: {"master":..., "sec":..., "pages_per_sec":...}.
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--warmup-input", required=True)
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument("--presalt", action="store_true",
                    help="literal pre-enrich salted repartition path")
    ap.add_argument("--noop", action="store_true",
                    help="compute-path only: run the full plan into a noop sink "
                         "(isolates executor-scaling work from the single local "
                         "disk, which on a real cluster scales with nodes)")
    ap.add_argument("--light-warmup", action="store_true",
                    help="warm up on the small table only, skipping the full-input "
                         "noop pre-pass — for interleaved min-of-rounds protocols "
                         "where later rounds serve as the deep warmup and the "
                         "input is already page-cache-hot from generation")
    args = ap.parse_args()

    from hetman_spark.session import get_spark

    spark = get_spark(app_name="bench", master=args.master)

    scratch = tempfile.mkdtemp(prefix="benchrun-")
    try:
        if args.noop:
            from pyspark.sql import functions as F

            from hetman_spark.plans.pipeline import build_parsed, build_routed, tags_disjoint
            from hetman_spark.sources.lookup import DEFAULT_SINKS, lang_lookup, routes_df

            src = spark.read.parquet(args.input)
            lookup = lang_lookup(spark)
            routes = routes_df(spark)

            def flow(frame):
                reb = build_parsed(frame).drop("html").hint("rebalance", "split_id")
                return build_routed(reb.join(F.broadcast(lookup), "lang", "left"), routes,
                                    disjoint_tags=tags_disjoint(DEFAULT_SINKS),
                                    sinks=DEFAULT_SINKS)

            # two warmup passes: small table, then the REAL input once —
            # one small pass leaves JIT cold and timings 2x noisy
            warm = spark.read.parquet(args.warmup_input)
            flow(warm).write.format("noop").mode("overwrite").save()
            if not args.light_warmup:
                flow(src).write.format("noop").mode("overwrite").save()
            n_rows = src.count()
            t0 = time.time()
            flow(src).write.format("noop").mode("overwrite").save()
            sec = time.time() - t0
            print(json.dumps({
                "master": args.master, "mode": "noop",
                "sec": round(sec, 2), "rows": n_rows,
                "pages_per_sec": round(n_rows / sec, 1),
            }))
            return

        from hetman_spark.plans.pipeline import run_pipeline

        # warmup: same code path on the small table, then a full noop
        # pass over the real input so JIT/codegen/Arrow paths are hot
        run_pipeline(spark, args.warmup_input, f"{scratch}/warmup",
                     salt_buckets=args.salt_buckets, splits_per_commit=1024,
                     presalt=args.presalt)
        if not args.light_warmup:
            from pyspark.sql import functions as F

            from hetman_spark.plans.pipeline import build_parsed, build_routed, tags_disjoint
            from hetman_spark.sources.lookup import DEFAULT_SINKS, lang_lookup, routes_df

            _lk, _rt = lang_lookup(spark), routes_df(spark)
            build_routed(
                build_parsed(spark.read.parquet(args.input)).drop("html")
                .hint("rebalance", "split_id").join(F.broadcast(_lk), "lang", "left"),
                _rt, disjoint_tags=tags_disjoint(DEFAULT_SINKS), sinks=DEFAULT_SINKS,
            ).write.format("noop").mode("overwrite").save()

        t0 = time.time()
        res = run_pipeline(spark, args.input, f"{scratch}/out",
                           salt_buckets=args.salt_buckets, splits_per_commit=1024,
                           presalt=args.presalt)
        sec = time.time() - t0
        print(json.dumps({
            "master": args.master,
            "sec": round(sec, 2),
            "rows": res.rows_in,
            "pages_per_sec": round(res.rows_in / sec, 1),
            "sink_counts": dict(sorted(res.sink_counts.items())),
            "phase_secs": {k: round(v, 2) for k, v in res.phase_secs.items()},
        }))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()

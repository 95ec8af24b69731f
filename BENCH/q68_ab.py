"""Idle-box A/B adjudication for the q68 overlay wall-time drift
(VERDICT r4 "What's wrong #2" / next #3).

Protocol: two checkouts of this repo — A = a baseline commit (default
c0dfb85, end of round 3) in a throwaway git worktree, B = the current
tree — each run `runs` times in INTERLEAVED A/B order (controls thermal /
page-cache drift), every run a FRESH subprocess (cold JVM, cold
whole-stage-codegen: the protocol bench.py uses). Per run: warm up
q50/q52 (Python-worker imports), then time q68 materialized to the noop
sink. Reports per-side medians and the ratio.

Usage (idle box only):
  python BENCH/q68_ab.py [--baseline c0dfb85] [--runs 3] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

_RUNNER = r"""
import json, os, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
os.chdir(repo)
import __spark_entry__ as contract
from lagespark.session import get_spark
qs = contract.queries()
spark = get_spark(f"local[{sys.argv[2]}]", app_name="q68-ab")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
qs["q50-geo-cell"](spark, sf).count()
qs["q52-geo-zone"](spark, sf).count()
t0 = time.perf_counter()
qs["q68-geo-overlay-join"](spark, sf).write.format("noop").mode("overwrite").save()
print(json.dumps({"q68_sec": round(time.perf_counter() - t0, 3)}))
"""


def one_run(repo: str, cpus: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, repo, str(cpus)],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        # surface the subprocess traceback — a bare CalledProcessError would
        # discard the only diagnostic this long idle-box run produces
        sys.stderr.write(out.stderr)
        raise RuntimeError(f"run in {repo} failed (rc={out.returncode})")
    return json.loads(out.stdout.strip().splitlines()[-1])["q68_sec"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default="c0dfb85")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    repo_b = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wt = tempfile.mkdtemp(prefix="lagespark_ab_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, args.baseline],
        cwd=repo_b, check=True, capture_output=True,
    )
    try:
        a_times, b_times = [], []
        for i in range(args.runs):
            a_times.append(one_run(wt, args.cpus))
            b_times.append(one_run(repo_b, args.cpus))
            print(json.dumps({"round": i, "A_baseline": a_times[-1],
                              "B_current": b_times[-1]}))
        res = {
            "baseline_commit": args.baseline,
            "cpus": args.cpus,
            "A_baseline_runs": a_times,
            "B_current_runs": b_times,
            "A_median": round(statistics.median(a_times), 3),
            "B_median": round(statistics.median(b_times), 3),
            "B_over_A": round(
                statistics.median(b_times) / statistics.median(a_times), 3
            ),
        }
        print(json.dumps(res))
        out = os.path.join(repo_b, "BENCH", "q68_ab_results.json")
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=repo_b, check=False, capture_output=True)


if __name__ == "__main__":
    main()

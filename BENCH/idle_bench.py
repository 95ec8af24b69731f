"""Idle-gated bench capture: poll the hw calibration and fire bench.py only
inside a genuinely idle window; a post-run calibration below the gate
invalidates the record (mid-run spike).

The box this repo is benchmarked on carries roaming external-tenant load
(BENCH/BASELINE.md round-6 notes: calibration 122k-477k minute-to-minute,
loadavg jumps with nothing of ours running). Absolute timings are only
meaningful when the 1.5 s calibration reads at-or-above IDLE_GATE both
immediately BEFORE and immediately AFTER the timed run — bench.py's own
in-record calibration covers the start, this wrapper adds the arm/verify
protocol around it.

Usage:
    python BENCH/idle_bench.py [--gate 430000] [--poll 120] \
        [--deadline-min 90] [--consecutive 2] [--out BENCH/idle_bench_result.json]

Exits 0 with a JSON record when a clean run lands, 3 when the deadline
expires without one (all attempts preserved in the output file either way).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cal() -> float:
    from BENCH.scaling import calibrate

    return calibrate(4)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=430_000.0)
    ap.add_argument("--poll", type=float, default=120.0)
    ap.add_argument("--deadline-min", type=float, default=90.0)
    ap.add_argument("--consecutive", type=int, default=2)
    ap.add_argument("--out", default="BENCH/idle_bench_result.json")
    args = ap.parse_args()

    deadline = time.time() + args.deadline_min * 60
    streak = 0
    record: dict = {"gate": args.gate, "polls": [], "attempts": []}

    while time.time() < deadline:
        c = _cal()
        record["polls"].append(round(c))
        with open(args.out, "w") as f:  # flush per poll: observability
            json.dump(record, f, indent=1)
        print(f"{time.strftime('%H:%M:%S')} cal={c:,.0f}", flush=True)
        if c >= args.gate:
            streak += 1
        else:
            streak = 0
        if streak >= args.consecutive:
            streak = 0
            t0 = time.time()
            # fresh subprocess: the driver's cold-JVM protocol
            p = subprocess.run(
                [sys.executable, "bench.py"],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            post = _cal()
            line = (p.stdout.strip().splitlines() or [""])[-1]
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                parsed = {"error": line[-500:], "rc": p.returncode}
            attempt = {
                "wall_s": round(time.time() - t0, 1),
                "cal_post": round(post),
                "bench": parsed,
            }
            record["attempts"].append(attempt)
            clean = (
                p.returncode == 0
                and isinstance(parsed, dict)
                and parsed.get("hw_rows_per_core_sec", 0) >= args.gate
                and post >= args.gate
            )
            attempt["clean"] = clean
            with open(args.out, "w") as f:
                json.dump(record, f, indent=1)
            if clean:
                print(json.dumps(attempt))
                return 0
        time.sleep(args.poll)

    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print("no clean idle window before deadline", file=sys.stderr)
    return 3


if __name__ == "__main__":
    raise SystemExit(main())

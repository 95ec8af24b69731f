"""Calibration-gated full-registry sweep at sf0.1 — the sweep counterpart of
BENCH/idle_bench.py (design decision 28: absolute numbers are citable only
with flanking calibrations at/above the gate).

One PASS = every queries() entry materialized to the noop sink with
per-query wall times, in one warm session (pass 0 of a multi-pass protocol
is cold; this tool times WARM passes — each attempt runs one untimed
warm-up pass first, so codegen compile never lands in the gated record).
An attempt is CLEAN when the calibrations immediately before and after the
timed pass both read at-or-above the gate. All attempts are preserved.

Usage:
    python BENCH/gated_sweep.py [--gate 430000] [--deadline-min 60] \
        [--out BENCH/gated_sweep_result.json] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pass(spark, queries, sf_dir: str) -> tuple[dict, dict]:
    times, errors = {}, {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001 — record and continue
            errors[name] = str(ex)[:300]
        gc.collect()
    return times, errors


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=430_000.0)
    ap.add_argument("--poll", type=float, default=60.0)
    ap.add_argument("--deadline-min", type=float, default=60.0)
    ap.add_argument("--out", default="BENCH/gated_sweep_result.json")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from BENCH.scaling import calibrate

    import __spark_entry__ as contract
    from lagespark.session import get_spark

    queries = contract.queries()
    spark = get_spark("local[32]", app_name="lagespark-gated-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    # one untimed warm-up pass: codegen + Python-worker imports off the
    # timed path (also validates zero errors before any waiting starts)
    _, warm_errors = run_pass(spark, queries, args.sf_dir)

    record: dict = {
        "protocol": (
            "warm full-registry pass, per-query noop materialization, gc "
            "between queries; CLEAN iff calibrate(4) >= gate immediately "
            "before AND after the timed pass"
        ),
        "gate": args.gate,
        "warmup_errors": warm_errors,
        "attempts": [],
        "polls": [],
    }
    deadline = time.time() + args.deadline_min * 60
    while time.time() < deadline:
        pre = calibrate(4)
        record["polls"].append(round(pre))
        if pre >= args.gate:
            t0 = time.time()
            times, errors = run_pass(spark, queries, args.sf_dir)
            post = calibrate(4)
            attempt = {
                "cal_pre": round(pre),
                "cal_post": round(post),
                "wall_s": round(time.time() - t0, 1),
                "total_sec": round(sum(times.values()), 2),
                "n_errors": len(errors),
                "errors": errors,
                "times": times,
                "clean": post >= args.gate and not errors,
            }
            record["attempts"].append(attempt)
            with open(args.out, "w") as f:
                json.dump(record, f, indent=1)
            if attempt["clean"]:
                print(
                    json.dumps(
                        {k: attempt[k] for k in ("cal_pre", "cal_post", "total_sec")}
                    )
                )
                return 0
        else:
            with open(args.out, "w") as f:
                json.dump(record, f, indent=1)
            time.sleep(args.poll)
    print("no clean pass before deadline", file=sys.stderr)
    return 3


if __name__ == "__main__":
    raise SystemExit(main())

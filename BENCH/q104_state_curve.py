"""q104 per-batch latency vs stream lifetime — the VERDICT r6 wrong-#1
evidence: dedup_stream_minhash's applyInPandasWithState path round-trips
each touched super-bucket's WHOLE (band,key)->owner map per micro-batch,
so unbounded state makes per-batch time grow with lifetime distinct keys.
`retention_s` (round 7) evicts keys idle past the horizon, holding the
map — and the per-batch cost — at the retention window's size.

Protocol: B micro-batches of N fresh (all-unique) docs, batch i stamped at
t0 + i*60 s, processed one file per trigger; per-batch wall time recorded
for (a) retention=None (unbounded) and (b) retention_s=120 (2-batch
window). Emits one JSON line: {"unbounded": [sec,...], "bounded": [...],
"n_per_batch": N, "keys_per_batch": ~4N}. Run on an idle box (same caveat
as scaling.py).

Usage: python BENCH/q104_state_curve.py [--batches 12] [--n 5000]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402


def _mk_batch(spark, i: int, n: int):
    t0 = pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(seconds=60 * i)
    base = i * n
    # diverse-letter unique texts (see BENCH/scaling._vocab_words note:
    # w123-style words share trigrams and would band everything together)
    rows = []
    for j in range(n):
        h = hashlib.md5(f"doc-{base + j}".encode()).hexdigest()
        words = [h[k : k + 4] for k in range(0, 28, 4)]
        rows.append((base + j, " ".join(words), t0 + pd.Timedelta(milliseconds=j)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    )


def run_curve(spark, tmp: str, batches: int, n: int, retention_s):
    from lagespark.streaming import ops

    tag = uuid.uuid4().hex[:8]
    src = f"{tmp}/curve_src_{tag}"
    _mk_batch(spark, 0, n).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(
        "doc_id bigint, text string, ts timestamp"
    ).parquet(src)
    q = (
        ops.dedup_stream_minhash(stream, retention_s=retention_s)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/curve_ck_{tag}")
        .start()
    )
    times = []
    try:
        t0 = time.perf_counter()
        q.processAllAvailable()
        times.append(round(time.perf_counter() - t0, 3))
        for i in range(1, batches):
            _mk_batch(spark, i, n).write.parquet(src, mode="append")
            t0 = time.perf_counter()
            q.processAllAvailable()
            times.append(round(time.perf_counter() - t0, 3))
    finally:
        q.stop()
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from lagespark.session import get_spark

    spark = get_spark(f"local[{args.cpus}]", app_name="q104-state-curve")
    spark.sparkContext.setLogLevel("ERROR")
    from BENCH.scaling import calibrate

    cal = round(calibrate(cores=4, seconds=1.5))
    tmp = f"/tmp/q104_curve_{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    try:
        unbounded = run_curve(spark, tmp, args.batches, args.n, None)
        bounded = run_curve(spark, tmp, args.batches, args.n, 120.0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "q104_per_batch_sec",
                "unbounded": unbounded,
                "bounded_retention_120s": bounded,
                "n_per_batch": args.n,
                "batches": args.batches,
                "hw_rows_per_core_sec": cal,
            }
        )
    )


if __name__ == "__main__":
    main()

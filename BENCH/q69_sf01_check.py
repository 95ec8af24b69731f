"""q69 sf0.1 verification against a THIRD engine (blocked-numpy brute force).

The sf0.1 oracle gate (BENCH/r7_gate_sf01.log) passes 84/85; the one
failure is q69's ORACLE, not the engine: the DuckDB oracle is the honest
quadratic form (every query × every point through a ROW_NUMBER window),
which at sf0.1 is ~4.5k × 456k ≈ 2.1e9 candidate rows — DuckDB 1.0
materializes the window input and dies on memory (no 3-arg min_by to
stream a top-k aggregate). Spark's side finishes fine (ring-expansion
kNN); it is the brute-force oracle that doesn't scale past sf0.01.

This script closes the gap with an INDEPENDENT exact check: numpy
computes the full 2.1e9-distance brute force in row blocks (memory
bounded by the block size), applies the same ROUND(dist, 6) +
(dist, nn_id) tie-break as the SQL oracle, and compares the exact row
set against the Spark result. Same spirit as the suite's small-scale
brute-force-equality tests (tests/test_spatial.py), at driver-gate 10×
volume. Emits one JSON line; non-zero exit on any mismatch.

Usage: python BENCH/q69_sf01_check.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 3


def brute_force(qx, qy, qid, px, py, pid, block=256) -> set:
    """Exact top-K rows {(qid, nn_id, dist, rank)} — same semantics as the
    q69 oracle SQL: dist = ROUND(sqrt((qx-tx)^2+(qy-ty)^2), 6), self
    excluded by pid, rank by (dist, nn_id)."""
    rows = set()
    for s in range(0, len(qid), block):
        e = min(s + block, len(qid))
        dx = qx[s:e, None] - px[None, :]
        dy = qy[s:e, None] - py[None, :]
        d = np.round(np.sqrt(dx * dx + dy * dy), 6)
        for i in range(e - s):
            qi = qid[s + i]
            di = d[i]
            mask = pid != qi
            cand_d, cand_id = di[mask], pid[mask]
            # exact top-K by (dist, nn_id) without a full 456k lexsort:
            # partition to the Kth-smallest dist, pull EVERY candidate at
            # or under it (so boundary ties are all present), then order
            # the tiny pool exactly as the SQL window does
            kth = np.partition(cand_d, K - 1)[K - 1]
            pool = cand_d <= kth
            pd_, pi_ = cand_d[pool], cand_id[pool]
            order = np.lexsort((pi_, pd_))[:K]
            for r, j in enumerate(order, start=1):
                rows.add((int(qi), int(pi_[j]), float(pd_[j]), r))
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from lagespark import harness
    from lagespark.session import get_spark

    import __spark_entry__ as contract

    queries = contract.queries()
    spark = get_spark("local[32]", app_name="q69-sf01-check")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    sdf = queries["q69-geo-knn-points"](spark, sf_dir).toPandas()
    spark_sec = round(time.perf_counter() - t0, 1)
    got = {
        (int(r.qid), int(r.nn_id), float(r.dist), int(r.rank))
        for r in sdf.itertuples(index=False)
    }

    pts = harness.points_df(spark, sf_dir).toPandas()
    px = pts["x"].to_numpy(np.float64)
    py = pts["y"].to_numpy(np.float64)
    pid = pts["pid"].to_numpy(np.int64)
    qm = pid % 101 == 0
    t0 = time.perf_counter()
    want = brute_force(px[qm], py[qm], pid[qm], px, py, pid)
    numpy_sec = round(time.perf_counter() - t0, 1)

    ok = got == want
    print(
        json.dumps(
            {
                "metric": "q69_sf01_numpy_bruteforce_check",
                "sf_dir": sf_dir,
                "n_points": int(len(pid)),
                "n_queries": int(qm.sum()),
                "spark_rows": len(got),
                "bruteforce_rows": len(want),
                "match": ok,
                "spark_sec": spark_sec,
                "numpy_sec": numpy_sec,
            }
        )
    )
    if not ok:
        extra = list(got - want)[:5]
        missing = list(want - got)[:5]
        print(f"extra={extra}\nmissing={missing}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Benchmark runner (driver contract: one JSON line to stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Headline set = the engine's reason to exist: the flagship Lagefaktor spatial
pipeline, PIP join, range join, kNN, cell aggregation, plus representative
relational joins/aggs. Results are materialized with the noop sink (no
driver-side collect cost). Extras record throughput of the flagship spatial
join in rows/sec — the BASELINE.json:2 metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q55-geo-score",      # flagship: cell index + cover join + PIP + zone + score
    "q51-geo-pip",        # point-in-polygon join
    "q52-geo-zone",       # distance-band assignment
    "q53-geo-range-join", # neighbor-cell range join
    "q54-geo-knn",        # nearest compensation site
    "q50-geo-cell",       # cell-id aggregation (native path)
    "q20-agg-basic",      # TPC-H Q1 shape
    "q10-join-inner",     # shuffle join + agg
    "q14-join-bcast",     # broadcast join
    "q30-rank",           # window
    "q66-geo-salted-join",  # explicit skew salting path
    "q75-ann-topk",       # embedding similarity search
    "q90-stream-tumble",  # windowed agg (batch mode)
    "q69-geo-knn-points",  # data-scale kNN join (adaptive cell, annulus rings)
    "q68-geo-overlay-join",  # distributed polygon overlay (both sides data-scale)
    "q60-img-roundtrip",  # image payload decode + invariant
    "q64b-multimodal-frames",  # LAV1 container frame sampling (index-seek decode)
    "q72b-dedup-minhash-fast",  # PRODUCTION MinHash+LSH (xxhash64 int64 sigs)
    "q82-geo-intersects-ri",  # RI-pruned intersects join (added r6: native
                              # rect-pair path — all-rect inputs short-circuit
                              # to pure codegen; round-over-round subsets
                              # exclude it when comparing to r1-r5 totals)
    "q72-dedup-minhash-lsh",  # oracle-portable MinHash+LSH (heaviest last:
                              # its md5/GC load otherwise inflates followers)
]


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as contract
    from lagespark import harness
    from lagespark.session import get_spark

    queries = contract.queries()  # registers all harness waves
    spark = get_spark(f"local[{cpus}]", app_name="lagespark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM AND the Python UDF workers once (excluded from timings:
    # ~1 s/worker pandas+pyarrow import cost would otherwise land on the
    # first pandas-UDF query)
    queries["q50-geo-cell"](spark, sf_dir).count()
    queries["q52-geo-zone"](spark, sf_dir).count()
    # NOTE: heavy plans (q68/q69/q72b) pay 2-10 s of first-execution codegen
    # compile inside their timed run; the cold-per-query protocol stays for
    # round-over-round comparability, and the heaviest three ALSO get a
    # second timed run in-session ("warm" field) so plan cost and Janino
    # compile cost stop aliasing (VERDICT r5 #7).

    n_points = harness.points_df(spark, sf_dir).count()

    # hardware calibration BEFORE the timed queries: per-core numpy kernel
    # throughput at 4-way occupancy (BENCH/scaling.py's calibrate). This
    # makes box contention attributable from the bench record alone — an
    # anomalous total with a normal hw_rows_per_core_sec is an engine
    # regression; a depressed calibration value means a contended/slow box
    # (the round-4 69.9 s driver record needed three idle re-runs to
    # adjudicate; this field settles it in-record). Idle reference on this
    # box at 4-way occupancy: ~5e5 rows/core/sec (BENCH/BASELINE.md).
    from BENCH.scaling import calibrate

    hw_rate = round(calibrate(cores=4, seconds=1.5))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        # isolate queries from each other's GC debt (image payloads / md5
        # churn otherwise inflate whatever runs next)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # warm column: re-run the heaviest plans once more in the same session —
    # codegen/Janino classes are now cached, so warm-cold ≈ compile cost and
    # the warm number is the plan cost to compare across rounds
    warm: dict[str, float] = {}
    for name in (
        "q68-geo-overlay-join",
        "q69-geo-knn-points",
        "q72b-dedup-minhash-fast",
        "q82-geo-intersects-ri",
    ):
        fn = queries[name]
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        warm[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    # round-1 reference record: the original 15-query headline set summed
    # 32.3 s on this box (BENCH/BASELINE.md "Headline per-query timings") —
    # emit the same-subset sum and ratio in-record so the baseline
    # comparison needs no by-hand arithmetic (VERDICT r6 #7)
    r1_subset = [
        "q55-geo-score", "q51-geo-pip", "q52-geo-zone", "q53-geo-range-join",
        "q54-geo-knn", "q50-geo-cell", "q20-agg-basic", "q10-join-inner",
        "q14-join-bcast", "q30-rank", "q66-geo-salted-join",
        "q72-dedup-minhash-lsh", "q75-ann-topk", "q60-img-roundtrip",
        "q90-stream-tumble",
    ]
    r1_sum = round(sum(timings[n] for n in r1_subset if n in timings), 3)
    flagship_sec = timings["q55-geo-score"]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "spatial_rows": n_points,
        "flagship_rows_per_sec": round(n_points / flagship_sec) if flagship_sec else None,
        "hw_rows_per_core_sec": hw_rate,
        "warm": warm,
        "r1_subset_sec": r1_sum,
        "r1_subset_vs_baseline_32_3": round(r1_sum / 32.3, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Two-cluster-size scaling evidence (north_rule, BASELINE.json:2,14).

No real cluster exists in this sandbox (BASELINE.md protocol): the identical
job runs at two local parallelism levels on identical input and we report
throughput at both plus efficiency = (T_N / T_4N) / 4.

Jobs — each is the flagship path FUSED into a single mapInPandas pass
(one Python crossing per batch: generation → S2 cell encode → zone kernel →
PIP, then a native groupBy agg), which is both the production shape
(SURVEY.md §4 'pipelining') and the honest scaling measurement (per-row
compute dominates, not Arrow crossings):

  spatial — N point records/sec through cell-index + zone + PIP + agg
            (the BASELINE.json:2 'spatial-join + Lagefaktor tiling
            throughput' metric)
  image   — N image records/sec through payload generation(encode) →
            decode → PSNR/pHash invariant check → zone join → byte agg

Default pair: N=2 cores vs 4N=8 cores. On this single shared-memory box the
numpy/zlib kernels saturate DRAM bandwidth around 16 threads, so 8→32 shows
the ceiling, not scheduler inefficiency — results at 16/32 are reported for
transparency (run with --sizes 2,8,16,32). On a real multi-executor cluster
each executor brings its own memory bandwidth, which is the regime the
N→4N ≥ 0.8 criterion targets.

Usage: python BENCH/scaling.py [--n-spatial 16000000] [--n-image 40000]
       [--sizes 2,8] [--runs 3]
Writes BENCH/scaling_results.json and prints one JSON line per level.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _feature_closures():
    from lagespark import fixtures
    from lagespark.operators import spatial

    gf = spatial.FeatureSet(fixtures.gruenflaeche_pdf())
    bf = spatial.FeatureSet(fixtures.baufeld_pdf())
    gf_items = [(fid, gf.rings[fid], gf.bbox[fid]) for fid in gf.ids]
    return bf.polys(), gf_items


def run_spatial(spark, n: int, parts: int) -> None:
    """Fused flagship: generate → S2 encode → zone → PIP → native agg."""
    from lagespark import fixtures
    from lagespark.kernels import cells as ck
    from lagespark.kernels import geom

    bf_polys, gf_items = _feature_closures()

    def kernel(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            x, y = fixtures.points_for_indices(idx)
            lon = x / fixtures.M_PER_DEG + fixtures.LON0
            lat = y / fixtures.M_PER_DEG + fixtures.LAT0
            cell = ck.s2_encode(lat, lon, 15)
            zone = geom.zone_of_points(x, y, bf_polys)
            fid_hit = np.full(len(x), "", dtype=object)
            for fid, rings, (x0, y0, x1, y1) in gf_items:
                m = (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)
                if m.any():
                    mm = np.flatnonzero(m)
                    inside = geom.point_in_polygon(x[mm], y[mm], rings)
                    fid_hit[mm[inside]] = fid
            yield pd.DataFrame(
                {"pid": idx, "cell_s2": cell, "zone": zone, "fid": fid_hit}
            )

    out = spark.range(0, n, 1, parts).mapInPandas(
        kernel, "pid long, cell_s2 long, zone int, fid string"
    )
    out.groupBy("cell_s2", "zone", "fid").agg(F.count(F.lit(1)).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()


def run_image(spark, n: int, parts: int) -> None:
    """Fused image path: generate(encode) → decode → invariant check → zone
    → byte agg. Asserts the BASELINE payload invariant inline."""
    from lagespark import fixtures
    from lagespark.image import codecs
    from lagespark.kernels import geom

    bf_polys, _ = _feature_closures()

    def kernel(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rows = fixtures.images_pdf_for_indices(idx)
            zone = geom.zone_of_points(
                rows["x"].to_numpy(), rows["y"].to_numpy(), bf_polys
            )
            psnr = np.empty(len(rows))
            exact = np.zeros(len(rows), bool)
            ham = np.zeros(len(rows), np.int32)
            for k, r in enumerate(rows.itertuples()):
                i = int(r.image_id.replace("img", ""))
                ref = codecs.procedural_image(i, r.w, r.h)
                px = codecs.decode_image(r.bytes, r.fmt, r.w, r.h)
                psnr[k] = min(codecs.psnr(ref, px), 99.0)
                exact[k] = bool((px == ref).all())
                ham[k] = bin((codecs.phash64(px) ^ r.phash) & (2**64 - 1)).count("1")
            yield pd.DataFrame(
                {
                    "fmt": rows["fmt"],
                    "zone": zone,
                    "nb": rows["bytes"].str.len(),
                    "ok": (exact | (psnr >= 40.0)) & (ham <= 8),
                }
            )

    out = spark.range(0, n, 1, parts).mapInPandas(
        kernel, "fmt string, zone int, nb long, ok boolean"
    )
    res = out.groupBy("zone", "fmt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nb").alias("payload_bytes"),
        F.sum((~F.col("ok")).cast("long")).alias("n_bad"),
    ).collect()
    n_bad = sum(r.n_bad for r in res)
    assert n_bad == 0, f"{n_bad} rows violate the payload invariant"


def _cal_worker(args):
    """Pure-numpy slice of the spatial kernel (no Spark, no IPC): measures
    raw per-core compute throughput while P sibling processes keep P cores
    busy — i.e. the HARDWARE's per-core speed at that occupancy (turbo/DVFS
    + shared-cache effects), independent of any engine overhead."""
    n, seconds = args
    import time as _t

    from lagespark import fixtures
    from lagespark.kernels import cells as ck
    from lagespark.kernels import geom

    bf_polys, gf_items = _feature_closures()
    idx = np.arange(n, dtype=np.int64)
    done = 0
    t0 = _t.perf_counter()
    while _t.perf_counter() - t0 < seconds:
        x, y = fixtures.points_for_indices(idx)
        lon = x / fixtures.M_PER_DEG + fixtures.LON0
        lat = y / fixtures.M_PER_DEG + fixtures.LAT0
        ck.s2_encode(lat, lon, 15)
        geom.zone_of_points(x, y, bf_polys)
        for fid, rings, (x0, y0, x1, y1) in gf_items:
            m = (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)
            if m.any():
                mm = np.flatnonzero(m)
                geom.point_in_polygon(x[mm], y[mm], rings)
        done += n
        idx += n
    return done / (_t.perf_counter() - t0)


def calibrate(cores: int, n: int = 200_000, seconds: float = 8.0) -> float:
    """Aggregate per-core numpy throughput with `cores` busy processes.
    The ratio cal(4N)/cal(N) isolates how much per-core hardware speed
    drops as occupancy rises (turbo clocks, shared DRAM/L3) — the part of
    measured scaling loss that is the BOX, not the engine."""
    import multiprocessing as mp

    # raw fork Processes (not Pool): fork children inherit the target
    # directly — nothing is pickled — and the workers are pure numpy, so no
    # JVM/py4j state is touched in the children
    ctx = mp.get_context("fork")
    rates = ctx.Array("d", cores)

    def _run(slot: int) -> None:
        rates[slot] = _cal_worker((n, seconds))

    procs = [ctx.Process(target=_run, args=(i,)) for i in range(cores)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return sum(rates) / cores  # per-core rows/sec at this occupancy


def timed(fn, runs: int) -> list[float]:
    return [
        (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(runs)
    ]


def bench_at(cores: int, n_spatial: int, n_image: int, runs: int) -> dict:
    from lagespark.session import get_spark

    spark = get_spark(f"local[{cores}]", app_name=f"lagespark-scale-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    parts = max(cores * 4, 8)
    # warm-up at FULL size (excluded): JVM JIT + Python worker imports +
    # allocator growth all land here instead of the first timed run
    run_spatial(spark, n_spatial, parts)
    run_image(spark, n_image, parts)

    t_sp = timed(lambda: run_spatial(spark, n_spatial, parts), runs)
    t_im = timed(lambda: run_image(spark, n_image, parts), runs)
    spark.stop()
    return {
        "cores": cores,
        "spatial_sec_runs": [round(t, 2) for t in t_sp],
        "spatial_sec": round(statistics.median(t_sp), 3),
        "spatial_rows_per_sec": round(n_spatial / statistics.median(t_sp)),
        "image_sec_runs": [round(t, 2) for t in t_im],
        "image_sec": round(statistics.median(t_im), 3),
        "image_rows_per_sec": round(n_image / statistics.median(t_im)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-spatial", type=int, default=16_000_000)
    ap.add_argument("--n-image", type=int, default=40_000)
    ap.add_argument("--sizes", default="2,8")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-calibrate", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    results = {"n_spatial": args.n_spatial, "n_image": args.n_image, "levels": []}
    for c in sizes:
        r = bench_at(c, args.n_spatial, args.n_image, args.runs)
        if not args.no_calibrate:
            # hardware per-core speed at the same occupancy (pure numpy,
            # no Spark) — run right after the level so thermal state matches
            r["cal_rows_per_core_sec"] = round(calibrate(c))
        results["levels"].append(r)
        print(json.dumps(r))
    lv = {r["cores"]: r for r in results["levels"]}
    pairs = [(a, b) for a in lv for b in lv if b == 4 * a]
    for a, b in pairs:
        ratio = b / a
        for job in ("spatial", "image"):
            raw = (lv[b][f"{job}_rows_per_sec"] / lv[a][f"{job}_rows_per_sec"]) / ratio
            results[f"{job}_scaling_efficiency_{a}to{b}"] = round(raw, 3)
            if "cal_rows_per_core_sec" in lv[a]:
                # hardware factor: how much per-core speed the BOX itself
                # loses going from a to b busy cores (turbo/DVFS + shared
                # memory). Engine efficiency = raw / hw — what a cluster
                # (one clock domain per executor) would see.
                hw = lv[b]["cal_rows_per_core_sec"] / lv[a]["cal_rows_per_core_sec"]
                results[f"hw_percore_factor_{a}to{b}"] = round(hw, 3)
                results[f"{job}_engine_efficiency_{a}to{b}"] = round(raw / hw, 3)
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scaling_results.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

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

Two SHUFFLE-HEAVY jobs cover the operators whose 100 TB claim cannot rest
on plan shape alone (VERDICT r3 next #5) — unlike the fused jobs these
exercise the real exchange/checkpoint machinery:

  overlay — N polygon features per side through the full distributed
            overlay join (q68 shape: native bbox-cover explosion → cell
            equi-join → PBSM dedup → rect fast path + clip kernel)
  dedup   — N documents through production MinHash+LSH pair generation
            (q72b shape: HOF signatures → band explosion → bucket
            self-join → pair dedup)

Both generate their input per-index (vectorized splitmix64) so the input
is bit-identical at every parallelism level regardless of partition count.

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


def _u01(ids: np.ndarray, c: int) -> np.ndarray:
    """Vectorized deterministic uniform [0,1) per (id, channel) — delegates
    to the repo's counter-based splitmix64 primitive (fixtures._hash_uniform)
    so the bit-mixing code lives in exactly one place. Pure function of the
    row index → partitioning-independent."""
    from lagespark import fixtures

    return fixtures._hash_uniform(np.asarray(ids, dtype=np.int64), stream=c, seed=0)


def _overlay_side(spark, n: int, parts: int, salt: int):
    """n deterministic polygon features (~85% axis rects, 15% octagons) with
    centers uniform in an L×L window where L grows as sqrt(n) — constant
    feature density per 250 m cell, so pair volume scales ~linearly."""
    L = max(2000.0, np.sqrt(n) * 180.0)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            cx = _u01(ids, salt * 10 + 1) * L
            cy = _u01(ids, salt * 10 + 2) * L
            w = 60.0 + _u01(ids, salt * 10 + 3) * 360.0
            h = 60.0 + _u01(ids, salt * 10 + 4) * 360.0
            is_rect = _u01(ids, salt * 10 + 5) < 0.85
            rows = []
            oct_c = np.cos(np.arange(8) * np.pi / 4)
            oct_s = np.sin(np.arange(8) * np.pi / 4)
            for k in range(len(ids)):
                if is_rect[k]:
                    x0, y0 = cx[k] - w[k] / 2, cy[k] - h[k] / 2
                    x1, y1 = cx[k] + w[k] / 2, cy[k] + h[k] / 2
                    ring = [
                        {"x": x0, "y": y0},
                        {"x": x1, "y": y0},
                        {"x": x1, "y": y1},
                        {"x": x0, "y": y1},
                    ]
                else:
                    r = w[k] / 2
                    ring = [
                        {"x": cx[k] + r * oct_c[j], "y": cy[k] + r * oct_s[j]}
                        for j in range(8)
                    ]
                    x0, y0, x1, y1 = cx[k] - r, cy[k] - r, cx[k] + r, cy[k] + r
                rows.append(
                    (f"s{salt}f{int(ids[k])}", [ring], x0, y0, x1, y1)
                )
            yield pd.DataFrame(
                rows,
                columns=["feature_id", "rings", "xmin", "ymin", "xmax", "ymax"],
            )

    return spark.range(0, n, 1, parts).mapInPandas(
        gen,
        "feature_id string, rings array<array<struct<x:double,y:double>>>, "
        "xmin double, ymin double, xmax double, ymax double",
    )


def run_overlay(spark, n: int, parts: int) -> None:
    """q68-shaped distributed overlay join: n features per side, full
    exchange machinery (cover explosion, cell shuffle, PBSM dedup, rect
    fast path + flat-ring clip kernel), reduced to (pairs, Σ area)."""
    from lagespark.operators import spatial

    a = _overlay_side(spark, n, parts, 1)
    b = _overlay_side(spark, n, parts, 2)
    out = spatial.overlay_join(a, b, cell_size=250.0, round_to=2)
    res = out.agg(
        F.count(F.lit(1)).alias("pairs"), F.sum("area").alias("area")
    ).collect()
    assert res[0]["pairs"] > 0


_VOCAB = 4000
_DOC_WORDS = 40


_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def _vocab_words() -> list[str]:
    """Deterministic 6-char vocabulary over a 62-char alphabet. The MinHash
    shingles are CHARACTER 3-grams, so synthetic words must span a wide
    trigram universe — a `w123`-style vocab shares most trigrams across all
    docs and the LSH (correctly) reports nearly every pair as similar,
    which is quadratic; even a 26-letter alphabet leaves enough incidental
    trigram overlap that random-pair Jaccard ≈ 0.008 and the candidate set
    grows ~n². 62³ ≈ 238k trigrams pushes random-pair Jaccard down ~10×,
    so pair volume tracks the INJECTED duplicates (linear in n)."""
    ids = np.arange(_VOCAB, dtype=np.int64)
    arr = np.stack(
        [(_u01(ids, 900 + c) * len(_ALPHABET)).astype(np.int64) for c in range(6)],
        axis=1,
    )
    return ["".join(_ALPHABET[c] for c in row) for row in arr]


def _docs(spark, n: int, parts: int, dup_every: int = 10):
    """n deterministic documents (~40 words over a 4000-word vocab); every
    `dup_every`-th doc near-duplicates its predecessor (2 words changed) so
    the LSH banding has real positives to surface. dup_every=10 (46% of all
    LSH candidates are true dups on the harness corpus) stresses the refine;
    dup_every=1000 is the REALISTIC ~0.1% near-dup density a web-scale
    sweep sees, where candidate volume — hence runtime — must be LSH-bound,
    not refine-bound (VERDICT r5 #8)."""
    voc = _vocab_words()

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            base = np.where(ids % dup_every == dup_every - 1, ids - 1, ids)
            cols = [
                (_u01(base * np.int64(_DOC_WORDS) + j, 77) * _VOCAB).astype(np.int64)
                for j in range(_DOC_WORDS)
            ]
            # near-dup rows differ from their base in the last 2 words
            edit = ids % dup_every == dup_every - 1
            for j in (_DOC_WORDS - 2, _DOC_WORDS - 1):
                cols[j] = np.where(
                    edit,
                    (_u01(ids * np.int64(_DOC_WORDS) + j, 78) * _VOCAB).astype(np.int64),
                    cols[j],
                )
            words = np.stack(cols, axis=1)
            texts = [" ".join(voc[w] for w in row) for row in words]
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(0, n, 1, parts).mapInPandas(gen, "doc_id long, text string")


def run_dedup(spark, n: int, parts: int) -> None:
    """q72b-shaped production MinHash+LSH pair generation over n documents,
    reduced to a pair count (materializes the banded bucket self-join)."""
    from lagespark.operators import dedup

    pairs = dedup.minhash_pairs_fast(_docs(spark, n, parts), perms=8, band_rows=2, n=3)
    res = pairs.agg(F.count(F.lit(1)).alias("pairs")).collect()
    assert res[0]["pairs"] > 0


def _refine_src(spark, n: int, parts: int) -> str:
    """Materialized realistic-density corpus for run_refine, cached in /tmp
    (same discipline as _corpus_src). The timed job MUST read parquet, not
    generate docs inline: mapInPandas generation runs in Python WORKER
    PROCESSES outside Spark's task-thread budget, so an inline-generation
    job at 'local[2]' burns up to 4 CPUs (2 Python + 2 JVM pipelined) —
    inflating the small level's throughput and deflating measured scaling
    efficiency by ~20% (measured round 6; run_corpus dodged this from the
    start via _corpus_src)."""
    path = f"/tmp/lagespark_scale_refine_src_v1_{n}"
    dest = os.path.join(path, "documents.parquet")
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        _docs(spark, n, parts, dup_every=1000).write.mode("overwrite").parquet(dest)
    return dest


def run_refine(spark, n: int, parts: int) -> None:
    """q71b-shaped PRODUCTION dedup combo (LSH candidates → exact hashed
    n-gram Jaccard refine) at REALISTIC near-dup density (~0.1%: one
    injected near-dup per 1000 docs). The registry's q71b bench row runs on
    the 46%-dup-density harness corpus, which is pair-volume-bound in the
    refine; a web-scale sweep is the opposite — candidates are rare, the
    linear signature/shingle projections dominate, and THAT regime is what
    must scale (VERDICT r5 #8). Input is pre-materialized parquet
    (_refine_src) so the timed job is pure engine work; the scan comes
    back repartitioned to `parts` so both levels run the same plan shape
    at their own parallelism.

    Banding is THRESHOLD-MATCHED (perms=24, band_rows=6 → b=4, r=6,
    t* = (1/4)^(1/6) ≈ 0.79 for the 0.8 refine threshold), the same
    discipline as pipeline/corpus.py's --dedup-band-rows: the default
    b=4/r=2 bands (t* ≈ 0.5) emit 11.09 MILLION candidates on this corpus
    — 46,000× the 238 true near-dup pairs — and the refine grinds them for
    ~155 s of the 177 s total at 240k docs/8 cores. Candidate volume under
    mismatched bands grows ~n², which is precisely the non-scaling shape
    this row exists to rule out; matched bands cut the job to 48 s with
    234/240 injected pairs recovered (the measured numbers behind the
    minhash_jaccard_pairs candidate-semi-join comment)."""
    from lagespark.operators import dedup

    src = _refine_src(spark, n, parts)
    docs = spark.read.parquet(src).repartition(parts)
    band_rows = dedup.fit_band_rows(24, 0.8)  # = 6: b=4, t* ~= 0.79
    pairs = dedup.minhash_jaccard_pairs(
        docs, perms=24, band_rows=band_rows, n=3, threshold=0.8,
    )
    res = pairs.agg(F.count(F.lit(1)).alias("pairs")).collect()
    # injected dups differ in 2/40 words → shingle Jaccard >> 0.8; expect
    # roughly n/1000 true pairs (LSH recall < 1 allows some misses —
    # measured 234/240 at 240k docs with b=4/r=6)
    assert res[0]["pairs"] >= n // 2000, res[0]["pairs"]


def _ingest_src(spark, n: int, parts: int) -> str:
    """Materialized realistic-density corpus WITH an ingest timestamp for
    run_ingest (ts = epoch + doc_id seconds — arrival order is doc order);
    pre-materialized parquet for the same reason as _refine_src."""
    path = f"/tmp/lagespark_scale_ingest_src_v1_{n}"
    dest = os.path.join(path, "documents.parquet")
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        _docs(spark, n, parts, dup_every=1000).withColumn(
            "ts", F.timestamp_seconds(F.col("doc_id"))
        ).write.mode("overwrite").parquet(dest)
    return dest


def run_ingest(spark, n: int, parts: int) -> None:
    """q104-shaped STREAMING near-dup ingest: dedup_stream_minhash over an
    availableNow file stream of n docs — the real applyInPandasWithState
    path (state store + stateful shuffle included), fresh checkpoint per
    run so every timed run reprocesses the full input. Claims go to the
    noop sink; the claim volume at realistic density is ~n/1000 so the
    timed cost is the signature projection + banded stateful shuffle,
    exactly the ingest regime's bottleneck shape."""
    import uuid as _uuid

    from lagespark.streaming import ops as _sops

    src = _ingest_src(spark, n, parts)
    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    q = (
        _sops.dedup_stream_minhash(stream)
        .writeStream.format("noop")
        .outputMode("update")
        .option(
            "checkpointLocation",
            f"/tmp/lagespark_scale_ingest_ck_{_uuid.uuid4().hex}",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _av_src(spark, n: int, parts: int) -> tuple[str, str]:
    """Materialized AV + image tables for run_av, cached in /tmp (same
    pre-materialization discipline as _refine_src — inline mapInPandas
    generation would burn Python-worker CPU outside the local[N] thread
    budget and inflate the small level). Both tables are per-index
    deterministic (generate_av / generate_with_neardups), written as 64
    files each so BOTH parallelism levels read >= parts splits without a
    payload-shuffling repartition. ~46 KB/media LAV1 containers, ~4.4 KB
    images; generation is ~14 ms/media single-core, so pre-warm the cache
    at local[32] before a 2-core sweep (the level would otherwise spend
    ~15 min generating inside its excluded warm-up)."""
    from lagespark.operators import image_ops

    path = f"/tmp/lagespark_scale_av_src_v1_{n}"
    av_dest = os.path.join(path, "av.parquet")
    img_dest = os.path.join(path, "images.parquet")
    if not os.path.exists(os.path.join(av_dest, "_SUCCESS")):
        image_ops.generate_av(spark, n, partitions=64).write.mode(
            "overwrite"
        ).parquet(av_dest)
    if not os.path.exists(os.path.join(img_dest, "_SUCCESS")):
        image_ops.generate_with_neardups(
            spark, n, partitions=64, dup_every=10
        ).write.mode("overwrite").parquet(img_dest)
    return av_dest, img_dest


def run_av(spark, n: int, parts: int) -> None:
    """Fused multimodal scaling row (VERDICT r6 #5): the two operator
    families with no prior 2-cluster-size evidence, over pre-materialized
    parquet so the timed work is pure engine.

    (a) q64b shape — LAV1 frame/window sampling: native n_samp arithmetic,
        ONE mapInPandas pass that index-seeks only the sampled units of
        each container (payload crosses Arrow once, never exploded per
        sample). Correctness inline: the kernel's emitted sample count
        must equal the independent native SUM(min(8, dur/1000)).
    (b) q85b shape — image near-dup corpus FILTER: pHash banded pairs →
        connected components → anti-join keeps one representative per
        cluster; everything after the stored hash is pure Catalyst.
        Correctness inline: injected twins (every 10th image) collapse,
        so kept <= n and >= 0.9n (cross-image pHash collisions at this
        volume may merge a few extra clusters, never add rows)."""
    from lagespark.operators import image_ops

    av_src, img_src = _av_src(spark, n, parts)
    av = spark.read.parquet(av_src)
    frames = image_ops.sample_av_frames(av, fps=1.0, max_samples=8)
    got = frames.agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.countDistinct("media_id").alias("n_media"),
        F.sum(F.length("data")).alias("nb"),
    ).collect()[0]
    want = av.agg(
        F.sum(
            F.least(
                F.lit(8),
                F.greatest(
                    F.lit(1), F.floor(F.col("duration_ms") / 1000.0)
                ),
            )
        ).alias("s")
    ).collect()[0]["s"]
    assert got["n_media"] == n and got["n_samples"] == want and got["nb"] > 0

    imgs = spark.read.parquet(img_src)
    kept = image_ops.phash_dedup_corpus(imgs, max_hamming=6).count()
    assert int(n * 0.9) <= kept <= n, kept


def _corpus_src(spark, n: int, parts: int) -> str:
    """Deterministic n-doc corpus for the pipeline scaling job, written once
    per size to /tmp and reused by every run/level (generation rides the
    excluded warm-up run; the pipeline's own scan of it is part of every
    timed run, identically at both levels). Docs are the wide-alphabet
    `_docs` corpus (10% injected near-dups — real positives for the LSH)
    plus a tripled language marker word keyed on doc_id % 4, so langid
    assigns four real language strata and the mix + (lang, bucket) pack
    stages exercise their actual per-language machinery."""
    # the generator VERSION is part of the cache key: editing _docs or the
    # marker logic must invalidate the /tmp cache, and a killed run's
    # partial dir (no _SUCCESS) must regenerate rather than be served
    path = f"/tmp/lagespark_scale_corpus_src_v2_{n}"
    dest = os.path.join(path, "documents.parquet")
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        marker = F.element_at(
            F.array(F.lit("the"), F.lit("der"), F.lit("le"), F.lit("el")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        )
        d = _docs(spark, n, parts).select(
            "doc_id",
            F.concat_ws(" ", marker, marker, marker, F.col("text")).alias(
                "text"
            ),
        )
        d.write.mode("overwrite").parquet(dest)
    return path


def run_corpus(spark, n: int, parts: int) -> None:
    """END-TO-END training-corpus pipeline (clean → dedup → decon → mix →
    pack) — the scaling row for the four round-4 pipeline operators
    (q100-q103). This is literally pipeline/corpus.run(): every stage goes
    through the real manifest/parquet write path (hashed decontamination,
    threshold-matched LSH banding, (lang, bucket) pack shard), so the
    measurement includes the exchanges AND the stage materialization I/O a
    production pipeline pays. Input is the deterministic `_corpus_src`
    corpus (same per-index generation discipline as the overlay/dedup
    jobs — bit-identical at every parallelism level, and sized so each
    level does >= 20 s of real work, the r4 stage-latency lesson; the tiny
    5k-doc sf0.1 table is latency-bound at 8 cores and documented as such
    in BENCH/BASELINE.md). Fresh throwaway output dir per run (no resume
    short-circuit)."""
    import shutil
    import tempfile

    from lagespark.pipeline import corpus

    src = _corpus_src(spark, n, parts)
    out = tempfile.mkdtemp(prefix="lagespark_scale_corpus_")
    try:
        args = corpus.build_parser().parse_args(
            ["--out", out, "--sf-dir", src]
        )
        stats = corpus.run(args)
        assert stats["input_docs"] == n
        assert stats["packed_docs"] > 0
        # per-stage wall times (VERDICT r5 #2): bench_at publishes the
        # per-level medians so sublinear end-to-end efficiency is
        # attributable to a named stage instead of guessed at
        CORPUS_STAGE_RUNS.append(stats["stage_sec"])
    finally:
        shutil.rmtree(out, ignore_errors=True)


CORPUS_STAGE_RUNS: list[dict] = []


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


JOBS = {
    "spatial": run_spatial,
    "image": run_image,
    "overlay": run_overlay,
    "dedup": run_dedup,
    "refine": run_refine,
    "ingest": run_ingest,
    "corpus": run_corpus,
    "av": run_av,
}


def bench_at(cores: int, sizes: dict[str, int], runs: int) -> dict:
    from lagespark.session import get_spark

    spark = get_spark(f"local[{cores}]", app_name=f"lagespark-scale-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    parts = max(cores * 4, 8)
    out = {"cores": cores}
    for job, n in sizes.items():
        fn = JOBS[job]
        # warm-up at FULL size (excluded): JVM JIT + Python worker imports +
        # allocator growth all land here instead of the first timed run
        fn(spark, n, parts)
        if job == "corpus":
            CORPUS_STAGE_RUNS.clear()  # drop the warm-up run's stage split
        t = timed(lambda: fn(spark, n, parts), runs)
        out[f"{job}_sec_runs"] = [round(v, 2) for v in t]
        out[f"{job}_sec"] = round(statistics.median(t), 3)
        out[f"{job}_rows_per_sec"] = round(n / statistics.median(t))
        if job == "corpus" and CORPUS_STAGE_RUNS:
            out["corpus_stage_sec"] = {
                k: round(statistics.median([r[k] for r in CORPUS_STAGE_RUNS]), 2)
                for k in CORPUS_STAGE_RUNS[0]
            }
    spark.stop()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-spatial", type=int, default=16_000_000)
    ap.add_argument("--n-image", type=int, default=40_000)
    ap.add_argument("--n-overlay", type=int, default=60_000)
    ap.add_argument("--n-dedup", type=int, default=60_000)
    ap.add_argument("--n-refine", type=int, default=240_000)
    ap.add_argument("--n-ingest", type=int, default=240_000)
    ap.add_argument("--n-corpus", type=int, default=60_000)
    ap.add_argument("--n-av", type=int, default=120_000)
    ap.add_argument("--sizes", default="2,8")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--jobs", default="spatial,image,overlay,dedup")
    ap.add_argument("--no-calibrate", action="store_true")
    # job-specific sessions (refine, corpus reruns) write their own file —
    # scaling_results.json holds the headline multi-job record and a
    # single-job rerun must not clobber it
    ap.add_argument("--out-name", default="scaling_results.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    jobs = args.jobs.split(",")
    unknown = [j for j in jobs if j not in JOBS]
    if unknown:
        # fail FAST: a typo would otherwise silently drop the job and the
        # missing evidence surfaces only after a long idle-box run
        ap.error(f"unknown --jobs {unknown}; valid: {sorted(JOBS)}")
    job_sizes = {j: getattr(args, f"n_{j}") for j in jobs}

    results = {f"n_{j}": n for j, n in job_sizes.items()}
    results["levels"] = []
    for c in sizes:
        r = bench_at(c, job_sizes, args.runs)
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
        for job in job_sizes:
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
        os.path.dirname(os.path.abspath(__file__)), args.out_name
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

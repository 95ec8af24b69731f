"""Wave-3 query registry: area overlay / tiles / image payload / multimodal.

These operators are pinned by pytest goldens + independent oracles
(tests/test_overlay_golden.py, tests/test_image_pipeline.py) rather than SQL
— their geometry/codec math is not SQL-expressible, so the driver records
rows-only checks here while the real verification lives in the test suite.
Aggregate invariants (counts, exact-roundtrip counts, PSNR floors) are still
returned as query output so regressions surface in CORRECTNESS diffs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lagespark import fixtures, oracles
from lagespark.harness import T, q
from lagespark.operators import image_ops, overlay, tile
from lagespark.operators.spatial import FeatureSet


def _n_images(sf: str) -> int:
    return 2000 if "0.1" not in sf else 20000


@q("q58-geo-overlay-areas")  # golden-pinned in tests (not SQL-expressible)
def q58(spark, sf):
    """Full reference pipeline over AREAS: zone-band strips × compensatory
    polygons × protected-area bonus → per-feature/zone area + score."""
    gdf = spark.createDataFrame(fixtures.gruenflaeche_pdf())
    pieces = overlay.zone_area_pieces(
        gdf,
        FeatureSet(fixtures.baufeld_pdf()),
        FeatureSet(fixtures.biotope_pdf()),
        resolution=4.0,
    )
    gf = FeatureSet(fixtures.gruenflaeche_pdf())
    vals = spark.createDataFrame(
        gf.attrs.reset_index()[["feature_id", "compensatory_value"]]
    )
    factors = spark.createDataFrame(fixtures.factors_pdf())
    return overlay.score_areas(pieces, vals, factors)


@q("q59-geo-tile")  # golden-pinned in tests
def q59(spark, sf):
    """Raster↔vector tile materialization: per-tile masks + popcounts."""
    t = tile.rasterize_features(
        spark, FeatureSet(fixtures.gruenflaeche_pdf()), 256.0, 16
    )
    return t.select("tile_id", "feature_id", "covered_cells")


# q59b: the geo-tile kernel checked end-to-end against CLOSED-FORM SQL.
# Rect features (the q68 synthesis, +0.05 offset so no 16 m sub-cell CENTER
# — always an integer coordinate — ever lands on a rect edge, which is
# always *.?5) → rasterize → covered_cells. The oracle counts sub-cell
# centers inside each rect with pure floor/ceil arithmetic per tile.
_T59 = 256.0  # tile_size; 16 cells/side of 16 m; centers at 256i + 16u + 8


def _q59b_oracle() -> str:
    off = 1 << 20  # cells.GRID_OFF
    shift = 1 << 21  # cells.GRID_SHIFT
    nx = (
        "GREATEST(0, LEAST(15, CAST(CEIL((x1 - i*256 - 8) / 16.0) AS BIGINT) - 1) "
        "- GREATEST(0, CAST(FLOOR((x0 - i*256 - 8) / 16.0) AS BIGINT) + 1) + 1)"
    )
    ny = (
        "GREATEST(0, LEAST(15, CAST(CEIL((y1 - j*256 - 8) / 16.0) AS BIGINT) - 1) "
        "- GREATEST(0, CAST(FLOOR((y0 - j*256 - 8) / 16.0) AS BIGINT) + 1) + 1)"
    )
    return (
        "WITH r AS (" + oracles.RECT_SELECT + "), "
        "d AS (SELECT rid, MIN(rx0) AS rx0, MIN(ry0) AS ry0, MIN(rw) AS rw, "
        "MIN(rh) AS rh FROM r GROUP BY rid), "
        "f AS (SELECT rid, rx0 + 0.05 AS x0, ry0 + 0.05 AS y0, "
        "rx0 + 0.05 + rw AS x1, ry0 + 0.05 + rh AS y1 FROM d WHERE rid % 97 = 0), "
        "ti AS (SELECT *, unnest(range(CAST(FLOOR(x0 / 256.0) AS BIGINT), "
        "CAST(FLOOR(x1 / 256.0) AS BIGINT) + 1)) AS i FROM f), "
        "tj AS (SELECT *, unnest(range(CAST(FLOOR(y0 / 256.0) AS BIGINT), "
        "CAST(FLOOR(y1 / 256.0) AS BIGINT) + 1)) AS j FROM ti), "
        f"c AS (SELECT (i + {off}) * {shift} + (j + {off}) AS tile_id, "
        "CAST(rid AS VARCHAR) AS feature_id, "
        f"{nx} * {ny} AS covered_cells FROM tj) "
        "SELECT tile_id, feature_id, CAST(covered_cells AS INT) AS covered_cells "
        "FROM c WHERE covered_cells > 0"
    )


@q("q59b-geo-tile-rect", _q59b_oracle())
def q59b(spark, sf):
    """Tile rasterization (geo-tile) against an exact SQL oracle: rect
    features → per-tile 16×16 center-in-polygon masks; covered_cells must
    equal the closed-form count of sub-cell centers strictly inside each
    rect (no center ever sits on a rect edge — see _q59b_oracle)."""
    d = (
        T(spark, sf, "lineitem")
        .selectExpr(*oracles.RECT_EXPRS)
        .filter(F.expr("rid % 97 = 0"))
        .groupBy("rid")
        .agg(
            F.min("rx0").alias("rx0"),
            F.min("ry0").alias("ry0"),
            F.min("rw").alias("rw"),
            F.min("rh").alias("rh"),
        )
        .toPandas()
    )
    x0 = d["rx0"].to_numpy() + 0.05
    y0 = d["ry0"].to_numpy() + 0.05
    x1 = x0 + d["rw"].to_numpy()
    y1 = y0 + d["rh"].to_numpy()
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "feature_id": d["rid"].astype("int64").astype(str),
            "rings": [
                [
                    [
                        {"x": a, "y": b},
                        {"x": c, "y": b},
                        {"x": c, "y": e},
                        {"x": a, "y": e},
                    ]
                ]
                for a, b, c, e in zip(x0, y0, x1, y1)
            ],
            "xmin": x0,
            "ymin": y0,
            "xmax": x1,
            "ymax": y1,
        }
    )
    t = tile.rasterize_features(spark, FeatureSet(pdf), _T59, 16)
    return t.select("tile_id", "feature_id", "covered_cells")


@q("q60-img-roundtrip")  # payload invariant (BASELINE.json:6,15)
def q60(spark, sf):
    """Per-fmt roundtrip: min PSNR (≥40 for lossy), exact count (== n for
    lossless), max pHash hamming — fused generate→decode→check, one
    Python pass."""
    image_ops.set_image_batching(spark)
    chk = image_ops.generate_and_check(spark, _n_images(sf))
    return chk.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("psnr").alias("min_psnr"),
        F.sum(F.col("exact").cast("long")).alias("n_exact"),
        F.max("phash_hamming").alias("max_phash_hamming"),
    )


@q("q61-img-decode-stats")
def q61(spark, sf):
    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_images(spark, _n_images(sf))
    st = image_ops.decode_stats(imgs)
    return st.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("mean_px"), 3).alias("avg_mean_px"),
        F.min("min_px").alias("min_px"),
        F.max("max_px").alias("max_px"),
    )


@q("q62-img-transcode")
def q62(spark, sf):
    """decode→encode(png) in one mapInPandas pass; caption must survive
    byte-identically (caption-equality invariant)."""
    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_images(spark, _n_images(sf))
    # the generated table feeds BOTH the transcode pass and the caption
    # join side — checkpoint so the per-image payload generation runs once
    # (round 8; local-mode block locking serializes any concurrent
    # materialization per partition, so lazy is safe here)
    imgs = imgs.localCheckpoint(eager=False)
    out = image_ops.transcode(imgs, "png")
    joined = imgs.select("image_id", F.col("caption").alias("cap_in")).join(
        out.select("image_id", "caption", F.length("bytes").alias("png_bytes")),
        "image_id",
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("cap_in") == F.col("caption")).cast("long")).alias("n_caption_ok"),
        F.sum("png_bytes").alias("total_png_bytes"),
    )


@q("q63-img-resize")
def q63(spark, sf):
    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_images(spark, _n_images(sf))
    small = image_ops.resize_pool2(imgs)
    return small.groupBy("w", "h").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("bytes")).alias("total_bytes")
    )


@q("q69-img-tile-chain")
def q69(spark, sf):
    """decode→tile→encode chain (one Python pass): 2×2 tiles re-encoded as
    PNG; per-fmt-source tile counts + byte totals."""
    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_images(spark, min(_n_images(sf), 2000))
    tiles = image_ops.tile_chain(imgs, grid=2, to_fmt="png")
    return tiles.groupBy("w", "h").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum(F.length("bytes")).alias("total_bytes"),
    )


@q("q87-img-arrow-stats")
def q87(spark, sf):
    """mapInArrow payload statistics (raw RecordBatches, no pandas)."""
    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_images(spark, min(_n_images(sf), 2000))
    return image_ops.payload_size_stats_arrow(imgs)


@q("q85-img-phash-dedup")
def q85(spark, sf):
    """Image near-dup detection by pHash banding (injected duplicates as
    ground truth — exactness asserted in tests; the pair path after hashing
    is pure Catalyst bit arithmetic)."""
    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_with_neardups(spark, min(_n_images(sf), 2000))
    return image_ops.phash_neardup_pairs(imgs, max_hamming=6)


@q("q85b-img-dedup-corpus")
def q85b(spark, sf):
    """End-to-end image dedup FILTER: pHash banded pairs → components →
    keep one representative per duplicate cluster (kept-count exactness vs
    injected duplicates asserted in tests)."""
    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_with_neardups(spark, min(_n_images(sf), 2000))
    kept = image_ops.phash_dedup_corpus(imgs, max_hamming=6)
    return kept.select("image_id", "fmt", "w", "h")


@q("q105-img-dedup-ingest")
def q105(spark, sf):
    """Streaming IMAGE ingest dedup claims (batch-equivalence form, same
    contract as q104's): first-writer-wins pHash band claims over the
    generated image table with injected qdct twins. Rows-only by the
    image contract (the image table is generated, not a parquet view);
    streaming/batch claims parity is pinned in tests/test_streaming.py."""
    from lagespark.streaming import ops as sops

    image_ops.set_image_batching(spark)
    imgs = image_ops.generate_with_neardups(spark, min(_n_images(sf), 2000))
    return sops.ingest_claims_batch_phash(imgs, order_col=None)


@q("q64-multimodal-stub")
def q64(spark, sf):
    """Audio/video feature extraction with REAL container decode: payloads
    are LAV1 containers (image/av.py — qdct video frames / deflated s16
    audio windows), every unit decoded, stats over actual pixels/samples.
    (Query key keeps its historical name; only EXTERNAL codecs are stubbed
    behind the real_codecs seam.)"""
    av = image_ops.generate_av(spark, 1000)
    feats = image_ops.decode_av_features(av)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_units").alias("total_units"),
        F.round(F.avg("sig_mean"), 3).alias("avg_sig_mean"),
        F.sum("n_bytes").alias("total_bytes"),
    )


@q("q64b-multimodal-frames")
def q64b(spark, sf):
    """Frame/window sampling over the AV table: native sample-count
    arithmetic → one decode pass that index-seeks ONLY the sampled units
    of each LAV1 payload (ffmpeg -ss analogue)."""
    av = image_ops.generate_av(spark, 1000)
    frames = image_ops.sample_av_frames(av, fps=1.0, max_samples=8)
    return frames.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.countDistinct("media_id").alias("n_media"),
        F.sum(F.length("data")).alias("total_bytes"),
        F.max("ts_ms").alias("max_ts_ms"),
    )


@q("q65-img-geo-join")
def q65(spark, sf):
    """Images × Lagefaktor zones: the graft join — geotagged image records
    cell-indexed and zone-assigned (payload carried through untouched)."""
    from lagespark.operators import spatial

    imgs = image_ops.generate_images(spark, _n_images(sf))
    zoned = spatial.with_zone(imgs, FeatureSet(fixtures.baufeld_pdf()))
    return zoned.groupBy("zone", "fmt").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("bytes")).alias("payload_bytes")
    )

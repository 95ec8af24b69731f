"""spark-submit pipeline CLI (BASELINE.json:6,14: 'launches via spark-submit
--py-files on multi-executor clusters', 'resumable from checkpoint').

Stages (each checkpointed with manifest + per-partition lineage/metrics):

  images  — generate/load the geotagged image+caption table, cell-indexed,
            partitioned by cell_prefix (spatially coherent → partition
            pruning serves both spatial range queries and resume)
  zones   — Lagefaktor zone assignment per image (exact distance kernel),
            partitioned by zone
  scores  — per-zone/fmt aggregation (tiny output)

Usage (local example; on a cluster swap --master and add --py-files zip):

  python tools/make_pyfiles_zip.py /tmp/lagespark.zip
  spark-submit --master local[8] --py-files /tmp/lagespark.zip \
      -m lagespark.pipeline.cli --out /tmp/pipe --n-images 2000
  # kill it mid-run, then resume:
  spark-submit ... -m lagespark.pipeline.cli --out /tmp/pipe --resume
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lagespark-pipeline", description=__doc__)
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--n-images", type=int, default=2000)
    p.add_argument("--partitions", type=int, default=16)
    p.add_argument("--resume", action="store_true", help="resume from checkpoints")
    p.add_argument("--master", default=None)
    p.add_argument("--cell-size", type=float, default=250.0)
    return p


def run(args) -> dict:
    from lagespark import fixtures
    from lagespark.operators import image_ops, spatial
    from lagespark.pipeline import manifest
    from lagespark.session import get_spark

    spark = get_spark(args.master, app_name="lagespark-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    # stage 1: images (cell-indexed, partitioned by spatially-coherent prefix)
    img_dir = os.path.join(args.out, "images")
    imgs = image_ops.generate_images(spark, args.n_images, args.partitions)
    imgs = spatial.with_grid_cell(imgs, cell_size=args.cell_size)
    imgs = imgs.withColumn(
        "cell_prefix", F.pmod(F.floor(F.col("x") / F.lit(args.cell_size * 4)), 16).cast("int")
    )
    m1 = manifest.write_stage(
        imgs, img_dir, "images", "cell_prefix", inputs=[], resume=args.resume
    )

    # stage 2: zone assignment (reads stage 1 back — partition-prunable)
    zone_dir = os.path.join(args.out, "zones")
    stage1 = spark.read.parquet(img_dir)
    zoned = spatial.with_zone(stage1, spatial.FeatureSet(fixtures.baufeld_pdf()))
    m2 = manifest.write_stage(
        zoned, zone_dir, "zones", "zone", inputs=[m1["manifest_id"]], resume=args.resume
    )

    # stage 3: tile materialization ("a killed job resumes MID-TILING",
    # BASELINE.json:6 — tiles are partitioned by a tile bucket so resume
    # recomputes only missing buckets)
    tile_dir = os.path.join(args.out, "tiles")
    stage2b = spark.read.parquet(zone_dir)
    tile_size = args.cell_size * 4
    tiles = (
        stage2b.withColumn(
            "tile_id",
            (F.floor(F.col("x") / tile_size).cast("long") + 1048576) * 2097152
            + (F.floor(F.col("y") / tile_size).cast("long") + 1048576),
        )
        .groupBy("tile_id", "zone")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.length("bytes")).alias("payload_bytes"),
        )
        .withColumn("tile_bucket", F.pmod(F.col("tile_id"), 16).cast("int"))
    )
    m3 = manifest.write_stage(
        tiles, tile_dir, "tiles", "tile_bucket", inputs=[m2["manifest_id"]],
        resume=args.resume,
    )

    # stage 4: aggregation (single small output + manifest)
    score_dir = os.path.join(args.out, "scores")
    stage3 = spark.read.parquet(tile_dir)
    scores = stage3.groupBy("zone").agg(
        F.sum("n_images").alias("n"),
        F.sum("payload_bytes").alias("payload_bytes"),
        F.count(F.lit(1)).alias("n_tiles"),
    )
    m4 = manifest.write_stage(
        scores.withColumn("bucket", F.lit(0)),
        score_dir,
        "scores",
        "bucket",
        inputs=[m3["manifest_id"]],
        resume=args.resume,
    )
    out = {"images": m1, "zones": m2, "tiles": m3, "scores": m4}
    print(json.dumps({s: {"rows": sum(p["rows"] for p in m["partitions"].values()),
                          "partitions": len(m["partitions"])}
                      for s, m in out.items()}))
    return out


def main() -> None:
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()

"""Raster↔vector tile materialization (geo-tile, BASELINE.json:6,14).

Tiles are a fixed grid (default 256 m). Rasterize: per (tile, feature)
candidate pair — produced by a cell-cover equi-join, NOT a cross join — an
applyInPandas group renders the feature mask into the tile's sub-raster
(default 16×16 cells of 16 m): bit = cell CENTER inside the feature.
Vectorize: masks back to merged horizontal boxes.

Tile ids reuse the planar grid encoding (kernels.cells.grid_encode at
tile_size), so tile outputs partition/prune exactly like any cell-keyed
table. At scale, rasterization shuffles (tile_id) once; neighbor tiles
co-locate under range partitioning for mosaic writes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lagespark.kernels import cells, geom
from lagespark.operators.spatial import FeatureSet, feature_cover_pdf


def rasterize_features(
    spark: SparkSession,
    feats: FeatureSet,
    tile_size: float = 256.0,
    cells_per_side: int = 16,
    group_buckets: int = 64,
) -> DataFrame:
    """(tile_id, feature_id, covered_cells, mask) — mask is the row-major
    bit-packed sub-raster (bytes, cells_per_side²/8 long).

    Rendering runs as mapInPandas over the (tile, feature) cover pairs with
    the polygon rings riding the UDF closure — NO grouping shuffle and no
    per-group Python call overhead (a groupBy-per-feature variant paid
    ~1-3 ms × n_features of applyInPandas group dispatch, which dominated
    for large many-small-feature sets). Within each Arrow batch the pairs
    are grouped per feature in pandas and rendered in ONE stacked PIP pass
    (N·S² points through one vectorized kernel call). `group_buckets` is
    retained for signature compatibility (unused)."""
    cover = feature_cover_pdf(feats, cell_size=tile_size, exact=True)
    pairs = spark.createDataFrame(cover).withColumnRenamed("cell", "tile_id")
    par = spark.sparkContext.defaultParallelism
    pairs = pairs.repartition(par)
    rings_by_fid = feats.rings
    sub = tile_size / cells_per_side
    S = cells_per_side

    def render(batches):
        offs = (np.arange(S) + 0.5) * sub
        gx, gy = np.meshgrid(offs, offs)  # row-major: x varies fastest
        gxf, gyf = gx.ravel(), gy.ravel()
        for pdf in batches:
            outs = []
            for fid, g in pdf.groupby("feature_id", sort=False):
                ring = rings_by_fid[fid]
                tids = g["tile_id"].to_numpy(dtype=np.int64)
                i, j = cells.grid_decode(tids)
                x0 = i.astype(np.float64) * tile_size
                y0 = j.astype(np.float64) * tile_size
                px = (x0[:, None] + gxf[None, :]).ravel()
                py = (y0[:, None] + gyf[None, :]).ravel()
                inside = geom.point_in_polygon(px, py, ring).reshape(len(tids), S * S)
                counts = inside.sum(axis=1)
                keep = counts > 0
                packed = np.packbits(inside[keep], axis=1)
                outs.append(
                    pd.DataFrame(
                        {
                            "tile_id": tids[keep],
                            "feature_id": np.repeat(fid, int(keep.sum())),
                            "covered_cells": counts[keep].astype(np.int32),
                            "mask": [m.tobytes() for m in packed],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return pairs.mapInPandas(
        render, "tile_id long, feature_id string, covered_cells int, mask binary"
    )


def vectorize_tiles(
    tiles: DataFrame, tile_size: float = 256.0, cells_per_side: int = 16
) -> DataFrame:
    """Inverse: masks → merged horizontal boxes (xmin, ymin, xmax, ymax) —
    the vector-side output of the raster↔vector round trip."""
    sub = tile_size / cells_per_side

    S = cells_per_side

    def unrender(pdf: pd.DataFrame) -> pd.DataFrame:
        tids = pdf["tile_id"].to_numpy(dtype=np.int64)
        fids = pdf["feature_id"].to_numpy()
        i, j = cells.grid_decode(tids)
        x0 = i.astype(np.float64) * tile_size
        y0 = j.astype(np.float64) * tile_size
        m = len(pdf)
        bits = np.zeros((m, S, S), dtype=np.int8)
        for k, raw in enumerate(pdf["mask"]):
            bits[k] = np.unpackbits(
                np.frombuffer(raw, dtype=np.uint8), count=S * S
            ).reshape(S, S)
        # vectorized run detection across ALL masks at once: zero-pad each
        # scan line, diff → +1 at run starts, -1 one past run ends;
        # np.nonzero's row-major order pairs starts[k] with ends[k]
        padded = np.zeros((m, S, S + 2), dtype=np.int8)
        padded[:, :, 1:-1] = bits
        d = np.diff(padded, axis=2)
        sm, sr, sc = np.nonzero(d == 1)
        em, er, ec = np.nonzero(d == -1)
        return pd.DataFrame(
            {
                "tile_id": tids[sm],
                "feature_id": fids[sm],
                "xmin": x0[sm] + sc * sub,
                "ymin": y0[sm] + sr * sub,
                "xmax": x0[em] + ec * sub,
                "ymax": y0[em] + (er + 1) * sub,
            }
        )

    return tiles.groupBy("tile_id").applyInPandas(
        unrender,
        "tile_id long, feature_id string, xmin double, ymin double, "
        "xmax double, ymax double",
    )

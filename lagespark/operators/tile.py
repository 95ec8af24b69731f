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
) -> DataFrame:
    """(tile_id, feature_id, covered_cells, mask) — mask is the row-major
    bit-packed sub-raster (bytes, cells_per_side²/8 long)."""
    cover = feature_cover_pdf(feats, cell_size=tile_size, exact=True)
    pairs = spark.createDataFrame(cover).withColumnRenamed("cell", "tile_id")
    rings_by_fid = feats.rings
    sub = tile_size / cells_per_side

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        offs = (np.arange(cells_per_side) + 0.5) * sub
        for _, r in pdf.iterrows():
            tid = int(r["tile_id"])
            i, j = cells.grid_decode(np.array([tid]))
            x0 = float(i[0]) * tile_size
            y0 = float(j[0]) * tile_size
            gx, gy = np.meshgrid(x0 + offs, y0 + offs)
            inside = geom.point_in_polygon(
                gx.ravel(), gy.ravel(), rings_by_fid[r["feature_id"]]
            )
            n = int(inside.sum())
            if n == 0:
                continue
            rows.append(
                (tid, r["feature_id"], n, np.packbits(inside).tobytes())
            )
        return pd.DataFrame(
            rows, columns=["tile_id", "feature_id", "covered_cells", "mask"]
        )

    return pairs.repartition("tile_id").groupBy("tile_id", "feature_id").applyInPandas(
        render, "tile_id long, feature_id string, covered_cells int, mask binary"
    )


def vectorize_tiles(
    tiles: DataFrame, tile_size: float = 256.0, cells_per_side: int = 16
) -> DataFrame:
    """Inverse: masks → merged horizontal boxes (xmin, ymin, xmax, ymax) —
    the vector-side output of the raster↔vector round trip."""
    sub = tile_size / cells_per_side

    def unrender(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            i, j = cells.grid_decode(np.array([int(r["tile_id"])]))
            x0 = float(i[0]) * tile_size
            y0 = float(j[0]) * tile_size
            bits = np.unpackbits(
                np.frombuffer(r["mask"], dtype=np.uint8),
                count=cells_per_side * cells_per_side,
            ).reshape(cells_per_side, cells_per_side)
            for row in range(cells_per_side):
                line = bits[row]
                change = np.flatnonzero(np.diff(line)) + 1
                starts = np.concatenate(([0], change))
                ends = np.concatenate((change, [cells_per_side]))
                for s, e in zip(starts, ends):
                    if line[s]:
                        rows.append(
                            (
                                int(r["tile_id"]),
                                r["feature_id"],
                                x0 + s * sub,
                                y0 + row * sub,
                                x0 + e * sub,
                                y0 + (row + 1) * sub,
                            )
                        )
        return pd.DataFrame(
            rows, columns=["tile_id", "feature_id", "xmin", "ymin", "xmax", "ymax"]
        )

    return tiles.groupBy("tile_id").applyInPandas(
        unrender,
        "tile_id long, feature_id string, xmin double, ymin double, "
        "xmax double, ymax double",
    )

"""The remaining UDF surfaces (SURVEY.md §2.10): UDTF, grouped-agg pandas
UDF, and SQL front-door registration.

  cell_cover_udtf   — Python UDTF: one (bbox) row in → exploded cover-cell
                      rows out (the UDTF alternative to explode(array))
  union_area_udaf   — grouped-agg pandas UDF: exact union area of axis-
                      aligned boxes per group (sweep-line over numpy),
                      the custom spatial aggregate
  register_sql_udfs — spark.udf.register of the vectorized cell encoders so
                      spark.sql('SELECT s2_cell(lat, lon, 15) …') works as
                      the alternate front door
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf
from pyspark.sql.types import DoubleType, LongType

from lagespark.kernels import cells


@udtf(returnType="cell bigint")
class CellCoverUDTF:
    """lateral-join table function: bbox → covering grid cells."""

    def eval(self, xmin, ymin, xmax, ymax, cell_size):
        # SQL numeric literals may arrive as decimal.Decimal — coerce
        for c in cells.grid_cover_bbox(
            float(xmin), float(ymin), float(xmax), float(ymax), float(cell_size)
        ):
            yield (int(c),)


def union_area_of_boxes(
    xmin: np.ndarray, ymin: np.ndarray, xmax: np.ndarray, ymax: np.ndarray
) -> float:
    """Exact union area of axis-aligned boxes: x-sweep with per-slab
    y-interval merging (vectorized sorts; no per-pixel rasterizing)."""
    if len(xmin) == 0:
        return 0.0
    xs = np.unique(np.concatenate([xmin, xmax]))
    total = 0.0
    for i in range(len(xs) - 1):
        x0, x1 = xs[i], xs[i + 1]
        m = (xmin < x1) & (xmax > x0)
        if not m.any():
            continue
        y0 = ymin[m]
        y1 = ymax[m]
        order = np.argsort(y0)
        y0 = y0[order]
        y1 = y1[order]
        covered = 0.0
        cur_lo, cur_hi = y0[0], y1[0]
        for j in range(1, len(y0)):
            if y0[j] > cur_hi:
                covered += cur_hi - cur_lo
                cur_lo, cur_hi = y0[j], y1[j]
            else:
                cur_hi = max(cur_hi, y1[j])
        covered += cur_hi - cur_lo
        total += covered * (x1 - x0)
    return total


@F.pandas_udf(DoubleType())
def union_area_udaf(
    xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
) -> float:
    return round(
        union_area_of_boxes(
            xmin.to_numpy(), ymin.to_numpy(), xmax.to_numpy(), ymax.to_numpy()
        ),
        6,
    )


def register_sql_udfs(spark: SparkSession) -> None:
    @F.pandas_udf(LongType())
    def s2_cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(cells.s2_encode(lat.to_numpy(), lon.to_numpy(), 15))

    @F.pandas_udf(LongType())
    def grid_cell(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(cells.grid_encode(x.to_numpy(), y.to_numpy(), 250.0))

    spark.udf.register("s2_cell", s2_cell)
    spark.udf.register("grid_cell", grid_cell)
    spark.udtf.register("cell_cover", CellCoverUDTF)

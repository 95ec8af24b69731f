"""Tests: WKT ingest / GeoJSON export / schema validation / UDTF /
grouped-agg UDF / SQL front door."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from lagespark import fixtures, schemas
from lagespark.operators import udf_surface
from lagespark.sources import features as fsrc


def test_wkt_roundtrip_fixture_geometries():
    """Every fixture polygon survives wkt → parse → area identity."""
    from lagespark.kernels import geom

    for pdf in (fixtures.baufeld_pdf(), fixtures.gruenflaeche_pdf(), fixtures.biotope_pdf()):
        for _, row in pdf.iterrows():
            rings = fsrc.parse_wkt_polygon(row["wkt"])
            want = [
                np.array([[p["x"], p["y"]] for p in ring]) for ring in row["rings"]
            ]
            assert len(rings) == len(want)
            got_area = geom.polygon_area(rings)
            want_area = geom.polygon_area(want)
            assert got_area == pytest.approx(want_area, rel=1e-12)


def test_wkt_rejects_non_polygon():
    with pytest.raises(ValueError, match="unsupported WKT type"):
        fsrc.parse_wkt_polygon("LINESTRING (0 0, 1 1)")


def test_features_from_wkt_spark(spark):
    rows = [
        {"feature_id": "w1", "wkt": "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "val": 2.0},
        {
            "feature_id": "w2",
            "wkt": "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
            "val": 1.0,
        },
    ]
    df = fsrc.features_from_wkt(spark, rows)
    got = df.toPandas().set_index("feature_id")
    assert got.loc["w1", "xmax"] == 10.0
    assert len(got.loc["w2", "rings"]) == 2  # outer + hole


def test_schema_validate_mismatch(spark):
    df = spark.createDataFrame([(1,)], "image_id int")
    with pytest.raises(schemas.SchemaMismatch, match="image_id"):
        schemas.validate(df, schemas.IMAGES)


def test_geojson_export(tmp_path):
    p = fsrc.export_geojson(
        fixtures.gruenflaeche_pdf(), str(tmp_path / "gf.geojson"), ["compensatory_value"]
    )
    doc = json.load(open(p))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 8
    g = doc["features"][0]["geometry"]
    assert g["type"] == "Polygon"
    # rings are closed in GeoJSON
    assert g["coordinates"][0][0] == g["coordinates"][0][-1]


def test_cell_cover_udtf_and_sql_front_door(spark):
    udf_surface.register_sql_udfs(spark)
    rows = spark.sql(
        "SELECT * FROM cell_cover(100.0, 100.0, 900.0, 450.0, 250.0)"
    ).toPandas()
    from lagespark.kernels import cells

    want = set(cells.grid_cover_bbox(100.0, 100.0, 900.0, 450.0, 250.0).tolist())
    assert set(rows.cell.tolist()) == want
    # scalar SQL front door matches the kernel
    got = spark.sql("SELECT s2_cell(52.5, 13.4) AS c").toPandas().c[0]
    assert got == int(cells.s2_encode(np.array([52.5]), np.array([13.4]), 15)[0])


def test_union_area_udaf(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b"],
            "xmin": [0.0, 5.0, 20.0, 0.0],
            "ymin": [0.0, 5.0, 0.0, 0.0],
            "xmax": [10.0, 15.0, 30.0, 1.0],
            "ymax": [10.0, 15.0, 10.0, 1.0],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.groupBy("g")
        .agg(udf_surface.union_area_udaf("xmin", "ymin", "xmax", "ymax").alias("area"))
        .toPandas()
        .set_index("g")
    )
    # a: two overlapping 10x10 squares (union 175) + disjoint 10x10 = 275
    assert got.loc["a", "area"] == pytest.approx(275.0)
    assert got.loc["b", "area"] == pytest.approx(1.0)


def test_union_area_matches_bruteforce():
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = rng.integers(1, 12)
        x0 = rng.uniform(0, 50, n)
        y0 = rng.uniform(0, 50, n)
        x1 = x0 + rng.uniform(1, 20, n)
        y1 = y0 + rng.uniform(1, 20, n)
        got = udf_surface.union_area_of_boxes(x0, y0, x1, y1)
        # raster brute force at 0.25 resolution
        gx, gy = np.meshgrid(np.arange(0, 75, 0.25), np.arange(0, 75, 0.25))
        cov = np.zeros(gx.shape, bool)
        for i in range(n):
            cov |= (gx + 0.125 >= x0[i]) & (gx + 0.125 < x1[i]) & (
                gy + 0.125 >= y0[i]
            ) & (gy + 0.125 < y1[i])
        approx = cov.sum() * 0.0625
        assert got == pytest.approx(approx, rel=0.02)

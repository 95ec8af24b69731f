"""Feature ingest and export (SURVEY.md §2.1).

The reference loads ESRI shapefiles via GeoPandas (BASELINE.json:6 'the
reference shapefile pipeline'); no GIS libraries exist in this environment
(SURVEY.md §0), so ingest supports WKT text (the interchange format DuckDB,
PostGIS, GeoPandas all emit) parsed with a small recursive-descent reader
into the engine's rings/bbox encoding, and export writes GeoJSON
FeatureCollections (plain JSON — readable by every GIS tool).

Feature files are config-scale (SURVEY.md §1.1): ingest is driver-side
pandas → spark.createDataFrame; the big side of every join is the record
table, never the features.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"
_RING_RE = re.compile(r"\(\s*((?:%s\s+%s\s*,?\s*)+)\)" % (_NUM, _NUM))


def parse_wkt_polygon(wkt: str) -> list[np.ndarray]:
    """'POLYGON ((x y, ...), (hole ...))' → [outer_ring, holes...] as (N,2)
    arrays with the closing vertex dropped. MULTIPOLYGON is rejected here
    (split upstream — one row per polygon part keeps joins uniform)."""
    head = wkt.strip().split("(", 1)[0].strip().upper()
    if head != "POLYGON":
        raise ValueError(f"unsupported WKT type {head!r} (expected POLYGON)")
    rings = []
    for m in _RING_RE.finditer(wkt):
        pts = []
        for pair in m.group(1).split(","):
            xs = pair.split()
            if len(xs) >= 2:
                pts.append((float(xs[0]), float(xs[1])))
        if len(pts) >= 4 and pts[0] == pts[-1]:
            pts = pts[:-1]
        rings.append(np.asarray(pts, dtype=np.float64))
    if not rings:
        raise ValueError(f"no rings parsed from {wkt[:80]!r}")
    return rings


def features_from_wkt(
    spark: SparkSession, rows: list[dict], id_col: str = "feature_id"
) -> DataFrame:
    """rows: [{feature_id, wkt, **attrs}] → engine feature DataFrame
    (rings + bbox + wkt + attributes), schema-validated."""
    out = []
    for r in rows:
        rings = parse_wkt_polygon(r["wkt"])
        arr = rings[0]
        rec = {
            id_col: r[id_col],
            "rings": [[{"x": float(p[0]), "y": float(p[1])} for p in ring] for ring in rings],
            "xmin": float(arr[:, 0].min()),
            "ymin": float(arr[:, 1].min()),
            "xmax": float(arr[:, 0].max()),
            "ymax": float(arr[:, 1].max()),
            "wkt": r["wkt"],
        }
        rec.update({k: v for k, v in r.items() if k not in rec})
        out.append(rec)
    from lagespark import schemas

    df = spark.createDataFrame(pd.DataFrame(out))
    return schemas.validate(df, schemas.FEATURES)


def export_geojson(features_pdf: pd.DataFrame, path: str, attrs: list[str] = ()) -> str:
    """Engine feature rows → GeoJSON FeatureCollection (snk-export)."""
    feats = []
    for _, r in features_pdf.iterrows():
        coords = [
            [[p["x"], p["y"]] for p in ring] + [[ring[0]["x"], ring[0]["y"]]]
            for ring in r["rings"]
        ]
        props = {"feature_id": r["feature_id"]}
        for a in attrs:
            v = r[a]
            props[a] = v.item() if hasattr(v, "item") else v
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": coords},
                "properties": props,
            }
        )
    doc = {"type": "FeatureCollection", "features": feats}
    with open(path, "w") as f:
        json.dump(doc, f)
    return path

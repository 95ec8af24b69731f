"""Explicit StructType schemas for every engine table, validated on load.

The reference's GeoPandas pipeline infers dtypes from DBF attribute tables
(SURVEY.md §1.1); at 10^12 rows inference is replaced by asserted schemas —
a load that drifts from the declared contract fails fast at the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

XY = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])

RINGS = ArrayType(ArrayType(XY))

IMAGES = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
    ]
)

FEATURES = StructType(
    [
        StructField("feature_id", StringType(), False),
        StructField("rings", RINGS),
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
        StructField("wkt", StringType()),
    ]
)


class SchemaMismatch(ValueError):
    pass


def validate(df: DataFrame, expected: StructType, subset_ok: bool = True) -> DataFrame:
    """Assert df carries the expected columns with the expected types.
    subset_ok: df may have EXTRA columns (attributes vary per feature class);
    the declared ones must match exactly."""
    have = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for f in expected.fields:
        if f.name not in have:
            problems.append(f"missing column {f.name}")
        elif have[f.name] != f.dataType:
            problems.append(
                f"column {f.name}: expected {f.dataType.simpleString()}, "
                f"got {have[f.name].simpleString()}"
            )
    if not subset_ok:
        extra = set(have) - {f.name for f in expected.fields}
        if extra:
            problems.append(f"unexpected columns {sorted(extra)}")
    if problems:
        raise SchemaMismatch("; ".join(problems))
    return df

"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship Lagefaktor pipeline at sf0.001 (cell index →
                 broadcast cover join → exact PIP → distance-band zone →
                 factor scoring).
queries()      — one callable per implemented SURVEY.md §2 operator.
oracle_sql()   — matching DuckDB SQL (omitted for approx / non-SQL ops →
                 rows-only check per the driver contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from lagespark import harness
    from lagespark import harness2  # noqa: F401  (registers wave-2 queries)
    from lagespark import harness3  # noqa: F401  (registers wave-3 queries)
    from lagespark import harness4  # noqa: F401  (registers wave-4 queries)

    return harness


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry().QUERIES["q55-geo-score"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_registry().QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_registry().ORACLES)

"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship Lagefaktor pipeline at sf0.001 (cell index →
                 broadcast cover join → exact PIP → distance-band zone →
                 factor scoring).
queries()      — one callable per implemented SURVEY.md §2 operator.
oracle_sql()   — matching DuckDB SQL (omitted for approx / non-SQL ops →
                 rows-only check per the driver contract).

The lagespark package is shipped to executors via addPyFile on first use so
the contract works regardless of the caller's working directory (local-mode
Python workers do not inherit the driver's sys.path injections).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship lagespark to executor Python workers exactly once per context."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    from tools.make_pyfiles_zip import build

    dest = os.path.join(tempfile.gettempdir(), "lagespark_pyfiles.zip")
    build(dest, _REPO)
    sc.addPyFile(dest)
    _SHIPPED.add(key)


def _registry():
    from lagespark import harness
    from lagespark import harness2  # noqa: F401  (registers wave-2 queries)
    from lagespark import harness3  # noqa: F401  (registers wave-3 queries)
    from lagespark import harness4  # noqa: F401  (registers wave-4 queries)

    return harness


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    return _registry().QUERIES["q55-geo-score"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = _registry()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    # oracle-bearing queries FIRST (registration order preserved within each
    # group) so a budget-limited correctness sweep spends its time on the
    # strongest checks; rows-only entries follow
    names = sorted(reg.QUERIES, key=lambda n: (n not in reg.ORACLES) * 1)
    return {name: wrap(reg.QUERIES[name]) for name in names}


def oracle_sql() -> dict[str, str]:
    return dict(_registry().ORACLES)

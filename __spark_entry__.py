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


# The driver's correctness sweep is budget-capped at ~50 queries and walks
# queries() in iteration order. Union of rounds 1-5 driver-touched all 105
# registered queries (84 oracled all-true + 21 rows-only executed) — see
# VERDICT.md r5. Round-6 rotation (ONE deliberate edit per round, otherwise
# FROZEN): (a) the seven queries whose code paths changed this round (S2
# lattice snap -> q57/q50/q83; q95 single-scan; decontaminate benchmark
# _spread -> q100; lsh_topk skinny bucket join -> q76; intersects_join_ri
# native rect-pair path -> q82) go first so the driver re-proves them,
# preceded by q104 (NEW this round — streaming ingest dedup's
# batch-equivalence form, zero driver evidence yet, hash-green in my own
# sf0.01 gate runs); (b) the five r3-stale overflow survivors; (c) the
# 50-query r4-window set, heavy / rows-only plans first, staleness-refresh.
# 60 entries vs a ~50-slot budget: the LAST ten are deliberate overflow —
# q34/q35 (sort/limit), q36/q37/q38 (set ops), q29-pivot, q46-scalar-date2,
# q47-scalar-map are trivial single-operator plans with pytest coverage and
# 2+ prior all-true driver rows each; q44-scalar-json (displaced by q104)
# likewise holds r1+r4 all-true rows.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- round-6 NEW query: first driver evidence --
    "q104-dedup-ingest-claims",
    # -- round-6 code-touched: re-prove first --
    "q57-geo-s2cell",
    "q50-geo-cell",
    "q83-geo-pip-s2",
    "q95-spatiotemporal-rollup",
    "q100-decontaminate",
    "q76-ann-lsh",
    "q82-geo-intersects-ri",
    # -- last driver-checked in r03 (r5 overflow) --
    "q59b-geo-tile-rect",
    "q91-stream-slide",
    "q02-filter",
    "q01-project",
    "q18-cross",
    # -- last driver-checked in r04: heavy / rows-only plans first --
    "q72b-dedup-minhash-fast",
    "q71b-dedup-lsh-jaccard",
    "q74b-dedup-embed-cosine-lsh",
    "q76b-ann-ivf",
    "q76c-ann-pq",
    "q55-geo-score",
    "q54-geo-knn",
    "q51-geo-pip",
    "q52-geo-zone",
    "q53-geo-range-join",
    "q56-geo-overlay-rect",
    "q66-geo-salted-join",
    "q58-geo-overlay-areas",
    "q59-geo-tile",
    "q60-img-roundtrip",
    "q61-img-decode-stats",
    "q62-img-transcode",
    "q63-img-resize",
    "q69-img-tile-chain",
    "q87-img-arrow-stats",
    "q85-img-phash-dedup",
    "q85b-img-dedup-corpus",
    "q64-multimodal-stub",
    "q64b-multimodal-frames",
    "q65-img-geo-join",
    # -- last driver-checked in r04: relational / scalar --
    "q27-collect",
    "q30-rank",
    "q31-analytic",
    "q32-frame",
    "q33-topk-group",
    "q39-window-extras",
    "q22-agg-approx",
    "q28-percentile-approx",
    "q40-scalar-string",
    "q41-scalar-date",
    "q42-scalar-math",
    "q43-scalar-array",
    "q44-scalar-json",
    "q45-scalar-fuzzy",
    # -- deliberate overflow candidates (see block comment) --
    "q46-scalar-date2",
    "q47-scalar-map",
    "q29-pivot",
    "q34-sort",
    "q35-topk",
    "q36-union",
    "q37-intersect",
    "q38-except",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = _registry()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    # round-4 window: _DRIVER_PRIORITY order first (rows-only entries that
    # have never had a driver row, then the stalest oracled ones);
    # everything else keeps registration order after them
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    names = sorted(reg.QUERIES, key=lambda n: prio.get(n, len(prio)))
    return {name: wrap(reg.QUERIES[name]) for name in names}


def oracle_sql() -> dict[str, str]:
    return dict(_registry().ORACLES)

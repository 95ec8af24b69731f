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
# queries() in iteration order. Union of rounds 1-6 driver-touched all 106
# registered queries (85 oracled all-true + 21 rows-only executed) — see
# VERDICT.md r6. Round-7 rotation (ONE deliberate edit per round, otherwise
# FROZEN), max-staleness-refresh per VERDICT r6 #4: (a) the queries whose
# code paths changed this round go first — q104 (ingest_claims_batch
# self-claim filter + oracle predicate, retention-bounded streaming form),
# q71b/q72b/q72 (dedup.py: decimal-repr bitset rounding, broadcast
# lifecycle, threshold-matched banding defaults; q72 shares the CTE chain),
# q78/q98/q77/q99/q79/q80 (operators/text.py Latin-1 strip set + NULLIF
# punct_ratio, oracles updated in lockstep); (b) the r5-window stale set
# (q03/q04, q10-q17, q19-q21, q23-q26, q44/q45/q48, q70/q71/q73-q75, q81,
# q84, q86, q90, q92-q94, q96/q97, q101-q103); (c) the twice-overflowed
# r4 set rotated IN this round (q29, q34-q38, q46, q47). 55 entries vs a
# ~50-slot budget: the LAST five are deliberate overflow — q03/q04
# (single-filter plans) and q20/q21/q23 (single-agg plans), each with 2+
# prior all-true driver rows (r1/r2/r3/r5) and pytest coverage. Everything
# r6-proven (q01/q02, q18, q27, q30-q33, q39-q43, q50-q59b, q66, q82, q83,
# q95, q100, img/ann rows-only) keeps registration order after the window.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- round-7 NEW query: first driver evidence (rows-only, image
    # contract) — streaming pHash ingest dedup's batch-equivalence form;
    # q80 vacates the window for it (fingerprint_expr is NOT touched by
    # the Latin-1 strip-set change, and q80 holds r5 all-true evidence)
    "q105-img-dedup-ingest",
    # -- round-7 code-touched: re-prove first --
    "q104-dedup-ingest-claims",
    "q71b-dedup-lsh-jaccard",
    "q72b-dedup-minhash-fast",
    "q72-dedup-minhash-lsh",
    "q78-text-quality",
    "q98-text-normalize",
    "q77-text-langid",
    "q99-corpus-stats",
    "q79-text-tokens",
    # -- r5-window stale: heavy / rows-only plans first --
    "q71-dedup-ngram-jaccard",
    "q70-dedup-exact",
    "q73-dedup-simhash",
    "q74-dedup-embed-cosine",
    "q75-ann-topk",
    "q81-dedup-components",
    "q96-dedup-corpus",
    "q97-sample-hash",
    "q101-doc-pack",
    "q102-embed-dedup-corpus",
    "q103-mix-resample",
    "q84-geo-range-rollup",
    "q86-geo-within-dist",
    "q90-stream-tumble",
    "q92-stream-session",
    "q93-stream-geo",
    "q94-stream-stream-join",
    # -- r5-window stale: joins / aggs / scalars --
    "q10-join-inner",
    "q11-join-left",
    "q12-join-semi",
    "q13-join-anti",
    "q14-join-bcast",
    "q15-join-theta",
    "q16-join-range",
    "q17-join-asof",
    "q19-multi-join",
    "q48-subquery-correlated",
    "q24-cube",
    "q25-gsets",
    "q26-percentile",
    "q44-scalar-json",
    "q45-scalar-fuzzy",
    # -- twice-overflowed r4 set, rotated IN this round --
    "q29-pivot",
    "q34-sort",
    "q35-topk",
    "q36-union",
    "q37-intersect",
    "q38-except",
    "q46-scalar-date2",
    "q47-scalar-map",
    # -- deliberate overflow (trivial plans, 2+ prior all-true rows) --
    "q20-agg-basic",
    "q21-agg-distinct",
    "q23-rollup",
    "q03-bbox-filter",
    "q04-exact-pred",
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

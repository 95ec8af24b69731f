"""Closed-form SQL mirrors for the geo operators.

The driver's correctness gate (``__spark_entry__.py``) compares each Spark
query against ANSI SQL run by DuckDB over the same harness tables. Spatial
inputs are therefore SYNTHESIZED from `lineitem` keys with integer arithmetic
that evaluates identically in Spark SQL and DuckDB (same `%`, `/`, `FLOOR`
semantics on positive ints), and the geometry oracles are closed forms:

  * point-in-convex-part  → conjunction of half-plane sign tests
  * polygon distance      → 0 if inside else LEAST over per-segment distances
  * rect ∩ rect area      → GREATEST(0, overlap_x) * GREATEST(0, overlap_y)

so the engine's ray-cast / Sutherland–Hodgman / distance KERNELS (running in
real pandas UDFs) are checked end-to-end against independent SQL math.

Float determinism: both engines use IEEE-754 doubles with identical operator
semantics; coordinates are emitted via repr() (round-trip exact). Zone
thresholds can only disagree within ulps of 100/625 m — synthesized points
sit on a 0.1 m lattice offset by 0.05 m, never at threshold distance.
"""

from __future__ import annotations

import numpy as np

# deterministic point field from lineitem keys — identical text evaluated by
# Spark (selectExpr) and DuckDB (oracle SQL). (l_orderkey, l_linenumber) is
# NOT unique in the harness lineitem, so points are grouped to a unique pid
# with MIN (deterministic in both engines).
PID_EXPR = "l_orderkey * 10 + l_linenumber"
# CAST(... AS DOUBLE) before the division: Spark otherwise parses the `10.0`
# literal as DECIMAL and carries x/y as DecimalType while DuckDB computes in
# DOUBLE — full-precision value hashes then diverge (round-1 q03 failure).
# With the cast, both engines perform identical IEEE-754 double arithmetic.
X_EXPR = "CAST((l_orderkey * 9973 + l_partkey * 131 + l_linenumber * 17) % 100000 AS DOUBLE) / 10.0 + 0.05"
Y_EXPR = "CAST((l_orderkey * 7919 + l_suppkey * 211 + l_linenumber * 13) % 100000 AS DOUBLE) / 10.0 + 0.05"

POINTS_SELECT = (
    "SELECT pid, MIN(x) AS x, MIN(y) AS y FROM ("
    f"SELECT {PID_EXPR} AS pid, {X_EXPR} AS x, {Y_EXPR} AS y FROM lineitem"
    ") GROUP BY pid"
)

# deterministic rect field (for overlay): 50-500 m boxes. Multipliers chosen
# so the modulus wraps even at sf0.001 key ranges (suppkey alone is tiny).
RECT_EXPRS = (
    "l_orderkey * 10 + l_linenumber AS rid",
    "CAST((l_orderkey * 131 + l_partkey * 17) % 95000 AS DOUBLE) / 10.0 AS rx0",
    "CAST((l_orderkey * 283 + l_suppkey * 19 + l_partkey * 7) % 95000 AS DOUBLE) / 10.0 AS ry0",
    "50.0 + CAST(l_partkey % 450 AS DOUBLE) AS rw",
    "50.0 + CAST((l_partkey * 3 + l_suppkey * 11) % 450 AS DOUBLE) AS rh",
)
RECT_SELECT = "SELECT " + ", ".join(RECT_EXPRS) + " FROM lineitem"


def _f(v: float) -> str:
    return repr(float(v))


def halfplane_sql(x: str, y: str, ring: np.ndarray) -> str:
    """Point-inside-CONVEX-ring as a conjunction of cross-product tests.
    Ring must be CCW."""
    terms = []
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        terms.append(
            f"(({_f(x2)} - {_f(x1)}) * ({y} - {_f(y1)}) - "
            f"({_f(y2)} - {_f(y1)}) * ({x} - {_f(x1)})) >= 0"
        )
    return "(" + " AND ".join(terms) + ")"


def seg_dist_sql(x: str, y: str, x1: float, y1: float, x2: float, y2: float) -> str:
    """Distance point→segment: clamp projection parameter to [0,1]."""
    dx, dy = x2 - x1, y2 - y1
    seg2 = dx * dx + dy * dy
    t = (
        f"GREATEST(0.0, LEAST(1.0, (({x} - {_f(x1)}) * {_f(dx)} + "
        f"({y} - {_f(y1)}) * {_f(dy)}) / {_f(seg2)}))"
    )
    return (
        f"SQRT(POWER({x} - ({_f(x1)} + {t} * {_f(dx)}), 2) + "
        f"POWER({y} - ({_f(y1)} + {t} * {_f(dy)}), 2))"
    )


def polygon_dist_sql(
    x: str, y: str, outer: np.ndarray, convex_parts: list[np.ndarray]
) -> str:
    """0 if inside (union of convex parts) else min segment distance to the
    outer ring."""
    inside = " OR ".join(halfplane_sql(x, y, p) for p in convex_parts)
    segs = []
    n = len(outer)
    for i in range(n):
        x1, y1 = outer[i]
        x2, y2 = outer[(i + 1) % n]
        segs.append(seg_dist_sql(x, y, x1, y1, x2, y2))
    return f"(CASE WHEN ({inside}) THEN 0.0 ELSE LEAST({', '.join(segs)}) END)"


def pip_sql(x: str, y: str, convex_parts: list[np.ndarray], holes: list[np.ndarray] = ()) -> str:
    """Inside the union of convex parts and not inside any (convex) hole."""
    inside = "(" + " OR ".join(halfplane_sql(x, y, p) for p in convex_parts) + ")"
    for h in holes:
        inside += f" AND NOT {halfplane_sql(x, y, h)}"
    return "(" + inside + ")"


# -- fixture-specific convex decompositions (FIXTURES.md geometry) -----------


def baufeld_parts() -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """[(outer_ring, convex_parts)] for the three construction polygons,
    matching lagespark.fixtures.baufeld_pdf exactly."""
    from lagespark import fixtures

    rect0 = np.array(fixtures._rect(2000, 2000, 2400, 2250))
    hexg = np.array(fixtures._hexagon(6500, 6500, 300))
    l_outer = np.array(
        [
            [7000.0, 2000.0],
            [7600.0, 2000.0],
            [7600.0, 2200.0],
            [7200.0, 2200.0],
            [7200.0, 2600.0],
            [7000.0, 2600.0],
        ]
    )
    l_parts = [
        np.array(fixtures._rect(7000, 2000, 7600, 2200)),
        np.array(fixtures._rect(7000, 2200, 7200, 2600)),
    ]
    return [(rect0, [rect0]), (hexg, [hexg]), (l_outer, l_parts)]


def zone_case_sql(x: str, y: str, thresholds=(100.0, 625.0)) -> str:
    dists = [polygon_dist_sql(x, y, outer, parts) for outer, parts in baufeld_parts()]
    d = f"LEAST({', '.join(dists)})"
    return (
        f"(CASE WHEN {d} < {_f(thresholds[0])} THEN 0 "
        f"WHEN {d} < {_f(thresholds[1])} THEN 1 ELSE 2 END)"
    )


def gruenflaeche_pip_cases(x: str, y: str) -> list[tuple[str, str]]:
    """[(feature_id, inside_sql)] for every compensatory feature."""
    from lagespark import fixtures

    out = []
    for _, row in fixtures.gruenflaeche_pdf().iterrows():
        rings = [
            np.array([[p["x"], p["y"]] for p in ring]) for ring in row["rings"]
        ]
        outer = rings[0]
        holes = [h[::-1] for h in rings[1:]]  # stored CW → CCW for halfplane
        out.append((row["feature_id"], pip_sql(x, y, [outer], holes)))
    return out

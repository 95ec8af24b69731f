"""Slow, obviously-correct pure-Python geometry oracle (no Spark, no shared
kernel code): scalar point-in-polygon + scalar segment distance + fine-grid
area sampling. Used to validate the engine's overlay/tile semantics
independently of the vectorized numpy kernels (SURVEY.md §5 item 2)."""

from __future__ import annotations

import math


def pip_scalar(x: float, y: float, ring: list[tuple[float, float]]) -> bool:
    """Crossing-number test, written scalar/independent of kernels.geom."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xint:
                inside = not inside
    return inside


def in_polygon(x: float, y: float, rings) -> bool:
    if not pip_scalar(x, y, rings[0]):
        return False
    return not any(pip_scalar(x, y, h) for h in rings[1:])


def seg_dist(x, y, x1, y1, x2, y2) -> float:
    dx, dy = x2 - x1, y2 - y1
    seg2 = dx * dx + dy * dy
    t = 0.0 if seg2 == 0 else max(0.0, min(1.0, ((x - x1) * dx + (y - y1) * dy) / seg2))
    cx, cy = x1 + t * dx, y1 + t * dy
    return math.hypot(x - cx, y - cy)


def poly_dist(x: float, y: float, rings) -> float:
    if in_polygon(x, y, rings):
        return 0.0
    best = math.inf
    for i in range(len(rings[0])):
        x1, y1 = rings[0][i]
        x2, y2 = rings[0][(i + 1) % len(rings[0])]
        best = min(best, seg_dist(x, y, x1, y1, x2, y2))
    # inside a hole → distance to hole boundary
    for h in rings[1:]:
        if pip_scalar(x, y, h):
            best = math.inf
            for i in range(len(h)):
                x1, y1 = h[i]
                x2, y2 = h[(i + 1) % len(h)]
                best = min(best, seg_dist(x, y, x1, y1, x2, y2))
    return best


def zone_of(x: float, y: float, baufeld_rings_list, thresholds=(100.0, 625.0)) -> int:
    d = min(poly_dist(x, y, rings) for rings in baufeld_rings_list)
    for z, t in enumerate(thresholds):
        if d < t:
            return z
    return len(thresholds)


def sampled_zone_areas(
    gf_rings, baufeld_rings_list, biotope, thresholds=(100.0, 625.0), step=2.0
):
    """Fine-grid sampled (zone, bonus) → area for one compensatory feature.
    biotope: list of (rings, bonus). Independent approximation of the
    engine's exact clip areas (tolerance ≈ perimeter × step)."""
    xs = [p[0] for p in gf_rings[0]]
    ys = [p[1] for p in gf_rings[0]]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    acc: dict[tuple[int, float], float] = {}
    cell = step * step
    ny = int((y1 - y0) / step) + 1
    nx = int((x1 - x0) / step) + 1
    for iy in range(ny):
        y = y0 + (iy + 0.5) * step
        for ix in range(nx):
            x = x0 + (ix + 0.5) * step
            if not in_polygon(x, y, gf_rings):
                continue
            z = zone_of(x, y, baufeld_rings_list, thresholds)
            bonus = 1.0
            for bt_rings, b in biotope:
                if in_polygon(x, y, bt_rings):
                    bonus = b
                    break
            key = (z, bonus)
            acc[key] = acc.get(key, 0.0) + cell
    return acc

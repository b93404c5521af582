"""Pole of inaccessibility (the "polylabel" algorithm).

The optimal label anchor for a polygon: the interior point FARTHEST from
every boundary — strictly better than centroid (can fall outside or hug
an edge on L/U shapes) and than point_on_surface (on the surface but not
clearance-maximizing). Standard in modern map renderers; the reference
ships centroid/pointOnSurface only (FeatureCollector emitters), so this
is a beyond-reference label-placement addition exposed as the
`polylabel` geometry form (tiling/explode._resolve_form, F9 family).

Algorithm (published by Mapbox, 2016 — quadtree cell refinement with a
best-first priority queue; written from the algorithm description, no
code consulted):

  1. signed distance d(p) = (+ inside / − outside) min distance from p
     to any polygon segment (even-odd membership, holes included);
  2. cover the bbox with square cells; each cell's POTENTIAL is
     d(center) + radius (the best any point inside it could achieve);
  3. pop the highest-potential cell; if its potential can't beat the
     best-so-far by more than `precision`, prune; else split into 4.

Runs per polygon inside the existing Arrow decode pass (numpy segment
math, a python heap over O(log(size/precision)) cells) — no Spark-side
cost model change; at 100 TB it rides the same per-feature map as every
other form resolver.
"""

from __future__ import annotations

import heapq

import numpy as np


def _rings_of(geom):
    kind, data = geom
    if kind == "Polygon":
        return [np.asarray(r, dtype=np.float64) for r in data]
    if kind == "MultiPolygon":
        # label the biggest outer-ring polygon (planetiler labels each
        # part separately only when asked; one anchor is the common case)
        from .ops import ring_signed_area

        best = max(data, key=lambda rings: abs(ring_signed_area(np.asarray(rings[0]))))
        return [np.asarray(r, dtype=np.float64) for r in best]
    raise ValueError(f"polylabel needs a polygon, got {kind}")


def _signed_distance(x: float, y: float, rings) -> float:
    """+min-distance-to-boundary if (x, y) is inside (even-odd), else −."""
    inside = False
    d2 = np.inf
    for ring in rings:
        ax, ay = ring[:-1, 0], ring[:-1, 1]
        bx, by = ring[1:, 0], ring[1:, 1]
        # even-odd crossing test, vectorized per ring
        cond = (ay > y) != (by > y)
        if cond.any():
            xs = ax[cond] + (y - ay[cond]) * (bx[cond] - ax[cond]) / (
                by[cond] - ay[cond]
            )
            inside ^= bool(np.count_nonzero(xs > x) & 1)
        # min squared distance to the ring's segments
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        px, py = x - ax, y - ay
        t = np.where(seg2 > 0, (px * dx + py * dy) / np.where(seg2 > 0, seg2, 1.0), 0.0)
        np.clip(t, 0.0, 1.0, out=t)
        ex = px - t * dx
        ey = py - t * dy
        d2 = min(d2, float(np.min(ex * ex + ey * ey)))
    d = float(np.sqrt(d2))
    return d if inside else -d


def polylabel(geom, precision: float | None = None,
              max_cells: int = 200_000) -> tuple[float, float]:
    """Returns (x, y) of the pole of inaccessibility.

    `precision` defaults to bbox_diagonal/1000 — sub-pixel at any zoom
    the polygon is visible. Deterministic: ties in the heap break on
    insertion order, and the cell walk is a pure function of the
    polygon. `max_cells` bounds the refinement frontier (it grows as
    O(perimeter/precision) on sliver shapes): past the budget the
    best-so-far anchor returns — still inside, just not refined to the
    requested precision — so one pathological ring can never stall an
    executor task. The cap is deterministic (same traversal prefix)."""
    rings = _rings_of(geom)
    outer = rings[0]
    minx, miny = outer.min(axis=0)
    maxx, maxy = outer.max(axis=0)
    w, h = maxx - minx, maxy - miny
    size = min(w, h)
    if size == 0:  # degenerate: flat polygon — midpoint of the bbox
        return (float((minx + maxx) / 2), float((miny + maxy) / 2))
    # sliver guard: a square grid at min(w, h) explodes on high-aspect
    # polygons (a 10 deg x 1e-4 deg riverbank ring would seed 100,000
    # cells); coarsening the initial square size keeps the seed grid
    # <= ~64 cells along the long axis — the potential bound holds for
    # ANY square cell size and refinement recovers the precision
    size = max(size, max(w, h) / 64.0)
    if precision is None:
        precision = float(np.hypot(w, h)) / 1000.0

    def cell(cx, cy, half):
        d = _signed_distance(cx, cy, rings)
        return (-(d + half * np.sqrt(2.0)), d, cx, cy, half)

    heap = []
    seq = 0  # tie-break: heap entries are (-potential, seq, ...)
    half = size / 2.0
    x = minx
    while x < maxx:
        y = miny
        while y < maxy:
            p = cell(x + half, y + half, half)
            heap.append((p[0], seq, p))
            seq += 1
            y += size
        x += size
    heapq.heapify(heap)

    # seeds: centroid + bbox center (the classic accelerators)
    from .ops import centroid

    cx, cy = centroid(geom)
    best_d = _signed_distance(float(cx), float(cy), rings)
    best = (float(cx), float(cy))
    bd = _signed_distance((minx + maxx) / 2, (miny + maxy) / 2, rings)
    if bd > best_d:
        best_d = bd
        best = ((minx + maxx) / 2, (miny + maxy) / 2)

    while heap:
        _, _, (negpot, d, cx, cy, half) = heapq.heappop(heap)
        if d > best_d:
            best_d = d
            best = (cx, cy)
        if seq >= max_cells or -negpot - best_d <= precision:
            continue
        half /= 2.0
        for nx in (cx - half, cx + half):
            for ny in (cy - half, cy + half):
                p = cell(nx, ny, half)
                heapq.heappush(heap, (p[0], seq, p))
                seq += 1
    return (float(best[0]), float(best[1]))

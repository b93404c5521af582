"""Computational-geometry primitives (pure numpy, deterministic).

Parity targets (reference, /root/reference):
  - area/length/centroid/pointOnSurface/centroidIfConvex: planetiler
    SourceFeature + FeatureCollector emitters used by e.g.
    layers/Poi.java:262, layers/Place.java:286-301, layers/Housenumber.java:135
  - simplify: per-zoom tolerance (README.md:33 --simplify-tolerance)
  - box clipping: tile render clip to 256px+buffer
  - line_merge: FeatureMerge.mergeLineStrings connectivity step
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- area/length


def ring_signed_area(ring: np.ndarray) -> float:
    # shoelace via slicing + explicit wrap term: np.roll allocated two
    # copies per call and dominated hot merge kernels at ~100k tiny rings
    x, y = ring[:, 0], ring[:, 1]
    s = np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])
    s += x[-1] * y[0] - x[0] * y[-1]
    return 0.5 * float(s)


def polygon_area(rings) -> float:
    """Outer ring first; holes subtract. Orientation-insensitive."""
    if not len(rings):
        return 0.0
    area = abs(ring_signed_area(rings[0]))
    for hole in rings[1:]:
        area -= abs(ring_signed_area(hole))
    return max(area, 0.0)


def geom_area(geom) -> float:
    kind, data = geom
    if kind == "Polygon":
        return polygon_area(data)
    if kind == "MultiPolygon":
        return sum(polygon_area(rings) for rings in data)
    return 0.0


def line_length(coords: np.ndarray) -> float:
    d = np.diff(np.asarray(coords, dtype=np.float64), axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def geom_length(geom) -> float:
    kind, data = geom
    if kind == "LineString":
        return line_length(data)
    if kind == "MultiLineString":
        return sum(line_length(l) for l in data)
    if kind == "Polygon":
        return sum(line_length(r) for r in data)
    if kind == "MultiPolygon":
        return sum(line_length(r) for rings in data for r in rings)
    return 0.0


def bbox(geom):
    kind, data = geom
    if kind == "Point":
        return float(data[0]), float(data[1]), float(data[0]), float(data[1])
    pts = _all_coords(geom)
    return (
        float(pts[:, 0].min()), float(pts[:, 1].min()),
        float(pts[:, 0].max()), float(pts[:, 1].max()),
    )


def _all_coords(geom) -> np.ndarray:
    kind, data = geom
    if kind == "Point":
        return np.asarray(data, dtype=np.float64).reshape(1, 2)
    if kind in ("LineString", "MultiPoint"):
        return np.asarray(data, dtype=np.float64)
    if kind in ("Polygon", "MultiLineString"):
        return np.concatenate([np.asarray(p) for p in data])
    if kind == "MultiPolygon":
        return np.concatenate([np.asarray(r) for rings in data for r in rings])
    if kind == "GeometryCollection":
        return np.concatenate([_all_coords(g) for g in data])
    raise ValueError(kind)


# ------------------------------------------------------------------ centroids


def ring_centroid(ring: np.ndarray):
    x, y = ring[:, 0], ring[:, 1]
    cross = x * np.roll(y, -1) - np.roll(x, -1) * y
    a = np.sum(cross) / 2.0
    if abs(a) < 1e-18:
        return np.mean(ring[:-1], axis=0), 0.0
    cx = np.sum((x + np.roll(x, -1)) * cross) / (6 * a)
    cy = np.sum((y + np.roll(y, -1)) * cross) / (6 * a)
    return np.array([cx, cy]), a


def centroid(geom) -> np.ndarray:
    kind, data = geom
    if kind == "Point":
        return np.asarray(data, dtype=np.float64)
    if kind == "MultiPoint":
        return np.mean(np.asarray(data, dtype=np.float64), axis=0)
    if kind == "LineString":
        return _line_centroid([data])
    if kind == "MultiLineString":
        return _line_centroid(data)
    if kind == "Polygon":
        return _poly_centroid([data])
    if kind == "MultiPolygon":
        return _poly_centroid(data)
    if kind == "GeometryCollection":
        return np.mean([centroid(g) for g in data], axis=0)
    raise ValueError(kind)


def _line_centroid(lines) -> np.ndarray:
    num = np.zeros(2)
    den = 0.0
    for coords in lines:
        coords = np.asarray(coords, dtype=np.float64)
        d = np.diff(coords, axis=0)
        seg_len = np.hypot(d[:, 0], d[:, 1])
        mids = (coords[:-1] + coords[1:]) / 2.0
        num += np.sum(mids * seg_len[:, None], axis=0)
        den += float(np.sum(seg_len))
    if den == 0:
        return np.mean(np.concatenate([np.asarray(l) for l in lines]), axis=0)
    return num / den


def _poly_centroid(polys) -> np.ndarray:
    num = np.zeros(2)
    den = 0.0
    for rings in polys:
        # outer ring adds, holes subtract (sign from orientation-normalized area)
        oc, oa = ring_centroid(np.asarray(rings[0], dtype=np.float64))
        num += oc * abs(oa)
        den += abs(oa)
        for hole in rings[1:]:
            hc, ha = ring_centroid(np.asarray(hole, dtype=np.float64))
            num -= hc * abs(ha)
            den -= abs(ha)
    if den <= 1e-18:
        return np.mean(np.concatenate([np.asarray(r) for rings in polys for r in rings]), axis=0)
    return num / den


def point_in_ring(pt, ring: np.ndarray) -> bool:
    """Even-odd rule."""
    x, y = float(pt[0]), float(pt[1])
    rx, ry = ring[:, 0], ring[:, 1]
    x1, y1 = rx[:-1], ry[:-1]
    x2, y2 = rx[1:], ry[1:]
    cond = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    return int(np.count_nonzero(cond & (x < xin))) % 2 == 1


def point_in_polygon(pt, rings) -> bool:
    if not point_in_ring(pt, np.asarray(rings[0])):
        return False
    for hole in rings[1:]:
        if point_in_ring(pt, np.asarray(hole)):
            return False
    return True


def point_in_geom(pt, geom) -> bool:
    kind, data = geom
    if kind == "Polygon":
        return point_in_polygon(pt, data)
    if kind == "MultiPolygon":
        return any(point_in_polygon(pt, rings) for rings in data)
    return False


def point_on_surface(geom) -> np.ndarray:
    """Midpoint of the widest interior interval on the horizontal bisector
    (JTS InteriorPointArea approach)."""
    kind, data = geom
    if kind in ("Point", "MultiPoint", "LineString", "MultiLineString"):
        if kind == "Point":
            return np.asarray(data, dtype=np.float64)
        if kind == "MultiPoint":
            return np.asarray(data[0], dtype=np.float64)
        if kind == "LineString":
            return np.asarray(data[len(data) // 2], dtype=np.float64)
        return np.asarray(data[0][len(data[0]) // 2], dtype=np.float64)
    polys = data if kind == "MultiPolygon" else [data]
    best, best_w = None, -1.0
    for rings in polys:
        outer = np.asarray(rings[0], dtype=np.float64)
        ymin, ymax = outer[:, 1].min(), outer[:, 1].max()
        y = (ymin + ymax) / 2.0
        # nudge off vertices to avoid degenerate crossings
        if np.any(np.isclose(outer[:, 1], y, rtol=0, atol=1e-15)):
            y = np.nextafter(y, ymax)
        xs = []
        for ring in rings:
            ring = np.asarray(ring, dtype=np.float64)
            x1, y1 = ring[:-1, 0], ring[:-1, 1]
            x2, y2 = ring[1:, 0], ring[1:, 1]
            cond = (y1 > y) != (y2 > y)
            if np.any(cond):
                xi = x1[cond] + (y - y1[cond]) * (x2[cond] - x1[cond]) / (y2[cond] - y1[cond])
                xs.append(xi)
        if not xs:
            c, _ = ring_centroid(outer)
            if best is None:
                best = c
            continue
        xs = np.sort(np.concatenate(xs))
        for i in range(0, len(xs) - 1, 2):
            w = xs[i + 1] - xs[i]
            if w > best_w:
                best_w = w
                best = np.array([(xs[i] + xs[i + 1]) / 2.0, y])
    return best if best is not None else centroid(geom)


def is_convex(geom) -> bool:
    """True if single outer ring with consistent turn direction (Poi.java:262 /
    Housenumber.java:135 centroidIfConvex semantics)."""
    kind, data = geom
    if kind == "Polygon":
        if len(data) > 1:
            return False
        ring = np.asarray(data[0], dtype=np.float64)
    elif kind == "MultiPolygon":
        if len(data) != 1 or len(data[0]) > 1:
            return False
        ring = np.asarray(data[0][0], dtype=np.float64)
    else:
        return False
    d = np.diff(ring, axis=0)
    cross = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    # include wraparound turn
    wrap = d[-1, 0] * d[0, 1] - d[-1, 1] * d[0, 0]
    cross = np.append(cross, wrap)
    pos = np.any(cross > 1e-18)
    neg = np.any(cross < -1e-18)
    return not (pos and neg)


def centroid_if_convex(geom) -> np.ndarray:
    return centroid(geom) if is_convex(geom) else point_on_surface(geom)


# ------------------------------------------------------------------- simplify


def _dp_scalar(coords: np.ndarray, n: int, tol2: float) -> np.ndarray:
    """Scalar DP for short lines: bit-identical to the numpy path (same
    expression order per IEEE-754, same first-max tie rule) but without
    per-call ndarray-temporary overhead — the merge kernels simplify tens
    of thousands of 3-10 point segments per tile, where numpy setup costs
    ~50x the arithmetic."""
    xs = coords[:, 0].tolist()
    ys = coords[:, 1].tolist()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        xi, yi, sx, sy = xs[i], ys[i], xs[j] - xs[i], ys[j] - ys[i]
        seg_len2 = sx * sx + sy * sy
        best = -1.0
        bk = -1
        for k in range(i + 1, j):
            dx, dy = xs[k] - xi, ys[k] - yi
            if seg_len2 == 0:
                d2 = dx * dx + dy * dy
            else:
                t = (dx * sx + dy * sy) / seg_len2
                if t < 0.0:
                    t = 0.0
                elif t > 1.0:
                    t = 1.0
                ex, ey = xs[k] - (xi + t * sx), ys[k] - (yi + t * sy)
                d2 = ex * ex + ey * ey
            if d2 > best:
                best = d2
                bk = k
        if best > tol2:
            keep[bk] = True
            stack.append((i, bk))
            stack.append((bk, j))
    return coords[keep]


def douglas_peucker(coords: np.ndarray, tol: float) -> np.ndarray:
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n <= 2 or tol <= 0:
        return coords
    if n <= 16:
        return _dp_scalar(coords, n, tol * tol)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    tol2 = tol * tol
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = coords[j] - coords[i]
        seg_len2 = seg @ seg
        pts = coords[i + 1 : j]
        if seg_len2 == 0:
            d2 = np.sum((pts - coords[i]) ** 2, axis=1)
        else:
            t = np.clip(((pts - coords[i]) @ seg) / seg_len2, 0, 1)
            proj = coords[i] + t[:, None] * seg
            d2 = np.sum((pts - proj) ** 2, axis=1)
        k = int(np.argmax(d2))
        if d2[k] > tol2:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return coords[keep]


def dp_thresholds(coords: np.ndarray) -> np.ndarray:
    """Per-vertex Douglas-Peucker retention thresholds (squared distances).

    thr2[v] = largest tol² for which DP(tol) still keeps vertex v, with
    child thresholds clamped to their parent's so that
    ``coords[thr2 > tol*tol]`` reproduces ``douglas_peucker(coords, tol)``
    EXACTLY for every tol (same strict comparison, same tie behavior).
    Endpoints get +inf. Computing this once per geometry turns the per-zoom
    simplify in the tile render stage into a boolean filter.
    """
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    thr2 = np.full(n, np.inf)
    if n <= 2:
        return thr2
    x = coords[:, 0]
    y = coords[:, 1]
    xl = x.tolist()
    yl = y.tolist()
    out = thr2.tolist()
    stack = [(0, n - 1, np.inf)]
    while stack:
        i, j, parent = stack.pop()
        if j <= i + 1:
            continue
        ax = xl[i]
        ay = yl[i]
        dx = xl[j] - ax
        dy = yl[j] - ay
        seg2 = dx * dx + dy * dy
        if j - i <= 17:
            # scalar path on Python floats: the typical ring here is 3-8
            # vertices, where numpy slice/argmax overhead dominates the
            # arithmetic ~10:1 (profiled: #2 cost of the render stage)
            best = -1.0
            k = i + 1
            for m in range(i + 1, j):
                px = xl[m] - ax
                py = yl[m] - ay
                if seg2 > 0.0:
                    t = (px * dx + py * dy) / seg2
                    if t < 0.0:
                        t = 0.0
                    elif t > 1.0:
                        t = 1.0
                    ddx = px - t * dx
                    ddy = py - t * dy
                else:
                    ddx = px
                    ddy = py
                d2 = ddx * ddx + ddy * ddy
                if d2 > best:
                    best = d2
                    k = m
            v = best if best < parent else parent
        else:
            px = x[i + 1 : j]
            py = y[i + 1 : j]
            if seg2 == 0:
                ddx = px - ax
                ddy = py - ay
                d2 = ddx * ddx + ddy * ddy
            else:
                t = ((px - ax) * dx + (py - ay) * dy) / seg2
                np.clip(t, 0.0, 1.0, out=t)
                ddx = px - (ax + t * dx)
                ddy = py - (ay + t * dy)
                d2 = ddx * ddx + ddy * ddy
            kk = int(np.argmax(d2))
            v = min(float(d2[kk]), parent)
            k = i + 1 + kk
        out[k] = v
        stack.append((i, k, v))
        stack.append((k, j, v))
    return np.asarray(out)


def dp_filter(coords: np.ndarray, thr2: np.ndarray, tol: float) -> np.ndarray:
    """Simplify using precomputed dp_thresholds (== douglas_peucker(coords, tol))."""
    if tol <= 0:
        return np.asarray(coords, dtype=np.float64)
    return np.asarray(coords, dtype=np.float64)[thr2 > tol * tol]


def vw_thresholds(coords: np.ndarray) -> np.ndarray:
    """Per-vertex Visvalingam-Whyatt retention thresholds (effective
    triangle areas, VW 1993).

    thr[v] = the vertex's EFFECTIVE area: its triangle area at removal
    time, clamped monotone non-decreasing along the removal order (the
    standard VW trick), so that ``coords[thr > tol*tol]`` reproduces the
    classic iterative algorithm — remove the least-area vertex, recompute
    its neighbours, repeat while the minimum area is <= tol² — EXACTLY
    for every tol. Endpoints get +inf.

    Same storage contract as dp_thresholds, so the tile render's
    per-zoom boolean filter (`simplify_with_thresholds`) works unchanged
    and the algorithm choice costs nothing at cut time. VW's area
    criterion keeps cartographically dominant bends where DP's offset
    criterion keeps long-offset spikes — the cartography-standard
    alternative (mapshaper's default); tolerance stays in px, mapped to
    the conventional area threshold tol².

    Written from the published algorithm (Visvalingam & Whyatt 1993,
    "Line generalisation by repeated elimination of points"); no
    reference code consulted."""
    import heapq

    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    thr = np.full(n, np.inf)
    if n <= 2:
        return thr
    xs = coords[:, 0].tolist()
    ys = coords[:, 1].tolist()
    prv = list(range(-1, n - 1))
    nxt = list(range(1, n + 1))

    def tri(i: int) -> float:
        a, b = prv[i], nxt[i]
        return 0.5 * abs(
            (xs[b] - xs[a]) * (ys[i] - ys[a])
            - (xs[i] - xs[a]) * (ys[b] - ys[a])
        )

    cur = [0.0] * n
    heap = []
    for i in range(1, n - 1):
        cur[i] = tri(i)
        heap.append((cur[i], i))
    heapq.heapify(heap)
    removed = [False] * n
    last = 0.0
    while heap:
        a, i = heapq.heappop(heap)
        if removed[i] or a != cur[i]:
            continue  # stale entry (area was recomputed after push)
        last = a if a > last else last  # monotone clamp
        thr[i] = last
        removed[i] = True
        p, q = prv[i], nxt[i]
        nxt[p] = q
        prv[q] = p
        for j in (p, q):
            if 0 < j < n - 1 and not removed[j]:
                cur[j] = tri(j)
                heapq.heappush(heap, (cur[j], j))
    return thr


def geom_vw_thresholds(geom):
    """vw_thresholds per component, mirroring geom_dp_thresholds."""
    kind, data = geom
    if kind in ("Point", "MultiPoint"):
        return None
    if kind == "LineString":
        return vw_thresholds(data)
    if kind in ("MultiLineString", "Polygon"):
        return [vw_thresholds(np.asarray(c)) for c in data]
    if kind == "MultiPolygon":
        return [[vw_thresholds(np.asarray(r)) for r in rings] for rings in data]
    return None


def simplify(geom, tol: float):
    if tol <= 0:
        return geom
    kind, data = geom
    if kind in ("Point", "MultiPoint"):
        return geom
    if kind == "LineString":
        return ("LineString", douglas_peucker(data, tol))
    if kind == "MultiLineString":
        return ("MultiLineString", [douglas_peucker(l, tol) for l in data])
    if kind == "Polygon":
        rings = _simplify_rings(data, tol)
        return ("Polygon", rings) if rings else None
    if kind == "MultiPolygon":
        polys = [r for r in (_simplify_rings(rings, tol) for rings in data) if r]
        return ("MultiPolygon", polys) if polys else None
    return geom


def geom_dp_thresholds(geom):
    """dp_thresholds per component, mirroring the geometry's structure."""
    kind, data = geom
    if kind in ("Point", "MultiPoint"):
        return None
    if kind == "LineString":
        return dp_thresholds(data)
    if kind in ("MultiLineString", "Polygon"):
        return [dp_thresholds(np.asarray(c)) for c in data]
    if kind == "MultiPolygon":
        return [[dp_thresholds(np.asarray(r)) for r in rings] for rings in data]
    return None


def simplify_with_thresholds(geom, thrs, tol: float):
    """simplify() via precomputed geom_dp_thresholds (identical output)."""
    if tol <= 0 or thrs is None:
        return geom
    kind, data = geom
    if kind == "LineString":
        return ("LineString", dp_filter(data, thrs, tol))
    if kind == "MultiLineString":
        return ("MultiLineString", [dp_filter(l, t, tol) for l, t in zip(data, thrs)])
    if kind == "Polygon":
        rings = _filter_rings(data, thrs, tol)
        return ("Polygon", rings) if rings else None
    if kind == "MultiPolygon":
        polys = [r for r in (_filter_rings(rs, ts, tol) for rs, ts in zip(data, thrs)) if r]
        return ("MultiPolygon", polys) if polys else None
    return geom


def _filter_rings(rings, thrs, tol):
    out = []
    for i, (ring, t) in enumerate(zip(rings, thrs)):
        s = dp_filter(ring, t, tol)
        if len(s) >= 4:
            out.append(s)
        elif i == 0:
            return []  # outer ring collapsed → drop polygon
    return out


def _simplify_rings(rings, tol):
    out = []
    for i, ring in enumerate(rings):
        s = douglas_peucker(np.asarray(ring), tol)
        if len(s) >= 4:
            out.append(s)
        elif i == 0:
            return []  # outer ring collapsed → drop polygon
    return out


# ------------------------------------------------------------------- clipping


def clip_ring_box(ring: np.ndarray, xmin, ymin, xmax, ymax) -> np.ndarray | None:
    """Sutherland-Hodgman polygon clip against an axis box (exact, convex clip).

    Fully vectorized per clip edge: emission counts per vertex (1 if inside,
    +1 if the outgoing segment crosses the edge) are scattered into a
    preallocated output via cumsum positions — no per-vertex Python loop.
    """
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) > 1 and pts[0, 0] == pts[-1, 0] and pts[0, 1] == pts[-1, 1]:
        pts = pts[:-1]
    # fast path: ring fully inside the box → untouched
    x, y = pts[:, 0], pts[:, 1]
    if (
        len(pts) >= 3
        and x.min() >= xmin
        and x.max() <= xmax
        and y.min() >= ymin
        and y.max() <= ymax
    ):
        return np.vstack([pts, pts[:1]])
    for edge in range(4):
        if len(pts) < 3:
            return None
        x = pts[:, 0]
        y = pts[:, 1]
        if edge == 0:
            ins = x >= xmin
        elif edge == 1:
            ins = x <= xmax
        elif edge == 2:
            ins = y >= ymin
        else:
            ins = y <= ymax
        if ins.all():
            continue
        nxt_in = np.concatenate([ins[1:], ins[:1]])
        cross = ins != nxt_in
        counts = ins.astype(np.intp) + cross
        total = int(counts.sum())
        if total == 0:
            return None
        starts = np.cumsum(counts) - counts
        out = np.empty((total, 2), dtype=np.float64)
        out[starts[ins]] = pts[ins]
        ci = np.nonzero(cross)[0]
        if len(ci):
            p = pts[ci]
            q = pts[(ci + 1) % len(pts)]
            if edge < 2:
                val = xmin if edge == 0 else xmax
                t = (val - p[:, 0]) / (q[:, 0] - p[:, 0])
                ipts = np.column_stack(
                    [np.full(len(ci), float(val)), p[:, 1] + t * (q[:, 1] - p[:, 1])]
                )
            else:
                val = ymin if edge == 2 else ymax
                t = (val - p[:, 1]) / (q[:, 1] - p[:, 1])
                ipts = np.column_stack(
                    [p[:, 0] + t * (q[:, 0] - p[:, 0]), np.full(len(ci), float(val))]
                )
            out[starts[ci] + ins[ci]] = ipts
        pts = out
    if len(pts) < 3:
        return None
    return np.vstack([pts, pts[:1]])



def clip_line_box(coords: np.ndarray, xmin, ymin, xmax, ymax) -> list[np.ndarray]:
    """Liang-Barsky vectorized over all segments, re-joining consecutive
    kept pieces. The only Python loop is over the resulting pieces."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return []
    # fast path: fully inside
    x, y = coords[:, 0], coords[:, 1]
    if x.min() >= xmin and x.max() <= xmax and y.min() >= ymin and y.max() <= ymax:
        return [coords]
    p = coords[:-1]
    q = coords[1:]
    d = q - p
    t0 = np.zeros(len(p))
    t1 = np.ones(len(p))
    reject = np.zeros(len(p), dtype=bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        for pi, qi in (
            (-d[:, 0], p[:, 0] - xmin),
            (d[:, 0], xmax - p[:, 0]),
            (-d[:, 1], p[:, 1] - ymin),
            (d[:, 1], ymax - p[:, 1]),
        ):
            r = qi / pi
            neg = pi < 0
            pos = pi > 0
            zero = pi == 0
            reject |= zero & (qi < 0)
            t0 = np.where(neg, np.maximum(t0, r), t0)
            t1 = np.where(pos, np.minimum(t1, r), t1)
    keep = ~reject & (t0 <= t1)
    if not keep.any():
        return []
    ki = np.nonzero(keep)[0]
    a = p[ki] + t0[ki, None] * d[ki]
    b = p[ki] + t1[ki, None] * d[ki]
    # a new piece starts where the previous segment was dropped or the
    # clipped endpoints don't chain (segment exited and re-entered the box)
    if len(ki) == 1:
        starts = np.array([True])
    else:
        contig = ki[1:] == ki[:-1] + 1
        chains = (np.abs(a[1:] - b[:-1]) <= 1e-12).all(axis=1)
        starts = np.concatenate([[True], ~(contig & chains)])
    pieces: list[np.ndarray] = []
    bounds = np.nonzero(starts)[0].tolist() + [len(ki)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        # piece = a[s], b[s..e-1]
        pieces.append(np.vstack([a[s : s + 1], b[s:e]]))
    return pieces



def clip_geom_box(geom, xmin, ymin, xmax, ymax):
    """Clip any geometry to a box; returns geometry or None."""
    kind, data = geom
    if kind == "Point":
        x, y = data
        return geom if xmin <= x <= xmax and ymin <= y <= ymax else None
    if kind == "MultiPoint":
        pts = np.asarray(data)
        m = (pts[:, 0] >= xmin) & (pts[:, 0] <= xmax) & (pts[:, 1] >= ymin) & (pts[:, 1] <= ymax)
        if not m.any():
            return None
        kept = pts[m]
        return ("Point", kept[0]) if len(kept) == 1 else ("MultiPoint", kept)
    if kind == "LineString":
        pieces = clip_line_box(data, xmin, ymin, xmax, ymax)
        if not pieces:
            return None
        return ("LineString", pieces[0]) if len(pieces) == 1 else ("MultiLineString", pieces)
    if kind == "MultiLineString":
        pieces = [p for l in data for p in clip_line_box(l, xmin, ymin, xmax, ymax)]
        if not pieces:
            return None
        return ("LineString", pieces[0]) if len(pieces) == 1 else ("MultiLineString", pieces)
    if kind == "Polygon":
        rings = _clip_poly_rings(data, xmin, ymin, xmax, ymax)
        return ("Polygon", rings) if rings else None
    if kind == "MultiPolygon":
        polys = [r for rings in data if (r := _clip_poly_rings(rings, xmin, ymin, xmax, ymax))]
        if not polys:
            return None
        return ("Polygon", polys[0]) if len(polys) == 1 else ("MultiPolygon", polys)
    return None


def _clip_poly_rings(rings, xmin, ymin, xmax, ymax):
    outer = clip_ring_box(np.asarray(rings[0]), xmin, ymin, xmax, ymax)
    if outer is None:
        return None
    out = [outer]
    for hole in rings[1:]:
        h = clip_ring_box(np.asarray(hole), xmin, ymin, xmax, ymax)
        if h is not None:
            out.append(h)
    return out


# ----------------------------------------------------------------- line merge


def merge_lines(lines: list[np.ndarray], quantum: float = 1e-9) -> list[np.ndarray]:
    """Node connected linestrings end-to-end (FeatureMerge.mergeLineStrings
    connectivity semantics: join only at degree-2 shared endpoints).
    Deterministic: inputs processed in given order, endpoints quantized."""

    def key(pt):
        # float() first: round() on a raw C double skips the ndarray
        # scalar protocol (~3x — this runs 8x per input line)
        return (
            round(float(pt[0]) / quantum),
            round(float(pt[1]) / quantum),
        )

    lines = [np.asarray(l, dtype=np.float64) for l in lines if len(l) >= 2]
    endpoints: dict[tuple, list[tuple[int, bool]]] = {}
    for idx, l in enumerate(lines):
        endpoints.setdefault(key(l[0]), []).append((idx, False))
        endpoints.setdefault(key(l[-1]), []).append((idx, True))
    used = [False] * len(lines)
    out = []
    for idx in range(len(lines)):
        if used[idx]:
            continue
        used[idx] = True
        chain = list(lines[idx])
        # extend forward
        for reverse_dir in (False, True):
            while True:
                end = chain[-1] if not reverse_dir else chain[0]
                cands = [
                    (j, at_end) for (j, at_end) in endpoints.get(key(end), [])
                    if not used[j]
                ]
                if len(cands) != 1 or len(endpoints.get(key(end), [])) != 2:
                    break
                j, at_end = cands[0]
                used[j] = True
                seg = lines[j][::-1] if at_end else lines[j]
                if not reverse_dir:
                    chain.extend(seg[1:])
                else:
                    chain = list(seg[::-1][:-1]) + chain
        out.append(np.array(chain))
    return out


# ---------------------------------------------------------------- dist / misc


def point_seg_dist2(pt, a, b) -> float:
    pt, a, b = np.asarray(pt, float), np.asarray(a, float), np.asarray(b, float)
    seg = b - a
    L2 = float(seg @ seg)
    if L2 == 0:
        d = pt - a
        return float(d @ d)
    t = max(0.0, min(1.0, float((pt - a) @ seg) / L2))
    d = pt - (a + t * seg)
    return float(d @ d)


def point_geom_dist(pt, geom) -> float:
    kind, data = geom
    if kind == "Point":
        return float(np.hypot(*(np.asarray(pt) - np.asarray(data))))
    if point_in_geom(pt, geom):
        return 0.0
    best = np.inf
    if kind in ("Polygon", "MultiPolygon", "LineString", "MultiLineString"):
        lines = (
            [data] if kind == "LineString"
            else data if kind == "MultiLineString"
            else data if kind == "Polygon"
            else [r for rings in data for r in rings]
        )
        for coords in lines:
            coords = np.asarray(coords)
            for i in range(len(coords) - 1):
                best = min(best, point_seg_dist2(pt, coords[i], coords[i + 1]))
        return float(np.sqrt(best))
    if kind == "MultiPoint":
        d = np.asarray(data) - np.asarray(pt)
        return float(np.min(np.hypot(d[:, 0], d[:, 1])))
    raise ValueError(kind)


# ------------------------------------------------------- boundary helpers


def point_along_offset(coords: np.ndarray, ratio: float, offset: float) -> np.ndarray:
    """Point at `ratio` along the line, offset perpendicular by `offset`
    (JTS LengthIndexedLine.extractPoint(index, offset) convention: positive
    offset = left of travel direction in y-up coords; our world coords are
    y-down, so positive offset lands on the RIGHT bank — matching the
    reference's usage in Boundary.getBorderingRegions)."""
    coords = np.asarray(coords, dtype=np.float64)
    segs = np.diff(coords, axis=0)
    seglen = np.hypot(segs[:, 0], segs[:, 1])
    total = seglen.sum()
    if total == 0:
        return coords[0].copy()
    target = ratio * total
    acc = 0.0
    for i, L in enumerate(seglen):
        if acc + L >= target or i == len(seglen) - 1:
            t = 0.0 if L == 0 else (target - acc) / L
            base = coords[i] + t * segs[i]
            if L == 0:
                return base
            d = segs[i] / L
            normal = np.array([-d[1], d[0]])  # left in y-up == right in y-down
            return base + offset * normal
        acc += L
    return coords[-1].copy()


def polygonize_lines(lines: list[np.ndarray], quantum: float = 1e-9):
    """JTS Polygonizer equivalent for merged boundary rings: node lines
    end-to-end, keep closed chains as polygon rings, assemble with holes."""
    merged = merge_lines(lines, quantum=quantum)
    rings = []
    for chain in merged:
        if len(chain) >= 4 and np.allclose(chain[0], chain[-1], atol=quantum):
            rings.append(np.asarray(chain))
    if not rings:
        return None
    # nest by containment depth (ring orientation is arbitrary for boundary
    # ways, unlike traced raster rings): even depth = outer, odd = hole
    def depth_of(i):
        pt = rings[i][0] * 0.5 + rings[i][1] * 0.5
        return sum(
            1 for j, r in enumerate(rings) if j != i and point_in_ring(pt, r)
        )

    depths = [depth_of(i) for i in range(len(rings))]
    polys = []
    outer_idx = {}
    for i, r in enumerate(rings):
        if depths[i] % 2 == 0:
            outer_idx[i] = len(polys)
            polys.append([r])
    for i, r in enumerate(rings):
        if depths[i] % 2 == 1:
            # attach to the smallest containing outer
            pt = r[0] * 0.5 + r[1] * 0.5
            cands = [
                (abs(ring_signed_area(rings[j])), j)
                for j in outer_idx
                if point_in_ring(pt, rings[j])
            ]
            if cands:
                _, j = min(cands)
                polys[outer_idx[j]].append(r)
    if not polys:
        return None
    return ("Polygon", polys[0]) if len(polys) == 1 else ("MultiPolygon", polys)

"""Packed geometry: the engine's internal Arrow-native representation.

Between the render stage and the tile sink, geometry travels as a single
BINARY column instead of WKT text. Rationale (measured on this repo's
render profile): WKT emit+parse was ~35% of the Python data-plane time and
the dominant allocation source; a flat byte blob crosses the JVM↔Python
Arrow boundary as one memcpy per row, costs the JVM exactly what the old
string did in shuffle/sort/parquet (one variable-length field — unlike
nested array<array<array<double>>>, which regressed the JVM side), and
numpy packs/unpacks it with ``tobytes``/``frombuffer`` — no text.

Format (all values little-endian float64; counts stored as doubles, exact
up to 2^53 — the coarse ``kind`` column travels alongside):

  kind == "point":
      raw coordinate pairs [x0, y0, x1, y1, ...]  (one or more points)

  kind == "linestring" | "polygon":
      a self-describing stream of parts, each part:
          [nrings, npts_0, ..., npts_{nrings-1}, ring_0 xy..., ring_1 xy...]
      (for linestrings every part has exactly one ring = one line)

Because the format is a headerless stream, CONCATENATION of two blobs is
the geometric append of their parts (or points) — the Catalyst P4 merges
(mergeMultiPolygon / mergeMultiPoint) reduce to binary ``concat`` over the
sort-ordered group, no Python and no coordinate math.

Single vs Multi is recovered from the part count (for points from the
coordinate count), so ``unpack(pack(g), kind_of(g))`` round-trips every
geometry this engine produces.
"""

from __future__ import annotations

import numpy as np

_F8 = np.dtype("<f8")


def pack(geom) -> bytes:
    """Geometry tuple → packed bytes."""
    kind, data = geom
    if kind in ("Point", "MultiPoint"):
        return np.ascontiguousarray(data, dtype=_F8).tobytes()
    if kind == "LineString":
        return _pack_parts([[np.asarray(data, dtype=_F8)]])
    if kind == "MultiLineString":
        return _pack_parts([[np.asarray(l, dtype=_F8)] for l in data])
    if kind == "Polygon":
        return _pack_parts([[np.asarray(r, dtype=_F8) for r in data]])
    if kind == "MultiPolygon":
        return _pack_parts(
            [[np.asarray(r, dtype=_F8) for r in rings] for rings in data]
        )
    raise ValueError(f"unsupported geometry kind: {kind}")


def _pack_parts(parts) -> bytes:
    chunks = []
    for rings in parts:
        head = np.empty(1 + len(rings), dtype=_F8)
        head[0] = len(rings)
        for i, r in enumerate(rings):
            head[1 + i] = len(r)
        chunks.append(head)
        chunks.extend(np.ascontiguousarray(r, dtype=_F8).ravel() for r in rings)
    return np.concatenate(chunks).tobytes()


def _parts_iter(blob):
    """Yield lists of (N,2) ring arrays per part from a line/poly blob.

    Validates the part headers: a point blob (raw coordinate pairs) or any
    other non-part-stream bytes misread as a header would otherwise walk the
    cursor backwards or off the end — raise instead of looping/garbage."""
    a = np.frombuffer(blob, dtype=_F8)
    i = 0
    n = len(a)
    while i < n:
        nrings = int(a[i])
        if nrings < 1 or i + 1 + nrings > n:
            raise ValueError(f"malformed packed blob: nrings={a[i]} at {i}/{n}")
        counts = a[i + 1 : i + 1 + nrings].astype(np.int64)
        if (counts < 1).any():
            raise ValueError(f"malformed packed blob: ring count < 1 at {i}/{n}")
        i += 1 + nrings
        if i + 2 * int(counts.sum()) > n:
            raise ValueError(f"malformed packed blob: rings overrun {i}/{n}")
        rings = []
        for c in counts:
            rings.append(a[i : i + 2 * c].reshape(-1, 2))
            i += 2 * c
        yield rings


def unpack(blob, kind: str):
    """Packed bytes + coarse kind → geometry tuple (None for empty)."""
    if blob is None or len(blob) == 0:
        return None
    if kind == "point":
        c = np.frombuffer(blob, dtype=_F8).reshape(-1, 2)
        return ("Point", c[0]) if len(c) == 1 else ("MultiPoint", c)
    parts = list(_parts_iter(blob))
    if kind == "linestring":
        if len(parts) == 1:
            return ("LineString", parts[0][0])
        return ("MultiLineString", [p[0] for p in parts])
    if kind == "polygon":
        if len(parts) == 1:
            return ("Polygon", parts[0])
        return ("MultiPolygon", parts)
    raise ValueError(f"unsupported coarse kind: {kind}")


def lines_of(blob) -> list[np.ndarray]:
    """All lines of a linestring-kind blob as (N,2) arrays."""
    if blob is None or len(blob) == 0:
        return []
    return [p[0] for p in _parts_iter(blob)]


def polys_of(blob) -> list[list[np.ndarray]]:
    """All polygons of a polygon-kind blob as lists of (N,2) rings."""
    if blob is None or len(blob) == 0:
        return []
    return list(_parts_iter(blob))


def points_of(blob) -> np.ndarray:
    """All points of a point-kind blob as one (N,2) array."""
    if blob is None or len(blob) == 0:
        return np.empty((0, 2))
    return np.frombuffer(blob, dtype=_F8).reshape(-1, 2)


def from_lines(lines) -> bytes:
    """[(N,2) arrays] → linestring-kind blob."""
    return _pack_parts([[np.asarray(l, dtype=_F8)] for l in lines])


def from_polys(polys) -> bytes:
    """[list-of-(N,2)-rings] → polygon-kind blob."""
    return _pack_parts(
        [[np.asarray(r, dtype=_F8) for r in rings] for rings in polys]
    )


def from_points(pts) -> bytes:
    """(N,2) array → point-kind blob."""
    return np.ascontiguousarray(pts, dtype=_F8).tobytes()


def parts_wkt(blob, kind: str) -> str:
    """Packed bytes → WKT text (test/debug surface; not on the hot path)."""
    from . import wkt

    g = unpack(blob, kind)
    return wkt.to_wkt(g) if g is not None else "GEOMETRYCOLLECTION EMPTY"


def wkt_parts(text: str):
    """WKT text → (packed bytes, coarse kind) (test/debug surface)."""
    from . import wkt

    g = wkt.parse_wkt(text)
    if g is None:
        return None, None
    return pack(g), wkt.geom_kind(g)


# aliases kept for the geometry-tuple view used by render/mvt code paths
def to_geom(blob, kind: str):
    return unpack(blob, kind)


def to_parts(geom) -> bytes:
    return pack(geom)

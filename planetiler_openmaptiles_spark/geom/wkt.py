"""Minimal, deterministic WKT parser/emitter over numpy arrays.

Geometry representation (no class hierarchy — cheap to ship through Arrow):

    ("Point", np.ndarray shape (2,))
    ("LineString", np.ndarray shape (N,2))
    ("Polygon", [ring0, ring1, ...])          # ring = np.ndarray (N,2), closed
    ("MultiPoint", np.ndarray shape (N,2))
    ("MultiLineString", [line0, line1, ...])
    ("MultiPolygon", [[ring...], [ring...]])
    ("GeometryCollection", [geom, ...])

Parity target: the reference's JTS usage (planetiler SourceFeature
worldGeometry); we only need the constructs OSM/NE data produces.
"""

from __future__ import annotations

import numpy as np

__all__ = ["parse_wkt", "to_wkt", "geom_kind"]


def _coords(text: str) -> np.ndarray:
    """Parse 'x y, x y, ...' into an (N,2) float64 array."""
    arr = np.array(text.replace(",", " ").split(), dtype=np.float64)
    return arr.reshape(-1, 2)


def _split_groups(body: str) -> list[str]:
    """Split '(...),(...),(...)' at depth 0 commas, stripping one paren level."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def parse_wkt(wkt: str):
    s = wkt.strip()
    if not s:
        return None
    up = s.upper()
    i = s.index("(") if "(" in s else -1
    tag = up[: i].strip() if i >= 0 else up.replace(" EMPTY", "").strip()
    if "EMPTY" in up and i < 0:
        return None
    body = s[i:]
    inner = body[1 : _match_paren(body)]
    if tag == "POINT":
        return ("Point", _coords(inner)[0])
    if tag == "LINESTRING":
        return ("LineString", _coords(inner))
    if tag == "MULTIPOINT":
        if "(" in inner:
            pts = [_coords(g)[0] for g in _split_groups(inner)]
            return ("MultiPoint", np.array(pts))
        return ("MultiPoint", _coords(inner))
    if tag == "POLYGON":
        return ("Polygon", [_coords(g) for g in _split_groups(inner)])
    if tag == "MULTILINESTRING":
        return ("MultiLineString", [_coords(g) for g in _split_groups(inner)])
    if tag == "MULTIPOLYGON":
        return ("MultiPolygon", [[_coords(r) for r in _split_groups(g)] for g in _split_groups(inner)])
    if tag == "GEOMETRYCOLLECTION":
        parts, depth, start = [], 0, 0
        for j, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(inner[start:j])
                start = j + 1
        parts.append(inner[start:])
        return ("GeometryCollection", [parse_wkt(p) for p in parts if p.strip()])
    raise ValueError(f"unsupported WKT type: {tag!r}")


def _match_paren(s: str) -> int:
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced WKT parens")


def _fmt(v: float) -> str:
    # %.10g round-trips our synthetic coordinate precision deterministically
    return f"{v:.10g}"


def _fmt_coords(arr: np.ndarray) -> str:
    a = np.asarray(arr).reshape(-1, 2)
    if len(a) > 4:
        # vectorized C-printf path; %.10g matches Python's .10g exactly for
        # float64 (both correctly rounded — parity-tested in test_geom)
        parts = np.char.mod("%.10g", a)
        return ", ".join(np.char.add(np.char.add(parts[:, 0], " "), parts[:, 1]).tolist())
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in a)


def to_wkt(geom) -> str:
    if geom is None:
        return "GEOMETRYCOLLECTION EMPTY"
    kind, data = geom
    if kind == "Point":
        return f"POINT ({_fmt(data[0])} {_fmt(data[1])})"
    if kind == "LineString":
        return f"LINESTRING ({_fmt_coords(data)})"
    if kind == "MultiPoint":
        return f"MULTIPOINT ({_fmt_coords(data)})"
    if kind == "Polygon":
        rings = ", ".join(f"({_fmt_coords(r)})" for r in data)
        return f"POLYGON ({rings})"
    if kind == "MultiLineString":
        lines = ", ".join(f"({_fmt_coords(l)})" for l in data)
        return f"MULTILINESTRING ({lines})"
    if kind == "MultiPolygon":
        polys = ", ".join("(" + ", ".join(f"({_fmt_coords(r)})" for r in rings) + ")" for rings in data)
        return f"MULTIPOLYGON ({polys})"
    if kind == "GeometryCollection":
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(g) for g in data) + ")"
    raise ValueError(f"unsupported geometry kind: {kind}")


def geom_kind(geom) -> str:
    """Coarse kind used for table matchType(): point | linestring | polygon."""
    kind = geom[0]
    if kind in ("Point", "MultiPoint"):
        return "point"
    if kind in ("LineString", "MultiLineString"):
        return "linestring"
    if kind in ("Polygon", "MultiPolygon"):
        return "polygon"
    return "other"

"""WKB geometry codec (+ GeoPackage / SpatiaLite blob headers).

Decodes the three blob framings a ``natural_earth_vector.sqlite``-style
file can carry in its geometry column (OpenMapTilesMain.java:48-53 is the
reference's NE source declaration):

- plain (E)WKB — OGC 99-049 / ISO 13249-3 byte order + type + coords;
  EWKB SRID flag and Z/M dimension variants accepted (extra dims dropped);
- GeoPackage binary — ``GP`` magic, version, flags (envelope size from
  flag bits 1-3), srs_id, then WKB;
- SpatiaLite internal BLOB — 0x00 start, endian byte, SRID, 32-byte MBR,
  0x7C marker, then a WKB-like body where nested entities carry a 0x69
  marker + class instead of their own endian byte, 0xFE terminator.

Geometries use the same tuple representation as geom/wkt.py, so
``to_wkt(decode_geometry_blob(b))`` is the one-liner every reader needs.
Encoders for all three framings exist so fixtures can synthesize real
on-disk bytes (tests pin the wire formats with hand-built vectors).
"""

from __future__ import annotations

import struct

import numpy as np

_POINT, _LINESTRING, _POLYGON = 1, 2, 3
_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION = 4, 5, 6, 7
_KIND_BY_CODE = {
    _POINT: "Point", _LINESTRING: "LineString", _POLYGON: "Polygon",
    _MULTIPOINT: "MultiPoint", _MULTILINESTRING: "MultiLineString",
    _MULTIPOLYGON: "MultiPolygon", _COLLECTION: "GeometryCollection",
}
_CODE_BY_KIND = {v: k for k, v in _KIND_BY_CODE.items()}


def _base_type(raw: int) -> tuple[int, int]:
    """EWKB/ISO type word → (base code 1-7, n dims)."""
    t = raw & 0x0FFFFFFF  # mask EWKB SRID/Z/M flag bits
    dims = 2
    if raw & 0x80000000:  # EWKB Z
        dims += 1
    if raw & 0x40000000:  # EWKB M
        dims += 1
    if t >= 3000:
        return t - 3000, 4
    if t >= 2000:
        return t - 2000, 3
    if t >= 1000:
        return t - 1000, 3
    return t, dims


def _read_coords(buf, off: int, n: int, dims: int, lt: str):
    arr = np.frombuffer(buf, dtype=f"{lt}f8", count=n * dims, offset=off)
    pts = arr.reshape(-1, dims)[:, :2]
    return np.ascontiguousarray(pts.astype(np.float64)), off + 8 * n * dims


def decode_wkb(buf: bytes, off: int = 0):
    """(geometry tuple, next offset). Raises on malformed input."""
    bo = buf[off]
    lt = "<" if bo == 1 else ">"
    raw = struct.unpack_from(f"{lt}I", buf, off + 1)[0]
    off += 5
    if raw & 0x20000000:  # EWKB embedded SRID
        off += 4
    code, dims = _base_type(raw)
    kind = _KIND_BY_CODE.get(code)
    if kind is None:
        raise ValueError(f"unsupported WKB type {raw}")
    if code == _POINT:
        pts, off = _read_coords(buf, off, 1, dims, lt)
        return (kind, pts[0]), off
    if code == _LINESTRING:
        (n,) = struct.unpack_from(f"{lt}I", buf, off)
        pts, off = _read_coords(buf, off + 4, n, dims, lt)
        return (kind, pts), off
    if code == _POLYGON:
        (nr,) = struct.unpack_from(f"{lt}I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(f"{lt}I", buf, off)
            r, off = _read_coords(buf, off + 4, n, dims, lt)
            rings.append(r)
        return (kind, rings), off
    # multi / collection: n full WKB children
    (n,) = struct.unpack_from(f"{lt}I", buf, off)
    off += 4
    children = []
    for _ in range(n):
        g, off = decode_wkb(buf, off)
        children.append(g)
    if code == _MULTIPOINT:
        return (kind, np.array([c[1] for c in children]).reshape(-1, 2)), off
    if code in (_MULTILINESTRING, _MULTIPOLYGON):
        return (kind, [c[1] for c in children]), off
    return (kind, children), off


def _decode_spatialite_body(buf: bytes, off: int, lt: str):
    (code,) = struct.unpack_from(f"{lt}I", buf, off)
    off += 4
    base, dims = _base_type(code)
    kind = _KIND_BY_CODE.get(base)
    if kind is None:
        raise ValueError(f"unsupported SpatiaLite class {code}")
    if base == _POINT:
        pts, off = _read_coords(buf, off, 1, dims, lt)
        return (kind, pts[0]), off
    if base == _LINESTRING:
        (n,) = struct.unpack_from(f"{lt}I", buf, off)
        pts, off = _read_coords(buf, off + 4, n, dims, lt)
        return (kind, pts), off
    if base == _POLYGON:
        (nr,) = struct.unpack_from(f"{lt}I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(f"{lt}I", buf, off)
            r, off = _read_coords(buf, off + 4, n, dims, lt)
            rings.append(r)
        return (kind, rings), off
    (n,) = struct.unpack_from(f"{lt}I", buf, off)
    off += 4
    children = []
    for _ in range(n):
        if buf[off] != 0x69:  # entity marker
            raise ValueError("malformed SpatiaLite entity marker")
        g, off = _decode_spatialite_body(buf, off + 1, lt)
        children.append(g)
    if base == _MULTIPOINT:
        return (kind, np.array([c[1] for c in children]).reshape(-1, 2)), off
    if base in (_MULTILINESTRING, _MULTIPOLYGON):
        return (kind, [c[1] for c in children]), off
    return (kind, children), off


def decode_geometry_blob(buf: bytes):
    """Auto-detect framing (GeoPackage / SpatiaLite / plain WKB) → geometry
    tuple, or None for empty input."""
    if not buf:
        return None
    if len(buf) >= 8 and buf[0] == 0x47 and buf[1] == 0x50:  # 'GP'
        flags = buf[3]
        env = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get((flags >> 1) & 0x7)
        if env is None:
            raise ValueError("invalid GeoPackage envelope indicator")
        if flags & 0x10:  # empty-geometry flag
            return None
        g, _ = decode_wkb(buf, 8 + env)
        return g
    # SpatiaLite detection must not trip on big-endian plain WKB (whose
    # first byte is also 0x00): beyond the 0x7C MBR marker, require the
    # endian byte, the 0xFE terminator, AND that the SpatiaLite parse
    # consumes the blob exactly; any mismatch falls back to plain WKB
    if (len(buf) > 44 and buf[0] == 0x00 and buf[1] in (0, 1)
            and buf[38] == 0x7C and buf[-1] == 0xFE):
        lt = "<" if buf[1] == 1 else ">"
        try:
            g, end = _decode_spatialite_body(buf, 39, lt)
            if end == len(buf) - 1:
                return g
        except (ValueError, struct.error, IndexError):
            pass
    try:
        g, _ = decode_wkb(buf)
    except (struct.error, IndexError, MemoryError, OverflowError) as e:
        # one actionable error type for corrupt blobs (struct.error etc.
        # say nothing about WHICH framing failed)
        raise ValueError(f"malformed geometry blob: {type(e).__name__}: {e}") from e
    return g


# ---------------------------------------------------------------- encode

def encode_wkb(geom) -> bytes:
    """Geometry tuple → little-endian 2D WKB."""
    kind, data = geom
    code = _CODE_BY_KIND[kind]
    head = struct.pack("<BI", 1, code)
    if kind == "Point":
        a = np.asarray(data, dtype=np.float64).reshape(2)
        return head + struct.pack("<dd", a[0], a[1])
    if kind == "LineString":
        a = np.asarray(data, dtype=np.float64).reshape(-1, 2)
        return head + struct.pack("<I", len(a)) + a.astype("<f8").tobytes()
    if kind == "Polygon":
        out = head + struct.pack("<I", len(data))
        for r in data:
            a = np.asarray(r, dtype=np.float64).reshape(-1, 2)
            out += struct.pack("<I", len(a)) + a.astype("<f8").tobytes()
        return out
    if kind == "MultiPoint":
        pts = np.asarray(data, dtype=np.float64).reshape(-1, 2)
        return (head + struct.pack("<I", len(pts))
                + b"".join(encode_wkb(("Point", p)) for p in pts))
    if kind == "MultiLineString":
        return (head + struct.pack("<I", len(data))
                + b"".join(encode_wkb(("LineString", l)) for l in data))
    if kind == "MultiPolygon":
        return (head + struct.pack("<I", len(data))
                + b"".join(encode_wkb(("Polygon", p)) for p in data))
    if kind == "GeometryCollection":
        return (head + struct.pack("<I", len(data))
                + b"".join(encode_wkb(g) for g in data))
    raise ValueError(f"unsupported geometry kind: {kind}")


def _flat_points(geom) -> np.ndarray:
    kind, data = geom
    if kind == "Point":
        return np.asarray(data, dtype=np.float64).reshape(1, 2)
    if kind in ("LineString", "MultiPoint"):
        return np.asarray(data, dtype=np.float64).reshape(-1, 2)
    if kind in ("Polygon", "MultiLineString"):
        return np.vstack([np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in data])
    if kind == "MultiPolygon":
        return np.vstack([_flat_points(("Polygon", p)) for p in data])
    return np.vstack([_flat_points(g) for g in data])


def encode_gpkg(geom, srid: int = 4326) -> bytes:
    """Geometry tuple → GeoPackage binary (XY envelope included)."""
    pts = _flat_points(geom)
    env = struct.pack("<4d", pts[:, 0].min(), pts[:, 0].max(),
                      pts[:, 1].min(), pts[:, 1].max())
    # flags: little-endian (bit 0) + envelope indicator 1 (bits 1-3)
    return b"GP" + bytes([0, 0b00000011]) + struct.pack("<i", srid) + env + encode_wkb(geom)


def _encode_spatialite_body(geom) -> bytes:
    kind, data = geom
    code = _CODE_BY_KIND[kind]
    out = struct.pack("<I", code)
    if kind == "Point":
        a = np.asarray(data, dtype=np.float64).reshape(2)
        return out + struct.pack("<dd", a[0], a[1])
    if kind == "LineString":
        a = np.asarray(data, dtype=np.float64).reshape(-1, 2)
        return out + struct.pack("<I", len(a)) + a.astype("<f8").tobytes()
    if kind == "Polygon":
        for_r = out + struct.pack("<I", len(data))
        for r in data:
            a = np.asarray(r, dtype=np.float64).reshape(-1, 2)
            for_r += struct.pack("<I", len(a)) + a.astype("<f8").tobytes()
        return for_r
    if kind == "MultiPoint":
        parts = [("Point", p) for p in np.asarray(data, dtype=np.float64).reshape(-1, 2)]
    elif kind == "MultiLineString":
        parts = [("LineString", l) for l in data]
    elif kind == "MultiPolygon":
        parts = [("Polygon", p) for p in data]
    else:
        parts = list(data)
    out += struct.pack("<I", len(parts))
    for p in parts:
        out += b"\x69" + _encode_spatialite_body(p)
    return out


def encode_spatialite(geom, srid: int = 4326) -> bytes:
    """Geometry tuple → SpatiaLite internal BLOB (little-endian)."""
    pts = _flat_points(geom)
    mbr = struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                      pts[:, 0].max(), pts[:, 1].max())
    return (b"\x00\x01" + struct.pack("<i", srid) + mbr + b"\x7c"
            + _encode_spatialite_body(geom) + b"\xfe")

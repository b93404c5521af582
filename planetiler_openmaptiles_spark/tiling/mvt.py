"""Mapbox Vector Tile (MVT v2.1) encoder/decoder — pure python, no deps.

Reference parity (S5): planetiler encodes each tile's features as a gzipped
MVT protobuf at extent 4096 and writes them to an mbtiles sqlite archive
(reference `OpenMapTilesMain.java:57`, asserted in
`OpenMapTilesTest.java:79-102`). Quantization to the 4096 integer grid is
observable behavior — it changes geometry — so the encoder lives in the
engine proper and `pipeline.write_mbtiles` is the real sink.

Wire format follows the public Mapbox vector-tile spec v2.1 proto:

    Tile.layers[]        field 3, len-delimited
      Layer.version      field 15, varint (=2)
      Layer.name         field 1
      Layer.features[]   field 2
        Feature.id       field 1, varint
        Feature.tags     field 2, packed varints (k,v index pairs)
        Feature.type     field 3, varint (1=POINT 2=LINESTRING 3=POLYGON)
        Feature.geometry field 4, packed varints (command/param stream)
      Layer.keys[]       field 3
      Layer.values[]     field 4 (string=1 double=3 int=4 bool=7)
      Layer.extent       field 5, varint (=4096)

Geometry commands: MoveTo=1 / LineTo=2 / ClosePath=7, encoded as
(id | count<<3); params are zigzag-encoded coordinate deltas. Tile px
coordinates [0,256) scale by extent/256 = 16 and round half-up (matching
JTS/planetiler's Math.round on the scaled grid). Zero-length segments that
quantization collapses are dropped; degenerate rings (<3 distinct points)
and lines (<2) drop the feature part, as planetiler's VectorTile encoder
does.
"""

from __future__ import annotations

import gzip
import struct
from typing import Iterable

import numpy as np

EXTENT = 4096
SCALE = EXTENT / 256.0  # px -> tile integer grid

GEOM_POINT, GEOM_LINE, GEOM_POLY = 1, 2, 3


# ------------------------------------------------------------------ varints


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _field(num: int, wire: int) -> bytes:
    return _uvarint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _uvarint(len(payload)) + payload


def _packed(num: int, values: Iterable[int]) -> bytes:
    body = b"".join(_uvarint(v) for v in values)
    return _len_delim(num, body)


# ------------------------------------------------------------- value typing


def encode_value(v) -> bytes:
    """Tile.Value message. Engine attrs are strings; planetiler emits typed
    values, so int-looking / float-looking / boolean strings are promoted
    (OpenMapTilesTest asserts e.g. render_height as a number)."""
    if isinstance(v, bool) or v in ("true", "false"):
        b = v if isinstance(v, bool) else v == "true"
        return _field(7, 0) + _uvarint(1 if b else 0)
    if isinstance(v, int):
        return _field(4, 0) + _uvarint(v if v >= 0 else (1 << 64) + v)
    if isinstance(v, float):
        return _field(3, 1) + struct.pack("<d", v)
    s = str(v)
    try:
        i = int(s)
        if -(1 << 63) <= i < (1 << 63):
            return _field(4, 0) + _uvarint(i if i >= 0 else (1 << 64) + i)
    except ValueError:
        pass
    try:
        f = float(s)
        # only promote clean numeric strings (not "", "nan", "1e5 m")
        if s.replace(".", "", 1).lstrip("-").isdigit():
            return _field(3, 1) + struct.pack("<d", f)
    except ValueError:
        pass
    return _len_delim(1, s.encode("utf-8"))


def _decode_value(buf: bytes):
    pos = 0
    val = None
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if num == 1:
            ln, pos = _read_uvarint(buf, pos)
            val = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        elif num == 3:
            val = struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
        elif num == 2:
            val = struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
        elif num in (4, 5):
            v, pos = _read_uvarint(buf, pos)
            val = v - (1 << 64) if num == 4 and v >= (1 << 63) else v
        elif num == 6:
            v, pos = _read_uvarint(buf, pos)
            val = _unzigzag(v)
        elif num == 7:
            v, pos = _read_uvarint(buf, pos)
            val = bool(v)
        else:
            pos = _skip(buf, pos, wire)
    return val


# ------------------------------------------------------------ geometry enc


def quantize(coords: np.ndarray) -> np.ndarray:
    """px -> integer tile grid (extent 4096): floor(x*16 + 0.5), Java
    Math.round semantics (half up, also for negatives)."""
    return np.floor(np.asarray(coords, dtype=np.float64) * SCALE + 0.5).astype(np.int64)


def _dedupe_consecutive(q: np.ndarray) -> np.ndarray:
    if len(q) < 2:
        return q
    keep = np.ones(len(q), dtype=bool)
    keep[1:] = (q[1:] != q[:-1]).any(axis=1)
    return q[keep]


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _encode_path(q: np.ndarray, cursor: list[int], close: bool) -> list[int]:
    """MoveTo + LineTo(+ClosePath) command stream for one de-duplicated,
    quantized path; updates cursor in place."""
    out = [_cmd(1, 1)]
    dx, dy = int(q[0, 0]) - cursor[0], int(q[0, 1]) - cursor[1]
    out += [_zigzag(dx), _zigzag(dy)]
    cursor[0], cursor[1] = int(q[0, 0]), int(q[0, 1])
    rest = q[1:]
    out.append(_cmd(2, len(rest)))
    for x, y in rest:
        out += [_zigzag(int(x) - cursor[0]), _zigzag(int(y) - cursor[1])]
        cursor[0], cursor[1] = int(x), int(y)
    if close:
        out.append(_cmd(7, 1))
    return out


def _ring_area2(q: np.ndarray) -> int:
    """Twice the signed area on the integer grid (shoelace). In MVT's
    y-down screen space, positive = exterior winding per spec v2."""
    x, y = q[:, 0], q[:, 1]
    return int(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def normalize_geometry(kind: str, geom):
    """The geometric half of encoding: quantize + dedupe + orient + drop
    degenerates. Returns (gtype, paths) where paths is exactly what a
    decoder recovers from the command stream (points: one 1-pt path each;
    polygons: rings without the closing point). Shared by the encoder and
    the round-trip oracle so the oracle isolates the BYTE machinery."""
    if kind == "point":
        pts = geom[1].reshape(1, 2) if geom[0] == "Point" else np.asarray(geom[1])
        q = quantize(pts)
        return GEOM_POINT, [q[i : i + 1] for i in range(len(q))]
    if kind == "linestring":
        lines = [geom[1]] if geom[0] == "LineString" else list(geom[1])
        paths = []
        for line in lines:
            q = _dedupe_consecutive(quantize(line))
            if len(q) >= 2:
                paths.append(q)
        return GEOM_LINE, paths
    # polygon: exterior ring positive area, holes negative (spec v2);
    # flip rings that quantize to the wrong orientation
    polys = [geom[1]] if geom[0] == "Polygon" else list(geom[1])
    paths = []
    for rings in polys:
        poly_paths = []
        for i, ring in enumerate(rings):
            q = quantize(ring)
            if len(q) > 1 and (q[0] == q[-1]).all():
                q = q[:-1]  # drop closing point (ClosePath implies it)
            q = _dedupe_consecutive(q)
            if len(q) >= 2 and (q[0] == q[-1]).all():
                q = q[:-1]
            if len(q) < 3:
                if i == 0:
                    poly_paths = []
                    break  # degenerate outer ring: drop the whole polygon
                continue
            a2 = _ring_area2(np.vstack([q, q[:1]]))
            if a2 == 0:
                if i == 0:
                    poly_paths = []
                    break
                continue
            want_positive = i == 0
            if (a2 > 0) != want_positive:
                q = q[::-1]
            poly_paths.append(q)
        paths += poly_paths
    return GEOM_POLY, paths


def encode_geometry(kind: str, geom, out_type: list) -> list[int]:
    """geom = parsed WKT tuple in tile px coords; returns command stream.
    Drops quantization-degenerate parts; returns [] if nothing survives."""
    gtype, paths = normalize_geometry(kind, geom)
    out_type.append(gtype)
    if not paths:
        return []
    cursor = [0, 0]
    if gtype == GEOM_POINT:
        stream = [_cmd(1, len(paths))]
        for p in paths:
            x, y = int(p[0, 0]), int(p[0, 1])
            stream += [_zigzag(x - cursor[0]), _zigzag(y - cursor[1])]
            cursor[0], cursor[1] = x, y
        return stream
    cmds: list[int] = []
    for q in paths:
        cmds += _encode_path(q, cursor, close=gtype == GEOM_POLY)
    return cmds


def _decode_geometry(stream: list[int], gtype: int):
    """Command stream -> list of paths (np arrays of int grid coords).
    Polygons: ClosePath appends the first point."""
    paths = []
    cur = None
    x = y = 0
    i = 0
    while i < len(stream):
        cmd = stream[i]
        cid, count = cmd & 7, cmd >> 3
        i += 1
        if cid == 1:  # MoveTo
            for _ in range(count):
                x += _unzigzag(stream[i]); y += _unzigzag(stream[i + 1]); i += 2
                cur = [[x, y]]
                paths.append(cur)
        elif cid == 2:  # LineTo
            for _ in range(count):
                x += _unzigzag(stream[i]); y += _unzigzag(stream[i + 1]); i += 2
                cur.append([x, y])
        elif cid == 7:  # ClosePath
            cur.append(list(cur[0]))
    return [np.array(p, dtype=np.int64) for p in paths]


def promote_value(v):
    """The python-typed value encode_value would emit (for canonical
    attr comparison in the round-trip oracle)."""
    if isinstance(v, bool) or v in ("true", "false"):
        return v if isinstance(v, bool) else v == "true"
    if isinstance(v, (int, float)):
        return v
    s = str(v)
    try:
        return int(s)
    except ValueError:
        pass
    if s.replace(".", "", 1).lstrip("-").isdigit():
        return float(s)
    return s


def canon_feature(gtype: int, paths, attrs: dict, decoded: bool = False) -> tuple:
    """(geom_string, attrs_json) canonical form. For decoded polygons the
    ClosePath-appended closing vertex is stripped so bytes-through parity
    compares equal path lists."""
    import json as _json

    pp = []
    for p in paths:
        q = np.asarray(p)
        if decoded and gtype == GEOM_POLY and len(q) > 1 and (q[0] == q[-1]).all():
            q = q[:-1]
        pp.append(",".join(f"{int(x)} {int(y)}" for x, y in q))
    a = {k: promote_value(v) for k, v in (attrs or {}).items() if v is not None}
    return ";".join(pp), _json.dumps(a, sort_keys=True)


# -------------------------------------------------------------- tile enc


def encode_tile(layers: dict) -> bytes:
    """layers: {layer_name: [ (elem_id, kind, geom_px_tuple, attrs_dict), ... ]}
    -> uncompressed MVT bytes. Feature order is preserved (tile seq order)."""
    out = bytearray()
    for name, feats in layers.items():
        keys: dict[str, int] = {}
        values: dict[bytes, int] = {}
        fbufs = []
        for elem_id, kind, geom, attrs in feats:
            types: list[int] = []
            stream = encode_geometry(kind, geom, types)
            if not stream:
                continue
            tags = []
            for k, v in (attrs or {}).items():
                if v is None:
                    continue
                ki = keys.setdefault(k, len(keys))
                vb = encode_value(v)
                vi = values.setdefault(vb, len(values))
                tags += [ki, vi]
            f = bytearray()
            if elem_id is not None and elem_id >= 0:
                f += _field(1, 0) + _uvarint(int(elem_id))
            if tags:
                f += _packed(2, tags)
            f += _field(3, 0) + _uvarint(types[0])
            f += _packed(4, stream)
            fbufs.append(bytes(f))
        layer = bytearray()
        layer += _field(15, 0) + _uvarint(2)  # version
        layer += _len_delim(1, name.encode("utf-8"))
        for f in fbufs:
            layer += _len_delim(2, f)
        for k in keys:
            layer += _len_delim(3, k.encode("utf-8"))
        for vb in values:
            layer += _len_delim(4, vb)
        layer += _field(5, 0) + _uvarint(EXTENT)
        out += _len_delim(3, bytes(layer))
    return bytes(out)


def gzip_tile(data: bytes) -> bytes:
    return gzip.compress(data, mtime=0)  # deterministic bytes


# -------------------------------------------------------------- tile dec


def _read_uvarint(buf: bytes, pos: int):
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:  # protobuf caps varints at 10 bytes / 64 bits
            raise ValueError("uvarint longer than 64 bits")


def _skip(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_uvarint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        ln, pos = _read_uvarint(buf, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    return pos


def decode_tile(data: bytes) -> dict:
    """MVT bytes -> {layer: {"extent": int, "features": [
    {"id": int|None, "type": int, "paths": [np int arrays], "attrs": dict}]}}"""
    try:
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)
        layers = {}
        pos = 0
        while pos < len(data):
            tag, pos = _read_uvarint(data, pos)
            num, wire = tag >> 3, tag & 7
            if num == 3 and wire == 2:
                ln, pos = _read_uvarint(data, pos)
                name, layer = _decode_layer(data[pos : pos + ln])
                layers[name] = layer
                pos += ln
            else:
                pos = _skip(data, pos, wire)
        return layers
    except ValueError:
        raise
    except Exception as e:
        # normalize every parse failure (truncated varint -> IndexError,
        # bad utf-8, dangling ClosePath -> AttributeError, zlib error, ...)
        # so a corrupt blob in a 100 TB archive read surfaces as one
        # actionable error type instead of killing the job with whatever
        # the byte soup happened to trip over
        raise ValueError(f"malformed MVT tile: {type(e).__name__}: {e}") from e


def _decode_layer(buf: bytes):
    name, extent = "", EXTENT
    keys, values, rawfeats = [], [], []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if num == 1:
            ln, pos = _read_uvarint(buf, pos)
            name = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        elif num == 2:
            ln, pos = _read_uvarint(buf, pos)
            rawfeats.append(buf[pos : pos + ln])
            pos += ln
        elif num == 3:
            ln, pos = _read_uvarint(buf, pos)
            keys.append(buf[pos : pos + ln].decode("utf-8"))
            pos += ln
        elif num == 4:
            ln, pos = _read_uvarint(buf, pos)
            values.append(_decode_value(buf[pos : pos + ln]))
            pos += ln
        elif num == 5:
            extent, pos = _read_uvarint(buf, pos)
        else:
            pos = _skip(buf, pos, wire)
    feats = []
    for fb in rawfeats:
        fid, ftype, tags, stream = None, 0, [], []
        p = 0
        while p < len(fb):
            tag, p = _read_uvarint(fb, p)
            num, wire = tag >> 3, tag & 7
            if num == 1:
                fid, p = _read_uvarint(fb, p)
            elif num == 2:
                ln, p = _read_uvarint(fb, p)
                end = p + ln
                while p < end:
                    v, p = _read_uvarint(fb, p)
                    tags.append(v)
            elif num == 3:
                ftype, p = _read_uvarint(fb, p)
            elif num == 4:
                ln, p = _read_uvarint(fb, p)
                end = p + ln
                while p < end:
                    v, p = _read_uvarint(fb, p)
                    stream.append(v)
            else:
                p = _skip(fb, p, wire)
        attrs = {keys[tags[i]]: values[tags[i + 1]] for i in range(0, len(tags), 2)}
        feats.append(
            {"id": fid, "type": ftype, "paths": _decode_geometry(stream, ftype), "attrs": attrs}
        )
    return name, {"extent": extent, "features": feats}

"""Tile overzooming: serve zoom levels beyond the archive's max zoom by
transforming + clipping the z_max parent tile into its descendants.

planetiler stops at z14 and tells tileservers to overzoom client-side
("maxzoom 14 ... render higher zooms from the z14 tiles" — the standard
OpenMapTiles deployment); this module is that operation as a distributed
batch op, so a pipeline can materialize z15/z16 tiles for hot areas
straight from the z14 archive without re-running the build.

Per parent tile: decode the MVT once, then for each of the 4^dz child
quadrants scale the geometry by 2^dz, translate by the quadrant offset,
clip to the child's 256-px box (+buffer) with the engine's
Sutherland-Hodgman kernels (`geom/ops.clip_geom_box` — the same code the
renderer uses), and re-encode. Features that miss the quadrant drop; a
child with no surviving features emits nothing (sparse by construction).

Scale shape: one Arrow task per parent-tile batch; children of one
parent never shuffle (they're derived in-loop), and output is repartition-
free — the (z, x, y) keys inherit the parent's distribution.
"""

from __future__ import annotations

import numpy as np

from ..geom.ops import clip_geom_box
from . import mvt


def _feature_geom(ftype: int, ipaths: list) -> tuple | None:
    """Decoded integer paths → ops geometry tuple in px floats."""
    paths = [np.asarray(p, dtype=np.float64) / 16.0 for p in ipaths]
    if not paths:
        return None
    if ftype == mvt.GEOM_POINT:
        pts = np.vstack(paths)
        return ("Point", pts[0]) if len(pts) == 1 else ("MultiPoint", pts)
    if ftype == mvt.GEOM_LINE:
        return ("LineString", paths[0]) if len(paths) == 1 else (
            "MultiLineString", paths)
    polys, cur = [], None
    for ip, p in zip(ipaths, paths):
        if mvt._ring_area2(np.asarray(ip)) > 0 or cur is None:
            cur = [p]
            polys.append(cur)
        else:
            cur.append(p)
    return ("Polygon", polys[0]) if len(polys) == 1 else ("MultiPolygon", polys)


_KIND = {mvt.GEOM_POINT: "point", mvt.GEOM_LINE: "linestring",
         mvt.GEOM_POLY: "polygon"}


def _decode_parent(blob: bytes) -> list:
    """Decode + rebuild geometry ONCE per parent: list of
    (layer, id, ftype, geom_tuple, attrs). Quadrant loops transform these
    — never re-running the protobuf decode per child."""
    out = []
    for lname, layer in mvt.decode_tile(blob).items():
        for f in layer["features"]:
            geom = _feature_geom(f["type"], f["paths"])
            if geom is not None:
                out.append((lname, f["id"], f["type"], geom, f["attrs"]))
    return out


def _child_from_decoded(decoded: list, dz: int, qx: int, qy: int,
                        buffer_px: float) -> bytes | None:
    scale = float(1 << dz)
    off = np.array([qx * 256.0, qy * 256.0])

    def _tx(a):
        return np.asarray(a, dtype=np.float64) * scale - off

    layers_out: dict = {}
    for lname, fid, ftype, geom, attrs in decoded:
        kind, data = geom
        if kind in ("Point", "MultiPoint", "LineString"):
            g2 = (kind, _tx(data))
        elif kind == "MultiLineString":
            g2 = (kind, [_tx(l) for l in data])
        elif kind == "Polygon":
            g2 = (kind, [_tx(r) for r in data])
        else:  # MultiPolygon
            g2 = (kind, [[_tx(r) for r in rings] for rings in data])
        clipped = clip_geom_box(
            g2, -buffer_px, -buffer_px, 256.0 + buffer_px, 256.0 + buffer_px
        )
        if clipped is None:
            continue
        layers_out.setdefault(lname, []).append(
            (fid if fid is not None else -1, _KIND[ftype], clipped, attrs)
        )
    if not layers_out:
        return None
    return mvt.encode_tile(layers_out)


def overzoom_blob(blob: bytes, dz: int, qx: int, qy: int,
                  buffer_px: float = 4.0) -> bytes | None:
    """Parent tile blob → child blob for quadrant (qx, qy) at +``dz``
    zooms (0 <= qx, qy < 2^dz), or None when nothing survives. Output is
    uncompressed MVT (caller gzips for archives). For all 4^dz children
    of one parent, use ``overzoom_tiles`` — it decodes once."""
    return _child_from_decoded(_decode_parent(blob), dz, qx, qy, buffer_px)


def overzoom_tiles(tiles, target_zoom: int, buffer_px: float = 4.0):
    """Distributed overzoom: ``(z, x, y, tile_data)`` rows at the archive's
    max zoom → child rows at ``target_zoom`` (gzipped MVT), sparse (only
    children with content emit). One Arrow pass; no shuffle."""
    import pandas as pd

    schema = "z int, x int, y int, tile_data binary"

    def run(batches):
        for pdf in batches:
            rows = []
            for z, x, y, blob in zip(pdf["z"], pdf["x"], pdf["y"],
                                     pdf["tile_data"]):
                dz = target_zoom - int(z)
                if dz <= 0:
                    continue
                decoded = _decode_parent(bytes(blob))  # once per parent
                for qy in range(1 << dz):
                    for qx in range(1 << dz):
                        child = _child_from_decoded(decoded, dz, qx, qy,
                                                    buffer_px)
                        if child is not None:
                            rows.append(
                                (target_zoom, (int(x) << dz) + qx,
                                 (int(y) << dz) + qy, mvt.gzip_tile(child))
                            )
            yield pd.DataFrame(rows, columns=["z", "x", "y", "tile_data"])

    return tiles.mapInPandas(run, schema)

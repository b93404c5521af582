"""S2 spherical cell index (public S2 geometry spec), vectorized.

The north-star spatial keying: quad tiles (tiling/cells.py) are the
engine's default join key, but they are mercator-projected — cell area
varies ~5× between the equator and 60° latitude, which skews per-cell
work in a planet-scale PIP/kNN shuffle. S2 cells project the six faces
of a cube with the quadratic area-equalizing ST transform, keeping cell
areas within ~2.1× of each other globally, and order cells along a
face-local Hilbert curve so consecutive ids are spatially adjacent
(range scans = compact regions).

Implementation is from the published S2 cell-id encoding (s2geometry
docs; no code copied): 64-bit id = 3 face bits, 2·level Hilbert position
bits, one trailing marker bit. Everything is numpy over arrays — the
30-level Hilbert fold is a 30-iteration vector loop, no per-row Python.

Used by spatial.py as an alternative cell keying for point bucketing /
aggregation; the DuckDB oracle replays the full face/ST/Hilbert bit math
in SQL (same pattern as the G.711 companding oracle).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

# Hilbert sub-cell orderings: traversal position -> (i,j) quadrant and back,
# per orientation (bit0 = swap i/j, bit1 = invert both).
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2],  # canonical order
     [0, 2, 3, 1],  # swapped
     [3, 2, 0, 1],  # inverted
     [3, 1, 0, 2]],  # swapped + inverted
    dtype=np.int64,
)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p
# orientation change applied after emitting position p
_SWAP, _INVERT = 1, 2
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _SWAP | _INVERT], dtype=np.int64)


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    phi, theta = np.radians(lat), np.radians(lon)
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Largest-|component| face (0..5), gnomonic (u, v) in [-1, 1]."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    # face frames (s2 canonical): u/v axes per face
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (unum, uden, vnum, vden) in _FACE_UV.items():
        m = face == f
        u[m] = unum(x[m], y[m], z[m]) / uden(x[m], y[m], z[m])
        v[m] = vnum(x[m], y[m], z[m]) / vden(x[m], y[m], z[m])
    return face, u, v


_FACE_UV = {
    0: (lambda x, y, z: y, lambda x, y, z: x,
        lambda x, y, z: z, lambda x, y, z: x),
    1: (lambda x, y, z: -x, lambda x, y, z: y,
        lambda x, y, z: z, lambda x, y, z: y),
    2: (lambda x, y, z: -x, lambda x, y, z: z,
        lambda x, y, z: -y, lambda x, y, z: z),
    3: (lambda x, y, z: z, lambda x, y, z: x,
        lambda x, y, z: y, lambda x, y, z: x),
    4: (lambda x, y, z: z, lambda x, y, z: y,
        lambda x, y, z: -x, lambda x, y, z: y),
    5: (lambda x, y, z: -y, lambda x, y, z: z,
        lambda x, y, z: -x, lambda x, y, z: z),
}

# inverse frames: face (u, v) -> xyz (before normalization)
_FACE_XYZ = {
    0: lambda u, v: (np.ones_like(u), u, v),
    1: lambda u, v: (-u, np.ones_like(u), v),
    2: lambda u, v: (-u, -v, np.ones_like(u)),
    3: lambda u, v: (-np.ones_like(u), -v, -u),
    4: lambda u, v: (v, -np.ones_like(u), -u),
    5: lambda u, v: (v, u, -np.ones_like(u)),
}


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic area-equalizing transform, [-1,1] -> [0,1]. (np.where
    evaluates both branches — clamp the radicands so the unused side
    never feeds sqrt a negative.)"""
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _hilbert_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray,
                 level: int) -> np.ndarray:
    """(face, i, j) at `level` -> Hilbert curve position (2·level bits)."""
    orient = face & _SWAP  # canonical initial orientation per face
    pos = np.zeros_like(i)
    for k in range(level - 1, -1, -1):
        ij2 = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij2]
        pos = (pos << 2) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return pos


def _hilbert_ij(face: np.ndarray, pos: np.ndarray, level: int):
    """Inverse of _hilbert_pos."""
    orient = face & _SWAP
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(level - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij2 = _POS_TO_IJ[orient, p]
        i = (i << 1) | (ij2 >> 1)
        j = (j << 1) | (ij2 & 1)
        orient = orient ^ _POS_TO_ORIENT[p]
    return i, j


def _assemble(face: np.ndarray, pos: np.ndarray, level: int) -> np.ndarray:
    """(face, hilbert pos) -> signed-int64 cell id (bit layout assembled in
    uint64: face 4/5 at deep levels sets bit 63, which Spark LongType
    carries as a negative long — all mask/compare math stays valid)."""
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    u = (
        (face.astype(np.uint64) << np.uint64(2 * level + int(shift)))
        | (pos.astype(np.uint64) << shift)
        | np.uint64(1 << (int(shift) - 1))
    )
    return u.view(np.int64)


def cell_id(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """lon/lat degrees -> S2 cell id at `level` (1 <= level <= 30):
    face(3 bits) | hilbert position (2·level bits) | 1 | zeros."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    n = np.int64(1) << level
    i = np.clip((uv_to_st(u) * n).astype(np.int64), 0, int(n) - 1)
    j = np.clip((uv_to_st(v) * n).astype(np.int64), 0, int(n) - 1)
    return _assemble(face, _hilbert_pos(face, i, j, level), level)


def cell_level(ids: np.ndarray) -> np.ndarray:
    """Level from the trailing marker bit."""
    ids = np.asarray(ids, dtype=np.int64)
    lsb = (ids & -ids).astype(np.uint64).astype(np.float64)
    return MAX_LEVEL - np.round(np.log2(lsb)).astype(np.int64) // 2


def cell_face_pos(ids: np.ndarray, level: int):
    body = np.asarray(ids).astype(np.uint64) >> np.uint64(
        2 * (MAX_LEVEL - level) + 1
    )
    face = (body >> np.uint64(2 * level)).astype(np.int64)
    pos = (body & ((np.uint64(1) << np.uint64(2 * level)) - np.uint64(1))).astype(np.int64)
    return face, pos


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell at a coarser level (bit truncation + new marker)."""
    ids = np.asarray(ids, dtype=np.int64)
    lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    return (ids & -lsb) | lsb


def range_min(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.int64)
    return ids - ((ids & -ids) - 1)


def range_max(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.int64)
    return ids + ((ids & -ids) - 1)


def cell_center(ids: np.ndarray, level: int):
    """Cell center -> (lon, lat) degrees."""
    face, pos = cell_face_pos(ids, level)
    i, j = _hilbert_ij(face, pos, level)
    n = float(1 << level)
    s = (i.astype(np.float64) + 0.5) / n
    t = (j.astype(np.float64) + 0.5) / n
    u, v = st_to_uv(s), st_to_uv(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, fn in _FACE_XYZ.items():
        m = face == f
        xf, yf, zf = fn(u[m], v[m])
        x[m], y[m], z[m] = xf, yf, zf
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / norm))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


def edge_neighbors(ids: np.ndarray, level: int) -> np.ndarray:
    """(n, 4) edge-adjacent cells at the same level. Same-face neighbors
    by ij arithmetic; cross-face by projecting the out-of-range (u, v)
    linearly onto the sphere and re-encoding — exact for edge neighbors
    because the gnomonic extension is monotone across the cube edge."""
    face, pos = cell_face_pos(ids, level)
    i, j = _hilbert_ij(face, pos, level)
    n = 1 << level
    out = np.empty((len(np.atleast_1d(i)), 4), dtype=np.int64)
    for col, (di, dj) in enumerate(((0, -1), (0, 1), (-1, 0), (1, 0))):
        ni, nj = i + di, j + dj
        inside = (ni >= 0) & (ni < n) & (nj >= 0) & (nj < n)
        same = _assemble(
            face,
            _hilbert_pos(face, np.clip(ni, 0, n - 1), np.clip(nj, 0, n - 1),
                         level),
            level,
        )
        # cross-face: center of the would-be cell in extended (u,v)
        s = (ni.astype(np.float64) + 0.5) / n
        t = (nj.astype(np.float64) + 0.5) / n
        u, v = st_to_uv(s), st_to_uv(t)
        x = np.empty_like(u)
        y = np.empty_like(u)
        z = np.empty_like(u)
        for f, fn in _FACE_XYZ.items():
            m = face == f
            xf, yf, zf = fn(u[m], v[m])
            x[m], y[m], z[m] = xf, yf, zf
        norm = np.sqrt(x * x + y * y + z * z)
        lat = np.degrees(np.arcsin(z / norm))
        lon = np.degrees(np.arctan2(y, x))
        wrapped = cell_id(lon, lat, level)
        out[:, col] = np.where(inside, same, wrapped)
    return out

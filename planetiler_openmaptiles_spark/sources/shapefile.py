"""ESRI Shapefile source connector (block-parallel, pure python/numpy).

The reference consumes two shapefile sources (OpenMapTilesMain.java:40-47):
``lake_centerline.shp.zip`` and ``water-polygons-split-3857.zip``, both in
EPSG:3857. This module reads the same format natively on Spark executors:

- the DRIVER reads only the tiny ``.shx`` index (8 bytes per record) and the
  ``.dbf``/``.prj`` headers, then builds contiguous fid-range splits sized to
  ~8 MB of ``.shp`` bytes;
- each EXECUTOR task seeks into ``.shp``/``.dbf`` and decodes its own record
  range inside an Arrow-batched ``mapInPandas`` — no geometry ever passes
  through the driver (same design as ``sources/osm_pbf.py``).

Format layout from the public ESRI Shapefile Technical Description (July
1998): .shp = 100-byte header + [8-byte big-endian record header, content]*;
.shx = 100-byte header + (offset, length) words per record; .dbf = dBASE III
fixed-width rows. Polygon rings: outer clockwise, holes counter-clockwise;
hole→outer assignment by even-odd containment of the hole's first vertex.

A deterministic writer (`write_shapefile`) exists so tests/oracles can
synthesize real on-disk fixtures from closed-form arithmetic — mirroring
`write_osm_pbf`. Writer and reader share only the layout constants; byte
vectors in tests/test_shapefile.py pin the wire format independently.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np

_MERC_R = 6378137.0  # WGS84 spherical web-mercator radius (EPSG:3857)

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8


# ---------------------------------------------------------------- CRS

def merc_to_lonlat(x, y):
    """EPSG:3857 meters → (lon, lat) degrees. Vectorized."""
    lon = np.degrees(np.asarray(x, dtype=np.float64) / _MERC_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / _MERC_R)) - math.pi / 2.0)
    return lon, lat


def lonlat_to_merc(lon, lat):
    """(lon, lat) degrees → EPSG:3857 meters. Vectorized."""
    x = _MERC_R * np.radians(np.asarray(lon, dtype=np.float64))
    la = np.radians(np.asarray(lat, dtype=np.float64))
    y = _MERC_R * np.log(np.tan(math.pi / 4.0 + la / 2.0))
    return x, y


def read_prj_epsg(shp_path: str) -> int:
    """Best-effort CRS detection from the sidecar .prj (4326 if absent).
    Only the two CRSs the reference's sources use are distinguished."""
    prj = os.path.splitext(shp_path)[0] + ".prj"
    if not os.path.exists(prj):
        return 4326
    with open(prj, "r", encoding="utf-8", errors="replace") as f:
        text = f.read()
    t = text.lower()
    if "3857" in t or "pseudo-mercator" in t or "web_mercator" in t or "mercator_auxiliary_sphere" in t:
        return 3857
    return 4326


# ---------------------------------------------------------------- writer

def _ring_signed_area(arr: np.ndarray) -> float:
    x, y = arr[:, 0], arr[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _orient(arr: np.ndarray, clockwise: bool) -> np.ndarray:
    a = _ring_signed_area(arr)
    if (a < 0) != clockwise and a != 0:
        return arr[::-1]
    return arr


def _close_ring(arr: np.ndarray) -> np.ndarray:
    if len(arr) == 0 or np.array_equal(arr[0], arr[-1]):
        return arr
    return np.vstack([arr, arr[:1]])


def _shape_record(kind: str, data, epsg: int) -> tuple[int, bytes, np.ndarray]:
    """One parsed-WKT geometry (lon/lat) → (shape_type, content bytes, flat
    points used for the file bbox), stored in `epsg` coordinates."""
    def tx(arr):
        a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
        if epsg == 3857:
            x, y = lonlat_to_merc(a[:, 0], a[:, 1])
            return np.column_stack([x, y])
        return a

    if kind == "Point":
        pt = tx(data)[0]
        return SHAPE_POINT, struct.pack("<idd", SHAPE_POINT, pt[0], pt[1]), pt.reshape(1, 2)
    if kind in ("LineString", "MultiLineString"):
        parts = [tx(p) for p in (data if kind == "MultiLineString" else [data])]
        return _poly_record(SHAPE_POLYLINE, parts)
    if kind in ("Polygon", "MultiPolygon"):
        polys = data if kind == "MultiPolygon" else [data]
        rings = []
        for rs in polys:
            for j, r in enumerate(rs):
                rings.append(_orient(_close_ring(tx(r)), clockwise=(j == 0)))
        return _poly_record(SHAPE_POLYGON, rings)
    if kind == "MultiPoint":
        pts = tx(data)
        hdr = struct.pack("<i4di", SHAPE_MULTIPOINT,
                          pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max(),
                          len(pts))
        return SHAPE_MULTIPOINT, hdr + pts.astype("<f8").tobytes(), pts
    raise ValueError(f"unsupported geometry kind for shapefile: {kind}")


def _poly_record(stype: int, parts: list[np.ndarray]) -> tuple[int, bytes, np.ndarray]:
    pts = np.vstack(parts)
    starts, n = [], 0
    for p in parts:
        starts.append(n)
        n += len(p)
    content = struct.pack("<i4dii", stype,
                          pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max(),
                          len(parts), n)
    content += np.asarray(starts, dtype="<i4").tobytes()
    content += pts.astype("<f8").tobytes()
    return stype, content, pts


def write_shapefile(base: str, records: list, epsg: int = 3857) -> str:
    """Write `<base>.shp/.shx/.dbf/.prj`. records = [(attrs dict, wkt)] with
    WKT in lon/lat (converted to `epsg` on disk). All records must share one
    shape family (point / polyline / polygon), as the format requires.
    Returns the .shp path."""
    from ..geom.wkt import parse_wkt

    shp_recs: list[bytes] = []
    bbox = [math.inf, math.inf, -math.inf, -math.inf]
    stype_file = SHAPE_NULL
    for _, wkt in records:
        g = parse_wkt(wkt)
        if g is None:
            shp_recs.append(struct.pack("<i", SHAPE_NULL))
            continue
        stype, content, pts = _shape_record(g[0], g[1], epsg)
        if stype_file == SHAPE_NULL:
            stype_file = stype
        elif stype != stype_file:
            raise ValueError("mixed shape types in one shapefile")
        bbox = [min(bbox[0], pts[:, 0].min()), min(bbox[1], pts[:, 1].min()),
                max(bbox[2], pts[:, 0].max()), max(bbox[3], pts[:, 1].max())]
        shp_recs.append(content)
    if not math.isfinite(bbox[0]):
        bbox = [0.0, 0.0, 0.0, 0.0]

    def header(total_words: int) -> bytes:
        return (struct.pack(">i20xi", 9994, total_words)
                + struct.pack("<ii", 1000, stype_file)
                + struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0))

    # .shp + .shx (list + join: += on bytes is quadratic over many records)
    shp_parts, shx_parts = [], []
    offset_words = 50
    for i, content in enumerate(shp_recs):
        words = len(content) // 2
        shp_parts.append(struct.pack(">ii", i + 1, words))
        shp_parts.append(content)
        shx_parts.append(struct.pack(">ii", offset_words, words))
        offset_words += 4 + words
    shp_body, shx_body = b"".join(shp_parts), b"".join(shx_parts)
    with open(base + ".shp", "wb") as f:
        f.write(header((100 + len(shp_body)) // 2) + shp_body)
    with open(base + ".shx", "wb") as f:
        f.write(header((100 + len(shx_body)) // 2) + shx_body)

    # .dbf (dBASE III, all fields type 'C')
    keys = sorted({k for attrs, _ in records for k in attrs})
    flens = {k: max(1, min(254, max((len(str(a.get(k, ""))) for a, _ in records), default=1)))
             for k in keys}
    fdesc = b"".join(
        struct.pack("<11sc4xBB14x", k.encode("ascii")[:10], b"C", flens[k], 0)
        for k in keys)
    hdr_size = 32 + len(fdesc) + 1
    rec_size = 1 + sum(flens.values())
    dbf = bytearray(struct.pack("<B3BIHH20x", 0x03, 26, 8, 20, len(records), hdr_size, rec_size))
    dbf += fdesc + b"\x0d"
    for attrs, _ in records:
        row = b" "
        for k in keys:
            row += str(attrs.get(k, "")).encode("latin-1", "replace")[: flens[k]].ljust(flens[k])
        dbf += row
    dbf += b"\x1a"
    with open(base + ".dbf", "wb") as f:
        f.write(bytes(dbf))

    with open(base + ".prj", "w", encoding="ascii") as f:
        f.write(
            'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",GEOGCS["GCS_WGS_1984",'
            'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
            'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
            'PROJECTION["Mercator_Auxiliary_Sphere"],UNIT["Meter",1.0]]'
            if epsg == 3857 else
            'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
            '6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
            'UNIT["Degree",0.0174532925199433]]'
        )
    return base + ".shp"


# ---------------------------------------------------------------- reader

def scan_shx_index(shp_path: str) -> np.ndarray:
    """.shx → (n, 2) int64 array of per-record (byte offset, byte length of
    content incl. the 8-byte record header). Driver-side, 8 bytes/record."""
    shx = os.path.splitext(shp_path)[0] + ".shx"
    with open(shx, "rb") as f:
        raw = f.read()
    entries = np.frombuffer(raw[100:], dtype=">i4").reshape(-1, 2).astype(np.int64)
    return np.column_stack([entries[:, 0] * 2, entries[:, 1] * 2 + 8])


def _dbf_layout(shp_path: str):
    """(.dbf header size, record size, [(name, offset, length)])."""
    dbf = os.path.splitext(shp_path)[0] + ".dbf"
    if not os.path.exists(dbf):
        return None
    with open(dbf, "rb") as f:
        head = f.read(32)
        hdr_size, rec_size = struct.unpack("<HH", head[8:12])
        raw = f.read(hdr_size - 32)
    fields, off = [], 1  # offset 0 is the deletion flag
    for i in range(0, len(raw), 32):
        if raw[i : i + 1] == b"\x0d":
            break
        name = raw[i : i + 11].split(b"\x00", 1)[0].decode("ascii", "replace")
        flen = raw[i + 16]
        fields.append((name, off, flen))
        off += flen
    return dbf, hdr_size, rec_size, fields


def _rings_to_wkt(rings: list[np.ndarray]) -> tuple[str, str]:
    """Shapefile polygon rings (orientation-typed) → (kind, WKT).
    Outer = clockwise (negative shoelace), holes CCW, assigned to the
    containing outer by even-odd test of their first vertex."""
    from ..geom.wkt import to_wkt

    outers, holes = [], []
    for r in rings:
        (outers if _ring_signed_area(r) <= 0 else holes).append(r)
    if not outers:  # degenerate: treat everything as outers
        outers, holes = holes, []
    # emit conventional WKT orientation: outer CCW, holes CW
    outers = [_orient(o, clockwise=False) for o in outers]
    holes = [_orient(h, clockwise=True) for h in holes]
    polys = [[o] for o in outers]
    for h in holes:
        px, py = h[0]
        target = 0
        for i, o in enumerate(outers):
            x, y = o[:, 0], o[:, 1]
            x2, y2 = np.roll(x, -1), np.roll(y, -1)
            cross = ((y > py) != (y2 > py)) & (px < (x2 - x) * (py - y) / (y2 - y + 1e-300) + x)
            if int(cross.sum()) % 2 == 1:
                target = i
                break
        polys[target].append(h)
    if len(polys) == 1:
        return "polygon", to_wkt(("Polygon", polys[0]))
    return "polygon", to_wkt(("MultiPolygon", polys))


def _decode_record(content: bytes, epsg: int) -> tuple[str, str] | None:
    """One .shp record content → (kind, WKT lon/lat), or None for null."""
    from ..geom.wkt import to_wkt

    stype = struct.unpack_from("<i", content, 0)[0]
    if stype == SHAPE_NULL:
        return None

    def to_ll(pts: np.ndarray) -> np.ndarray:
        if epsg == 3857:
            lon, lat = merc_to_lonlat(pts[:, 0], pts[:, 1])
            return np.column_stack([lon, lat])
        return pts

    if stype == SHAPE_POINT:
        pt = np.frombuffer(content, dtype="<f8", count=2, offset=4).reshape(1, 2)
        return "point", to_wkt(("Point", to_ll(pt)[0]))
    if stype == SHAPE_MULTIPOINT:
        n = struct.unpack_from("<i", content, 36)[0]
        pts = np.frombuffer(content, dtype="<f8", count=2 * n, offset=40).reshape(-1, 2)
        return "point", to_wkt(("MultiPoint", to_ll(pts)))
    if stype in (SHAPE_POLYLINE, SHAPE_POLYGON):
        nparts, npoints = struct.unpack_from("<ii", content, 36)
        parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
        pts = to_ll(np.frombuffer(content, dtype="<f8", count=2 * npoints,
                                  offset=44 + 4 * nparts).reshape(-1, 2))
        bounds = np.append(parts, npoints)
        if bounds[0] != 0 or np.any(np.diff(bounds) < 0) or npoints < 0:
            raise ValueError("malformed shapefile part index")
        groups = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)]
        if stype == SHAPE_POLYLINE:
            if len(groups) == 1:
                return "linestring", to_wkt(("LineString", groups[0]))
            return "linestring", to_wkt(("MultiLineString", groups))
        return _rings_to_wkt(groups)
    raise ValueError(f"unsupported shape type {stype}")


def read_shapefile(spark, shp_path: str, partitions: int | None = None,
                   target_bytes: int = 8 << 20):
    """.shp(+.dbf/.prj) → DataFrame(fid long, kind string, geom_wkt string,
    attrs map<string,string>), geometry in lon/lat degrees.

    Splits are contiguous fid ranges packed to ~target_bytes of .shp data;
    each task reads ONE contiguous .shp span (and the matching fixed-width
    .dbf span) — planet-scale water polygons stream through executors with
    the driver holding only the .shx index."""
    import pandas as pd

    from .archive import materialize

    shp_path = os.path.abspath(materialize(shp_path, suffix=".shp"))
    idx = scan_shx_index(shp_path)
    epsg = read_prj_epsg(shp_path)
    n = len(idx)
    schema = "fid long, kind string, geom_wkt string, attrs map<string,string>"
    if n == 0:
        return spark.createDataFrame([], schema)

    # greedy contiguous packing to ~target_bytes per split
    splits, lo, acc = [], 0, 0
    for i in range(n):
        acc += int(idx[i, 1])
        if acc >= target_bytes:
            splits.append((lo, i + 1))
            lo, acc = i + 1, 0
    if lo < n:
        splits.append((lo, n))
    if partitions is not None and len(splits) < partitions:
        # re-split evenly when the caller wants more parallelism
        per = max(1, n // partitions)
        splits = [(s, min(s + per, n)) for s in range(0, n, per)]

    dbf_layout = _dbf_layout(shp_path)
    offs, lens = idx[:, 0], idx[:, 1]

    idx_df = spark.createDataFrame([(int(a), int(b)) for a, b in splits], "lo long, hi long")
    if partitions:
        idx_df = idx_df.repartition(min(partitions, len(splits)))

    def _decode(batches):
        with open(shp_path, "rb") as f:
            dbf_f = open(dbf_layout[0], "rb") if dbf_layout else None
            try:
                for pdf in batches:
                    for lo_, hi_ in zip(pdf["lo"], pdf["hi"]):
                        lo_, hi_ = int(lo_), int(hi_)
                        span0 = int(offs[lo_])
                        span1 = int(offs[hi_ - 1] + lens[hi_ - 1])
                        f.seek(span0)
                        blob = f.read(span1 - span0)
                        rows = {"fid": [], "kind": [], "geom_wkt": []}
                        for i in range(lo_, hi_):
                            a = int(offs[i]) - span0
                            content = blob[a + 8 : a + int(lens[i])]
                            dec = _decode_record(content, epsg)
                            if dec is None:
                                continue
                            rows["fid"].append(i + 1)  # .shp record numbers are 1-based
                            rows["kind"].append(dec[0])
                            rows["geom_wkt"].append(dec[1])
                        attrs = _dbf_attrs(dbf_f, dbf_layout, rows["fid"]) if dbf_layout else \
                            [{} for _ in rows["fid"]]
                        yield pd.DataFrame({**rows, "attrs": attrs})
            finally:
                if dbf_f:
                    dbf_f.close()

    return idx_df.mapInPandas(_decode, schema)


def _dbf_attrs(dbf_f, layout, fids: list[int]) -> list[dict]:
    """Fixed-width .dbf rows for 1-based fids → attr dicts (empty values
    dropped). One contiguous read per task; numpy-sliced field columns."""
    _, hdr_size, rec_size, fields = layout
    if not fids:
        return []
    lo, hi = min(fids) - 1, max(fids)
    dbf_f.seek(hdr_size + lo * rec_size)
    raw = dbf_f.read((hi - lo) * rec_size)
    rows = np.frombuffer(raw.ljust((hi - lo) * rec_size, b" "), dtype="S1").reshape(hi - lo, rec_size)
    cols = {}
    for name, off, flen in fields:
        col = rows[:, off : off + flen].view(f"S{flen}").ravel()
        cols[name] = [v.decode("latin-1").strip() for v in col]
    out = []
    for fid in fids:
        r = fid - 1 - lo
        out.append({k: v[r] for k, v in cols.items() if v[r]})
    return out


# ------------------------------------------------- pipeline adapters

def shapefile_to_documents(spark, shp_path: str, source: str,
                           partitions: int | None = None,
                           elem_id_attr: str | None = None,
                           keep_attrs: bool = True):
    """Shapefile → canonical documents(doc_id, spans) rows for the given
    source name (e.g. 'water_polygons' — OpenMapTilesProfile.java:50-53),
    FIXTURES.md §1 span encoding. elem_id = the named dbf attr when given
    (lake_centerline carries the lake's OSM id in OSM_ID), else the 1-based
    .shp record number."""
    from pyspark.sql import functions as F

    from ..spans import reencode_spans

    df = read_shapefile(spark, shp_path, partitions)
    if elem_id_attr:
        # cast each branch BEFORE coalescing: a non-numeric attr value
        # must fall through to the fid, not become a NULL elem_id
        elem_id = F.coalesce(
            F.element_at("attrs", elem_id_attr).cast("long"),
            F.element_at("attrs", elem_id_attr.lower()).cast("long"),
            F.col("fid"),
        )
    else:
        elem_id = F.col("fid")
    feat = df.select(
        elem_id.alias("elem_id"),
        F.lit(source).alias("source"),
        F.lit("").alias("source_layer"),
        (F.col("attrs") if keep_attrs
         else F.create_map().cast("map<string,string>")).alias("tags"),
        "geom_wkt",
        F.array().cast(
            "array<struct<rel_id:long,role:string,rel_tags:map<string,string>>>"
        ).alias("rels"),
        F.array().cast("array<string>").alias("media_refs"),
    )
    return feat.select(
        F.concat_ws("/", F.lit(source), F.lit("shp"), F.col("elem_id").cast("string")).alias("doc_id"),
        reencode_spans().alias("spans"),
    )


def shapefile_to_lake_centerlines(spark, shp_path: str):
    """lake_centerline.shp → lake_centerlines documents whose elem_id is
    the lake's OSM id (OSM_ID dbf field of the real export) — the key the
    J7 centerline⋈polygon join matches on (layers/water_name.py)."""
    return shapefile_to_documents(
        spark, shp_path, "lake_centerlines",
        elem_id_attr="OSM_ID", keep_attrs=False)

"""OSM PBF source connector: pure-python codec + block-parallel Spark read.

Reads a `.osm.pbf` file (the reference pipeline's primary input — the OSM
source is declared at `OpenMapTilesProfile.java:50-53`; the decode itself
lives in planetiler-core's OsmInputFile/PbfDecoder, re-expressed here from
the published format spec, https://wiki.openstreetmap.org/wiki/PBF_Format)
and materializes the engine's canonical `documents(doc_id, spans)` table
(FIXTURES.md §1), so the whole existing pipeline runs unchanged on a real
OSM extract.

Scale design (100 TB / planet-file shape):

- The file is a sequence of independently-decodable blobs (~8k entities
  each). `scan_blob_index` reads ONLY the 4-byte length prefixes plus the
  tiny BlobHeaders (seeking past every data payload), so indexing a planet
  file touches a few MB. The index rows are then parallelized across
  executors and each task seeks+decodes its own blobs via `mapInPandas`
  (Arrow-batched) — the same block-parallel shape as planetiler's worker
  pool, but elastic across a cluster. For object stores, the index scan
  itself can be range-partitioned (blobs are self-delimiting), noted here
  but unnecessary at sandbox scale.
- Way geometry assembly (the reference's pass-2 node-location lookup,
  planetiler's LongLongMap) is a distributed equi-join: posexplode(way
  refs) ⋈ node locations, re-assembled order-preserving with one
  array_sort(collect_list(struct(pos,…))) — no driver state, no
  node-location map in RAM.
- All per-byte work (varint/zigzag/delta decode) happens once per blob in
  numpy-backed python inside the Arrow batch; everything after the typed
  entity tables exist is whole-stage-codegen Catalyst.

The writer half (`write_osm_pbf`) exists for fixtures and tests: the
sandbox has no real extract, so tests hand-build tiny pbf files byte-by-byte
(wire-format vectors) and round-trip synthetic extracts. It is also a
legitimate mini-sink (DenseNodes, delta coding, string tables, zlib).
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterable, Iterator

import numpy as np

# ---------------------------------------------------------------- wire codec

_U64_MASK = (1 << 64) - 1


def _read_varint(buf, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v & _U64_MASK, i
        shift += 7


def _scan_fields(buf) -> Iterator[tuple[int, int, object]]:
    """Yield (field_no, wire_type, value). Length-delimited values are
    memoryview slices (zero-copy)."""
    mv = memoryview(buf)
    i, n = 0, len(mv)
    while i < n:
        key, i = _read_varint(mv, i)
        field, wtype = key >> 3, key & 7
        if wtype == 0:
            v, i = _read_varint(mv, i)
            yield field, 0, v
        elif wtype == 2:
            ln, i = _read_varint(mv, i)
            yield field, 2, mv[i : i + ln]
            i += ln
        elif wtype == 5:
            yield field, 5, int.from_bytes(mv[i : i + 4], "little")
            i += 4
        elif wtype == 1:
            yield field, 1, int.from_bytes(mv[i : i + 8], "little")
            i += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wtype}")


def _packed_varints(buf) -> np.ndarray:
    """Decode a packed repeated varint payload to uint64 — vectorized.

    Terminator bytes (high bit clear) mark each varint's last byte, so the
    start offsets follow from the terminator positions; at most 10 masked
    numpy passes then accumulate every varint's 7-bit groups at once. This
    is the per-byte hot path of a planet-file decode (DenseNodes ids/lats/
    lons/keys_vals are all packed varints), so it must not run a python
    loop per byte."""
    a = np.frombuffer(buf, dtype=np.uint8)
    if a.size == 0:
        return np.array([], dtype=np.uint64)
    if a[-1] >= 0x80:
        raise ValueError("truncated varint payload (trailing continuation byte)")
    ends = np.nonzero(a < 0x80)[0]
    starts = np.empty_like(ends)
    if ends.size:
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    active = np.arange(ends.size)
    k = 0
    while active.size:
        pos = starts[active] + k
        b = a[pos].astype(np.uint64)
        vals[active] |= (b & np.uint64(0x7F)) << np.uint64(7 * k)
        k += 1
        active = active[pos < ends[active]]
    return vals


def _zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (-(u & np.uint64(1)).astype(np.int64)).astype(np.uint64)).astype(np.int64)


def _packed_sints(buf) -> np.ndarray:
    return _zigzag_decode(_packed_varints(buf))


# writer primitives ----------------------------------------------------------


def _varint(v: int) -> bytes:
    v &= _U64_MASK
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _field(field: int, wtype: int) -> bytes:
    return _varint(field << 3 | wtype)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _field(field, 2) + _varint(len(payload)) + bytes(payload)


def _varint_field(field: int, v: int) -> bytes:
    return _field(field, 0) + _varint(v)


def _packed(field: int, values: Iterable[int], zz: bool = False) -> bytes:
    body = b"".join(_varint(_zigzag(v) if zz else v) for v in values)
    return _len_delim(field, body)


# ------------------------------------------------------------- file framing


def scan_blob_index(path: str) -> list[dict]:
    """Index the blob stream touching only headers: [{seq, type, offset,
    size}] where offset/size frame the Blob message (not its header)."""
    index = []
    seq = 0
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                break
            hlen = struct.unpack(">i", raw)[0]
            header = f.read(hlen)
            btype, datasize = "", 0
            for field, _, val in _scan_fields(header):
                if field == 1:
                    btype = bytes(val).decode()
                elif field == 3:
                    datasize = val
            offset = f.tell()
            index.append({"seq": seq, "type": btype, "offset": offset, "size": datasize})
            f.seek(datasize, 1)
            seq += 1
    return index


def read_blob(f, offset: int, size: int) -> bytes:
    """Read + decompress one Blob message."""
    f.seek(offset)
    raw_out = None
    for field, _, val in _scan_fields(f.read(size)):
        if field == 1:  # raw
            raw_out = bytes(val)
        elif field == 3:  # zlib_data
            raw_out = zlib.decompress(bytes(val))
    if raw_out is None:
        raise ValueError("Blob carries no raw/zlib payload (unsupported codec)")
    return raw_out


# --------------------------------------------------------------- block parse


def parse_header_block(data: bytes) -> dict:
    feats = []
    bbox = None
    for field, _, val in _scan_fields(data):
        if field == 4:
            feats.append(bytes(val).decode())
        elif field == 1:
            vals = {f: v for f, _, v in _scan_fields(val) if f in (1, 2, 3, 4)}
            bbox = tuple(
                _zigzag_decode(np.array([vals.get(k, 0)], dtype=np.uint64))[0] * 1e-9
                for k in (1, 2, 3, 4)
            )
    return {"required_features": feats, "bbox": bbox}


def parse_primitive_block(data: bytes) -> dict:
    """One PrimitiveBlock → typed entity dict:

    {nodes: {id:int64[], lat:f64[], lon:f64[], tags:list[list[(k,v)]]},
     ways:  list[(id, tags, refs int64[])],
     rels:  list[(id, tags, members list[(memid, role, mtype)])]}
    """
    strings: list[str] = []
    groups = []
    granularity, lat_off, lon_off = 100, 0, 0
    for field, _, val in _scan_fields(data):
        if field == 1:  # stringtable
            strings = [bytes(v).decode("utf-8", "replace") for f, _, v in _scan_fields(val) if f == 1]
        elif field == 2:
            groups.append(bytes(val))
        elif field == 17:
            granularity = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val

    node_ids, node_lat, node_lon, node_tags = [], [], [], []
    ways, rels = [], []

    def _coord(raw: np.ndarray, off: int) -> np.ndarray:
        # integer nanodegrees first, ONE float multiply after (keeps the
        # value bit-exact reproducible by the SQL oracle's replay)
        return (off + granularity * raw.astype(np.int64)).astype(np.float64) * 1e-9

    for g in groups:
        for field, _, val in _scan_fields(g):
            if field == 2:  # DenseNodes
                ids = lats = lons = kv = None
                for f2, _, v2 in _scan_fields(val):
                    if f2 == 1:
                        ids = np.cumsum(_packed_sints(v2))
                    elif f2 == 8:
                        lats = np.cumsum(_packed_sints(v2))
                    elif f2 == 9:
                        lons = np.cumsum(_packed_sints(v2))
                    elif f2 == 10:
                        kv = _packed_varints(v2).astype(np.int64)
                if ids is None:
                    continue
                node_ids.append(ids.astype(np.int64))
                node_lat.append(_coord(lats, lat_off))
                node_lon.append(_coord(lons, lon_off))
                # keys_vals: 0-terminated (k,v) runs, one run per node.
                # String index 0 is the reserved empty slot (spec), so 0
                # appears only as the per-node delimiter — find delimiters
                # in one numpy pass and build tag lists only for the nodes
                # that actually have a run (most planet nodes are untagged,
                # so the python work is proportional to TAGGED nodes).
                tags_per = [[] for _ in range(len(ids))]
                if kv is not None and len(kv) and (kv == 0).any():
                    delim = np.nonzero(kv == 0)[0]
                    run_starts = np.empty_like(delim)
                    run_starts[0] = 0
                    run_starts[1:] = delim[:-1] + 1
                    for ni in np.nonzero(delim > run_starts)[0].tolist():
                        run = kv[run_starts[ni]:delim[ni]]
                        tags_per[ni] = [
                            (strings[run[j]], strings[run[j + 1]])
                            for j in range(0, len(run), 2)
                        ]
                node_tags.extend(tags_per)
            elif field == 1:  # plain Node
                nid = lat = lon = 0
                keys = vals_ = np.array([], dtype=np.uint64)
                for f2, w2, v2 in _scan_fields(val):
                    if f2 == 1:
                        nid = _zigzag_decode(np.array([v2], dtype=np.uint64))[0]
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals_ = _packed_varints(v2)
                    elif f2 == 8:
                        lat = _zigzag_decode(np.array([v2], dtype=np.uint64))[0]
                    elif f2 == 9:
                        lon = _zigzag_decode(np.array([v2], dtype=np.uint64))[0]
                node_ids.append(np.array([nid], dtype=np.int64))
                node_lat.append(_coord(np.array([lat]), lat_off))
                node_lon.append(_coord(np.array([lon]), lon_off))
                node_tags.append([(strings[k], strings[v]) for k, v in zip(keys, vals_)])
            elif field == 3:  # Way
                wid = 0
                keys = vals_ = np.array([], dtype=np.uint64)
                refs = np.array([], dtype=np.int64)
                for f2, _, v2 in _scan_fields(val):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals_ = _packed_varints(v2)
                    elif f2 == 8:
                        refs = np.cumsum(_packed_sints(v2))
                ways.append((int(wid), [(strings[k], strings[v]) for k, v in zip(keys, vals_)], refs))
            elif field == 4:  # Relation
                rid = 0
                keys = vals_ = roles = types = np.array([], dtype=np.uint64)
                memids = np.array([], dtype=np.int64)
                for f2, _, v2 in _scan_fields(val):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals_ = _packed_varints(v2)
                    elif f2 == 8:
                        roles = _packed_varints(v2)
                    elif f2 == 9:
                        memids = np.cumsum(_packed_sints(v2))
                    elif f2 == 10:
                        types = _packed_varints(v2)
                members = [
                    (int(m), strings[r], int(t))
                    for m, r, t in zip(memids, roles, types)
                ]
                rels.append((int(rid), [(strings[k], strings[v]) for k, v in zip(keys, vals_)], members))

    nodes = {
        "id": np.concatenate(node_ids) if node_ids else np.array([], dtype=np.int64),
        "lat": np.concatenate(node_lat) if node_lat else np.array([], dtype=np.float64),
        "lon": np.concatenate(node_lon) if node_lon else np.array([], dtype=np.float64),
        "tags": node_tags,
    }
    return {"nodes": nodes, "ways": ways, "rels": rels}


# -------------------------------------------------------------------- writer


def _string_table(entity_tags: list) -> tuple[dict, bytes]:
    """index ''=0 first (spec: index 0 unused/empty)."""
    idx = {"": 0}
    for tags in entity_tags:
        for k, v in tags:
            idx.setdefault(k, len(idx))
            idx.setdefault(v, len(idx))
    body = b"".join(_len_delim(1, s.encode()) for s in idx)
    return idx, _len_delim(1, body)


def _blob(btype: str, payload: bytes) -> bytes:
    gz = zlib.compress(payload, 6)
    blob = _varint_field(2, len(payload)) + _len_delim(3, gz)
    header = _len_delim(1, btype.encode()) + _varint_field(3, len(blob))
    return struct.pack(">i", len(header)) + header + blob


def write_osm_pbf(path: str, nodes=(), ways=(), relations=(), block_size: int = 8000,
                  granularity: int = 100) -> None:
    """Write a .osm.pbf. nodes: (id, lat, lon, tags:list[(k,v)]); ways:
    (id, tags, refs); relations: (id, tags, members:list[(memid, role,
    mtype)]). Entities are written in blocks of `block_size` (DenseNodes for
    nodes), ids must be sorted ascending within each entity kind."""
    nodes, ways, relations = list(nodes), list(ways), list(relations)
    out = [_blob("OSMHeader",
                 _len_delim(4, b"OsmSchema-V0.6") + _len_delim(4, b"DenseNodes"))]

    for i in range(0, len(nodes), block_size):
        chunk = nodes[i : i + block_size]
        idx, st = _string_table([t for *_, t in chunk])
        ids = [n[0] for n in chunk]
        lat_raw = [round(n[1] * 1e9) // granularity for n in chunk]
        lon_raw = [round(n[2] * 1e9) // granularity for n in chunk]
        kv = []
        for *_, tags in chunk:
            for k, v in tags:
                kv += [idx[k], idx[v]]
            kv.append(0)
        dense = (
            _packed(1, np.diff([0] + ids).tolist(), zz=True)
            + _packed(8, np.diff([0] + lat_raw).tolist(), zz=True)
            + _packed(9, np.diff([0] + lon_raw).tolist(), zz=True)
            + (_packed(10, kv) if any(kv) else b"")
        )
        body = st + _len_delim(2, _len_delim(2, dense))
        if granularity != 100:
            body += _varint_field(17, granularity)
        out.append(_blob("OSMData", body))

    for i in range(0, len(ways), block_size):
        chunk = ways[i : i + block_size]
        idx, st = _string_table([t for _, t, _ in chunk])
        grp = b""
        for wid, tags, refs in chunk:
            msg = _varint_field(1, wid)
            if tags:
                msg += _packed(2, [idx[k] for k, _ in tags])
                msg += _packed(3, [idx[v] for _, v in tags])
            msg += _packed(8, np.diff([0] + list(refs)).tolist(), zz=True)
            grp += _len_delim(3, msg)
        out.append(_blob("OSMData", st + _len_delim(2, grp)))

    for i in range(0, len(relations), block_size):
        chunk = relations[i : i + block_size]
        all_tags = [t for _, t, _ in chunk] + [
            [(r, r) for _, r, _ in members] for _, _, members in chunk
        ]
        idx, st = _string_table(all_tags)
        grp = b""
        for rid, tags, members in chunk:
            msg = _varint_field(1, rid)
            if tags:
                msg += _packed(2, [idx[k] for k, _ in tags])
                msg += _packed(3, [idx[v] for _, v in tags])
            if members:
                msg += _packed(8, [idx[r] for _, r, _ in members])
                msg += _packed(9, np.diff([0] + [m for m, _, _ in members]).tolist(), zz=True)
                msg += _packed(10, [t for _, _, t in members])
            grp += _len_delim(4, msg)
        out.append(_blob("OSMData", st + _len_delim(2, grp)))

    with open(path, "wb") as f:
        for blob in out:
            f.write(blob)


# ------------------------------------------------------- Spark distributed read

# Persisted DataFrames pinned by pbf_to_documents (decoded entities, the
# shared way-point join). The pipeline calls release_caches() once derived
# tables (decoded spans / layer checkpoints) are materialized on disk —
# re-executing the documents plan afterwards is still correct, it just
# re-decodes; keeping dead caches resident squeezes executor execution
# memory for the render/reduce phases (same rationale as the pipeline's
# ctx.features.unpersist()).
_CACHES: list = []
# memoized documents plans keyed by (session, path, partitions, mtime):
# load_documents runs 2-3x per build (invariant check, context build), and
# each fresh pbf_to_documents would otherwise pin its own entity/way-point
# caches for identical plans
_DOCS_CACHE: dict = {}


def release_caches() -> None:
    _DOCS_CACHE.clear()
    while _CACHES:
        try:
            _CACHES.pop().unpersist()
        except Exception:
            pass

_ENTITY_SCHEMA = (
    "etype int, id long, lat double, lon double, "
    "tags array<struct<key:string,value:string>>, refs array<long>, "
    "members array<struct<memid:long,role:string,mtype:int>>"
)


def read_osm_entities(spark, path: str, partitions: int | None = None):
    """path → one typed entity DataFrame (etype 0=node 1=way 2=relation).

    Block-parallel: the driver indexes blob offsets (headers only), then
    each executor task seeks into the file and decodes its own blobs inside
    an Arrow-batched `mapInPandas`. No entity ever passes through the
    driver."""
    import pandas as pd
    from pyspark.sql import functions as F

    index = [b for b in scan_blob_index(path) if b["type"] == "OSMData"]
    if not index:
        return spark.createDataFrame([], _ENTITY_SCHEMA)
    if partitions is None:
        partitions = min(len(index), spark.sparkContext.defaultParallelism)
    idx_df = spark.createDataFrame(
        [(b["offset"], b["size"]) for b in index], "offset long, size long"
    ).repartition(partitions)

    _EMPTY: list = []  # shared read-only placeholder (Arrow never mutates)

    def _tagdicts(tags):
        return [{"key": k, "value": v} for k, v in tags] if tags else _EMPTY

    def _decode(batches):
        # Columnar emission: nodes dominate a planet file ~10:1, so the
        # node columns pass straight through as numpy arrays — the only
        # per-node python cost is the tag-dict build for TAGGED nodes.
        # Ways/relations are 10x fewer; a per-entity loop is fine there.
        with open(path, "rb") as f:
            for pdf in batches:
                for off, size in zip(pdf["offset"], pdf["size"]):
                    block = parse_primitive_block(read_blob(f, int(off), int(size)))
                    nd = block["nodes"]
                    n = len(nd["id"])
                    if n:
                        yield pd.DataFrame({
                            "etype": np.zeros(n, dtype=np.int32),
                            "id": nd["id"],
                            "lat": nd["lat"],
                            "lon": nd["lon"],
                            "tags": [_tagdicts(t) for t in nd["tags"]],
                            "refs": [_EMPTY] * n,
                            "members": [_EMPTY] * n,
                        })
                    ways, rels = block["ways"], block["rels"]
                    if ways:
                        nw = len(ways)
                        yield pd.DataFrame({
                            "etype": np.full(nw, 1, dtype=np.int32),
                            "id": np.array([w[0] for w in ways], dtype=np.int64),
                            "lat": pd.Series([None] * nw, dtype=object),
                            "lon": pd.Series([None] * nw, dtype=object),
                            "tags": [_tagdicts(t) for _, t, _ in ways],
                            "refs": [r.astype(np.int64).tolist() for *_, r in ways],
                            "members": [_EMPTY] * nw,
                        })
                    if rels:
                        nr = len(rels)
                        yield pd.DataFrame({
                            "etype": np.full(nr, 2, dtype=np.int32),
                            "id": np.array([r[0] for r in rels], dtype=np.int64),
                            "lat": pd.Series([None] * nr, dtype=object),
                            "lon": pd.Series([None] * nr, dtype=object),
                            "tags": [_tagdicts(t) for _, t, _ in rels],
                            "refs": [_EMPTY] * nr,
                            "members": [
                                [{"memid": m, "role": role, "mtype": mt}
                                 for m, role, mt in members]
                                for *_, members in rels
                            ],
                        })

    return idx_df.mapInPandas(_decode, _ENTITY_SCHEMA)


# Keys whose presence marks a closed way as an area (imposm3 `is_area` /
# the tag families planetiler's polygon-typed mappings match on). A closed
# highway/barrier ring without area=yes stays a line (roundabouts).
_AREA_KEYS = (
    "building", "building:part", "landuse", "natural", "leisure", "amenity",
    "water", "aeroway", "boundary", "place", "shop", "tourism", "historic",
    "military", "sport", "office", "craft", "man_made", "golf",
)
# value-gated area keys: waterway=riverbank/dock are areas, waterway=river is not
_AREA_KEY_VALUES = {"waterway": ("riverbank", "dock")}


def _is_area_expr(tags):
    """Column<bool>: area semantics from tags alone (planetiler
    OsmReader.canBePolygon's area!=no arm; the per-table matchType choice
    collapses here to the imposm3 area-key heuristic because a document
    carries exactly one geometry form). Ring closure is checked separately
    on the ASSEMBLED coordinates — a truncated extract may drop the shared
    endpoint node, leaving refs closed but the coordinate ring open."""
    from pyspark.sql import functions as F

    area = F.map_from_entries(tags)["area"]
    keyed = F.exists(
        tags,
        lambda t: t["key"].isin(*_AREA_KEYS)
        | ((t["key"] == "waterway") & t["value"].isin(*_AREA_KEY_VALUES["waterway"])),
    )
    return F.when(area == "no", F.lit(False)).when(
        area == "yes", F.lit(True)).otherwise(keyed)


def way_points(entities):
    """Pass-2 node-location lookup as a distributed join (planetiler's
    LongLongMap, Spark-style): explode way refs → equi-join node coords →
    order-preserving re-assembly. Ways whose refs fall outside the extract
    keep their remaining vertices (ways left with <2 vertices drop),
    matching truncated-extract behavior. Returns (id, xs, ys)."""
    from pyspark.sql import functions as F

    nodes = entities.filter("etype = 0").select(
        F.col("id").alias("ref"), "lat", "lon")
    return (
        entities.filter("etype = 1")
        .select("id", F.posexplode("refs").alias("pos", "ref"))
        .join(nodes, "ref")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias("pts"))
        .filter(F.size("pts") >= 2)
        .select(
            "id",
            F.transform("pts", lambda p: p["lon"]).alias("xs"),
            F.transform("pts", lambda p: p["lat"]).alias("ys"),
        )
    )


def ways_with_geometry(entities, pts=None):
    """Way documents: closed rings with area semantics become POLYGONs
    (see _is_area_expr); everything else a LINESTRING.
    Returns (way_id, tags, geom_wkt). Pass a shared `pts` (way_points
    output) to avoid re-running the refs⋈nodes shuffle — the connector's
    biggest exchange — when several consumers need assembled ways."""
    from pyspark.sql import functions as F

    ways = entities.filter("etype = 1").select("id", "tags")
    pts = (pts if pts is not None else way_points(entities)).select(
        "id",
        F.array_join(
            F.zip_with(
                "xs", "ys", lambda x, y: F.format_string("%.9f %.9f", x, y)
            ),
            ", ",
        ).alias("coord_body"),
        (
            (F.size("xs") >= 4)
            & (F.element_at("xs", 1) == F.element_at("xs", -1))
            & (F.element_at("ys", 1) == F.element_at("ys", -1))
        ).alias("ring_closed"),
    )
    return (
        ways.join(pts, "id")
        .select(
            "id",
            "tags",
            F.when(
                F.col("ring_closed") & _is_area_expr(F.col("tags")),
                F.concat(F.lit("POLYGON (("), "coord_body", F.lit("))")),
            )
            .otherwise(F.concat(F.lit("LINESTRING ("), "coord_body", F.lit(")")))
            .alias("geom_wkt"),
        )
    )


# Guard against pathological member counts (the coastline-relation shape);
# planetiler similarly special-cases giant relations rather than letting one
# group dominate a task. Over-cap relations are skipped by the assembler.
_MP_MAX_MEMBER_WAYS = 4000


def _stitch_rings(segs):
    """Assemble closed rings from way segments (OsmMultipolygon ring-building
    analog): already-closed ways are rings; open ways are endpoint-walked
    into chains, reversing direction as needed. Dangling chains (extract
    truncation / broken relations) drop. Coordinates of shared endpoints are
    bit-identical (both derive from the same node's nanodegree ints), so
    exact float equality is the correct join key."""
    import numpy as np

    rings, open_segs = [], []
    for s in segs:
        s = np.asarray(s)
        if len(s) >= 4 and s[0][0] == s[-1][0] and s[0][1] == s[-1][1]:
            rings.append(s)
        elif len(s) >= 2:
            open_segs.append(s)

    from collections import defaultdict

    def key(pt):
        return (float(pt[0]), float(pt[1]))

    ends = defaultdict(list)
    for i, s in enumerate(open_segs):
        ends[key(s[0])].append(i)
        ends[key(s[-1])].append(i)
    used = set()
    for i in range(len(open_segs)):
        if i in used:
            continue
        used.add(i)
        chain = open_segs[i]
        while key(chain[0]) != key(chain[-1]):
            nxt = None
            for j in ends[key(chain[-1])]:
                if j not in used:
                    nxt = j
                    break
            if nxt is None:
                break
            used.add(nxt)
            seg = open_segs[nxt]
            if key(seg[0]) == key(chain[-1]):
                chain = np.vstack([chain, seg[1:]])
            else:
                chain = np.vstack([chain, seg[::-1][1:]])
        if len(chain) >= 4 and key(chain[0]) == key(chain[-1]):
            rings.append(chain)
    return rings


def multipolygon_geometries(entities, pts=None):
    """type=multipolygon relations → POLYGON / MULTIPOLYGON WKT with holes.

    One shuffle on rel_id, then per-relation ring assembly in an Arrow
    kernel (applyInPandas): outer-role segments stitch into outer rings,
    inner-role into holes, holes assigned to the outer ring containing
    their centroid. Relations are bounded-size groups, so this partitions
    cleanly at scale; _MP_MAX_MEMBER_WAYS guards the coastline-shaped tail.
    Returns (rel_id, geom_wkt) — relations whose rings cannot close
    (members outside the extract) are dropped, matching planetiler's
    skip-and-log on broken multipolygons."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    mp_rels = (
        entities.filter("etype = 2")
        .select("id", F.map_from_entries("tags")["type"].alias("rel_type"), "members")
        .filter(F.col("rel_type") == "multipolygon")
    )
    members = (
        mp_rels.select(F.col("id").alias("rel_id"), F.explode("members").alias("m"))
        .filter(F.col("m.mtype") == 1)
        .select("rel_id", F.col("m.memid").alias("id"), F.col("m.role").alias("role"))
    )
    segs = members.join(pts if pts is not None else way_points(entities), "id")

    out_schema = T.StructType(
        [T.StructField("rel_id", T.LongType()), T.StructField("geom_wkt", T.StringType())]
    )

    def assemble(pdf):
        import numpy as np
        import pandas as pd

        from ..geom import ops
        from ..geom import wkt as wkt_mod

        rows = []
        for rel_id, g in pdf.groupby("rel_id"):
            if len(g) > _MP_MAX_MEMBER_WAYS:
                continue
            inner_mask = g["role"].values == "inner"
            coords = [np.column_stack([np.asarray(x), np.asarray(y)])
                      for x, y in zip(g["xs"].values, g["ys"].values)]
            outers = _stitch_rings([c for c, i in zip(coords, inner_mask) if not i])
            inners = _stitch_rings([c for c, i in zip(coords, inner_mask) if i])
            if not outers:
                continue
            assigned = [[o] for o in outers]
            for inn in inners:
                c, _area = ops.ring_centroid(inn)
                for k, o in enumerate(outers):
                    if ops.point_in_ring(c, o):
                        assigned[k].append(inn)
                        break
            geom = (
                ("Polygon", assigned[0])
                if len(assigned) == 1
                else ("MultiPolygon", assigned)
            )
            rows.append((int(rel_id), wkt_mod.to_wkt(geom)))
        return pd.DataFrame(rows, columns=["rel_id", "geom_wkt"])

    return segs.groupBy("rel_id").applyInPandas(assemble, out_schema)


def pbf_to_documents(spark, path: str, partitions: int | None = None):
    """Full connector: .osm.pbf → canonical documents(doc_id, spans) table
    (FIXTURES.md §1 encoding, identical to the synthetic corpus generator).

    - tagged nodes  → POINT documents (untagged nodes are geometry-only,
      consumed by way assembly and dropped, as in the reference's pass 1)
    - ways          → LINESTRING documents, or POLYGON documents when the
      assembled ring closes and the tags carry area semantics
      (OsmReader.canBePolygon / imposm3 is_area parity — see _is_area_expr)
    - relations     → type=multipolygon relations assemble into POLYGON /
      MULTIPOLYGON documents with holes (multipolygon_geometries); all other
      relations are replayed as `rel` spans on their member-way documents
      (the engine's relation model; Transportation.java:406-416 parity)
    - untagged ways with no relation memberships drop (geometry carriers
      only — they can match no table)
    """
    from pyspark.sql import functions as F

    from ..spans import reencode_spans

    memo_key = (id(spark), os.path.abspath(path), partitions,
                os.stat(path).st_mtime_ns)
    cached = _DOCS_CACHE.get(memo_key)
    if cached is not None:
        return cached

    ents = read_osm_entities(spark, path, partitions)
    docs = entities_to_documents(spark, ents)
    _DOCS_CACHE[memo_key] = docs
    return docs


def entities_to_documents(spark, ents):
    """Entity DataFrame (``_ENTITY_SCHEMA``) → canonical documents table.
    Split out of ``pbf_to_documents`` so a MERGED entity view — base
    extract with an OsmChange diff applied (``sources/osm_osc.py``) — runs
    through the identical assembly; the file connector is just
    read + this."""
    from pyspark.sql import functions as F

    from ..spans import reencode_spans

    ents = ents.persist()
    _CACHES.append(ents)
    # ONE refs⋈nodes exchange (the connector's biggest shuffle), shared by
    # the way-document and multipolygon-assembly branches via the cache —
    # without it the duplicated join subtree executes once per branch.
    wpts = way_points(ents).persist()
    _CACHES.append(wpts)

    node_docs = (
        ents.filter("etype = 0 AND size(tags) > 0")
        .select(
            F.col("id").alias("elem_id"),
            F.map_from_entries("tags").alias("tags"),
            F.format_string("POINT (%.9f %.9f)", F.col("lon"), F.col("lat")).alias("geom_wkt"),
        )
        .withColumn("doc_id", F.concat(F.lit("osm/node/"), F.col("elem_id")))
    )

    way_geoms = ways_with_geometry(ents, wpts)

    # relation memberships, replayed onto member ways (mtype 1 = way);
    # multipolygon relations are consumed as geometry below, not as spans
    rel_spans = (
        ents.filter("etype = 2")
        .select(
            F.col("id").alias("rel_id"),
            F.map_from_entries("tags").alias("rel_tags"),
            F.explode("members").alias("m"),
        )
        .filter(F.coalesce(F.col("rel_tags")["type"], F.lit("")) != "multipolygon")
        .filter(F.col("m.mtype") == 1)
        .select(
            F.col("m.memid").alias("id"),
            F.struct("rel_id", F.col("m.role").alias("role"), "rel_tags").alias("rel"),
        )
        .groupBy("id")
        .agg(
            # comparator on rel_id only — structs holding maps are not
            # directly orderable
            F.array_sort(
                F.collect_list("rel"),
                lambda a, b: F.when(a["rel_id"] < b["rel_id"], F.lit(-1))
                .when(a["rel_id"] > b["rel_id"], F.lit(1))
                .otherwise(F.lit(0)),
            ).alias("rels")
        )
    )

    way_docs = (
        way_geoms.join(rel_spans, "id", "left")
        .select(
            F.col("id").alias("elem_id"),
            F.map_from_entries("tags").alias("tags"),
            "geom_wkt",
            F.coalesce(
                "rels",
                F.array().cast(
                    "array<struct<rel_id:long,role:string,rel_tags:map<string,string>>>"
                ),
            ).alias("rels"),
        )
        .withColumn("doc_id", F.concat(F.lit("osm/way/"), F.col("elem_id")))
        # geometry-carrier ways (no tags, no relation memberships) can match
        # no table and carry no span payload — drop them here, not downstream
        .filter((F.size("tags") > 0) | (F.size("rels") > 0))
    )

    rel_tags = (
        ents.filter("etype = 2")
        .select(F.col("id").alias("rel_id"), F.map_from_entries("tags").alias("tags"))
    )
    mp_docs = (
        multipolygon_geometries(ents, wpts)
        .join(rel_tags, "rel_id")
        .select(
            F.col("rel_id").alias("elem_id"),
            "tags",
            "geom_wkt",
        )
        .withColumn("doc_id", F.concat(F.lit("osm/relation/"), F.col("elem_id")))
    )

    empty_rels = F.array().cast(
        "array<struct<rel_id:long,role:string,rel_tags:map<string,string>>>")
    docs = (
        node_docs.withColumn("rels", empty_rels)
        .unionByName(mp_docs.withColumn("rels", empty_rels))
        .unionByName(way_docs)
        .withColumn("source", F.lit("osm"))
        .withColumn("source_layer", F.lit(""))
        .withColumn("media_refs", F.array().cast("array<string>"))
        .select("doc_id", reencode_spans().alias("spans"))
    )
    return docs

"""Deterministic synthetic interleaved-document corpus (Monaco-shaped).

Generates the engine's input table `documents(doc_id, spans)` plus the
auxiliary side tables (natural-earth-alikes, ocean water polygons, lake
centerlines, wikidata translations) per FIXTURES.md. Seeded numpy —
identical bytes for identical (seed, n_docs).

Distribution mirrors the reference's Monaco integration corpus
(OpenMapTilesTest.java:46-233): buildings ≫ highways > pois > water…, plus
two deliberate skew hot-spots to exercise salting/AQE: one coastline
mega-polygon covering the whole bbox edge and one "megacity" cell holding a
large share of POIs/buildings.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEOM_CHUNK = 2000

BBOX = (7.40, 43.72, 7.44, 43.76)  # lon0, lat0, lon1, lat1 (Monaco-ish)

HIGHWAY_CLASSES = [
    ("motorway", 0.03), ("trunk", 0.03), ("primary", 0.08), ("secondary", 0.10),
    ("tertiary", 0.10), ("residential", 0.28), ("service", 0.14), ("footway", 0.14),
    ("path", 0.06), ("cycleway", 0.04),
]
LANDCOVER = [("wood", "natural"), ("grass", "landuse"), ("meadow", "landuse"),
             ("beach", "natural"), ("scrub", "natural"), ("forest", "landuse")]
LANDUSE = ["residential", "commercial", "industrial", "cemetery", "military", "quarry"]
POI_TAGS = [("amenity", "restaurant"), ("amenity", "cafe"), ("amenity", "bank"),
            ("shop", "bakery"), ("shop", "supermarket"), ("tourism", "hotel"),
            ("amenity", "pharmacy"), ("amenity", "school"), ("leisure", "park"),
            ("railway", "station"), ("amenity", "bus_station"), ("highway", "bus_stop")]
PLACE_KINDS = [("city", 1), ("town", 4), ("village", 10), ("suburb", 8), ("hamlet", 6)]


def _ring_wkt(cx, cy, r, n=6, rot=0.0, ratio=1.0):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False) + rot
    xs = cx + r * np.cos(ang)
    ys = cy + r * ratio * np.sin(ang)
    pts = [f"{x:.7f} {y:.7f}" for x, y in zip(xs, ys)]
    pts.append(pts[0])
    return "POLYGON ((" + ", ".join(pts) + "))"


def _line_wkt(pts):
    return "LINESTRING (" + ", ".join(f"{x:.7f} {y:.7f}" for x, y in pts) + ")"


def _point_wkt(x, y):
    return f"POINT ({x:.7f} {y:.7f})"


class _DocBuilder:
    def __init__(self):
        self.doc_ids: list[str] = []
        self.spans: list[list] = []

    def add(self, source, source_layer, elem_id, tags: dict, wkt: str,
            rels: list | None = None, media: list | None = None):
        spans = [("src", f"{source}|{source_layer or ''}|{elem_id}", None)]
        for k in sorted(tags):
            v = tags[k]
            if v is not None:
                spans.append(("tag", f"{k}={v}", None))
        for i in range(0, max(len(wkt), 1), GEOM_CHUNK):
            spans.append(("geom", wkt[i : i + GEOM_CHUNK], None))
        for rel_id, role, rel_tags in rels or []:
            rel_json = json.dumps(rel_tags, sort_keys=True, separators=(",", ":"))
            spans.append(("rel", f"{rel_id}|{role}|{rel_json}", None))
        for m in media or []:
            spans.append(("media", "", m))
        self.doc_ids.append(f"{source}/{source_layer or 'osm'}/{elem_id}")
        self.spans.append(
            [{"kind": k, "text": t, "media_ref": mr, "offset": i} for i, (k, t, mr) in enumerate(spans)]
        )

    def to_table(self) -> pa.Table:
        span_t = pa.struct(
            [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
        )
        return pa.table(
            {"doc_id": pa.array(self.doc_ids, pa.string()),
             "spans": pa.array(self.spans, pa.list_(span_t))}
        )


def generate_corpus(n_docs: int = 2000, seed: int = 42,
                    hot_frac: float = 0.35, hot_r_scale: float = 1.0):
    """Returns (documents pa.Table, side_tables dict[str, pa.Table]).

    The bbox grows with sqrt(n_docs/2000) so feature density stays
    Monaco-like at every scale — tile counts then scale linearly with the
    corpus, keeping tiles/sec meaningful and the per-tile reduce realistic
    (the skew hot-spots remain deliberately dense)."""
    rng = np.random.default_rng(seed)
    lon0, lat0, lon1, lat1 = BBOX
    import math as _math

    _scale = _math.sqrt(max(n_docs, 1) / 2000.0)
    lon1 = lon0 + (lon1 - lon0) * _scale
    lat1 = lat0 + (lat1 - lat0) * _scale
    w, h = lon1 - lon0, lat1 - lat0
    b = _DocBuilder()
    next_id = [1000]

    def nid():
        next_id[0] += 1
        return next_id[0]

    # megacity hot cell: `hot_frac` of point-ish features inside this
    # small box (defaults produce the committed fixtures; the skew
    # rehearsal raises hot_frac and shrinks the radius for ~10x density —
    # density scales as hot_frac / hot_r_scale^2)
    mc_x, mc_y = lon0 + 0.62 * w, lat0 + 0.41 * h
    mc_r = 0.02 * w * hot_r_scale

    def pt(hot_frac=hot_frac):
        if rng.random() < hot_frac:
            return mc_x + (rng.random() - 0.5) * mc_r, mc_y + (rng.random() - 0.5) * mc_r
        return lon0 + rng.random() * w, lat0 + rng.random() * h

    n_building = int(n_docs * 0.40)
    n_highway = int(n_docs * 0.18)
    n_poi = int(n_docs * 0.14)
    n_water = int(n_docs * 0.05)
    n_landcover = int(n_docs * 0.06)
    n_landuse = int(n_docs * 0.04)
    n_house = int(n_docs * 0.05)
    n_waterway = int(n_docs * 0.03)
    n_peak = int(n_docs * 0.02)
    n_place = max(int(n_docs * 0.01), 5)
    n_park = max(int(n_docs * 0.01), 3)
    n_aero = max(int(n_docs * 0.005), 2)
    n_boundary = max(int(n_docs * 0.01), 4)

    streets = [f"Rue {c}" for c in "ABCDEFGHJK"]

    # --- buildings (some with housenumbers, some part of building relations)
    for i in range(n_building):
        x, y = pt()
        r = 0.00006 + rng.random() * 0.00018
        tags = {"building": rng.choice(["yes", "apartments", "house", "commercial"]).item()}
        if rng.random() < 0.4:
            tags["height"] = f"{int(3 + rng.random() * 80)}"
        if rng.random() < 0.25:
            tags["addr:housenumber"] = str(int(1 + rng.random() * 200))
            tags["addr:street"] = streets[int(rng.random() * len(streets))]
        media = [f"img://{rng.integers(0, 1 << 48):012x}"] if rng.random() < 0.1 else None
        rels = None
        if rng.random() < 0.05:
            rels = [(9000 + int(rng.random() * 50), "outline", {"type": "building"})]
        b.add("osm", None, nid(), tags, _ring_wkt(x, y, r, n=4, rot=rng.random()), rels, media)

    # --- highways (route relations on ~15%)
    for i in range(n_highway):
        x, y = pt(0.25)
        cls = rng.choice([c for c, _ in HIGHWAY_CLASSES], p=[p for _, p in HIGHWAY_CLASSES]).item()
        npts = 2 + int(rng.random() * 4)
        ang = rng.random() * np.pi
        step = 0.0006 + rng.random() * 0.0025
        pts = [(x + i2 * step * np.cos(ang) + (rng.random() - 0.5) * 0.0002,
                y + i2 * step * np.sin(ang) + (rng.random() - 0.5) * 0.0002) for i2 in range(npts)]
        tags = {"highway": cls}
        if rng.random() < 0.5:
            tags["name"] = f"{streets[int(rng.random() * len(streets))]} {i % 97}"
        if rng.random() < 0.2:
            tags["surface"] = rng.choice(["asphalt", "gravel", "dirt", "paved"]).item()
        if rng.random() < 0.12:
            tags["oneway"] = "yes"
        if rng.random() < 0.08:
            tags["bridge"] = "yes"
        if cls in ("motorway", "trunk", "primary") and rng.random() < 0.6:
            tags["ref"] = f"A{int(rng.random() * 90)}"
        rels = None
        if rng.random() < 0.15:
            net = rng.choice(["iwn", "nwn", "rwn", "lwn"]).item() if cls in ("path", "footway") else \
                rng.choice(["e-road", "US:I", "US:US", "ncn"]).item()
            rels = [(8000 + int(rng.random() * 40), "",
                     {"type": "route", "route": "hiking" if net.endswith("wn") else "road",
                      "network": net, "ref": f"R{int(rng.random() * 50)}"})]
        b.add("osm", None, nid(), tags, _line_wkt(pts), rels)

    # --- POIs
    for i in range(n_poi):
        x, y = pt(0.5)
        k, v = POI_TAGS[int(rng.random() * len(POI_TAGS))]
        tags = {k: v}
        if rng.random() < 0.7:
            tags["name"] = f"POI {v} {i}"
        if v in ("station", "bus_station", "bus_stop") and rng.random() < 0.5:
            tags["uic_ref"] = str(7000 + i % 40)
            tags["network"] = "CityNet"
        b.add("osm", None, nid(), tags, _point_wkt(x, y))

    # --- OSM water polygons; a few share names with NE lakes for id backfill
    lake_names = [f"Lac {chr(65 + i)}" for i in range(8)]
    osm_lakes = []
    for i in range(n_water):
        x, y = pt(0.0)
        r = 0.0004 + rng.random() * 0.003
        tags = {"natural": "water"}
        if rng.random() < 0.35:
            tags["water"] = rng.choice(["pond", "river", "basin", "canal"]).item()
        if i < len(lake_names) and rng.random() < 0.8:
            tags["name"] = lake_names[i]
        eid = nid()
        osm_lakes.append((eid, x, y, r, tags.get("name")))
        b.add("osm", None, eid, tags, _ring_wkt(x, y, r, n=10, rot=rng.random()))

    # --- landcover / landuse
    for i in range(n_landcover):
        x, y = pt(0.0)
        v, k = LANDCOVER[int(rng.random() * len(LANDCOVER))]
        b.add("osm", None, nid(), {k: v}, _ring_wkt(x, y, 0.0005 + rng.random() * 0.004, n=8))
    for i in range(n_landuse):
        x, y = pt(0.2)
        b.add("osm", None, nid(), {"landuse": LANDUSE[int(rng.random() * len(LANDUSE))]},
              _ring_wkt(x, y, 0.0008 + rng.random() * 0.004, n=8))

    # --- standalone housenumbers
    for i in range(n_house):
        x, y = pt(0.4)
        tags = {"addr:housenumber": str(int(1 + rng.random() * 300))}
        if rng.random() < 0.7:
            tags["addr:street"] = streets[int(rng.random() * len(streets))]
        b.add("osm", None, nid(), tags, _point_wkt(x, y))

    # --- waterways (rivers as relations of member ways)
    for i in range(n_waterway):
        x, y = pt(0.0)
        pts = [(x + j * 0.002, y + np.sin(j * 0.8) * 0.0008) for j in range(4)]
        tags = {"waterway": rng.choice(["river", "stream", "canal"]).item()}
        if rng.random() < 0.6:
            tags["name"] = f"Riviere {i % 12}"
        rels = None
        if rng.random() < 0.4:
            rels = [(7000 + i % 10, "main_stream", {"type": "waterway", "name": f"Riviere {i % 12}"})]
        b.add("osm", None, nid(), tags, _line_wkt(pts), rels)

    # --- peaks
    for i in range(n_peak):
        x, y = pt(0.0)
        tags = {"natural": "peak", "ele": str(int(200 + rng.random() * 2800))}
        if rng.random() < 0.6:
            tags["name"] = f"Mont {i}"
        if rng.random() < 0.3:
            tags["wikipedia"] = f"fr:Mont {i}"
        b.add("osm", None, nid(), tags, _point_wkt(x, y))

    # --- places
    pi = 0
    for kind, count in PLACE_KINDS:
        for j in range(count):
            x, y = pt(0.3 if kind in ("suburb",) else 0.0)
            tags = {"place": kind, "name": f"{kind.title()} {pi}"}
            if kind in ("city", "town"):
                tags["population"] = str(int(10000 + rng.random() * 900000))
                if pi == 0:
                    tags["capital"] = "yes"
                    tags["wikidata"] = "Q1000"
            b.add("osm", None, nid(), tags, _point_wkt(x, y))
            pi += 1

    # --- parks
    for i in range(n_park):
        x, y = pt(0.0)
        tags = {"boundary": "national_park" if i % 2 == 0 else "protected_area",
                "name": f"Parc {i}", "protect_class": str(2 + i % 5)}
        b.add("osm", None, nid(), tags, _ring_wkt(x, y, 0.002 + rng.random() * 0.005, n=9))

    # --- aeroway
    for i in range(n_aero):
        x, y = pt(0.0)
        tags = {"aeroway": "aerodrome", "name": f"Aerodrome {i}", "iata": f"X{chr(65 + i % 26)}A",
                "icao": f"LFX{chr(65 + i % 26)}", "aerodrome:type": "international", "ele": "12"}
        b.add("osm", None, nid(), tags, _ring_wkt(x, y, 0.003, n=8))
        b.add("osm", None, nid(), {"aeroway": "runway", "ref": f"{i}L"},
              _line_wkt([(x - 0.002, y), (x + 0.002, y)]))

    # --- admin boundary ways (members of boundary relations)
    for i in range(n_boundary):
        x, y = lon0 + (i + 0.5) * w / n_boundary, lat0 + 0.5 * h
        pts = [(x, y - 0.01), (x, y + 0.01)]
        rels = [(6000 + i // 2, "",
                 {"type": "boundary", "boundary": "administrative",
                  "admin_level": "4" if i % 3 else "2", "name": f"Region {i // 2}"})]
        b.add("osm", None, nid(), {"boundary": "administrative", "admin_level": "4" if i % 3 else "2"},
              _line_wkt(pts), rels)

    # --- coastline mega-polygon skew hotspot (water_polygons source = ocean)
    coast = [(lon0 - 0.01, lat0 - 0.01)]
    n_coast = 400
    for j in range(n_coast + 1):
        coast.append((lon0 + w * j / n_coast,
                      lat0 + 0.15 * h + 0.05 * h * np.sin(j * 0.3) + 0.01 * rng.random()))
    coast += [(lon1 + 0.01, lat0 - 0.01), (lon0 - 0.01, lat0 - 0.01)]
    ocean_wkt = "POLYGON ((" + ", ".join(f"{x:.7f} {y:.7f}" for x, y in coast) + "))"
    b.add("water_polygons", None, 1, {}, ocean_wkt)

    # --- natural earth rows as documents (source dispatch by source_layer)
    ne_rows = []
    ne_id = 170000
    for table, cnt in [("ne_110m_ocean", 1), ("ne_50m_ocean", 1), ("ne_10m_ocean", 1)]:
        ne_id += 1
        wkt = _ring_wkt((lon0 + lon1) / 2, lat0 - 0.05, 0.2, n=12)
        b.add("natural_earth", table, ne_id, {}, wkt)
        ne_rows.append((table, ne_id, wkt, {}))
    for i, table in enumerate(["ne_110m_lakes", "ne_50m_lakes", "ne_10m_lakes"]):
        # NE lakes co-located with the first OSM lakes so intersection matching fires
        for j in range(2 + i):
            k = (i * 2 + j) % max(len(osm_lakes), 1)
            eid, x, y, r, name = osm_lakes[k] if osm_lakes else (0, mc_x, mc_y, 0.001, None)
            ne_id += 1
            wkt = _ring_wkt(x, y, r * 1.1, n=10, rot=0.3)
            tags = {"ne_id": str(ne_id)}
            if name and j % 2 == 0:
                tags["name"] = name
            b.add("natural_earth", table, ne_id, tags, wkt)
            ne_rows.append((table, ne_id, wkt, tags))
    # NE admin-0 countries (PIP targets) and populated places (city join)
    for i, iso in enumerate(["MC", "FR", "IT"]):
        ne_id += 1
        wkt = _ring_wkt(lon0 + (0.2 + 0.3 * i) * w, lat0 + 0.5 * h, 0.3 * w, n=6)
        tags = {"name": f"Country {iso}", "iso_a2": iso, "scalerank": "1", "labelrank": str(2 + i)}
        b.add("natural_earth", "ne_10m_admin_0_countries", ne_id, tags, wkt)
        ne_rows.append(("ne_10m_admin_0_countries", ne_id, wkt, tags))
    for i in range(6):
        ne_id += 1
        # co-locate with generated cities (deterministic reuse of pt stream not
        # possible here, so place on a grid near center — kNN join radius 50km)
        wkt = _point_wkt(lon0 + (0.1 + 0.15 * i) * w, lat0 + 0.55 * h)
        tags = {"name": f"City {i}", "scalerank": str(i % 10), "wikidataid": "Q1000" if i == 0 else f"Q{2000 + i}"}
        b.add("natural_earth", "ne_10m_populated_places", ne_id, tags, wkt)
        ne_rows.append(("ne_10m_populated_places", ne_id, wkt, tags))

    # --- lake centerlines for the first 2 named lakes
    lc_rows = []
    for eid, x, y, r, name in osm_lakes[:2]:
        wkt = _line_wkt([(x - r, y), (x + r, y)])
        b.add("lake_centerlines", None, eid, {}, wkt)
        lc_rows.append((eid, wkt))

    docs = b.to_table()
    side = {
        "natural_earth": pa.table(
            {
                "table": pa.array([r[0] for r in ne_rows]),
                "ne_id": pa.array([r[1] for r in ne_rows], pa.int64()),
                "geom_wkt": pa.array([r[2] for r in ne_rows]),
                "tags": pa.array([r[3] for r in ne_rows], pa.map_(pa.string(), pa.string())),
            }
        ),
        "lake_centerlines": pa.table(
            {
                "osm_id": pa.array([r[0] for r in lc_rows], pa.int64()),
                "geom_wkt": pa.array([r[1] for r in lc_rows]),
            }
        ),
        "wikidata": pa.table(
            {
                "qid": pa.array(["Q1000", "Q1000", "Q1000"]),
                "lang": pa.array(["es", "de", "ja"]),
                "name": pa.array(["Ciudad 0", "Stadt 0", "都市0"]),
            }
        ),
    }
    return docs, side


def write_corpus(out_dir: str, n_docs: int = 2000, seed: int = 42,
                 hot_frac: float = 0.35, hot_r_scale: float = 1.0) -> str:
    """Write documents.parquet + side tables; cached by (n_docs, seed).

    documents.parquet is written with bounded row groups (16 Ki rows): a
    single-row-group file defeats Spark's byte-range splitting (all rows
    land in the split containing the row-group start, every downstream
    narrow stage runs one task), which is a fixture artifact no real
    many-file table exhibits — v2 corpora wrote 1M rows into ONE row group
    and serialized the whole span decode.
    """
    tag = f"n{n_docs}_s{seed}_v3"
    if (hot_frac, hot_r_scale) != (0.35, 1.0):  # skew-rehearsal corpora
        tag += f"_hf{hot_frac:g}_hr{hot_r_scale:g}"
    d = os.path.join(out_dir, tag)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    docs, side = generate_corpus(n_docs, seed, hot_frac=hot_frac,
                                 hot_r_scale=hot_r_scale)
    pq.write_table(docs, os.path.join(d, "documents.parquet"),
                   row_group_size=16384)
    for name, t in side.items():
        pq.write_table(t, os.path.join(d, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return d

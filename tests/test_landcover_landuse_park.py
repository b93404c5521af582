"""Ports of LandcoverTest.java / LanduseTest.java / ParkTest.java vectors."""

import pytest

from planetiler_openmaptiles_spark.layers import Config

from .layertest import LayerHarness, assert_features, world_rect_wkt


@pytest.fixture(scope="module")
def harness(spark):
    return LayerHarness(spark, Config(only_layers=("landcover", "landuse", "park")))


def _ne(table, tags=None):
    return dict(source="natural_earth", source_layer=table, elem_id=0,
                tags=tags or {}, wkt=world_rect_wkt(0.2, 0.8))


def test_natural_earth_glaciers(harness):
    # LandcoverTest.java:18-64
    for table, mz, xz in [("ne_110m_glaciated_areas", 0, 1),
                          ("ne_50m_glaciated_areas", 2, 4),
                          ("ne_10m_glaciated_areas", 5, 6)]:
        fs = harness.process([_ne(table)])
        assert_features(
            [{"_layer": "landcover", "subclass": "glacier", "class": "ice",
              "_buffer": 4.0, "_minzoom": mz, "_maxzoom": xz}],
            fs.at_zoom(0),
        )


def test_natural_earth_ice_shelves(harness):
    # LandcoverTest.java:66-98
    for table, mz, xz in [("ne_50m_antarctic_ice_shelves_polys", 2, 4),
                          ("ne_10m_antarctic_ice_shelves_polys", 5, 6)]:
        fs = harness.process([_ne(table)])
        assert_features(
            [{"_layer": "landcover", "subclass": "ice_shelf", "class": "ice",
              "_buffer": 4.0, "_minzoom": mz, "_maxzoom": xz}],
            fs.at_zoom(0),
        )


def test_osm_landcover(harness):
    # LandcoverTest.java:100-130
    fs = harness.process([dict(tags={"natural": "wood"}, elem_id=1,
                               wkt=world_rect_wkt(0.2, 0.8))])
    assert_features(
        [{"_layer": "landcover", "subclass": "wood", "class": "wood",
          "_minpixelsize": 8.0, "_minzoom": 7, "_maxzoom": 14}],
        fs.at_zoom(13),
    )
    fs = harness.process([dict(tags={"landuse": "forest"}, elem_id=1,
                               wkt=world_rect_wkt(0.2, 0.8))])
    assert_features(
        [{"_layer": "landcover", "subclass": "forest", "class": "wood",
          "_minpixelsize": 8.0, "_minzoom": 7, "_maxzoom": 14}],
        fs.at_zoom(12),
    )
    # z9 → minpixelsize 2; z10 → 4
    assert_features([{"_minpixelsize": 2.0}], fs.at_zoom(9))
    assert_features([{"_minpixelsize": 4.0}], fs.at_zoom(10))


def test_natural_earth_urban_areas(harness):
    # LanduseTest.java:18-43
    fs = harness.process([_ne("ne_50m_urban_areas", {"scalerank": "1.9"})])
    assert_features(
        [{"_layer": "landuse", "class": "residential", "_buffer": 4.0, "_minzoom": 4}],
        fs.at_zoom(0, layer="landuse"),
    )
    fs = harness.process([_ne("ne_50m_urban_areas", {"scalerank": "2.1"})])
    assert_features(
        [{"_layer": "landuse", "class": "residential", "_buffer": 4.0, "_minzoom": 5}],
        fs.at_zoom(0, layer="landuse"),
    )


def test_osm_landuse(harness):
    # LanduseTest.java:45-68 (poi feature ignored — layer not active here)
    fs = harness.process([dict(tags={"landuse": "railway", "amenity": "school"},
                               elem_id=1, wkt=world_rect_wkt(0.2, 0.8))])
    assert_features(
        [{"_layer": "landuse", "class": "railway", "_minpixelsize": 4.0,
          "_minzoom": 9, "_maxzoom": 14}],
        fs.at_zoom(13, layer="landuse"),
    )
    fs = harness.process([dict(tags={"amenity": "grave_yard"}, elem_id=1,
                               wkt=world_rect_wkt(0.2, 0.8))])
    assert_features(
        [{"_layer": "landuse", "class": "cemetery"}],
        fs.at_zoom(14, layer="landuse"),
    )


def test_osm_landuse_lower_zoom(harness):
    # LanduseTest.java:83-103
    fs = harness.process([dict(tags={"place": "suburb"}, elem_id=1,
                               wkt=world_rect_wkt(0.2, 0.8))])
    assert_features(
        [{"_layer": "landuse", "class": "suburb", "_minzoom": 6, "_maxzoom": 14,
          "_minpixelsize": 1.0}],
        fs.at_zoom(6, layer="landuse"),
    )
    fs = harness.process([dict(tags={"landuse": "residential"}, elem_id=1,
                               wkt=world_rect_wkt(0.2, 0.8))])
    assert_features(
        [{"_layer": "landuse", "class": "residential", "_minzoom": 6, "_maxzoom": 14,
          "_minpixelsize": 0.1}],
        fs.at_zoom(7, layer="landuse"),
    )


def test_park(harness):
    # ParkTest.java basics: national park polygon + label point
    fs = harness.process([dict(
        tags={"boundary": "national_park", "name": "Grand Canyon"},
        elem_id=1, wkt=world_rect_wkt(0.2, 0.4),
    )])
    feats = fs.at_zoom(14, layer="park")
    polys = [f for f in feats if f["_type"] == "polygon"]
    points = [f for f in feats if f["_type"] == "point"]
    assert len(polys) == 1 and len(points) == 1
    assert polys[0]["class"] == "national_park"
    assert polys[0]["name"] == "Grand Canyon"
    assert polys[0]["_minzoom"] == 4
    assert points[0]["class"] == "national_park"
    assert points[0]["name"] == "Grand Canyon"
    assert points[0]["_minzoom"] == 5  # huge area → clamped to 5
    # class/name gated at z5 on the outline
    z4 = [f for f in fs.at_zoom(4, layer="park") if f["_type"] == "polygon"]
    assert "class" not in z4[0] and "name" not in z4[0]


def test_park_protect_class(harness):
    fs = harness.process([dict(
        tags={"boundary": "protected_area", "protect_class": "1a"},
        elem_id=1, wkt=world_rect_wkt(0.2, 0.4),
    )])
    polys = [f for f in fs.at_zoom(14, layer="park") if f["_type"] == "polygon"]
    assert polys[0]["class"] == "conservation"
    fs = harness.process([dict(
        tags={"leisure": "nature_reserve"},
        elem_id=1, wkt=world_rect_wkt(0.2, 0.4),
    )])
    polys = [f for f in fs.at_zoom(14, layer="park") if f["_type"] == "polygon"]
    assert polys[0]["class"] == "nature_reserve"

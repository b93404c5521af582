"""Ports of WaterwayTest.java / WaterNameTest.java vectors."""

import pytest

from planetiler_openmaptiles_spark.layers import Config

from .layertest import LayerHarness, assert_features, world_rect_wkt

LINE = "LINESTRING (0 0, 1 1)"


@pytest.fixture(scope="module")
def harness(spark):
    return LayerHarness(spark, Config(only_layers=("waterway", "water_name")))


def test_waterway_important_river(harness):
    # WaterwayTest.java:84-119
    fs = harness.process([dict(tags={"waterway": "river", "name": "charles river",
                                     "name:es": "es name"}, elem_id=1, wkt=LINE)])
    ww = fs.at_zoom(14, layer="waterway")
    assert_features(
        [{"class": "river", "name": "charles river", "name:es": "es name",
          "intermittent": 0, "_layer": "waterway", "_type": "line",
          "_minzoom": 9, "_maxzoom": 14, "_buffer": 4.0}],
        ww,
    )
    assert_features(
        [{"class": "river", "intermittent": "<null>", "_buffer": 13.082664546679323}],
        fs.at_zoom(11, layer="waterway"),
    )
    assert_features([{"_buffer": 26.165329093358647}], fs.at_zoom(10, layer="waterway"))
    assert_features([{"_buffer": 26.165329093358647}], fs.at_zoom(9, layer="waterway"))


def test_waterway_relation(harness):
    # WaterwayTest.java:24-53
    fs = harness.process([dict(
        tags={}, elem_id=1, wkt="LINESTRING (0 0, 0 3)",
        rels=[(1, "", {"type": "waterway", "waterway": "river",
                       "name": "River Relation", "name:es": "ES name"})],
    )])
    assert_features(
        [{"class": "river", "name": "River Relation", "name:es": "ES name",
          "_layer": "waterway", "_type": "line", "_minzoom": 6, "_maxzoom": 8,
          "_buffer": 4.0}],
        fs.at_zoom(14, layer="waterway"),
    )


def test_waterway_smaller_classes(harness):
    # WaterwayTest.java:155-190
    fs = harness.process([dict(tags={"waterway": "river"}, elem_id=1, wkt=LINE)])
    assert_features([{"class": "river", "_minzoom": 12}], fs.at_zoom(14, layer="waterway"))
    fs = harness.process([dict(tags={"waterway": "canal", "name": "c"}, elem_id=1, wkt=LINE)])
    assert_features([{"class": "canal", "_minzoom": 12}], fs.at_zoom(14, layer="waterway"))
    fs = harness.process([dict(tags={"waterway": "stream", "name": "s"}, elem_id=1, wkt=LINE)])
    assert_features([{"class": "stream", "_minzoom": 13}], fs.at_zoom(14, layer="waterway"))


def test_waterway_natural_earth(harness):
    # WaterwayTest.java:192-230
    fs = harness.process([dict(source="natural_earth",
                               source_layer="ne_110m_rivers_lake_centerlines",
                               elem_id=0, tags={"featurecla": "River"}, wkt=LINE)])
    assert_features(
        [{"class": "river", "_minzoom": 3, "_maxzoom": 3}],
        fs.at_zoom(3, layer="waterway"),
    )
    fs = harness.process([dict(source="natural_earth",
                               source_layer="ne_50m_rivers_lake_centerlines",
                               elem_id=0, tags={"featurecla": "River"}, wkt=LINE)])
    assert_features(
        [{"class": "river", "_minzoom": 4, "_maxzoom": 5}],
        fs.at_zoom(4, layer="waterway"),
    )


def test_marine_point(harness):
    # WaterNameTest: ocean point → z0, rank from tag
    fs = harness.process([dict(tags={"place": "ocean", "name": "Pacific Ocean"},
                               elem_id=1, wkt="POINT (0 0)")])
    assert_features(
        [{"class": "ocean", "name": "Pacific Ocean", "_minzoom": 0, "_buffer": 256.0}],
        fs.at_zoom(0, layer="water_name"),
    )
    fs = harness.process([dict(tags={"place": "sea", "name": "North Sea", "rank": "4"},
                               elem_id=1, wkt="POINT (0 0)")])
    assert_features([{"class": "sea", "_minzoom": 4}], fs.at_zoom(4, layer="water_name"))
    fs = harness.process([dict(tags={"natural": "bay", "name": "Tiny Bay"},
                               elem_id=1, wkt="POINT (0 0)")])
    assert_features([{"class": "bay", "_minzoom": 13}], fs.at_zoom(13, layer="water_name"))


def test_marine_point_ne_rank(harness):
    # fuzzy NE join overrides rank: NE marine poly "north sea" scalerank 2
    fs = harness.process([
        dict(source="natural_earth", source_layer="ne_10m_geography_marine_polys",
             elem_id=9, tags={"name": "North  Sea", "scalerank": "2"},
             wkt="POLYGON ((-1 -1, 1 -1, 1 1, -1 1, -1 -1))"),
        dict(tags={"place": "sea", "name": "North Sea", "rank": "6"},
             elem_id=1, wkt="POINT (0 0)"),
    ])
    assert_features([{"class": "sea", "_minzoom": 2}], fs.at_zoom(2, layer="water_name"))


def test_lake_label(harness):
    fs = harness.process([dict(tags={"natural": "water", "name": "Lake X"},
                               elem_id=1, wkt=world_rect_wkt(0.4, 0.6))])
    assert_features(
        [{"class": "lake", "name": "Lake X", "intermittent": 0, "_type": "point",
          "_minzoom": 3, "_maxzoom": 14, "_minpixelsize": 128.0}],
        fs.at_zoom(10, layer="water_name"),
    )
    # no label for unnamed or swimming pools
    fs = harness.process([dict(tags={"natural": "water"}, elem_id=1,
                               wkt=world_rect_wkt(0.4, 0.6))])
    assert_features([], fs.at_zoom(10, layer="water_name"))
    fs = harness.process([dict(tags={"leisure": "swimming_pool", "name": "Pool"},
                               elem_id=1, wkt=world_rect_wkt(0.4, 0.6))])
    assert_features([], fs.at_zoom(10, layer="water_name"))


def test_lake_centerline(harness):
    # J7: centerline replaces the label point at z>=3 for lakes
    fs = harness.process([
        dict(tags={"natural": "water", "name": "Long Lake"}, elem_id=44,
             wkt=world_rect_wkt(0.4, 0.6)),
        dict(source="lake_centerlines", elem_id=44, tags={},
             wkt="LINESTRING (-10 0, 10 0)"),
    ])
    feats = fs.at_zoom(10, layer="water_name")
    lines = [f for f in feats if f["_type"] == "line"]
    points = [f for f in feats if f["_type"] == "point"]
    assert len(lines) == 1 and len(points) == 0
    assert lines[0]["class"] == "lake"
    assert lines[0]["_minzoom"] == 3
    # minpixelsize = 6 * len("Long Lake") = 54 below z13
    assert lines[0]["_minpixelsize"] == 54.0
    # sea with centerline keeps the point below z9
    fs = harness.process([
        dict(tags={"natural": "water", "place": "sea", "name": "C Sea"}, elem_id=45,
             wkt=world_rect_wkt(0.4, 0.6)),
        dict(source="lake_centerlines", elem_id=45, tags={},
             wkt="LINESTRING (-10 0, 10 0)"),
    ])
    feats = fs.at_zoom(5, layer="water_name")
    lines = [f for f in feats if f["_type"] == "line"]
    points = [f for f in feats if f["_type"] == "point"]
    assert len(lines) == 1 and lines[0]["_minzoom"] == 9
    assert len(points) == 1 and points[0]["_minzoom"] == 0 and points[0]["_maxzoom"] == 8

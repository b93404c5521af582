"""Ports of TransportationTest.java / TransportationNameTest vectors (subset)."""

import pytest

from planetiler_openmaptiles_spark.layers import Config

from .layertest import LayerHarness, assert_features, line_with_length_wkt

LINE = "LINESTRING (0 0, 1 1)"


@pytest.fixture(scope="module")
def harness(spark):
    return LayerHarness(spark, Config(only_layers=("transportation", "transportation_name")))


def test_named_footway(harness):
    # TransportationTest.java:32-84
    fs = harness.process([dict(
        tags={"highway": "footway", "name": "Lagoon Path", "surface": "asphalt",
              "level": "0", "indoor": "yes"},
        elem_id=1, wkt=LINE)])
    t = fs.at_zoom(14, layer="transportation")
    assert_features(
        [{"_layer": "transportation", "_type": "line", "class": "path",
          "subclass": "footway", "oneway": "<null>", "name": "<null>",
          "surface": "paved", "level": 0, "indoor": 1,
          "_minzoom": 13, "_maxzoom": 14, "_buffer": 4.0}],
        t,
    )
    tn = fs.at_zoom(14, layer="transportation_name")
    assert_features(
        [{"_layer": "transportation_name", "_type": "line", "class": "path",
          "subclass": "footway", "name": "Lagoon Path", "name_int": "Lagoon Path",
          "name:latin": "Lagoon Path", "_minzoom": 13, "_maxzoom": 14, "_buffer": 8.0}],
        tn,
    )
    # no surface at z12 (surface zattr minzoom 12 — present), but oneway absent
    t12 = fs.at_zoom(12, layer="transportation")
    assert t12[0].get("surface") == "paved"
    t11 = fs.at_zoom(11, layer="transportation")
    assert "surface" not in t11[0]


def test_unnamed_path(harness):
    fs = harness.process([dict(tags={"highway": "path"}, elem_id=1, wkt=LINE)])
    assert_features(
        [{"class": "path", "subclass": "path", "_minzoom": 14}],
        fs.at_zoom(14, layer="transportation"),
    )
    # unnamed path not in name layer
    assert_features([], fs.at_zoom(14, layer="transportation_name"))


def test_motorway_z4(harness):
    # motorway without network relations → z4
    fs = harness.process([dict(tags={"highway": "motorway", "ref": "1"},
                               elem_id=1, wkt=LINE)])
    assert_features(
        [{"class": "motorway", "_minzoom": 4, "_maxzoom": 14}],
        fs.at_zoom(14, layer="transportation"),
    )
    name = fs.at_zoom(14, layer="transportation_name")
    assert_features(
        [{"ref": "1", "ref_length": 1, "network": "road", "class": "motorway",
          "_minzoom": 6}],
        name,
    )


def test_motorway_with_us_network(harness):
    fs = harness.process([dict(
        tags={"highway": "motorway", "ref": "I 90"}, elem_id=1, wkt=LINE,
        rels=[(100, "", {"type": "route", "route": "road", "network": "US:I",
                         "ref": "90"})])])
    t = fs.at_zoom(14, layer="transportation")
    assert_features([{"class": "motorway", "network": "us-interstate", "_minzoom": 4}], t)
    tn = fs.at_zoom(14, layer="transportation_name")
    assert_features(
        [{"ref": "90", "ref_length": 2, "network": "us-interstate",
          "route_1_network": "US:I", "route_1_ref": "90"}],
        tn,
    )


def test_trunk_zooms(harness):
    # plain long trunk → z6 (too long for the mergeable-length upgrade)
    fs = harness.process([dict(tags={"highway": "trunk"}, elem_id=1,
                               wkt="LINESTRING (0 0, 40 40)")])
    assert_features([{"class": "trunk", "_minzoom": 6}],
                    fs.at_zoom(14, layer="transportation"))
    # trunk in US:US network → z5
    fs = harness.process([dict(
        tags={"highway": "trunk", "ref": "US 2"},
        elem_id=1, wkt="LINESTRING (0 0, 40 40)",
        rels=[(100, "", {"type": "route", "route": "road", "network": "US:US", "ref": "2"})])])
    assert_features([{"class": "trunk", "_minzoom": 5}],
                    fs.at_zoom(14, layer="transportation"))


def test_residential(harness):
    fs = harness.process([dict(tags={"highway": "residential", "name": "Main St"},
                               elem_id=1, wkt=LINE)])
    assert_features([{"class": "minor", "_minzoom": 12}],
                    fs.at_zoom(14, layer="transportation"))
    assert_features([{"class": "minor", "name": "Main St", "_minzoom": 12}],
                    fs.at_zoom(14, layer="transportation_name"))


def test_link_ramps(harness):
    fs = harness.process([dict(tags={"highway": "motorway_link"}, elem_id=1, wkt=LINE)])
    f = fs.at_zoom(14, layer="transportation")
    assert_features([{"class": "motorway", "ramp": 1, "_minzoom": 9}], f)
    # ramp hidden below z9
    f8 = fs.at_zoom(8, layer="transportation")
    assert "ramp" not in f8[0]


def test_rail(harness):
    fs = harness.process([dict(tags={"railway": "rail", "usage": "main"},
                               elem_id=1, wkt=LINE)])
    assert_features(
        [{"class": "rail", "subclass": "rail", "_minzoom": 8}],
        fs.at_zoom(14, layer="transportation"),
    )
    fs = harness.process([dict(tags={"railway": "rail", "service": "yard"},
                               elem_id=1, wkt=LINE)])
    assert_features(
        [{"class": "rail", "subclass": "rail", "service": "yard", "_minzoom": 14}],
        fs.at_zoom(14, layer="transportation"),
    )
    fs = harness.process([dict(tags={"railway": "tram"}, elem_id=1, wkt=LINE)])
    assert_features([{"class": "transit", "subclass": "tram", "_minzoom": 14}],
                    fs.at_zoom(14, layer="transportation"))


def test_aerialway_shipway(harness):
    fs = harness.process([dict(tags={"aerialway": "gondola", "name": "Lift"},
                               elem_id=1, wkt=LINE)])
    assert_features(
        [{"class": "aerialway", "subclass": "gondola", "_minzoom": 12}],
        fs.at_zoom(14, layer="transportation"),
    )
    assert_features(
        [{"class": "aerialway", "subclass": "gondola", "name": "Lift", "_minzoom": 12}],
        fs.at_zoom(14, layer="transportation_name"),
    )
    fs = harness.process([dict(tags={"route": "ferry", "name": "Boat"},
                               elem_id=1, wkt=LINE)])
    assert_features(
        [{"class": "ferry", "_minzoom": 4, "_minpixelsize": 32.0}],
        fs.at_zoom(10, layer="transportation"),
    )
    assert_features(
        [{"class": "ferry", "name": "Boat", "_minzoom": 12}],
        fs.at_zoom(14, layer="transportation_name"),
    )


def test_pier_closed_dropped(harness):
    # F10: closed man_made=pier linestring dropped
    fs = harness.process([dict(tags={"man_made": "pier"}, elem_id=1,
                               wkt="LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)")])
    assert_features([], fs.at_zoom(14, layer="transportation"))
    fs = harness.process([dict(tags={"man_made": "pier"}, elem_id=1,
                               wkt="LINESTRING (0 0, 1 0)")])
    assert_features([{"class": "pier", "_minzoom": 13}],
                    fs.at_zoom(14, layer="transportation"))


def test_hiking_route_path(harness):
    # TransportationTest.java:87-134: iwn route → path z12
    fs = harness.process([dict(
        tags={"highway": "path"}, elem_id=1, wkt=LINE,
        rels=[(200, "", {"type": "route", "route": "hiking", "network": "iwn",
                         "ref": "AT"})])])
    assert_features([{"class": "path", "_minzoom": 12}],
                    fs.at_zoom(14, layer="transportation"))
    # rwn + osmc:symbol → rank 1? no: rwn → rank 1 → z12; lwn → rank 2 → z13
    fs = harness.process([dict(
        tags={"highway": "path"}, elem_id=1, wkt=LINE,
        rels=[(200, "", {"type": "route", "route": "hiking", "network": "lwn"})])])
    assert_features([{"class": "path", "_minzoom": 13}],
                    fs.at_zoom(14, layer="transportation"))


def test_junction(harness):
    # J10: junction point picks max class of touching ways
    fs = harness.process([
        dict(tags={"highway": "motorway"}, elem_id=1,
             wkt="LINESTRING (1 1, 2 2)"),
        dict(tags={"highway": "primary"}, elem_id=2,
             wkt="LINESTRING (2 2, 3 1)"),
        dict(tags={"highway": "motorway_junction", "ref": "12", "name": "Exit 12"},
             elem_id=3, wkt="POINT (2 2)"),
    ])
    pts = [f for f in fs.at_zoom(14, layer="transportation_name") if f["_type"] == "point"]
    assert_features(
        [{"class": "motorway", "subclass": "junction", "ref": "12", "ref_length": 2,
          "name": "Exit 12", "_minzoom": 10}],
        pts,
    )

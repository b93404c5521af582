"""Additional TransportationTest.java vector ports: construction classes,
expressway, z9+ attrs, GB/IE route inference, busway, pier lines."""

import pytest

from planetiler_openmaptiles_spark.layers import Config

from .layertest import LayerHarness, assert_features

LINE = "LINESTRING (0 0, 1 1)"


@pytest.fixture(scope="module")
def harness(spark):
    return LayerHarness(spark, Config(only_layers=("transportation",)))


def test_construction_classes(harness):
    fs = harness.process([dict(tags={"highway": "construction",
                                     "construction": "motorway"}, elem_id=1, wkt=LINE)])
    assert_features([{"class": "motorway_construction", "_minzoom": 4}],
                    fs.at_zoom(14, layer="transportation"))
    fs = harness.process([dict(tags={"highway": "construction",
                                     "construction": "residential"}, elem_id=1, wkt=LINE)])
    # minzoom uses the class table (minor → 13): the residential z12 rule
    # keys on the highway tag, which is "construction" here
    assert_features([{"class": "minor_construction", "_minzoom": 13}],
                    fs.at_zoom(14, layer="transportation"))
    # construction with no construction tag → minor_construction
    fs = harness.process([dict(tags={"highway": "construction"}, elem_id=1, wkt=LINE)])
    assert_features([{"class": "minor_construction"}],
                    fs.at_zoom(14, layer="transportation"))


def test_expressway(harness):
    fs = harness.process([dict(tags={"highway": "primary", "expressway": "yes"},
                               elem_id=1, wkt=LINE)])
    f = fs.at_zoom(14, layer="transportation")
    assert_features([{"class": "primary", "expressway": 1}], f)
    # not at z7 (expressway zattr minzoom 8)
    f7 = fs.at_zoom(7, layer="transportation")
    assert "expressway" not in f7[0]
    # motorway never gets expressway
    fs = harness.process([dict(tags={"highway": "motorway", "expressway": "yes"},
                               elem_id=1, wkt=LINE)])
    assert "expressway" not in fs.at_zoom(14, layer="transportation")[0]


def test_z9_attrs(harness):
    fs = harness.process([dict(
        tags={"highway": "path", "bicycle": "no", "foot": "designated",
              "horse": "no", "mtb:scale": "3", "access": "private",
              "toll": "yes", "informal": "yes"},
        elem_id=1, wkt=LINE)])
    f14 = fs.at_zoom(14, layer="transportation")[0]
    assert f14["bicycle"] == "no" and f14["foot"] == "designated"
    assert f14["horse"] == "no" and f14["mtb_scale"] == "3"
    assert f14["access"] == "no" and f14["toll"] == "1"
    assert f14["official"] == "0"  # informal=yes → official 0
    f8 = fs.at_zoom(8, layer="transportation")[0]
    for k in ("bicycle", "foot", "horse", "mtb_scale", "access", "toll", "official"):
        assert k not in f8


def test_surface_tracktype(harness):
    fs = harness.process([dict(tags={"highway": "track", "tracktype": "grade1"},
                               elem_id=1, wkt=LINE)])
    assert fs.at_zoom(14, layer="transportation")[0]["surface"] == "paved"
    fs = harness.process([dict(tags={"highway": "track", "surface": "sand"},
                               elem_id=1, wkt=LINE)])
    assert fs.at_zoom(14, layer="transportation")[0]["surface"] == "unpaved"
    fs = harness.process([dict(tags={"highway": "track", "surface": "weird"},
                               elem_id=1, wkt=LINE)])
    assert "surface" not in fs.at_zoom(14, layer="transportation")[0]


def test_busway_guideway(harness):
    fs = harness.process([dict(tags={"highway": "busway"}, elem_id=1, wkt=LINE)])
    assert_features([{"class": "busway", "_minzoom": 11}],
                    fs.at_zoom(14, layer="transportation"))
    fs = harness.process([dict(tags={"highway": "bus_guideway"}, elem_id=1, wkt=LINE)])
    assert_features([{"class": "bus_guideway", "_minzoom": 11}],
                    fs.at_zoom(14, layer="transportation"))


def test_gb_route_inference(harness):
    # GB polygon + M-ref motorway → gb-motorway network (J6)
    fs = harness.process([
        dict(source="natural_earth", source_layer="ne_10m_admin_0_countries",
             elem_id=99, tags={"iso_a2": "GB"},
             wkt="POLYGON ((-5 49, 2 49, 2 59, -5 59, -5 49))"),
        dict(tags={"highway": "motorway", "ref": "M1"}, elem_id=1,
             wkt="LINESTRING (-1 52, -1 53)"),
    ])
    assert_features([{"class": "motorway", "network": "gb-motorway"}],
                    fs.at_zoom(14, layer="transportation"))
    # outside GB → no network
    fs = harness.process([
        dict(source="natural_earth", source_layer="ne_10m_admin_0_countries",
             elem_id=99, tags={"iso_a2": "GB"},
             wkt="POLYGON ((-5 49, 2 49, 2 59, -5 59, -5 49))"),
        dict(tags={"highway": "motorway", "ref": "M1"}, elem_id=1,
             wkt="LINESTRING (20 20, 21 21)"),
    ])
    assert "network" not in fs.at_zoom(14, layer="transportation")[0]


def test_ie_route_inference(harness):
    fs = harness.process([
        dict(source="natural_earth", source_layer="ne_10m_admin_0_countries",
             elem_id=98, tags={"iso_a2": "IE"},
             wkt="POLYGON ((-11 51, -5 51, -5 56, -11 56, -11 51))"),
        dict(tags={"highway": "trunk", "ref": "N7"}, elem_id=1,
             wkt="LINESTRING (-8 52, -8 55)"),
    ])
    # ie-national is a Z5 trunk network that also qualifies for the Z4
    # motorway promotion (Transportation.java:593-599: z5trunk &&
    # isMotorwayWithNetworkForZ4 → CLASS_MOTORWAY at z4)
    assert_features([{"class": "motorway", "network": "ie-national", "_minzoom": 4}],
                    fs.at_zoom(14, layer="transportation"))


def test_highway_polygon(harness):
    fs = harness.process([dict(
        tags={"highway": "pedestrian", "area": "yes"}, elem_id=1,
        wkt="POLYGON ((0 0, 0.001 0, 0.001 0.001, 0 0.001, 0 0))")])
    polys = [f for f in fs.at_zoom(14, layer="transportation") if f["_type"] == "polygon"]
    assert_features([{"class": "path", "subclass": "pedestrian", "_minzoom": 13}], polys)


def test_oneway_and_layer(harness):
    fs = harness.process([dict(
        tags={"highway": "secondary", "oneway": "-1", "layer": "2", "bridge": "yes"},
        elem_id=1, wkt="LINESTRING (0 0, 3 3)")])
    f14 = fs.at_zoom(14, layer="transportation")[0]
    assert f14["oneway"] == "-1"
    assert f14["layer"] == "2"
    assert f14["brunnel"] == "bridge"
    f10 = fs.at_zoom(10, layer="transportation")[0]
    assert "oneway" not in f10  # oneway gated at z12

"""Ports of MountainPeakTest / BuildingTest / HousenumberTest / AerowayTest."""

import pytest

from planetiler_openmaptiles_spark.layers import Config

from .layertest import LayerHarness, assert_features, world_rect_wkt

POINT = "POINT (0 0)"
LINE = "LINESTRING (0 0, 1 1)"


@pytest.fixture(scope="module")
def harness(spark):
    return LayerHarness(
        spark, Config(only_layers=("mountain_peak", "building", "housenumber", "aeroway"))
    )


def test_peak_elevation(harness):
    # MountainPeakTest.java:30-50
    fs = harness.process([dict(tags={"natural": "peak", "name": "test",
                                     "ele": "100", "wikidata": "Q123"},
                               elem_id=1, wkt=POINT)])
    assert_features(
        [{"class": "peak", "ele": 100, "ele_ft": 328, "customary_ft": "<null>",
          "_layer": "mountain_peak", "_type": "point", "_minzoom": 7, "_maxzoom": 14,
          "_buffer": 100.0, "name:latin": "test", "name": "test"}],
        fs.at_zoom(14),
    )


def test_label_grid(harness):
    # MountainPeakTest.java:52-66
    fs = harness.process([dict(tags={"natural": "peak", "ele": "100"}, elem_id=1, wkt=POINT)])
    assert_features([{"_labelgrid_limit": 0}], fs.at_zoom(14))
    assert_features([{"_labelgrid_limit": 5, "_labelgrid_size": 100.0}], fs.at_zoom(13))


def test_volcano_saddle_feet(harness):
    fs = harness.process([dict(tags={"natural": "volcano", "ele": "100"}, elem_id=1, wkt=POINT)])
    assert_features([{"class": "volcano"}], fs.at_zoom(14))
    fs = harness.process([dict(tags={"natural": "volcano", "ele": "100'"}, elem_id=1, wkt=POINT)])
    assert_features([{"class": "volcano", "ele": 30, "ele_ft": 100}], fs.at_zoom(14))
    fs = harness.process([dict(tags={"natural": "volcano", "ele": '100\' 11"'}, elem_id=1, wkt=POINT)])
    assert_features([{"class": "volcano", "ele": 31, "ele_ft": 101}], fs.at_zoom(14))
    fs = harness.process([dict(tags={"natural": "saddle", "ele": "100"}, elem_id=1, wkt=POINT)])
    assert_features([{"class": "saddle"}], fs.at_zoom(14))


def test_peak_no_ele_no_name_dropped(harness):
    # MountainPeakTest.java:113-118: no name and invalid elevation → dropped
    fs = harness.process([dict(tags={"natural": "peak"}, elem_id=1, wkt=POINT)])
    assert_features([], fs.at_zoom(14, layer="mountain_peak"))
    # too-big elevation, no name → dropped
    fs = harness.process([dict(tags={"natural": "peak", "ele": "11000"}, elem_id=1, wkt=POINT)])
    assert_features([], fs.at_zoom(14, layer="mountain_peak"))
    # named without ele → kept
    fs = harness.process([dict(tags={"natural": "peak", "name": "x"}, elem_id=1, wkt=POINT)])
    assert len(fs.at_zoom(14, layer="mountain_peak")) == 1


def test_ridge_line(harness):
    # MountainPeakTest.java:150-160
    fs = harness.process([dict(tags={"natural": "ridge", "name": "r"}, elem_id=1, wkt=LINE)])
    assert_features(
        [{"class": "ridge", "rank": 2, "_layer": "mountain_peak", "_type": "line",
          "_minzoom": 13, "_maxzoom": 14, "_buffer": 100.0, "name": "r"}],
        fs.at_zoom(14),
    )


def test_peak_customary_ft_us(harness):
    # MountainPeakTest.java (US join): peak inside US polygon → customary_ft=1
    fs = harness.process([
        dict(source="natural_earth", source_layer="ne_10m_admin_0_countries",
             elem_id=99, tags={"iso_a2": "US", "name": "United States"},
             wkt="POLYGON ((-10 -10, 10 -10, 10 10, -10 10, -10 -10))"),
        dict(tags={"natural": "peak", "ele": "100"}, elem_id=1, wkt=POINT),
    ])
    assert_features([{"class": "peak", "customary_ft": 1}],
                    fs.at_zoom(14, layer="mountain_peak"))


def test_building(harness):
    # BuildingTest.java basics
    fs = harness.process([dict(tags={"building": "yes"}, elem_id=1,
                               wkt=world_rect_wkt(0.2, 0.3))])
    assert_features(
        [{"_layer": "building", "_type": "polygon", "_minzoom": 13, "_maxzoom": 14,
          "render_height": 5, "render_min_height": 0}],
        fs.at_zoom(14),
    )
    # hidden below z14
    z13 = fs.at_zoom(13)
    assert "render_height" not in z13[0]

    fs = harness.process([dict(
        tags={"building": "yes", "height": "30", "min_height": "3"},
        elem_id=1, wkt=world_rect_wkt(0.2, 0.3))])
    assert_features([{"render_height": 30, "render_min_height": 3}], fs.at_zoom(14))

    fs = harness.process([dict(
        tags={"building": "yes", "building:levels": "3"}, elem_id=1,
        wkt=world_rect_wkt(0.2, 0.3))])
    assert_features([{"render_height": 11}], fs.at_zoom(14))  # ceil(3*3.66)

    # material → colour
    fs = harness.process([dict(
        tags={"building": "yes", "building:material": "brick"}, elem_id=1,
        wkt=world_rect_wkt(0.2, 0.3))])
    assert_features([{"colour": "#bd8161"}], fs.at_zoom(14))

    # too-tall building dropped
    fs = harness.process([dict(
        tags={"building": "yes", "height": "10000"}, elem_id=1,
        wkt=world_rect_wkt(0.2, 0.3))])
    assert_features([], fs.at_zoom(14, layer="building"))

    # relation outline → hide_3d
    fs = harness.process([dict(
        tags={"building": "yes"}, elem_id=1, wkt=world_rect_wkt(0.2, 0.3),
        rels=[(900, "outline", {"type": "building"})])])
    assert_features([{"hide_3d": "true"}], fs.at_zoom(14))


def test_housenumber_display(harness):
    # HousenumberTest.java: range display
    fs = harness.process([dict(tags={"addr:housenumber": "1;3;5"}, elem_id=1, wkt=POINT)])
    assert_features(
        [{"housenumber": "1–5", "_layer": "housenumber", "_type": "point",
          "_minzoom": 14, "_buffer": 8.0}],
        fs.at_zoom(14),
    )
    fs = harness.process([dict(tags={"addr:housenumber": "4/a;5;6"}, elem_id=1, wkt=POINT)])
    assert_features([{"housenumber": "4/a–6"}], fs.at_zoom(14))
    fs = harness.process([dict(tags={"addr:housenumber": "42"}, elem_id=1, wkt=POINT)])
    assert_features([{"housenumber": "42"}], fs.at_zoom(14))


def test_aeroway(harness):
    # AerowayTest.java
    fs = harness.process([dict(tags={"aeroway": "aerodrome", "ref": "KBOS"},
                               elem_id=1, wkt=world_rect_wkt(0.2, 0.3))])
    aero = fs.at_zoom(11, layer="aeroway")
    assert_features(
        [{"class": "aerodrome", "ref": "KBOS", "_type": "polygon",
          "_minzoom": 10, "_maxzoom": 14, "_minpixelsize": 2.0}],
        aero,
    )
    fs = harness.process([dict(tags={"aeroway": "runway", "ref": "24"}, elem_id=1, wkt=LINE)])
    assert_features(
        [{"class": "runway", "ref": "24", "_type": "line", "_minzoom": 10}],
        fs.at_zoom(11, layer="aeroway"),
    )
    fs = harness.process([dict(tags={"aeroway": "gate", "ref": "A52"}, elem_id=1, wkt=POINT)])
    assert_features(
        [{"class": "gate", "ref": "A52", "_type": "point", "_minzoom": 14}],
        fs.at_zoom(14, layer="aeroway"),
    )

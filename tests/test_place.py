"""Ports of PlaceTest.java vectors (subset covering each join path)."""

import pytest

from planetiler_openmaptiles_spark.layers import Config

from .layertest import LayerHarness, assert_features, world_rect_wkt

POINT = "POINT (0 0)"


@pytest.fixture(scope="module")
def harness(spark):
    return LayerHarness(spark, Config(only_layers=("place",)))


def test_continent(harness):
    fs = harness.process([dict(tags={"place": "continent", "name": "Europe",
                                     "name:es": "Europa"}, elem_id=1, wkt=POINT)])
    assert_features(
        [{"class": "continent", "rank": 1, "name": "Europe", "name:es": "Europa",
          "_layer": "place", "_type": "point", "_minzoom": 0, "_maxzoom": 3,
          "_buffer": 256.0}],
        fs.at_zoom(0),
    )


def test_country_with_ne_rank(harness):
    fs = harness.process([
        dict(source="natural_earth", source_layer="ne_10m_admin_0_countries",
             elem_id=99, tags={"name": "United States", "scalerank": "0", "labelrank": "2"},
             wkt="POLYGON ((-10 -10, 10 -10, 10 10, -10 10, -10 -10))"),
        dict(tags={"place": "country", "name": "USA",
                   "country_code_iso3166_1_alpha_2": "US"}, elem_id=1, wkt=POINT),
    ])
    # rank = clamp(ceil(mean(0, 2)), 1, 6) = 1 → minzoom 0
    assert_features(
        [{"class": "country", "iso_a2": "US", "rank": 1, "name": "USA",
          "_minzoom": 0}],
        fs.at_zoom(6, layer="place"),
    )


def test_country_without_ne(harness):
    fs = harness.process([
        dict(tags={"place": "country", "name": "Atlantis",
                   "ISO3166-1:alpha2": "AT"}, elem_id=1, wkt=POINT),
    ])
    # no NE match → rank 7 clamped to 6, minzoom 5
    assert_features(
        [{"class": "country", "iso_a2": "AT", "rank": 6, "_minzoom": 5}],
        fs.at_zoom(6, layer="place"),
    )
    # no iso code → dropped
    fs = harness.process([dict(tags={"place": "country", "name": "X"}, elem_id=1, wkt=POINT)])
    assert_features([], fs.at_zoom(6, layer="place"))


def test_state_requires_containing_ne(harness):
    state_doc = dict(tags={"place": "state", "name": "Midland"}, elem_id=1, wkt=POINT)
    # no NE state polygon → dropped
    fs = harness.process([state_doc])
    assert_features([], fs.at_zoom(6, layer="place"))
    # containing NE state with good ranks → kept
    fs = harness.process([
        dict(source="natural_earth", source_layer="ne_10m_admin_1_states_provinces",
             elem_id=98, tags={"name": "Midland NE", "scalerank": "3", "labelrank": "3",
                               "datarank": "3"},
             wkt="POLYGON ((-1 -1, 1 -1, 1 1, -1 1, -1 -1))"),
        state_doc,
    ])
    assert_features(
        [{"class": "state", "rank": 3, "name": "Midland", "_minzoom": 2}],
        fs.at_zoom(6, layer="place"),
    )
    # state outside the polygon → dropped
    fs = harness.process([
        dict(source="natural_earth", source_layer="ne_10m_admin_1_states_provinces",
             elem_id=98, tags={"name": "Far", "scalerank": "3", "labelrank": "3",
                               "datarank": "3"},
             wkt="POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        state_doc,
    ])
    assert_features([], fs.at_zoom(6, layer="place"))


def test_island_polygon_and_point(harness):
    fs = harness.process([dict(tags={"place": "island", "name": "Big Isle"},
                               elem_id=1, wkt=world_rect_wkt(0.4, 0.6))])
    feats = fs.at_zoom(10, layer="place")
    assert_features([{"class": "island", "rank": 1, "_minzoom": 8, "_type": "point"}], feats)
    fs = harness.process([dict(tags={"place": "island", "name": "Rock"}, elem_id=1, wkt=POINT)])
    assert_features(
        [{"class": "island", "rank": 7, "_minzoom": 12}],
        fs.at_zoom(12, layer="place"),
    )


def test_city_with_ne_match(harness):
    fs = harness.process([
        dict(source="natural_earth", source_layer="ne_10m_populated_places",
             elem_id=97, tags={"name": "Bigcity", "scalerank": "2", "wikidataid": "Q42"},
             wkt="POINT (0.01 0.01)"),
        dict(tags={"place": "city", "name": "Bigcity", "population": "500000"},
             elem_id=1, wkt=POINT),
    ])
    # scalerank 2 <= 5 → rank 3, minzoom max(3, 3-1)=3... rank=3 → minzoom max(3,2)=3
    assert_features(
        [{"class": "city", "rank": 3, "_minzoom": 3}],
        fs.at_zoom(7, layer="place"),
    )


def test_city_without_ne_match(harness):
    fs = harness.process([
        dict(tags={"place": "city", "name": "Lonely", "population": "100000"},
             elem_id=1, wkt=POINT),
    ])
    assert_features(
        [{"class": "city", "rank": "<null>", "_minzoom": 7,
          "_labelgrid_size": 128.0, "_labelgrid_limit": 4}],
        fs.at_zoom(8, layer="place"),
    )
    f = fs.at_zoom(10, layer="place")[0]
    assert f["_labelgrid_limit"] == 12
    f = fs.at_zoom(13, layer="place")[0]
    assert f["_labelgrid_limit"] == 0 and f["_labelgrid_size"] is None


def test_capital_and_place_zooms(harness):
    fs = harness.process([dict(tags={"place": "village", "name": "V", "capital": "6"},
                               elem_id=1, wkt=POINT)])
    assert_features([{"class": "village", "capital": 6, "_minzoom": 8}],
                    fs.at_zoom(8, layer="place"))
    fs = harness.process([dict(tags={"place": "suburb", "name": "S"}, elem_id=1, wkt=POINT)])
    assert_features([{"class": "suburb", "_minzoom": 11}], fs.at_zoom(11, layer="place"))
    fs = harness.process([dict(tags={"place": "quarter", "name": "Q"}, elem_id=1, wkt=POINT)])
    assert_features([{"class": "quarter", "_minzoom": 14}], fs.at_zoom(14, layer="place"))

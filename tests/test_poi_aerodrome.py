"""Ports of PoiTest.java / AerodromeLabelTest.java vectors."""

import pytest

from planetiler_openmaptiles_spark.layers import Config

from .layertest import LayerHarness, assert_features, world_rect_wkt

POINT = "POINT (0 0)"


@pytest.fixture(scope="module")
def harness(spark):
    return LayerHarness(spark, Config(only_layers=("poi", "aerodrome_label")))


def test_poi_restaurant(harness):
    fs = harness.process([dict(tags={"amenity": "restaurant", "name": "Pizza"},
                               elem_id=1, wkt=POINT)])
    assert_features(
        [{"class": "restaurant", "subclass": "restaurant", "name": "Pizza",
          "_layer": "poi", "_type": "point", "_minzoom": 14, "_maxzoom": 14,
          "_buffer": 64.0, "_labelgrid_size": 64.0}],
        fs.at_zoom(14, layer="poi"),
    )
    # unnamed → +2000 in sort key
    fs2 = harness.process([dict(tags={"amenity": "restaurant"}, elem_id=1, wkt=POINT)])
    named_key = fs.at_zoom(14, layer="poi")[0]["_sortkey"]
    unnamed_key = fs2.at_zoom(14, layer="poi")[0]["_sortkey"]
    assert unnamed_key - named_key == 2000


def test_poi_class_mapping(harness):
    fs = harness.process([dict(tags={"shop": "bakery"}, elem_id=1, wkt=POINT)])
    # bakery not in shop-class value list → class falls back to subclass
    assert_features([{"class": "bakery", "subclass": "bakery"}], fs.at_zoom(14, layer="poi"))
    fs = harness.process([dict(tags={"shop": "clothes"}, elem_id=1, wkt=POINT)])
    assert_features([{"class": "clothing_store", "subclass": "clothes"}], fs.at_zoom(14, layer="poi"))
    fs = harness.process([dict(tags={"amenity": "university"}, elem_id=1, wkt=POINT)])
    assert_features([{"class": "college", "subclass": "university", "_minzoom": 10}],
                    fs.at_zoom(14, layer="poi"))


def test_poi_railway_station(harness):
    fs = harness.process([dict(tags={"railway": "station", "name": "Gare"},
                               elem_id=1, wkt=POINT)])
    assert_features(
        [{"class": "railway", "subclass": "station", "_minzoom": 12}],
        fs.at_zoom(14, layer="poi"),
    )
    # subway station → subclass subway
    fs = harness.process([dict(tags={"railway": "station", "station": "subway"},
                               elem_id=1, wkt=POINT)])
    assert_features(
        [{"class": "railway", "subclass": "subway", "_minzoom": 12}],
        fs.at_zoom(14, layer="poi"),
    )


def test_poi_place_of_worship_pitch(harness):
    fs = harness.process([dict(tags={"amenity": "place_of_worship", "religion": "muslim"},
                               elem_id=1, wkt=POINT)])
    assert_features([{"class": "place_of_worship", "subclass": "muslim"}],
                    fs.at_zoom(14, layer="poi"))
    fs = harness.process([dict(tags={"leisure": "pitch", "sport": "soccer"},
                               elem_id=1, wkt=POINT)])
    assert_features([{"class": "pitch", "subclass": "soccer"}], fs.at_zoom(14, layer="poi"))


def test_poi_atm_name_fallback(harness):
    fs = harness.process([dict(tags={"amenity": "atm", "operator": "Bankomat"},
                               elem_id=1, wkt=POINT)])
    assert_features([{"class": "atm", "subclass": "atm", "name": "Bankomat"}],
                    fs.at_zoom(14, layer="poi"))


def test_poi_agg_stop(harness):
    # three stops sharing uic_ref: bus_station wins over bus_stop; among equal
    # subclass, nearest to centroid wins
    docs = [
        dict(tags={"highway": "bus_stop", "uic_ref": "8501", "name": "X"},
             elem_id=1, wkt="POINT (0 0)"),
        dict(tags={"amenity": "bus_station", "uic_ref": "8501", "name": "X"},
             elem_id=2, wkt="POINT (0.001 0)"),
        dict(tags={"highway": "bus_stop", "uic_ref": "8501", "name": "X"},
             elem_id=3, wkt="POINT (0.002 0)"),
    ]
    fs = harness.process(docs)
    feats = sorted(fs.at_zoom(14, layer="poi"), key=lambda f: f["_elem_id"])
    assert [f.get("agg_stop") for f in feats] == [None, "1", None]


def test_poi_polygon_centroid(harness):
    fs = harness.process([dict(tags={"amenity": "school", "name": "S"},
                               elem_id=1, wkt=world_rect_wkt(0.2, 0.3))])
    assert_features(
        [{"class": "school", "subclass": "school", "_type": "point"}],
        fs.at_zoom(14, layer="poi"),
    )


def test_aerodrome_label(harness):
    # AerodromeLabelTest.java: international + iata → z8; other → z10
    fs = harness.process([dict(
        tags={"aeroway": "aerodrome", "name": "Logan", "aerodrome:type": "international",
              "iata": "BOS", "icao": "KBOS", "ele": "19"},
        elem_id=1, wkt=world_rect_wkt(0.2, 0.3))])
    assert_features(
        [{"class": "international", "iata": "BOS", "icao": "KBOS", "ele": 19,
          "ele_ft": 62, "name": "Logan", "_layer": "aerodrome_label", "_type": "point",
          "_minzoom": 8, "_buffer": 64.0}],
        fs.at_zoom(10, layer="aerodrome_label"),
    )
    fs = harness.process([dict(
        tags={"aeroway": "aerodrome", "name": "Small", "aerodrome:type": "private"},
        elem_id=1, wkt=world_rect_wkt(0.2, 0.3))])
    assert_features(
        [{"class": "private", "iata": "<null>", "_minzoom": 10}],
        fs.at_zoom(10, layer="aerodrome_label"),
    )
    fs = harness.process([dict(
        tags={"aeroway": "aerodrome", "military": "airfield"},
        elem_id=1, wkt=world_rect_wkt(0.2, 0.3))])
    assert_features([{"class": "military"}], fs.at_zoom(10, layer="aerodrome_label"))

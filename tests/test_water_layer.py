"""Port of reference WaterTest.java golden vectors (src/test/java/org/
openmaptiles/layers/WaterTest.java) through the Spark transform stage."""

import pytest

from planetiler_openmaptiles_spark.layers import Config

from .layertest import (
    LayerHarness,
    assert_features,
    latlon_rect_wkt,
    world_rect_wkt,
)


@pytest.fixture(scope="module")
def harness(spark):
    return LayerHarness(spark, Config(only_layers=("water",)))


def test_water_natural_earth(harness):
    # WaterTest.java:18-46
    fs = harness.process(
        [dict(source="natural_earth", source_layer="ne_110m_ocean", elem_id=0,
              wkt=latlon_rect_wkt(0, 10))]
    )
    assert_features(
        [{"class": "ocean", "intermittent": "<null>", "_layer": "water",
          "_type": "polygon", "_minzoom": 0}],
        fs.at_zoom(0),
    )
    fs = harness.process(
        [dict(source="natural_earth", source_layer="ne_10m_ocean", elem_id=0,
              wkt=latlon_rect_wkt(0, 10))]
    )
    assert_features(
        [{"class": "ocean", "_layer": "water", "_type": "polygon", "_maxzoom": 5}],
        fs.at_zoom(6),
    )


def _lake_features(fs):
    """NE-lake features only, ordered by minzoom (the finish-stage emission)."""
    rows = [f for f in fs.at_zoom(0) if f["_doc_id"].startswith("natural_earth/")]
    return sorted(rows, key=lambda f: (f["_minzoom"], f["_doc_id"]))


def test_lake_natural_earth_by_intersection(harness):
    # WaterTest.java:49-97
    polygon = latlon_rect_wkt(0, 0.1)
    fs = harness.process(
        [
            dict(source="natural_earth", source_layer="ne_110m_lakes", elem_id=0, wkt=polygon),
            dict(source="natural_earth", source_layer="ne_10m_lakes", elem_id=0, wkt=polygon),
            dict(tags={"natural": "water", "water": "reservoir"}, elem_id=123, wkt=polygon),
        ]
    )
    assert_features(
        [
            {"class": "lake", "intermittent": "<null>", "id": 123, "_layer": "water",
             "_type": "polygon", "_minzoom": 0, "_maxzoom": 1},
            {"class": "lake", "intermittent": "<null>", "id": 123, "_layer": "water",
             "_type": "polygon", "_minzoom": 4, "_maxzoom": 5},
        ],
        _lake_features(fs),
    )


def test_lake_natural_earth_intersection_miss(harness):
    # WaterTest.java:99-143
    fs = harness.process(
        [
            dict(source="natural_earth", source_layer="ne_110m_lakes", elem_id=0,
                 wkt=latlon_rect_wkt(0, 0.1)),
            dict(source="natural_earth", source_layer="ne_10m_lakes", elem_id=0,
                 wkt=latlon_rect_wkt(0, 0.1)),
            dict(tags={"natural": "water", "water": "reservoir"}, elem_id=123,
                 wkt=latlon_rect_wkt(0.2, 0.3)),
        ]
    )
    assert_features(
        [
            {"class": "lake", "id": "<null>", "_layer": "water", "_type": "polygon"},
            {"class": "lake", "id": "<null>", "_layer": "water", "_type": "polygon"},
        ],
        _lake_features(fs),
    )


def test_lake_natural_earth_by_bigger_intersection(harness):
    # WaterTest.java:145-206
    p1, p2 = latlon_rect_wkt(0, 0.1), latlon_rect_wkt(0, 0.2)
    fs = harness.process(
        [
            dict(source="natural_earth", source_layer="ne_110m_lakes", elem_id=0, wkt=p2),
            dict(source="natural_earth", source_layer="ne_10m_lakes", elem_id=0, wkt=p2),
            dict(tags={"natural": "water", "water": "reservoir"}, elem_id=123, wkt=p1),
            dict(tags={"natural": "water", "water": "reservoir"}, elem_id=234, wkt=p2),
        ]
    )
    assert_features(
        [
            {"class": "lake", "id": 234, "_minzoom": 0, "_maxzoom": 1},
            {"class": "lake", "id": 234, "_minzoom": 4, "_maxzoom": 5},
        ],
        _lake_features(fs),
    )


def test_lake_natural_earth_by_name(harness):
    # WaterTest.java:208-252
    polygon = latlon_rect_wkt(0, 0.1)
    fs = harness.process(
        [
            dict(source="natural_earth", source_layer="ne_50m_lakes", elem_id=0,
                 tags={"name": "Test Lake"}, wkt=polygon),
            dict(source="natural_earth", source_layer="ne_10m_lakes", elem_id=0,
                 tags={"name": "Test Lake"}, wkt=polygon),
            dict(tags={"name": "Test Lake", "natural": "water", "water": "reservoir"},
                 elem_id=123, wkt=polygon),
        ]
    )
    assert_features(
        [
            {"class": "lake", "id": 123, "_minzoom": 2, "_maxzoom": 3},
            {"class": "lake", "id": 123, "_minzoom": 4, "_maxzoom": 5},
        ],
        _lake_features(fs),
    )


def test_lake_natural_earth_by_name_intersection_miss(harness):
    # WaterTest.java:254-285 — name match short-circuits the spatial path
    # even when the geometries do not intersect → no id
    fs = harness.process(
        [
            dict(source="natural_earth", source_layer="ne_50m_lakes", elem_id=0,
                 tags={"name": "Test Lake"}, wkt=latlon_rect_wkt(0, 0.1)),
            dict(tags={"name": "Test Lake", "natural": "water", "water": "reservoir"},
                 elem_id=123, wkt=latlon_rect_wkt(0.2, 0.3)),
        ]
    )
    assert_features(
        [{"class": "lake", "id": "<null>", "_layer": "water"}],
        _lake_features(fs),
    )


def test_lake_natural_earth_by_name_and_bigger_intersection(harness):
    # WaterTest.java:287-332
    p1, p2 = latlon_rect_wkt(0, 0.1), latlon_rect_wkt(0, 0.2)
    fs = harness.process(
        [
            dict(source="natural_earth", source_layer="ne_50m_lakes", elem_id=0,
                 tags={"name": "Test Lake"}, wkt=p2),
            dict(tags={"name": "Test Lake", "natural": "water", "water": "reservoir"},
                 elem_id=123, wkt=p1),
            dict(tags={"name": "Test Lake", "natural": "water", "water": "reservoir"},
                 elem_id=234, wkt=p2),
        ]
    )
    assert_features(
        [{"class": "lake", "id": 234, "_layer": "water"}],
        _lake_features(fs),
    )


def test_lake_natural_earth_by_name_with_collision(harness):
    # WaterTest.java:334-378 — on name collision the bigger NE lake holds the
    # name; smaller NE lake gets no id
    small, big = latlon_rect_wkt(0, 0.1), latlon_rect_wkt(0, 0.2)
    fs = harness.process(
        [
            dict(source="natural_earth", source_layer="ne_10m_lakes", elem_id=7,
                 tags={"name": "Test Lake"}, wkt=small),
            dict(source="natural_earth", source_layer="ne_10m_lakes", elem_id=8,
                 tags={"name": "Test Lake"}, wkt=big),
            dict(tags={"name": "Test Lake", "natural": "water", "water": "reservoir"},
                 elem_id=123, wkt=big),
        ]
    )
    lakes = sorted(_lake_features(fs), key=lambda f: f["_elem_id"])
    assert_features(
        [
            {"class": "lake", "id": "<null>", "_layer": "water"},
            {"class": "lake", "id": 123, "_layer": "water"},
        ],
        lakes,
    )


def test_water_osm_water_polygon(harness):
    # WaterTest.java:380-396
    fs = harness.process(
        [dict(source="water_polygons", elem_id=0, wkt=latlon_rect_wkt(0, 10))]
    )
    assert_features(
        [{"class": "ocean", "intermittent": "<null>", "_layer": "water",
          "_type": "polygon", "_minzoom": 6, "_maxzoom": 14}],
        fs.at_zoom(0),
    )


def test_water_osm_id(harness):
    # WaterTest.java:398-417
    fs = harness.process(
        [dict(tags={"natural": "water", "water": "reservoir"}, elem_id=123,
              wkt=world_rect_wkt(0.2, 0.8))]
    )
    assert_features(
        [{"class": "lake", "id": 123, "_layer": "water", "_type": "polygon",
          "_minzoom": 6, "_maxzoom": 14}],
        fs.at_zoom(14),
    )


def test_water(harness):
    # WaterTest.java:419-489
    fs = harness.process(
        [dict(tags={"natural": "water", "water": "reservoir"}, elem_id=1,
              wkt=world_rect_wkt(0.2, 0.8))]
    )
    assert_features(
        [{"class": "lake", "_layer": "water", "_type": "polygon",
          "_minzoom": 6, "_maxzoom": 14}],
        fs.at_zoom(14),
    )

    fs = harness.process(
        [dict(tags={"leisure": "swimming_pool"}, elem_id=1, wkt=world_rect_wkt(0.2, 0.8))]
    )
    assert_features(
        [{"class": "swimming_pool", "_layer": "water", "_type": "polygon",
          "_minzoom": 6, "_maxzoom": 14}],
        fs.at_zoom(14, layer="water"),
    )

    fs = harness.process(
        [dict(tags={"natural": "bay"}, elem_id=1, wkt=world_rect_wkt(0.2, 0.8))]
    )
    assert_features([], fs.at_zoom(14, layer="water"))

    fs = harness.process(
        [dict(tags={"natural": "water"}, elem_id=1, wkt=world_rect_wkt(0.2, 0.8))]
    )
    assert len(fs.at_zoom(14, layer="water")) == 1

    fs = harness.process(
        [dict(tags={"natural": "water", "covered": "yes"}, elem_id=1,
              wkt=world_rect_wkt(0.2, 0.8))]
    )
    assert_features([], fs.at_zoom(14, layer="water"))

    fs = harness.process(
        [dict(tags={"waterway": "dock", "intermittent": "1"}, elem_id=1,
              wkt=world_rect_wkt(0.2, 0.8))]
    )
    assert_features(
        [{"class": "dock", "intermittent": 1, "_layer": "water", "_type": "polygon",
          "_minzoom": 6, "_maxzoom": 14}],
        fs.at_zoom(14, layer="water"),
    )

    fs = harness.process(
        [dict(tags={"landuse": "salt_pond", "bridge": "1"}, elem_id=1,
              wkt=world_rect_wkt(0.2, 0.8))]
    )
    assert_features(
        [{"class": "lake", "brunnel": "<null>", "intermittent": 0, "_layer": "water",
          "_type": "polygon", "_minzoom": 6, "_maxzoom": 14, "_minpixelsize": 2.0}],
        fs.at_zoom(11, layer="water"),
    )
    # brunnel appears at z12 (setAttrWithMinzoom 12)
    assert_features(
        [{"class": "lake", "brunnel": "bridge", "_minpixelsize": 1.0}],
        fs.at_zoom(12, layer="water"),
    )


def test_river(harness):
    # WaterTest.java:506-515
    fs = harness.process(
        [dict(tags={"water": "river"}, elem_id=1, wkt=world_rect_wkt(0.2, 0.8))]
    )
    assert_features(
        [{"class": "river", "_layer": "water", "_type": "polygon"}],
        fs.at_zoom(11, layer="water"),
    )

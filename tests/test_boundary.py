"""Ports of BoundaryTest.java vectors."""

import pytest

from planetiler_openmaptiles_spark.layers import Config

from .layertest import LayerHarness, assert_features

LINE = "LINESTRING (0 0, 1 1)"


@pytest.fixture(scope="module")
def harness(spark):
    return LayerHarness(spark, Config(only_layers=("boundary",)))


def _rel(rel_id, admin_level, **extra):
    tags = {"type": "boundary", "boundary": "administrative",
            "admin_level": str(admin_level), **extra}
    return (rel_id, "", tags)


def test_ne_country_boundaries(harness):
    # BoundaryTest.java:28-146
    for table, mz, xz in [("ne_110m_admin_0_boundary_lines_land", 0, 0),
                          ("ne_50m_admin_0_boundary_lines_land", 1, 3),
                          ("ne_10m_admin_0_boundary_lines_land", 4, 4)]:
        fs = harness.process([dict(source="natural_earth", source_layer=table,
                                   elem_id=0, wkt=LINE)])
        assert_features(
            [{"_layer": "boundary", "_type": "line", "admin_level": 2,
              "disputed": 0, "maritime": 0, "_minzoom": mz, "_maxzoom": xz,
              "_minpixelsize": 0.0}],
            fs.at_zoom(0),
        )
    # disputed KE/SS boundary → z1-4
    fs = harness.process([dict(
        source="natural_earth", source_layer="ne_10m_admin_0_boundary_lines_land",
        elem_id=0, tags={"featurecla": "Disputed (please verify)",
                         "adm0_left": "South Sudan", "adm0_right": "Kenya"},
        wkt=LINE)])
    assert_features(
        [{"admin_level": 2, "disputed": 1, "_minzoom": 1, "_maxzoom": 4}],
        fs.at_zoom(0),
    )
    # lease limit dropped
    fs = harness.process([dict(
        source="natural_earth", source_layer="ne_10m_admin_0_boundary_lines_land",
        elem_id=0, tags={"featurecla": "Lease limit"}, wkt=LINE)])
    assert_features([], fs.at_zoom(0, layer="boundary"))


def test_ne_state_boundaries(harness):
    fs = harness.process([dict(
        source="natural_earth", source_layer="ne_10m_admin_1_states_provinces_lines",
        elem_id=0, tags={"min_zoom": "7.0"}, wkt=LINE)])
    assert_features(
        [{"admin_level": 4, "disputed": 0, "maritime": 0, "_minzoom": 1, "_maxzoom": 4}],
        fs.at_zoom(0),
    )
    fs = harness.process([dict(
        source="natural_earth", source_layer="ne_10m_admin_1_states_provinces_lines",
        elem_id=0, tags={"min_zoom": "7.6"}, wkt=LINE)])
    assert_features([{"_minzoom": 4, "_maxzoom": 4}], fs.at_zoom(0))
    fs = harness.process([dict(
        source="natural_earth", source_layer="ne_10m_admin_1_states_provinces_lines",
        elem_id=0, tags={"min_zoom": "8"}, wkt=LINE)])
    assert_features([], fs.at_zoom(0, layer="boundary"))


def test_osm_town_boundary(harness):
    # BoundaryTest.java:252-273
    fs = harness.process([dict(tags={}, elem_id=1, wkt=LINE, rels=[_rel(1, 10)])])
    assert_features(
        [{"_layer": "boundary", "_type": "line", "disputed": 0, "maritime": 0,
          "admin_level": 10, "_minzoom": 12, "_maxzoom": 14, "_buffer": 4.0,
          "_minpixelsize": 0.0}],
        fs.at_zoom(14),
    )


def test_osm_boundary_two_and_a_half(harness):
    fs = harness.process([dict(tags={}, elem_id=1, wkt=LINE, rels=[_rel(1, "2.5")])])
    assert_features([{"admin_level": 3, "_minzoom": 5}], fs.at_zoom(14))


def test_min_admin_level(harness):
    fs = harness.process([dict(tags={}, elem_id=1, wkt=LINE,
                               rels=[_rel(1, 10, name="Town"), _rel(2, 4, name="State")])])
    assert_features([{"admin_level": 4, "disputed": 0, "maritime": 0}], fs.at_zoom(14))


def test_maritime_from_way(harness):
    for tags in ({"maritime": "yes"}, {"natural": "coastline"},
                 {"boundary_type": "maritime"}):
        fs = harness.process([dict(tags=tags, elem_id=1, wkt=LINE, rels=[_rel(1, 10)])])
        assert_features([{"maritime": 1}], fs.at_zoom(14))


def test_disputed_from_way(harness):
    # BoundaryTest.java:402-440
    fs = harness.process([dict(
        tags={"disputed": "yes", "name": "Border X", "claimed_by": "XY"},
        elem_id=1, wkt=LINE, rels=[_rel(1, 2)])])
    assert_features(
        [{"admin_level": 2, "disputed": 1, "claimed_by": "XY",
          "disputed_name": "BorderX"}],
        fs.at_zoom(14),
    )


def test_country_left_right(harness):
    # BoundaryTest.java:484-597 — C1 on the east, C2 on the west of a shared
    # north-south border
    docs = [
        dict(tags={}, elem_id=3, wkt="LINESTRING (0 0, 0 10)",
             rels=[_rel(1, 2, **{"ISO3166-1:alpha3": "C1"}),
                   _rel(2, 2, **{"ISO3166-1:alpha3": "C2"})]),
        dict(tags={}, elem_id=4, wkt="LINESTRING (0 0, 5 10)",
             rels=[_rel(1, 2, **{"ISO3166-1:alpha3": "C1"})]),
        dict(tags={}, elem_id=5, wkt="LINESTRING (0 10, 5 10)",
             rels=[_rel(1, 2, **{"ISO3166-1:alpha3": "C1"})]),
        dict(tags={}, elem_id=6, wkt="LINESTRING (0 0, -5 10)",
             rels=[_rel(2, 2, **{"ISO3166-1:alpha3": "C2"})]),
        dict(tags={}, elem_id=7, wkt="LINESTRING (0 10, -5 10)",
             rels=[_rel(2, 2, **{"ISO3166-1:alpha3": "C2"})]),
    ]
    fs = harness.process(docs)
    feats = fs.at_zoom(5, layer="boundary")
    shared = [f for f in feats if "adm0_l" in f and "adm0_r" in f]
    assert len(shared) == 1, feats
    # C1 is east (positive lon), C2 west. For the south-to-north edge C1 is
    # on the right in map terms.
    lr = {shared[0]["adm0_l"], shared[0]["adm0_r"]}
    assert lr == {"C1", "C2"}
    # z4: no adm0 attrs
    z4 = [f for f in fs.at_zoom(4, layer="boundary") if "adm0_l" in f or "adm0_r" in f]
    assert z4 == []


def test_country_left_right_disputed(harness):
    docs = [
        dict(tags={"disputed": "1"}, elem_id=3, wkt="LINESTRING (0 0, 0 10)",
             rels=[_rel(1, 2, **{"ISO3166-1:alpha3": "C1"}),
                   _rel(2, 2, **{"ISO3166-1:alpha3": "C2"})]),
        dict(tags={"disputed": "1"}, elem_id=4, wkt="LINESTRING (0 0, 5 10)",
             rels=[_rel(1, 2, **{"ISO3166-1:alpha3": "C1"})]),
        dict(tags={"disputed": "1"}, elem_id=5, wkt="LINESTRING (0 10, 5 10)",
             rels=[_rel(1, 2, **{"ISO3166-1:alpha3": "C1"})]),
    ]
    fs = harness.process(docs)
    for f in fs.at_zoom(5, layer="boundary"):
        assert "adm0_l" not in f and "adm0_r" not in f


def test_country_boundary_not_closed(harness):
    fs = harness.process([dict(
        tags={}, elem_id=3, wkt="LINESTRING (0 0, 0 10, 5 5)",
        rels=[_rel(1, 2, **{"ISO3166-1:alpha3": "C1"})])])
    assert_features(
        [{"adm0_r": "<null>", "adm0_l": "<null>", "maritime": 0, "disputed": 0,
          "admin_level": 2, "_layer": "boundary"}],
        fs.at_zoom(0, layer="boundary"),
    )

"""Addon/extra-layer extension path (reference addons/ExtraLayers.java +
README.md:66-113): a custom layer module plugs into transform_all and the
tile pipeline via Config(addons=...)."""

from planetiler_openmaptiles_spark.layers import Config
from tests.layertest import LayerHarness

ADDON = "planetiler_openmaptiles_spark.addons.power"


def test_power_addon_emits_features(spark):
    h = LayerHarness(spark, Config(addons=(ADDON,)))
    fs = h.process([
        {"elem_id": 1, "tags": {"power": "line", "voltage": "380000"},
         "wkt": "LINESTRING (7.40 43.72, 7.41 43.73)"},
        {"elem_id": 2, "tags": {"power": "tower"}, "wkt": "POINT (7.405 43.725)"},
        {"elem_id": 3, "tags": {"highway": "primary"},
         "wkt": "LINESTRING (7.40 43.72, 7.41 43.73)"},
    ])
    rows = [r for r in fs.at_zoom(10, "power") if r["_minzoom"] <= 10]
    assert len(rows) == 1
    assert rows[0]["class"] == "line" and rows[0]["voltage"] == "380000"
    assert rows[0]["_minzoom"] == 9 and rows[0]["_type"] == "line"
    towers = fs.at_zoom(14, "power")
    assert {r["class"] for r in towers} == {"line", "tower"}
    # addon does not leak into other layers, and off by default
    assert all(r["_layer"] == "power" for r in towers)
    fs_off = LayerHarness(spark, Config()).process(
        [{"elem_id": 1, "tags": {"power": "line"},
          "wkt": "LINESTRING (7.40 43.72, 7.41 43.73)"}])
    assert fs_off.at_zoom(10, "power") == []


def test_addon_contract_validated(spark):
    import pytest

    h = LayerHarness(spark, Config(addons=("planetiler_openmaptiles_spark.geom.wkt",)))
    with pytest.raises(ValueError, match="must define LAYER_NAME"):
        h.process([{"elem_id": 1, "tags": {}, "wkt": "POINT (0 0)"}])


def test_addon_post_processor_registered():
    import importlib

    importlib.import_module(ADDON)
    from planetiler_openmaptiles_spark.tiling.postprocess import POST_PROCESSORS

    assert "power" in POST_PROCESSORS

"""Schema regeneration tool (Generate.java parity): the pinned yaml
snapshot must regenerate exactly the checked-in table/layer constants."""

import subprocess
import sys

import yaml

TOOL = "tools/generate_schema.py"
SNAP = "planetiler_openmaptiles_spark/schema/openmaptiles_snapshot.yaml"


def test_snapshot_regenerates_checked_in():
    from tools.generate_schema import diff_schema, load_schema

    assert diff_schema(*load_schema(SNAP)) == []


def test_check_detects_drift(tmp_path):
    with open(SNAP) as f:
        doc = yaml.safe_load(f)
    doc["tables"]["osm_water_polygon"]["mapping"]["landuse"].append("sneaky")
    doc["layers"]["water"]["buffer"] = 8.0
    p = tmp_path / "drift.yaml"
    p.write_text(yaml.safe_dump(doc, sort_keys=False))
    r = subprocess.run([sys.executable, TOOL, "--check", str(p)],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 1
    assert "osm_water_polygon" in r.stdout and "water" in r.stdout


def test_emit_py_is_valid_python():
    r = subprocess.run([sys.executable, TOOL, "--emit-py", SNAP],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0
    compile(r.stdout, "<regen>", "exec")
    assert r.stdout.count("_t(") == 29


def test_imposm3_core_form_loads():
    """An upstream-style imposm3 table (type+mapping+filters) parses without
    the expr escape hatch."""
    from tools.generate_schema import table_from_yaml
    from planetiler_openmaptiles_spark.schema.tables import AND, ANY, NOT, OR, TYPE

    t = table_from_yaml("demo", {
        "type": "polygon",
        "mapping": {"landuse": ["reservoir"], "natural": ["water"]},
        "filters": {"reject": {"covered": ["yes"]}},
        "columns": [{"name": "name", "key": "name", "type": "string"}],
    })
    assert t.mapping == AND(
        OR(ANY("landuse", "reservoir"), ANY("natural", "water")),
        NOT(ANY("covered", "yes")), TYPE("polygon"))
    assert t.columns == {"name": ("name", "s")}

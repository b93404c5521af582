"""Direct tile post-process golden tests (reference AbstractLayerTest
:207-258 pattern — call the layer post-processor on hand-built tile
features and assert merge/no-merge)."""

import pandas as pd
import pytest

from planetiler_openmaptiles_spark.geom import packed, wkt
from planetiler_openmaptiles_spark.tiling import postprocess


def _pdf(rows):
    rows = [
        (eid, kind, packed.wkt_parts(geom)[0] if isinstance(geom, str) else geom,
         attrs, sk, gc, gr)
        for (eid, kind, geom, attrs, sk, gc, gr) in rows
    ]
    return pd.DataFrame(
        rows, columns=["elem_id", "kind", "geom_px", "attrs", "sort_key", "grid_cell", "grid_rank"]
    )


def _g(row):
    """Output row's packed parts -> geometry tuple (WKT-equivalent view)."""
    return packed.to_geom(row["geom_px"], row["kind"])


def test_merge_linestrings_connects_segments():
    # two touching segments with identical attrs merge into one line
    pdf = _pdf([
        (1, "linestring", "LINESTRING (0 0, 10 0)", {"class": "river"}, 0, None, None),
        (2, "linestring", "LINESTRING (10 0, 20 0)", {"class": "river"}, 0, None, None),
    ])
    out = postprocess.merge_line_strings(pdf, 0.0, 0.1, 4.0)
    assert len(out) == 1
    g = _g(out.iloc[0])
    assert g[0] == "LineString" and len(g[1]) == 2  # simplified collinear
    assert g[1][0].tolist() == [0, 0] and g[1][-1].tolist() == [20, 0]


def test_merge_linestrings_respects_attrs():
    # different attrs → no merge
    pdf = _pdf([
        (1, "linestring", "LINESTRING (0 0, 10 0)", {"class": "river"}, 0, None, None),
        (2, "linestring", "LINESTRING (10 0, 20 0)", {"class": "canal"}, 0, None, None),
    ])
    out = postprocess.merge_line_strings(pdf, 0.0, 0.1, 4.0)
    assert len(out) == 2


def test_merge_linestrings_min_length():
    pdf = _pdf([
        (1, "linestring", "LINESTRING (0 0, 5 0)", {"class": "river"}, 0, None, None),
    ])
    out = postprocess.merge_line_strings(pdf, 10.0, 0.1, 4.0)
    assert len(out) == 0
    out = postprocess.merge_line_strings(pdf, 4.0, 0.1, 4.0)
    assert len(out) == 1


def test_merge_linestrings_fence_key():
    # __limit_merge fences prevent merging but are stripped from output
    pdf = _pdf([
        (1, "linestring", "LINESTRING (0 0, 10 0)", {"class": "x", "__limit_merge": "1"}, 0, None, None),
        (2, "linestring", "LINESTRING (10 0, 20 0)", {"class": "x", "__limit_merge": "2"}, 0, None, None),
    ])
    out = postprocess.merge_line_strings(pdf, 0.0, 0.1, 4.0)
    assert len(out) == 2
    assert all("__limit_merge" not in a for a in out["attrs"])


def test_merge_overlapping_polygons_unions():
    a = "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))"
    b = "POLYGON ((50 50, 150 50, 150 150, 50 150, 50 50))"
    pdf = _pdf([
        (1, "polygon", a, {"class": "wood"}, 0, None, None),
        (2, "polygon", b, {"class": "wood"}, 0, None, None),
    ])
    out = postprocess.merge_overlapping_polygons(pdf, 0.0)
    assert len(out) == 1
    g = _g(out.iloc[0])
    assert g[0] == "Polygon"
    from planetiler_openmaptiles_spark.geom import ops

    area = ops.polygon_area([r for r in g[1]])
    # union area ≈ 100² + 100² - 50² = 17500 (raster-grid tolerance)
    assert abs(area - 17500) < 600


def test_merge_overlapping_polygons_attr_groups():
    a = "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))"
    b = "POLYGON ((50 50, 150 50, 150 150, 50 150, 50 50))"
    pdf = _pdf([
        (1, "polygon", a, {"class": "wood"}, 0, None, None),
        (2, "polygon", b, {"class": "grass"}, 0, None, None),
    ])
    out = postprocess.merge_overlapping_polygons(pdf, 0.0)
    assert len(out) == 2


def test_merge_nearby_polygons_bridges_gap():
    # two squares 2px apart merge with min_dist 4, stay apart with 0.5
    a = "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0))"
    b = "POLYGON ((42 0, 80 0, 80 40, 42 40, 42 0))"
    rows = [
        (1, "polygon", a, {}, 0, None, None),
        (2, "polygon", b, {}, 0, None, None),
    ]
    merged = postprocess.merge_nearby_polygons(_pdf(rows), 0.0, 0.0, 4.0, 4.0)
    assert len(_g(merged.iloc[0])[1]) >= 1
    assert len(merged) == 1 and _g(merged.iloc[0])[0] == "Polygon"
    apart = postprocess.merge_nearby_polygons(_pdf(rows), 0.0, 0.0, 0.5, 0.5)
    g = _g(apart.iloc[0])
    assert len(apart) == 1 and g[0] == "MultiPolygon" and len(g[1]) == 2


def test_merge_multi_point():
    pdf = _pdf([
        (1, "point", "POINT (10 10)", {"housenumber": "1"}, 0, None, None),
        (2, "point", "POINT (20 20)", {"housenumber": "1"}, 0, None, None),
        (3, "point", "POINT (30 30)", {"housenumber": "2"}, 0, None, None),
    ])
    out = postprocess.merge_multi_point(pdf)
    assert len(out) == 2
    kinds = sorted(_g(r)[0] for _, r in out.iterrows())
    assert kinds == ["MultiPoint", "Point"]


def test_merge_min_area_filter():
    small = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    pdf = _pdf([(1, "polygon", small, {}, 0, None, None)])
    out = postprocess.merge_overlapping_polygons(pdf, 4.0)
    assert len(out) == 0


def test_catalyst_p4_matches_pandas_kernels(spark):
    """merge_multi_polygon_sql / housenumber_reduce_sql must reproduce the
    pandas kernels' output exactly (same grouping, order, packed-parts
    assembly — geometry compared via its WKT rendering)."""
    import pandas as pd
    from pyspark.sql import functions as F, types as T
    from planetiler_openmaptiles_spark.tiling import postprocess as pp

    rows = []
    # two attr-groups in one tile, incl. a MULTIPOLYGON input row and a
    # single-member group; private _key participates in grouping
    rows.append((13, 1, 2, "building", 1, "polygon",
                 "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
                 {"render_height": "5", "_f": "a"}, 3, None, 0))
    rows.append((13, 1, 2, "building", 2, "polygon",
                 "MULTIPOLYGON (((20 0, 30 0, 30 10, 20 10, 20 0)), ((40 0, 50 0, 50 10, 40 10, 40 0)))",
                 {"render_height": "5", "_f": "a"}, 1, None, 0))
    rows.append((13, 1, 2, "building", 3, "polygon",
                 "POLYGON ((60 0, 70 0, 70 10, 60 10, 60 0))",
                 {"render_height": "9"}, 2, None, 0))
    rows = [
        (z, x, y, l, eid, kind, packed.wkt_parts(g)[0], attrs, sk, gc, gl)
        for (z, x, y, l, eid, kind, g, attrs, sk, gc, gl) in rows
    ]
    geom_t = T.BinaryType()
    schema = T.StructType([
        T.StructField("z", T.IntegerType()), T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()), T.StructField("layer", T.StringType()),
        T.StructField("elem_id", T.LongType()), T.StructField("kind", T.StringType()),
        T.StructField("geom_px", geom_t),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("sort_key", T.IntegerType()),
        T.StructField("grid_cell", T.LongType()),
        T.StructField("grid_limit", T.IntegerType()),
    ])
    df = spark.createDataFrame(rows, schema)
    got = {
        (r["seq"], r["elem_id"], r["kind"], packed.parts_wkt(r["geom_px"], r["kind"]), r[4])
        for r in pp.merge_multi_polygon_sql(df)
        .select("seq", "elem_id", "kind", "geom_px",
                F.to_json(F.array_sort(F.map_entries("attrs"))))
        .collect()
    }
    pdf = pd.DataFrame([{
        "elem_id": r[4], "kind": r[5], "geom_px": r[6], "attrs": r[7], "sort_key": r[8],
    } for r in rows]).sort_values(["sort_key", "elem_id"]).reset_index(drop=True)
    want_rows = pp.merge_multi_polygon(pdf)
    import json
    want = {
        (i, int(r.elem_id), r.kind, packed.parts_wkt(r.geom_px, r.kind),
         json.dumps([{"key": k, "value": v} for k, v in sorted(r.attrs.items())],
                    separators=(",", ":")))
        for i, r in enumerate(want_rows.itertuples(index=False))
    }
    assert got == want


def test_merge_kernels_pass_through_mismatched_kinds():
    """FeatureMerge.groupByAttrs parity: geometry kinds not matching the
    merge pass through unchanged and come FIRST in the output (e.g.
    transportation_name's motorway-junction points through
    mergeLineStrings), instead of being misread as a part stream."""
    pt = packed.wkt_parts("POINT (-3 128)")[0]  # negative x: the old decode looped
    pdf = _pdf([
        (1, "point", pt, {"ref": "10", "_fence": "x"}, 0, None, None),
        (2, "linestring", "LINESTRING (0 0, 10 0)", {"class": "motorway"}, 1, None, None),
        (3, "linestring", "LINESTRING (10 0, 20 0)", {"class": "motorway"}, 1, None, None),
    ])
    out = postprocess.merge_line_strings(pdf, 0.0, 0.1, 4.0)
    assert len(out) == 2
    first = out.iloc[0]
    assert first["kind"] == "point" and first["elem_id"] == 1
    assert first["geom_px"] == pt  # exact bytes through
    assert first["attrs"] == {"ref": "10"}  # private attrs stripped
    assert out.iloc[1]["kind"] == "linestring"

    # polygons through a point merge, and points through a polygon merge
    out = postprocess.merge_multi_point(_pdf([
        (1, "polygon", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", {"a": "1"}, 0, None, None),
        (2, "point", "POINT (1 1)", {"a": "1"}, 1, None, None),
        (3, "point", "POINT (2 2)", {"a": "1"}, 2, None, None),
    ]))
    assert list(out["kind"]) == ["polygon", "point"] and len(out) == 2
    out = postprocess.merge_overlapping_polygons(_pdf([
        (1, "point", "POINT (1 1)", {"a": "1"}, 0, None, None),
        (2, "polygon", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", {"a": "1"}, 1, None, None),
    ]), 0.0)
    assert list(out["kind"]) == ["point", "polygon"]


def test_parts_iter_rejects_malformed_blob():
    with pytest.raises(ValueError):
        packed.lines_of(packed.wkt_parts("POINT (-3 128)")[0])
    with pytest.raises(ValueError):
        packed.polys_of(packed.from_points([[5.0, 5.0]]))


def test_building_z13_sharded_parity(spark):
    """The distributed z13 building merge (bbox-component sharding,
    postprocess.building_z13_sharded) must byte-match the per-tile pandas
    route — same blobs, same attrs, same seq order."""
    import numpy as np
    import planetiler_openmaptiles_spark.layers.building  # registers the pp

    rng = np.random.RandomState(7)
    rows = []
    # 300 small squares: some overlapping chains, some isolated, a couple
    # of holes/concave shapes via multi-ring parts
    for i in range(300):
        cx, cy = rng.uniform(0, 256, 2)
        w = rng.uniform(1.5, 6.0)
        sq = f"POLYGON (({cx:.3f} {cy:.3f}, {cx+w:.3f} {cy:.3f}, {cx+w:.3f} {cy+w:.3f}, {cx:.3f} {cy+w:.3f}, {cx:.3f} {cy:.3f}))"
        rows.append((1000 + i, "polygon", sq, {}, int(rng.randint(0, 50)), None, None))
    pdf = _pdf(rows)

    expected = postprocess.POST_PROCESSORS["building"](13, pdf.sort_values(
        ["sort_key", "elem_id"], kind="mergesort").reset_index(drop=True))
    expected = expected.reset_index(drop=True)

    sdf = spark.createDataFrame(
        [
            (13, 1, 1, "building", int(r.elem_id), r.kind, bytearray(r.geom_px),
             dict(r.attrs), int(r.sort_key), None, 0)
            for r in pdf.itertuples(index=False)
        ],
        schema="z int, x int, y int, layer string, elem_id long, kind string,"
               " geom_px binary, attrs map<string,string>, sort_key int,"
               " grid_cell long, grid_limit int",
    )
    got = (
        postprocess.building_z13_sharded(sdf)
        .orderBy("seq")
        .collect()
    )
    assert len(got) == len(expected)
    for out_row, (_, exp) in zip(got, expected.iterrows()):
        assert bytes(out_row["geom_px"]) == bytes(exp["geom_px"])
        assert out_row["elem_id"] == exp["elem_id"]
        assert dict(out_row["attrs"]) == dict(exp["attrs"])

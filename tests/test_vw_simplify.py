"""Visvalingam-Whyatt simplification (geom/ops.vw_thresholds): threshold
filter vs an independent classic-iterative reference, the DP-vs-VW
criterion difference, and the --simplify-algorithm render plumb."""

import random

import numpy as np

from planetiler_openmaptiles_spark.geom import ops


def _classic_vw(coords, area_tol):
    """Independent O(n²) reference: repeatedly remove the globally
    smallest-effective-area vertex while that minimum is <= area_tol.
    List-based recompute-everything formulation (no heap, no thresholds)."""
    pts = [tuple(p) for p in coords]
    eff_floor = 0.0
    while len(pts) > 2:
        best_i, best_a = -1, None
        for i in range(1, len(pts) - 1):
            (ax, ay), (bx, by), (cx, cy) = pts[i - 1], pts[i], pts[i + 1]
            a = 0.5 * abs((cx - ax) * (by - ay) - (bx - ax) * (cy - ay))
            if best_a is None or a < best_a:
                best_i, best_a = i, a
        eff = max(best_a, eff_floor)
        if eff > area_tol:
            break
        eff_floor = eff
        pts.pop(best_i)
    return np.array(pts)


def test_vw_filter_matches_classic_iterative():
    rng = random.Random(5)
    for trial in range(20):
        n = rng.randint(4, 40)
        coords = np.array(
            [(rng.uniform(0, 100), rng.uniform(0, 100)) for _ in range(n)]
        )
        thr = ops.vw_thresholds(coords)
        for area_tol in (0.01, 1.0, 25.0, 400.0):
            got = coords[thr > area_tol]
            want = _classic_vw(coords, area_tol)
            assert got.shape == want.shape, (trial, area_tol)
            assert np.array_equal(got, want), (trial, area_tol)


def test_vw_drops_thin_spike_dp_keeps():
    # tall thin spike: large DP offset (kept), tiny VW area (dropped)
    coords = np.array(
        [(0.0, 0.0), (5.0, 0.0), (5.01, 10.0), (5.02, 0.0), (10.0, 0.0)]
    )
    tol = 1.0  # px; VW area threshold = tol² = 1
    dp = coords[ops.dp_thresholds(coords) > tol * tol]
    vw = coords[ops.vw_thresholds(coords) > tol * tol]
    assert any((p == (5.01, 10.0)).all() for p in dp)  # spike survives DP
    assert len(vw) == 2  # VW reduces to the endpoints


def test_vw_endpoints_and_short_lines():
    two = np.array([(0.0, 0.0), (1.0, 1.0)])
    assert np.isinf(ops.vw_thresholds(two)).all()
    tri = np.array([(0.0, 0.0), (5.0, 5.0), (10.0, 0.0)])
    thr = ops.vw_thresholds(tri)
    assert np.isinf(thr[0]) and np.isinf(thr[2])
    assert thr[1] == 25.0  # 0.5 * 10 * 5


def test_render_simplify_algorithm_plumb(spark):
    from planetiler_openmaptiles_spark.geom import packed
    from planetiler_openmaptiles_spark.tiling.explode import render_tiles
    from tests.test_tiling import FEATURE_SCHEMA, _feature_row

    # a tall needle-thin spike: DP's offset criterion keeps it (~19 px
    # high at z2) while VW's area criterion drops it (base ~0.05 px →
    # area well under tol² = 1)
    pts = [(10.0, 45.0), (11.0, 45.0), (11.0005, 45.3),
           (11.001, 45.0), (12.0, 45.0)]
    wkt_line = "LINESTRING (" + ", ".join(
        f"{x:.6f} {y:.6f}" for x, y in pts
    ) + ")"
    df = spark.createDataFrame([_feature_row(wkt_line)], FEATURE_SCHEMA)

    def npts(algo):
        out = render_tiles(df, max_zoom=2, default_tol=1.0, algo=algo).toPandas()
        assert len(out) >= 1
        return sum(
            len(l) for _, r in out.iterrows()
            for l in packed.lines_of(r["geom_px"])
        )

    n_dp, n_vw = npts("dp"), npts("vw")
    n_default = sum(
        len(l)
        for _, r in render_tiles(df, max_zoom=2, default_tol=1.0)
        .toPandas().iterrows()
        for l in packed.lines_of(r["geom_px"])
    )
    assert n_default == n_dp  # default algorithm unchanged
    assert n_vw < n_dp

"""S2 cell index invariants. Golden constants for the C++ library aren't
reproducible offline, so correctness is pinned structurally: the
(roundtrip ∧ bijection ∧ Hilbert-adjacency ∧ face-count ∧ parent-range)
bundle admits only a valid Hilbert-on-quadratic-cube-face cell system
with the published S2 bit layout."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from planetiler_openmaptiles_spark.geom import s2


def _sphere_sample(n, seed=3):
    rng = np.random.RandomState(seed)
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    return lon, lat


@pytest.mark.parametrize("level", [1, 4, 10, 16, 30])
def test_roundtrip_center_and_level(level):
    lon, lat = _sphere_sample(5000)
    ids = s2.cell_id(lon, lat, level)
    clon, clat = s2.cell_center(ids, level)
    assert np.array_equal(s2.cell_id(clon, clat, level), ids)
    assert np.array_equal(s2.cell_level(ids), np.full(len(ids), level))


@pytest.mark.parametrize("level", [2, 8, 20])
def test_parent_equals_direct_and_range_contains_leaf(level):
    lon, lat = _sphere_sample(5000)
    leaf = s2.cell_id(lon, lat, 30)
    p = s2.parent(leaf, level)
    assert np.array_equal(p, s2.cell_id(lon, lat, level))
    u = leaf.view(np.uint64)
    assert np.all(u >= s2.range_min(p).view(np.uint64))
    assert np.all(u <= s2.range_max(p).view(np.uint64))


def test_hilbert_curve_adjacency_and_bijection():
    """Consecutive Hilbert positions are ij-adjacent (manhattan dist 1) —
    this property pins the orientation tables up to global relabeling."""
    rng = np.random.RandomState(7)
    level = 12
    face = rng.randint(0, 6, 4000).astype(np.int64)
    pos = rng.randint(0, (1 << (2 * level)) - 1, 4000).astype(np.int64)
    i1, j1 = s2._hilbert_ij(face, pos, level)
    i2, j2 = s2._hilbert_ij(face, pos + 1, level)
    assert np.all(np.abs(i1 - i2) + np.abs(j1 - j2) == 1)
    i = rng.randint(0, 1 << level, 4000).astype(np.int64)
    j = rng.randint(0, 1 << level, 4000).astype(np.int64)
    i3, j3 = s2._hilbert_ij(face, s2._hilbert_pos(face, i, j, level), level)
    assert np.array_equal(i, i3) and np.array_equal(j, j3)


def test_face_partition_counts():
    lon, lat = _sphere_sample(30000)
    assert len(np.unique(s2.cell_id(lon, lat, 1))) == 24  # 6 faces × 4
    # face axes: the six axis points land on six distinct faces
    ax_lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    ax_lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    faces, _, _ = s2.xyz_to_face_uv(*s2.lonlat_to_xyz(ax_lon, ax_lat))
    assert sorted(faces.tolist()) == [0, 1, 2, 3, 4, 5]


def test_area_equalization_beats_mercator():
    """The quadratic ST transform keeps per-cell occupancy of a uniform
    sphere sample much flatter than mercator quadkeys at high latitude:
    the polar-cap cell of level 2 holds within 2.2x of the equatorial."""
    lon, lat = _sphere_sample(200000)
    ids = s2.cell_id(lon, lat, 2)
    _, counts = np.unique(ids, return_counts=True)
    assert len(counts) == 96
    assert counts.max() / counts.min() < 2.2


def test_edge_neighbors_symmetric_distinct_cross_face():
    lon, lat = _sphere_sample(300, seed=11)
    level = 8
    ids = s2.cell_id(lon, lat, level)
    nb = s2.edge_neighbors(ids, level)
    crossed = 0
    for r in range(len(ids)):
        assert len(set(nb[r])) == 4
        for c in range(4):
            back = s2.edge_neighbors(np.array([nb[r, c]]), level)[0]
            assert ids[r] in back
            f_self, _ = s2.cell_face_pos(np.array([ids[r]]), level)
            f_nb, _ = s2.cell_face_pos(np.array([nb[r, c]]), level)
            crossed += int(f_self[0] != f_nb[0])
    assert crossed > 0  # the sample includes cells on face boundaries


@given(
    st.floats(min_value=-179.99, max_value=179.99),
    st.floats(min_value=-89.99, max_value=89.99),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=200, deadline=None)
def test_property_single_point_consistency(lon, lat, level):
    ids = s2.cell_id(np.array([lon]), np.array([lat]), level)
    assert s2.cell_level(ids)[0] == level
    leaf = s2.cell_id(np.array([lon]), np.array([lat]), 30)
    assert s2.parent(leaf, level)[0] == ids[0]
    lo, hi = s2.range_min(ids), s2.range_max(ids)
    assert lo.view(np.uint64)[0] <= leaf.view(np.uint64)[0] <= hi.view(np.uint64)[0]

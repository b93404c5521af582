"""Hypothesis property tests for the pure-python kernels the data plane
trusts implicitly: the packed-geometry codec (incl. the concatenation
law the Catalyst P4 merges rely on), the MVT zigzag primitives, and the
transliteration total-function guarantee."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from planetiler_openmaptiles_spark.geom import packed
from planetiler_openmaptiles_spark.tiling.mvt import _unzigzag, _zigzag

coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def ring(min_pts):
    return st.lists(
        st.tuples(coord, coord), min_size=min_pts, max_size=8
    ).map(lambda pts: np.array(pts, dtype="<f8"))


lines_strategy = st.lists(ring(2), min_size=1, max_size=4)
polys_strategy = st.lists(
    st.lists(ring(3), min_size=1, max_size=3), min_size=1, max_size=4
)
points_strategy = ring(1)


def _assert_rings_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))


@settings(max_examples=60, deadline=None)
@given(lines_strategy)
def test_packed_lines_roundtrip(lines):
    blob = packed.from_lines(lines)
    _assert_rings_equal(packed.lines_of(blob), lines)


@settings(max_examples=60, deadline=None)
@given(polys_strategy)
def test_packed_polys_roundtrip(polys):
    blob = packed.from_polys(polys)
    got = packed.polys_of(blob)
    assert len(got) == len(polys)
    for ga, pa in zip(got, polys):
        _assert_rings_equal(ga, pa)


@settings(max_examples=60, deadline=None)
@given(points_strategy)
def test_packed_points_roundtrip(pts):
    blob = packed.from_points(pts)
    np.testing.assert_array_equal(packed.points_of(blob), pts)


@settings(max_examples=60, deadline=None)
@given(polys_strategy, polys_strategy)
def test_packed_concat_is_geometric_append(pa, pb):
    """The P4 Catalyst merge reduces mergeMultiPolygon to binary concat —
    the codec must make concatenation the geometric append of parts."""
    blob = packed.from_polys(pa) + packed.from_polys(pb)
    got = packed.polys_of(blob)
    want = list(pa) + list(pb)
    assert len(got) == len(want)
    for ga, wa in zip(got, want):
        _assert_rings_equal(ga, wa)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_zigzag_roundtrip(n):
    z = _zigzag(n)
    assert z >= 0
    assert _unzigzag(z) == n


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=40))
def test_transliterate_total(s):
    """transliterate_str never raises and always returns a str for any
    unicode input (it feeds an Arrow UDF — an exception poisons the
    whole batch)."""
    from planetiler_openmaptiles_spark.layers.translit import (
        transliterate_str,
    )

    out = transliterate_str(s)
    assert out is None or isinstance(out, str)


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=400, deadline=None)
def test_mvt_decode_total_on_garbage(b):
    """decode_tile on arbitrary bytes either returns a dict or raises
    ValueError — never hangs, never leaks IndexError/UnicodeDecodeError."""
    from planetiler_openmaptiles_spark.tiling import mvt

    try:
        out = mvt.decode_tile(b)
    except ValueError:
        return
    assert isinstance(out, dict)


@given(st.binary(min_size=1, max_size=200))
@settings(max_examples=400, deadline=None)
def test_wkb_decode_total_on_garbage(b):
    from planetiler_openmaptiles_spark.geom import wkb

    try:
        wkb.decode_geometry_blob(b)
    except ValueError:
        return


@given(st.data())
@settings(max_examples=150, deadline=None)
def test_mvt_decode_total_on_mutated_valid_tile(data):
    """Bit-flipped VALID tiles (the realistic corruption shape: torn
    write / bad sector in a tile archive) also resolve to dict-or-ValueError."""
    import numpy as np

    from planetiler_openmaptiles_spark.tiling import mvt

    ring = np.array([[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 0.0]])
    valid = bytearray(mvt.encode_tile(
        {"water": [(1, "polygon", ("Polygon", [ring]), {"class": "lake"})]}
    ))
    n_flips = data.draw(st.integers(1, 6))
    for _ in range(n_flips):
        i = data.draw(st.integers(0, len(valid) - 1))
        valid[i] = data.draw(st.integers(0, 255))
    try:
        out = mvt.decode_tile(bytes(valid))
    except ValueError:
        return
    assert isinstance(out, dict)

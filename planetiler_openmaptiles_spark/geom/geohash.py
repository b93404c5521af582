"""Geohash cell indexing — pure Spark Column bit math (no UDF).

Geohash (public domain encoding, geohash.org): quantize lon to 20 bits
and lat to 20 bits, interleave lon-first into a 40-bit Morton code, and
emit 5-bit groups as base32 characters ("0123456789bcdefghjkmnpqrstuvwxyz").
Precision p uses the top 5*p bits (p <= 8 here: 40 bits total, which is
the precision web pipelines index on — ~19 m cells at p=8).

Why alongside S2 (geom/s2.py): geohash is the ubiquitous *string-prefix*
cell key — truncating characters coarsens the cell, so one column serves
every zoom via substr(), LIKE-prefix range scans, and prefix joins. The
engine computes it entirely JVM-side with the classic 5-step Morton
spread (each quantized 20-bit value spread to alternating bit positions
by mask/shift folds), so the whole encode stays inside whole-stage
codegen — no Python, no Arrow transfer, ~15 integer ops per row.

At 100 TB this is the cheap partition key: `substr(geohash, 1, 4)`
buckets co-locate spatially adjacent rows for range scans and
co-partitioned spatial joins without any shuffle beyond the write.

Reference parity: the reference keys spatial joins on mercator tile/quad
cells (PointIndex/PolygonIndex); geohash is the equivalent index family
re-expressed as a lexicographic cell key (beyond-reference addition).
No code consulted or copied — written from the published encoding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# mask/shift folds that spread a 20-bit value onto even bit positions
# (the classic Morton "bit twiddling" spread, 64-bit form)
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(c: Column) -> Column:
    """Spread the low 20 bits of `c` onto even bit positions 0,2,..,38."""
    for shift, mask in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def geohash_bits(lon: Column, lat: Column) -> Column:
    """40-bit interleaved geohash code (lon gets the high bit of each
    pair, per the spec) as a long Column — pure integer expressions."""
    # clamp BOTH ends (mirrors tiling/cells.py): lon < -180 / lat < -90
    # would otherwise quantize negative, whose two's-complement Morton
    # spread silently produces a garbage hash
    lon_q = F.greatest(
        F.lit(0),
        F.least(
            F.lit((1 << 20) - 1),
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << 20))),
        ),
    ).cast("long")
    lat_q = F.greatest(
        F.lit(0),
        F.least(
            F.lit((1 << 20) - 1),
            F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << 20))),
        ),
    ).cast("long")
    return F.shiftleft(_spread_bits(lon_q), 1).bitwiseOR(_spread_bits(lat_q))


def geohash_col(lon: Column, lat: Column, precision: int = 8) -> Column:
    """Geohash string of `precision` characters (1..8) — one concat of
    `precision` base32 lookups over the shared 40-bit code."""
    if not 1 <= precision <= 8:
        raise ValueError("precision must be in 1..8")
    bits = geohash_bits(lon, lat)
    alphabet = F.lit(BASE32)
    chars = [
        F.substring(
            alphabet,
            (
                F.shiftrightunsigned(bits, 5 * (8 - 1 - k))
                .bitwiseAND(F.lit(31))
                .cast("int")
                + F.lit(1)
            ),
            F.lit(1),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def decode_geohash(gh: str) -> tuple[float, float, float, float]:
    """Inverse for tests: (lon_min, lat_min, lon_max, lat_max) bounding
    box of a geohash string. Plain python — used only in unit tests."""
    lon = [-180.0, 180.0]
    lat = [-90.0, 90.0]
    even = True  # lon bit first
    for ch in gh:
        idx = BASE32.index(ch)
        for bit in (16, 8, 4, 2, 1):
            rng = lon if even else lat
            mid = (rng[0] + rng[1]) / 2
            if idx & bit:
                rng[0] = mid
            else:
                rng[1] = mid
            even = not even
    return lon[0], lat[0], lon[1], lat[1]


def encode_geohash(lon: float, lat: float, precision: int = 8) -> str:
    """Reference python encoder for tests (bit-by-bit subdivision — an
    INDEPENDENT formulation from the Morton-spread Column path)."""
    lon_rng = [-180.0, 180.0]
    lat_rng = [-90.0, 90.0]
    out = []
    even = True
    idx = 0
    nbits = 0
    while len(out) < precision:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        idx <<= 1
        if v >= mid:
            idx |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        nbits += 1
        if nbits == 5:
            out.append(BASE32[idx])
            idx = 0
            nbits = 0
    return "".join(out)

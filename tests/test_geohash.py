"""Geohash cell index (geom/geohash.py): the Morton-spread Column encode
vs an independent bit-subdivision python reference, known public vectors,
prefix coarsening, and bbox containment."""

import random

from pyspark.sql import functions as F

from planetiler_openmaptiles_spark.geom.geohash import (
    decode_geohash,
    encode_geohash,
    geohash_col,
)


def _spark_hashes(spark, pts, precision=8):
    df = spark.createDataFrame(pts, ["lon", "lat"])
    rows = (
        df.select(
            geohash_col(F.col("lon"), F.col("lat"), precision).alias("gh")
        )
        .collect()
    )
    return [r.gh for r in rows]


def test_known_public_vectors(spark):
    # the canonical wikipedia/geohash.org example: ezs42 near (-5.6, 42.6)
    pts = [(-5.60302734375, 42.60498046875), (-0.1278, 51.5074), (139.6917, 35.6895)]
    got = _spark_hashes(spark, pts, precision=5)
    assert got[0] == "ezs42"
    assert got == [encode_geohash(lon, lat, 5) for lon, lat in pts]


def test_column_matches_python_reference_grid(spark):
    rng = random.Random(7)
    pts = [
        (rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(300)
    ] + [(-180.0, -90.0), (180.0, 90.0), (0.0, 0.0), (179.999999, 89.999999)]
    got = _spark_hashes(spark, pts, precision=8)
    want = [encode_geohash(lon, lat, 8) for lon, lat in pts]
    assert got == want


def test_prefix_property_and_bbox(spark):
    rng = random.Random(11)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(50)]
    gh8 = _spark_hashes(spark, pts, precision=8)
    gh4 = _spark_hashes(spark, pts, precision=4)
    for (lon, lat), h8, h4 in zip(pts, gh8, gh4):
        assert h8[:4] == h4  # truncation coarsens — the prefix-join key
        lo_lon, lo_lat, hi_lon, hi_lat = decode_geohash(h8)
        assert lo_lon <= lon <= hi_lon and lo_lat <= lat <= hi_lat
        # p=8 cell is tiny: ~0.0003 degrees across
        assert hi_lon - lo_lon < 0.001 and hi_lat - lo_lat < 0.001

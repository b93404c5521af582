"""Archive verification: min-feature-count checks over a finished mbtiles or
pmtiles archive.

Parity target: the reference ships ``VerifyMonaco`` (util/VerifyMonaco.java:24-35)
— a CLI utility that opens the built archive and asserts a basic set of
per-layer minimum feature counts inside a lon/lat envelope (buildings at
z13-14, transportation lines z10-14, ocean polygon at every zoom, country
labels, a named park polygon at max zoom), printing each check and exiting
non-zero on failure (VerifyMonaco.java:38-43).  This module re-expresses that
surface over the engine's own archive formats: each check decodes the MVT
tiles that overlap the envelope at each zoom in the range and counts features
of the requested geometry kind whose tags contain the given subset and whose
geometry's bounding box intersects the envelope.

The count is per-tile-feature summed across overlapping tiles at a zoom —
the same convention as the reference's Verify, where a feature clipped into
several tiles counts once per tile.
"""

from __future__ import annotations

import gzip
import json
import sqlite3
from dataclasses import dataclass, field

import numpy as np

from planetiler_openmaptiles_spark.geom import mercator
from planetiler_openmaptiles_spark.tiling import mvt

_KIND_TO_GTYPE = {
    "point": mvt.GEOM_POINT,
    "linestring": mvt.GEOM_LINE,
    "polygon": mvt.GEOM_POLY,
}


@dataclass(frozen=True)
class Check:
    """One ``checkMinFeatureCount`` row (VerifyMonaco.java:25-34)."""

    layer: str
    kind: str  # point | linestring | polygon
    minzoom: int
    maxzoom: int
    min_count: int
    tags: dict = field(default_factory=dict)

    def describe(self) -> str:
        t = f" {self.tags}" if self.tags else ""
        return (
            f"{self.layer}/{self.kind}{t} z{self.minzoom}"
            + (f"-{self.maxzoom}" if self.maxzoom != self.minzoom else "")
            + f" >= {self.min_count}"
        )


@dataclass
class CheckResult:
    check: Check
    counts: dict  # zoom -> matched feature count
    ok: bool

    def describe(self) -> str:
        status = "ok" if self.ok else "FAIL"
        per_z = ", ".join(f"z{z}={n}" for z, n in sorted(self.counts.items()))
        return f"[{status}] {self.check.describe()}  ({per_z})"


@dataclass
class VerifyResult:
    results: list

    def num_errors(self) -> int:
        return sum(1 for r in self.results if not r.ok)

    def print(self) -> None:  # noqa: A003 - mirrors Verify.print()
        for r in self.results:
            print(r.describe())

    def fail_if_errors(self) -> None:
        if self.num_errors():
            raise SystemExit(f"{self.num_errors()} verification check(s) failed")


class _MbtilesArchive:
    def __init__(self, path: str):
        self._con = sqlite3.connect(path)

    def tiles_at(self, z: int):
        """Yield (x, y, mvt_bytes) for every stored tile at zoom z (xyz y)."""
        cur = self._con.execute(
            "SELECT tile_column, tile_row, tile_data FROM tiles WHERE zoom_level=?",
            (z,),
        )
        for x, tms_row, blob in cur:
            y = (1 << z) - 1 - tms_row  # mbtiles stores TMS rows
            data = bytes(blob)
            if data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)
            yield x, y, data

    def close(self):
        self._con.close()


class _PmtilesArchive:
    def __init__(self, path: str):
        from planetiler_openmaptiles_spark.tiling.pmtiles import (
            PmtilesReader,
            tile_id_to_zxy,
        )

        self._r = PmtilesReader(path)
        self._zxy = [tile_id_to_zxy(t) for t in self._r.tile_ids()]

    def tiles_at(self, z: int):
        for tz, x, y in self._zxy:
            if tz == z:
                yield x, y, self._r.get_tile(z, x, y)

    def close(self):
        self._r.close()


def open_archive(path: str):
    if path.endswith(".pmtiles"):
        return _PmtilesArchive(path)
    return _MbtilesArchive(path)


def _bounds_in_tile_px(bounds, z: int, x: int, y: int, extent: int):
    """lon/lat envelope -> (x0, y0, x1, y1) in this tile's extent coords."""
    lon0, lat0, lon1, lat1 = bounds
    wx0, wy1 = mercator.lonlat_to_world(lon0, lat0)  # south edge -> larger wy
    wx1, wy0 = mercator.lonlat_to_world(lon1, lat1)
    scale = float(1 << z)
    return (
        (float(wx0) * scale - x) * extent,
        (float(wy0) * scale - y) * extent,
        (float(wx1) * scale - x) * extent,
        (float(wy1) * scale - y) * extent,
    )


def _tags_match(attrs: dict, want: dict) -> bool:
    return all(str(attrs.get(k)) == str(v) for k, v in want.items())


def _feature_intersects(paths, box) -> bool:
    x0, y0, x1, y1 = box
    for p in paths:
        a = np.asarray(p, dtype=np.float64)
        if a.size == 0:
            continue
        if (
            a[:, 0].max() >= x0
            and a[:, 0].min() <= x1
            and a[:, 1].max() >= y0
            and a[:, 1].min() <= y1
        ):
            return True
    return False


def verify(path: str, bounds, checks) -> VerifyResult:
    """Run min-feature-count checks against an mbtiles/pmtiles archive.

    bounds: (lon_min, lat_min, lon_max, lat_max) envelope, as
    VerifyMonaco.MONACO_BOUNDS (VerifyMonaco.java:18).
    """
    archive = open_archive(path)
    try:
        zooms = sorted({z for c in checks for z in range(c.minzoom, c.maxzoom + 1)})
        # one decode pass per stored tile per zoom, all checks share it
        counts: dict = {(i, z): 0 for i, c in enumerate(checks) for z in range(c.minzoom, c.maxzoom + 1)}
        for z in zooms:
            live = [(i, c) for i, c in enumerate(checks) if c.minzoom <= z <= c.maxzoom]
            for x, y, data in archive.tiles_at(z):
                if data is None:
                    continue
                layers = mvt.decode_tile(data)
                for i, c in live:
                    layer = layers.get(c.layer)
                    if not layer:
                        continue
                    box = _bounds_in_tile_px(bounds, z, x, y, layer["extent"])
                    gtype = _KIND_TO_GTYPE[c.kind]
                    for f in layer["features"]:
                        if (
                            f["type"] == gtype
                            and _tags_match(f["attrs"], c.tags)
                            and _feature_intersects(f["paths"], box)
                        ):
                            counts[(i, z)] += 1
        results = []
        for i, c in enumerate(checks):
            per_z = {z: counts[(i, z)] for z in range(c.minzoom, c.maxzoom + 1)}
            results.append(
                CheckResult(check=c, counts=per_z, ok=all(n >= c.min_count for n in per_z.values()))
            )
        return VerifyResult(results)
    finally:
        archive.close()


def monaco_style_checks(scale: int = 1) -> list:
    """The VerifyMonaco.verify check set (VerifyMonaco.java:25-34), with
    counts scalable so the same shape applies to synthetic corpora."""
    return [
        Check("building", "polygon", 13, 14, 100 * scale),
        Check("transportation", "linestring", 10, 14, 5 * scale),
        Check("landcover", "polygon", 14, 14, 10 * scale, {"class": "grass", "subclass": "park"}),
        Check("water", "polygon", 0, 14, 1, {"class": "ocean"}),
        Check("place", "point", 2, 14, 1, {"class": "country"}),
    ]


def _parse_checks(spec) -> list:
    return [
        Check(
            layer=c["layer"],
            kind=c["kind"],
            minzoom=int(c["minzoom"]),
            maxzoom=int(c["maxzoom"]),
            min_count=int(c["min_count"]),
            tags=c.get("tags", {}),
        )
        for c in spec
    ]


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Verify an mbtiles/pmtiles archive (VerifyMonaco parity)"
    )
    ap.add_argument("archive")
    ap.add_argument(
        "--bounds",
        default="-180,-85,180,85",
        help="lon_min,lat_min,lon_max,lat_max",
    )
    ap.add_argument(
        "--checks",
        default=None,
        help="path to a JSON list of checks; default = VerifyMonaco set",
    )
    args = ap.parse_args(argv)
    bounds = tuple(float(v) for v in args.bounds.split(","))
    if args.checks:
        with open(args.checks) as f:
            checks = _parse_checks(json.load(f))
    else:
        checks = monaco_style_checks()
    result = verify(args.archive, bounds, checks)
    result.print()
    result.fail_if_errors()


if __name__ == "__main__":
    main()

"""Web-Mercator world-coordinate math (planetiler convention: the whole web-
mercator square mapped to [0,1]², y growing south).

Parity target: planetiler GeoUtils (used throughout the reference layers via
SourceFeature.worldGeometry(); see SURVEY.md §1.1). All functions are
vectorized numpy and are also mirrored as Spark Column expressions in
``tiling.cells`` so the cell-key assignment stays JVM-side.
"""

from __future__ import annotations

import numpy as np

# circumference of the mercator square at the equator, meters
WORLD_CIRCUMFERENCE_METERS = 40075016.686


def lonlat_to_world(lon, lat):
    """lon/lat degrees → world x/y in [0,1]. Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = (lon + 180.0) / 360.0
    siny = np.sin(np.clip(lat, -85.05112878, 85.05112878) * np.pi / 180.0)
    y = 0.5 - np.log((1 + siny) / (1 - siny)) / (4 * np.pi)
    return x, y


def world_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x * 360.0 - 180.0
    lat = 90.0 - 360.0 * np.arctan(np.exp((y - 0.5) * 2 * np.pi)) / np.pi
    return lon, lat


def meters_per_world_unit(y):
    """Approximate ground meters per world unit at world-y (latitude scale)."""
    _, lat = world_to_lonlat(0.5, y)
    return WORLD_CIRCUMFERENCE_METERS * np.cos(np.radians(lat))


def meters_to_world(meters, y=0.5):
    return meters / meters_per_world_unit(y)


def world_len_to_meters(units, y=0.5):
    return units * meters_per_world_unit(y)


def px_per_world_unit(zoom: int) -> float:
    """Pixels per world unit at a zoom (256px tiles)."""
    return 256.0 * (1 << zoom)

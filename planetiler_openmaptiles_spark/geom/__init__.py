"""Pure-numpy geometry kernel.

shapely/GEOS is not available in this environment, so the kernel implements
the exact subset of computational geometry the OpenMapTiles pipeline needs
(see SURVEY.md §2.2/§2.5): WKT codec, Web-Mercator world transform,
area/length/centroid/point-on-surface/convexity, Douglas-Peucker simplify,
exact box clipping (Sutherland-Hodgman / Liang-Barsky), point-in-polygon,
graph line-merging, and raster-grid polygon union/buffer for the per-tile
merge operators (FeatureMerge parity targets).

All functions operate on plain numpy arrays and are invoked from Arrow-batched
pandas UDFs — never per-row Python at the DataFrame layer.
"""

from .wkt import parse_wkt, to_wkt  # noqa: F401
from .mercator import lonlat_to_world, world_to_lonlat  # noqa: F401

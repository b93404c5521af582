"""OpenMapTiles layer constants (names, buffer px, field values).

Reference: generated/OpenMapTilesSchema.java:69-88 (the 16 layers) and the
per-layer BUFFER_SIZE constants (OpenMapTilesSchema.java:102,201,293,452,548,
633,698,808,868,1224,1266,1343,1615,1739,1771,2021). Transcribed as data.
"""

from __future__ import annotations

# layer name -> tile buffer in px
LAYER_BUFFERS: dict[str, float] = {
    "water": 4.0,
    "waterway": 4.0,
    "landcover": 4.0,
    "landuse": 4.0,
    "mountain_peak": 64.0,
    "park": 4.0,
    "boundary": 4.0,
    "aeroway": 4.0,
    "transportation": 4.0,
    "building": 4.0,
    "water_name": 256.0,
    "transportation_name": 8.0,
    "place": 256.0,
    "housenumber": 8.0,
    "poi": 64.0,
    "aerodrome_label": 64.0,
}

LAYERS = list(LAYER_BUFFERS)

MAX_ZOOM = 14
MIN_ZOOM = 0

# water layer class mapping (OpenMapTilesSchema.java:181-188): first match wins
WATER_CLASS_RULES = [
    ("dock", ("waterway", ("dock",))),
    ("river", ("water", ("river", "stream", "canal", "ditch", "drain"))),
    ("pond", ("water", ("pond", "basin", "wastewater", "salt_pond"))),
    ("swimming_pool", ("leisure", ("swimming_pool",))),
]
WATER_CLASS_DEFAULT = "lake"

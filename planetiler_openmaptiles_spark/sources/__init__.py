"""Source connectors that materialize the engine's `documents` input table
from external formats (OSM PBF today; the parquet/Iceberg corpus path lives
in `pipeline.py`)."""

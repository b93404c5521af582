"""planetiler_openmaptiles_spark — a PySpark-native re-creation of the
openmaptiles/planetiler-openmaptiles vector-tile pipeline.

Built from scratch on the public PySpark DataFrame API. The reference
(read-only at /root/reference) defines WHAT is computed — the OpenMapTiles
schema layer transforms, spatial joins, and per-tile post-processing — while
this package expresses it Spark-first: declarative DataFrame plans, broadcast
side tables, cell-keyed spatial equi-joins, and Arrow-vectorized pandas UDFs
for the geometry kernel (no per-row Python in hot paths).

Input contract (BASELINE.json input_hint): an Iceberg/parquet table
``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
of interleaved text + media documents; see ``spans`` for the codec.
"""

__version__ = "0.1.0"

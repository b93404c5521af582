"""Extra custom layers you can add to the OpenMapTiles schema.

The Spark mirror of the reference's addon registry
(`addons/ExtraLayers.java:12-19`, README.md:66-113): an addon is any module
exposing ``LAYER_NAME`` and ``transform(ctx) -> DataFrame`` (the same
contract as built-in layer modules); list its import path in
``Config(addons=("planetiler_openmaptiles_spark.addons.power", ...))`` and
it runs, checkpoints, and post-processes exactly like a schema layer.
"""

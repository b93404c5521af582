"""Checked-in schema constants: OpenMapTiles layer/field names and the
imposm3 table-mapping specs (reference: generated/OpenMapTilesSchema.java and
generated/Tables.java — regenerated there from the OpenMapTiles YAML schema;
here transcribed as data, not runtime codegen)."""

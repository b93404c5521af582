"""Wikidata name-translations source connector.

The reference fetches wikidata labels once and persists them as
``wikidata_names.json`` (OpenMapTilesMain.java:34-35
``fetchWikidataNameTranslations(sourcesDir.resolve("wikidata_names.json"))``),
then serves them to layers as a qid → {name:lang: value} translation
provider. This connector reads that persisted file into the engine's
wikidata side table (qid, lang, name) — consumed by
``pipeline.with_wikidata_translations`` (S4).

Format: JSON lines. Both shapes seen in the wild are accepted, detected
per line, parsed entirely JVM-side (get_json_object / from_json — no
Python in the data path):

- object form   ``{"id": "Q42", "labels": {"en": "x", "de": "y"}}``
- array form    ``["Q42", {"name:en": "x", "name:de": "y"}]``

Label keys may carry a ``name:`` prefix (stripped). Lines that fail to
parse yield no rows (null-filtered), matching a fetch-cache file that may
contain partial writes.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def read_wikidata_names(spark, path: str):
    """wikidata_names.json → DataFrame(qid string, lang string, name string).

    Distributed: spark.read.text splits the file by line ranges; every
    transformation below is a Catalyst expression (whole-stage codegen)."""
    lines = spark.read.text(path)
    qid = F.coalesce(
        F.get_json_object("value", "$.id"),
        F.get_json_object("value", "$[0]"),
    )
    labels_json = F.coalesce(
        F.get_json_object("value", "$.labels"),
        F.get_json_object("value", "$[1]"),
    )
    labels = F.from_json(labels_json, "map<string,string>")
    df = (
        lines.select(qid.alias("qid"), labels.alias("_labels"))
        .filter(F.col("qid").isNotNull() & F.col("_labels").isNotNull())
        .select("qid", F.explode("_labels").alias("_k", "name"))
        .select(
            "qid",
            F.regexp_replace("_k", "^name:", "").alias("lang"),
            "name",
        )
        .filter(F.col("name").isNotNull() & (F.col("name") != ""))
    )
    return df


def write_wikidata_names(path: str, rows, mixed_shapes: bool = True) -> str:
    """rows = [(qid, {lang: name})] → JSON-lines fixture file. With
    mixed_shapes, alternates object/array line forms (and name:-prefixed
    keys on the array form) so readers must handle both."""
    import json

    with open(path, "w", encoding="utf-8") as f:
        for i, (qid, labels) in enumerate(rows):
            if mixed_shapes and i % 2 == 1:
                f.write(json.dumps(
                    [qid, {f"name:{k}": v for k, v in labels.items()}],
                    ensure_ascii=False, sort_keys=True) + "\n")
            else:
                f.write(json.dumps(
                    {"id": qid, "labels": labels},
                    ensure_ascii=False, sort_keys=True) + "\n")
    return path

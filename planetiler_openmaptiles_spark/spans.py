"""Span codec: interleaved `documents` table ⇄ typed feature rows.

Engine input (BASELINE.json input_hint):

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

Deterministic span encoding of one geospatial element (FIXTURES.md §1):

    offset 0, kind='src'  : text = "<source>|<source_layer-or-''>|<numeric_id>"
    kind='tag'            : text = "key=value", key-sorted
    kind='geom'           : WKT (lon/lat), chunked at GEOM_CHUNK chars
    kind='rel'            : text = "<rel_id>|<role>|<json tags>" (OSM only)
    kind='media'          : media_ref = "img://<hash>", text = "" (pass-through)

Everything in `decode_documents` is Spark built-in higher-order functions —
the decode of 10^12 docs stays inside whole-stage codegen, no Python. The
span-sequence equality invariant (kind, text, media_ref, order) is enforced
by `with_span_invariant`, which re-encodes the parsed row JVM-side and
compares against the original spans array.

Reference parity: this replaces the reference's SourceFeature +
relation-membership replay (OpenMapTilesProfile.java:112-142,
Transportation.java:406-416) with a columnar decode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEOM_CHUNK = 2000

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)

REL_TAGS_SCHEMA = T.MapType(T.StringType(), T.StringType())


def _spans_of(kind: str, spans: Column = None) -> Column:
    spans = F.col("spans") if spans is None else spans
    return F.filter(spans, lambda s: s["kind"] == F.lit(kind))


def decode_documents(docs: DataFrame) -> DataFrame:
    """documents → feature rows (one per doc). Pure JVM expressions.

    Cost discipline: no global span sort — each field filters its span kind
    first (one cheap array scan) and only order-sensitive kinds (geom
    chunks, rels, media) sort their own small subset. The naive
    sort-then-derive form re-sorted the full array once per derived field
    (Catalyst does not CSE across lambda bodies) and was ~10× slower.
    """

    def _by_offset(arr: Column) -> Column:
        return F.array_sort(
            arr,
            lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
            .when(a["offset"] > b["offset"], F.lit(1))
            .otherwise(F.lit(0)),
        )

    src_parts = F.split(F.element_at(_spans_of("src"), 1)["text"], r"\|", 3)
    tags = F.map_from_entries(
        F.transform(
            _spans_of("tag"),
            lambda s: F.struct(
                F.substring_index(s["text"], "=", 1).alias("key"),
                # value = everything after the first '=' (values may contain '=')
                F.regexp_replace(s["text"], "^[^=]*=", "").alias("value"),
            ),
        )
    )
    geom_wkt = F.array_join(
        F.transform(_by_offset(_spans_of("geom")), lambda s: s["text"]), ""
    )
    rels = F.transform(
        _by_offset(_spans_of("rel")),
        lambda s: F.struct(
            F.split(s["text"], r"\|", 3)[0].cast("long").alias("rel_id"),
            F.split(s["text"], r"\|", 3)[1].alias("role"),
            F.from_json(F.split(s["text"], r"\|", 3)[2], REL_TAGS_SCHEMA).alias("rel_tags"),
        ),
    )
    media_refs = F.transform(_by_offset(_spans_of("media")), lambda s: s["media_ref"])
    geom_head = F.upper(F.trim(F.substring_index(geom_wkt, "(", 1)))
    geom_kind = (
        F.when(geom_head.isin("POINT", "MULTIPOINT"), F.lit("point"))
        .when(geom_head.isin("LINESTRING", "MULTILINESTRING"), F.lit("linestring"))
        .when(geom_head.isin("POLYGON", "MULTIPOLYGON"), F.lit("polygon"))
        .otherwise(F.lit("other"))
    )
    return docs.select(
        F.col("doc_id"),
        src_parts[0].alias("source"),
        src_parts[1].alias("source_layer"),
        src_parts[2].cast("long").alias("elem_id"),
        tags.alias("tags"),
        geom_wkt.alias("geom_wkt"),
        geom_kind.alias("geom_kind"),
        rels.alias("rels"),
        media_refs.alias("media_refs"),
    )


def reencode_spans(feat: DataFrame | None = None) -> Column:
    """Rebuild the canonical spans array from decoded columns (JVM-side).

    Used by the span-sequence-equality invariant: for a well-formed document
    the reconstruction must equal the original spans on (kind, text,
    media_ref, order). Media spans are appended after geom spans (the
    canonical generator ordering: src, tags, geom, rel, media)."""
    src = F.array(
        F.struct(
            F.lit("src").alias("kind"),
            F.concat_ws("|", F.col("source"), F.col("source_layer"), F.col("elem_id").cast("string")).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        )
    )
    tag_spans = F.transform(
        F.array_sort(F.map_entries(F.col("tags"))),
        lambda e: F.struct(
            F.lit("tag").alias("kind"),
            F.concat(e["key"], F.lit("="), e["value"]).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        ),
    )
    n_chunks = F.ceil(F.length("geom_wkt") / F.lit(GEOM_CHUNK)).cast("int")
    geom_spans = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.struct(
            F.lit("geom").alias("kind"),
            F.substring(F.col("geom_wkt"), i * GEOM_CHUNK + 1, GEOM_CHUNK).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        ),
    )
    rel_spans = F.transform(
        F.col("rels"),
        lambda r: F.struct(
            F.lit("rel").alias("kind"),
            F.concat_ws(
                "|",
                r["rel_id"].cast("string"),
                r["role"],
                F.to_json(r["rel_tags"]),
            ).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        ),
    )
    media_spans = F.transform(
        F.col("media_refs"),
        lambda m: F.struct(
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            m.alias("media_ref"),
        ),
    )
    all_spans = F.concat(src, tag_spans, geom_spans, rel_spans, media_spans)
    # stamp dense offsets
    return F.transform(
        all_spans,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def with_span_invariant(docs: DataFrame, features: DataFrame) -> DataFrame:
    """Join decoded features back to raw docs and flag invariant violations.

    Returns features + `span_invariant_ok` boolean. Pipelines assert
    count(span_invariant_ok = false) == 0 as a stage gate."""
    raw = docs.select("doc_id", F.array_sort(
        F.col("spans"),
        lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    ).alias("_orig_spans"))
    rebuilt = features.withColumn("_rebuilt", reencode_spans())
    joined = rebuilt.join(raw, "doc_id", "left")
    cmp = F.aggregate(
        F.zip_with(
            F.col("_rebuilt"),
            F.col("_orig_spans"),
            lambda a, b: (
                a["kind"].eqNullSafe(b["kind"])
                & a["text"].eqNullSafe(b["text"])
                & a["media_ref"].eqNullSafe(b["media_ref"])
                & a["offset"].eqNullSafe(b["offset"])
            ).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0)),
    )
    ok = (F.size("_rebuilt") == F.size("_orig_spans")) & (cmp == F.size("_rebuilt"))
    return joined.withColumn("span_invariant_ok", ok).drop("_rebuilt", "_orig_spans")


def assert_span_invariant(docs: DataFrame, features: DataFrame) -> None:
    bad = with_span_invariant(docs, features).filter(~F.col("span_invariant_ok")).limit(5)
    rows = bad.collect()
    if rows:
        raise AssertionError(
            f"span-sequence invariant violated for doc_ids: {[r['doc_id'] for r in rows]}"
        )

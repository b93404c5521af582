"""Margin-based bitext mining (Artetxe & Schwenk 2019, the LASER/CCMatrix
recipe): find candidate parallel sentence/document pairs across two
language sides of a corpus by scoring cross-lingual similarity with a
RATIO MARGIN instead of raw cosine —

    margin(x, y) = cos(x, y) / ((avg_topk_cos(x) + avg_topk_cos(y)) / 2)

which cancels the hubness that makes absolute cosine thresholds useless
for retrieval. A pair is mined when each side is the other's best margin
match (mutual top-1) and the margin clears a threshold.

Embeddings come from the in-engine hashing-trick featurizer
(`selection.hash_embed_docs` — md5-bucketed unigram counts, L2
normalized) so the whole operator is deterministic and oracle-replayable;
in production you swap in a multilingual encoder column and keep every
join below unchanged.

Scale shape: the cross-side similarity is a broadcast of the SMALLER
language side against the larger (the realistic shape — a low-resource
side vs an English side); per-side top-k and the mutual-best selection
are two windows over the scored pair table, rounded before ranking so
the cut is deterministic across engines and partitionings. For two huge
sides, bucket the join with `similarity.lsh_topk`'s hyperplane buckets
first; the margin math is unchanged.

Reference analog: none (planetiler is geospatial-only) — north-rule
training-data-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .selection import hash_embed_docs
from .similarity import cosine


def mine_bitext(
    docs: DataFrame,
    lang_x: str = "en",
    lang_y: str = "es",
    k: int = 4,
    threshold: float = 1.0,
    dim: int = 64,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mine mutual-best margin pairs between the ``lang_x`` and ``lang_y``
    sides. Returns ``(x_id, y_id, margin)`` with margin rounded to 6
    decimals, one row per mined pair."""
    x = hash_embed_docs(
        docs.filter(F.col(lang_col) == lang_x), dim=dim,
        text_col=text_col, id_col=id_col,
    ).select(F.col("doc_id").alias("x_id"), F.col("vec").alias("xv"))
    y = hash_embed_docs(
        docs.filter(F.col(lang_col) == lang_y), dim=dim,
        text_col=text_col, id_col=id_col,
    ).select(F.col("doc_id").alias("y_id"), F.col("vec").alias("yv"))

    # broadcast the genuinely SMALLER side (one cheap count per side —
    # nothing here is materialized yet); the docstring's low-resource-side
    # assumption must not become a silent OOM when a caller passes the big
    # side as lang_y. Column roles (x/y) are unchanged either way.
    if y.count() <= x.count():
        pairs = x.join(F.broadcast(y), F.lit(True))
    else:
        pairs = y.join(F.broadcast(x), F.lit(True))
    # localCheckpoint: the scored pair table feeds four windows/joins below;
    # eager materialization computes the cross-side similarity exactly once
    # and truncates the plan (blocks are freed when the DF is GC'd — no
    # dangling persist to leak into later stages)
    scored = (
        pairs
        .select("x_id", "y_id", F.round(cosine(F.col("xv"), F.col("yv")), 9).alias("cos"))
        .localCheckpoint(eager=True)
    )
    wx = Window.partitionBy("x_id").orderBy(F.desc("cos"), F.asc("y_id"))
    wy = Window.partitionBy("y_id").orderBy(F.desc("cos"), F.asc("x_id"))
    ax = (
        scored.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= k)
        .groupBy("x_id")
        .agg(F.avg("cos").alias("ax"))
    )
    ay = (
        scored.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") <= k)
        .groupBy("y_id")
        .agg(F.avg("cos").alias("ay"))
    )
    m = (
        scored.join(ax, "x_id")
        .join(ay, "y_id")
        .select(
            "x_id", "y_id",
            F.round(
                F.col("cos") / ((F.col("ax") + F.col("ay")) / 2.0), 6
            ).alias("margin"),
        )
    )
    wmx = Window.partitionBy("x_id").orderBy(F.desc("margin"), F.asc("y_id"))
    wmy = Window.partitionBy("y_id").orderBy(F.desc("margin"), F.asc("x_id"))
    out = (
        m.withColumn("rx", F.row_number().over(wmx))
        .withColumn("ry", F.row_number().over(wmy))
        .filter((F.col("rx") == 1) & (F.col("ry") == 1)
                & (F.col("margin") >= threshold))
        .select("x_id", "y_id", "margin")
    )
    return out

"""T5-style span-corruption masking (Raffel et al. 2020, §3.1.4).

The denoising-pretraining data transform: ~`mask_rate` of each document's
tokens are replaced by numbered sentinel tokens, with corruption applied
in multi-token SPANS (mean length `span_len`) rather than i.i.d. tokens —
consecutive masked tokens collapse into ONE `<extra_id_k>` sentinel.

Determinism contract: the mask decision for position i of document d is a
pure function of md5(f"{d}:{i}") — the same id-hash uniform the engine's
hash_split/mix_sample use — so the corruption is reproducible across
runs, engines, and repartitioning (an independent engine can replay every
mask decision exactly; no RNG state anywhere).

Cost at 100 TB: one posexplode, three window functions over the SAME
(doc_id, pos) ordering (one shuffle — Catalyst collapses same-partitioning
windows into one Window node), one groupBy doc_id to reassemble. No
joins, no driver state.

Reference parity: none (the reference ingests OSM); this is a
training-data-pipeline addition per the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from planetiler_openmaptiles_spark.textops.selection import _words


def span_mask(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_rate: float = 0.15,
    span_len: int = 3,
) -> DataFrame:
    """Returns (doc_id, n_tokens, n_masked, n_spans, masked_text).

    A span STARTS at position i when u(d, i) < mask_rate / span_len
    (so the expected masked fraction is ~mask_rate), and covers
    positions i..i+span_len-1; overlapping spans merge. The first
    position of each merged run emits `<extra_id_k>` (k numbered 0..
    within the document, in order); the rest of the run emits nothing.
    """
    p_start = mask_rate / span_len
    # posexplode_OUTER: empty / whitespace-only documents keep their row
    # (pos NULL), so they surface with n_tokens=0 instead of silently
    # vanishing from the output and breaking downstream joins
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(_words(text_col)).alias("pos", "word"),
    )
    from planetiler_openmaptiles_spark.textops.mixing import hash_uniform

    u = hash_uniform(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                 F.col("pos").cast("string"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    wspan = w.rowsBetween(-(span_len - 1), 0)
    marked = toks.withColumn(
        "_start",
        F.when(F.col("pos").isNotNull() & (u < F.lit(p_start)), 1).otherwise(0),
    )
    marked = marked.withColumn("_m", F.max("_start").over(wspan) == 1)
    marked = marked.withColumn(
        "_first",
        F.col("_m") & ~F.coalesce(F.lag("_m").over(w), F.lit(False)),
    )
    marked = marked.withColumn("_span_no", F.sum(F.col("_first").cast("int")).over(w))
    token = (
        F.when(~F.col("_m"), F.col("word"))
        .when(
            F.col("_first"),
            F.concat(F.lit("<extra_id_"), (F.col("_span_no") - 1).cast("string"),
                     F.lit(">")),
        )
        .otherwise(F.lit(None))
    )
    return (
        marked.select("doc_id", "pos", token.alias("_tok"),
                      F.col("_m").cast("int").alias("_mi"),
                      F.col("_first").cast("int").alias("_fi"))
        .groupBy("doc_id")
        .agg(
            F.count("pos").cast("int").alias("n_tokens"),
            F.coalesce(F.sum("_mi"), F.lit(0)).cast("int").alias("n_masked"),
            F.coalesce(F.sum("_fi"), F.lit(0)).cast("int").alias("n_spans"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_tok").isNotNull(),
                                   F.struct("pos", "_tok"))
                        )
                    ),
                    lambda s: s["_tok"],
                ),
                " ",
            ).alias("masked_text"),
        )
        .select("doc_id", "n_tokens", "n_masked", "n_spans", "masked_text")
    )

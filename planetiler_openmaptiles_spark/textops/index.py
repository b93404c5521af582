"""Corpus indexing and profiling: inverted index build, per-domain stats.

* ``build_inverted_index`` — materialize a search index table
  (term, df, total_tf, n_postings, postings) from the corpus. Postings
  are capped at ``max_postings`` per term (kept by highest tf, then
  doc_id) so a stop-word term cannot produce an unbounded row — the cap
  is applied with a per-term window BEFORE the list is assembled, so no
  executor ever holds an uncapped posting list. Posting lists serialize
  as ``doc:tf,doc:tf,...`` ordered by doc_id (engine-portable, and the
  on-disk form a downstream sharded index would store per segment).

  Shuffle shape: explode → groupBy(term, doc), then a salted
  (term, doc_id%64) top-N pre-cap, then the per-term window over the
  ≤64·N survivors; the df/total_tf aggregate and the final assembly
  reuse the term hash partitioning. Skewed terms cost two bounded
  sorts, never one giant one.

* ``corpus_stats`` — per-domain corpus profile with EXACT percentiles
  (Spark's ``percentile`` aggregate: sort-based, linear interpolation —
  matching DuckDB's ``quantile_cont`` definition bit-for-bit on the
  same data). One map-side-combined shuffle on the domain key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from planetiler_openmaptiles_spark.textops.selection import _words


def build_inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 1000,
) -> DataFrame:
    """(term, df, total_tf, n_postings, postings) — see module doc."""
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_words(text_col)).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    # Two-phase salted top-N: top-N by (tf desc, doc_id) is distributive,
    # so take the per-salt top-N first (64 bounded sorts) and only then
    # the global per-term top-N over <= 64*N survivors. A stop-word term
    # with 10^9 postings never lands its full list in one sort.
    salt_rn = F.row_number().over(
        Window.partitionBy("term", F.pmod("doc_id", F.lit(64))).orderBy(
            F.desc("tf"), "doc_id"
        )
    )
    pre = tf.withColumn("rn", salt_rn).where(F.col("rn") <= max_postings)
    rn = F.row_number().over(
        Window.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    )
    capped = pre.withColumn("rn", rn).where(F.col("rn") <= max_postings)
    postings = capped.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_postings"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                lambda x: F.concat_ws(":", x["doc_id"], x["tf"]),
            ),
            ",",
        ).alias("postings"),
    )
    return stats.join(postings, "term").orderBy("term")


def corpus_stats(
    docs: DataFrame,
    domain_col: str = "source",
    len_col: str = "n_chars",
) -> DataFrame:
    """Per-domain profile: doc count, language spread, mean and exact
    p50/p90/p99 of document length."""
    pct = F.percentile(F.col(len_col), F.array(*[F.lit(p) for p in (0.5, 0.9, 0.99)]))
    return (
        docs.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.round(F.avg(len_col), 6).alias("avg_chars"),
            pct.alias("_p"),
        )
        .select(
            "domain",
            "n_docs",
            "n_langs",
            "avg_chars",
            F.round(F.element_at("_p", 1), 6).alias("p50_chars"),
            F.round(F.element_at("_p", 2), 6).alias("p90_chars"),
            F.round(F.element_at("_p", 3), 6).alias("p99_chars"),
        )
        .orderBy("domain")
    )

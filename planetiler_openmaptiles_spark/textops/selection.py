"""Data-selection ops: DSIR importance weights and BM25 ranking.

Two corpus-selection primitives a training-data pipeline runs after
cleaning/dedup:

* ``dsir_weights`` — Data Selection via Importance Resampling
  (Xie et al. 2023, arXiv:2302.03169): score every raw document by how
  much it "looks like" a target domain, using hashed n-gram bag-of-words
  models of the target and raw distributions. The per-doc log importance
  weight is  sum_f  log p_target(f) - log p_raw(f)  over the doc's
  feature occurrences, with add-one smoothing over B hash buckets.

* ``bm25_search`` — Okapi BM25 ranking of the corpus against a fixed
  query (the Lucene ``k1=1.2, b=0.75`` variant with the non-negative
  ``log(1 + (N-df+0.5)/(df+0.5))`` idf).

Scale shape (both): per-doc feature extraction is pure Column
expressions over the token array (higher-order functions, whole-stage
codegen, zero Python). Corpus statistics are one map-side-combined
aggregate producing a tiny table (B buckets / one scalar row) that is
broadcast back; the only real shuffle is the per-doc re-aggregation in
DSIR (hash on doc_id). Nothing is quadratic, nothing driver-side.

The feature hash is md5-derived (not xxhash64) so an independent SQL
engine can replay it exactly; at 100 TB you would swap ``_bucket_expr``
for xxhash64 and keep everything else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text_col: str) -> Column:
    """Whitespace tokens with empties removed (split on runs of spaces)."""
    return F.filter(
        F.split(F.col(text_col), " "), lambda w: w != F.lit("")
    )


def _bucket_expr(s: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash: first 32 bits of md5 mod n_buckets."""
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def doc_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """(doc_id, feature) pairs: hashed-bigram occurrences, one row per
    bigram token position (repeats kept — DSIR counts occurrences)."""
    w = _words(text_col)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: _bucket_expr(
            F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
            n_buckets,
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.when(F.size(w) >= 2, bigrams).otherwise(F.array())).alias(
            "feature"
        ),
    )


def hash_embed_docs(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick document embedding, entirely in-engine: unigram
    counts hashed into ``dim`` buckets (the engine-portable md5 bucket),
    L2-normalized — the deterministic featurizer that feeds the ANN /
    near-dup / SemDeDup operators when no external model is available.

    Returns (doc_id, vec) with vec an array<double>. Shape: one explode
    + one (doc_id, bucket) count + one per-doc map build; the dense
    projection is a pure Column transform over ``sequence(0, dim-1)``
    (no pivot, no Python). Docs with zero tokens are excluded."""
    kv = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_words(text_col)).alias("word"),
    ).select("doc_id", _bucket_expr(F.col("word"), dim).alias("b"))
    m = (
        kv.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "c"))
            ).alias("m")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("m"), i.cast("long")), F.lit(0)
        ).cast("double"),
    )
    withd = m.select("doc_id", dense.alias("d"))
    nrm = F.sqrt(
        F.aggregate(
            F.col("d"), F.lit(0.0), lambda acc, v: acc + v * v
        )
    )
    return withd.select(
        "doc_id",
        F.transform(F.col("d"), lambda v: v / nrm).alias("vec"),
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR log importance weight against the target slice.

    ``target_pred`` selects the target-domain rows *within* ``docs``
    (e.g. ``F.col("source") == "src0"``); the raw distribution is the
    whole corpus. Returns (doc_id, n_features, log_weight) for every
    document, log_weight rounded to 6 decimals.

    Plan: one pass builds the (doc_id, feature) stream twice-counted
    aggregate — total and target occurrences per bucket in the SAME
    groupBy (count_if) — so the corpus is scanned once for statistics;
    the ≤n_buckets-row model is broadcast back onto the feature stream
    and summed per doc. Two shuffles total (bucket agg is tiny).
    """
    tagged = docs.withColumn("_is_target", target_pred)
    w = _words(text_col)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: _bucket_expr(
            F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
            n_buckets,
        ),
    )
    stream = tagged.select(
        F.col(id_col).alias("doc_id"),
        F.col("_is_target"),
        F.explode(F.when(F.size(w) >= 2, bigrams).otherwise(F.array())).alias(
            "feature"
        ),
    )
    model = stream.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_if(F.col("_is_target")).alias("n_target"),
    )
    totals = model.agg(
        F.sum("n_raw").alias("tot_raw"), F.sum("n_target").alias("tot_target")
    )
    scored = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "feature",
            (
                F.log((F.col("n_target") + 1) / (F.col("tot_target") + n_buckets))
                - F.log((F.col("n_raw") + 1) / (F.col("tot_raw") + n_buckets))
            ).alias("log_ratio"),
        )
    )
    return (
        stream.join(F.broadcast(scored), "feature")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.round(F.sum("log_ratio"), 6).alias("log_weight"),
        )
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
) -> DataFrame:
    """Top-``limit`` documents by Okapi BM25 score for ``query_terms``.

    Per-term tf is ``size(filter(words, = term))`` — no explode, no
    per-term join: the handful of query terms unroll into one fused
    projection. Corpus stats (N, avgdl, per-term df) are ONE aggregate
    row broadcast back. Ordering is on the 6-decimal-rounded score
    (desc) then doc_id, so ranking is reproducible across engines.
    """
    w = _words(text_col)

    def term_freq(term: str) -> Column:
        # NB: the lambda must be single-arg — a second parameter (even a
        # defaulted one) makes PySpark pass the element INDEX into it.
        return F.size(F.filter(w, lambda t: t == F.lit(term)))

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(w).alias("dl"),
        *[term_freq(term).alias(f"tf_{i}") for i, term in enumerate(query_terms)],
    )
    stat_cols = [F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")]
    stat_cols += [
        F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
        for i in range(len(query_terms))
    ]
    stats = base.agg(*stat_cols)
    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        idf = F.log(
            1
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}").cast("double")
        score = score + idf * (
            tf
            * (k1 + 1)
            / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        )
    return (
        scored.select(
            "doc_id", "dl", F.round(score, 6).alias("score")
        )
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(limit)
    )


def mix_sample(
    docs: DataFrame,
    weights: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    total_docs: int | None = None,
) -> DataFrame:
    """Materialize a domain mix: replicate/sample each document so the
    output approaches ``weight[domain] * total`` docs per domain
    (epoch fractioning: every doc gets ``floor(rate)`` guaranteed copies
    plus one more iff its id-hash uniform < frac(rate)).

    Deterministic — the bernoulli draw is the same md5-uniform used by
    ``hash_split`` (a pure function of doc_id), so the materialized
    epoch is reproducible and append-stable. The weights table is tiny
    (one row per domain) and broadcast; the replication is
    ``explode(sequence(...))`` — no shuffle at all beyond the weights
    aggregate itself.

    Returns (doc_id, copy_idx, domain) — ``copy_idx`` in [0, n_copies).
    """
    from planetiler_openmaptiles_spark.textops.mixing import split_fraction

    total = total_docs if total_docs is not None else docs.count()
    rates = weights.select(
        F.col("domain"),
        (F.lit(float(total)) * F.col("weight") / F.col("n_docs")).alias(
            "rate"
        ),
    )
    joined = docs.select(
        F.col(id_col).alias("doc_id"), F.col(domain_col).alias("domain")
    ).join(F.broadcast(rates), "domain")
    n_copies = F.floor("rate").cast("long") + F.when(
        split_fraction("doc_id") < F.col("rate") - F.floor("rate"), 1
    ).otherwise(0)
    return (
        joined.withColumn("n_copies", n_copies)
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias(
                "copy_idx"
            ),
            "domain",
        )
    )

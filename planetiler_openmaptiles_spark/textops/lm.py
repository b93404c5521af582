"""In-engine n-gram language model: train + perplexity filtering.

The CCNet recipe (Wenzek et al. 2020, arXiv:1911.00359) scores every
document with a language-model perplexity and splits the corpus into
head / middle / tail quality buckets at the 1/3 and 2/3 perplexity
quantiles; downstream pipelines keep head+middle. CCNet uses a KenLM
5-gram; this is the same pipeline shape with an add-alpha-smoothed
word-bigram model trained INSIDE the engine on a reference slice of
the corpus (e.g. ``lang = 'en'``), so the whole train→score→bucket
path is one Spark job graph with no external artifacts.

Model: p(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * (V + 1))
over a top-``vocab_size`` vocabulary (count desc, word asc tie-break);
out-of-vocabulary tokens map to ``<unk>``. ``V + 1`` counts the unk
symbol. Per-doc perplexity = exp(-avg ln p) over the doc's bigrams;
docs with fewer than two tokens are not scored.

Scale shape:
* training = two map-side-combined aggregates over the reference
  slice (bigram counts, context counts) — tables bounded by observed
  bigrams (≤ ref tokens), broadcast to the scorer;
* the vocabulary (≤ ``vocab_size`` strings) is collected to the
  driver and inlined as an array literal so token→unk mapping and
  bigram extraction stay pure Column expressions (same pattern as the
  PQ codebooks / IVF centroids); at a 100 TB vocab_size you would
  swap the literal for a broadcast join on exploded tokens;
* scoring = one explode + two broadcast joins + one hash aggregate on
  doc_id; bucketing = one tiny quantile aggregate cross-joined back.
Nothing quadratic, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from planetiler_openmaptiles_spark.textops.selection import _words

UNK = "<unk>"


def _mapped_tokens(text_col: str, vocab: list[str]) -> Column:
    """Token array with out-of-vocabulary words replaced by <unk>."""
    lit_vocab = F.lit(vocab)
    return F.transform(
        _words(text_col),
        lambda x: F.when(F.array_contains(lit_vocab, x), x).otherwise(
            F.lit(UNK)
        ),
    )


def _bigram_rows(
    docs: DataFrame, vocab: list[str], text_col: str, extra_cols: list[str]
) -> DataFrame:
    """One row per bigram position: (*extra_cols, w1, w2). Duplicates
    kept — the model counts occurrences."""
    toks = _mapped_tokens(text_col, vocab)
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    exploded = docs.select(
        *extra_cols,
        F.explode(
            F.when(F.size(toks) >= 2, pairs).otherwise(F.array())
        ).alias("bg"),
    )
    return exploded.select(*extra_cols, "bg.w1", "bg.w2")


def lm_vocab(
    ref: DataFrame, vocab_size: int, text_col: str = "text"
) -> list[str]:
    """Top-``vocab_size`` words of the reference slice by (count desc,
    word asc) — the deterministic vocabulary."""
    rows = (
        ref.select(F.explode(_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(vocab_size)
        .collect()
    )
    return [r["word"] for r in rows]


def train_bigram_lm(
    docs: DataFrame,
    ref_pred: Column,
    vocab_size: int = 256,
    text_col: str = "text",
) -> tuple[list[str], DataFrame, DataFrame]:
    """Train on ``docs.filter(ref_pred)``; returns (vocab,
    bigram_counts(w1, w2, c2), context_counts(w1, c1))."""
    ref = docs.filter(ref_pred)
    vocab = lm_vocab(ref, vocab_size, text_col)
    bg = _bigram_rows(ref, vocab, text_col, [])
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return vocab, c2, c1


def perplexity_buckets(
    docs: DataFrame,
    ref_pred: Column,
    vocab_size: int = 256,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, ppl, bucket) for every doc with ≥ 2 tokens: perplexity
    under the reference-slice bigram LM, bucketed head / middle / tail
    at the 1/3 and 2/3 quantiles (lower perplexity = head). ``ppl`` is
    rounded to 6 decimals and the thresholds are computed on — and
    compared against — the rounded values, so bucket edges are
    engine-portable."""
    vocab, c2, c1 = train_bigram_lm(docs, ref_pred, vocab_size, text_col)
    v1 = len(vocab) + 1  # + <unk>

    scored = (
        _bigram_rows(docs, vocab, text_col, [id_col])
        .join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .select(
            F.col(id_col).alias("doc_id"),
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
                / (
                    F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(alpha) * F.lit(v1)
                )
            ).alias("lp"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.exp(-F.avg("lp")), 6).alias("ppl"))
    )

    cuts = scored.agg(
        F.round(F.expr("percentile(ppl, 1.0/3)"), 6).alias("t1"),
        F.round(F.expr("percentile(ppl, 2.0/3)"), 6).alias("t2"),
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "ppl",
            F.when(F.col("ppl") <= F.col("t1"), "head")
            .when(F.col("ppl") <= F.col("t2"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )

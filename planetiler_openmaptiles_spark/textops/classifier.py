"""In-engine model training: distributed logistic regression.

A fastText-style quality/language classifier trained INSIDE the engine:
batch gradient descent where each iteration is ONE map-side-combined
aggregate over the corpus (the gradient is a k-vector of avgs), and the
k scalar weights live on the driver — the textbook distributed-GD
split. No MLlib, no Python in the row path; the feature projection and
the per-row sigmoid/gradient terms are pure Column expressions.

Scale shape: ``iters`` scans of the (persisted) feature projection,
each a single aggregate — at 100 TB you persist the (y, f0..fk) frame
once (tiny: k+1 doubles per doc) and every iteration is one
whole-stage-codegen pass + a k-double collect.

Features are exact integer ratios (word count, char/word, stopword
share) so an independent engine reproduces them bit-for-bit; the only
cross-engine float drift is summation order and libm exp, both far
below the 6-decimal comparison grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from planetiler_openmaptiles_spark.textops.selection import _words

FEATURE_NAMES = ("bias", "n_words", "avg_word_len", "stopword_ratio")


def feature_frame(
    docs: DataFrame,
    text_col: str = "text",
    label_pred=None,
    id_cols: tuple = (),
) -> DataFrame:
    """(*id_cols, y, f0..f3): label + the fixed feature vector.
    ``label_pred`` defaults to ``lang == 'en'``."""
    if label_pred is None:
        label_pred = F.col("lang") == "en"
    w = _words(text_col)
    nw = F.size(w)
    tc = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, v: a + v
    )
    sw = F.size(F.filter(w, lambda x: x.isin("the", "a")))
    return docs.select(
        *id_cols,
        F.when(label_pred, 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("f0"),
        (nw / 100.0).alias("f1"),
        F.when(nw > 0, (tc * 1.0 / nw) / 10.0).otherwise(0.0).alias("f2"),
        F.when(nw > 0, sw * 1.0 / nw).otherwise(0.0).alias("f3"),
    )


def train_logreg(
    docs: DataFrame,
    iters: int = 3,
    lr: float = 1.0,
    text_col: str = "text",
    label_pred=None,
) -> list[float]:
    """Batch-GD logistic regression from zero weights; returns the
    weight vector after ``iters`` full-batch updates
    (w_i -= lr * avg((sigmoid(w.x) - y) * x_i))."""
    f = feature_frame(docs, text_col, label_pred).persist()
    k = len(FEATURE_NAMES)
    w = [0.0] * k
    try:
        for _ in range(iters):
            margin = F.lit(w[0]) * F.col("f0")
            for i in range(1, k):
                margin = margin + F.lit(w[i]) * F.col(f"f{i}")
            p = 1.0 / (1.0 + F.exp(-margin))
            row = f.agg(
                *[
                    F.avg((p - F.col("y")) * F.col(f"f{i}")).alias(f"g{i}")
                    for i in range(k)
                ]
            ).collect()[0]
            w = [w[i] - lr * row[f"g{i}"] for i in range(k)]
    finally:
        f.unpersist()
    return w


def score_docs(
    docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Apply a trained weight vector: (doc_id, score, keep) where score
    is the rounded sigmoid probability and keep = score >= threshold
    (compared on the ROUNDED value so the cut is engine-portable). One
    codegen projection — the filter pass of a fastText-style quality
    classifier over the full corpus."""
    f = feature_frame(docs, text_col, id_cols=(id_col,))
    margin = F.lit(weights[0]) * F.col("f0")
    for i in range(1, len(weights)):
        margin = margin + F.lit(weights[i]) * F.col(f"f{i}")
    score = F.round(1.0 / (1.0 + F.exp(-margin)), 6)
    return f.select(
        F.col(id_col).alias("doc_id"),
        score.alias("score"),
        (score >= F.lit(threshold)).alias("keep"),
    )


def trained_weights_df(
    docs: DataFrame, iters: int = 3, lr: float = 1.0
) -> DataFrame:
    """(feature, weight) rows for the trained classifier — the driver-
    query surface (weights rounded to 6 decimals, feature-ordered)."""
    w = train_logreg(docs, iters=iters, lr=lr)
    spark = docs.sparkSession
    return spark.createDataFrame(
        sorted(zip(FEATURE_NAMES, [round(v, 6) for v in w])),
        "feature string, weight double",
    )

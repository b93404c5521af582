"""Dataset assembly ops: deterministic splits and domain mixing weights.

The last mile of a training-data pipeline: after dedup/filter/pack, the
corpus is split into train/val/test and its sources are re-weighted for
sampling. Both ops are pure Column expressions / tiny aggregates — no
per-row Python, no large shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_uniform(s) -> "F.Column":
    """THE engine-portable id-hash uniform: first 32 bits of md5(s) as a
    value in [0, 1). hash_split / mix_sample / span_mask (and the DuckDB
    oracle replays) all share this one expression — change it here and
    every consumer moves together."""
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    )


def split_fraction(id_col) -> "F.Column":
    """Uniform [0, 1) value derived from the document id alone
    (md5 → first 32 bits). A pure function of the id, so the assignment
    is reproducible across runs, engines, partitionings, and cluster
    sizes — and appending new data never reassigns an existing doc."""
    return hash_uniform(F.col(id_col).cast("string"))


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    ``weights`` maps split name → fraction (must sum to ~1); splits are
    assigned by cumulative threshold in the given order. Zero shuffles:
    the whole op is one map over the scan at any corpus size.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    u = split_fraction(id_col)
    names = list(weights)
    expr = F.lit(names[-1])
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += weights[name]
        cases.append((acc, name))
    for bound, name in reversed(cases):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(u, 9).alias("u"),
        expr.alias("split"),
    )


def domain_mix_weights(
    docs: DataFrame, domain_col: str = "source", alpha: float = 0.3
) -> DataFrame:
    """Temperature-based domain re-weighting (the multilingual-training
    p^alpha scheme): sampling weight w_s ∝ (n_s / N)^alpha, normalized
    over domains. Low-resource domains are up-sampled as alpha → 0.

    Scale shape: one shuffle on the domain key with map-side combine;
    the two normalizing totals are aggregates over #domains rows (tiny),
    broadcast back via cross joins — nothing driver-side, nothing
    quadratic.
    """
    counts = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").cast("double").alias("corpus_n"))
    p = counts.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        (F.col("n_docs") / F.col("corpus_n")).alias("p"),
        F.pow(F.col("n_docs") / F.col("corpus_n"), F.lit(alpha)).alias("pa"),
    )
    z = p.agg(F.sum("pa").alias("z"))
    return (
        p.crossJoin(F.broadcast(z))
        .select(
            "domain",
            "n_docs",
            F.round("p", 6).alias("p"),
            F.round(F.col("pa") / F.col("z"), 6).alias("weight"),
        )
        .orderBy("domain")
    )


def stratified_sample(
    docs: DataFrame,
    n_per_domain: int = 100,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_domain`` documents
    with the lowest id-hash uniform per domain. A pure function of ids,
    so the sample is reproducible and append-stable (a new doc enters
    the sample only by displacing the current max-u member).

    Skew shape: top-N per domain is distributive, so a salted
    (domain, doc_id%64) pre-cap bounds every sort — a domain holding
    half the corpus never lands its full row set in one partition.
    """
    u = split_fraction(id_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("domain"),
        F.round(u, 9).alias("u"),
    )
    pre_rn = F.row_number().over(
        Window.partitionBy("domain", F.pmod("doc_id", F.lit(64))).orderBy(
            "u", "doc_id"
        )
    )
    pre = base.withColumn("rn", pre_rn).where(F.col("rn") <= n_per_domain)
    rn = F.row_number().over(
        Window.partitionBy("domain").orderBy("u", "doc_id")
    )
    return (
        pre.withColumn("rank_in_domain", rn)
        .where(F.col("rank_in_domain") <= n_per_domain)
        .select("domain", "rank_in_domain", "doc_id", "u")
    )

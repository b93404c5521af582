"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k via a broadcast probe join with the dot
product computed JVM-side (`F.zip_with` + `F.aggregate` — no Python).
Scale path: LSH bucketing (random hyperplane signs) or IVF (coarse k-means
assignment) so each probe touches one bucket's partition instead of the
full table; both expressed as plain equi-joins on bucket keys.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (F.greatest(_norm(a) * _norm(b), F.lit(1e-12)))


def brute_force_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Exact cosine top-k per probe: broadcast the (small) probe set against
    the big embedding table; one shuffle for the per-probe top-k window."""
    j = embeddings.join(F.broadcast(probes), F.lit(True))
    sim = cosine(F.col(vec_col), F.col(probe_vec_col))
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        j.select(F.col(probe_id_col), F.col(id_col), sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------------------------- IVF


def _training_sample(
    embeddings: DataFrame, id_col: str, vec_col: str, sample: int
) -> list:
    """Deterministic lowest-`sample`-ids training sample, with a
    hash-bucket pre-prune at scale: TakeOrdered alone touches every
    partition's full vector payload at 100 TB. When the table holds far
    more rows than `sample`, first filter to a deterministic 1/mod hash
    bucket of the ids (~8x oversample, so the lowest-`sample` survivors
    are a stable function of the data, not of partitioning), THEN
    TakeOrdered — the sort input shrinks from n rows to ~8*sample. At
    test scale (n <= 8*sample) mod == 1 and the result is bit-identical
    to the historical plain `orderBy(id).limit(sample)`."""
    n = embeddings.select(id_col).count()  # column-pruned count, no vecs
    mod = max(1, n // (sample * 8))
    cand = embeddings
    if mod > 1:
        cand = embeddings.filter(
            F.pmod(
                F.abs(F.xxhash64(F.col(id_col).cast("string"))), F.lit(mod)
            )
            == 0
        )
    return cand.orderBy(id_col).limit(sample).select(vec_col).collect()


def train_ivf_centroids(
    embeddings: DataFrame,
    dim: int,
    k: int = 16,
    iters: int = 5,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic coarse quantizer: Lloyd's k-means on a fixed sample
    (lowest ids — reproducible), driver-side numpy. The centroid table is
    tiny (k×dim) and broadcasts; at 100 TB you train on a sampled subset
    exactly like this and ship centroids to every executor."""
    import numpy as np

    rows = _training_sample(embeddings, id_col, vec_col, sample)
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cent = x[:k].copy()  # deterministic init: first k sampled vectors
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return [[float(v) for v in c] for c in cent]


def _unit_centroids(centroids: list) -> list:
    """Cosine vs a centroid divides only by the VECTOR norm below (the
    centroid norm is a per-centroid constant), which is correct only for
    unit-norm centroids — true of train_ivf_centroids output but not of
    arbitrary caller-supplied lists. Normalize any centroid that is not
    already unit within 1e-9 (trainer output passes through bit-exact,
    keeping historical assignment hashes stable)."""
    out = []
    for c in centroids:
        n = math.sqrt(sum(v * v for v in c))
        if n > 0 and abs(n - 1.0) > 1e-9:
            c = [v / n for v in c]
        out.append(c)
    return out


def ivf_assign(vec_col, centroids: list):
    """Cluster id = argmax cosine vs the broadcast centroid constants —
    pure JVM arithmetic (no UDF). Centroids are unit-normalized on entry
    (see _unit_centroids) so the /query-norm ranking IS cosine."""
    centroids = _unit_centroids(centroids)
    sims = F.array(
        *[
            _dot(vec_col, F.array(*[F.lit(v) for v in c]))
            / F.greatest(_norm(vec_col), F.lit(1e-12))
            for c in centroids
        ]
    )
    # first index of the max similarity (deterministic tie-break)
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def ivf_assign_multi(vec_col, centroids: list, nprobe: int):
    """Top-`nprobe` cluster ids by cosine vs the broadcast centroids
    (ties → lower cluster id), as an array<int> — pure Column math: the
    (−sim, idx) structs sort ascending, so the slice head is the best
    cluster and the argsort is exactly ivf_assign's tie-break. Centroids
    are unit-normalized on entry (see _unit_centroids)."""
    centroids = _unit_centroids(centroids)
    sims = F.array(
        *[
            _dot(vec_col, F.array(*[F.lit(v) for v in c]))
            / F.greatest(_norm(vec_col), F.lit(1e-12))
            for c in centroids
        ]
    )
    ranked = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda i: F.struct(
                (-F.element_at(sims, i + 1)).alias("neg"), i.alias("cl")
            ),
        )
    )
    return F.transform(
        F.slice(ranked, 1, nprobe), lambda s: s["cl"].cast("int")
    )


def ivf_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    centroids: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    nprobe: int = 1,
) -> DataFrame:
    """IVF approximate top-k: candidates live in the probe's `nprobe`
    closest coarse clusters — an equi-join on the cluster id, so each
    probe scans ~nprobe/k of the table. The PROBE side expands to its
    nprobe cluster rows BEFORE the broadcast join (the multiprobe-LSH
    rule: the corpus side never duplicates); clusters are disjoint, so
    candidate rows stay unique without a dedup."""
    e = embeddings.withColumn("_cl", ivf_assign(F.col(vec_col), centroids))
    if nprobe <= 1:
        p = probes.withColumn(
            "_cl", ivf_assign(F.col(probe_vec_col), centroids)
        )
    else:
        p = probes.select(
            "*",
            F.explode(
                ivf_assign_multi(F.col(probe_vec_col), centroids, nprobe)
            ).alias("_cl"),
        )
    j = e.join(F.broadcast(p), "_cl")
    sim = cosine(F.col(vec_col), F.col(probe_vec_col))
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        j.select(F.col(probe_id_col), F.col(id_col), sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------- random-hyperplane LSH


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (Box-Muller-free: cheap
    LCG-driven alternating signs are enough for bucketing)."""
    out, x = [], seed * 6364136223846793005 + 1442695040888963407
    for _ in range(dim):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(((x >> 33) / float(1 << 30)) - 1.0)
    n = math.sqrt(sum(v * v for v in out)) or 1.0
    return [v / n for v in out]


def lsh_bucket(vec_col, dim: int, num_planes: int = 8, seed: int = 42):
    """Integer bucket id: sign bits against `num_planes` fixed hyperplanes —
    pure JVM arithmetic, broadcastable constant planes."""
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = _hyperplane(dim, seed + p)
        dot = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(v) for v in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.shiftleft(F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), p)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Approximate top-k: candidates share the probe's LSH bucket (equi-join
    on the bucket key — prunes the scan to ~1/2^planes of the table)."""
    e = embeddings.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, num_planes))
    p = probes.withColumn("_bucket", lsh_bucket(F.col(probe_vec_col), dim, num_planes))
    j = e.join(F.broadcast(p), "_bucket")
    sim = cosine(F.col(vec_col), F.col(probe_vec_col))
    w = Window.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        j.select(F.col(probe_id_col), F.col(id_col), sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join + exact
    cosine refinement: (id_a, id_b, cosine >= threshold). Buckets are
    capped at `max_bucket` vectors before the self-join (same boilerplate
    skew guard as the text LSH paths) — a degenerate hot bucket is bounded
    at max_bucket² comparisons instead of quadratic in the corpus."""
    e = embeddings.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("_bucket"),
    )
    wb = Window.partitionBy("_bucket").orderBy(F.col(id_col).asc())
    e = e.withColumn("_rn", F.row_number().over(wb)).filter(
        F.col("_rn") <= max_bucket
    ).drop("_rn")
    a = e.alias("a")
    b = e.alias("b")
    sim = cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, "_bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )

# ------------------------------------------------------------- SemDeDup


def semantic_dedup(
    embeddings: DataFrame,
    centroids: list,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 2000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): coarse k-means
    clusters the corpus, then near-identical vectors are pruned WITHIN each
    cluster only — the cluster bound is what makes semantic dedup tractable
    at 100 TB (pairwise work is sum(|cluster|²), not |corpus|²; at scale you
    raise k so clusters stay ~1e4 and this is one equi-join shuffle on the
    cluster id).

    Keep policy: deterministic keep-lowest-id — a vector is dropped iff some
    same-cluster vector with a smaller id has cosine >= threshold (the paper
    keeps one arbitrary representative per duplicate set; lowest-id is the
    reproducible, SQL-replayable choice). Returns one row per input vector:
    (id, cluster, keep, dup_of) with dup_of = the smallest such neighbor.

    Clusters are capped at `max_cluster` members before the self-join (same
    degenerate-hot-bucket guard as embedding_near_dups); overflow rows are
    kept unexamined rather than dropped blind.
    """
    e = embeddings.select(
        F.col(id_col), F.col(vec_col),
        ivf_assign(F.col(vec_col), centroids).alias("_cl"),
    )
    wc = Window.partitionBy("_cl").orderBy(F.col(id_col).asc())
    capped = (
        e.withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") <= max_cluster)
        .drop("_rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    sim = cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    dups = (
        a.join(b, "_cl")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(sim >= threshold)
        .groupBy(F.col(f"b.{id_col}").alias(id_col))
        .agg(F.min(f"a.{id_col}").alias("dup_of"))
    )
    return (
        e.select(F.col(id_col), F.col("_cl").alias("cluster"))
        .join(dups, id_col, "left")
        .withColumn("keep", F.col("dup_of").isNull())
    )


# -------------------------------------------------------------------- PQ


def train_pq_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    (L2-normalized) vector into ``m`` subspaces and k-means each
    independently. Same deterministic recipe as ``train_ivf_centroids``
    (fixed lowest-id sample, first-k init, driver numpy — the trained
    model is m*k*(dim/m) floats, broadcast as literals).

    Returns ``codebooks[m][k] -> list[dim//m]``.
    """
    import numpy as np

    d_sub = dim // m
    rows = _training_sample(embeddings, id_col, vec_col, sample)
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    books = []
    for s in range(m):
        xs = x[:, s * d_sub : (s + 1) * d_sub]
        cent = xs[:k].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append([[float(v) for v in c] for c in cent])
    return books


def _unit(vec_col):
    n = F.greatest(_norm(vec_col), F.lit(1e-12))
    return F.transform(vec_col, lambda v: v / n)


def _code_for_sub(sub_col, book: list):
    """argmin-L2 code for one subvector column vs one codebook —
    ||x-c||^2 ranks as cc - 2*x.c (x.x is constant across codes)."""
    dists = F.array(
        *[
            F.lit(float(sum(v * v for v in c)))
            - 2.0 * _dot(sub_col, F.array(*[F.lit(v) for v in c]))
            for c in book
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_encode_df(
    embeddings: DataFrame,
    codebooks: list,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): encode via THREE staged projections —
    normalize once, slice once per subspace, then the m*k literal dot
    products reference the slice COLUMNS. Without the staging, the norm
    and every slice re-evaluate inside all m*k distance expressions
    (measured ~5x slower). Pure JVM arithmetic, no UDF; the vector is
    L2-normalized so ADC distance relates to cosine (||p-x||^2 = 2-2cos).
    """
    m = len(codebooks)
    d_sub = dim // m
    u = embeddings.select(
        F.col(id_col), _unit(F.col(vec_col)).alias("_u")
    )
    subs = u.select(
        id_col,
        *[
            F.slice("_u", s * d_sub + 1, d_sub).alias(f"_s{s}")
            for s in range(m)
        ],
    )
    return subs.select(
        id_col,
        F.array(
            *[
                _code_for_sub(F.col(f"_s{s}"), book)
                for s, book in enumerate(codebooks)
            ]
        ).alias("codes"),
    )


def pq_encode(vec_col, codebooks: list, dim: int):
    """Single-expression form of the encoder (used by tests / ad-hoc
    columns); prefer ``pq_encode_df`` in pipelines — see its note on
    staged projections."""
    m = len(codebooks)
    d_sub = dim // m
    u = _unit(vec_col)
    return F.array(
        *[
            _code_for_sub(F.slice(u, s * d_sub + 1, d_sub), book)
            for s, book in enumerate(codebooks)
        ]
    )


def pq_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    codebooks: list,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    enc: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the corpus is stored as m byte
    codes per vector (32x smaller than float32 at dim 64 / m 8 — the
    100 TB memory story); each probe builds an m*k distance lookup
    table, and scoring a corpus vector is m table lookups + a fixed-
    order sum. Broadcast probes, one window for the per-probe top-k —
    identical join shape to brute force but over codes, not floats.

    ``enc``: pass an already-encoded (id, codes) frame to skip re-deriving
    it — the m*k-literal encode expression tree is the dominant Catalyst
    compile cost, so callers that just encoded (e.g. to persist the code
    table, the normal PQ serving shape) should hand it in.

    Returns (probe_id, vec_id, approx_dist, rank), approx_dist =
    sum_m ||p_sub - codebook[m][code_m]||^2, rounded to 6 decimals.
    """
    m = len(codebooks)
    d_sub = dim // m
    if enc is None:
        enc = pq_encode_df(embeddings, codebooks, dim, id_col, vec_col)
    # same staged-projection discipline on the probe side: normalize,
    # slice, per-subspace self-dot, THEN the m*k table entries
    psubs = probes.select(
        F.col(probe_id_col), _unit(F.col(probe_vec_col)).alias("_pu")
    ).select(
        probe_id_col,
        *[
            F.slice("_pu", s * d_sub + 1, d_sub).alias(f"_s{s}")
            for s in range(m)
        ],
    ).select(
        probe_id_col,
        *[F.col(f"_s{s}") for s in range(m)],
        *[_dot(F.col(f"_s{s}"), F.col(f"_s{s}")).alias(f"_pp{s}") for s in range(m)],
    )
    p = psubs.select(
        F.col(probe_id_col),
        *[
            F.array(
                *[
                    F.lit(float(sum(v * v for v in c)))
                    - 2.0 * _dot(F.col(f"_s{s}"), F.array(*[F.lit(v) for v in c]))
                    + F.col(f"_pp{s}")
                    for c in book
                ]
            ).alias(f"t{s}")
            for s, book in enumerate(codebooks)
        ],
    )
    score = F.lit(0.0)
    for s in range(m):
        score = score + F.element_at(
            F.col(f"t{s}"), F.element_at("codes", s + 1) + 1
        )
    w = Window.partitionBy(probe_id_col).orderBy("approx_dist", id_col)
    return (
        enc.join(F.broadcast(p), F.lit(True))
        .select(
            F.col(probe_id_col),
            F.col(id_col),
            F.round(score, 6).alias("approx_dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_multiprobe_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Multiprobe LSH top-k (Lv et al. 2007): each query probes its own
    bucket AND the ``num_planes`` buckets at Hamming distance 1 (one
    hyperplane sign flipped) — the standard recall fix for hyperplane LSH:
    near neighbors that land just across one cutting plane are recovered
    without adding tables. Candidate volume grows (planes+1)x, still
    ~(planes+1)/2^planes of a scan; the probe side stays broadcast (it's
    exploded BEFORE the join, so the big embedding side never duplicates).
    """
    e = embeddings.withColumn(
        "_bucket", lsh_bucket(F.col(vec_col), dim, num_planes)
    )
    base = probes.withColumn("_b0", lsh_bucket(F.col(probe_vec_col), dim, num_planes))
    flips = F.array(
        F.lit(0), *[F.lit(1 << i) for i in range(num_planes)]
    )
    p = base.select(
        "*", F.explode(flips).alias("_flip")
    ).withColumn(
        "_bucket", F.col("_b0").bitwiseXOR(F.col("_flip"))
    )
    j = e.join(F.broadcast(p), "_bucket")
    sim = cosine(F.col(vec_col), F.col(probe_vec_col))
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        j.select(F.col(probe_id_col), F.col(id_col), sim.alias("cosine"))
        .distinct()  # a candidate can match through several probed buckets
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )

"""Distributed connected components → dedup clusters.

The step after candidate-pair generation (MinHash-LSH / SimHash /
embedding near-dups): near-duplicate pairs form a graph; each connected
component is one duplicate cluster and the pipeline keeps one
representative per cluster. At 100 TB the pair graph itself is large and
has long chains (boilerplate families), so naive label propagation
(one round per graph-diameter hop) is not viable.

Algorithm: alternating **large-star / small-star** (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC'14). Converges in O(log² n) rounds regardless of diameter;
every round is two shuffles (a groupBy for the per-node min and a join to
re-emit edges), all Catalyst built-ins — no Python in the loop body.

Node ids are compared with Spark's natural ordering (lexicographic for
string doc_ids) — the component id is the minimum member id, so results
are deterministic and engine-independent (the DuckDB oracle replays the
reachability with a recursive CTE over the same edge list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(e: DataFrame) -> DataFrame:
    return e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbour to
    min(Γ(u) ∪ {u}). Shrinks tall trees toward the minimum."""
    sym = _symmetric(e)
    m = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient every edge from the larger endpoint; for each node u connect
    all smaller neighbours (and u itself) to the minimum neighbour."""
    d = (
        e.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    m = d.groupBy("a").agg(F.min("b").alias("m"))
    out = (
        d.join(m, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .unionByName(m.select("a", F.col("m").alias("b")))
    )
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`, where
    `component` is the smallest node id in its connected component.

    Each round localCheckpoints the shrinking edge list (truncates lineage
    — without it the plan doubles per round and Catalyst analysis becomes
    the bottleneck long before the data does; at cluster scale point
    `spark.sparkContext.setCheckpointDir` at durable storage and swap in
    `.checkpoint()` for executor-loss tolerance). Convergence is detected
    by an order-independent (count, sum-of-hash) signature of the edge
    set — one extra aggregate per round, no second pass.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b")).alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # at the fixpoint the edge list is a star forest: (member → root) for
    # every non-root member; roots map to themselves via the left join
    stars = e.select(F.col("a").alias("node"), F.col("b").alias("_root"))
    return (
        nodes.join(stars, "node", "left")
        .select(
            F.col("node"),
            F.coalesce(F.col("_root"), F.col("node")).alias("component"),
        )
    )


def cluster_sizes(components: DataFrame) -> DataFrame:
    """(component, n_members) per duplicate cluster."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members")
    )


def dedup_by_clusters_best(
    docs: DataFrame,
    edges: DataFrame,
    score,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Quality-aware cluster dedup: keep the HIGHEST-``score`` member of
    every duplicate cluster (ties → lowest id), pass unclustered docs
    through — the production form, where you keep the cleanest copy
    rather than an arbitrary one. ``score`` is a Column over ``docs``.

    Shape: two map-side-combinable aggregates on the same component
    key (max score, then min id among max-scored members — the second
    shuffle reuses the first's partitioning) + one left_anti on the
    loser ids; scales exactly like ``dedup_by_clusters``. Works for
    numeric AND string ids (a negated-id struct trick would NULL out
    string ids under non-ANSI casts and silently disable the dedup).
    """
    comps = connected_components(edges, src=src, dst=dst)
    scored = docs.select(F.col(id_col).alias("_id"), score.alias("_s"))
    members = comps.join(scored, comps.node == scored._id).select(
        "component", F.col("node"), "_s"
    )
    best = members.groupBy("component").agg(F.max("_s").alias("_best"))
    winners = (
        members.join(best, "component")
        .filter(F.col("_s").eqNullSafe(F.col("_best")))
        .groupBy("component")
        .agg(F.min("node").alias("_win"))
        .select("_win")
    )
    losers = members.join(
        winners, members.node == winners._win, "left_anti"
    ).select(F.col("node").alias(id_col))
    return docs.join(losers, id_col, "left_anti")


def dedup_by_clusters(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Keep one representative (the minimum id) per duplicate cluster;
    documents in no cluster pass through. One broadcast-size anti-join at
    sandbox scale; at 100 TB the non-representative set is large, so this
    is a shuffled left_anti on the id — still a single shuffle."""
    comps = connected_components(edges, src=src, dst=dst)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")

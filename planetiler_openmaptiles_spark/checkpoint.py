"""Per-stage checkpointing with lineage + row-count metrics (resume support).

The north rule requires each stage to checkpoint per-partition with lineage
and row counts so a killed job resumes mid-zoom without recomputation. In a
full deployment these are Iceberg tables (`df.writeTo(...)` + snapshot ids);
the sandbox has no Iceberg runtime jar, so this module emulates the same
contract over parquet directories with a JSON manifest per stage
(SURVEY.md §7 fallback note — same API, flagged in metrics).

Contract:
  cp = CheckpointManager(root)
  df = cp.stage("rendered_features", fingerprint, lambda: build_df(), spark)
    - if a manifest exists for (name, fingerprint): read the parquet back
      (skip recompute) — resume path.
    - else: compute, write parquet + manifest {name, fingerprint, rows,
      wall_s, partitions, lineage: [upstream stage names], written_at}.

`fingerprint` should capture the stage's inputs (e.g. input snapshot id /
corpus directory + config hash) so stale checkpoints never resurrect.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def _parquet_row_count(data_dir: str) -> int:
    """Row count from parquet footers (driver-side metadata read) — the
    manifest count must not cost a full table re-scan per stage. The Iceberg
    deployment gets this from snapshot summary metrics for free."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, names in os.walk(data_dir):
        for name in names:
            if name.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, name)).metadata.num_rows
    return total


class CheckpointManager:
    def __init__(self, root: str, enabled: bool = True):
        self.root = root
        self.enabled = enabled and bool(root)
        if self.enabled:
            os.makedirs(root, exist_ok=True)

    def _paths(self, name: str):
        d = os.path.join(self.root, name)
        return d, os.path.join(d, "_MANIFEST.json")

    def manifest(self, name: str) -> dict | None:
        _, mf = self._paths(name)
        if os.path.exists(mf):
            with open(mf) as f:
                return json.load(f)
        return None

    def has(self, name: str, fingerprint: str) -> bool:
        """True if a stage checkpoint exists for this fingerprint (the
        resume path for `stage` would read it back without building)."""
        if not self.enabled:
            return False
        m = self.manifest(name)
        return m is not None and m.get("fingerprint") == fingerprint

    def stage(
        self,
        name: str,
        fingerprint: str,
        build,
        spark: SparkSession,
        lineage: list[str] | None = None,
        partition_by: list[str] | None = None,
        out_partitions: int | None = None,
    ) -> DataFrame:
        if not self.enabled:
            return build()
        d, mf = self._paths(name)
        m = self.manifest(name)
        if m is not None and m.get("fingerprint") == fingerprint:
            return spark.read.parquet(os.path.join(d, "data"))
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        t0 = time.time()
        df = build()
        # keep file-level parallelism for the next stage: a small checkpoint
        # written as 1-4 files would collapse downstream mapInPandas to
        # 1-4 tasks regardless of cluster size. Only repartition when the
        # plan is actually narrow — a full exchange of an already-wide
        # stage (the render output) doubles its bytes through memory for
        # nothing, and parquet splits restore read parallelism anyway.
        # `out_partitions` overrides for known-small stages: a task that
        # reads a 100 KB file still pays the full mapInPandas runner setup,
        # so 16 layers x 32 tiny files = ~500 render tasks of pure fixed
        # cost (the classic small-file problem, measured at ~0.3 s/task).
        if not partition_by:
            if out_partitions:
                # ALWAYS exchange: a same-count plan can still be skewed
                # (layer outputs inherit corpus-split skew — the megacity
                # documents land in one split, so "8 partitions" can mean
                # one fat file and seven slivers; round-robin rebalances)
                df = df.repartition(out_partitions)
            else:
                target = max(spark.sparkContext.defaultParallelism, 16)
                # Probe the UNEXECUTED physical plan, never df.rdd: under
                # AQE, touching .rdd materializes every shuffle query stage
                # just to count partitions, and the write below then re-runs
                # them — double-executing the whole stage. Shuffle-bearing
                # plans land on spark.sql.shuffle.partitions (>= target
                # here) and are left alone; only narrow scan->map plans —
                # whose parallelism is the leaf split count — get widened.
                # Match SHUFFLE exchanges only ("Exchange hashpartitioning
                # (...)" etc.) — a broadcast-join-only plan prints
                # "BroadcastExchange" yet is still narrow on the probe
                # side, so a bare "Exchange" substring test would leave a
                # one-split scan unwidened (single-task collapse).
                plan = df._jdf.queryExecution().executedPlan().toString()
                shuffling = re.search(
                    r"(?<![A-Za-z])Exchange "
                    r"(hash|range|RoundRobin|SinglePartition)",
                    plan,
                )
                if not shuffling and len(df.inputFiles()) < target:
                    df = df.repartition(target)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        data_dir = os.path.join(d, "data")
        writer.parquet(data_dir)
        out = spark.read.parquet(data_dir)
        rows = _parquet_row_count(data_dir)
        manifest = {
            "name": name,
            "fingerprint": fingerprint,
            "rows": rows,
            "wall_s": round(time.time() - t0, 3),
            # absolute schedule bounds: concurrent stage walls overlap, so
            # scaling analysis needs start/end to reconstruct the critical
            # path rather than summing walls
            "t_start": round(t0, 3),
            "t_end": round(time.time(), 3),
            "partitions": out.rdd.getNumPartitions(),
            "lineage": lineage or [],
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "format": "parquet-manifest (iceberg emulation; no runtime jar in sandbox)",
        }
        with open(mf, "w") as f:
            json.dump(manifest, f, indent=2)
        return out

    def metrics(self) -> list[dict]:
        out = []
        if not self.enabled:
            return out
        for name in sorted(os.listdir(self.root)):
            m = self.manifest(name)
            if m:
                out.append(m)
        return out

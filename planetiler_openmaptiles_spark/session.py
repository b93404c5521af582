"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every setting here is chosen for a
multi-executor cluster reading ~100 TB: AQE on (runtime re-plan + skew-join
splitting), Arrow for all pandas UDF exchange, modest shuffle partition count
for local runs (override via env / cluster conf), broadcast threshold high
enough that the Natural-Earth-style side tables always broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "planetiler-openmaptiles-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(32, int(cpus) if cpus.isdigit() else 32)))
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            # AQE partition coalescing targets shuffle BYTES; our per-tile
            # reduce is Python-CPU-bound on small bytes, and coalescing it to
            # a handful of partitions serializes the merge UDFs. Skew-join
            # splitting stays on.
            "spark.sql.adaptive.coalescePartitions.enabled",
            "false",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # zoom-gated attrs overwrite base attrs via map_concat (explode.py)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # lenient coercion: invalid tag casts → null (imposm3/planetiler
        # getLong/getDouble semantics), element_at out-of-bounds → null
        .config("spark.sql.ansi.enabled", "false")
        # Spark 4 wraps EVERY python DataFrame/Column API call to capture
        # the user call site for error enrichment: one conf.get + origin
        # set + clear = 3 extra py4j round trips plus a Python stack walk
        # PER CALL. The 16-layer plan build makes ~100k such calls; with
        # capture on, driver-side plan construction is the build's
        # critical path. Errors still carry the JVM-side context.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    # cluster-submit passthrough: lets the pipeline CLI run unchanged
    # against a standalone master (tools/cluster_bench.py) — executor
    # sizing, py-files zip, executor env — without new CLI flags
    env_json = os.environ.get("SPARK_EXTRA_CONF_JSON")
    if env_json:
        import json

        for k, v in json.loads(env_json).items():
            b = b.config(k, str(v))
    evdir = os.environ.get("SPARK_EVENTLOG_DIR")
    if evdir:
        os.makedirs(evdir, exist_ok=True)
        b = (
            b.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", f"file://{evdir}")
            .config("spark.eventLog.compress", "false")
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

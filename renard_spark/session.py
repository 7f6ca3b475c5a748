"""SparkSession builder for the engine.

Local-mode friendly but configured the way a multi-executor cluster run
would be: AQE on (runtime join re-planning + skew-join splitting), Arrow
on (every pandas UDF crossing is Arrow-batched), shuffle partitions
sized to the parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "renard_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cpus defaults to $SPARK_GRAFT_CPUS or 32 (the sandbox); on a real
    cluster the master/em resource configs come from spark-submit and the
    ``local[n]`` master here is ignored.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # at least one shuffle partition per core; more would help skew
        # but local mode pays per-task overhead.
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~10k rows per Arrow batch keeps per-doc UDF memory bounded even
        # for long documents; the UDFs micro-batch internally anyway.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("RENARD_SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let the planner pick shuffled-hash join when its size
        # conditions hold (guide: often faster than sort-merge when one
        # side is moderately small per partition; AQE still rewrites /
        # splits skew at runtime). Measured -0.5s on the co-occurrence
        # edge pipeline at sf0.1; on a cluster the same flag is the
        # standard starting config (sort-merge remains the fallback
        # whenever the hash-side size conditions are not met).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # allow joins to reuse an existing partitioning on a SUBSET of
        # the join keys (the pre-3.3 behavior): the per-document
        # pipelines establish hash(doc_id) once and every downstream
        # block/self join is keyed (doc_id, ...), so with the default
        # 'true' each of those joins pays a fresh full-key exchange of
        # both sides. doc_id is unique per row — the subset key is as
        # fine-grained as the data, so this trades no skew for the
        # removed shuffles (and AQE skew-join still splits outliers).
        # Measured 2.3s -> 1.6s on the co-occurrence edge pipeline.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

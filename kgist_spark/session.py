"""SparkSession factory with the engine's tuned defaults.

Tuned for the target workload (wide aggregations over skewed KG/webtext
tables): AQE with skew-join splitting, Arrow everywhere, and a shuffle
partition count sized to the local core budget (overridden on a real cluster
via spark-submit conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "kgist_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # keep AQE, but NOT its empty-relation propagation: the rewrite
        # deletes CollectMetrics nodes when a downstream stage turns out
        # empty, so Observation.get throws and every capped path's drop
        # accounting is lost EXACTLY in the all-candidates-dropped case
        # (e.g. every LSH bucket hot) — breaking the engine's no-silent-caps
        # contract.  Empty propagation only ever optimizes already-empty
        # (already cheap) plans, so excluding it costs nothing measurable.
        .config(
            "spark.sql.adaptive.optimizer.excludedRules",
            "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # JDK17 defaults to G1, which is pathological for this workload's
        # allocation pattern (wide hash aggregations over short-lived string
        # rows): measured 6-80 s swings on an identical query at local[32].
        # The throughput collector holds the same query at a stable ~6 s.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` single-JVM; the same config keys are the ones
you'd tune on a 1000-executor cluster (shuffle partitions sized to the data,
AQE on for runtime re-planning, skew-join handling, broadcast threshold).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyspark_graph_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # SPARK_GRAFT_SHUFFLE widens the shuffle fan-out beyond the core
        # count for datasets whose per-partition working set would
        # otherwise exceed the executor heap (the real-sf1 runs)
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", str(cpus))
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()

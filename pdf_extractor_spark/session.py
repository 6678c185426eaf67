"""SparkSession factory tuned for the extraction workload.

Scale posture (designed for a 1000-executor cluster over ~100 TB, tested on
local[32]):

- AQE on, with skew-join splitting and partition coalescing — at 100 TB the
  static shuffle-partition count is always wrong for some stage; AQE re-plans
  from runtime statistics.
- Arrow on, with a bounded ``maxRecordsPerBatch`` so one huge HTML page batch
  cannot blow Python-worker memory (the analog of the reference's notes batch
  size of 5, reference main.py:300).
- ``spark.sql.files.maxPartitionBytes`` kept at 128m so a 100 TB scan yields
  ~800k input splits — each a bounded unit of work for task retry.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size: pages average ~10-100 KiB; 512 rows/batch keeps each
# Python-worker batch well under ~100 MiB even for pathological pages.
ARROW_MAX_RECORDS_PER_BATCH = 512


def build_session(
    app_name: str = "pdf_extractor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit supply it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match core count; on a cluster AQE coalesces anyway.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "200"
        shuffle_partitions = 200 if n == "*" else max(int(n), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-planning, skew-join splitting, partition coalescing.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # Arrow for pandas UDFs — the only JVM<->Python boundary in the engine.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # 128m input splits: bounded task units at any corpus size.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Quieter local runs; harmless on a cluster.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""SparkSession factory with the engine's tuned configuration.

The conf encodes the north_rule requirements (AQE-tuned shuffle, skew join
handling) plus Arrow-batch sizing for fat HTML rows (SURVEY.md section 4.2):
html bodies are KB-MB, so the default 10k-record Arrow batches would balloon
Python-worker memory; 512 rows per batch keeps a batch in the tens of MB at
Common-Crawl page sizes while still amortizing the Arrow transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF = {
    # AQE: runtime shuffle re-planning, partition coalescing, skew-join split
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    # Arrow exchange for pandas UDFs / mapInPandas (the only JVM<->Python copy)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
    # fat binary rows: keep scan partitions moderate
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.shuffle.partitions": "32",
    # deterministic timestamps across engines
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(app_name="readability-spark", master=None, conf=None, shuffle_partitions=None):
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    merged = dict(ENGINE_CONF)
    if shuffle_partitions is not None:
        merged["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if conf:
        merged.update(conf)
    for key, value in merged.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

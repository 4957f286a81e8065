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
    # keep Python workers alive across tasks: without this every task forks a
    # fresh worker and pays the pandas/pyarrow import (~0.6-2s per task —
    # measured 25s -> 2.6s for a 64-task mapInPandas stage on local[8])
    "spark.python.worker.reuse": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
    # fat binary rows: keep scan partitions moderate
    "spark.sql.files.maxPartitionBytes": "128m",
    # fat rows also blow up the vectorized parquet reader: the default
    # 4096-row column batch at ~25-100 KB/row is 100 MB-400 MB PER TASK
    # (observed heap OOM at 32 concurrent scan tasks); 512 rows keeps a
    # batch in the tens of MB and matches the Arrow exchange batch size
    "spark.sql.parquet.columnarReaderBatchSize": "512",
    "spark.sql.shuffle.partitions": "32",
    # deterministic timestamps across engines
    "spark.sql.session.timeZone": "UTC",
    # ParallelGC, not the G1 default: Arrow batches for fat rows are
    # multi-MB short-lived buffers — humongous allocations under G1, which
    # collapse throughput (measured 82s -> 56s on the 200k-page extraction
    # job at local[32], and catastrophically worse at large heaps).
    # NOTE: takes effect only when the driver JVM starts AFTER this conf is
    # set (plain-python sessions); spark-submit callers must pass it as
    # --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    # lineage metrics ride an accumulator off the extraction pass; a
    # speculative duplicate task would double-count its partition's
    # docs/ok/failed/cpu_ms, so speculation stays off for extraction jobs
    # (lineage *correctness* — which partitions committed — never depends on
    # accumulator values, but the reported counts should be exact)
    "spark.speculation": "false",
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

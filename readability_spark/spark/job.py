"""The Spark execution layer: vectorized extraction, explicit partitioning,
domain-skew salting, per-partition lineage/metrics, resumable runs.

Design (SURVEY.md sections 3.4 / 2.5):

- dataset level is pure declarative DataFrame API (Catalyst optimizes scans,
  filters push down, AQE re-plans shuffles);
- the per-document 16-stage DOM pipeline runs inside ONE ``mapInPandas``
  invocation per row batch (Arrow exchange is the only JVM<->Python copy;
  no stage-per-UDF chaining, no driver-side loops over rows);
- partition attribution is logical: ``partition_id = pmod(xxhash64(url), N)``
  — stable across cluster sizes, so lineage written at N executors resumes
  correctly at 4N;
- skew salting is hash-based (deterministic), never ``rand()``:
  ``salt = pmod(xxhash64(url), salt_n)`` spreads a hot domain over salt_n
  reducers while keeping the logical partition key intact.

At 100 TB the same plan holds: the parquet/Iceberg scan prunes on the
partition transform, the repartition is the only shuffle, and the write is
an idempotent append keyed by (run_id, partition_id).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..options import DEFAULT_OPTIONS
from ..pipeline import extract_row
from .sources import append_ref, read_ref

ARTICLE_FIELDS = [
    StructField("byline", StringType(), True),
    StructField("content", StringType(), True),
    StructField("dir", StringType(), True),
    StructField("excerpt", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("length", LongType(), True),
    StructField("published_time", StringType(), True),
    StructField("site_name", StringType(), True),
    StructField("text_content", StringType(), True),
    StructField("title", StringType(), True),
]

STATUS_FIELDS = [
    StructField("status", StringType(), False),
    StructField("error", StringType(), True),
    StructField("extract_ms", DoubleType(), True),
]

LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("docs", LongType(), False),
        StructField("ok", LongType(), False),
        StructField("failed", LongType(), False),
        StructField("started_at", TimestampType(), False),
        StructField("finished_at", TimestampType(), False),
        StructField("docs_per_sec", DoubleType(), True),
    ]
)

_ARTICLE_COL_NAMES = [f.name for f in ARTICLE_FIELDS]

_RESERVED = set(_ARTICLE_COL_NAMES) | {
    "status",
    "error",
    "extract_ms",
}


def _passthrough_fields(input_schema, html_col, keep_html):
    """Input columns carried through unchanged; names colliding with Article
    output columns (e.g. the crawl's ``lang`` hint vs the extracted lang)
    are dropped — the extracted value wins."""
    return [
        f
        for f in input_schema.fields
        if (keep_html or f.name != html_col) and f.name not in _RESERVED
    ]


def _output_schema(input_schema, html_col, keep_html):
    passthrough = _passthrough_fields(input_schema, html_col, keep_html)
    return StructType(passthrough + ARTICLE_FIELDS + STATUS_FIELDS)


def extract_articles(
    df: DataFrame, options=None, html_col="html", keep_html=False, base_url_col=None
) -> DataFrame:
    """Add the Article columns to a pages DataFrame.

    Library surface mirroring Readability::parse at dataset scale
    (/root/reference/src/readability.rs:38-63): one vectorized
    ``mapInPandas`` pass; per-row failures become status/error columns,
    never exceptions (a failed document must not kill the Arrow batch).

    ``base_url_col`` (e.g. ``"url"``) supplies each row's document URI to
    the opt-in fixRelativeUris pass (Options(fix_relative_uris=True)).
    """
    options = options or DEFAULT_OPTIONS
    out_schema = _output_schema(df.schema, html_col, keep_html)
    pass_cols = [f.name for f in _passthrough_fields(df.schema, html_col, keep_html)]
    out_cols = [f.name for f in out_schema.fields]

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {name: [] for name in _ARTICLE_COL_NAMES}
            statuses, errors, timings = [], [], []
            bases = pdf[base_url_col] if base_url_col is not None else None
            for idx, raw in enumerate(pdf[html_col]):
                t0 = time.perf_counter()
                article, status, error = extract_row(
                    raw,
                    options=options,
                    base_url=None if bases is None else bases.iloc[idx],
                )
                timings.append((time.perf_counter() - t0) * 1000.0)
                statuses.append(status)
                errors.append(error)
                if article is None:
                    for name in _ARTICLE_COL_NAMES:
                        rows[name].append(None)
                else:
                    for name in _ARTICLE_COL_NAMES:
                        rows[name].append(getattr(article, name))
            out = pdf[pass_cols].copy() if pass_cols else pd.DataFrame(index=pdf.index)
            for name in _ARTICLE_COL_NAMES:
                out[name] = rows[name]
            out["length"] = pd.array(rows["length"], dtype="Int64")
            out["status"] = statuses
            out["error"] = errors
            out["extract_ms"] = timings
            yield out[out_cols]

    return df.mapInPandas(run_batches, schema=out_schema)


READERABLE_SCHEMA_FIELDS = [
    StructField("readerable", BooleanType(), True),
    StructField("readerable_score", DoubleType(), True),
]


def readerable_flags(df: DataFrame, html_col="html", url_col="url") -> DataFrame:
    """mozilla isProbablyReaderable over a pages DataFrame: (url, readerable,
    readerable_score) per page, vectorized mapInPandas (no per-row Python at
    the Spark API level).  Semantics: readability_spark/readerable.py; the
    score is the early-exit accumulated value, rounded to 4 for portability.
    """
    from readability_spark.readerable import is_probably_readerable

    out_schema = StructType(
        [df.schema[url_col]] + READERABLE_SCHEMA_FIELDS
    )

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flags, scores = [], []
            for raw in pdf[html_col]:
                try:
                    ok, score = is_probably_readerable(raw)
                except Exception:  # undecodable html: not readerable
                    ok, score = None, None
                flags.append(ok)
                scores.append(None if score is None else round(score, 4))
            yield pd.DataFrame(
                {
                    url_col: pdf[url_col],
                    "readerable": pd.array(flags, dtype="boolean"),
                    "readerable_score": pd.array(scores, dtype="Float64"),
                }
            )

    return df.select(url_col, html_col).mapInPandas(run_batches, schema=out_schema)


def with_partition_id(df: DataFrame, num_partitions: int, url_col="url") -> DataFrame:
    """Logical partition key: stable hash of url (north_rule: explicit hash
    partitioning on url)."""
    return df.withColumn(
        "partition_id",
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_partitions)).cast("int"),
    )


def with_salt(df: DataFrame, salt_n: int, url_col="url") -> DataFrame:
    """Deterministic skew salt: a second, finer url hash.  Combined with the
    partition id in repartition(), it spreads a hot domain's rows across
    salt_n reducers (AQE cannot fix skew inside mapInPandas inputs, so this
    is explicit — SURVEY.md section 4.2)."""
    return df.withColumn(
        "salt",
        F.pmod(F.xxhash64(F.col(url_col), F.lit(1)), F.lit(salt_n)).cast("int"),
    )


@dataclass
class JobReport:
    run_id: str
    partitions_total: int
    partitions_done_previously: int
    partitions_processed: int
    docs: int
    ok: int
    failed: int
    wall_secs: float
    docs_per_sec: float


def _read_lineage(spark, lineage_path):
    try:
        return read_ref(spark, lineage_path)
    except Exception:
        return None


def completed_partitions(spark, lineage_path, run_id):
    lineage = _read_lineage(spark, lineage_path)
    if lineage is None:
        return set()
    rows = (
        lineage.filter((F.col("run_id") == run_id) & (F.col("status") == "ok"))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r.partition_id for r in rows}


def run_job(
    spark,
    pages_df: DataFrame,
    output_path: str,
    lineage_path: str,
    run_id: str,
    num_partitions: int = 64,
    salt_n: int = 8,
    commit_groups: int = 4,
    options=None,
) -> JobReport:
    """Resumable extraction job with per-partition lineage.

    The logical partition space [0, num_partitions) is split into
    ``commit_groups`` commit units; each unit is extracted, appended to the
    output (parquet partitioned by partition_id), and recorded in the
    lineage table before the next unit starts.  A re-run with the same
    run_id anti-joins the lineage table and processes only missing
    partitions — resume without recompute (north_rule).  On an Iceberg
    catalog each commit unit is one transactional append; the parquet
    layout here is the sandbox stand-in.
    """
    t_start = time.time()
    trace = os.environ.get("READABILITY_JOB_TRACE") == "1"

    def _t(label, t0):
        if trace:
            print(f"JOB_TRACE {label}={time.time() - t0:.1f}s", flush=True)

    pages = with_partition_id(pages_df, num_partitions)

    t0 = time.time()
    done = completed_partitions(spark, lineage_path, run_id)
    _t("lineage_check", t0)
    todo = [p for p in range(num_partitions) if p not in done]

    groups = [
        todo[i::commit_groups] for i in range(commit_groups)
    ]
    groups = [g for g in groups if g]

    total_docs = total_ok = total_failed = 0
    processed = 0

    for group in groups:
        t0 = time.time()
        started_at = pd.Timestamp.utcnow().tz_localize(None)
        subset = pages.filter(F.col("partition_id").isin(group))
        subset = with_salt(subset, salt_n)
        # physical partitioning: one shuffle, keyed by (logical partition,
        # salt) so hot domains spread while attribution stays logical
        subset = subset.repartition(len(group) * salt_n, "partition_id", "salt")
        extracted = extract_articles(
            subset.drop("salt"),
            options=options,
            # fixRelativeUris resolves against each row's own url
            base_url_col="url" if options is not None and options.fix_relative_uris else None,
        )
        append_ref(extracted, output_path, ("partition_id",))
        _t("extract_write", t0)
        finished_at = pd.Timestamp.utcnow().tz_localize(None)
        t0 = time.time()

        # cheap readback of just-written partitions for metrics (column-pruned
        # scan: status + extract_ms only)
        written = read_ref(spark, output_path).filter(
            F.col("partition_id").isin(group)
        )
        stats = (
            written.groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
                F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("failed"),
                (F.sum("extract_ms") / 1000.0).alias("cpu_secs"),
            )
            .collect()
        )
        by_pid = {r.partition_id: r for r in stats}
        lineage_rows = []
        for pid in group:
            r = by_pid.get(pid)
            docs = r.docs if r else 0
            ok = r.ok if r else 0
            failed = r.failed if r else 0
            cpu = (r.cpu_secs if r else 0.0) or 0.0
            lineage_rows.append(
                (
                    run_id,
                    pid,
                    "ok",
                    docs,
                    ok,
                    failed,
                    started_at.to_pydatetime(),
                    finished_at.to_pydatetime(),
                    (docs / cpu) if cpu > 0 else None,
                )
            )
            total_docs += docs
            total_ok += ok
            total_failed += failed
            processed += 1
        _t("readback_stats", t0)
        t0 = time.time()
        append_ref(spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA), lineage_path)
        _t("lineage_write", t0)

    wall = time.time() - t_start
    return JobReport(
        run_id=run_id,
        partitions_total=num_partitions,
        partitions_done_previously=len(done),
        partitions_processed=processed,
        docs=total_docs,
        ok=total_ok,
        failed=total_failed,
        wall_secs=wall,
        docs_per_sec=(total_docs / wall) if wall > 0 else 0.0,
    )

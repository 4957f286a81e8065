"""Invariant tests for host-level reputation filtering
(`host_reputation_filter`): the DuckDB oracle gate pins exact values;
these pin the semantics — planted-boilerplate hosts are rejected on the
dup lane, every surviving document's host satisfies both thresholds, and
the join-back carries no forced broadcast hint (the host dimension is
data-dependent, so the hint discipline matters at 10^12 docs)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from readability_spark.spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    spark = get_spark(
        app_name="host-reputation-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def kept(spark):
    return entry.host_reputation_filter(spark, SF_DIR).collect()


def test_planted_boilerplate_hosts_rejected(kept):
    """Five-char hosts carry the planted host-level boilerplate (one
    shared string per host at doc_id % 3 == 0), so their within-host dup
    rate exceeds the 0.10 cap — none may survive."""
    assert kept, "fixture must keep at least one host"
    assert all(len(r.host) != 5 for r in kept)


def test_kept_hosts_satisfy_both_thresholds(kept):
    for r in kept:
        assert float(r.avg_words) >= 52.0 - 1e-4  # rounded to 4 dp on output
        assert float(r.dup_rate) <= 0.10 + 1e-4


def test_verdict_is_host_atomic(spark, kept):
    """A host either keeps ALL its (non-empty) documents or none — the
    point of host-level curation vs per-doc filtering."""
    docs = entry._docs(spark, SF_DIR).filter(F.trim(F.col("text")) != "")
    host = F.when(F.col("doc_id") % 10 < 4, F.lit("hot")).otherwise(F.col("source"))
    totals = {
        r.host: r.n
        for r in docs.select(host.alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_host: dict[str, int] = {}
    for r in kept:
        by_host[r.host] = by_host.get(r.host, 0) + 1
        assert int(r.host_docs) == totals[r.host]
    for h, n in by_host.items():
        assert n == totals[h], f"host {h} kept partially: {n}/{totals[h]}"


def test_join_back_is_unhinted():
    """Source-level: the verdict join must not carry F.broadcast() — the
    reputable-host frame's size is a data-dependent fraction of the host
    dimension (itself corpus-scaled), so the decision belongs to AQE.
    (tools/check_plans.py's broadcast audit enforces this repo-wide; this
    pins the specific function.)"""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(entry.host_reputation_filter)))
    calls = [
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr == "broadcast"
    ]
    assert not calls

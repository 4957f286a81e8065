"""Invariant tests for the LSH evaluation harness (`lsh_recall_report`):
the DuckDB oracle pins exact values; these pin internal consistency — the
verified count must equal `minhash_lsh_pairs`' own output (same sample,
same 16/4x4 parameters, same 0.5 threshold), and the ratios must be the
exact rationals of the counts."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from readability_spark.spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    spark = get_spark(
        app_name="lsh-recall-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def report(spark):
    rows = entry.lsh_recall_report(spark, SF_DIR).collect()
    assert len(rows) == 1
    return rows[0]


def test_counts_are_consistent(report):
    assert 0 <= report.n_verified <= report.n_true_pairs
    assert report.n_verified <= report.n_candidates
    assert report.n_true_pairs > 0, "fixture must contain true near-dup pairs"


def test_verified_equals_lsh_pipeline_output(spark, report):
    """truth ∩ candidates IS what the verify stage of minhash_lsh_pairs
    keeps, so the harness's verified count must equal the pipeline's row
    count on the same sample/parameters/threshold."""
    assert report.n_verified == entry.minhash_lsh_pairs(spark, SF_DIR).count()


def test_ratios_are_the_exact_rationals(report):
    assert report.recall == round(report.n_verified / report.n_true_pairs, 4)
    assert report.banding_precision == round(
        report.n_verified / report.n_candidates, 4
    )
    # banding misses exist at the 0.5 operating point (the S-curve is not
    # a step function) — the report must be able to show recall < 1, and
    # the fixture is built to exercise that
    assert report.recall < 1.0

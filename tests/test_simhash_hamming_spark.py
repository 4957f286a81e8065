"""Invariant tests for SimHash Hamming near-dup pairs
(`simhash_hamming_pairs`): the Manku block-permutation pigeonhole makes
recall EXACT, so the operator's output must equal a brute-force all-pairs
Hamming sweep over the same fingerprints — not approximately, exactly."""

from __future__ import annotations

import sys
from itertools import combinations
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from readability_spark.spark import textops  # noqa: E402
from readability_spark.spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
MAX_HAMMING = 3


@pytest.fixture(scope="module")
def spark():
    spark = get_spark(
        app_name="simhash-hamming-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


def test_exact_recall_vs_brute_force(spark):
    docs = entry._docs(spark, SF_DIR).filter(F.col("doc_id") < 300)
    fps = {
        int(r.doc_id): r.simhash for r in textops.simhash(docs, bits=32).collect()
    }
    brute = {
        (a, b, sum(x != y for x, y in zip(fps[a], fps[b])))
        for a, b in combinations(sorted(fps), 2)
        if sum(x != y for x, y in zip(fps[a], fps[b])) <= MAX_HAMMING
    }
    got = {
        (int(r.doc_a), int(r.doc_b), int(r.hamming))
        for r in entry.simhash_hamming_pairs(spark, SF_DIR).collect()
    }
    assert brute, "fixture must contain Hamming-close pairs"
    assert got == brute


def test_pairs_ordered_and_bounded(spark):
    rows = entry.simhash_hamming_pairs(spark, SF_DIR).collect()
    for r in rows:
        assert int(r.doc_a) < int(r.doc_b)
        assert 0 <= int(r.hamming) <= MAX_HAMMING

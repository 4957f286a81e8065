"""Invariant tests for the interpolated bigram-LM perplexity filter
(`bigram_perplexity_filter`): a pure-Python replay of the whole model
(bigram/context/unigram counts, Jelinek-Mercer interpolation, per-doc
mean NLL) pins the scores to 4 dp, plus structural invariants."""

from __future__ import annotations

import math
import sys
from collections import Counter
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from readability_spark.spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
LAM = entry._BIGRAM_LAMBDA
THR = entry._BIGRAM_PPL_THRESHOLD


@pytest.fixture(scope="module")
def spark():
    spark = get_spark(
        app_name="bigram-ppl-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def texts(spark):
    return {
        int(r.doc_id): r.text.strip().split(" ")
        for r in entry._docs(spark, SF_DIR).collect()
        if r.text and r.text.strip()
    }


def _replay(texts):
    uni: Counter = Counter()
    big: Counter = Counter()
    ctx: Counter = Counter()
    for arr in texts.values():
        uni.update(arr)
        for a, b in zip(arr, arr[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    total = sum(uni.values())
    out = {}
    for doc_id, arr in texts.items():
        if len(arr) < 2:
            continue
        nll = 0.0
        for a, b in zip(arr, arr[1:]):
            p = LAM * big[(a, b)] / ctx[a] + (1 - LAM) * uni[b] / total
            nll -= math.log(p)
        out[doc_id] = (len(arr) - 1, round(nll / (len(arr) - 1), 4))
    return out


def test_matches_python_replay(spark, texts):
    got = {
        int(r.doc_id): (int(r.n_bigrams), float(r.nll), bool(r.keep))
        for r in entry.bigram_perplexity_filter(spark, SF_DIR).collect()
    }
    want = _replay(texts)
    assert set(got) == set(want)
    for doc_id, (n, nll) in want.items():
        gn, gnll, gkeep = got[doc_id]
        assert gn == n
        assert abs(gnll - nll) <= 1e-4, f"doc {doc_id}: {gnll} vs {nll}"
        assert gkeep == (gnll <= THR)


def test_keep_verdict_splits(spark):
    rows = entry.bigram_perplexity_filter(spark, SF_DIR).collect()
    kept = sum(bool(r.keep) for r in rows)
    assert 0 < kept < len(rows), "threshold must genuinely split the fixture"

"""Property-based check of the shared Manku block-permutation machinery
(textops.hamming_block_pairs): against randomized fingerprint sets, the
block-join must find EXACTLY the brute-force pair set within the Hamming
bound — completeness is the pigeonhole theorem (block_count blocks catch
every pair at distance <= block_count - 1), soundness is the bitwise
verify.  One shared local Spark session; hypothesis drives the inputs,
Spark executes the operator under test."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from readability_spark.spark import textops  # noqa: E402
from readability_spark.spark.session import get_spark  # noqa: E402

BITS = 16
BLOCKS = 4
MAX_H = 3  # pigeonhole-complete bound for 4 blocks


@pytest.fixture(scope="module")
def spark():
    spark = get_spark(
        app_name="hamming-prop", master="local[4]", shuffle_partitions=4
    )
    yield spark
    spark.stop()


_fps = st.lists(
    st.integers(min_value=0, max_value=(1 << BITS) - 1).map(
        lambda v: format(v, f"0{BITS}b")
    ),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fps=_fps)
def test_block_pairs_equal_brute_force(spark, fps):
    rows = [(i, fp) for i, fp in enumerate(fps)]
    df = spark.createDataFrame(rows, "doc_id long, fp string")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in textops.hamming_block_pairs(
            df, bits=BITS, block_count=BLOCKS, max_hamming=MAX_H
        ).collect()
    }
    want = {}
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = sum(a != b for a, b in zip(fps[i], fps[j]))
            if h <= MAX_H:
                want[(i, j)] = h
    assert got == want

"""Degenerate-input robustness: every batch query in the driver contract
must run (not crash) against a ZERO-ROW corpus with the production schema.

A 10^12-document pipeline hits empty inputs constantly — the first run of
an incremental job, a source that produced nothing this snapshot, a
partition pruned to nothing — and an AnalysisException there pages
someone at 3am.  Queries may return empty results or NULL-scored rows;
they may not raise.  (Streaming queries drive their own synthesized
sources and are exercised in test_textops_streaming.py.)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from readability_spark.spark.session import get_spark  # noqa: E402

SRC_SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="empty-corpus-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{SRC_SF}/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_every_batch_query_survives_empty_corpus(spark, empty_sf):
    failures = []
    for name, fn in entry.queries().items():
        if name.startswith("stream_"):
            continue
        try:
            fn(spark, empty_sf).collect()
        except Exception as e:  # noqa: BLE001 — we report them all at once
            failures.append(f"{name}: {type(e).__name__}")
    assert not failures, failures

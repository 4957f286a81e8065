"""Invariant tests for IVF codebook training (`ivf_train`): an
engine-independent pure-Python replay of the Lloyd loop (same fixed-point
quantization, same cosine argmax and (cosine desc, cid asc) tie-break,
same keep-old-centroid convention), consumption of the trained codebook
by `ann_ivf_topk` via `codebook_from_training`, k-means invariants
(cluster sizes partition the corpus, within-iteration improvement), and
zero-row-corpus survival.  The DuckDB oracle gate (tools/check_oracles.py)
pins the exact values against an unrolled-CTE replay; these tests pin the
semantics without DuckDB in the loop."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from readability_spark.spark import textops  # noqa: E402
from readability_spark.spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
K = entry._IVF_TRAIN_K
ITERS = entry._IVF_TRAIN_ITERS
FP = textops.IVF_TRAIN_FP


@pytest.fixture(scope="module")
def spark():
    spark = get_spark(
        app_name="ivf-train-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def vectors(spark):
    """(vec_id, [float64]) sorted by id — doubles exactly equal to the
    parquet float32 values, the same promotion both engines apply."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    return sorted((int(r.vec_id), [float(x) for x in r.embedding]) for r in rows)


def _cos(a, b):
    """Left-to-right fold, matching textops._dot's F.aggregate order."""
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _replay(vectors, k=K, iters=ITERS, fp=FP):
    """Pure-Python Lloyd replay: returns ({cid: [sum_fixed]}, {cid: n})
    for the FINAL assignment, plus the per-iteration assignment maps."""
    cents = {cid: list(v) for cid, v in vectors if cid < k}
    assignments = []
    sums, counts = {}, {}
    for _ in range(iters):
        sums = {}
        counts = {}
        assign = {}
        for vid, v in vectors:
            # argmax cosine, tie-break lower cid — struct-max of (cc, -cid)
            best = max(
                ((cid, _cos(v, cv)) for cid, cv in sorted(cents.items())),
                key=lambda t: (t[1], -t[0]),
            )[0]
            assign[vid] = best
            q = [math.floor(x * fp + 0.5) for x in v]
            if best not in sums:
                sums[best] = [0] * len(q)
                counts[best] = 0
            counts[best] += 1
            for i, qi in enumerate(q):
                sums[best][i] += qi
        assignments.append(assign)
        cents = {
            cid: (
                [s / counts[cid] / fp for s in sums[cid]]
                if cid in counts
                else cv  # empty cluster keeps its previous centroid
            )
            for cid, cv in cents.items()
        }
    return sums, counts, assignments


def test_ivf_train_matches_python_replay(spark, vectors):
    got = {
        (int(r.centroid_id), int(r.pos)): (
            int(r.sum_fixed),
            int(r.cluster_size),
            float(r.centroid),
        )
        for r in entry.ivf_train(spark, SF_DIR).collect()
    }
    sums, counts, _ = _replay(vectors)
    want = {
        (cid, pos): (s, counts[cid], round(s / counts[cid] / FP, 6))
        for cid, svec in sums.items()
        for pos, s in enumerate(svec)
    }
    assert set(got) == set(want)
    for key, (s, n, c) in want.items():
        gs, gn, gc = got[key]
        assert (gs, gn) == (s, n), f"{key}: sums/counts diverge"
        assert abs(gc - c) < 1e-9, f"{key}: rounded mean diverges"


def test_ivf_train_cluster_sizes_partition_corpus(spark, vectors):
    rows = entry.ivf_train(spark, SF_DIR).collect()
    dim = len(vectors[0][1])
    sizes = {}
    per_cid_rows = {}
    for r in rows:
        sizes[int(r.centroid_id)] = int(r.cluster_size)
        per_cid_rows[int(r.centroid_id)] = per_cid_rows.get(int(r.centroid_id), 0) + 1
    # every emitted centroid carries a full dim vector and the cluster
    # sizes partition the corpus exactly
    assert all(n == dim for n in per_cid_rows.values())
    assert sum(sizes.values()) == len(vectors)
    assert set(sizes) <= set(range(K))


def test_ivf_train_iterations_move_centroids(spark, vectors):
    """Lloyd sanity: the trained means differ from the init vectors (the
    init rows are single corpus vectors; the means aggregate >1 member),
    and reassignment between iteration 1 and the final iteration actually
    changed some labels — i.e. the loop is not a fixed point after one
    pass on this fixture."""
    _, counts, assignments = _replay(vectors)
    assert any(n > 1 for n in counts.values())
    assert assignments[0] != assignments[-1]


def test_codebook_from_training_feeds_ann_ivf_topk(spark, vectors):
    trained = entry.ivf_train(spark, SF_DIR)
    codebook = textops.codebook_from_training(trained)
    assert sorted(cid for cid, _ in codebook) == sorted(
        {int(r.centroid_id) for r in trained.collect()}
    )
    assert all(len(vec) == len(vectors[0][1]) for _, vec in codebook)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") == 0)
    got = textops.ann_ivf_topk(emb, codebook, query, k=5).collect()
    assert len(got) == 5
    cosines = [float(r.cosine) for r in got]
    assert cosines == sorted(cosines, reverse=True)
    assert all(int(r.vec_id) != 0 for r in got)


def test_ivf_train_survives_empty_corpus(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    empty = spark.createDataFrame([], schema)
    assert textops.ivf_train(empty, k=K, iters=ITERS).collect() == []


def test_cluster_mix_report_consistency(spark, vectors):
    """The mix report must partition the corpus over the final-assignment
    clusters, with within-cluster shares summing to 1 and matching the
    replay's serving assignment (one extra Lloyd update + assign)."""
    rows = entry.cluster_mix_report(spark, SF_DIR).collect()
    assert sum(int(r.n_vecs) for r in rows) == len(vectors)
    by_cluster: dict[int, float] = {}
    for r in rows:
        by_cluster[int(r.centroid_id)] = by_cluster.get(int(r.centroid_id), 0.0) + float(
            r.cluster_share
        )
    for cid, total in by_cluster.items():
        assert abs(total - 1.0) < 5e-4, f"cluster {cid} shares sum to {total}"
    # replay the serving assignment: means from the final stats, then argmax
    sums, counts, _ = _replay(vectors)
    cents = {cid: [s / counts[cid] / FP for s in svec] for cid, svec in sums.items()}
    want: dict[tuple[int, int], int] = {}
    labels = {
        int(r.vec_id): int(r.label)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    for vid, v in vectors:
        best = max(
            ((cid, _cos(v, cv)) for cid, cv in sorted(cents.items())),
            key=lambda t: (t[1], -t[0]),
        )[0]
        want[(best, labels[vid])] = want.get((best, labels[vid]), 0) + 1
    got = {(int(r.centroid_id), int(r.label)): int(r.n_vecs) for r in rows}
    assert got == want


def test_knn_label_propagation_replay(spark, vectors):
    """Pure-Python replay of the kNN vote over the serving assignment:
    same rounded-cosine ranking, same (votes desc, label asc) majority
    tie-break — pins pred_label/votes for every unlabeled vector."""
    sums, counts, _ = _replay(vectors)
    cents = {cid: [s / counts[cid] / FP for s in svec] for cid, svec in sums.items()}
    labels = {
        int(r.vec_id): int(r.label)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    assign = {}
    for vid, v in vectors:
        assign[vid] = max(
            ((cid, _cos(v, cv)) for cid, cv in sorted(cents.items())),
            key=lambda t: (t[1], -t[0]),
        )[0]
    vecs = dict(vectors)
    mod = entry._KNN_LABELED_MOD
    want = {}
    for vid, v in vectors:
        if vid % mod == 0:
            continue
        neigh = sorted(
            (
                (round(_cos(v, vecs[lid]), 4), lid, labels[lid])
                for lid, _ in vectors
                if lid % mod == 0 and assign[lid] == assign[vid] and lid != vid
            ),
            key=lambda t: (-t[0], t[1]),
        )[: entry._KNN_K]
        if not neigh:
            continue
        tallies: dict[int, int] = {}
        for _, _, lab in neigh:
            tallies[lab] = tallies.get(lab, 0) + 1
        pred = min(tallies.items(), key=lambda t: (-t[1], t[0]))
        want[vid] = (pred[0], pred[1])
    got = {
        int(r.vec_id): (int(r.pred_label), int(r.votes))
        for r in entry.knn_label_propagation(spark, SF_DIR).collect()
    }
    assert got == want

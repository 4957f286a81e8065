"""Engine-independent replays for the round-5b additions: product
quantization (pq_codes / ann_pq_topk) and image aHash near-dup pairs
(image_ahash_neardup).  The DuckDB oracle gate pins these queries'
values already; these tests pin the SEMANTICS with pure-Python (hashlib +
float) replays of the same fold orders, and the aHash test additionally
proves the Manku block-join loses no pair inside its pigeonhole bound."""

from __future__ import annotations

import hashlib
import math
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
        app_name="pq-ahash-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def vectors(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    return {r.vec_id: [float(x) for x in r.embedding] for r in rows}


def _sq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def _py_pq(vectors, m=8, dsub=8, k=16):
    """Replay pq_encode: codes + recon_err with the engine fold orders."""
    cb = [vectors[i] for i in range(k)]
    out = {}
    for vid, v in vectors.items():
        codes, recon = [], 0.0
        for mi in range(m):
            sub = v[mi * dsub : (mi + 1) * dsub]
            dists = [_sq(sub, c[mi * dsub : (mi + 1) * dsub]) for c in cb]
            best = min(range(k), key=lambda i: (dists[i], i))
            codes.append(best)
            recon = recon + dists[best]
        out[vid] = (codes, recon)
    return out


class TestPq:
    def test_codes_and_recon_replay(self, spark, vectors):
        expected = _py_pq(vectors)
        rows = entry.pq_codes(spark, SF_DIR).collect()
        assert len(rows) == len(vectors)
        for r in rows:
            codes, recon = expected[r.vec_id]
            assert list(r.codes) == codes, r.vec_id
            assert r.recon_err == pytest.approx(round(recon, 4), abs=0)

    def test_adc_topk_replay(self, spark, vectors):
        """Full replay of the ADC + exact-re-rank pipeline: lookup
        tables, shortlist of 50 by (rounded adc, vec_id), final 10 by
        (rounded cosine desc, vec_id)."""
        m, dsub, k = 8, 8, 16
        enc = _py_pq(vectors)
        q = vectors[0]
        cb = [vectors[i] for i in range(k)]
        tables = [
            [_sq(q[mi * dsub : (mi + 1) * dsub], c[mi * dsub : (mi + 1) * dsub]) for c in cb]
            for mi in range(m)
        ]
        adc = {}
        for vid, (codes, _recon) in enc.items():
            if vid == 0:
                continue
            acc = tables[0][codes[0]]
            for mi in range(1, m):
                acc = acc + tables[mi][codes[mi]]
            adc[vid] = round(acc, 4)
        short = sorted(adc, key=lambda vid: (adc[vid], vid))[:50]

        def dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        cos = {
            vid: round(
                dot(vectors[vid], q)
                / (math.sqrt(dot(vectors[vid], vectors[vid])) * math.sqrt(dot(q, q))),
                4,
            )
            for vid in short
        }
        want = sorted(short, key=lambda vid: (-cos[vid], vid))[:10]
        got = entry.ann_pq_topk(spark, SF_DIR).collect()
        assert [r.vec_id for r in got] == want
        for r in got:
            assert r.adc_dist == pytest.approx(adc[r.vec_id], abs=0)
            assert r.cosine == pytest.approx(cos[r.vec_id], abs=0)

    def test_codes_bounded_and_compressive(self, spark):
        """Every code is a valid codeword index (the 8-byte-per-vector
        claim), and training vectors quantize to themselves exactly."""
        rows = entry.pq_codes(spark, SF_DIR).collect()
        for r in rows:
            assert len(r.codes) == 8
            assert all(0 <= c < 16 for c in r.codes)
        by_id = {r.vec_id: r for r in rows}
        for vid in range(16):
            assert list(by_id[vid].codes) == [vid] * 8
            assert by_id[vid].recon_err == 0.0


def _py_ahash(doc_id):
    grp, v = doc_id % 30, doc_id // 30
    px = []
    for i in range(64):
        base = int(hashlib.md5(f"img:{grp}:{i}".encode()).hexdigest()[:2], 16)
        bump = 0
        if v % 4 != 0 and (i + v) % 7 == 0:
            bump = (v % 4) * 37
        px.append((base + bump) % 256)
    mean = sum(px) / 64.0
    return "".join("1" if p > mean else "0" for p in px)


class TestImageAhash:
    def test_pairs_replay_and_pigeonhole_completeness(self, spark):
        """Replay fingerprints in Python, enumerate ALL pairs with
        Hamming <= 6 brute-force, and assert the block-join query found
        exactly that set (8 blocks make recall exact up to Hamming 7, so
        nothing brute-force finds may be missing)."""
        docs = [
            r.doc_id
            for r in entry._docs(spark, SF_DIR).collect()
            if r.doc_id % 3 == 0 and r.doc_id < 300
        ]
        fp = {d: _py_ahash(d) for d in docs}
        expected = {}
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                lo, hi = min(a, b), max(a, b)
                h = sum(x != y for x, y in zip(fp[lo], fp[hi]))
                if h <= 6:
                    expected[(lo, hi)] = h
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in entry.image_ahash_neardup(spark, SF_DIR).collect()
        }
        assert got == expected
        assert expected, "demo corpus must actually contain near-dups"

    def test_exact_dup_variants_collapse(self, spark):
        """Within a group, every v % 4 == 0 member is byte-identical by
        construction -> all such pairs present at Hamming 0."""
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in entry.image_ahash_neardup(spark, SF_DIR).collect()
        }
        docs = [
            r.doc_id
            for r in entry._docs(spark, SF_DIR).collect()
            if r.doc_id % 3 == 0 and r.doc_id < 300
        ]
        by_grp = {}
        for d in docs:
            if (d // 30) % 4 == 0:
                by_grp.setdefault(d % 30, []).append(d)
        checked = 0
        for members in by_grp.values():
            members.sort()
            for i, a in enumerate(members):
                for b in members[i + 1 :]:
                    assert got.get((a, b)) == 0
                    checked += 1
        assert checked > 0


class TestIvfPq:
    def test_composition_consistency(self, spark, vectors):
        """ann_ivfpq_topk must equal the PQ ADC + re-rank pipeline run by
        hand over exactly the query's coarse probe cell (assignment taken
        from the engine's own ivf_assign, the frame the composition
        consumes)."""
        from readability_spark.spark import textops

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        coarse = textops.collect_codebook(emb.filter(F.col("vec_id") < 8))
        assigned = {
            r.vec_id: r.centroid_id
            for r in textops.ivf_assign(emb, coarse).collect()
        }
        qc = assigned[0]
        probe = [v for v, c in assigned.items() if c == qc and v != 0]
        assert probe, "query cell must be non-trivial"

        m, dsub, k = 8, 8, 16
        enc = _py_pq(vectors)
        q = vectors[0]
        cb = [vectors[i] for i in range(k)]
        tables = [
            [_sq(q[mi * dsub : (mi + 1) * dsub], c[mi * dsub : (mi + 1) * dsub]) for c in cb]
            for mi in range(m)
        ]
        adc = {}
        for vid in probe:
            codes = enc[vid][0]
            acc = tables[0][codes[0]]
            for mi in range(1, m):
                acc = acc + tables[mi][codes[mi]]
            adc[vid] = round(acc, 4)
        short = sorted(adc, key=lambda vid: (adc[vid], vid))[:50]

        def dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        cos = {
            vid: round(
                dot(vectors[vid], q)
                / (math.sqrt(dot(vectors[vid], vectors[vid])) * math.sqrt(dot(q, q))),
                4,
            )
            for vid in short
        }
        want = sorted(short, key=lambda vid: (-cos[vid], vid))[:10]
        got = entry.ann_ivfpq_topk(spark, SF_DIR).collect()
        assert [r.vec_id for r in got] == want
        # the probe bound is real: every served row sits in the query's cell
        assert all(assigned[r.vec_id] == qc for r in got)


class TestPqResidual:
    def test_residual_replay_and_negative_verdict(self, spark, vectors):
        """Replay the residual chain in Python (assignment taken from the
        engine's own ivf_assign, the frame the query consumes) and assert
        the audit's values — and that on THIS stand-in quantizer it
        correctly reports residual encoding does NOT pay (the documented
        negative verdict)."""
        from readability_spark.spark import textops

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        coarse = sorted(
            textops.collect_codebook(emb.filter(F.col("vec_id") < 8))
        )
        assigned = {
            r.vec_id: r.centroid_id
            for r in textops.ivf_assign(emb, coarse).collect()
        }
        cvec = {cid: v for cid, v in coarse}
        resid = {
            vid: [x - y for x, y in zip(v, cvec[assigned[vid]])]
            for vid, v in vectors.items()
        }
        m, dsub, k = 8, 8, 16

        def encode(space):
            cb = [space[i] for i in range(k)]
            out = {}
            for vid, v in space.items():
                recon = 0.0
                for mi in range(m):
                    sub = v[mi * dsub : (mi + 1) * dsub]
                    recon = recon + min(
                        _sq(sub, c[mi * dsub : (mi + 1) * dsub]) for c in cb
                    )
                out[vid] = recon
            return out

        raw = encode(vectors)
        res = encode(resid)
        got = {r.vec_id: r for r in entry.pq_residual_report(spark, SF_DIR).collect()}
        assert got.keys() == vectors.keys()
        for vid, r in got.items():
            assert r.centroid_id == assigned[vid]
            assert r.recon_raw == pytest.approx(round(raw[vid], 4), abs=0)
            assert r.recon_res == pytest.approx(round(res[vid], 4), abs=0)
            assert r.improved == (res[vid] < raw[vid])
        # the documented negative verdict on the stand-in quantizer:
        # residual encoding must not look like a win here
        improved = sum(1 for r in got.values() if r.improved)
        assert improved / len(got) < 0.5

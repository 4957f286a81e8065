"""Invariant tests for the second round-4 operator batch in
__spark_entry__: CCNet bucketing, sequence packing, URL blocklist
filtering, and fixed-iteration PageRank.  The DuckDB oracle gate
(tools/check_oracles.py) pins exact values; these tests pin the
semantic invariants that make the operators meaningful."""

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
    spark = get_spark(app_name="entry-r4b-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()


class TestCcnetBuckets:
    def test_every_doc_bucketed_and_cutoffs_ordered(self, spark):
        from pyspark.sql import functions as F

        rows = entry.ccnet_buckets(spark, SF_DIR).collect()
        n_docs = (
            entry._docs(spark, SF_DIR).filter(F.trim(F.col("text")) != "").count()
        )
        assert len(rows) == n_docs
        assert {r.bucket for r in rows} <= {"head", "middle", "tail", "unsampled"}
        # within each language, every head nll <= every middle nll <=
        # every tail nll is NOT guaranteed pointwise (cutoffs come from a
        # sample), but the bucket maxima must be ordered: the worst head
        # doc can't exceed the best tail doc's cutoff ordering
        by_lang: dict[str, dict[str, list[float]]] = {}
        for r in rows:
            if r.bucket == "unsampled":
                continue
            by_lang.setdefault(r.lang, {}).setdefault(r.bucket, []).append(r.nll)
        for lang, buckets in by_lang.items():
            if "head" in buckets and "tail" in buckets:
                assert max(buckets["head"]) <= min(buckets["tail"]), lang
            if "head" in buckets and "middle" in buckets:
                assert max(buckets["head"]) <= min(buckets["middle"]), lang
            if "middle" in buckets and "tail" in buckets:
                assert max(buckets["middle"]) <= min(buckets["tail"]), lang

    def test_sampled_docs_split_into_nonempty_head(self, spark):
        rows = entry.ccnet_buckets(spark, SF_DIR).collect()
        sampled_langs = {r.lang for r in rows if r.doc_id % 20 == 0}
        heads = {r.lang for r in rows if r.bucket == "head"}
        # every language with sample coverage produced a head bucket
        assert sampled_langs <= heads | {"und"}


class TestSequencePack:
    def test_slices_cover_each_doc_exactly(self, spark):
        from pyspark.sql import functions as F

        packed = entry.sequence_pack(spark, SF_DIR)
        docs = (
            entry._docs(spark, SF_DIR)
            .filter(F.trim(F.col("text")) != "")
            .select(
                "doc_id",
                F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"),
            )
        )
        per_doc = packed.groupBy("doc_id").agg(
            F.sum("tok_len").alias("covered"),
            F.min("tok_start").alias("first_start"),
        )
        joined = per_doc.join(docs, "doc_id").collect()
        assert joined
        for r in joined:
            assert r.covered == r.n_tok, r
            assert r.first_start == 1, r

    def test_sequences_are_full_except_shard_tail(self, spark):
        from pyspark.sql import functions as F

        packed = entry.sequence_pack(spark, SF_DIR)
        per_seq = (
            packed.groupBy("source", "seq_id")
            .agg(F.sum("tok_len").alias("fill"))
            .collect()
        )
        last = {}
        for r in per_seq:
            last[r.source] = max(last.get(r.source, -1), r.seq_id)
        for r in per_seq:
            if r.seq_id < last[r.source]:
                assert r.fill == entry._SEQ_LEN, r
            else:
                assert 1 <= r.fill <= entry._SEQ_LEN, r

    def test_offsets_inside_sequence(self, spark):
        rows = entry.sequence_pack(spark, SF_DIR).collect()
        for r in rows:
            assert 0 <= r.seq_off < entry._SEQ_LEN
            assert r.seq_off + r.tok_len <= entry._SEQ_LEN
            assert r.tok_start >= 1 and r.tok_len >= 1


class TestUrlBlocklist:
    def test_blocked_hosts_absent_and_survivors_counted(self, spark):
        rows = entry.url_blocklist_filter(spark, SF_DIR).collect()
        hosts = {r.host for r in rows}
        assert "src3.example.com" not in hosts          # exact rule
        assert not any(h.endswith(".ads-hub.example.com") for h in hosts)
        docs = entry._docs(spark, SF_DIR).collect()
        expect = 0
        for d in docs:
            if d.doc_id % 11 == 0:
                continue  # ad-subdomain page, blocked by suffix rule
            host = (
                "hot.example.com" if d.doc_id % 10 < 4 else f"{d.source}.example.com"
            )
            if host == "src3.example.com":
                continue
            expect += 1
        assert len(rows) == expect
        for r in rows:
            assert r.url == f"https://{r.host}/doc-{r.doc_id}"


class TestPageRank:
    def test_mass_conserved_and_positive(self, spark):
        rows = entry.pagerank_links(spark, SF_DIR).collect()
        n = len(rows)
        assert n == entry._docs(spark, SF_DIR).count()
        # no dangling nodes by construction -> total rank stays 1, so the
        # N-scaled ranks sum to N (within rounding of 4dp per row)
        assert abs(sum(r.rank_norm for r in rows) - n) < 0.01 * n**0.5 + 0.01
        assert all(r.rank_norm > 0 for r in rows)
        # the rank floor is the damping teleport: 0.15 (N-scaled) minimum
        assert min(r.rank_norm for r in rows) >= 0.15 - 1e-6

    def test_ranks_differentiate(self, spark):
        rows = entry.pagerank_links(spark, SF_DIR).collect()
        assert len({r.rank_norm for r in rows}) > 1


class TestSemDedup:
    def test_canonical_per_cluster_and_full_coverage(self, spark):
        rows = entry.semdedup_embeddings(spark, SF_DIR).collect()
        emb_n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
        assert len(rows) == emb_n
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r.sem_cluster, []).append(r)
        for cid, members in by_cluster.items():
            kept = [m for m in members if m.keep]
            assert len(kept) == 1
            assert kept[0].vec_id == min(m.vec_id for m in members) == cid

    def test_synthetic_exact_semantic_dups_collapse(self, spark):
        from readability_spark.spark import textops

        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),   # identical to 0
            (2, [0.99, 0.1, 0.0]),  # near 0
            (3, [0.0, 0.0, 1.0]),   # orthogonal
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = emb.filter("vec_id IN (0, 3)")
        got = {
            r.vec_id: (r.sem_cluster, r.keep)
            for r in textops.semdedup(emb, cents, threshold=0.95).collect()
        }
        assert got[0] == (0, True)
        assert got[1] == (0, False)
        assert got[2] == (0, False)
        assert got[3] == (3, True)


class TestGopherRepetition:
    def test_fracs_bounded_and_keep_consistent(self, spark):
        rows = entry.gopher_repetition_rules(spark, SF_DIR).collect()
        assert rows
        th = entry._GOPHER_REP
        for r in rows:
            for c in ("top2_frac", "top3_frac", "top4_frac",
                      "dup5_frac", "dup10_frac"):
                assert 0.0 <= getattr(r, c) <= 1.0, (r.doc_id, c)
            # longer top-grams cover at least as many chars per occurrence
            # but occur no more often; the mode fraction is not monotone,
            # only the keep recomputation must match exactly
            want = (
                r.top2_frac <= th["top"][2]
                and r.top3_frac <= th["top"][3]
                and r.top4_frac <= th["top"][4]
                and r.dup5_frac <= th["dup"][5]
                and r.dup10_frac <= th["dup"][10]
            )
            assert r.keep == want, r.doc_id

    def test_planted_repetition_rejected(self, spark):
        from readability_spark.spark import textops  # noqa: F401  (session warm)

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rep = ("spam ham " * 40).strip()
        docs = spark.createDataFrame(
            [(0, base + " " + base, "en", "s0"), (1, rep, "en", "s0")],
            "doc_id long, text string, lang string, source string",
        )
        import unittest.mock as mock

        with mock.patch.object(entry, "_docs", lambda s, d: docs):
            got = {r.doc_id: r for r in
                   entry.gopher_repetition_rules(spark, SF_DIR).collect()}
        assert got[1].keep is False          # 'spam ham' dominates every lane
        assert got[1].top2_frac > 0.4
        assert got[0].dup10_frac > 0.0       # the duplicated sentence repeats

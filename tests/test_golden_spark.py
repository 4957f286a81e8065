"""Tier-2 golden end-to-end tests over a DataFrame (FIXTURES.md section 3)
plus Tier-4 skew/resume tests.

Invariants:
1. byte-identical text_content (and all metadata fields) per url between the
   Spark pipeline and the locally-computed golden corpus;
2. row count preserved (every url exactly once, ok or error);
3. malformed rows -> status != 'ok', null article fields; other families ok;
4. determinism: two runs produce identical tables;
5. resume: a partially-committed run finishes without recomputing done
   partitions, and the resumed table equals a clean full run.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from readability_spark.fixtures import build_rows, golden_for
from readability_spark.spark.job import extract_articles, run_job
from readability_spark.spark.session import get_spark

# 97 families: 9/20 of rows cycle the 96 non-plain families, so the >=3-
# per-family invariant needs N_ROWS*9/20 >= 3*96 = 288; 660 gives 297
# (slack for three more families before this needs raising again)
N_ROWS = 660


@pytest.fixture(scope="module")
def spark():
    spark = get_spark(app_name="golden-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def fixture_rows():
    return build_rows(N_ROWS)


@pytest.fixture(scope="module")
def pages_df(spark, fixture_rows):
    data = [(r.url, r.warc_ts, r.html, r.text, r.lang, r.family) for r in fixture_rows]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string, family string"
    )


@pytest.fixture(scope="module")
def extracted(spark, pages_df):
    return {r.url: r for r in extract_articles(pages_df).collect()}


ARTICLE_COLS = (
    "title byline dir excerpt lang published_time site_name text_content length content"
).split()


def test_row_count_preserved(extracted, fixture_rows):
    assert len(extracted) == len(fixture_rows)
    assert set(extracted) == {r.url for r in fixture_rows}


def test_byte_identical_golden(extracted, fixture_rows):
    golden = golden_for(fixture_rows)
    mismatches = []
    for r in fixture_rows:
        got = extracted[r.url]
        want_article, want_status, _ = golden[r.url]
        if got.status != want_status:
            mismatches.append((r.url, "status", got.status, want_status))
            continue
        if want_article is None:
            continue
        for col in ARTICLE_COLS:
            want = getattr(want_article, col)
            have = getattr(got, col)
            if col in ("text_content", "content") and want is not None and have is not None:
                same = want.encode("utf-8") == have.encode("utf-8")
            else:
                same = want == have
            if not same:
                mismatches.append((r.url, col, repr(have)[:80], repr(want)[:80]))
    assert not mismatches, f"{len(mismatches)} mismatches, first: {mismatches[:3]}"


def test_family_statuses(extracted, fixture_rows):
    for r in fixture_rows:
        got = extracted[r.url]
        if r.family == "malformed":
            assert got.status == "error", r.url
            assert got.text_content is None and got.title is None
        else:
            assert got.status == "ok", (r.url, got.error)


def test_every_family_present(fixture_rows):
    from collections import Counter

    from readability_spark.fixtures import FAMILIES

    counts = Counter(r.family for r in fixture_rows)
    assert len(counts) == len(FAMILIES) == 97
    assert min(counts.values()) >= 3


def test_determinism(spark, pages_df, extracted):
    second = {r.url: r for r in extract_articles(pages_df).collect()}
    assert set(second) == set(extracted)
    for url, row in extracted.items():
        a = {k: v for k, v in row.asDict().items() if k != "extract_ms"}
        b = {k: v for k, v in second[url].asDict().items() if k != "extract_ms"}
        assert a == b, url


def test_resume_without_recompute(spark, pages_df, tmp_path):
    out1, lin1 = str(tmp_path / "a1"), str(tmp_path / "l1")
    rep = run_job(spark, pages_df, out1, lin1, run_id="t", num_partitions=8, salt_n=2, commit_groups=2)
    assert rep.partitions_processed == 8
    assert rep.docs == N_ROWS

    # noop resume
    rep2 = run_job(spark, pages_df, out1, lin1, run_id="t", num_partitions=8, salt_n=2, commit_groups=2)
    assert rep2.partitions_processed == 0
    assert spark.read.parquet(out1).count() == N_ROWS  # no duplicates

    # simulated crash: keep only half the lineage + matching output
    out2, lin2 = str(tmp_path / "a2"), str(tmp_path / "l2")
    spark.read.parquet(lin1).filter(F.col("partition_id") < 4).write.parquet(lin2)
    spark.read.parquet(out1).filter(F.col("partition_id") < 4).write.partitionBy(
        "partition_id"
    ).parquet(out2)
    rep3 = run_job(spark, pages_df, out2, lin2, run_id="t", num_partitions=8, salt_n=2, commit_groups=2)
    assert rep3.partitions_done_previously == 4
    assert rep3.partitions_processed == 4

    clean = sorted(
        (r.url, r.text_content, r.status)
        for r in spark.read.parquet(out1).select("url", "text_content", "status").collect()
    )
    resumed = sorted(
        (r.url, r.text_content, r.status)
        for r in spark.read.parquet(out2).select("url", "text_content", "status").collect()
    )
    assert clean == resumed


def test_corrupt_lineage_fails_loudly(spark, pages_df, tmp_path):
    """A truncated lineage parquet (crash mid-write before the atomic rename
    existed) must NOT be silently treated as a fresh run — that would
    re-append already-committed partitions.  And in-flight '.tmp' files are
    invisible to the resume read (the crash-safe write contract)."""
    from readability_spark.spark.job import LineageCorruptError, completed_partitions

    out, lin = str(tmp_path / "a"), str(tmp_path / "l")
    run_job(spark, pages_df, out, lin, run_id="c", num_partitions=4, salt_n=2, commit_groups=1)

    # a leftover dot-prefixed temp file is ignored by the resume read
    (Path(lin) / ".lineage-deadbeef.parquet.tmp").write_bytes(b"garbage")
    assert completed_partitions(spark, lin, "c") == {0, 1, 2, 3}

    # a truncated *committed-named* file fails loudly instead of recomputing
    (Path(lin) / "lineage-corrupt.parquet").write_bytes(b"PAR1garbage")
    with pytest.raises(LineageCorruptError):
        completed_partitions(spark, lin, "c")

    # missing lineage dir is still just "fresh run"
    assert completed_partitions(spark, str(tmp_path / "nope"), "c") == set()


def test_leaf_node_attrs_immutable():
    """Leaf (TEXT/COMMENT) nodes alias a shared read-only attrs singleton —
    mutating one must raise, not contaminate every leaf in the worker."""
    from readability_spark import dom

    doc = dom.parse_document(b"<p>hello</p>")
    text_node = dom.select(doc, "p")[0].children[0]
    assert text_node.kind == dom.TEXT
    with pytest.raises((TypeError, AttributeError)):
        text_node.set_attr("x", "1")
    assert dict(text_node.attrs) == {}


def test_lineage_schema_and_metrics(spark, pages_df, tmp_path):
    out, lin = str(tmp_path / "a"), str(tmp_path / "l")
    run_job(spark, pages_df, out, lin, run_id="m", num_partitions=4, salt_n=2, commit_groups=1)
    lineage = spark.read.parquet(lin)
    assert set(lineage.columns) == {
        "run_id", "partition_id", "status", "docs", "ok", "failed",
        "started_at", "finished_at", "docs_per_sec",
    }
    rows = lineage.collect()
    assert len(rows) == 4
    assert sum(r.docs for r in rows) == N_ROWS
    assert sum(r.failed for r in rows) > 0  # malformed family rows recorded
    assert all(r.docs_per_sec is None or r.docs_per_sec > 0 for r in rows)


def test_scored_extraction_matches_local_golden(spark, pages_df, fixture_rows):
    """Tier-2 for the Arc90 scoring pass: the Spark path with
    content_extraction=True is byte-identical per url to the local
    (Tier-1-verified) extractor under the same options."""
    from readability_spark.options import Options

    opts = Options(content_extraction=True, min_text_length=0)
    got = {r.url: r for r in extract_articles(pages_df, options=opts).collect()}
    golden = golden_for(fixture_rows, options=opts)
    mismatches = []
    for r in fixture_rows:
        want_article, want_status, _ = golden[r.url]
        have = got[r.url]
        if have.status != want_status:
            mismatches.append((r.url, "status", have.status, want_status))
            continue
        if want_article is None:
            continue
        for col in ("text_content", "content", "title", "length"):
            if getattr(have, col) != getattr(want_article, col):
                mismatches.append((r.url, col))
    assert not mismatches, f"{len(mismatches)} mismatches, first: {mismatches[:3]}"


def test_fix_relative_uris_spark_plumbing(spark, pages_df, fixture_rows):
    """extract_articles(base_url_col='url', fix_relative_uris=True) resolves
    each row's URIs against that row's own url, byte-identical to the local
    extractor given the same base."""
    from readability_spark.options import Options
    from readability_spark.pipeline import extract_row

    opts = Options(fix_relative_uris=True)
    got = {
        r.url: r
        for r in extract_articles(pages_df, options=opts, base_url_col="url").collect()
    }
    checked = 0
    for r in fixture_rows[:50]:
        want_article, want_status, _ = extract_row(r.html, options=opts, base_url=r.url)
        have = got[r.url]
        assert have.status == want_status
        if want_article is not None:
            assert have.content == want_article.content
            checked += 1
    assert checked > 0


def test_readerable_flags_spark(spark, pages_df):
    """readerable_flags agrees with the local is_probably_readerable and
    yields one row per input url."""
    from readability_spark.readerable import is_probably_readerable
    from readability_spark.spark.job import readerable_flags

    rows = readerable_flags(pages_df).collect()
    assert len(rows) == pages_df.count()
    html_by_url = {r["url"]: r["html"] for r in pages_df.select("url", "html").collect()}
    for row in rows[:50]:
        try:
            ok, score = is_probably_readerable(html_by_url[row.url])
            ok, score = ok, round(score, 4)
        except Exception:
            ok, score = None, None
        assert (row.readerable, row.readerable_score) == (ok, score)


def test_hot_domain_spreads_across_partitions_and_salts(spark, pages_df):
    """Tier-4 skew: the 40%-hot-domain corpus must spread ~uniformly over
    the url-hash partition space (url hashing, not domain hashing) and the
    deterministic salt must subdivide the hot domain across all salt
    values — the properties the north_rule's salting requirement is about."""
    from readability_spark.spark.job import with_partition_id, with_salt

    n_parts, n_salts = 8, 4
    hot = with_salt(with_partition_id(pages_df, n_parts), n_salts).filter(
        F.col("url").contains("hot.example.com")
    )
    per_part = {r.partition_id: r.cnt for r in
                hot.groupBy("partition_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(per_part.values())
    assert total > 0
    assert len(per_part) == n_parts, "hot domain must hit every partition"
    assert max(per_part.values()) <= 2 * (total / n_parts), "no partition hoards the hot domain"
    salts = {r.salt for r in hot.select("salt").distinct().collect()}
    assert salts == set(range(n_salts)), "salt must subdivide the hot domain fully"
    # determinism: same url always gets the same (partition, salt)
    again = with_salt(with_partition_id(pages_df, n_parts), n_salts)
    a = {r.url: (r.partition_id, r.salt) for r in again.select("url", "partition_id", "salt").collect()}
    b = {r.url: (r.partition_id, r.salt) for r in hot.select("url", "partition_id", "salt").collect()}
    assert all(a[u] == b[u] for u in b)


def test_article_columns_projection(spark, pages_df, extracted):
    """Projection pushdown into the UDF: pruned run skips content entirely
    but every surviving column is byte-identical to the full run."""
    pruned = extract_articles(
        pages_df, article_columns=("title", "text_content", "length", "lang")
    )
    cols = set(pruned.columns)
    assert "content" not in cols and "byline" not in cols
    assert {"title", "text_content", "length", "lang", "status", "error"} <= cols
    rows = {r.url: r for r in pruned.collect()}
    assert set(rows) == set(extracted)
    for url, full in extracted.items():
        p = rows[url]
        assert (p.title, p.text_content, p.length, p.lang, p.status) == (
            full.title, full.text_content, full.length, full.lang, full.status,
        ), url


def test_article_columns_unknown_rejected(spark, pages_df):
    with pytest.raises(ValueError, match="unknown article columns"):
        extract_articles(pages_df, article_columns=("text_content", "nope"))


def test_want_content_skips_serialization():
    """Local-tier check: want_content=False leaves content None and every
    other Article field identical."""
    from readability_spark.pipeline import extract

    html = "<html><body><p>Hello&nbsp;world <b>bold</b></p><p>More.</p></body></html>"
    full = extract(html)
    lean = extract(html, want_content=False)
    assert lean.content is None and full.content is not None
    for f in ("byline", "dir", "excerpt", "lang", "length",
              "published_time", "site_name", "text_content", "title"):
        assert getattr(lean, f) == getattr(full, f), f


def test_lineage_scheme_paths_not_treated_as_local(spark, tmp_path):
    """Single-slash scheme URIs (dbfs:/x) must not be routed to os.listdir
    (which would silently report a fresh run for existing remote lineage);
    file:-scheme paths ARE local and resolve to the filesystem path."""
    from readability_spark.spark.job import _read_lineage

    # dbfs:/... -> remote branch -> spark read fails with a non-PATH_NOT_FOUND
    # error class -> loud LineageCorruptError, never a silent fresh-run None
    from readability_spark.spark.job import LineageCorruptError

    with pytest.raises(LineageCorruptError):
        _read_lineage(spark, "dbfs:/definitely/not/mounted")

    # file: single- and double-slash forms hit the local branch
    assert _read_lineage(spark, f"file:{tmp_path}/missing") is None
    assert _read_lineage(spark, f"file://{tmp_path}/missing") is None


def test_html_codec_gzip_roundtrip(spark, pages_df, extracted):
    """extract_articles(html_codec='gzip') over gzip-compressed html equals
    the plain run row for row; a corrupt gzip member isolates as an error
    row instead of killing the Arrow batch."""
    from readability_spark.spark.pages import gzip_html

    gz = gzip_html(pages_df)
    got = {r.url: r for r in extract_articles(gz, html_codec="gzip").collect()}
    assert set(got) == set(extracted)
    for url, row in extracted.items():
        a = {k: v for k, v in row.asDict().items() if k != "extract_ms"}
        b = {k: v for k, v in got[url].asDict().items() if k != "extract_ms"}
        assert a == b, url

    # corrupt member: valid gzip magic, truncated stream
    bad = spark.createDataFrame(
        [("u1", b"\x1f\x8b\x08\x00garbage"), ("u2", None)], "url string, html binary"
    )
    rows = {r.url: r for r in extract_articles(bad, html_codec="gzip").collect()}
    assert rows["u1"].status == "error" and rows["u1"].error.startswith("gzip:")
    assert rows["u2"].status == "error"

    # unknown codec rejected loudly
    with pytest.raises(ValueError):
        extract_articles(pages_df, html_codec="zstd")

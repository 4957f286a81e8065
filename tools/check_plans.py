"""Physical-plan quality gate: assert that the plans Catalyst produces for
the engine's headline queries are the plans we want at 100 TB.

Checks (SURVEY.md section 4.2 / task brief):
- filter pushdown reaches the parquet scan (PushedFilters non-empty where a
  scan-level predicate exists);
- column pruning reaches the scan (ReadSchema contains only needed cols —
  in particular the fat `html`/`text` columns are absent when unused);
- small-dim joins broadcast (BroadcastHashJoin, no SortMergeJoin);
- resume anti-join broadcasts;
- aggregations are partial+final hash aggs inside WholeStageCodegen;
- shuffle budgets: queries that claim "exactly one exchange" (or <=N) in
  their docstrings are held to it by exchange counts on the plan.

Writes the formatted plans to BENCH/PLANS.md for the record and exits
non-zero on any failed assertion.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F

from readability_spark.spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df):
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main():
    spark = get_spark(app_name="plan-check", master="local[8]", shuffle_partitions=8)
    sections = []
    failures = []

    def check(
        name,
        df,
        must=(),
        must_not=(),
        materialize=False,
        exact_exchanges=None,
        max_exchanges=None,
    ):
        """Record the (formatted) plan and assert regex/shuffle properties.

        ``materialize`` runs the query first so AQE finalizes the adaptive
        plan — required before asserting runtime decisions (broadcast
        conversions).  It must execute THIS DataFrame's own queryExecution
        (``collect()``): ``df.count()`` would build and run a different
        plan tree and leave this one un-finalized — round 4's gates
        silently asserted only the static plan because of exactly that.
        ``exact_exchanges``/``max_exchanges`` bound the
        number of shuffle ``Exchange`` nodes (BroadcastExchange does not
        count) — the enforcement teeth behind every "one shuffle"/"<=N
        exchanges" docstring claim."""
        static_plan = plan_of(df)
        if materialize:
            df.collect()
        plan = plan_of(df)
        sections.append((name, plan))
        for pat in must:
            if not re.search(pat, plan):
                failures.append(f"{name}: expected /{pat}/ in plan")
        for pat in must_not:
            if re.search(pat, plan):
                failures.append(f"{name}: must NOT contain /{pat}/")
        if exact_exchanges is not None or max_exchanges is not None:
            # count shuffles on the STATIC plan: a shared shuffle prints
            # once there (ReusedExchange elsewhere), which is the true
            # shuffle budget; the finalized adaptive plan re-prints each
            # reused exchange under every query stage that consumes it,
            # double-counting real shuffles
            n = len(re.findall(r"\(\d+\) Exchange", static_plan))
            if exact_exchanges is not None and n != exact_exchanges:
                failures.append(
                    f"{name}: expected exactly {exact_exchanges} shuffle "
                    f"Exchange(s), got {n}"
                )
            elif max_exchanges is not None and n > max_exchanges:
                failures.append(
                    f"{name}: expected <={max_exchanges} shuffle "
                    f"Exchange(s), got {n}"
                )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    # 1. scan-level predicate + projection pushdown: the fat `text` column
    # must not be read when only doc_id/lang are needed
    check(
        "filter_and_prune",
        docs.filter(F.col("lang") == "en").select("doc_id", "lang"),
        must=[
            r"PushedFilters: \[.*IsNotNull\(lang\).*EqualTo\(lang,en\).*\]",
            r"ReadSchema: struct<doc_id:bigint,lang:string>",
        ],
        must_not=[r"ReadSchema: struct<.*text"],
    )

    # 2. broadcast join for the small dimension (no sort-merge)
    check(
        "broadcast_join",
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n")),
        must=[r"BroadcastHashJoin"],
        must_not=[r"SortMergeJoin"],
    )

    # 3. resume anti-join broadcasts the (small) done-partitions side
    done = spark.createDataFrame([(i,) for i in range(8)], "partition_id int")
    pages = docs.withColumn(
        "partition_id", F.pmod(F.xxhash64("doc_id"), F.lit(64)).cast("int")
    )
    check(
        "resume_anti_join",
        pages.join(F.broadcast(done), "partition_id", "left_anti"),
        must=[r"BroadcastHashJoin.*LeftAnti"],
        must_not=[r"SortMergeJoin"],
    )

    # 4. partial+final hash aggregation (map-side combine before the
    # exchange; AQE formatted plans don't print codegen spans pre-execution,
    # so assert the aggregate structure itself)
    check(
        "partial_agg",
        lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")),
        must=[
            r"partial_sum\(l_quantity",
            r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate",
            r"ReadSchema: struct<l_quantity:[^,]+,l_returnflag:string>",
        ],
        must_not=[r"SortAggregate"],
    )

    # 5. extraction pre-filters stay OUTSIDE the UDF and push to the scan
    from readability_spark.spark.pages import PAGES_SCHEMA

    pages_tbl = spark.createDataFrame([], PAGES_SCHEMA)
    pages_tbl.write.mode("overwrite").parquet("/tmp/plan_check_pages")
    pages_scan = spark.read.parquet("/tmp/plan_check_pages")
    check(
        "extraction_prefilter_pushdown",
        pages_scan.filter(F.col("html").isNotNull() & (F.length("url") > 0)).select(
            "url", "html"
        ),
        must=[r"PushedFilters: \[.*IsNotNull\(html\).*\]"],
    )

    # 6. IVF assignment is a map-only projection: centroid codebook inlined,
    # NO exchange/join/aggregate anywhere in the plan
    from readability_spark.spark.textops import ivf_assign, winnow_fingerprints

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 4)
    check(
        "ivf_assign_map_only",
        ivf_assign(emb, cents),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate"],
    )

    # 7. winnowing fingerprints: map-side array exprs feed the explode
    # directly from the scan; the final distinct is the ONLY exchange
    # (partial+final hash agg around it), no join anywhere
    check(
        "winnow_map_only_until_distinct",
        winnow_fingerprints(docs, k=5, w=4),
        must=[
            r"Generate[\s\S]*Scan parquet",
            r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate",
        ],
        must_not=[r"Join"],
        exact_exchanges=1,
    )

    # 8. decontamination probe: benchmark hash set broadcasts (map-only
    # probe of the corpus side — no sort-merge shuffle of the candidates)
    import __spark_entry__ as entrymod

    allq = entrymod.queries()
    check(
        "decontam_broadcast_probe",
        allq["decontam_ngram_overlap"](spark, SF_DIR),
        must=[r"BroadcastHashJoin"],
        must_not=[r"SortMergeJoin"],
    )

    # 9. repetition filter is a pure narrow projection over the scan:
    # no exchange, no join, no aggregate
    check(
        "repetition_filter_map_only",
        allq["repetition_filter"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate"],
    )

    # 10. stratified sampler: pure map-side filter, nothing else
    check(
        "sample_stratified_map_only",
        allq["sample_stratified"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate"],
    )

    # 11. paragraph dedup: the chunk/explode is narrow; both window
    # functions share ONE hash partitioning on para_hash — exactly one
    # Exchange in the whole plan, no join
    check(
        "paragraph_dedup_one_exchange",
        allq["paragraph_dedup"](spark, SF_DIR),
        must=[r"Generate[\s\S]*Scan parquet"],
        must_not=[r"Join"],
        exact_exchanges=1,
    )

    # 12. PII scrub: pure narrow projection (regexp built-ins), nothing else
    check(
        "pii_scrub_map_only",
        allq["pii_scrub"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate"],
    )

    # 13. Gopher rule bundle: pure narrow projection like repetition_filter
    check(
        "gopher_quality_filter_map_only",
        allq["gopher_quality_filter"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate"],
    )

    # 14. curated_corpus: the WHOLE end-to-end curation pipeline costs
    # exactly one Exchange (the md5(text) canonical window) and has NO
    # join — the gate/canonical filter/scrub are narrow post-window ops
    check(
        "curated_corpus_one_exchange",
        allq["curated_corpus"](spark, SF_DIR),
        must_not=[r"Join"],
        exact_exchanges=1,
    )

    # 15. dedup_clusters edge stage: the document-frequency skew guard
    # (left-anti against hot hashes) must be present in the plan, and the
    # self-join must be a hash equi-join — never nested-loop/cartesian
    from __spark_entry__ import _dedup_cluster_edges

    check(
        "dedup_cluster_edges_df_guard",
        _dedup_cluster_edges(spark, SF_DIR),
        must=[r"LeftAnti"],
        must_not=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    )

    # 16. repeated_ngram_spans: the join-back of the small repeated-hash
    # set must broadcast (AQE decides at runtime, hence materialize) —
    # the corpus-sized gram stream is never sort-merge shuffled; <=2
    # shuffles = the two-phase countDistinct
    check(
        "repeated_ngram_spans_broadcast_joinback",
        allq["repeated_ngram_spans"](spark, SF_DIR),
        must=[r"BroadcastHashJoin"],
        must_not=[r"SortMergeJoin"],
        materialize=True,
        max_exchanges=2,
    )

    # 17. repeated_span_ranges: the gaps-and-islands window (doc_id) and
    # the island groupBy (doc_id, island) must SHARE one exchange — hash
    # partitioning on doc_id satisfies the agg's clustered distribution on
    # (doc_id, island), so the span stream shuffles exactly once on top of
    # the repeated_ngram_spans plan (<=3 shuffle Exchanges total)
    check(
        "repeated_span_ranges_shared_exchange",
        allq["repeated_span_ranges"](spark, SF_DIR),
        must_not=[r"SortMergeJoin"],
        materialize=True,
        max_exchanges=3,
    )

    # 18. Gopher line-level rules: pure narrow projection over array/string
    # built-ins — the synthesized line structure never leaves the row
    check(
        "gopher_line_rules_map_only",
        allq["gopher_line_rules"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate"],
    )

    # 19. C4 cleaning rules: same contract — line synthesis, per-line keep
    # filter and cleaned-text re-join are all narrow; no shuffle anywhere
    check(
        "c4_quality_filter_map_only",
        allq["c4_quality_filter"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate"],
    )

    # 20. CCNet perplexity filter: the vocab (result of the token agg,
    # vocab-sized << corpus) must broadcast back onto the token stream;
    # the corpus-sized token stream is never sort-merge shuffled
    check(
        "perplexity_filter_broadcast_vocab",
        allq["perplexity_filter"](spark, SF_DIR),
        must=[r"BroadcastHashJoin"],
        must_not=[r"SortMergeJoin"],
        materialize=True,
    )

    # 21. DSIR importance weights: the combined model/weight table is a
    # 64-row frame — every join onto the corpus-sized feature stream must
    # broadcast; no cartesian/SMJ anywhere
    check(
        "dsir_importance_broadcast_models",
        allq["dsir_importance"](spark, SF_DIR),
        must=[r"BroadcastHashJoin"],
        must_not=[r"SortMergeJoin", r"CartesianProduct"],
        materialize=True,
    )

    # 22. winnowing-sampled exact-substring dedup: same plan contract as
    # repeated_ngram_spans — only sampled hash triples shuffle (two-phase
    # countDistinct = <=2 Exchanges) and the repeated-hash join-back
    # broadcasts on the AQE-final plan
    check(
        "repeated_ngram_spans_winnowed_broadcast_joinback",
        allq["repeated_ngram_spans_winnowed"](spark, SF_DIR),
        must=[r"BroadcastHashJoin"],
        must_not=[r"SortMergeJoin"],
        materialize=True,
        max_exchanges=2,
    )

    # 23. near-dup curation flagship: the cluster-label join carries NO
    # forced broadcast hint (label count is the corpus' dup rate — data-
    # dependent); at this sf AQE must still CONVERT it to a broadcast
    # join from the measured runtime size (materialize to see the final
    # adaptive plan); nothing in the composed plan may go cartesian.
    # (A SortMergeJoin elsewhere in the composed plan — e.g. the verify
    # tier's collision-set-sized size lookups — is fine: those joins are
    # deliberately AQE-decided now, not force-broadcast.)
    check(
        "curated_corpus_neardup_broadcast_labels",
        allq["curated_corpus_neardup"](spark, SF_DIR),
        must=[r"BroadcastHashJoin"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 23b. minhash_lsh_pairs verify tier: the per-doc size aggregate is
    # corpus-cardinality, so it must be semi-joined down to the LSH
    # collision set BEFORE the jaccard lookup joins (LeftSemi in the
    # plan) — the guard that replaced round 4's forced corpus-sized
    # F.broadcast(sizes).  Initial (non-materialized) plan: the LeftSemi
    # is a structural property, not an AQE decision.
    check(
        "minhash_verify_sizes_semijoin",
        allq["minhash_lsh_pairs"](spark, SF_DIR),
        must=[r"LeftSemi"],
        must_not=[r"CartesianProduct"],
    )

    # 23c. same guard on the exact-Jaccard twin
    check(
        "jaccard_verify_sizes_semijoin",
        allq["dedup_jaccard_pairs"](spark, SF_DIR),
        must=[r"LeftSemi"],
        must_not=[r"CartesianProduct"],
    )

    # 24. sequence packing: exactly ONE exchange (the per-source-shard
    # running-sum window); the boundary explode stays narrow
    check(
        "sequence_pack_one_exchange",
        allq["sequence_pack"](spark, SF_DIR),
        must=[r"Window", r"Generate"],
        must_not=[r"SortMergeJoin", r"CartesianProduct"],
        exact_exchanges=1,
    )

    # 25. URL blocklist: the rules frame broadcasts (nested-loop is the
    # expected join for the OR-of-kinds predicate) and the corpus side
    # never shuffles
    check(
        "url_blocklist_broadcast_rules",
        allq["url_blocklist_filter"](spark, SF_DIR),
        must=[
            r"BroadcastNestedLoopJoin[\s\S]*LeftAnti"
            r"|LeftAnti[\s\S]*BroadcastNestedLoopJoin"
        ],
        exact_exchanges=0,
    )

    # 26. ccnet bucketing: the per-lang cutoff table broadcasts back onto
    # the scored stream; no corpus-sized sort-merge join
    check(
        "ccnet_buckets_broadcast_cutoffs",
        allq["ccnet_buckets"](spark, SF_DIR),
        must=[r"BroadcastHashJoin"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 27. pagerank: iterations shuffle contribution tuples only — the
    # node-list join-back must broadcast under AQE, never cartesian
    check(
        "pagerank_links_broadcast_iterations",
        allq["pagerank_links"](spark, SF_DIR),
        must=[r"BroadcastHashJoin|BroadcastNestedLoopJoin"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 28b. Gopher repetition rules: one explode feeds all five n-gram
    # lanes; three bounded linear aggregations, no join anywhere
    check(
        "gopher_repetition_three_aggs",
        allq["gopher_repetition_rules"](spark, SF_DIR),
        must=[r"Generate"],
        must_not=[r"Join"],
        max_exchanges=3,
    )

    # 28. SemDeDup: codebook assignment is inlined (no join feeding the
    # pair join's build side beyond the bucket equi-join); the cluster-
    # label join back is UNHINTED (label count is data-dependent) and AQE
    # must convert it to a broadcast join at this sf; nothing cartesian
    check(
        "semdedup_broadcast_labels",
        allq["semdedup_embeddings"](spark, SF_DIR),
        must=[r"BroadcastHashJoin"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 29. Incremental dedup with Bloom prefilter: the membership test is a
    # map-side expression (bloom-negative branch of the Union carries NO
    # join), the exact verify tier is a LeftAnti hash join on the
    # bloom-positive sliver only (AQE broadcasts the corpus-hash side at
    # this sf — materialize to see it), and nothing is cartesian.  The
    # whole query needs no shuffle Exchange: both Union branches are
    # narrow over the scan and the verify join's corpus side arrives by
    # broadcast.
    check(
        "incremental_dedup_bloom_mapside_prefilter",
        allq["incremental_dedup_bloom"](spark, SF_DIR),
        must=[r"Union", r"LeftAnti", r"BroadcastHashJoin"],
        must_not=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        exact_exchanges=0,
        materialize=True,
    )

    # 30. Hashed linear quality classifier: the inlined 64-weight table and
    # the per-token F.aggregate fold must stay a pure narrow projection —
    # no explode (Generate), no join, no shuffle
    check(
        "quality_classifier_map_only",
        allq["quality_classifier_hashed"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate", r"Generate"],
    )

    # 30b. score_auto's STUB tier (this container has no model): must be
    # the same pure narrow projection — no Python stage, no shuffle; the
    # model tier's mapInPandas shape is proven by the seam unit tests
    check(
        "quality_score_auto_stub_map_only",
        allq["quality_score_auto"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[
            r"Exchange",
            r"Join",
            r"HashAggregate",
            r"Generate",
            r"MapInPandas",
            r"ArrowEvalPython",
        ],
    )

    # 31. Text normalization: replace/regexp chain is map-only codegen
    check(
        "text_normalize_map_only",
        allq["text_normalize"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate", r"Generate"],
    )

    # 32. Within-doc duplicate-line/paragraph rules: the sorted-adjacency
    # formulation keeps the whole query a narrow projection — no explode,
    # no groupBy(doc_id, line) corpus shuffle, no join
    check(
        "gopher_dup_lines_map_only",
        allq["gopher_dup_lines"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate", r"Generate"],
    )

    # 33. Count-min sketch probe: estimates are served from the INLINED
    # sketch literal (no lookup join anywhere — the only joins are the
    # demo's broadcast truth probe and the final est-truth merge, both
    # probe-sized); nothing cartesian
    check(
        "cms_probe_inlined_sketch",
        allq["cms_token_counts"](spark, SF_DIR),
        must=[r"BroadcastHashJoin"],
        must_not=[r"CartesianProduct", r"BroadcastNestedLoopJoin", r"SortMergeJoin"],
        materialize=True,
    )

    # 34n. Quantile-gated filter: the derived one-row threshold must
    # BROADCAST into the corpus-side filter (the corpus never shuffles
    # for a gating decision), nothing sort-merge
    check(
        "quantile_gate_broadcast_threshold",
        allq["quantile_gated_filter"](spark, SF_DIR),
        must=[r"BroadcastNestedLoopJoin|BroadcastHashJoin"],
        must_not=[r"SortMergeJoin"],
        materialize=True,
    )

    # 34m. Crawl diff: one key-equi full-outer join over hashes (SMJ on
    # doc_id is the correct shape here — both sides corpus-sized), no
    # nested-loop/cartesian, text never joined
    check(
        "crawl_diff_single_outer_join",
        allq["crawl_diff_report"](spark, SF_DIR),
        must=[r"FullOuter"],
        must_not=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    )

    # 34l2. BPE train: NO Python anywhere (the merge is built-in
    # replace()), the per-round argmax is a heap top-1
    # (TakeOrderedAndProject, never a full sort of the pair counts), and
    # the corpus appears only in the word-count aggregate — the per-round
    # 1-row pair frames join back by broadcast (BroadcastNestedLoopJoin
    # on a LIMIT-1 side is the intended cross shape, so only a true
    # CartesianProduct is banned)
    check(
        "bpe_train_no_python_no_corpus_resort",
        allq["bpe_train"](spark, SF_DIR),
        must=[r"TakeOrderedAndProject", r"HashAggregate"],
        must_not=[r"MapInPandas", r"ArrowEvalPython", r"CartesianProduct", r"Sort\b.*global=true"],
    )

    # classifier_train: distributed GD where the corpus is scanned once
    # per iteration and NEVER keyed-shuffled — every Exchange is a
    # SinglePartition carrying D+2 fixed-point gradient sums (bounded by
    # contract constants), weights ride back as 1-row broadcasts
    # (BroadcastNestedLoopJoin is the intended 1-row cross shape), and
    # Python never touches the corpus
    check(
        "classifier_train_gd_no_corpus_shuffle",
        allq["classifier_train"](spark, SF_DIR),
        must=[r"HashAggregate", r"BroadcastNestedLoopJoin"],
        must_not=[
            r"hashpartitioning",
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
        ],
        max_exchanges=7,
    )

    # doc_chunks: chunking is one narrow projection + one arithmetic
    # explode — zero exchanges, nothing joins, Python never runs
    check(
        "doc_chunks_map_only_explode",
        allq["doc_chunks"](spark, SF_DIR),
        must=[r"\(\d+\) Generate", r"explode"],
        must_not=[r"MapInPandas", r"ArrowEvalPython", r"Join", r"HashAggregate"],
        exact_exchanges=0,
    )

    # filter_funnel_report: all three rule verdicts are map-side
    # expressions in ONE corpus scan feeding ONE conditional count
    # aggregate — the only Exchange is the SinglePartition of its 4
    # integers; no join anywhere (the 4-row blocklist folds into the
    # predicate), no Python
    check(
        "filter_funnel_one_bounded_agg",
        allq["filter_funnel_report"](spark, SF_DIR),
        must=[r"HashAggregate", r"SinglePartition"],
        must_not=[
            r"hashpartitioning",
            r"Join",
            r"MapInPandas",
            r"ArrowEvalPython",
        ],
        exact_exchanges=1,
    )

    # anchor_text_profile: the Python outlink extraction must NOT appear
    # in the query plan — it runs ONCE into the localCheckpoint barrier
    # (pruning-below-exchange would otherwise re-run it per grain), and
    # both aggregation grains read the materialized link table
    # (ExistingRDD); nothing cartesian, no sort-merge at this sf
    check(
        "anchor_profile_single_extraction_pass",
        allq["anchor_text_profile"](spark, SF_DIR),
        must=[r"ExistingRDD", r"Window", r"HashAggregate"],
        must_not=[r"MapInPandas", r"ArrowEvalPython", r"CartesianProduct"],
        max_exchanges=5,
    )

    # ann_recall_report: truth + served top-ks are all heap
    # TakeOrderedAndProject branches against broadcast 1-row queries —
    # ZERO shuffle exchanges for the whole 3-query eval
    check(
        "ann_recall_zero_shuffle_heap_topk",
        allq["ann_recall_report"](spark, SF_DIR),
        must=[r"TakeOrderedAndProject"],
        must_not=[
            r"hashpartitioning",
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
        ],
        exact_exchanges=0,
    )

    # classifier_score_trained: the GD rounds verbatim plus ONE more
    # corpus scan against the broadcast 1-row weights — still zero keyed
    # shuffles end to end (the serving scan adds no Exchange at all)
    check(
        "classifier_score_trained_zero_keyed_shuffle",
        allq["classifier_score_trained"](spark, SF_DIR),
        must=[r"HashAggregate", r"BroadcastNestedLoopJoin"],
        must_not=[
            r"hashpartitioning",
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
        ],
        max_exchanges=7,
    )

    # 34l12. CCNet composed pipeline: detected-lang scoring + sampled
    # bucketing in one plan — vocab aggregate, AQE scoring join, one
    # doc_id shuffle, sample-sized windows, a languages-row cuts
    # broadcast; 7 static exchanges, all bounded or key-reused; no
    # Python, nothing cartesian, no SMJ at this sf.
    check(
        "ccnet_pipeline_composed_bounded",
        allq["ccnet_pipeline"](spark, SF_DIR),
        must=[r"HashAggregate", r"Window", r"BroadcastHashJoin"],
        must_not=[
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
        ],
        max_exchanges=7,
        materialize=True,
    )

    # 34l11. Page outlinks: a single vectorized extraction pass — the
    # MapInPandas anchor walk is the operator (same design as the
    # extraction UDF), with NO exchange, NO join, NO aggregate anywhere.
    check(
        "page_outlinks_map_only",
        allq["page_outlinks"](spark, SF_DIR),
        must=[r"MapInPandas"],
        must_not=[r"Exchange", r"Join", r"HashAggregate", r"Sort\b"],
    )

    # 34l10. Tokenizer fertility: same discipline as bpe_tokenize — the
    # Python apply (MapInPandas) sits on the DISTINCT-vocabulary branch
    # only; the corpus collapses first to the (source, token) aggregate;
    # nothing cartesian.
    check(
        "tokenizer_fertility_python_on_vocab_only",
        allq["tokenizer_fertility_report"](spark, SF_DIR),
        must=[r"MapInPandas|ArrowEvalPython", r"HashAggregate"],
        must_not=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        materialize=True,
    )

    # 34l9. SimHash Hamming pairs: candidates from ONE equi-join on the
    # (block, value) key — nothing all-pairs, nothing cartesian; the
    # verify fingerprint lookup is semi-joined to the candidate set and
    # unhinted (source audit); no Python, no global sort.
    check(
        "simhash_hamming_block_join_only",
        allq["simhash_hamming_pairs"](spark, SF_DIR),
        must=[r"HashAggregate"],
        must_not=[
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Sort\b.*global=true",
        ],
        materialize=True,
    )

    # 34l8. kNN label propagation: the labeled-x-unlabeled pair join is
    # an equi-join on centroid_id (never cartesian; quadratic only
    # within a cluster — the SemDeDup bounding argument), the codebook
    # assignment is map-side literals, and the whole rank->vote->argmax
    # tail shares ONE vec_id exchange (the ranking window, the vote
    # aggregate and the argmax window all cluster by vec_id).
    check(
        "knn_label_prop_one_vecid_exchange",
        allq["knn_label_propagation"](spark, SF_DIR),
        must=[r"HashAggregate", r"Window"],
        must_not=[
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
        ],
        exact_exchanges=1,
        materialize=True,
    )

    # 34l7. Bigram-LM perplexity: the three model frames (bigram table,
    # context counts, unigram probs) are vocabulary-bounded map-combined
    # aggregates; the scoring joins are UNHINTED (vocabulary cardinality
    # is data-dependent) and AQE converts them to broadcasts at this sf;
    # one doc_id shuffle for the per-doc NLL; 5 static exchanges total
    # (3 model aggs + the vocab-sized total window + the doc agg),
    # nothing cartesian, no Python.
    check(
        "bigram_ppl_bounded_models_aqe_joins",
        allq["bigram_perplexity_filter"](spark, SF_DIR),
        must=[r"HashAggregate", r"BroadcastHashJoin"],
        must_not=[
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Sort\b.*global=true",
        ],
        max_exchanges=5,
        materialize=True,
    )

    # 34l6. Cluster mix report: the trained codebook is consumed as
    # inlined literals (training ran at build time; its own plan is
    # gated by ivf_train_bounded_aggs_no_corpus_shuffle), so the served
    # query is a map-side assignment + ONE bounded (cluster, label)
    # aggregate + a window over those <= K*|labels| rows — exactly two
    # exchanges, no joins, no Python.
    check(
        "cluster_mix_two_bounded_exchanges",
        allq["cluster_mix_report"](spark, SF_DIR),
        must=[r"HashAggregate", r"Window"],
        must_not=[
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
            r"BroadcastHashJoin",
        ],
        exact_exchanges=2,
        materialize=True,
    )

    # 34l5. LSH recall report: an EVALUATION harness — every frame
    # descends from the bounded doc_id < 300 sample, so no exchange
    # budget applies (the exact all-pairs truth join is the harness's
    # point and is bounded by construction); what must hold is that
    # nothing is cartesian (the 1-row metric crossJoins broadcast) and
    # the counts are hash aggregates.
    check(
        "lsh_recall_report_bounded_harness",
        allq["lsh_recall_report"](spark, SF_DIR),
        must=[r"HashAggregate"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 34l4. Host reputation filter: the verdict join-back is UNHINTED
    # (host cardinality is data-dependent — the source-level broadcast
    # audit below guarantees no F.broadcast() here) and AQE must still
    # convert it to a broadcast join at this sf; the rollup is one
    # map-combined host aggregate; nothing cartesian, no corpus sort.
    check(
        "host_reputation_unhinted_aqe_join",
        allq["host_reputation_filter"](spark, SF_DIR),
        must=[r"HashAggregate", r"BroadcastHashJoin"],
        must_not=[r"CartesianProduct", r"Sort\b.*global=true"],
        max_exchanges=4,
        materialize=True,
    )

    # 34l3. IVF codebook training (Lloyd's k-means): NO Python anywhere,
    # nothing cartesian (the per-iteration codebook joins back as a
    # 1-row broadcast — BroadcastNestedLoopJoin on that side is the
    # intended cross shape), no SortMergeJoin (the K-row empty-cluster
    # join must broadcast), and no global sort of the corpus.  The only
    # exchanges carry bounded aggregate rows: per iteration one
    # groupBy(cid, pos) mean update (<= K*dim rows post map-combine),
    # one K-row codebook rebuild, and one single-row collect_list (<= 4
    # bounded exchanges x 3 iterations, measured 11 static) — the corpus
    # itself is scanned once per iteration and never shuffled.
    check(
        "ivf_train_bounded_aggs_no_corpus_shuffle",
        allq["ivf_train"](spark, SF_DIR),
        must=[r"HashAggregate"],
        must_not=[
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
            r"Sort\b.*global=true",
        ],
        max_exchanges=12,
        materialize=True,
    )

    # 34l. BPE tokenize: the Python stage (ArrowEvalPython/MapInPandas)
    # must sit on the DISTINCT-vocabulary branch, and the corpus joins
    # the piece dim without anything cartesian
    check(
        "bpe_python_on_vocab_only",
        allq["bpe_tokenize"](spark, SF_DIR),
        must=[r"MapInPandas|ArrowEvalPython", r"HashAggregate"],
        must_not=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        materialize=True,
    )

    # 34k. End-to-end pipeline flagship: the corpus crosses exactly ONE
    # corpus-wide shuffle (the md5(norm) dedup window); the only other
    # shuffle exchanges are the two bounded distincts (benchmark gram
    # set, contaminated-id set).  The benchmark-gram probe broadcasts by
    # hint (suite is capped at fixed size); the contaminated-id anti-join
    # is UNHINTED (contamination rate is data-dependent) and AQE must
    # convert it to a broadcast anti-join at this sf; nothing cartesian
    check(
        "llm_pipeline_one_corpus_exchange",
        allq["llm_corpus_pipeline"](spark, SF_DIR),
        must=[r"Window", r"BroadcastHashJoin"],
        must_not=[r"SortMergeJoin", r"CartesianProduct"],
        max_exchanges=3,
        materialize=True,
    )

    # 34j. Repeated-span scrub: the cut itself must be a map-side array
    # filter over the collected span list — no per-position explode of
    # the corpus, no cartesian; the only joins are doc_id-keyed
    check(
        "repeated_span_scrub_mapside_cut",
        allq["repeated_span_scrub"](spark, SF_DIR),
        must=[r"HashAggregate"],
        must_not=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        materialize=True,
    )

    # 34i. Source data card: ONE aggregate over the corpus (partial+
    # final HashAggregate for the sums, two-phase for the distinct) —
    # no join anywhere in the datasheet query
    check(
        "source_data_card_single_agg",
        allq["source_data_card"](spark, SF_DIR),
        must=[r"HashAggregate", r"Scan parquet"],
        must_not=[r"Join", r"CartesianProduct", r"Window"],
    )

    # 34h. Incremental near-dup: candidates come from the (band, bkey)
    # equi-join between the increment's and the corpus's band tables —
    # never a cartesian or pure-inequality join over documents
    check(
        "incremental_neardup_bucket_join",
        allq["incremental_dedup_neardup"](spark, SF_DIR),
        must=[r"HashAggregate"],
        must_not=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        materialize=True,
    )

    # 34g. Inverted index: the hot-token stop-posting guard must be a
    # BROADCAST anti-join applied BEFORE list materialization (no hot
    # posting list is ever buffered); nothing cartesian
    check(
        "inverted_index_df_cap_broadcast_anti",
        allq["inverted_index"](spark, SF_DIR),
        must=[r"BroadcastHashJoin LeftAnti|BroadcastHashJoin.*LeftAnti"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 34f. Semantic decontamination: benchmark vectors are INLINED
    # literals, so the corpus-side check is one scan with zero
    # exchanges, zero joins, zero aggregates — pure map
    check(
        "decontam_semantic_map_only",
        allq["decontam_semantic"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[r"Exchange", r"Join", r"HashAggregate"],
    )

    # 34e. Hybrid RRF fusion: both retrieval branches keep their heap
    # top-k shape inside the fused plan (TakeOrderedAndProject twice);
    # the fusion join runs on 2xk rows, nothing cartesian
    check(
        "hybrid_rrf_heap_branches",
        allq["hybrid_search_rrf"](spark, SF_DIR),
        must=[r"TakeOrderedAndProject[\s\S]*TakeOrderedAndProject"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 34d. BM25: global top-k must be TakeOrderedAndProject (per-
    # partition heap + driver merge), never a corpus-wide Sort; the
    # posting filter runs before aggregation; nothing cartesian
    check(
        "bm25_topk_take_ordered",
        allq["bm25_search"](spark, SF_DIR),
        must=[r"TakeOrderedAndProject", r"HashAggregate"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 34c. Temperature mix sampling: rates come from a bounded groupBy,
    # the corpus-side filter pass joins the tiny rate dim by BROADCAST
    # (the corpus must not shuffle for a sampling decision), nothing
    # cartesian
    check(
        "temperature_mix_broadcast_rates",
        allq["temperature_mix_sample"](spark, SF_DIR),
        must=[r"BroadcastHashJoin", r"HashAggregate"],
        must_not=[r"CartesianProduct", r"SortMergeJoin"],
        materialize=True,
    )

    # 34b. TF-IDF keywords: tf is a map-combinable partial+final
    # aggregate; the idf dim join must not go cartesian; the top-k window
    # partitions by doc_id (no global single-partition window over the
    # corpus)
    check(
        "tf_idf_keywords_shape",
        allq["tf_idf_keywords"](spark, SF_DIR),
        must=[r"HashAggregate", r"Window", r"Scan parquet"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 34a. Histogram-quantile sketch: the corpus reaches exactly one
    # bounded-output aggregate (partial+final over bin ids); the window
    # and every join downstream run on bin rows, so no corpus-sized sort
    # or cartesian anywhere
    check(
        "histogram_quantiles_bounded_sketch",
        allq["histogram_quantiles"](spark, SF_DIR),
        must=[r"HashAggregate", r"Scan parquet"],
        must_not=[r"CartesianProduct"],
        materialize=True,
    )

    # 34. HyperLogLog sketch: ONE corpus-sized aggregate (partial+final
    # HashAggregate over (source, register), bounded output); everything
    # after it — merge, estimate, truth join — is sketch-sized; nothing
    # cartesian and no corpus re-shuffle beyond the truth demo branch
    check(
        "hll_bounded_sketch_agg",
        allq["hll_distinct_texts"](spark, SF_DIR),
        must=[r"HashAggregate", r"Scan parquet"],
        must_not=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        materialize=True,
    )

    # split_assign: a split decision must cost NOTHING beyond the scan —
    # pure map-side projection, zero exchanges, zero joins, no Python
    check(
        "split_assign_map_only",
        allq["split_assign"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[
            r"Join",
            r"HashAggregate",
            r"Window",
            r"MapInPandas",
            r"ArrowEvalPython",
            r"Sort\b",
        ],
        exact_exchanges=0,
    )

    # split_leakage_audit: the md5 gram/winnow pass (the dominant map
    # cost) runs ONCE into the localCheckpoint barrier — both join sides
    # read the materialized guarded table (ExistingRDD); downstream is
    # one fp equi-join plus ONE per-doc aggregate (the left join lets
    # totals, shared counts and train-doc counts share it) — nothing
    # cartesian, no second corpus scan, no Python
    check(
        "split_leakage_single_fingerprint_pass",
        allq["split_leakage_audit"](spark, SF_DIR),
        must=[r"ExistingRDD", r"HashAggregate|SortAggregate"],
        must_not=[
            r"Scan parquet",
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
        ],
        max_exchanges=3,
        materialize=True,
    )

    # mixture_plan_report: the corpus reaches exactly ONE bounded
    # (source-cardinality) aggregate; the 1-row totals frame rides back
    # as a broadcast (BroadcastNestedLoopJoin is the intended 1-row
    # cross shape); nothing cartesian, no Python, no keyed corpus shuffle
    check(
        "mixture_plan_one_bounded_agg",
        allq["mixture_plan_report"](spark, SF_DIR),
        must=[r"HashAggregate", r"BroadcastNestedLoopJoin"],
        must_not=[
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"SortMergeJoin",
        ],
        max_exchanges=3,
        materialize=True,
    )

    # pq_codes: PQ encoding is a pure narrow projection — codebooks ride
    # as literals, so the corpus is never joined, shuffled, or handed to
    # Python; zero exchanges at any corpus size
    check(
        "pq_codes_map_only",
        allq["pq_codes"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[
            r"Join",
            r"HashAggregate",
            r"Window",
            r"MapInPandas",
            r"ArrowEvalPython",
            r"Sort\b",
        ],
        exact_exchanges=0,
    )

    # ann_pq_topk: the ADC scan feeds a per-partition heap
    # (TakeOrderedAndProject), the exact re-rank is a SECOND heap over the
    # bounded shortlist — never a corpus Sort, never a join, zero
    # exchanges; the self-exclusion filter reaches the parquet scan
    check(
        "ann_pq_topk_two_heaps_zero_exchange",
        allq["ann_pq_topk"](spark, SF_DIR),
        must=[
            r"TakeOrderedAndProject[\s\S]*TakeOrderedAndProject",
            r"PushedFilters: \[[^\]]*Not\(EqualTo\(vec_id,0\)\)",
        ],
        must_not=[r"Join", r"MapInPandas", r"ArrowEvalPython", r"Sort\b"],
        exact_exchanges=0,
    )

    # ann_ivfpq_topk: the composed FAISS-style index keeps BOTH bounds in
    # one plan — coarse probe filter and PQ/ADC all narrow (scan ->
    # filter -> project), shortlist + re-rank as two per-partition heaps;
    # zero exchanges, no joins, no Python at any corpus size
    check(
        "ann_ivfpq_topk_probe_filter_two_heaps",
        allq["ann_ivfpq_topk"](spark, SF_DIR),
        must=[
            r"TakeOrderedAndProject[\s\S]*TakeOrderedAndProject",
            r"Filter",
        ],
        must_not=[r"Join", r"MapInPandas", r"ArrowEvalPython", r"Sort\b"],
        exact_exchanges=0,
    )

    # canonical_link_dedup: one vectorized DOM extraction pass (the
    # MapInPandas stage IS the design), one aggregate on the canonical
    # key — exactly one exchange, no joins.  min(string) has an immutable
    # aggregation buffer, so Spark compiles a SortAggregate (partial
    # map-side like hash agg; its Sorts are per-partition on the group
    # key, never a corpus-global order)
    check(
        "canonical_dedup_one_extraction_one_agg",
        allq["canonical_link_dedup"](spark, SF_DIR),
        must=[r"MapInPandas", r"SortAggregate|HashAggregate"],
        must_not=[r"Join", r"Sort\b.*global=true", r"Window"],
        exact_exchanges=1,
    )

    # pq_residual_report: coarse assignment, the inlined centroid-vector
    # lookup, the residual subtraction and BOTH encodes chain as narrow
    # projections — zero exchanges, zero joins, no Python
    check(
        "pq_residual_map_only",
        allq["pq_residual_report"](spark, SF_DIR),
        must=[r"Scan parquet"],
        must_not=[
            r"Join",
            r"HashAggregate",
            r"Window",
            r"MapInPandas",
            r"ArrowEvalPython",
            r"Sort\b",
        ],
        exact_exchanges=0,
    )

    # corpus_zipf_report: one vocabulary-sized map-combined aggregate,
    # a top-K per-partition heap (never a corpus sort), and the
    # rank/regression windows ride the heap's single-partition output —
    # exactly ONE exchange end to end, no joins, no Python
    check(
        "zipf_one_vocab_exchange_heap_topk",
        allq["corpus_zipf_report"](spark, SF_DIR),
        must=[r"TakeOrderedAndProject", r"HashAggregate"],
        must_not=[r"Join", r"MapInPandas", r"ArrowEvalPython"],
        exact_exchanges=1,
    )

    # eval_holdout_sample: one per-stratum ranking window (ONE exchange
    # keyed on lang) + a rank filter — no joins, no Python, output
    # bounded at |strata| * quota rows
    check(
        "eval_holdout_one_stratum_window",
        allq["eval_holdout_sample"](spark, SF_DIR),
        must=[r"Window"],
        must_not=[r"Join", r"MapInPandas", r"ArrowEvalPython", r"HashAggregate"],
        exact_exchanges=1,
    )

    # keyword_tag_report: the dictionary broadcasts (config artifact), so
    # the token stream is cut to dictionary matches MAP-SIDE before
    # anything shuffles — BroadcastHashJoin required; the two exchanges
    # are the distinct-term grain and the (doc, tag) rollup, BOTH over
    # dictionary-hit volume (bounded by the dictionary), never raw
    # token volume; no Python
    check(
        "keyword_tag_broadcast_dict_hit_volume_only",
        allq["keyword_tag_report"](spark, SF_DIR),
        must=[r"BroadcastHashJoin", r"HashAggregate"],
        must_not=[
            r"SortMergeJoin",
            r"CartesianProduct",
            r"MapInPandas",
            r"ArrowEvalPython",
        ],
        exact_exchanges=2,
    )

    # langid_confusion_report: scoring/argmax narrow map-side, ONE
    # bounded (lang x guess) aggregate, share window over those few
    # cells — a single corpus-side exchange, no joins, no Python
    check(
        "langid_confusion_one_bounded_agg",
        allq["langid_confusion_report"](spark, SF_DIR),
        must=[r"HashAggregate", r"Window"],
        must_not=[r"Join", r"MapInPandas", r"ArrowEvalPython"],
        max_exchanges=2,
    )

    # robots_txt_filter: a frontier filters in place — one vectorized
    # decision pass, ZERO exchanges, no joins
    check(
        "robots_filter_map_only",
        allq["robots_txt_filter"](spark, SF_DIR),
        must=[r"MapInPandas"],
        must_not=[r"Join", r"HashAggregate", r"Window", r"Sort\b"],
        exact_exchanges=0,
    )

    # crawl_frontier_plan: the robots gate stays the zero-shuffle
    # vectorized pass (doc_id/host ride through keep_cols — no join back
    # onto the url), PageRank contributes its iteration exchanges (the
    # 1-row count crossJoin is the intended BroadcastNestedLoopJoin —
    # pagerank's own gate), the rank join is a doc_id equi-join (nothing
    # cartesian), the politeness budget is ONE host-keyed window; the
    # exchange budget is PageRank's k-iteration chain + the gate join +
    # the window — bounded, never quadratic
    check(
        "frontier_plan_composition",
        allq["crawl_frontier_plan"](spark, SF_DIR),
        must=[r"MapInPandas", r"Window"],
        must_not=[r"CartesianProduct"],
        max_exchanges=14,
        materialize=True,
    )

    # image_ahash_neardup: same contract as the text SimHash gate — the
    # decode+hash is narrow (no Python), candidates come from ONE
    # equi-join on the (block, value) key, nothing all-pairs/cartesian,
    # no global sort; verify lookup semi-joined and unhinted (source audit)
    check(
        "image_ahash_block_join_only",
        allq["image_ahash_neardup"](spark, SF_DIR),
        must=[r"HashAggregate"],
        must_not=[
            r"MapInPandas",
            r"ArrowEvalPython",
            r"CartesianProduct",
            r"Sort\b.*global=true",
        ],
        materialize=True,
    )

    # --- source-level broadcast-hint audit ------------------------------
    # Every F.broadcast() in the engine must sit on a frame whose size is
    # BOUNDED BY CONSTRUCTION (a fixed suite, a 1-row aggregate, a capped
    # token set, a user-supplied query set) — never on a frame whose size
    # is a data-dependent fraction of the corpus (dup labels, contaminated
    # ids, per-doc size lookups: those are left unhinted for AQE's runtime
    # size decision).  The allowlist pins each justified site by a line
    # substring; a new F.broadcast() call fails this gate until it is
    # reviewed and added here with its boundedness argument.
    BROADCAST_ALLOWLIST = {
        "readability_spark/spark/textops.py": [
            ("F.broadcast(q)", "ANN query set — user-supplied, small by contract"),
            (
                "F.broadcast(cb)",
                "ivf_train per-iteration codebook collapsed to ONE row of K "
                "structs — K is a contract constant, not data-dependent",
            ),
        ],
        "readability_spark/spark/modelscore.py": [
            (
                "F.broadcast(wrow)",
                "classifier_train weight row — exactly ONE row of D+1 "
                "doubles (D a contract constant) per iteration",
            ),
            (
                "F.broadcast(g)",
                "classifier_train gradient — a global aggregate's single "
                "output row (D+2 values) regardless of corpus size",
            ),
            (
                "F.broadcast(weights)",
                "classifier_score_trained serving weights — the same ONE "
                "row, projected to c0..c{D-1}, cb",
            ),
        ],
        "__spark_entry__.py": [
            ("F.broadcast(bench)", "benchmark suite — capped at doc_id < 500"),
            ("F.broadcast(probe)", "CMS probe token list — fixed 31 rows"),
            ("F.broadcast(cuts)", "per-lang sampled quantile cutoffs — rows = |langs| x 2"),
            (
                "F.broadcast(rules)",
                "URL blocklist / keyword-tag dictionaries — fixed config "
                "artifacts, never corpus-derived (two sites)",
            ),
            ("F.broadcast(nrow)", "single-row corpus count"),
            ("F.broadcast(q)", "single ANN query vector"),
            ("F.broadcast(qv)", "ann_recall_report eval query vector — 1 row"),
            ("F.broadcast(thr)", "single-row sketch-derived threshold"),
            ("F.broadcast(hot)", "stop-token set — bounded by 1/df_cap tokens"),
            ("F.broadcast(best", "single-row argmax pair (LIMIT 1) per training round"),
            ("F.broadcast(c)", "explicit dim-broadcast demo (join_customer_orders)"),
            (
                "F.broadcast(s)",
                "mixture_plan_report totals — a global aggregate's single "
                "output row (2 values) regardless of corpus size",
            ),
        ],
    }
    audit_files = [
        p
        for pat in ("readability_spark/**/*.py", "scripts/*.py", "__spark_entry__.py", "bench.py")
        for p in REPO.glob(pat)
    ]
    for path in audit_files:
        rel = str(path.relative_to(REPO))
        allowed_subs = [a for a, _ in BROADCAST_ALLOWLIST.get(rel, [])]
        for i, line in enumerate(path.read_text().splitlines(), 1):
            # real call sites only: prose like "an F.broadcast() that"
            # (docstrings/comments) has empty parens or a leading #
            if not re.search(r"F\.broadcast\([^)]", line) or line.lstrip().startswith("#"):
                continue
            if not any(sub in line for sub in allowed_subs):
                failures.append(
                    f"broadcast_hint_audit: {rel}:{i} has an unreviewed "
                    f"F.broadcast() — add it to the allowlist with a "
                    f"boundedness justification: {line.strip()[:90]}"
                )
    sections.append(
        (
            "broadcast_hint_audit",
            "source-level audit: every F.broadcast() site matched the "
            "bounded-by-construction allowlist\n"
            + "\n".join(
                f"  {rel}: {sub} — {why}"
                for rel, allowed in BROADCAST_ALLOWLIST.items()
                for sub, why in allowed
            ),
        )
    )

    out = ["# BENCH/PLANS.md — physical-plan audit", ""]
    out.append(
        "Generated by `tools/check_plans.py` (asserts pushdown / pruning / "
        "broadcast / partial-agg properties, then records the plans)."
    )
    for name, plan in sections:
        out += ["", f"## {name}", "", "```", plan.strip(), "```"]
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "PLANS.md").write_text("\n".join(out) + "\n")

    spark.stop()
    if failures:
        print("PLAN CHECK FAILURES:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print(f"all {len(sections)} plan checks passed; plans written to BENCH/PLANS.md")


if __name__ == "__main__":
    main()

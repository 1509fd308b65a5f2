"""Physical-plan regression tests: the properties that make queries
scale are asserted directly on the executed/optimized plans, so a
refactor that silently drops a pushdown or broadcasts the wrong side
fails CI rather than a production run.

These inspect plans only (no data correctness — the oracle suite owns
that), so they run at the smallest SF.
"""

import re

import pytest

from data_engineering_capstone_project_spark.plans import QUERIES
from tests.conftest import SF_SMALL


def _cache_scans(plan: str, col: str) -> int:
    """Count InMemoryTableScan lines whose output mentions ``col`` —
    i.e. reads of ONE SPECIFIC cached frame. A plain count of
    "InMemoryTableScan" is order-dependent across the suite: Spark's
    CacheManager substitutes ANY same-result cached fragment into new
    plans, so a frame another test persisted (e.g. the prefix-filter
    token explode) can appear NESTED inside this query's own cached
    subtree — a beneficial runtime reuse that must not fail a plan
    assertion."""
    return sum(
        1
        for line in plan.splitlines()
        if "InMemoryTableScan" in line and col in line
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["pricing_summary", "top5_nations_ytd", "top_nations_by_month",
     "repeat_buyers_intersect"],
)
def test_date_filters_reach_parquet_scan(spark, name):
    """Range-form date predicates must appear as PushedFilters on the
    scan (row-group pruning at 100 TB), not only as post-scan Filters."""
    plan = _plan(QUERIES[name](spark, SF_SMALL))
    assert "PushedFilters: [" in plan
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert any(
        ("GreaterThan" in line or "LessThan" in line) for line in pushed
    ), f"no range filter pushed in {name}: {pushed}"


@pytest.mark.parametrize(
    "name", ["visits_by_region", "top5_nations_ytd", "top_nations_by_month"]
)
def test_dim_joins_broadcast(spark, name):
    """Fact-dim joins must be broadcast-hash: the fact side never
    shuffles on the join key."""
    plan = _plan(QUERIES[name](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pricing_summary_scan_prunes_columns(spark):
    """The 16-column lineitem scan must read only the 7 referenced
    columns (column pruning at the parquet reader)."""
    plan = _plan(QUERIES["pricing_summary"](spark, SF_SMALL))
    scan_lines = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ]
    assert scan_lines, "no ReadSchema in plan"
    assert "l_quantity" in scan_lines[0]
    for unused in ("l_orderkey", "l_partkey", "l_suppkey", "l_shipmode"):
        assert unused not in scan_lines[0]


def test_aggregations_are_partial_then_final(spark):
    """Group-bys must combine map-side: two HashAggregates around one
    Exchange, so the shuffle carries partial states, not raw rows."""
    plan = _plan(QUERIES["visits_by_year"](spark, SF_SMALL))
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_topk_uses_window_group_limit(spark):
    """Per-group top-k must push the limit below the shuffle
    (WindowGroupLimit), never rank the full group set."""
    plan = _plan(QUERIES["top_nations_by_month"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan


def test_lsh_self_join_is_single_signature_subtree(spark):
    """The LSH banding must be one explode projection self-joined over
    STAGED signatures: both join sides read the persisted signature
    table (InMemoryTableScan), so the shingle+min-agg subtree — and the
    raw corpus scan behind it — is computed once, not once per side
    and never 2*bands times."""
    plan = _plan(QUERIES["minhash_lsh_pairs"](spark, SF_SMALL))
    # Each InMemoryTableScan prints the (shared) cached child plan
    # beneath it, so "Scan parquet" still appears textually — the
    # InMemoryRelation is computed once at runtime regardless.
    assert _cache_scans(plan, "mh_0") == 2, plan


def test_simhash_pairs_join_on_band_not_lang(spark):
    """SimHash pair generation must equi-join on the 16-bit band value
    (banded Hamming blocking — linear shuffle), never on lang alone
    (quadratic within language). The band columns must be join keys and
    the signature subtree must be staged like the LSH one."""
    plan = _plan(QUERIES["simhash_near_dups"](spark, SF_SMALL))
    join_lines = [
        line for line in plan.splitlines()
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line
        or "BroadcastHashJoin" in line
    ]
    banded = [line for line in join_lines if "_band_v" in line]
    assert banded, f"no join keyed on band value:\n{join_lines}"
    assert _cache_scans(plan, "sig#") == 2, plan


def test_ivf_corpus_assignment_is_map_only(spark):
    """IVF cell assignment must be a pure projection over literal
    centroids: zero Exchange and zero Window on the corpus side (the
    old crossJoin+row_number formulation shuffled the whole corpus
    by vector id — a full re-partition of 100 TB to compute an argmin
    over 8 candidates)."""
    from data_engineering_capstone_project_spark.operators.vector_index import (
        assign_cells,
        sampled_centroids,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cents = sampled_centroids(emb, 8)
    plan = _plan(assign_cells(emb, cents))
    assert plan.count("Exchange") == 0, plan[:2000]
    assert plan.count("Window") == 0, plan[:2000]


def test_q3_shape_broadcasts_and_takes_ordered(spark):
    """The Q3-shaped 3-table join must broadcast the filtered customer
    side, push both date filters to the scans, and produce the top-10
    via TakeOrderedAndProject — never a global sort of all groups."""
    plan = _plan(QUERIES["shipping_priority_q3"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("LessThan" in l for l in pushed), pushed
    assert any("GreaterThan" in l for l in pushed), pushed


def test_q5_multijoin_shape(spark):
    """TPC-H Q5 (r13 literal-dim shape): the Asia nation keys are a
    plan-build literal, so the region constraint must reach BOTH fact
    prefilters as an In() pushed into the parquet scans (the r12
    broadcast-join prefilter never pruned the scans); the order-date
    range must push too; the extra c_nationkey = s_nationkey
    constraint must be a join key (never a post-join cross product);
    and the supplier join must consume the PAIR AGGREGATE, not fact
    rows — pinned as: a hashpartitioning exchange on
    (l_suppkey, c_nationkey) exists only above a HashAggregate."""
    plan = _plan(QUERIES["local_supplier_volume_q5"](spark, SF_SMALL))
    assert "In(c_nationkey, [" in plan
    assert "In(s_nationkey, [" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the supplier-side constraint joins on both keys together
    assert "s_suppkey" in plan and "s_nationkey" in plan
    # pre-aggregated pairs feed the supplier join: the pair exchange
    # carries the aggregate (sum#... / rev_fp), never raw fact rows
    assert "hashpartitioning(l_suppkey" in plan
    # Ordered-substring pin (r14 advice fix: the old adjacent-line
    # regex false-failed on explain-layout/AQE formatting drift): the
    # operator printed under the l_suppkey exchange — before any OTHER
    # exchange — must include a HashAggregate, i.e. the pair-aggregate
    # feeds that exchange, never raw fact rows.
    ex_at = plan.index("Exchange hashpartitioning(l_suppkey")
    below = plan[ex_at + 1 :]
    nxt_ex = below.find("Exchange ")
    segment = below if nxt_ex == -1 else below[:nxt_ex]
    assert "HashAggregate" in segment, segment


def test_funnel_single_shuffle(spark):
    """conversion_funnel: the window and the per-user aggregate must
    share ONE hash partitioning on user_id — exactly one exchange over
    the events relation (plus the 1-row final rollup)."""
    plan = _plan(QUERIES["conversion_funnel"](spark, SF_SMALL))
    ex = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning(user_id" in line
    ]
    assert len(ex) == 1, f"expected 1 user_id exchange, got {len(ex)}"


def test_q10_topk_no_full_sort(spark):
    """Q10's top-20 must be TakeOrderedAndProject (per-partition heap +
    driver merge), never a global sort of the grouped output; the
    returnflag filter must reach the lineitem scan."""
    plan = _plan(QUERIES["returned_revenue_q10"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q19_disjunction_pushes_to_both_scans(spark):
    """Q19's OR-of-conjunctions must push per-side envelopes into BOTH
    parquet scans (an unpushed disjunction means full scans of lineitem
    and part at 100 TB)."""
    plan = _plan(QUERIES["disjunctive_revenue_q19"](spark, SF_SMALL))
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert len(pushed) >= 2
    assert all("Or(" in line for line in pushed), pushed


def test_bucketed_fact_join_no_exchange(spark):
    """revenue_by_priority_bucketed: with both facts co-bucketed on the
    orderkey, the join must run with ZERO Exchange below it — the only
    exchange in the whole plan is the tiny partial->final agg on
    (priority, year). Broadcast is disabled so the test exercises the
    shuffle path the bucketing removes (at 100 TB neither fact
    broadcasts)."""
    from data_engineering_capstone_project_spark.plans.relational import (
        bucketed_orderkey_tables,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, orders = bucketed_orderkey_tables(spark, SF_SMALL)
        joined = li.select("l_orderkey", "l_extendedprice").join(
            orders.select("o_orderkey", "o_orderpriority"),
            li.l_orderkey == orders.o_orderkey,
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        # The full registered query: the ONLY exchange is the final agg.
        full = _plan(QUERIES["revenue_by_priority_bucketed"](spark, SF_SMALL))
        n_ex = full.count("Exchange ")
        assert n_ex <= 1, f"expected <=1 Exchange, got {n_ex}:\n{full}"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


@pytest.mark.parametrize(
    "name", ["volume_shipping_q7", "promo_revenue_q14"]
)
def test_tpch_extras_push_ship_date_range(spark, name):
    """Q7/Q14: the l_shipdate range must reach the lineitem scan as
    PushedFilters — it is the dominant data-reduction axis at 100 TB."""
    plan = _plan(QUERIES[name](spark, SF_SMALL))
    pushed = [
        line
        for line in plan.splitlines()
        if "PushedFilters" in line and "l_shipdate" in line
    ]
    assert any(
        "GreaterThanOrEqual" in line and "LessThan" in line for line in pushed
    ), f"no shipdate range pushed in {name}: {pushed}"


def test_q21_single_pass_over_fact(spark):
    """sole_late_supplier_q21 must scan lineitem exactly ONCE: the
    per-order counts come from window functions over the (order,
    supplier) aggregate, not a self-join that would re-run the fact
    join (column pruning differences defeat Exchange reuse there)."""
    df = QUERIES["sole_late_supplier_q21"](spark, SF_SMALL)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # One lineitem leaf == one occurrence of a lineitem-only column in a
    # Relation line (the optimized plan prints relations by schema).
    n_scans = sum(
        "l_linenumber" in line
        for line in optimized.splitlines()
        if "Relation" in line
    )
    assert n_scans == 1, optimized


def test_q11_threshold_is_broadcast_not_resort(spark):
    """top_revenue_parts_q11: the global-revenue threshold joins the
    per-part aggregate via a broadcast of ONE row — no sort, no shuffle
    of the per-part side beyond its own groupBy."""
    plan = _plan(QUERIES["top_revenue_parts_q11"](spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_weighted_sample_is_map_only(spark):
    """quality_weighted_sample: deterministic sampling must be a pure
    map-side filter — zero Exchange (the whole point of hash-keyed
    sampling over rand() + shuffle-based approaches)."""
    plan = _plan(QUERIES["quality_weighted_sample"](spark, SF_SMALL))
    assert "Exchange" not in plan, plan


def test_sequence_packing_single_shard_shuffle(spark):
    """sequence_packing: exactly ONE Exchange (hash on shard for the
    running-count window); the token counting stays map-side."""
    plan = _plan(QUERIES["sequence_packing"](spark, SF_SMALL))
    n_ex = plan.count("Exchange ")
    assert n_ex == 1, f"expected 1 Exchange, got {n_ex}:\n{plan}"


def test_dedup_incremental_never_pairs_existing_with_existing(spark):
    """dedup_incremental: the band join's two inputs must be the
    complementary pmod filters (new batch on one side, existing corpus
    on the other) — the old x old pair term, the dominant cost at a
    100 TB corpus, must not exist in the plan."""
    df = QUERIES["dedup_incremental"](spark, SF_SMALL)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    lines = [l for l in opt.splitlines() if "pmod" in l]
    pos = [l for l in lines if "= 7" in l and "NOT" not in l]
    neg = [l for l in lines if "NOT (pmod" in l]
    assert pos and neg, opt


def test_embedding_projection_is_map_only(spark):
    """The 64->16 random projection must be a pure per-row transform:
    ZERO Exchange anywhere in the plan — at 100 TB the projection cost
    is exactly one scan, never a shuffle."""
    plan = _plan(QUERIES["embedding_projection"](spark, SF_SMALL))
    assert "Exchange" not in plan, plan


def test_bm25_topk_uses_take_ordered(spark):
    """BM25's final top-10 must be TakeOrderedAndProject (per-partition
    heap + driver merge of 10), never a global Sort of all scored
    docs."""
    plan = _plan(QUERIES["bm25_topk"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan
    # df/avgdl sides are tiny aggregates: they must broadcast, not
    # shuffle the per-(doc, term) frame a second time.
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_distributed_quartiles_no_single_partition_on_data(spark):
    """The exact global ranking must never funnel the DATA through one
    task: SinglePartition exchanges may appear only above the tiny
    per-partition-counts frames (bounded by the partition count), and
    no Window may run over the full spend frame. The cached ranged
    frame must be the single materialization both consumers read."""
    plan = _plan(QUERIES["customer_spend_quartiles_distributed"](spark, SF_SMALL))
    lines = plan.splitlines()
    # Full-data branch: the InMemoryTableScan serving (custkey, spend)
    # must not sit under any SinglePartition exchange.
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            subtree = "\n".join(lines[i : i + 8])
            assert "_pid" in subtree or "_cnt" in subtree or "count(" in subtree, (
                f"SinglePartition over a data-bearing frame:\n{subtree}"
            )
    # The heavy frame is served from cache, not recomputed per consumer.
    assert plan.count("InMemoryTableScan") >= 2
    # No Window over the spend columns (only the 32-row offsets window).
    win_lines = [l for l in lines if "Window " in l or l.strip().startswith("Window")]
    assert all("spend_fp" not in l for l in win_lines), win_lines


def test_token_budget_select_single_data_exchange(spark):
    """The budget cut's only full-data shuffle is the hash on the
    quality bucket; SinglePartition exchanges may sit only above
    bucket-grain (<=1001 rows) or scalar frames."""
    plan = _plan(QUERIES["token_budget_select"](spark, SF_SMALL))
    data_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "_groupingexpression" not in l
    ]
    assert len(data_exchanges) == 1, data_exchanges


def test_doc_chunks_is_map_only(spark):
    """Overlapping chunking must be a pure generator over the scan:
    ZERO Exchange — at 100 TB chunking costs exactly one pass and the
    output inherits the input's partitioning."""
    plan = _plan(QUERIES["doc_chunks"](spark, SF_SMALL))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # sequence+explode, not a join on indexes


def test_repeated_passages_single_corpus_exchange(spark):
    """Passage-duplication detection: explode is map-side; the only
    corpus-sized Exchange carries (passage, partial agg). The final
    top-50 must be TakeOrderedAndProject, never a global Sort."""
    plan = _plan(QUERIES["repeated_passages"](spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") <= 2  # partial count +
    # count_distinct expansion; both keyed on passage, no doc x doc term
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_bpe_pair_counts_second_stage_is_vocab_sized(spark):
    """BPE pair statistics: the corpus-sized stage is ONE explode+agg
    to the distinct-word table; pair explosion happens after that
    aggregate (vocab-sized, sublinear in corpus). Assert the plan has
    exactly the two hash aggregates' Exchanges and the final top-40 is
    a TakeOrdered."""
    plan = _plan(QUERIES["bpe_pair_counts"](spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_nearest_centroid_assign_is_map_only_after_centroids(spark):
    """Rocchio assignment: centroids are collected literals, so the
    corpus-side plan is scan -> project(distances) -> final confusion
    agg. Exactly ONE Exchange (the (label, assigned) partial counts);
    no join anywhere."""
    plan = _plan(QUERIES["nearest_centroid_assign"](spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan, plan


def test_trending_event_types_single_exchange_and_group_limit(spark):
    """Sliding-window trending: the corpus-sized Exchange carries the
    aggregated ((window, type), partial count) rows; the top-3 rank
    must plan as WindowGroupLimit over that bounded grid."""
    plan = _plan(QUERIES["trending_event_types"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_contrastive_negatives_is_map_only(spark):
    """Negative sampling must exploit dense ids: ZERO Exchange, no
    join — the negative id is computed, never looked up."""
    plan = _plan(QUERIES["contrastive_negatives"](spark, SF_SMALL))
    assert "Exchange" not in plan, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan, plan


def test_cohort_retention_single_corpus_exchange(spark):
    """Cohort retention: the raw-events Exchange is the (user, week)
    distinct; cohort assignment reuses the user partitioning (a window
    over already-distinct rows), and the final aggregate runs on the
    bounded (cohort, age) grid."""
    plan = _plan(QUERIES["weekly_cohort_retention"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no self-join back to events


def test_kmeans_refine_assignment_is_map_only(spark):
    """One Lloyd iteration: assignment against literal centroids never
    shuffles the corpus — the ONLY Exchange carries the (cluster, dim)
    fixed-point partial sums, and no join touches the embeddings."""
    plan = _plan(QUERIES["kmeans_refine"](spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan, plan


def test_bigram_fluency_no_occurrence_level_join(spark):
    """LM scoring joins the per-(doc, bigram) DISTINCT frame to the
    bigram model — never the raw occurrence stream — and the model
    side is built by linear aggs: no cartesian, no global sort."""
    plan = _plan(QUERIES["bigram_fluency"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    # the per-(doc_id, bg) partial aggregation must exist below the join
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_prefix_filter_join_globally_sorts_vocab_only(spark):
    """Prefix filtering may globally rank the VOCABULARY (distinct
    tokens — bounded by token entropy) but must never single-partition
    anything doc-shaped: the only SinglePartition window in the plan
    has to sit above the distinct-token aggregate, and candidates must
    come from an equi-join, never a cartesian."""
    plan = _plan(QUERIES["prefix_filter_jaccard"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    # Every SinglePartition Exchange must sit directly above the
    # df-count aggregate (keys=[tok...]), i.e. rows entering it are
    # DISTINCT TOKENS, never docs/pairs. (The persisted isets subtree
    # prints once per reference, so the occurrence count is a printing
    # artifact — the invariant is what feeds each occurrence.)
    lines = plan.splitlines()
    sp_idx = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert sp_idx, plan
    for i in sp_idx:
        below = "\n".join(lines[i + 1 : i + 6])
        assert "keys=[tok" in below, plan


def test_revenue_trend_regression_runs_on_nation_grain(spark):
    """Grouped OLS: moments must aggregate at (nation, month) then
    nation grain — never a per-order window — and the nation dim must
    broadcast."""
    plan = _plan(QUERIES["revenue_trend_by_nation"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_top_event_paths_single_user_exchange(spark):
    """Path mining: sessionize + head-3 + path agg must reuse ONE
    user_id Exchange; the top-20 must be a TakeOrdered over the
    bounded path table, not a global sort."""
    plan = _plan(QUERIES["top_event_paths"](spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_event_value_drift_single_corpus_exchange(spark):
    """Drift detection: the corpus contributes one min/max agg and one
    bucket-count agg; the chi-square arithmetic runs on the bounded
    bucket frame (broadcast totals, no sort-merge join)."""
    plan = _plan(QUERIES["event_value_drift"](spark, SF_SMALL))
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the bucket-counts frame is staged and read by BOTH consumers
    # (totals + output) — without it the corpus aggregation runs twice
    assert _cache_scans(plan, "n_ref") == 2, plan


def test_doc_pagerank_rounds_are_linear_joins(spark):
    """PageRank rounds must be edge-rank equi-joins over the
    checkpointed edge list — no cartesian, no global sort, and the LSH
    candidate subtree must appear only via the checkpoint (a scan),
    never re-expanded per round."""
    plan = _plan(QUERIES["doc_pagerank"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    # the raw corpus never re-enters the iteration: post-checkpoint
    # rounds read "Scan ExistingRDD", not the documents parquet
    assert "documents.parquet" not in plan, plan


def test_bigram_collocations_marginals_from_staged_bigrams(spark):
    """Collocation lift: the corpus reduces once to the staged
    (bigram, count) table; marginals, total, and the top-20 all read
    that cache (4 InMemoryTableScans), and the final 20 come from a
    TakeOrdered, not a global sort."""
    plan = _plan(QUERIES["bigram_collocations"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan
    assert _cache_scans(plan, "c12") == 4, plan
    assert "CartesianProduct" not in plan, plan


def test_event_rate_anomalies_window_is_grid_sized(spark):
    """3-sigma anomaly flags: the global time-ordered window runs over
    the RANGE-SIZED resample grid (SinglePartition is acceptable there
    — the grid scales with the time range, not event volume); the
    corpus itself contributes only the bucket-count aggregate, and the
    anomaly predicate is pure integer arithmetic (no sqrt/division in
    the plan)."""
    plan = _plan(QUERIES["event_rate_anomalies"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert "SQRT" not in plan.upper(), plan
    # exactly one corpus-sized Exchange: the bucket-count partial agg
    assert plan.count("Exchange hashpartitioning(bucket_start") == 1, plan


def test_ann_ivfpq_corpus_side_stays_map_only(spark):
    """IVF+PQ: the corpus axis must see NO SortMergeJoin and NO
    cartesian product — cell assignment and PQ encode are one fused
    map-only projection, the probe side arrives via broadcast, and the
    only corpus Exchange is the (query, neighbor) partial-agg. At
    100 TB any sort-merge or cross term here would shuffle raw
    vectors the index exists to avoid."""
    plan = _plan(QUERIES["ann_ivfpq_topk"](spark, SF_SMALL))
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # One BroadcastNestedLoopJoin IS expected: the query-side
    # codebook expansion (queries x 80 codewords, both bounded by the
    # index geometry) is a deliberate broadcast cross — see
    # _pq_query_dists. More than one would mean a corpus-side cross.
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "BroadcastHashJoin" in plan, plan


@pytest.mark.parametrize(
    "name",
    ["train_val_test_split", "pq_encode_incremental", "weak_label_votes"],
)
def test_map_only_pipeline_ops_have_no_exchange(spark, name):
    """The split assignment and the incremental PQ encode are pure
    per-row projections (hash arithmetic / literal-codebook argmin
    over the ingest batch): ZERO Exchange — at 100 TB their cost is
    exactly one scan of their input."""
    plan = _plan(QUERIES[name](spark, SF_SMALL))
    assert "Exchange" not in plan, plan


def test_kmv_sketch_uses_window_group_limit(spark):
    """The per-type k-smallest must plan as WindowGroupLimit (running
    top-k per partition), never a full per-group sort of all distinct
    hashes."""
    plan = _plan(QUERIES["kmv_distinct_users"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan, plan


def test_phrase_search_restricts_postings_via_broadcast(spark):
    """Phrase search must restrict the positional postings to the
    query words with a broadcast join BEFORE the adjacency self-join —
    the index-read shape; a cartesian or unrestricted corpus self-join
    would defeat the point."""
    plan = _plan(QUERIES["phrase_search_positional"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_span_corruption_is_map_only(spark):
    """Span corruption must be a pure per-row projection (tokenize +
    block transform inside codegen): ZERO Exchange — at 100 TB the
    corruption pass costs one read and one write."""
    plan = _plan(QUERIES["span_corruption_examples"](spark, SF_SMALL))
    assert "Exchange" not in plan, plan


def test_co_ordered_parts_prefilter_is_broadcast_semi(spark):
    """The Apriori min-support prefilter must reach the pairing input
    as a broadcast LEFT SEMI join on the catalog-sized frequent-part
    set — if it ever degrades to a shuffled join (or disappears), the
    pair explosion runs over the unfiltered corpus again (the
    measured 4.2@40x trap). The pair self-join itself must stay an
    equi-join on l_orderkey, never a cartesian."""
    plan = _plan(QUERIES["co_ordered_parts"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q13_filter_pushed_to_orders_scan(spark):
    """Q13's non-join predicate must be pushed into the orders
    parquet scan (PushedFilters) — NOT evaluated after the outer
    join, where it would silently drop the zero-order customers that
    anchor the distribution — and the join must remain an outer
    join."""
    df = QUERIES["customer_distribution_q13"](spark, SF_SMALL)
    plan = _plan(df)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderpriority)" in plan or (
        "1-URGENT" in plan.split("LeftOuter")[0]
    ), plan
    assert "LeftOuter" in plan or "LeftOuter" in optimized, plan


def test_kmv_partials_and_merge_use_window_group_limit(spark):
    """Both halves of the merge path — the per-(group, slice) partial
    k-min and the pooled re-rank — must plan as WindowGroupLimit
    (running top-k), never a full sort of the distinct-hash sets."""
    plan = _plan(QUERIES["kmv_merge_parity"](spark, SF_SMALL))
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_contiguous_ids_never_range_partition(spark):
    """The dense-id assembly must stay two-phase (hash shard + grid
    offsets): a global row_number would show up as a rangepartitioning
    Exchange (the single-partition sort trap) — forbidden here."""
    plan = _plan(QUERIES["contiguous_doc_ids"](spark, SF_SMALL))
    assert "rangepartitioning" not in plan, plan
    assert "SinglePartition" in plan  # the GRID-sized offsets window only


def test_heavy_hitters_top20_is_take_ordered(spark):
    """The skew report's top-20 must plan as TakeOrderedAndProject
    (running top-k per partition), never a full sort of the key
    counts."""
    plan = _plan(QUERIES["heavy_hitter_custkeys"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan


def test_pq_delete_tombstones_are_broadcast_anti(spark):
    """Read-time index deletion must stay a broadcast LEFT ANTI join
    of the key-only tombstone frame against the stored codes — a
    shuffled anti join would move the whole index for a handful of
    deletes, and a missing anti join would resurface deleted
    vectors."""
    plan = _plan(QUERIES["ann_pq_topk_after_delete"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_source_distinctive_single_corpus_aggregation(spark):
    """The distinctive-token report's marginals must be derived from
    the persisted (source, token) grid — the corpus explode+agg runs
    ONCE (scoped_persist), and the top-5 plans as WindowGroupLimit.
    Four independent re-explosions of the corpus would be the
    re-scan trap the persist exists to avoid."""
    plan = _plan(QUERIES["source_distinctive_tokens"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan, plan
    assert _cache_scans(plan, "a") >= 3, plan


def test_concurrent_sessions_avoids_inequality_join(spark):
    """The interval-overlap query must run as bounded bucket fan-out
    (explode + partial-agg groupBy), NEVER the naive inequality join
    — whose physical plan would be BroadcastNestedLoopJoin (every
    session tested against every hour). Generate must appear (the
    sequence explode), nested loops and cartesians must not."""
    plan = _plan(QUERIES["concurrent_sessions_by_hour"](spark, SF_SMALL))
    assert "Generate" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cms_lookup_broadcasts_grid_and_takes_ordered(spark):
    """The CMS point-query must join the <=1024-row cells grid as
    BROADCAST (a shuffled join would move the corpus-derived probe
    side for a kilobyte of state) and plan the exact top-10 as
    TakeOrderedAndProject, never a single-partition global window."""
    plan = _plan(QUERIES["cms_user_event_counts"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "window(" not in plan.lower(), plan


def test_orders_profile_single_expand_pass(spark):
    """The profiler's 6 exact distinct counts must run as ONE
    expand-based aggregate pass over orders (Expand in the plan),
    not a scan per column; the unpivot is a driver-free explode."""
    plan = _plan(QUERIES["orders_profile"](spark, SF_SMALL))
    assert "Expand" in plan, plan
    # one corpus leaf: the orders parquet is scanned exactly once
    assert plan.count("Scan parquet") == 1, plan


def test_triangles_cache_edges_and_join_equi(spark):
    """Triangle counting must (1) CACHE the edge list — it feeds four
    consumers (degrees x2, orientation, closing join), and without
    the persist the per-order self-join subtree is silently recomputed
    per reference; (2) attach degrees via BROADCAST joins; (3) keep
    the wedge and closing joins equi-joins — no cartesian. The only
    nested-loop allowed is the declared 1-row n_orders broadcast
    (same pattern as co_ordered_parts)."""
    plan = _plan(QUERIES["copurchase_triangles"](spark, SF_SMALL))
    assert "InMemoryTableScan" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "n_orders" in line, line


def test_bloom_probe_is_map_only_broadcast(spark):
    """The bloom prefilter's probe pass must be ONE orders scan with
    broadcast joins only — the whole point is that membership testing
    never shuffles the fact table. Exactly one orders leaf; no
    SortMergeJoin; no Exchange hashpartitioning on the probe side
    before the single-row aggregate."""
    plan = _plan(QUERIES["bloom_semi_join_orders"](spark, SF_SMALL))
    assert "SortMergeJoin" not in plan, plan
    # exactly one orders leaf; the member set is cached (customer is
    # not re-scanned once per derived frame)
    orders_leaves = [
        l for l in plan.splitlines()
        if "Scan parquet" in l and "orders.parquet" in l
    ]
    assert len(orders_leaves) == 1, plan
    assert "InMemoryTableScan" in plan, plan
    probe_joins = [
        line for line in plan.splitlines() if "Join" in line and "o_custkey" in line
    ]
    for line in probe_joins:
        assert "Broadcast" in line, line


def test_join_size_estimate_never_joins_facts(spark):
    """The pre-flight must join keyed COUNT aggregates, not fact rows:
    both corpus scans collapse through partial HashAggregates before
    any join — asserted by requiring every join input to sit above an
    aggregate, i.e. no join line references raw fact measure columns,
    and the plan carries exactly two fact leaves."""
    plan = _plan(QUERIES["join_size_estimate"](spark, SF_SMALL))
    assert plan.count("Scan parquet") == 2, plan
    # the join happens on the aggregated side: HashAggregate appears
    # BELOW the SortMergeJoin/ShuffledHashJoin inputs, so the payload
    # is (key, count), never lineitem rows
    assert "HashAggregate" in plan, plan


def test_skyline_filters_corpus_via_broadcast(spark):
    """part_price_skyline's corpus pass must be ONE hash agg to the
    size grid plus a broadcast probe back — never a sort or shuffle of
    the part table on anything but the grid agg, and never the
    oracle's quadratic self-join."""
    plan = _plan(QUERIES["part_price_skyline"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # The only window runs over the ~50-row size grid (single
    # partition is the documented bounded-grid exemption); the part
    # table itself is never globally sorted.
    assert plan.count("Exchange hashpartitioning") <= 1


def test_scd2_pit_join_is_equi_not_range(spark):
    """The point-in-time join must be an equi-join on the business key
    with the interval containment as a residual filter — a range/theta
    join on the date would blow up at scale."""
    plan = _plan(QUERIES["scd2_point_in_time"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = [
        line
        for line in plan.splitlines()
        if "Join" in line and "custkey" in line
    ]
    assert joins, f"no custkey equi-join found:\n{plan}"


def test_gap_fill_single_corpus_exchange(spark):
    """events_gap_fill_locf: the (type, bucket) agg is the only
    corpus-sized Exchange; grid build, gap-fill join and LOCF window
    all run at bucket grain."""
    df = QUERIES["events_gap_fill_locf"](spark, SF_SMALL)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # sequence() grid is generated, not shuffled into existence.
    assert "Generate explode" in plan or "Generate" in plan


def test_time_decayed_scores_single_agg_broadcast_anchor(spark):
    """time_decayed_user_scores: one corpus agg on user_id; the anchor
    day arrives as a one-row broadcast, never a shuffle or sort."""
    plan = _plan(QUERIES["time_decayed_user_scores"](spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_k_anonymity_is_one_hash_agg(spark):
    """k_anonymity_audit: partial+final hash agg on the
    quasi-identifier tuple — no joins, no windows, no sorts."""
    plan = _plan(QUERIES["k_anonymity_audit"](spark, SF_SMALL))
    assert "Join" not in plan
    assert "Sort" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_dau_wau_never_windows(spark):
    """dau_wau_stickiness: the trailing-window distinct is re-expressed
    as coverage explosion + two distinct aggs — no Window operator, no
    per-day rescans, no cartesian."""
    plan = _plan(QUERIES["dau_wau_stickiness"](spark, SF_SMALL))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan


def test_seasonal_anomalies_grid_broadcasts(spark):
    """hourly_seasonal_anomalies: one corpus agg; the dense grid and
    profile stats join back as broadcasts (clock-sized frames)."""
    plan = _plan(QUERIES["hourly_seasonal_anomalies"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_blocking_report_never_generates_pairs(spark):
    """blocking_quality_report: candidate counts come from bucket-size
    arithmetic — the plan must contain NO self-join of the banded
    frame (no join at all except the one-row doc-count broadcast)."""
    plan = _plan(QUERIES["blocking_quality_report"](spark, SF_SMALL))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    joins = [l for l in plan.splitlines() if "Join" in l]
    assert all("BroadcastNestedLoopJoin" in j or "BroadcastHashJoin" in j
               for j in joins), joins


def test_latest_state_compaction_uses_window_group_limit(spark):
    """latest_state_compaction: the latest-wins rank must compile to
    WindowGroupLimit (rk=1 pushed into the sort) over exactly ONE
    corpus Exchange on the key."""
    plan = _plan(QUERIES["latest_state_compaction"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_orc_roundtrip_reads_orc_scan(spark):
    """orc_roundtrip_parity: the read-back side must be a native ORC
    columnar scan (not a fallback row reader)."""
    plan = _plan(QUERIES["orc_roundtrip_parity"](spark, SF_SMALL))
    assert "orc" in plan.lower()
    assert "Exchange hashpartitioning" in plan  # ordinary partial+final agg


def test_audience_overlap_single_corpus_exchange(spark):
    """audience_overlap_matrix: one corpus Exchange to the (user, type)
    distinct; the co-occurrence join reuses that partitioning and the
    marginals broadcast."""
    plan = _plan(QUERIES["audience_overlap_matrix"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_chart_downsample_window_group_limit(spark):
    """chart_downsample: the per-bucket pick must compile to
    WindowGroupLimit; stats agg and pick window share the
    (series, bucket) key."""
    plan = _plan(QUERIES["chart_downsample"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_ohlc_bars_single_exchange(spark):
    """ohlc_hourly_bars: both endpoint windows AND the bar aggregate
    must share ONE (type, hour) hash Exchange — the claim the
    docstring makes and the probe relies on."""
    import re

    plan = _plan(QUERIES["ohlc_hourly_bars"](spark, SF_SMALL))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_attribution_reuses_asof_partitioning(spark):
    """attribution_linear: the per-conversion credit window must REUSE
    the as-of's user_id hash partitioning (asof_join re-emits the
    top-level key attribute — the r6 operator fix). A regression
    re-introduces an Exchange keyed on (user_id, pur_ms): corpus-sized
    at 100 TB."""
    import re

    plan = _plan(QUERIES["attribution_linear"](spark, SF_SMALL))
    keysets = []
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        cols = {
            re.sub(r"#\d+L?", "", part.strip())
            for part in m.group(1).split(",")
            if not part.strip().isdigit()  # drop the partition count
        }
        keysets.append(cols)
    # The purchases-distinct Exchange keys on (user_id, pur_ms, pneg)
    # and is expected; the REGRESSION signature is a window Exchange
    # on exactly (user_id, pur_ms).
    assert {"user_id", "pur_ms"} not in keysets, (
        f"asof partitioning no longer reused: {keysets}"
    )


def test_zorder_zone_map_grid_is_aggregate_sized(spark):
    """zorder_zone_map: no global sort (the audit only ASSESSES the
    layout; the write-path repartitionByRange lives in
    write_zorder_clustered), and the scalar max joins by broadcast,
    never Cartesian-on-corpus."""
    plan = _plan(QUERIES["zorder_zone_map"](spark, SF_SMALL))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_bootstrap_fanout_absorbed_map_side(spark):
    """bootstrap_revenue_ci: the x16 replicate fan-out must be
    absorbed by partial aggregation BEFORE the Exchange (the
    B-row grid shuffles, never 16x the corpus) — pinned by requiring
    partial_sum in the aggregate chain and no range partitioning."""
    plan = _plan(QUERIES["bootstrap_revenue_ci"](spark, SF_SMALL))
    assert "partial_sum" in plan
    assert "rangepartitioning" not in plan


def test_cluster_balanced_sample_wgl_and_broadcast_counts(spark):
    """cluster_balanced_sample: the per-cell quota must plan as a
    WindowGroupLimit (partial top-10 per cell BEFORE the cell_id
    shuffle — the property that keeps the quota scan-bounded at
    100 TB), never a global sort; the 8-row cell counts join back
    broadcast so the quota rows never shuffle again."""
    plan = _plan(QUERIES["cluster_balanced_sample"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_topk_never_global_sorts_and_lifts_broadcast(spark):
    """dsir_importance_select: the final top-50 must plan as
    TakeOrderedAndProject feeding the rank window (a 50-row single
    partition), never a rangepartitioning global sort of the scored
    pool; the 256-row lift frame must join broadcast so the grid
    never shuffles for it."""
    df = QUERIES["dsir_importance_select"](spark, SF_SMALL)
    df.collect()  # materialize so the persisted grid resolves
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_probe_sweep_no_corpus_sort_merge(spark):
    """The n_probe sweep must keep the IVFPQ corpus discipline: zero
    SortMergeJoin (the 30-row exact reference broadcasts into both hit
    joins — unhinted, Catalyst sort-merges the corpus-scale ADC frame
    on (query_id, neighbor_id)), zero CartesianProduct, and every
    cross term a BroadcastNestedLoopJoin of a bounded frame (the
    3-row probe grid, the codebook expansion, the 10-query brute
    verifier)."""
    plan = _plan(QUERIES["ann_ivfpq_probe_sweep"](spark, SF_SMALL))
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan  # the declared crosses
    assert "WindowGroupLimit" in plan  # per-(n_probe, query) top-3


def test_bpe_encode_vocab_axis_discipline(spark):
    """bpe_encode (r8): the merge chain and id assignment run on the
    vocab/alphabet axis — no CartesianProduct anywhere (the k-scalar
    cross is a broadcast 1-row NLJ), the token-id mapping and the
    per-merge (l, r) frames broadcast into their joins (zero
    SortMergeJoin against the symbol frame; the ONLY sort-merge
    allowed is the final corpus token-stream join on word), and no
    global Sort (the per-document sequence digest partitions by
    doc_id)."""
    plan = _plan(QUERIES["bpe_encode"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    # final corpus join on word may sort-merge (corpus x vocab, both
    # word-partitioned); anything more means a merge/id join degraded
    assert plan.count("SortMergeJoin") <= 1, plan
    assert "BroadcastHashJoin" in plan  # (l, r) merges + sym_ids


def test_bpe_encode_arrow_apply_is_constant_depth(spark):
    """bpe_encode_arrow (r10): the one-pass Arrow apply replaces the
    per-merge window chain with EXACTLY ONE MapInPandas over the
    vocab — plan depth constant in merge count. Only the two
    legitimate windows remain (sorted-alphabet id assignment + the
    per-document sequence digest); no cartesian, no sort-merge
    against the symbol frame."""
    plan = _plan(QUERIES["bpe_encode_arrow"](spark, SF_SMALL))
    assert plan.count("MapInPandas") == 1, plan
    assert plan.count("Window") == 2, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("SortMergeJoin") <= 1, plan


def test_bpe_decode_vocab_axis_discipline(spark):
    """bpe_decode_roundtrip (r11 tightening of the r10 test): decode
    runs on the vocab axis — the tid->sym inverse join and the
    id-assignment join both BROADCAST the alphabet-sized (sym, tid)
    frame, no CartesianProduct anywhere (the k-scalar cross is a
    broadcast 1-row NLJ), and the ONE corpus-sized join (token
    stream x decoded vocab on word — the only corpus join left after
    the r10 single-aggregation rewrite removed the doc_id
    re-join) is PINNED sort-merge. The pin is load-bearing:
    `dwords.hint("merge")` (text_analysis.py) exists because dwords
    grows with the corpus yet its decoded strings compress ~100x, so
    AQE's compressed-size threshold mis-classifies it as
    broadcastable — at the 160x probe that build side deserialized
    to 4.6 GiB and OOMed the heap (fix commit d23d129). Asserting
    EXACTLY one SortMergeJoin, keyed on word, means deleting the
    hint fails this suite (measured: unhinted at SF_SMALL the plan
    shows 0 SMJ / the word join broadcasts) instead of re-creating
    the production OOM."""
    plan = _plan(QUERIES["bpe_decode_roundtrip"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("SortMergeJoin") == 1, plan
    smj_lines = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln]
    assert len(smj_lines) == 1 and "word#" in smj_lines[0], smj_lines
    assert "BroadcastHashJoin" in plan, plan


def test_bpe_encode_incremental_frozen_vocab_axis(spark):
    """bpe_encode_incremental (r10): the frozen-vocab apply + UNK id
    assignment run on the NEW increment's vocab axis — the id table
    BROADCASTS into its LEFT join (OOV -> -1, never a drop), no
    CartesianProduct (the one 1-row NLJ is the k-scalar cross), and
    the only sort-merge-eligible join is the increment's token stream
    against its encoded vocab on word."""
    plan = _plan(QUERIES["bpe_encode_incremental"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("SortMergeJoin") <= 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bpe_published_frozen_vocab_axis(spark):
    """bpe_encode_published (r11): loading the artifacts from the
    published warehouse tables must not change the encode plan class —
    the loaded (sym, tid) scan still BROADCASTS into its LEFT join,
    no CartesianProduct, and the only sort-merge-eligible join is the
    increment's token stream against its encoded vocab on word (the
    same pins as bpe_encode_incremental, whose plan this shares via
    _encode_frozen_digests)."""
    plan = _plan(QUERIES["bpe_encode_published"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("SortMergeJoin") <= 1, plan
    assert "BroadcastHashJoin" in plan, plan

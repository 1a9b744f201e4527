"""Query registry.

Every operator the engine claims (SURVEY.md §2 + the LLM-data-pipeline
extensions) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the exact
ANSI-SQL oracle DuckDB runs on the same parquet tables. The driver's
correctness gate executes both and hash-compares values, so column
names/aliases must match on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, bench: bool = False):
    """Decorator registering a query + its DuckDB oracle SQL."""

    def wrap(fn):
        # a silent overwrite would let two modules fight over one gate
        # entry (and only the import-order winner ever gets checked)
        if name in REGISTRY:
            raise ValueError(
                f"duplicate query name {name!r}: already registered by "
                f"{REGISTRY[name].fn.__module__}.{REGISTRY[name].fn.__qualname__}"
            )
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return wrap


# Queries that had no driver CORRECTNESS row in round 1 (the driver checks a
# capped prefix of the registry per round).  Enumerate them first so every
# query accumulates a green driver row; order within each group is stable.
_CHECK_FIRST = (
    "order_age_buckets",
    "tumbling_event_counts",
    "sliding_event_counts",
    "props_map_profile",
    "streamed_event_type_counts",
    "doc_token_stats",
    "text_quality",
    "lang_id",
    "doc_fingerprints",
    "dedup_exact_groups",
    "ngram_jaccard_pairs",
    "media_byte_stats",
    "minhash_lsh_pairs",
    "curated_documents",
    "simhash_signatures",
    "simhash_near_pairs",
    "dedup_clusters",
    "deterministic_sample",
    "stratified_sample",
    "tfidf_top_terms",
    "bigram_counts",
    "redacted_documents",
    "embedding_dedup_clusters",
    "value_sum_1h_range",
    "session_window_stats",
    "streamed_windowed_counts",
    "streamed_distinct_users",
    "streamed_purchase_attribution",
    "quantized_embeddings",
    "kmeans_clusters",
    "value_outliers",
    "daily_event_counts_gapfilled",
    "props_key_histogram",
    "priority_with_returns",
    "small_quantity_part_revenue",
    "dominant_supplier_parts",
    "sole_return_suppliers",
    "doc_repetition",
    "approx_distinct_users",
    "approx_price_quantiles",
    "volume_shipping",
    "nation_market_share",
    "color_part_profit",
    "late_shipment_priority",
    "top_revenue_supplier",
    "min_unit_price_parts",
    "decontaminated_documents",
    "packed_sequences",
    "source_mixture_weights",
    "customer_upsert",
    "user_value_scd2",
    "approx_distinct_merged",
    "streamed_segment_counts",
    "document_chunks",
    "incremental_event_counts",
    "zorder_event_keys",
    "doc_token_entropy",
    "props_variant_profile",
    "lineitem_unpivot",
    "bloom_decontamination",
    "lateral_top_customers",
    "doc_unigram_logprob",
    "cosine_topk",
    "ann_lsh_buckets",
    "ann_lsh_topk",
    "embedding_near_dup_pairs",
    "label_centroids",
    "ivf_topk",
)


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: fills REGISTRY)."""
    from . import (  # noqa: F401
        maintenance,
        mutations,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        relational8,
        sketches,
        streaming_q,
        textops,
        textops2,
        vectors,
    )

    ordered = {n: REGISTRY[n] for n in _CHECK_FIRST if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered

"""The engine's query registry — the driver-contract surface.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables (the
driver's correctness oracle). This registry plays the role of the
reference's app registry (``src/app/mod.rs:29-63``): name → query,
unknown name → KeyError at lookup, except queries here are
declarative plans instead of (map_fn, reduce_fn) pairs.

Determinism rules (every builder follows them so the driver's
order-insensitive value-hash matches):

* Alias every computed column identically in Spark and SQL.
* Money/measure aggregates: cast to DECIMAL first (exact, associative
  — immune to partition/accumulation order), SUM in decimal, CAST the
  final sum to DOUBLE. Never sum raw doubles: float addition is
  non-associative and Spark's partition order differs from DuckDB's.
* Averages: exact decimal SUM cast to double, then one IEEE division.
* Ranked/top-k outputs: total tie-break on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    """One registered query: Spark builder + optional DuckDB oracle."""

    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: Iterable[str] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


# The driver's CORRECTNESS artifact records only the first ~50
# queries() entries, so export order IS evidence policy. Round-3
# rotation (per VERDICT r02 item 5):
#
#   band 0 — sentinels: a few r02-green canaries that stay at the
#            head every round so a cross-round regression is caught
#            inside the window (pivot_event_types_daily regressed
#            while hidden in the tail — exactly this risk);
#   band 1 — never-driver-green: the 15 r02 `err` rows (all fixed by
#            the events-loader dispatch) + pivot_event_types_daily
#            (r1-green, regressed r2, fixed) + anything new this
#            round;
#   band 2 — evidence-is-stale: green only in CORRECTNESS_r01;
#   band 3 — freshest evidence: green in CORRECTNESS_r02 — absorbs
#            the truncation.
#
# The local differential suite (tests/test_oracle_diff.py) still
# checks ALL queries regardless of order.
_SENTINELS = (
    "vertex_degree_lineitem",
    "grep_docs_packed",
    "dedup_minhash_lsh",
)
_NEVER_GREEN_R3 = (
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "events_session_10m",
    "events_json_props",
    "events_lag_delta",
    "events_moving_sum_4",
    "events_funnel_1h",
    "events_multires_rollup",
    "events_latest_per_user",
    "events_asof_purchase_click",
    "approx_distinct_users",
    "events_gapfill_1h",
    "events_rate_anomaly",
    "events_range_frame_30m",
    "salted_event_counts",
    "pivot_event_types_daily",
    # new this round — needs first driver evidence:
    "streaming_tumbling_counts",
    "pack_sequences_greedy",
    "pack_chunk_spans",
    "mixture_lang_weights",
    "graph_pagerank",
    "sample_weighted_quality",
    "q7_volume_shipping",
    "layout_zorder_clustering",
    "text_unigram_logprob",
    "topk_orders_per_segment_bounded",
    "q21_single_late_supplier",
    "argmin_cheapest_supplier",
    "shuffle_train_order",
    "udtf_overlap_chunks",
    "sim_hard_negatives",
    "events_sessionize_ids",
    "cluster_kmeans_balance",
    "orders_retention_cohorts",
    "docs_perplexity_buckets",
    "q13_customer_distribution",
    "dedup_containment_pairs",
    "stats_trimmed_mean_price",
)
#: green in CORRECTNESS_r02.json (minus the sentinel picks)
_R2_GREEN = frozenset(
    {
        "graph_triangle_summary",
        "graph_top_copurchase",
        "text_repetition_filter",
        "text_bpe_token_estimate",
        "text_pii_scrub",
        "text_bigram_pmi",
        "docs_source_profile",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "dedup_embedding_cosine",
        "dedup_incremental_minhash",
        "decontam_benchmark_overlap",
        "dedup_apply_exact",
        "dedup_fuzzy_names",
        "dedup_repeated_passages",
        "sim_topk_bruteforce",
        "sim_topk_lsh",
        "sim_topk_ivf",
        "sim_bucket_histogram",
        "multimodal_embed_topk",
        "multimodal_decode_meta",
        "multimodal_frame_stats",
        "multimodal_binary_files",
        "vector_label_centroids",
        "dedup_connected_components",
        "dedup_apply_near",
        "pipeline_filter_funnel",
        "sample_stratified_docs",
        "sample_rebalance_langs",
        "sample_temperature_langs",
        "approx_percentiles_bounded",
    }
)


def _band(spec: QuerySpec) -> int:
    if spec.name in _SENTINELS:
        return 0
    if spec.name in _NEVER_GREEN_R3:
        return 1
    if spec.name in _R2_GREEN:
        return 3
    return 2  # r1-only evidence, or brand new this round


def _export_ordered() -> list[QuerySpec]:
    _load_all()
    specs = list(REGISTRY.values())
    head = {n: i for i, n in enumerate(_SENTINELS + _NEVER_GREEN_R3)}
    # stable sort: within a band, head-listed names first in listed
    # order, everything else in registration order
    indexed = sorted(
        enumerate(specs),
        key=lambda p: (_band(p[1]), head.get(p[1].name, len(head) + p[0])),
    )
    return [s for _, s in indexed]


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """``queries()`` payload for ``__spark_entry__``."""
    return {spec.name: spec.builder for spec in _export_ordered()}


def oracle_sql_map() -> dict[str, str]:
    """``oracle_sql()`` payload — only SQL-expressible queries."""
    return {
        spec.name: spec.oracle for spec in _export_ordered() if spec.oracle is not None
    }


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used by builders."""
    return load_table(spark, sf_dir, name)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Import order IS registry order, and registry order decides which
    # queries the driver's capped (~50-entry) correctness artifact
    # verifies. The algorithmically riskiest families — dedup,
    # similarity, events, multimodal (hash-replayed pipelines) — go
    # first; the relational tail is conventional SQL with the deepest
    # local test coverage, so it can absorb any truncation.
    from . import queries_mapreduce  # noqa: F401
    from . import queries_graph  # noqa: F401
    from . import queries_dedup  # noqa: F401
    from . import queries_similarity  # noqa: F401
    from . import queries_events  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_multimodal  # noqa: F401
    from . import queries_vectors  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_pipeline  # noqa: F401
    from . import queries_packing  # noqa: F401
    from . import queries_udf  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_relational2  # noqa: F401
    from . import queries_relational3  # noqa: F401

    _LOADED = True

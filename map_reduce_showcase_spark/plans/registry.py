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
# queries() entries, so export order IS evidence policy. Round-4
# rotation (per VERDICT r03 item 1):
#
#   band 0 — sentinels: r03-green canaries that stay at the head
#            every round so a cross-round regression is caught
#            inside the window (pivot_event_types_daily regressed
#            while hidden in the tail — exactly this risk);
#   band 1 — new this round: queries with no driver evidence yet;
#   band 2 — evidence-is-stale: the 37 queries whose only driver
#            green is CORRECTNESS_r01 — two testdata regenerations
#            old, exactly the drift-failure mode the rotation
#            scheme exists to catch;
#   band 3 — freshest evidence: green in r02/r03 — absorbs the
#            truncation.
#
# The local differential suite (tests/test_oracle_diff.py) still
# checks ALL queries regardless of order.
_SENTINELS = (
    "vertex_degree_lineitem",
    "grep_docs_packed",
    "dedup_minhash_lsh",
)
#: brand-new this round — need first driver evidence (capped at 10
#: so 3 sentinels + 10 new + 37 stale = the driver's 50-entry
#: window exactly; further new queries land in band 3 and rotate
#: into the window next round)
_NEW_R4 = (
    "q3_bucketed_orders",
    "dedup_substring_runs",
    "streaming_stateful_counts",
    "process_readback_wc",
    "q18_large_volume_customers",
    "q17_small_quantity_revenue",
    "q9_product_type_profit",
    "q14_promo_revenue_share",
    "q19_disjunctive_predicates",
    "dedup_semantic_clusters",
)
#: only driver green is CORRECTNESS_r01.json (two testdata
#: generations old) — rotate in per VERDICT r03 item 1
_STALE_R1_ONLY = (
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q10_returned_item_customers",
    "join_brand_revenue",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_outer_order_counts",
    "fullouter_nation_parties",
    "selfjoin_repeat_orders_30d",
    "range_join_price_tiers",
    "rollup_sales",
    "cube_order_stats",
    "grouping_sets_order_volume",
    "distinct_customers_per_segment",
    "topk_orders",
    "setops_nation_presence",
    "union_all_parties",
    "window_rank_orders",
    "window_analytics_orders",
    "scalar_functions_orders",
    "scalar_string_functions",
    "date_arithmetic_orders",
    "array_functions_docs",
    "stats_acctbal_by_segment",
    "percentiles_order_price",
    "histogram_order_price",
    "scalar_subquery_above_avg",
    "having_frequent_buyers",
    "correlated_above_own_avg",
    "text_tfidf",
    "udf_scalar_clv",
    "udf_grouped_geomean_qty",
    "dedup_exact_groups",
    "split_train_val_test",
    "quality_profile_orders",
)


def _band(spec: QuerySpec) -> int:
    if spec.name in _SENTINELS:
        return 0
    if spec.name in _NEW_R4:
        return 1
    if spec.name in _STALE_R1_ONLY:
        return 2
    return 3  # r2/r3-green — freshest evidence, absorbs truncation


def _export_ordered() -> list[QuerySpec]:
    _load_all()
    specs = list(REGISTRY.values())
    head = {n: i for i, n in enumerate(_SENTINELS + _NEW_R4 + _STALE_R1_ONLY)}
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
    from . import queries_bucketed  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_relational2  # noqa: F401
    from . import queries_relational3  # noqa: F401
    from . import queries_relational4  # noqa: F401

    _LOADED = True

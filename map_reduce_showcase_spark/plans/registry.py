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
# queries() entries. These names were all verified green by the
# round-1 driver artifact (CORRECTNESS_r01.json) and none of their
# builders or oracles changed since, so they are exported LAST and
# absorb the truncation; every query whose verdict the artifact does
# not yet show (new or changed this round) exports first. The local
# differential suite (tests/test_oracle_diff.py) still checks ALL
# queries regardless of order.
_VERIFIED_R1_TAIL_MODULES = (
    "queries_udf",
    "queries_relational",
    "queries_relational2",
    "queries_relational3",
)
_VERIFIED_R1_TAIL_NAMES = frozenset(
    {
        "split_train_val_test",
        "quality_profile_orders",
        "grep_docs",
        "grep_docs_lines",
        # r1-green and builder+oracle untouched since (additions to
        # their modules don't change them):
        "wc_word_count",
        "text_token_stats",
        "text_quality",
        "text_language_id",
        "text_fingerprint",
        "text_word_doc_freq",
        "dedup_exact_stats",
        "dedup_exact_groups",
    }
)


# New queries living in otherwise-tail modules: export FIRST until a
# driver artifact shows them green.
_FRESH_HEAD_NAMES = frozenset({"approx_percentiles_bounded"})


def _is_tail(spec: QuerySpec) -> bool:
    if spec.name in _FRESH_HEAD_NAMES:
        return False
    mod = spec.builder.__module__.rsplit(".", 1)[-1]
    return mod in _VERIFIED_R1_TAIL_MODULES or spec.name in _VERIFIED_R1_TAIL_NAMES


def _export_ordered() -> list[QuerySpec]:
    _load_all()
    specs = list(REGISTRY.values())
    return [s for s in specs if not _is_tail(s)] + [s for s in specs if _is_tail(s)]


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
    from . import queries_multimodal  # noqa: F401
    from . import queries_vectors  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_pipeline  # noqa: F401
    from . import queries_udf  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_relational2  # noqa: F401
    from . import queries_relational3  # noqa: F401

    _LOADED = True

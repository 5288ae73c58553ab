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
# queries() entries, so export order IS evidence policy. The policy
# (enforced by tests/test_oracle_diff.py's window test) is computed
# DYNAMICALLY from the repo's own CORRECTNESS_r*.json artifacts
# instead of hand-rotated band lists each round:
#
#   band 0 — sentinels: always-at-head canaries so a cross-round
#            regression is caught inside the window
#            (pivot_event_types_daily regressed in round 2 while
#            hidden in the tail — exactly this risk);
#   band 1 — never driver-green: no artifact from any round proved
#            them (new queries, or ones whose every driver run
#            errored) — first claim on the window;
#   band 2 — changed since green: a past round's artifact proved a
#            DIFFERENT definition (detected by comparing the current
#            definition fingerprint against the snapshot recorded at
#            the green round — see changed_since_green);
#   band 3 — proven queries ordered by the ROUND of their latest
#            green, oldest first: stalest evidence re-verifies
#            soonest, freshest absorbs the truncation.
#
# The local differential suite (tests/test_oracle_diff.py) still
# checks ALL queries regardless of order.
_SENTINELS = (
    "vertex_degree_lineitem",
    "grep_docs_packed",
    "dedup_minhash_lsh",
)

def definition_fingerprint(spec: QuerySpec) -> str:
    """Stable hash of the query's DEFINITION: the builder function's
    source text plus its oracle SQL. Used to detect
    changed-since-green queries automatically (round 5 kept a
    hand-maintained ``_REVERIFY`` frozenset for this; it went stale
    the moment the listed queries were re-proven, which is exactly
    the failure mode a hand list has). Limitation, by design: edits
    to a HELPER the builder calls don't move the fingerprint — the
    local differential still proves such queries every round, and
    helper-level rewrites in practice come with a builder/docstring
    edit anyway."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(spec.builder)
    except (OSError, TypeError):
        src = f"<no-source:{spec.builder.__module__}.{spec.builder.__qualname__}>"
    return hashlib.sha256(f"{src}\x00{spec.oracle or ''}".encode()).hexdigest()[:16]


def current_fingerprints() -> dict[str, str]:
    """query name → fingerprint of the definition as it exists NOW."""
    _load_all()
    return {n: definition_fingerprint(s) for n, s in REGISTRY.items()}


def _fingerprint_snapshots() -> dict[int, dict[str, str]]:
    """round → {query: fingerprint-recorded-that-round}. Sources:
    ``FINGERPRINTS_r*.json`` (flat maps; r5 is a one-off baseline
    generated from the pristine round-5 code before any round-6
    edits) and the per-entry ``fingerprint`` fields that
    ``tools/drive_contract.py`` stamps into ``LOCAL_DIFF_r*.json``
    from round 6 on."""
    import json
    import pathlib
    import re

    snaps: dict[int, dict[str, str]] = {}
    repo = pathlib.Path(__file__).resolve().parent.parent.parent
    for art in sorted(repo.glob("FINGERPRINTS_r*.json")) + sorted(
        repo.glob("LOCAL_DIFF_r*.json")
    ):
        m = re.search(r"r(\d+)", art.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(art.read_text())
        except (OSError, ValueError):
            continue
        snap = snaps.setdefault(rnd, {})
        for n, e in data.items():
            if isinstance(e, str):  # FINGERPRINTS flat map
                snap.setdefault(n, e)
            elif isinstance(e, dict) and e.get("fingerprint"):
                snap.setdefault(n, e["fingerprint"])
    return snaps


def changed_since_green(
    green: dict[str, int],
    snapshots: dict[int, dict[str, str]],
    current: dict[str, str],
) -> set[str]:
    """Names whose definition changed AFTER their latest driver-green
    round — the old artifact certifies different code, so they must
    re-enter the driver window. Rule: take the EARLIEST fingerprint
    snapshot at round >= the green round; if it disagrees with the
    current fingerprint, the definition moved since the proof. No
    snapshot that late → assume unchanged (the snapshot era starts
    at round 5; the every-round local differential proves current
    code regardless)."""
    out: set[str] = set()
    for name, g in green.items():
        rounds = sorted(r for r, snap in snapshots.items() if r >= g and name in snap)
        if rounds and snapshots[rounds[0]][name] != current.get(name, ""):
            out.add(name)
    return out


def reverify_band() -> set[str]:
    """The computed re-verify band (replaces round 5's hand-kept
    ``_REVERIFY`` frozenset, which went stale as soon as its members
    were re-proven)."""
    _load_all()
    return changed_since_green(
        _latest_green_round(), _fingerprint_snapshots(), current_fingerprints()
    )


def _latest_green_round() -> dict[str, int]:
    """query name → highest round whose CORRECTNESS artifact proved
    it (rows+schema+hash all matching). Missing key = never green."""
    import json
    import pathlib
    import re

    latest: dict[str, int] = {}
    repo = pathlib.Path(__file__).resolve().parent.parent.parent
    for art in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", art.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            entries = json.loads(art.read_text())
        except (OSError, ValueError):
            continue
        for n, e in entries.items():
            if (
                isinstance(e, dict)
                and e.get("rows_match")
                and e.get("schema_match")
                and e.get("hash_match")
            ):
                latest[n] = max(latest.get(n, 0), rnd)
    return latest


def _export_ordered() -> list[QuerySpec]:
    _load_all()
    specs = list(REGISTRY.values())
    green = _latest_green_round()
    reverify = changed_since_green(
        green, _fingerprint_snapshots(), {s.name: definition_fingerprint(s) for s in specs}
    )
    sentinel_pos = {n: i for i, n in enumerate(_SENTINELS)}

    def key(p: tuple[int, QuerySpec]):
        i, spec = p
        if spec.name in sentinel_pos:
            return (0, sentinel_pos[spec.name], 0)
        if spec.name not in green:
            return (1, 0, i)  # never proven — registration order
        if spec.name in reverify:
            # proven, but the definition changed since that proof —
            # the old artifact certifies different code (band is
            # COMPUTED from fingerprint snapshots, never hand-kept)
            return (2, 0, i)
        # proven: stalest latest-green first, registration order ties
        return (3, green[spec.name], i)

    return [s for _, s in sorted(enumerate(specs), key=key)]


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

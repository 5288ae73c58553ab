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
    the failure mode a hand list has). Edits to a helper MODULE the
    builder's module imports are covered by the companion
    :func:`helper_fingerprint`; the residual blind spot is a
    same-module private helper (e.g. ``_pagerank``) edited without
    touching any builder — the every-round local differential still
    proves those queries on current code."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(spec.builder)
    except (OSError, TypeError):
        src = f"<no-source:{spec.builder.__module__}.{spec.builder.__qualname__}>"
    return hashlib.sha256(f"{src}\x00{spec.oracle or ''}".encode()).hexdigest()[:16]


_HELPER_FP_CACHE: dict[str, str] = {}


def _helper_modules(builder_module: str) -> list[str]:
    """The intra-package modules ``builder_module``'s globals import
    — directly as modules or via functions/classes defined in them —
    excluding the registry itself (pure infrastructure, imported by
    every query module) and the builder's own module (hashing it
    whole would promote every query in a file on any edit to one)."""
    import sys
    import types

    pkg = __name__.rsplit(".", 2)[0]  # map_reduce_showcase_spark
    mod = sys.modules.get(builder_module)
    if mod is None:
        return []
    found: set[str] = set()
    for val in vars(mod).values():
        if isinstance(val, types.ModuleType):
            name = getattr(val, "__name__", "")
        else:
            name = getattr(val, "__module__", "") or ""
        if (
            name.startswith(pkg + ".")
            and name != builder_module
            and name != __name__
            and name in sys.modules
        ):
            found.add(name)
    return sorted(found)


def helper_fingerprint(spec: QuerySpec) -> str:
    """Hash of the SOURCE of every intra-package helper module the
    builder's module imports (``operators/``, ``dedup/``,
    ``similarity/``, ``functions/``, ``streaming/``, ``sources/``,
    ``multimodal/``, sibling ``plans`` modules, …) — closing the
    round-6 blind spot where rewriting ``dedup/jaccard.py`` moved no
    fingerprint and its dependent queries never auto-promoted into
    the driver window. Recorded alongside ``fingerprint`` in each
    LOCAL_DIFF entry from round 7 on; ``changed_since_green``
    compares it only against snapshots that carry it (older
    snapshots predate the field)."""
    import hashlib
    import inspect
    import sys

    parts: list[str] = []
    for name in _helper_modules(spec.builder.__module__):
        if name not in _HELPER_FP_CACHE:
            try:
                src = inspect.getsource(sys.modules[name])
            except (OSError, TypeError):
                src = f"<no-source:{name}>"
            _HELPER_FP_CACHE[name] = hashlib.sha256(src.encode()).hexdigest()[:16]
        parts.append(f"{name}={_HELPER_FP_CACHE[name]}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def current_fingerprints() -> dict[str, str]:
    """query name → fingerprint of the definition as it exists NOW."""
    _load_all()
    return {n: definition_fingerprint(s) for n, s in REGISTRY.items()}


def current_helper_fingerprints() -> dict[str, str]:
    """query name → helper-module fingerprint as it exists NOW."""
    _load_all()
    return {n: helper_fingerprint(s) for n, s in REGISTRY.items()}


def _fingerprint_snapshots() -> dict[int, dict[str, tuple[str, str | None]]]:
    """round → {query: (fingerprint, helper_fingerprint-or-None)
    recorded that round}. Sources: ``FINGERPRINTS_r*.json`` (flat
    maps; r5 is a one-off baseline generated from the pristine
    round-5 code before any round-6 edits) and the per-entry
    ``fingerprint``/``helper_fingerprint`` fields that
    ``tools/drive_contract.py`` stamps into ``LOCAL_DIFF_r*.json``
    (``fingerprint`` from round 6 on, ``helper_fingerprint`` from
    round 7 on — older snapshots carry None and the helper
    comparison is skipped for them)."""
    import json
    import pathlib
    import re

    snaps: dict[int, dict[str, tuple[str, str | None]]] = {}
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
                snap.setdefault(n, (e, None))
            elif isinstance(e, dict) and e.get("fingerprint"):
                snap.setdefault(n, (e["fingerprint"], e.get("helper_fingerprint")))
    return snaps


def changed_since_green(
    green: dict[str, int],
    snapshots: dict[int, dict[str, str | tuple[str, str | None]]],
    current: dict[str, str],
    current_helpers: dict[str, str] | None = None,
) -> set[str]:
    """Names whose definition changed AFTER their latest driver-green
    round — the old artifact certifies different code, so they must
    re-enter the driver window. Rule: take the EARLIEST fingerprint
    snapshot at round >= the green round; if it disagrees with the
    current fingerprint — or, when both sides carry one, the
    helper-module fingerprint — the definition moved since the
    proof. No snapshot that late → assume unchanged.

    Known era edges, accepted by design and covered every round by
    the local differential (which proves ALL queries on current
    code):

    * The snapshot era starts at round 5 (and the helper field at
      round 7): for a query whose latest green predates the first
      snapshot carrying it, the band only certifies "unchanged since
      that first snapshot" — an edit landed between the green round
      and the snapshot era is invisible here.
    * A round's snapshot is stamped when the LOCAL differential runs
      (end of round, after all edits), not at the driver's run
      earlier that round — an edit landed in that within-round gap is
      recorded as "the green code". The window is closed procedurally
      (the differential is generated LAST each round) rather than
      structurally.

    Names no longer in ``current`` are skipped: a removed or renamed
    query has nothing to re-verify, and surfacing it here would make
    the band contain unregistered names."""
    out: set[str] = set()
    for name, g in green.items():
        if name not in current:
            continue
        rounds = sorted(r for r, snap in snapshots.items() if r >= g and name in snap)
        if not rounds:
            continue
        snap_val = snapshots[rounds[0]][name]
        snap_fp, snap_helper = (
            snap_val if isinstance(snap_val, tuple) else (snap_val, None)
        )
        if snap_fp != current[name]:
            out.add(name)
        elif (
            snap_helper is not None
            and current_helpers is not None
            and name in current_helpers
            and snap_helper != current_helpers[name]
        ):
            out.add(name)
    return out


def reverify_band() -> set[str]:
    """The computed re-verify band (replaces round 5's hand-kept
    ``_REVERIFY`` frozenset, which went stale as soon as its members
    were re-proven)."""
    _load_all()
    return changed_since_green(
        _latest_green_round(),
        _fingerprint_snapshots(),
        current_fingerprints(),
        current_helper_fingerprints(),
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
        green,
        _fingerprint_snapshots(),
        {s.name: definition_fingerprint(s) for s in specs},
        {s.name: helper_fingerprint(s) for s in specs},
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

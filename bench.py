#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is fully materialized through the ``noop`` sink (compute
everything, collect nothing) so the number is engine time, not
driver-transfer time. One warm-up action runs first so JVM/codegen
startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_showcase_spark.plans import REGISTRY
from map_reduce_showcase_spark.plans.registry import _load_all
from map_reduce_showcase_spark.session import get_spark

#: Headline set: reference-app parity + the heavy relational /
#: window / dedup / similarity representatives.
HEADLINE = [
    "wc_word_count",
    "grep_docs",
    "vertex_degree_lineitem",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "join_brand_revenue",
    "join_outer_order_counts",
    "window_rank_orders",
    "topk_orders",
    "events_tumbling_1h",
    "events_session_10m",
    "events_asof_purchase_click",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    _load_all()
    # SPARK_GRAFT_BENCH_SET=all sweeps every registered query instead
    # of the stable 18-query headline set (which stays the default so
    # cross-round totals compare like sets) — the local profiling mode
    # used to catch scale pathologies outside the headline window.
    headline = (
        list(REGISTRY) if os.environ.get("SPARK_GRAFT_BENCH_SET") == "all" else HEADLINE
    )
    spark = get_spark(app_name="mrs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # The accumulator-GC ERROR spam (Python GC reaps accumulators
    # while late tasks report in) starts during the rapid-fire
    # warm-up, not just the measured loop — silence below FATAL for
    # BOTH phases so the artifact tail stays clean; real failures
    # still surface via the errors dict and stderr prints.
    spark.sparkContext.setLogLevel("FATAL")

    # warm-up: JVM, whole-stage codegen, Python worker pool, parquet
    # footer caches — run EVERY headline query once at the smallest
    # SF so plan construction + codegen compilation (identical plan
    # shapes, cached by the JVM) isn't billed to the measured sf0.1
    # runs. Warm-up failures are ignored; the measured loop records
    # them properly.
    warm_sf = "/root/testdata/sf0.001"
    for name in headline:
        try:
            REGISTRY[name].builder(spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    # Failure-isolated: one broken query must never destroy the whole
    # artifact (round 2 lost all 18 numbers to a single loader bug).
    # Failures land in "errors"; the JSON line always prints.
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    jvm_gc = spark.sparkContext._jvm.System.gc  # noqa: SLF001
    for name in headline:
        # Earlier queries' localCheckpoint blocks are only released
        # when the ContextCleaner runs, which is JVM-GC-driven; nudge
        # it so query N isn't measured under query N-1's cached
        # partitions squeezing the (shared local) heap.
        jvm_gc()
        t0 = time.time()
        try:
            fn = REGISTRY[name].builder
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record and continue
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg[:300]
            print(f"bench: {name} FAILED: {msg}", file=sys.stderr)

    spark.sparkContext.setLogLevel("ERROR")
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        # A partial total compares unlike sets across rounds, so when
        # any query failed the headline value is null — consumers must
        # look at "queries"/"errors" instead of misreading a partial
        # sum as a full-run total.
        "value": total if not errors else None,
        "unit": "sec",
        "queries": times,
        "n_measured": len(times),
        "n_expected": len(headline),
        "sf": sf,
        # Self-describing comparability: this is ONE fresh-JVM pass.
        # Identical code measured 13.94-16.45 s across six fresh JVMs
        # on an idle box (round 4, SCALING.md "noise band"); a
        # round-9 slow box SESSION separately measured 19.75 s on a
        # tree whose headline files were all untouched (that session
        # also ran the full scale sweep at a median 1.4x the prior
        # artifact on 20 code-identical queries) — the two spreads
        # are kept as distinct fields because they describe distinct
        # conditions. Treat round-over-round total deltas inside
        # these bands as box state, and per-query deltas under ~2x
        # between single runs as not attributable without an
        # interleaved same-JVM A/B.
        "runs_per_query": 1,
        "noise_band_ref": "SCALING.md#noise-band",
        "fresh_jvm_total_spread_sec": [13.94, 16.45],
        "loaded_box_session_total_sec": 19.75,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()

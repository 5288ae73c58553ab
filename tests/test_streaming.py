"""Structured Streaming end-to-end: file-source micro-batches →
windowed/stateful queries → memory sink.

Two guarantees under test:
* streaming-batch equivalence — the streaming tumbling aggregation
  over the full replayed table equals the batch twin exactly
  (complete mode so file-arrival order cannot drop windows),
* watermark late-data semantics — a deterministic two-file sequence
  where the second file is entirely behind the watermark; its rows
  must be dropped from append-mode output.
"""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from map_reduce_showcase_spark.sources.tables import load_table
from map_reduce_showcase_spark.streaming.demo import (
    EVENTS_SCHEMA,
    materialize_events_for_streaming,
    read_events_stream,
    streaming_dedup,
    streaming_tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/events"
        materialize_events_for_streaming(spark, sf_dir, out, n_files=4)
        yield out


def _run_available_now(spark, stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_tumbling_equals_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_available_now(
        spark, streaming_tumbling_counts(stream), "t_tumbling", "complete"
    ).select("window_start", "event_type", "n_events")

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    emitted = sorted(tuple(map(str, r)) for r in got.collect())
    expected = sorted(tuple(map(str, r)) for r in batch.collect())
    assert emitted == expected


def test_streaming_session_window_stateful(spark, sf_dir):
    """session_window runs stateful in streaming: replay the events
    table in chronological micro-batches (watermark advances
    monotonically) and compare finalized sessions to the batch twin."""
    events = load_table(spark, sf_dir, "events").orderBy("ts").toPandas()
    third = len(events) // 3
    chunks = [events.iloc[:third], events.iloc[third : 2 * third], events.iloc[2 * third :]]
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(chunks[0], schema=EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("t_sessions")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            for chunk in chunks[1:]:
                spark.createDataFrame(chunk, schema=EVENTS_SCHEMA).coalesce(
                    1
                ).write.mode("append").parquet(src)
                q.processAllAvailable()
        finally:
            q.stop()
        got = spark.table("t_sessions")
        batch = (
            load_table(spark, sf_dir, "events")
            .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
        )
        emitted = {tuple(map(str, r)) for r in got.collect()}
        expected = {tuple(map(str, r)) for r in batch.collect()}
        # append emits only watermark-finalized sessions: every one
        # must be correct, and most sessions finalize during replay
        assert emitted <= expected
        assert len(emitted) >= 0.6 * len(expected)


def test_stateful_running_totals_match_batch(spark, sf_dir, events_dir):
    """applyInPandasWithState: per-user running totals across
    micro-batches; each user's final update equals the batch
    aggregate."""
    from map_reduce_showcase_spark.streaming.stateful import (
        streaming_user_running_totals,
    )

    stream = read_events_stream(spark, events_dir)
    q = (
        streaming_user_running_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    final = (
        spark.table("t_state")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {(r["user_id"], r["n_events"]) for r in final.collect()}
    want = {(r["user_id"], r["n_events"]) for r in batch.collect()}
    assert got == want


def test_foreach_batch_sink_exactly_once_shape(spark, sf_dir, events_dir):
    """foreachBatch parquet sink: every input row lands exactly once
    across the replayed micro-batches, tagged with its batch id."""
    from map_reduce_showcase_spark.streaming.demo import write_stream_foreach_batch

    with tempfile.TemporaryDirectory() as d:
        stream = read_events_stream(spark, events_dir)
        q = write_stream_foreach_batch(stream, f"{d}/out", f"{d}/ckpt")
        q.awaitTermination(120)
        out = spark.read.parquet(f"{d}/out")
        n_in = load_table(spark, sf_dir, "events").count()
        assert out.count() == n_in
        assert out.select("event_id").distinct().count() == n_in
        assert out.select("_batch_id").distinct().count() >= 2, "multiple micro-batches expected"


def test_streaming_dedup_emits_each_id_once(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    deduped = _run_available_now(spark, streaming_dedup(stream), "t_dedup", "append")
    n = deduped.count()
    assert n > 0
    assert n == deduped.select("event_id").distinct().count()


def _mk_events(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=EVENTS_SCHEMA)


def test_watermark_drops_late_file(spark):
    """File 1 advances the watermark to 11:00−30m; file 2's 08:00
    event is behind it and must never appear in append output."""
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        _mk_events(
            spark,
            [
                (1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
                (2, "2024-01-01 11:00:00", 1, "click", 1.0, "{}"),
            ],
        ).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = streaming_tumbling_counts(stream, watermark="30 minutes")
        q = (
            agg.writeStream.format("memory")
            .queryName("t_late")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            # late file: 08:00 is far behind watermark (10:30)
            _mk_events(
                spark, [(3, "2024-01-01 08:00:00", 1, "click", 1.0, "{}")]
            ).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            # one more on-time file to flush finalized windows
            _mk_events(
                spark, [(4, "2024-01-01 13:00:00", 1, "click", 1.0, "{}")]
            ).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
        out = {str(r["window_start"]) for r in spark.table("t_late").collect()}
        assert "2024-01-01 08:00:00" not in out, "late row must be dropped"
        assert "2024-01-01 10:00:00" in out, "on-time window must finalize"


def test_stream_stream_join_equals_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join (purchase ⋈ preceding-hour clicks
    per user) replayed with availableNow must equal the identical
    batch join — micro-batch arrival order and watermark buffering
    must not lose or duplicate matches."""
    from map_reduce_showcase_spark.streaming.demo import (
        streaming_click_purchase_join,
    )

    stream = read_events_stream(spark, events_dir)
    # replay files are repartitioned (time-disordered across
    # micro-batches), so equivalence needs a watermark wider than the
    # whole replayed span — watermark EVICTION semantics is covered
    # by the dedicated late-data test; this test pins join results
    got = _run_available_now(
        spark,
        streaming_click_purchase_join(stream, watermark="90 days"),
        "t_ssjoin",
        "append",
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = purchases.alias("p").join(
        clicks.alias("c"),
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    ).select(
        "purchase_id", F.col("p.user_id").alias("user_id"),
        "purchase_ts", "click_id", "click_ts",
    )

    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert want_rows, "batch twin must produce matches"
    assert got_rows == want_rows


def test_checkpoint_resume_processes_each_file_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once across RESTARTS: run an availableNow stream to
    completion, stop it, land new input files, and resume from the
    SAME checkpoint — the second run must process only the new
    files (no reprocessing, no duplicates), and the union of both
    runs' outputs must equal the batch aggregation over all input.
    This is the recovery contract a 100 TB/day ingest depends on:
    the checkpoint's file-source log is the source of truth for
    what has been consumed."""
    in_dir = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    in_dir.mkdir()

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    first, second = ev.filter(F.col("user_id") % 2 == 0), ev.filter(
        F.col("user_id") % 2 == 1
    )
    first.coalesce(1).write.mode("overwrite").parquet(str(in_dir / "batch1"))

    # flat passthrough to a parquet sink (an aggregation would need a
    # watermark for append mode); dedup/total checks run on the sink
    def run_epoch_flat():
        stream = (
            spark.readStream.schema("user_id BIGINT, value DOUBLE")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{in_dir}/*/")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_epoch_flat()
    n_after_first = spark.read.parquet(out_dir).count()
    assert n_after_first == first.count()

    second.coalesce(1).write.mode("overwrite").parquet(str(in_dir / "batch2"))
    run_epoch_flat()
    out = spark.read.parquet(out_dir)
    # no duplicates: total equals batch union, and per-user sums match
    assert out.count() == ev.count()
    got = out.agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("c")
    ).first()["c"]
    want = ev.agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("c")
    ).first()["c"]
    assert got == want


def test_exactly_once_restart_driver_query(spark, sf_dir):
    """The registered driver-surface twin of the checkpoint-resume
    test: its per-phase census must equal the batch GROUP BY over
    the whole events table (each row landed exactly once across the
    two availableNow epochs), with both phases present."""
    from map_reduce_showcase_spark.plans.queries_streaming import (
        streaming_exactly_once_restart,
    )

    got = {
        r["phase"]: (r["n_rows"], r["n_users"])
        for r in streaming_exactly_once_restart(spark, sf_dir).collect()
    }
    want = {
        r["phase"]: (r["n_rows"], r["n_users"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy(
            (1 + F.pmod(F.col("user_id"), F.lit(2))).cast("int").alias("phase")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .collect()
    }
    assert set(got) == {1, 2}
    assert got == want


def test_event_time_timeout_evicts_idle_user_state(spark, tmp_path):
    """Watermark-driven state eviction for the custom stateful
    operator: user 2 goes idle; when user 1's later events advance
    the watermark past user 2's (last_ts + gap) timeout, user 2's
    state expires — exactly one is_final row — and never reappears.
    Event-time timeouts make this fully deterministic (no wall
    clock): the batch sequence alone decides which keys expire."""
    from map_reduce_showcase_spark.streaming.stateful import (
        streaming_user_sessions_with_timeout,
    )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _mk_events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 10:01:00", 2, "click", 1.0, "{}"),
        ],
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_user_sessions_with_timeout(stream)
        .writeStream.format("memory")
        .queryName("t_timeout")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # user 1 keeps going two hours later — watermark (max - 30m)
        # sails past user 2's 10:31 timeout
        _mk_events(
            spark, [(3, "2024-01-01 12:00:00", 1, "click", 1.0, "{}")]
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # one more batch so the armed timeout actually fires
        _mk_events(
            spark, [(4, "2024-01-01 12:30:00", 1, "click", 1.0, "{}")]
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("t_timeout").collect()
    finals = [r for r in rows if r["is_final"]]
    assert [(r["user_id"], r["n_events"]) for r in finals] == [(2, 1)], rows
    # user 1 stayed active: running rows only, no final
    assert all(not r["is_final"] for r in rows if r["user_id"] == 1)


def test_stream_scratch_retires_on_source_change(spark, tmp_path, sf_dir):
    """The streaming replay scratch dir is keyed by (source content
    signature, query projection): same content+projection → same dir
    (copy reused); touched/regenerated content, content rewritten
    with PRESERVED mtime (cp -p style), or an edited projection →
    different dir (a stale or wrong-schema replay copy can never be
    served)."""
    import os
    import shutil

    from map_reduce_showcase_spark.plans.queries_streaming import _stream_dirs

    src = tmp_path / "sf"
    src.mkdir()
    ev = src / "events.parquet"
    shutil.copy(f"{sf_dir}/events.parquet", ev)
    d1, c1, ready1 = _stream_dirs(spark, "unittest", str(src), "a:int")
    assert not ready1  # nothing materialized yet
    # checkpoint dir is per-application: a concurrent session on
    # this machine gets a different ckpt and can't rmtree this one
    assert spark.sparkContext.applicationId in os.path.basename(c1)
    d1b, _c, _r = _stream_dirs(spark, "unittest", str(src), "a:int")
    assert d1 == d1b  # unchanged source+projection → same scratch dir
    dp, _c, _r = _stream_dirs(spark, "unittest", str(src), "a:int,b:string")
    assert dp != d1  # edited projection → fresh dir (schema safety)
    os.utime(ev)  # simulate regeneration
    d2, _c, _r = _stream_dirs(spark, "unittest", str(src), "a:int")
    assert d2 != d1  # content signature moved → fresh dir
    # rewrite content but put the old mtime back (cp -p / rsync -a):
    # the tail byte sample must still retire the dir
    st = os.stat(ev)
    with open(ev, "r+b") as fh:
        fh.seek(max(st.st_size - 16, 0))
        tail = fh.read(16)
        fh.seek(max(st.st_size - 16, 0))
        fh.write(bytes(b ^ 0xFF for b in tail))
    os.utime(ev, ns=(st.st_atime_ns, st.st_mtime_ns))
    d3, _c, _r = _stream_dirs(spark, "unittest", str(src), "a:int")
    assert d3 not in (d1, d2)  # footer bytes moved despite same size+mtime


def _age_tree(path, age_s=2 * 86400):
    """Set every mtime under ``path`` (dirs and files) to ``age_s``
    seconds ago — simulating a tree nobody wrote OR used since."""
    import os
    import time

    old = time.time() - age_s
    for root, dirs, files in os.walk(path, topdown=False):
        for n in files + dirs:
            os.utime(os.path.join(root, n), (old, old))
    os.utime(path, (old, old))


def test_sweep_stale_scratch_reclaims_only_aged_siblings(tmp_path):
    """Shared-/tmp scratch hygiene: dirs whose ENTIRE tree aged out
    are reclaimed; recent dirs (live concurrent sessions) and
    explicitly kept names survive; a missing base is a no-op."""
    import os

    from map_reduce_showcase_spark.session import sweep_stale_scratch

    base = tmp_path / "scratch"
    for name in ("app_old", "app_recent", "app_mine"):
        (base / name).mkdir(parents=True)
        (base / name / "f").write_text("x")
    _age_tree(base / "app_old")
    sweep_stale_scratch(str(base), keep={"app_mine"})
    assert sorted(os.listdir(base)) == ["app_mine", "app_recent"]
    # keep wins even over age
    _age_tree(base / "app_mine")
    sweep_stale_scratch(str(base), keep={"app_mine"})
    assert "app_mine" in os.listdir(base)
    sweep_stale_scratch(str(base / "does-not-exist"), keep=set())  # no raise


def test_sweep_capped_scan_still_reclaims_big_dead_trees(tmp_path, monkeypatch):
    """Round 7's cap behavior made any tree with more entries than
    the scan cap immortal (`_newest_mtime` returned time.time() on
    hitting it) — a crashed session's large checkpoint accumulated
    in /tmp forever. Now the decision comes from the BFS-sampled
    prefix: an entirely aged big tree is reclaimed; a big tree whose
    shallow prefix carries a fresh liveness signal (the root
    ``touch_scratch`` stamp every reuse path refreshes) survives."""
    import functools
    import os

    from map_reduce_showcase_spark import session as sess

    base = tmp_path / "scratch"
    for name in ("big_dead", "big_live"):
        d = base / name
        for sub in range(8):
            (d / f"sub{sub}").mkdir(parents=True)
            for f in range(8):
                (d / f"sub{sub}" / f"f{f}").write_text("x")
        _age_tree(d)
    # 1 root + 8 dirs + 64 files = 73 entries per tree; cap below it
    real_newest = sess._newest_mtime
    monkeypatch.setattr(
        sess, "_newest_mtime", functools.partial(real_newest, max_entries=16)
    )
    sess.touch_scratch(str(base / "big_live"))  # fresh root stamp
    sess.sweep_stale_scratch(str(base), keep=set())
    assert sorted(os.listdir(base)) == ["big_live"]


def test_sweep_hotspot_stat_survives_adversarial_fanout(tmp_path, monkeypatch):
    """ADVICE r8: a live checkpoint whose ONLY fresh mtimes sit past
    the capped BFS sample (a dir with more direct children than the
    cap, all sorting before ``offsets``, root stamp not refreshed)
    could be mis-swept. The known liveness hotspots — ``offsets/``
    and ``commits/`` — are now stat-ed unconditionally before the
    walk, so no fan-out can hide them."""
    import functools
    import os

    from map_reduce_showcase_spark import session as sess

    base = tmp_path / "scratch"
    ckpt = base / "ckpt_fanout"
    # 40 aged direct children that BFS-sort BEFORE "offsets"; with the
    # cap at 16 the sample never reaches the offsets dir itself
    for i in range(40):
        (ckpt / f"a{i:03d}").mkdir(parents=True)
    (ckpt / "offsets").mkdir()
    (ckpt / "offsets" / "0").write_text("batch0")
    _age_tree(ckpt)
    # a NEW batch lands: only offsets/ (direct child added) is fresh
    (ckpt / "offsets" / "1").write_text("batch1")
    old = __import__("time").time() - 2 * 86400
    os.utime(ckpt, (old, old))  # root stamp NOT refreshed
    real_newest = sess._newest_mtime
    monkeypatch.setattr(
        sess, "_newest_mtime", functools.partial(real_newest, max_entries=16)
    )
    sess.sweep_stale_scratch(str(base), keep=set())
    assert os.listdir(base) == ["ckpt_fanout"], "live checkpoint swept"


def test_sweep_liveness_is_usage_based(tmp_path):
    """A candidate is swept only when old AND unused. POSIX dir mtime
    alone is NOT liveness — it goes stale while nested checkpoint
    files keep being written (offsets/commits land two levels down)
    and never moves on reads at all — so liveness is the NEWEST
    nested mtime plus the ``touch_scratch`` stamp reuse paths
    refresh (``ensure_bucketed`` re-reading a day-old bucketed
    copy)."""
    import os
    import time

    from map_reduce_showcase_spark.session import sweep_stale_scratch, touch_scratch

    base = tmp_path / "scratch"
    for name in ("ckpt_live", "bkt_touched", "app_dead"):
        (base / name / "sub").mkdir(parents=True)
        (base / name / "sub" / "f").write_text("x")
        _age_tree(base / name)
    # live checkpoint: top dir old, but a NESTED commit file is fresh
    (base / "ckpt_live" / "sub" / "commits").write_text("b1")
    # day-old bucketed copy, just re-read: the reuse path stamps it
    touch_scratch(str(base / "bkt_touched"))
    sweep_stale_scratch(str(base), keep=set())
    assert sorted(os.listdir(base)) == ["bkt_touched", "ckpt_live"]
    # the stamp is "last used", so it decays: re-age and it sweeps
    _age_tree(base / "bkt_touched")
    old = time.time() - 2 * 86400
    os.utime(base / "ckpt_live" / "sub" / "commits", (old, old))
    _age_tree(base / "ckpt_live")
    sweep_stale_scratch(str(base), keep=set())
    assert os.listdir(base) == []
    touch_scratch(str(base / "nonexistent"))  # best-effort: no raise


def test_stream_replay_claim_is_atomic(spark, tmp_path):
    """The shared replay copy is claimed via staged-write + rename:
    the winner's complete copy is installed; a later writer keeps
    the winner's copy and discards its own stage; a PARTIAL copy
    occupying in_dir (no _SUCCESS — a crashed legacy writer) is
    replaced, not served."""
    import os

    from map_reduce_showcase_spark.plans.queries_streaming import _ensure_replay

    base = tmp_path / "scratch"
    base.mkdir()
    in_dir = str(base / "in")

    def write_v1(p):
        os.makedirs(p)
        open(f"{p}/part-0", "w").write("v1")
        open(f"{p}/_SUCCESS", "w").close()

    _ensure_replay(spark, in_dir, write_v1)
    assert open(f"{in_dir}/part-0").read() == "v1"

    def write_v2(p):
        os.makedirs(p)
        open(f"{p}/part-0", "w").write("v2")
        open(f"{p}/_SUCCESS", "w").close()

    # loser path: in_dir already complete → keep v1, stage discarded
    _ensure_replay(spark, in_dir, write_v2)
    assert open(f"{in_dir}/part-0").read() == "v1"
    assert not [e for e in os.listdir(base) if e.startswith("in_stage")]

    # partial occupant (no _SUCCESS) must be replaced
    os.remove(f"{in_dir}/_SUCCESS")
    _ensure_replay(spark, in_dir, write_v2)
    assert open(f"{in_dir}/part-0").read() == "v2"
    assert os.path.exists(f"{in_dir}/_SUCCESS")
    # the flock was released: the (inert, never-unlinked) lock file
    # is immediately acquirable by the next contender
    import fcntl

    fd = os.open(str(base / "in_evict.lock"), os.O_CREAT | os.O_WRONLY)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)  # raises if held
    finally:
        os.close(fd)


def test_stream_replay_partial_eviction_respects_lock(spark, tmp_path, monkeypatch):
    """Evicting a partial replay occupant is guarded by an exclusive
    flock with the _SUCCESS re-check inside it: while another session
    HOLDS the flock, this session contends instead of rmtree-ing (the
    holder may be mid-rename of a complete copy — the round-6 race);
    once the holder releases, eviction proceeds. A lock FILE left by
    a crashed holder (the kernel released its flock with the process)
    blocks nobody — round 8's path-based protocol made every
    contender wait out a 60 s age heuristic for exactly this case,
    and its stale-lock break carried a rename TOCTOU (ADVICE r8)."""
    import fcntl
    import os
    import threading
    import time

    from map_reduce_showcase_spark.plans import queries_streaming as qs

    base = tmp_path / "scratch"
    base.mkdir()
    in_dir = str(base / "in")
    os.makedirs(in_dir)
    open(f"{in_dir}/part-0", "w").write("partial")  # no _SUCCESS

    def write_v2(p):
        os.makedirs(p)
        open(f"{p}/part-0", "w").write("v2")
        open(f"{p}/_SUCCESS", "w").close()

    lock = str(base / "in_evict.lock")
    hold_for = 1.2
    held = threading.Event()

    def live_holder():
        fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        fcntl.flock(fd, fcntl.LOCK_EX)
        held.set()
        time.sleep(hold_for)
        os.close(fd)  # releases

    holder = threading.Thread(target=live_holder, daemon=True)
    holder.start()
    assert held.wait(5)
    t0 = time.time()
    out = qs._ensure_replay(spark, in_dir, write_v2)
    waited = time.time() - t0
    holder.join()
    # contended while the flock was held, then evicted once released
    assert waited >= 1.0, "evicted while another session held the flock"
    assert out == in_dir
    assert open(f"{in_dir}/part-0").read() == "v2"
    assert os.path.exists(f"{in_dir}/_SUCCESS")

    # a lock FILE whose holder crashed (no live flock) blocks nobody:
    # eviction proceeds immediately, no age heuristic
    os.remove(f"{in_dir}/_SUCCESS")
    open(f"{in_dir}/part-0", "w").write("partial")
    assert os.path.exists(lock)  # inert leftover from the first pass
    t0 = time.time()
    out = qs._ensure_replay(spark, in_dir, write_v2)
    assert time.time() - t0 < 30, "waited on a lock nobody holds"
    assert out == in_dir
    assert open(f"{in_dir}/part-0").read() == "v2"
    assert os.path.exists(f"{in_dir}/_SUCCESS")


def test_stream_replay_unresolved_lock_serves_own_complete_copy(
    spark, tmp_path, monkeypatch
):
    """The round-7 fall-through read WRONG ROWS: when every lock
    attempt failed and no _SUCCESS ever appeared, the loser discarded
    its complete staging copy and the caller streamed the partial
    occupant. Now the deadline path returns the session's own
    complete staging copy — a flock held by a live-but-stuck holder
    for the whole window must never lead to a partial source."""
    import fcntl
    import os
    import threading

    from map_reduce_showcase_spark.plans import queries_streaming as qs

    monkeypatch.setattr(qs, "_EVICT_WAIT_MAX_S", 1.5)
    base = tmp_path / "scratch"
    base.mkdir()
    in_dir = str(base / "in")
    os.makedirs(in_dir)
    open(f"{in_dir}/part-0", "w").write("partial")  # no _SUCCESS

    lock = str(base / "in_evict.lock")
    stop = threading.Event()
    held = threading.Event()

    def stuck_holder():
        # a live holder that never finishes its eviction: holds the
        # flock until told to stop
        fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        fcntl.flock(fd, fcntl.LOCK_EX)
        held.set()
        stop.wait()
        os.close(fd)

    holder = threading.Thread(target=stuck_holder, daemon=True)
    holder.start()
    assert held.wait(5)
    try:
        def write_v2(p):
            os.makedirs(p)
            open(f"{p}/part-0", "w").write("v2")
            open(f"{p}/_SUCCESS", "w").close()

        out = qs._ensure_replay(spark, in_dir, write_v2)
    finally:
        stop.set()
        holder.join()
    # deadline exhausted: the session serves its OWN complete copy,
    # never the partial occupant
    assert out != in_dir
    assert os.path.basename(out).startswith("in_stage")
    assert open(f"{out}/part-0").read() == "v2"
    assert os.path.exists(f"{out}/_SUCCESS")
    # the loser never acquired the flock, so the partial occupant is
    # NOT evicted — rmtree without holding the lock is the round-6
    # race this whole protocol exists to prevent
    assert open(f"{in_dir}/part-0").read() == "partial"  # untouched


def test_stream_replay_environmental_lock_error_resolves_immediately(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9: only PermissionError means cross-user contention.
    Any other OSError from opening the lock file (ENOSPC, EROFS, a
    racing scratch sweep removing the parent — here modeled by a
    DIRECTORY squatting on the lock path, IsADirectoryError) is
    environmental: the old blanket handler busy-waited the FULL
    deadline before serving the staging copy, masking a hard failure
    into a one-minute stall per call. It must now fall through to the
    own-staging-copy resolution immediately."""
    import os
    import time

    from map_reduce_showcase_spark.plans import queries_streaming as qs

    # generous deadline so a regression to contend-and-wait is
    # unmistakable in the elapsed time, not just slow
    monkeypatch.setattr(qs, "_EVICT_WAIT_MAX_S", 30)
    base = tmp_path / "scratch"
    base.mkdir()
    in_dir = str(base / "in")
    os.makedirs(in_dir)
    open(f"{in_dir}/part-0", "w").write("partial")  # no _SUCCESS
    os.makedirs(str(base / "in_evict.lock"))  # os.open(..., O_WRONLY) → EISDIR

    def write_v2(p):
        os.makedirs(p)
        open(f"{p}/part-0", "w").write("v2")
        open(f"{p}/_SUCCESS", "w").close()

    t0 = time.time()
    out = qs._ensure_replay(spark, in_dir, write_v2)
    elapsed = time.time() - t0
    assert elapsed < 10, f"busy-waited {elapsed:.1f}s on an environmental error"
    assert out != in_dir
    assert os.path.basename(out).startswith("in_stage")
    assert open(f"{out}/part-0").read() == "v2"

    # and when the staging copy is ALSO unusable, it raises instead
    # of stalling: incomplete stage + environmental lock error is a
    # hard failure, not a deadline wait. (in_dir keeps its non-empty
    # partial occupant so the fast-path rename still loses — an EMPTY
    # in_dir would be replaced by rename() outright.)
    assert os.path.exists(f"{in_dir}/part-0")

    def write_partial(p):
        os.makedirs(p)
        open(f"{p}/part-0", "w").write("v2")  # no _SUCCESS

    t0 = time.time()
    try:
        qs._ensure_replay(spark, in_dir, write_partial)
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    assert time.time() - t0 < 10
    assert open(f"{in_dir}/part-0").read() == "partial"  # untouched


def test_stamp_increasing_mtimes_orders_parts_by_filename(tmp_path):
    """The shared replay-mtime stamper (round-12 review: extracted so
    a hardening can't be applied to one stateful fixture and missed
    in the other): part files get strictly increasing mtimes in
    FILENAME order regardless of their natural (task-completion)
    mtimes, non-part files are untouched, all stamps land in the
    past, and later appends stamped at time.time() sort after every
    part."""
    import os
    import time

    from map_reduce_showcase_spark.plans import queries_streaming as qs

    p = tmp_path / "in"
    p.mkdir()
    # natural mtimes deliberately REVERSED vs filename order — the
    # concurrent-task hazard the stamper exists to fix
    now = time.time()
    names = [f"part-{i:05d}" for i in range(5)]
    for i, name in enumerate(names):
        f = p / name
        f.write_text("x")
        os.utime(f, (now - i * 10, now - i * 10))
    marker = p / "_SUCCESS"
    marker.write_text("")
    os.utime(marker, (now - 999, now - 999))

    stamped = qs._stamp_increasing_mtimes(str(p))

    assert [os.path.basename(f) for f in stamped] == names
    mts = [os.path.getmtime(str(p / n)) for n in names]
    assert all(b > a for a, b in zip(mts, mts[1:]))
    assert all(m < time.time() for m in mts)  # backdated: appends win
    assert os.path.getmtime(marker) == pytest.approx(now - 999, abs=1)
    # empty dir: no crash, nothing stamped
    empty = tmp_path / "empty"
    empty.mkdir()
    assert qs._stamp_increasing_mtimes(str(empty)) == []

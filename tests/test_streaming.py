"""Structured-streaming tests: file-source ingestion of the repos table →
incremental edge extraction, and event-time windowed aggregation — each
drained with availableNow and checked against the batch twin."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from l_space_spark import streaming
from l_space_spark.extract import extract_edge_names
from l_space_spark.synth import generate_repos


def test_stream_edge_extraction_matches_batch(spark, tmp_path):
    src = str(tmp_path / "repos_in")
    ckpt = str(tmp_path / "ckpt1")
    out = str(tmp_path / "edges_out")
    repos = generate_repos(spark, 60, 2, seed=42)
    # land the input as multiple files → multiple micro-batches
    repos.repartition(4).write.parquet(src)

    stream = streaming.stream_repos_from_files(spark, src, max_files_per_trigger=2)
    edges_stream = streaming.stream_extract_edges(stream)
    streaming.run_available_now(edges_stream, ckpt, out)

    got = spark.read.parquet(out).select("src_repo", "dst_repo").distinct()
    want = extract_edge_names(spark.read.parquet(src)).select(
        "src_repo", "dst_repo"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # incremental restart: new files only → appends, no reprocessing
    more = generate_repos(spark, 60, 2, seed=43)
    more.repartition(2).write.mode("append").parquet(src)
    stream2 = streaming.stream_repos_from_files(spark, src)
    streaming.run_available_now(streaming.stream_extract_edges(stream2), ckpt, out)
    got2 = spark.read.parquet(out).select("src_repo", "dst_repo").distinct()
    want2 = extract_edge_names(spark.read.parquet(src)).select(
        "src_repo", "dst_repo"
    )
    assert got2.count() == want2.count()


def test_windowed_event_counts_match_batch(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    if not os.path.exists(src):
        pytest.skip("driver testdata missing")
    ckpt = str(tmp_path / "ckpt2")

    events = spark.read.parquet(src)
    # file-source streams read DIRECTORIES; stage the table as one
    events_dir = str(tmp_path / "events_in")
    events.write.parquet(events_dir)
    stream = spark.readStream.schema(events.schema).parquet(events_dir)
    windowed = streaming.windowed_event_counts(stream, window="1 hour",
                                               watermark="2 hours")
    streaming.run_available_now_to_memory(windowed, "win_counts", ckpt,
                                          output_mode="append")
    # append mode emits only windows sealed by the watermark; every emitted
    # row must match the batch computation exactly
    got = spark.table("win_counts")
    batch = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("window_start"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    assert got.count() > 0
    assert got.join(
        batch, ["window_start", "event_type", "n"], "left_anti"
    ).count() == 0


def test_sessionize_stateful_matches_batch_twin(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    if not os.path.exists(src):
        pytest.skip("driver testdata missing")
    ckpt = str(tmp_path / "ckpt3")

    events = spark.read.parquet(src)
    # single file → single deterministic micro-batch (ordering caveat in
    # the operator docstring)
    events_dir = str(tmp_path / "sess_in")
    events.coalesce(1).write.parquet(events_dir)
    stream = spark.readStream.schema(events.schema).parquet(events_dir)
    sess = streaming.sessionize_stateful(stream, gap_seconds=43200)
    streaming.run_available_now_to_memory(sess, "sessions", ckpt,
                                          output_mode="append")
    got = spark.table("sessions")

    from l_space_spark.queries import q_sessionize_events

    batch = q_sessionize_events(spark, "/root/testdata/sf0.001")
    # the stream emits CLOSED sessions; each user's open tail (max sid)
    # stays in state — batch minus tails must equal the drained output
    from pyspark.sql import Window

    w = F.max("sid").over(Window.partitionBy("user_id"))
    closed_batch = (
        batch.withColumn("last_sid", w)
        .where(F.col("sid") != F.col("last_sid"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
    # the stream emits raw timestamps; the batch entry emits epoch-us
    # (driver-canonicalizer dtype hardening) — align here
    got_us = got.select(
        "user_id",
        F.unix_micros(F.col("session_start").cast("timestamp"))
        .alias("session_start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp"))
        .alias("session_end_us"),
        "n_events",
    )
    assert got_us.count() == closed_batch.count()
    assert got_us.exceptAll(closed_batch).count() == 0
    assert got.count() > 0


def test_kafka_payload_roundtrip_and_writer_config(spark, tmp_path):
    """Kafka sink: the JSON payload half round-trips through from_json
    (value is the full row, key the partition identity); the streaming
    writer configures format/topic/checkpoint without needing a broker."""
    from pyspark.sql import functions as F

    from l_space_spark.streaming import (
        kafka_payload, stream_repos_from_files, write_stream_kafka,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    p = kafka_payload(df, key_col="id")
    assert p.columns == ["key", "value"]
    back = p.select(
        F.col("key"),
        F.from_json(F.col("value"), "id long, name string").alias("r"),
    ).select("key", "r.id", "r.name")
    assert {tuple(r) for r in back.collect()} == {("1", 1, "a"), ("2", 2, "b")}

    # writer wiring (construction only — no kafka jar/broker in sandbox)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = stream_repos_from_files(spark, src)  # any stream df works
    w = write_stream_kafka(stream, topic="t", bootstrap_servers="b:9092",
                           checkpoint_dir=str(tmp_path / "ck"))
    assert w is not None  # configured DataStreamWriter


def test_sessionize_kernel_orders_across_arrow_chunks():
    """Regression for the cross-chunk ordering bug: a group's rows arriving
    as several Arrow chunks with timestamps out of order ACROSS the chunk
    boundary must produce the same sessions as one sorted chunk — the old
    per-chunk sort let a late chunk's earlier event silently extend a
    session past the gap."""
    import pandas as pd

    from l_space_spark.streaming import _sessionize_group

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists, self._v = True, v

    GAP_US = 10 * 1_000_000  # 10 s

    def run(chunks):
        st = FakeState()
        out = list(_sessionize_group(
            (7,), iter(chunks), st, gap_us=GAP_US, ts_col="ts",
            order_col="event_id",
        ))
        return out, st._v

    def chunk(ts_secs, eid0=0):
        return pd.DataFrame({
            "ts": pd.to_datetime([s * 1_000_000 for s in ts_secs], unit="us"),
            "event_id": range(eid0, eid0 + len(ts_secs)),
        })

    # events 0s,1s | 30s,31s — but delivered as [30,31] then [0,1]:
    # sorted globally there are TWO sessions (gap 29 s > 10 s); the buggy
    # per-chunk handling saw 30,31,0(!),1 and folded everything into one
    out_split, state_split = run([chunk([30, 31], 2), chunk([0, 1], 0)])
    out_one, state_one = run([chunk([0, 1, 30, 31])])
    assert state_split == state_one  # open tail: (30s, 31s, 2)
    closed_split = pd.concat(out_split) if out_split else pd.DataFrame()
    closed_one = pd.concat(out_one) if out_one else pd.DataFrame()
    pd.testing.assert_frame_equal(
        closed_split.reset_index(drop=True), closed_one.reset_index(drop=True)
    )
    assert len(closed_split) == 1  # the 0-1 s session closed
    assert closed_split.iloc[0]["n_events"] == 2


def test_reorder_kernel_releases_sorted_watermark_prefix():
    """Unit: the reorder kernel buffers across batches, releases only the
    ≤-watermark prefix sorted by (ts, event_id), and retains the rest."""
    import pandas as pd

    from l_space_spark.streaming import _reorder_group

    class FakeState:
        def __init__(self, wm_ms):
            self.exists, self._v, self._wm = False, None, wm_ms

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists, self._v = True, v

        def getCurrentWatermarkMs(self):
            return self._wm

    def chunk(secs, eids):
        return pd.DataFrame({
            "ts": pd.to_datetime([s * 1_000_000 for s in secs], unit="us"),
            "event_id": eids,
        })

    # batch 1: events at 50s,10s,30s; watermark 20s → only 10s released
    st = FakeState(wm_ms=20_000)
    out = list(_reorder_group((9,), iter([chunk([50, 10, 30], [1, 2, 3])]),
                              st, ts_col="ts", order_col="event_id",
                              key_col="user_id"))
    assert len(out) == 1 and list(out[0]["event_id"]) == [2]
    assert st._v == ([30_000_000, 50_000_000], [3, 1])  # retained, sorted

    # batch 2: watermark 60s, one more event at 40s → 30,40,50 out in order
    st._wm = 60_000
    out2 = list(_reorder_group((9,), iter([chunk([40], [4])]), st,
                               ts_col="ts", order_col="event_id",
                               key_col="user_id"))
    assert list(out2[0]["event_id"]) == [3, 4, 1]
    assert st._v == ([], [])


def test_reorder_stream_feeds_sessionizer_under_disorder(spark, tmp_path):
    """End-to-end: out-of-order multi-batch delivery → reorder stage →
    (file handoff) → stateful sessionizer equals the batch twin on every
    watermark-released event — the full two-stage streaming pipeline the
    sessionizer's ordering contract describes."""
    from pyspark.sql import Window

    from l_space_spark import streaming
    from l_space_spark.queries import SESSION_GAP_US

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    # repartition(3): rows scattered arbitrarily → cross-batch disorder
    ev.repartition(3).write.parquet(src)

    # stage 1: reorder with a delay larger than the total time span so
    # everything is buffered until the last batch's watermark, then
    # released in order; a final max-ts flush event is unnecessary because
    # availableNow advances the watermark past earlier batches' maxima
    reordered = streaming.reorder_stateful(
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
        .parquet(src),
        delay="1 second",
    )
    mid = str(tmp_path / "mid")
    streaming.run_available_now(reordered, str(tmp_path / "ck1"), mid)

    released = spark.read.parquet(mid)
    n_released = released.count()
    assert n_released > 0

    # stage 2: sessionize the reordered stream (single batch is fine — the
    # point is stage 1 restored per-key order)
    sess_stream = streaming.sessionize_stateful(
        spark.readStream.schema(released.schema).parquet(mid)
    )
    streaming.run_available_now_to_memory(
        sess_stream, "sess_reordered", str(tmp_path / "ck2"),
        output_mode="append",
    )
    got = spark.table("sess_reordered")

    # batch twin restricted to released events: closed sessions must match
    released_ids = released.select("user_id", "event_id")
    ev_released = ev.join(released_ids, ["user_id", "event_id"], "left_semi")
    # recompute sessions over the released subset with the same rule
    ev_released = ev_released.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev_released.withColumn("prev", F.lag("ts").over(w))
    new_sess = (
        F.col("prev").isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev"))
           > SESSION_GAP_US)
    ).cast("int")
    sid = F.sum(new_sess).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    twin = (
        lagged.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
    )
    tails = twin.groupBy("user_id").agg(F.max("sid").alias("sid"))
    closed_twin = twin.join(tails, ["user_id", "sid"], "left_anti").select(
        "user_id", "session_start", "session_end", "n_events"
    )
    got_sel = got.select("user_id", "session_start", "session_end", "n_events")
    assert got_sel.count() == closed_twin.count()
    assert got_sel.exceptAll(closed_twin).count() == 0


def test_interval_join_stream_matches_batch_twin(spark, tmp_path):
    """Watermarked stream-stream interval join over a view stream and a
    click stream reproduces the banded batch twin's pair set exactly
    (the watermark spans the fixture, so no pair ages out of state)."""
    src = "/root/testdata/sf0.001/events.parquet"
    if not os.path.exists(src):
        pytest.skip("driver testdata missing")
    events = spark.read.parquet(src)
    v_dir, c_dir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").alias("v_ts"))
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("c_ts"))
    views.coalesce(2).write.parquet(v_dir)
    clicks.coalesce(2).write.parquet(c_dir)

    vs = spark.readStream.schema(views.schema).parquet(v_dir)
    cs = spark.readStream.schema(clicks.schema).parquet(c_dir)
    joined = streaming.interval_join_stream(
        vs, cs, ["user_id"], "v_ts", "c_ts",
        band_s=24 * 3600, watermark="3650 days",
    )
    streaming.run_available_now_to_memory(
        joined, "ij_out", str(tmp_path / "ckpt_ij"), output_mode="append",
    )
    got = {(r["view_id"], r["click_id"])
           for r in spark.table("ij_out").collect()}

    from l_space_spark.queries import QUERIES

    want = {(r["view_id"], r["click_id"])
            for r in QUERIES["stream_interval_join_events"](
                spark, "/root/testdata/sf0.001").collect()}
    assert len(want) > 0
    assert got == want


def test_dedup_stream_matches_batch_twin(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the FIRST ARRIVED row per key;
    with files staged in event-time order (range-partitioned by ts, one
    file per micro-batch, single-partition files) arrival order equals
    event-time order, so the surviving set must equal the batch twin's
    min-ts row per key. The watermark spans the whole fixture so no key
    ages out of state mid-stream (bounded-state re-emission is the
    operator's documented contract, not the subject here)."""
    src = "/root/testdata/sf0.001/events.parquet"
    if not os.path.exists(src):
        pytest.skip("driver testdata missing")
    events = spark.read.parquet(src)
    events_dir = str(tmp_path / "ev_sorted")
    events.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.parquet(
        events_dir
    )
    # the file source orders batches by MODIFICATION TIME; stamp the range
    # files (part-0000N = ascending ts ranges) with ascending mtimes so
    # arrival order really is event-time order
    import time as _time

    t0 = _time.time()
    parts = sorted(f for f in os.listdir(events_dir)
                   if f.startswith("part-") and f.endswith(".parquet"))
    for i, f in enumerate(parts):
        os.utime(os.path.join(events_dir, f), (t0 + i, t0 + i))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(events_dir)
    )
    deduped = streaming.dedup_stream(
        stream, ["user_id", "event_type"], ts_col="ts", watermark="3650 days"
    )
    streaming.run_available_now_to_memory(
        deduped, "dedup_stream_out", str(tmp_path / "ckpt_dd"),
        output_mode="append",
    )
    got = {(r["user_id"], r["event_type"], r["ts_us"])
           for r in spark.table("dedup_stream_out")
           .select("user_id", "event_type",
                   F.unix_micros(F.col("ts").cast("timestamp"))
                   .alias("ts_us")).collect()}

    from l_space_spark.queries import QUERIES

    # the batch entry emits epoch-us (driver-canonicalizer hardening)
    batch = {(r["user_id"], r["event_type"], r["first_ts_us"])
             for r in QUERIES["dedup_stream_events"](
                 spark, "/root/testdata/sf0.001").collect()}
    assert {k[:2] for k in got} == {k[:2] for k in batch}
    # survivors carry the per-key minimum event time
    assert {k[:2]: k[2] for k in got} == {k[:2]: k[2] for k in batch}

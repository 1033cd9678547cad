"""Streaming equivalence, multimodal plumbing, and REST-source tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from taar_gcp_etl_spark.io import read_table
from taar_gcp_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    media_stats,
)
from taar_gcp_etl_spark.operators.windows import (
    session_window_agg,
    sessionize_gaps_and_islands,
    tumbling_window_agg,
)
from taar_gcp_etl_spark.sources.rest import fetch_urls, fetch_with_retry
from taar_gcp_etl_spark.streaming import jobs as stream_jobs
from tests.conftest import SF_SMOKE


class TestStreamingEquivalence:
    def test_streaming_tumbling_equals_batch(self, spark, tmp_path):
        """The streaming tumbling aggregation must produce exactly the batch
        result once all data is processed (same operator, same semantics —
        SURVEY.md §2.11 streaming posture)."""
        # re-write events as a clean parquet dir (the fixture is TIMESTAMP_NANOS
        # which the streaming file source cannot read)
        events = read_table(spark, SF_SMOKE, "events")
        src = str(tmp_path / "events_stream")
        events.repartition(4).write.parquet(src)

        stream = stream_jobs.read_event_stream(spark, src, max_files_per_trigger=2)
        agg = stream_jobs.tumbling_counts(stream)
        stream_jobs.run_to_memory(agg, "tumbling_out", output_mode="complete")
        got = {
            (r.window_start, r.event_type): (r.n, r.sum_value)
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }

        batch = tumbling_window_agg(
            events,
            "ts",
            "1 day",
            ["event_type"],
            [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
        )
        want = {
            (r.window_start, r.event_type): (r.n, r.sum_value)
            for r in batch.collect()
        }
        assert got == want

    def test_stateful_running_totals(self, spark, tmp_path):
        """applyInPandasWithState — state persists across micro-batches: the
        final running totals must equal the batch groupBy, with each user's
        state accumulated over multiple file-triggered batches."""
        events = read_table(spark, SF_SMOKE, "events")
        src = str(tmp_path / "events_state")
        events.repartition(4).write.parquet(src)

        stream = stream_jobs.read_event_stream(spark, src, max_files_per_trigger=1)
        totals = stream_jobs.running_user_totals(stream)
        q = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName("state_out")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # update mode emits one row per touched user per batch — the LAST
        # emission per user is the lifetime total
        final = spark.sql(
            """
            SELECT user_id, n_events, sum_value FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY n_events DESC
                ) rn FROM state_out
            ) WHERE rn = 1
            """
        )
        got = {r.user_id: (r.n_events, r.sum_value) for r in final.collect()}
        want = {
            r.user_id: (r.n, r.s)
            for r in events.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("s"),
            )
            .collect()
        }
        assert got == want

    def test_stateful_sessionizer_with_close_events(self, spark, tmp_path):
        """Side-output sessionizer: closed+open sessions across micro-batches
        must reconstruct exactly the batch gaps-and-islands sessions."""
        events = read_table(spark, SF_SMOKE, "events")
        src = tmp_path / "sess_src"
        src.mkdir()
        stream = stream_jobs.read_event_stream(spark, str(src), 999)
        out = stream_jobs.sessionize_with_close_events(stream, 1800)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("sess_out")
            .start()
        )
        # deliver in event-time-ordered batches (the operator's arrival
        # contract): one week per micro-batch
        for wk in range(5):
            lo, hi = f"2024-01-{1+wk*7:02d}", f"2024-01-{min(1+(wk+1)*7, 31):02d}"
            batch = events.filter(
                (F.col("ts") >= lo) & (F.col("ts") < hi)
            )
            batch.coalesce(1).write.mode("append").parquet(str(src))
            q.processAllAvailable()
        q.stop()
        # reconstruct: all closed sessions + the final 'open' emission per
        # user (the open session re-emits each batch; keep the last state =
        # max n_events per (user, session_start))
        final = spark.sql(
            """
            SELECT user_id, session_start, max(n_events) AS n
            FROM sess_out GROUP BY user_id, session_start
            """
        )
        got = {
            (r.user_id, r.session_start): r.n for r in final.collect()
        }
        batch = (
            sessionize_gaps_and_islands(events, "user_id", "ts", 1800)
            .groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("session_start"), F.count("*").alias("n"))
        )
        want = {(r.user_id, r.session_start): r.n for r in batch.collect()}
        assert got == want

    def test_session_window_equals_gaps_and_islands(self, spark):
        """session_window(ts, gap) must partition events identically to the
        lag+cumsum islands construction (the oracle-checkable form)."""
        events = read_table(spark, SF_SMOKE, "events")
        sw = session_window_agg(
            events, "ts", "30 minutes", ["user_id"], [F.count("*").alias("n")]
        )
        got = {
            (r.user_id, r.session_start): r.n
            for r in sw.select("user_id", "session_start", "n").collect()
        }
        gi = (
            sessionize_gaps_and_islands(events, "user_id", "ts", 1800)
            .groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("session_start"), F.count("*").alias("n"))
        )
        want = {(r.user_id, r.session_start): r.n for r in gi.collect()}
        assert got == want


def _await_stream(q, predicate, timeout_s=120):
    """Poll until `predicate()` holds, then stop the query. A rate source
    never runs dry, so processAllAvailable cannot terminate it — stopping
    on an observed condition is the harness contract (liveness enforced
    by the timeout)."""
    import time

    deadline = time.time() + timeout_s
    ok = False
    try:
        while time.time() < deadline:
            if predicate():
                ok = True
                break
            time.sleep(0.5)
    finally:
        q.stop()
    return ok


class TestRateSourceParity:
    """read_event_stream_rate: the rate-micro-batch replay source honors
    the same EVENTS_SCHEMA contract and windowed-operator semantics as
    the file source — and, unlike file drops, pins ARRIVAL ORDER at the
    source boundary, so watermark/late-data behavior is tested where it
    happens (VERDICT r3 next-4)."""

    def test_tumbling_equivalence_through_rate_source(self, spark, tmp_path):
        """Same assertion as the file-source equivalence test: once the
        fixture has fully replayed through the rate source, the streaming
        tumbling aggregate equals the batch operator exactly."""
        events = read_table(spark, SF_SMOKE, "events")
        src = str(tmp_path / "events_rate")
        events.repartition(4).write.parquet(src)
        total = events.count()

        stream = stream_jobs.read_event_stream_rate(
            spark, src, rows_per_batch=max(1, total // 3), order_col="ts"
        )
        agg = stream_jobs.tumbling_counts(stream)
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rate_tumbling_out")
            .start()
        )

        def all_delivered():
            rows = spark.sql(
                "SELECT coalesce(sum(n), 0) s FROM rate_tumbling_out"
            ).collect()
            return rows[0].s == total

        assert _await_stream(q, all_delivered), "fixture never fully replayed"

        got = {
            (r.window_start, r.event_type): (r.n, r.sum_value)
            for r in spark.sql("SELECT * FROM rate_tumbling_out").collect()
        }
        batch = tumbling_window_agg(
            events,
            "ts",
            "1 day",
            ["event_type"],
            [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
        )
        want = {
            (r.window_start, r.event_type): (r.n, r.sum_value)
            for r in batch.collect()
        }
        assert got == want

    def test_stateful_totals_through_rate_source(self, spark, tmp_path):
        events = read_table(spark, SF_SMOKE, "events")
        src = str(tmp_path / "events_rate_state")
        events.repartition(4).write.parquet(src)
        want = {
            r.user_id: (r.n, r.s)
            for r in events.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("s"),
            )
            .collect()
        }

        stream = stream_jobs.read_event_stream_rate(
            spark, src, rows_per_batch=max(1, events.count() // 3)
        )
        totals = stream_jobs.running_user_totals(stream)
        q = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName("rate_state_out")
            .start()
        )

        def totals_converged():
            final = spark.sql(
                """
                SELECT user_id, n_events, sum_value FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY user_id ORDER BY n_events DESC
                    ) rn FROM rate_state_out
                ) WHERE rn = 1
                """
            )
            got = {
                r.user_id: (r.n_events, r.sum_value) for r in final.collect()
            }
            return got == want

        assert _await_stream(q, totals_converged), "state never converged"

    def test_late_event_dropped_at_source_boundary(self, spark, tmp_path):
        """THE source-boundary late-data test: arrival order is pinned by
        event_id, so the seq-7 event (event-time 10:00:30) arrives two
        batches after the watermark passed its window — it must be
        dropped, and the closed 10:00 window must count 2, not 3. File
        drops cannot pin batch boundaries this precisely; the rate
        harness can. (One batch of separation matters: Spark filters
        late rows with the PREVIOUS batch's watermark and evicts with
        the current one, so a row arriving in the same batch its window
        closes still merges — pinning that nuance is exactly what a
        source-boundary harness is for.)"""
        import datetime as dt

        def ts(m, s):
            return dt.datetime(2024, 1, 1, 10, m, s)

        rows = [
            # (event_id = arrival order, ts, user, type, value, props)
            (1, ts(0, 10), 1, "a", 1.0, None),
            (2, ts(0, 20), 1, "a", 1.0, None),   # batch 0 ends
            (3, ts(30, 0), 1, "a", 1.0, None),
            (4, ts(30, 5), 1, "a", 1.0, None),   # batch 1 → wm 10:29:05
            (5, ts(40, 0), 1, "a", 1.0, None),
            (6, ts(40, 5), 1, "a", 1.0, None),   # batch 2: 10:00 win closes
            (7, ts(0, 30), 1, "a", 1.0, None),   # LATE: filter wm 10:29:05
            (8, ts(59, 0), 1, "a", 1.0, None),   # batch 3 → flush 10:40
        ]
        src = str(tmp_path / "late_src")
        spark.createDataFrame(
            rows, stream_jobs.EVENTS_SCHEMA
        ).write.parquet(src)

        stream = stream_jobs.read_event_stream_rate(
            spark, src, rows_per_batch=2
        )
        agg = stream_jobs.tumbling_counts(
            stream, width="1 minute", watermark="1 minute"
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("rate_late_out")
            .start()
        )

        def windows_closed():
            starts = {
                r.window_start
                for r in spark.sql(
                    "SELECT window_start FROM rate_late_out"
                ).collect()
            }
            return {ts(0, 0), ts(30, 0), ts(40, 0)} <= starts

        assert _await_stream(q, windows_closed), "windows never closed"
        got = {
            r.window_start: r.n
            for r in spark.sql("SELECT * FROM rate_late_out").collect()
        }
        assert got[ts(0, 0)] == 2  # late seq-7 event NOT counted
        assert got[ts(30, 0)] == 2
        assert got[ts(40, 0)] == 2


class TestLateData:
    def test_watermark_drops_late_events_in_append_mode(self, spark, tmp_path):
        """Late-data contract: with a 30-min watermark in append mode, a
        window only emits once the watermark passes its end, and an event
        arriving after that is DROPPED (never re-emits the closed window).
        Batch boundaries are controlled explicitly: file 1 advances the
        watermark far past the early window, file 2 delivers a very late
        event into that window."""
        import datetime as dt

        src = tmp_path / "late_src"
        src.mkdir()
        schema = stream_jobs.EVENTS_SCHEMA

        def write_file(name, rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))

        t0 = dt.datetime(2024, 1, 1, 0, 5)
        tlate = dt.datetime(2024, 1, 1, 12, 0)
        # batch 1: events in the 00:00 window + one at 12:00 that pushes the
        # watermark to 11:30, far past the 00:00-01:00 window's end
        write_file("b1", [
            (1, t0, 1, "click", 1.0, "{}"),
            (2, t0, 2, "click", 1.0, "{}"),
            (3, tlate, 3, "click", 1.0, "{}"),
        ])
        stream = stream_jobs.read_event_stream(spark, str(src), 999)
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("late_out")
            .start()
        )
        q.processAllAvailable()
        # batch 2: a very late event back in the (closed) 00:00 window
        write_file("b2", [(4, t0, 9, "click", 1.0, "{}")])
        q.processAllAvailable()
        # batch 3: advance watermark again so anything pending could flush
        write_file("b3", [(5, tlate + dt.timedelta(hours=2), 9, "click", 1.0, "{}")])
        q.processAllAvailable()
        q.stop()
        out = {r.ws: r.n for r in spark.sql("SELECT * FROM late_out").collect()}
        # the 00:00 window emitted with the ON-TIME count only — the late
        # event never bumped it to 3
        assert out[dt.datetime(2024, 1, 1, 0, 0)] == 2


class TestCogroupAsof:
    def test_cogroup_asof_equals_native(self, spark):
        """The pandas merge_asof formulation must agree with the native
        union+window as-of join on real data."""
        from taar_gcp_etl_spark.operators.joins import (
            asof_join_backward,
            asof_join_cogroup_pandas,
        )

        ev = read_table(spark, SF_SMOKE, "events")
        left = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        right = (
            ev.filter(F.col("event_type") == "error")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("err_id"))
        )
        native = {
            r.event_id: r.err_id
            for r in asof_join_backward(
                left, right, "user_id", "ts", "ts", "err_id"
            ).collect()
        }
        pandas_ver = {
            r.event_id: r.err_id
            for r in asof_join_cogroup_pandas(
                left, right, "user_id", "ts", "ts", "err_id"
            ).collect()
        }
        assert pandas_ver == native and len(native) > 0


class TestStreamDedup:
    def test_redelivered_events_dropped_within_watermark(self, spark, tmp_path):
        """Ingest-dedup: an event re-delivered in a later micro-batch (inside
        the watermark) must be emitted exactly once."""
        events = read_table(spark, SF_SMOKE, "events").limit(200)
        src = str(tmp_path / "dup_src")
        # two identical file drops = every event delivered twice, in
        # different micro-batches (maxFilesPerTrigger=1)
        events.coalesce(1).write.mode("overwrite").parquet(src)
        import glob
        import shutil

        part = glob.glob(f"{src}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/part-redelivery.parquet")

        deduped = stream_jobs.dedup_stream(
            stream_jobs.read_event_stream(spark, src, max_files_per_trigger=1)
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_out")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = spark.sql("SELECT event_id FROM dedup_out").collect()
        ids = [r.event_id for r in got]
        assert len(ids) == len(set(ids)) == events.count()


class TestStreamStreamJoin:
    def test_interval_join_equals_batch(self, spark, tmp_path):
        """The watermarked stream-stream LEFT OUTER interval join must
        converge to the batch left-join result once both streams drain:
        each 'view' event pairs with same-user 'click' events at most
        1 hour older, and a view with no such click is emitted with null
        right-side columns. Outer results only flush when the watermark
        passes the end of their match window, so after the real files a
        far-future sentinel event is appended to both streams to advance
        the watermark past every real event."""
        events = read_table(spark, SF_SMOKE, "events")
        views = events.filter(F.col("event_type") == "view")
        clicks = events.filter(F.col("event_type") == "click")
        vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
        views.repartition(2).write.parquet(vsrc)
        clicks.repartition(2).write.parquet(csrc)

        joined = stream_jobs.stream_stream_interval_join(
            stream_jobs.read_event_stream(spark, vsrc, 999),
            stream_jobs.read_event_stream(spark, csrc, 999),
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("ssj_out")
            .start()
        )
        q.processAllAvailable()
        # watermark-advancing sentinel on both sides (far future, unique
        # user so it matches nothing real)
        sentinel = events.limit(1).select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(-1).cast("long").alias("user_id"),
            *[
                F.col(c)
                for c in events.columns
                if c not in ("event_id", "user_id", "ts")
            ],
            (F.col("ts") + F.expr("INTERVAL 1000 HOURS")).alias("ts"),
        ).select(*events.columns)
        sentinel.coalesce(1).write.mode("append").parquet(vsrc)
        sentinel.coalesce(1).write.mode("append").parquet(csrc)
        q.processAllAvailable()
        q.stop()
        got = {
            (r.user_id, r.l_event_id, r.r_event_id)
            for r in spark.sql(
                "SELECT * FROM ssj_out WHERE user_id != -1"
            ).collect()
        }

        want = {
            (r.user_id, r.l_event_id, r.r_event_id)
            for r in views.alias("l")
            .join(
                clicks.alias("r"),
                F.expr(
                    "l.user_id = r.user_id AND "
                    "r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts"
                ),
                "left",
            )
            .select(
                F.col("l.user_id").alias("user_id"),
                F.col("l.event_id").alias("l_event_id"),
                F.col("r.event_id").alias("r_event_id"),
            )
            .collect()
        }
        assert len(want) > 0
        unmatched = {t for t in want if t[2] is None}
        assert len(unmatched) > 0, "fixture should have unmatched views"
        assert got == want


class TestForeachBatchSink:
    def test_stream_to_serving_table(self, spark, tmp_path):
        """foreachBatch serving sink: after the stream drains, the store
        holds one packed row per source event, key-prefix partitioned."""
        events = read_table(spark, SF_SMOKE, "events")
        src = str(tmp_path / "ev_src")
        events.repartition(3).write.parquet(src)
        serving = str(tmp_path / "serving")
        q = stream_jobs.stream_to_serving_table(
            stream_jobs.read_event_stream(spark, src, max_files_per_trigger=1),
            serving,
            str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        store = spark.read.parquet(serving)
        assert store.count() == events.count()
        assert set(store.columns) == {"key", "payload", "key_prefix", "epoch_id"}
        assert store.select("key").distinct().count() == events.count()

    def test_epoch_replay_is_idempotent(self, spark, tmp_path):
        """A replayed micro-batch (same epoch_id) overwrites its own epoch
        partition instead of appending — the failure-between-write-and-
        checkpoint-commit case."""
        events = read_table(spark, SF_SMOKE, "events").limit(50)
        serving = str(tmp_path / "serving_replay")
        stream_jobs.write_serving_epoch(events, 7, serving)
        first = spark.read.parquet(serving).count()
        stream_jobs.write_serving_epoch(events, 7, serving)  # replay
        assert spark.read.parquet(serving).count() == first == 50


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            Row(
                media_id=1,
                kind="image",
                # unknown format → deterministic stub features (PNG and
                # baseline JPEG decode for real now)
                content=bytes([10, 20, 30, 40]),
                meta=Row(
                    mime="application/octet-stream",
                    width=2,
                    height=2,
                    duration_ms=None,
                ),
            ),
            Row(
                media_id=2,
                kind="video",
                content=bytes(range(64)),
                meta=Row(mime="video/mp4", width=16, height=9, duration_ms=3500),
            ),
            Row(media_id=3, kind="image", content=None, meta=None),
        ]
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_media_stats_column_only(self, media):
        got = {r.media_id: r for r in media_stats(media).collect()}
        assert got[1].n_bytes == 4
        assert got[1].sha256 == hashlib.sha256(bytes([10, 20, 30, 40])).hexdigest()
        assert got[3].n_bytes is None  # null content propagates

    def test_extract_features_batch_shape(self, media):
        got = {r.media_id: r for r in extract_features(media).collect()}
        assert got[1].feat[0] == pytest.approx(10 / 255)
        assert got[3].feat is None  # null-content row survives as null
        # r7: video/mp4 parses for real now — garbage bytes are a
        # CORRUPT container (null features), not stub input
        assert got[2].feat is None
        assert got[2].sha256 == hashlib.sha256(bytes(range(64))).hexdigest()

    def test_frame_sample_fanout(self, media):
        frames = frame_sample_plan(media, every_ms=1000).collect()
        # 3500ms video sampled at 1000ms → ts 0,1000,2000,3000
        assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000, 3000]


def _ppm_bytes(w, h, pixels):
    """Encode (h, w, 3) nested list as binary P6 PPM."""
    body = bytes(v for row in pixels for px in row for v in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def _bmp_bytes(w, h, pixels):
    """Encode (h, w, 3) nested RGB list as bottom-up 24-bit BMP."""
    import struct

    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    body = b""
    for row in reversed(pixels):  # bottom-up
        body += bytes(v for px in row for v in reversed(px)) + pad  # BGR
    offset = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", offset + len(body), 0, 0, offset
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + body


def _wav_bytes(samples, rate=8000):
    """Encode int16 mono samples as a PCM WAV."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            b"".join(struct.pack("<h", s) for s in samples)
        )
    return buf.getvalue()


def _gif_bytes(
    idx,
    palette,
    interlace=False,
    use_lct=False,
    v89=False,
    clear_every=16,
    subrect=None,
):
    """Reference GIF encoder (test-only), built from the spec
    independently of the decoder under test: writes the header /
    logical-screen descriptor / color tables / (optionally a GCE
    extension for the 89a path) / image descriptor, and LZW-codes the
    index stream with a fixed code width by emitting CLEAR every
    ``clear_every`` symbols (the classic low-compression GIF trick) —
    so a round-trip proves the decoder's variable-width bit unpacking,
    dictionary handling, and interlace reorder rather than mirroring
    its logic. ``idx`` is an (h, w) index array; ``palette`` an (n, 3)
    array; ``subrect=(left, top, sw, sh)`` writes the frame as a
    sub-rectangle of a larger logical screen."""
    import struct

    import numpy as np

    idx = np.asarray(idx)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    left, top, sw, sh = subrect if subrect else (0, 0, w, h)
    n_pal = palette.shape[0]
    pal_bits = max(1, (n_pal - 1).bit_length())
    pal_full = np.zeros((1 << pal_bits, 3), dtype=np.uint8)
    pal_full[:n_pal] = palette
    pal_bytes = pal_full.tobytes()

    out = bytearray(b"GIF89a" if v89 else b"GIF87a")
    gct_flag = 0 if use_lct else 0x80
    out += struct.pack(
        "<HHBBB", sw, sh, gct_flag | (pal_bits - 1), 0, 0
    )
    if not use_lct:
        out += pal_bytes
    if v89:  # a GCE the decoder must skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
    out += bytes(
        [(0x80 if use_lct else 0) | (0x40 if interlace else 0)
         | ((pal_bits - 1) if use_lct else 0)]
    )
    if use_lct:
        out += pal_bytes

    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[order]
    pixels = rows.flatten().tolist()

    mcs = max(2, pal_bits)
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    # a decoder table starts at 2^mcs + 2 entries and grows one per
    # code after the first; it widens at 2^(mcs+1) entries — clear
    # strictly before that so this encoder's fixed width stays in sync
    clear_every = min(clear_every, (1 << mcs) - 2) or 1
    bits = bytearray()
    acc = nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for k, px in enumerate(pixels):
        if k and k % clear_every == 0:
            put(clear)  # keep the dictionary small, width fixed
        put(px)
    put(end)
    if nbits:
        bits.append(acc & 0xFF)

    out += bytes([mcs])
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _gif_anim_bytes(frames, palette, clear_every=16):
    """Multi-frame (animated) GIF from the same spec-built writer as
    _gif_bytes: one global color table, one image descriptor + LZW
    stream per frame, GCE delay blocks between frames (89a)."""
    import struct

    import numpy as np

    palette = np.asarray(palette, dtype=np.uint8)
    frames = [np.asarray(f) for f in frames]
    h, w = frames[0].shape
    n_pal = palette.shape[0]
    pal_bits = max(1, (n_pal - 1).bit_length())
    pal_full = np.zeros((1 << pal_bits, 3), dtype=np.uint8)
    pal_full[:n_pal] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_full.tobytes()

    mcs = max(2, pal_bits)
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    ce = min(clear_every, (1 << mcs) - 2) or 1

    for idx in frames:
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE: 10cs delay
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        bits = bytearray()
        acc = nbits = 0

        def put(code):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                bits.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        put(clear)
        for k, px in enumerate(idx.flatten().tolist()):
            if k and k % ce == 0:
                put(clear)
            put(px)
        put(end)
        if nbits:
            bits.append(acc & 0xFF)
        out += bytes([mcs])
        for i in range(0, len(bits), 255):
            chunk = bits[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _png_bytes(img, color=2, filters=None, palette=None):
    """Reference PNG encoder (test-only): FORWARD-filters scanlines with
    the spec arithmetic independently of the decoder under test, so a
    decode roundtrip proves the unfilter logic rather than mirroring it.
    ``filters`` picks the per-row filter type (default None-filter)."""
    import struct
    import zlib

    import numpy as np

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    arr = img.reshape(h, w * ch).astype(np.int64)
    filters = filters or [0] * h
    raw = b""
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        row, f = arr[y], filters[y]
        out = np.zeros(w * ch, dtype=np.int64)
        for i in range(w * ch):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[f]
            out[i] = (row[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(out.astype(np.uint8))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", bytes(np.asarray(palette, np.uint8).reshape(-1)))
    return body + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def _jpeg_bytes(img, sampling=(1, 1), quant=1):
    """Reference baseline-JPEG encoder (test-only): forward DCT,
    quantize, zigzag, canonical Huffman — built from the spec
    independently of the decoder under test (own 9-bit-flat Huffman
    tables, own marker writer), so a roundtrip proves the decoder's
    entropy/zigzag/dequant/IDCT logic rather than mirroring it.
    ``sampling`` subsamples chroma by block averaging (e.g. (2, 2) for
    4:2:0); ``quant`` is a flat quantization value (1 = near-lossless)."""
    import struct

    import numpy as np

    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sh, sv = sampling

    A = np.array(
        [
            [
                (np.sqrt(0.125) if u == 0 else 0.5)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )

    def zigzag():
        out = []
        for s in range(15):
            rng = range(max(0, s - 7), min(s, 7) + 1)
            rows = reversed(rng) if s % 2 == 0 else rng
            out.extend(r * 8 + (s - r) for r in rows)
        return out

    ZZ = zigzag()
    qtab = np.full(64, quant, dtype=np.float64)

    # one flat 9-bit canonical table per class: DC symbols 0..11, AC the
    # standard (run,size) symbol set + EOB + ZRL
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_syms = sorted(set(ac_syms))

    def table_spec(syms):
        bits = [0] * 16
        bits[8] = len(syms)  # all codes length 9
        code = {s: i for i, s in enumerate(syms)}
        return bits, syms, code

    dc_bits, dc_vals, dc_code = table_spec(dc_syms)
    ac_bits, ac_vals, ac_code = table_spec(ac_syms)

    out = bytearray()
    bitbuf = []

    def put_bits(v, n):
        for k in range(n - 1, -1, -1):
            bitbuf.append((v >> k) & 1)

    def flush_bits():
        while len(bitbuf) % 8:
            bitbuf.append(1)  # pad with 1s per spec
        for i in range(0, len(bitbuf), 8):
            byte = 0
            for b in bitbuf[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
        bitbuf.clear()

    def magnitude(v):
        s = 0
        a = abs(v)
        while a:
            s += 1
            a >>= 1
        return s, (v if v >= 0 else v + (1 << s) - 1)

    def encode_block(block, pred):
        coef = A @ (block - 128.0) @ A.T
        q = np.round(coef.reshape(64) / qtab).astype(int)
        zz = q[ZZ]
        diff = int(zz[0]) - pred
        s, mv = magnitude(diff)
        put_bits(dc_code[s], 9)
        if s:
            put_bits(mv, s)
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                put_bits(ac_code[0xF0], 9)
                run -= 16
            s, mv = magnitude(int(zz[k]))
            put_bits(ac_code[(run << 4) | s], 9)
            put_bits(mv, s)
            run = 0
        if last < 63:
            put_bits(ac_code[0x00], 9)  # EOB
        return int(zz[0])

    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = (
            0.299 * rgb[:, :, 0]
            + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2]
        )
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]

        def down(p):
            if sh == 1 and sv == 1:
                return p
            hh = -(-p.shape[0] // sv) * sv
            ww = -(-p.shape[1] // sh) * sh
            pad = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
            return pad.reshape(hh // sv, sv, ww // sh, sh).mean(axis=(1, 3))

        planes = [y, down(cb), down(cr)]
        samps = [(sh, sv), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (chs, cvs) in zip(planes, samps):
        ph, pw = mcuy * cvs * 8, mcux * chs * 8
        padded.append(
            np.pad(
                p,
                ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                mode="edge",
            )
        )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    hdr = bytearray(b"\xff\xd8")
    hdr += seg(0xDB, bytes([0]) + bytes(int(v) for v in qtab[ZZ]))
    nc = len(planes)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci, (chs, cvs) in enumerate(samps):
        sof += bytes([ci + 1, (chs << 4) | cvs, 0])
    hdr += seg(0xC0, bytes(sof))
    hdr += seg(0xC4, bytes([0x00] + dc_bits) + bytes(dc_vals))
    hdr += seg(0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals))
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    hdr += seg(0xDA, bytes(sos))
    out += hdr

    preds = [0] * nc
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (p, (chs, cvs)) in enumerate(zip(padded, samps)):
            for by in range(cvs):
                for bx in range(chs):
                    y0 = (my * cvs + by) * 8
                    x0 = (mx * chs + bx) * 8
                    preds[ci] = encode_block(
                        p[y0 : y0 + 8, x0 : x0 + 8], preds[ci]
                    )
    flush_bits()
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_progressive_bytes(
    img, sampling=(1, 1), quant=1, split=5, restart=0
):
    """Reference PROGRESSIVE-JPEG (SOF2) encoder (test-only), built from
    ITU-T.81 §G independently of the decoder under test. Scan script
    exercises every progressive coding mode: interleaved DC first scan
    at Al=1, per-component AC first scans split into two spectral bands
    (1..split, split+1..63) at Al=1 with EOB-run coding, a DC
    refinement scan (raw bits), and per-component AC refinement scans
    (correction bits, ZRL folding, EOB-run correction buffering — the
    §G.2/libjpeg bit-ordering). ``restart`` emits DRI/RSTn every n MCUs
    in every scan."""
    import struct

    import numpy as np

    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sh, sv = sampling

    A = np.array(
        [
            [
                (np.sqrt(0.125) if u == 0 else 0.5)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    ZZ = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        rows = reversed(rng) if s % 2 == 0 else rng
        ZZ.extend(r * 8 + (s - r) for r in rows)
    qtab = np.full(64, quant, dtype=np.float64)

    # flat 9-bit canonical tables; AC set includes every EOBn symbol
    dc_syms = list(range(12))
    ac_syms = sorted(
        {(r << 4) | s for r in range(16) for s in range(1, 11)}
        | {n << 4 for n in range(15)}
        | {0xF0}
    )

    def table_spec(syms):
        bits = [0] * 16
        bits[8] = len(syms)
        return bits, syms, {s: i for i, s in enumerate(syms)}

    dc_bits, dc_vals, dc_code = table_spec(dc_syms)
    ac_bits, ac_vals, ac_code = table_spec(ac_syms)

    out = bytearray()
    bitbuf = []

    def put_bits(v, n):
        for k in range(n - 1, -1, -1):
            bitbuf.append((v >> k) & 1)

    def flush_bits():
        while len(bitbuf) % 8:
            bitbuf.append(1)
        for i in range(0, len(bitbuf), 8):
            byte = 0
            for b in bitbuf[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        bitbuf.clear()

    def magnitude(v):
        s = 0
        a = abs(v)
        while a:
            s += 1
            a >>= 1
        return s, (v if v >= 0 else v + (1 << s) - 1)

    # ---- color transform, subsample, pad to the MCU grid ----
    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = (
            128.0
            - 0.168736 * rgb[:, :, 0]
            - 0.331264 * rgb[:, :, 1]
            + 0.5 * rgb[:, :, 2]
        )
        cr = (
            128.0
            + 0.5 * rgb[:, :, 0]
            - 0.418688 * rgb[:, :, 1]
            - 0.081312 * rgb[:, :, 2]
        )

        def down(p):
            if sh == 1 and sv == 1:
                return p
            hh = -(-p.shape[0] // sv) * sv
            ww = -(-p.shape[1] // sh) * sh
            pad = np.pad(
                p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge"
            )
            return pad.reshape(hh // sv, sv, ww // sh, sh).mean(axis=(1, 3))

        planes = [y, down(cb), down(cr)]
        samps = [(sh, sv), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nc = len(planes)

    # quantized zigzag coefficients for every grid block, per component
    coefs = []
    for p, (chs, cvs) in zip(planes, samps):
        ph, pw = mcuy * cvs * 8, mcux * chs * 8
        pad = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
        arr = np.zeros((mcuy * cvs, mcux * chs, 64), dtype=np.int64)
        for by in range(arr.shape[0]):
            for bx in range(arr.shape[1]):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                c = A @ (blk - 128.0) @ A.T
                arr[by, bx] = np.round(c.reshape(64) / qtab).astype(
                    np.int64
                )[ZZ]
        coefs.append(arr)

    # effective (non-padding) block dims each NON-interleaved scan covers
    def eff(chs, cvs):
        comp_h = -(-h * cvs // vmax)
        comp_w = -(-w * chs // hmax)
        return -(-comp_h // 8), -(-comp_w // 8)

    def seg(marker, payload):
        return (
            bytes([0xFF, marker])
            + struct.pack(">H", len(payload) + 2)
            + payload
        )

    out += b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in qtab[ZZ]))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci, (chs, cvs) in enumerate(samps):
        sof += bytes([ci + 1, (chs << 4) | cvs, 0])
    out += seg(0xC2, bytes(sof))  # SOF2: progressive
    out += seg(0xC4, bytes([0x00] + dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))

    rst_n = [0]

    def emit_rst():
        flush_bits()
        out.append(0xFF)
        out.append(0xD0 + (rst_n[0] & 7))
        rst_n[0] += 1

    def sos_header(cids, ss, se, ah, al):
        sos = bytearray([len(cids)])
        for cid in cids:
            # DC scans use DC table 0; AC scans AC table 0
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(seg(0xDA, bytes(sos)))

    # ---- scan 1: interleaved DC first, Al=1 ----
    def dc_first_scan(al):
        sos_header(list(range(1, nc + 1)), 0, 0, 0, al)
        preds = [0] * nc
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                emit_rst()
                preds = [0] * nc
            my, mx = divmod(mcu, mcux)
            for ci, (chs, cvs) in enumerate(samps):
                for by in range(cvs):
                    for bx in range(chs):
                        v = int(coefs[ci][my * cvs + by, mx * chs + bx, 0])
                        v >>= al  # arithmetic shift: the DC point transform
                        diff = v - preds[ci]
                        preds[ci] = v
                        s, mv = magnitude(diff)
                        put_bits(dc_code[s], 9)
                        if s:
                            put_bits(mv, s)
        flush_bits()

    def dc_refine_scan(al):
        sos_header(list(range(1, nc + 1)), 0, 0, al + 1, al)
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                emit_rst()
            my, mx = divmod(mcu, mcux)
            for ci, (chs, cvs) in enumerate(samps):
                for by in range(cvs):
                    for bx in range(chs):
                        v = int(coefs[ci][my * cvs + by, mx * chs + bx, 0])
                        put_bits((v >> al) & 1, 1)
        flush_bits()

    def ac_first_scan(ci, ss, se, al):
        sos_header([ci + 1], ss, se, 0, al)
        chs, cvs = samps[ci]
        nby, nbx = eff(chs, cvs)
        eob = [0]

        def emit_eobrun():
            if eob[0]:
                n = eob[0].bit_length() - 1
                put_bits(ac_code[n << 4], 9)
                if n:
                    put_bits(eob[0] - (1 << n), n)
                eob[0] = 0

        for blk in range(nby * nbx):
            if restart and blk and blk % restart == 0:
                emit_eobrun()
                emit_rst()
            by, bx = divmod(blk, nbx)
            zz = coefs[ci][by, bx]
            r = 0
            for k in range(ss, se + 1):
                t = int(zz[k])
                a = abs(t) >> al
                if a == 0:
                    r += 1
                    continue
                emit_eobrun()
                while r > 15:
                    put_bits(ac_code[0xF0], 9)
                    r -= 16
                s, mv = magnitude(a if t > 0 else -a)
                put_bits(ac_code[(r << 4) | s], 9)
                put_bits(mv, s)
                r = 0
            if r:
                eob[0] += 1
                if eob[0] == 0x7FFF:
                    emit_eobrun()
        emit_eobrun()
        flush_bits()

    def ac_refine_scan(ci, ss, se, al):
        sos_header([ci + 1], ss, se, al + 1, al)
        chs, cvs = samps[ci]
        nby, nbx = eff(chs, cvs)
        eob = [0]
        be: list[int] = []  # correction bits pending with the EOB run

        def emit_eobrun():
            if eob[0]:
                n = eob[0].bit_length() - 1
                put_bits(ac_code[n << 4], 9)
                if n:
                    put_bits(eob[0] - (1 << n), n)
                for b in be:
                    put_bits(b, 1)
                be.clear()
                eob[0] = 0

        for blk in range(nby * nbx):
            if restart and blk and blk % restart == 0:
                emit_eobrun()
                emit_rst()
            by, bx = divmod(blk, nbx)
            zz = coefs[ci][by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            # index (band-relative) of the last NEWLY significant coef
            eobpos = -1
            for idx, a in enumerate(absv):
                if a == 1:
                    eobpos = idx
            r = 0
            br: list[int] = []
            for idx, a in enumerate(absv):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and idx <= eobpos:
                    emit_eobrun()
                    put_bits(ac_code[0xF0], 9)
                    r -= 16
                    for b in br:
                        put_bits(b, 1)
                    br.clear()
                if a > 1:  # previously significant: correction bit only
                    br.append(a & 1)
                    continue
                emit_eobrun()
                put_bits(ac_code[(r << 4) | 1], 9)
                put_bits(1 if int(zz[ss + idx]) > 0 else 0, 1)
                for b in br:
                    put_bits(b, 1)
                br.clear()
                r = 0
            if r > 0 or br:
                eob[0] += 1
                be.extend(br)
                if eob[0] == 0x7FFF:
                    emit_eobrun()
        emit_eobrun()
        flush_bits()

    # the scan script: DC first, AC first in two spectral bands per
    # component, DC refinement, AC refinements in the same bands
    dc_first_scan(1)
    for ci in range(nc):
        ac_first_scan(ci, 1, split, 1)
        ac_first_scan(ci, split + 1, 63, 1)
    dc_refine_scan(0)
    for ci in range(nc):
        ac_refine_scan(ci, 1, split, 0)
        ac_refine_scan(ci, split + 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


_IMGHDR_DATA = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
    "python3.11/test/imghdrdata"
)


class TestRealDecoders:
    """The uncompressed-format decode path is REAL (numpy/stdlib): bytes
    → pixels/samples → measured features, end to end through the Arrow
    mapInPandas plumbing — only compressed codecs remain stubbed."""

    PIXELS = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (255, 255, 255)],
    ]  # 2x2: red, green / blue, white

    def _expected_means(self):
        import numpy as np

        img = np.array(self.PIXELS, dtype=np.uint8)
        return img.reshape(-1, 3).mean(axis=0) / 255.0

    def test_ppm_decodes_to_true_pixels(self, spark):
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            decode_ppm,
            extract_features,
        )

        content = _ppm_bytes(2, 2, self.PIXELS)
        import numpy as np

        assert (decode_ppm(content) == np.array(self.PIXELS)).all()

        df = spark.createDataFrame(
            [
                Row(
                    media_id=10,
                    kind="image",
                    content=content,
                    meta=Row(
                        mime="image/x-portable-pixmap",
                        width=2,
                        height=2,
                        duration_ms=None,
                    ),
                )
            ],
            MEDIA_SCHEMA,
        )
        feat = extract_features(df).collect()[0].feat
        exp = self._expected_means()
        assert feat[0] == 2.0 and feat[1] == 2.0  # true decoded dims
        assert feat[2] == pytest.approx(exp[0])
        assert feat[3] == pytest.approx(exp[1])
        assert feat[4] == pytest.approx(exp[2])

    def test_bmp_roundtrip_matches_ppm(self, spark):
        """The same pixels through the BMP container (bottom-up rows,
        BGR order, 4-byte padding) must decode identically to the PPM."""
        import numpy as np

        from taar_gcp_etl_spark.operators.multimodal import (
            decode_bmp,
            decode_ppm,
        )

        bmp = decode_bmp(_bmp_bytes(2, 2, self.PIXELS))
        ppm = decode_ppm(_ppm_bytes(2, 2, self.PIXELS))
        assert (bmp == ppm).all()
        # odd width exercises the row padding
        px3 = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)]]
        assert (
            decode_bmp(_bmp_bytes(3, 1, px3)) == np.array(px3)
        ).all()

    def test_wav_features_measure_the_signal(self, spark):
        from taar_gcp_etl_spark.operators.multimodal import decode_media

        # full-scale square wave at 8 kHz: peak 1, RMS 1, zcr ~1
        square = [32767, -32768] * 100
        feat = decode_media(_wav_bytes(square, rate=8000), "audio/wav")
        assert feat[1] == 8000.0  # rate
        assert feat[0] == pytest.approx(200 / 8000.0)  # duration
        assert feat[4] == pytest.approx(1.0, abs=1e-4)  # peak
        assert feat[3] == pytest.approx(1.0, abs=1e-4)  # RMS
        assert feat[5] == pytest.approx(1.0, abs=1e-2)  # zero-cross rate

    def test_perceptual_dedup_finds_near_identical_images(self, spark):
        """Two 32x32 gradients differing by one dim pixel hash within
        Hamming distance 8 of each other; an inverted gradient does not.
        The pairing is the TEXT pipeline's banded Hamming join consuming
        image dHashes unchanged."""
        import numpy as np
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            media_near_dup,
        )

        g = np.tile(np.arange(32, dtype=np.uint8) * 8, (32, 1))
        base = np.stack([g, g, g], axis=2)
        tweaked = base.copy()
        tweaked[5, 5] = [3, 3, 3]  # tiny edit
        inverted = base[:, ::-1]  # mirrored gradient: different structure

        def ppm(img):
            h, w, _ = img.shape
            return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()

        rows = [
            Row(
                media_id=i,
                kind="image",
                content=ppm(img),
                meta=Row(
                    mime="image/x-portable-pixmap",
                    width=32,
                    height=32,
                    duration_ms=None,
                ),
            )
            for i, img in ((1, base), (2, tweaked), (3, inverted))
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        pairs = {
            (r.doc_a, r.doc_b)
            for r in media_near_dup(df, max_hamming=8).collect()
        }
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_png_roundtrip_every_filter_type(self, spark):
        """decode_png recovers exact pixels under each of the five
        scanline filters and a mixed-filter image — against the test's
        own forward-filtering encoder (stdlib zlib both sides)."""
        import numpy as np

        from taar_gcp_etl_spark.operators.multimodal import decode_png

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
        for fs in (
            [0] * 13,
            [1] * 13,
            [2] * 13,
            [3] * 13,
            [4] * 13,
            [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1, 2],
        ):
            assert (decode_png(_png_bytes(img, filters=fs)) == img).all()

    def test_png_color_types_normalize_to_rgb(self, spark):
        import numpy as np

        from taar_gcp_etl_spark.operators.multimodal import decode_png

        rng = np.random.default_rng(11)
        rgba = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
        assert (
            decode_png(_png_bytes(rgba, color=6)) == rgba[:, :, :3]
        ).all()
        gray = rng.integers(0, 256, (6, 7, 1), dtype=np.uint8)
        assert (
            decode_png(_png_bytes(gray, color=0))
            == np.repeat(gray, 3, axis=2)
        ).all()
        ga = rng.integers(0, 256, (6, 7, 2), dtype=np.uint8)
        assert (
            decode_png(_png_bytes(ga, color=4))
            == np.repeat(ga[:, :, :1], 3, axis=2)
        ).all()
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, (5, 6, 1), dtype=np.uint8)
        assert (
            decode_png(_png_bytes(idx, color=3, palette=pal))
            == pal[idx[:, :, 0]]
        ).all()

    def test_png_bmp_twins_dedup_through_shared_hamming_engine(
        self, spark
    ):
        """VERDICT r4 gate: the SAME image encoded as PNG and as BMP must
        land in one near-dup cluster (identical pixels → identical
        dHash), while a mirrored PNG stays apart — format-blind
        perceptual dedup through the banded Hamming join."""
        import numpy as np
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            media_near_dup,
        )

        g = np.tile(np.arange(32, dtype=np.uint8) * 8, (32, 1))
        base = np.stack([g, g, g], axis=2)

        def media_row(i, content, mime):
            return Row(
                media_id=i,
                kind="image",
                content=content,
                meta=Row(mime=mime, width=32, height=32, duration_ms=None),
            )

        rows = [
            media_row(
                1,
                _png_bytes(base, filters=[2] * 32),
                "image/png",
            ),
            media_row(
                2,
                _bmp_bytes(32, 32, base.tolist()),
                "image/bmp",
            ),
            media_row(
                3,
                _png_bytes(base[:, ::-1]),
                "image/png",
            ),
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        pairs = {
            (r.doc_a, r.doc_b)
            for r in media_near_dup(df, max_hamming=8).collect()
        }
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_dhash_deterministic_and_undecodable_dropped(self, spark):
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            media_dhash,
        )

        rows = [
            Row(
                media_id=1,
                kind="image",
                content=_ppm_bytes(2, 2, TestRealDecoders.PIXELS),
                meta=Row(
                    mime="image/x-portable-pixmap",
                    width=2,
                    height=2,
                    duration_ms=None,
                ),
            ),
            Row(
                media_id=2,
                kind="image",
                content=b"\x89PNG...",
                meta=Row(
                    mime="image/png", width=2, height=2, duration_ms=None
                ),
            ),
            Row(media_id=3, kind="image", content=None, meta=None),
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        a = {(r.media_id, r.simhash_hi, r.simhash_lo) for r in media_dhash(df).collect()}
        b = {(r.media_id, r.simhash_hi, r.simhash_lo) for r in media_dhash(df).collect()}
        assert a == b
        assert {r[0] for r in a} == {1}  # codec + null rows dropped

    def test_unknown_mime_falls_back_to_stub(self, spark):
        """Unmapped mimes keep the deterministic stub; video/mp4 no
        longer does — the container PARSES for real now (operators/
        mp4.py), so non-container bytes raise (corrupt), a real H.264
        container raises 'no sample decoder' (honest drop, its face is
        media_container_stats), and only MJPEG movies decode."""
        import pytest as _pytest

        from taar_gcp_etl_spark.operators.multimodal import (
            DECODE_ERRORS,
            _decode_image_stub,
            decode_media,
        )

        payload = bytes(range(16))
        assert decode_media(payload, "application/unknown") == (
            _decode_image_stub(payload)
        )
        with _pytest.raises(DECODE_ERRORS):
            decode_media(payload, "video/mp4")  # not a container

    def test_jpeg_roundtrip_444_near_lossless(self, spark):
        """Baseline JPEG through the test's own spec-built encoder at
        flat quant=1, 4:4:4: decode error is bounded by DCT rounding
        alone (a couple of levels), proving entropy/zigzag/dequant/IDCT
        against independent forward arithmetic."""
        import numpy as np

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg

        rng = np.random.default_rng(3)
        # smooth-ish image: random low-frequency field
        base = rng.integers(40, 216, (4, 4, 3)).astype(np.float64)
        img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)  # 32x32
        got = decode_jpeg(_jpeg_bytes(img, sampling=(1, 1), quant=1))
        assert got.shape == (32, 32, 3)
        err = np.abs(got.astype(float) - img.astype(float))
        assert err.mean() < 2.0 and err.max() <= 12.0

    def test_jpeg_420_subsampling_and_odd_dims(self, spark):
        """4:2:0 chroma subsampling with non-multiple-of-16 dimensions:
        luma survives nearly intact; chroma averages over 2x2 so a
        smooth image still roundtrips within a loose bound."""
        import numpy as np

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg

        yy, xx = np.mgrid[0:21, 0:19]
        img = np.stack(
            [
                (yy * 5 + 30) % 200,
                (xx * 5 + 60) % 200,
                ((yy + xx) * 3 + 90) % 200,
            ],
            axis=2,
        ).astype(np.uint8)
        got = decode_jpeg(_jpeg_bytes(img, sampling=(2, 2), quant=1))
        assert got.shape == (21, 19, 3)
        err = np.abs(got.astype(float) - img.astype(float))
        assert err.mean() < 8.0

    def test_jpeg_grayscale_single_component(self, spark):
        import numpy as np

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg

        g = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
        got = decode_jpeg(_jpeg_bytes(g, quant=1))
        assert got.shape == (16, 16, 3)
        assert (got[:, :, 0] == got[:, :, 1]).all()
        err = np.abs(got[:, :, 0].astype(float) - g.astype(float))
        assert err.mean() < 2.0

    def test_jpeg_real_encoder_fixture_matches_lossless_twin(self, spark):
        """CPython's imghdr test data ships the SAME 16x16 image as a
        real-encoder 4:2:0 JPEG and as lossless PPM/PNG — decoding the
        JPEG must land within lossy tolerance of the lossless twin.
        This cross-checks marker parsing, the standard Huffman tables,
        zigzag order, and subsampled reconstruction against an encoder
        that shares no code with this repo."""
        import os

        import numpy as np

        jpg_path = f"{_IMGHDR_DATA}/python.jpg"
        if not os.path.exists(jpg_path):
            pytest.skip("imghdr fixture data not present")
        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg
        from taar_gcp_etl_spark.operators.multimodal import (
            decode_png,
            decode_ppm,
        )

        jpg = decode_jpeg(open(jpg_path, "rb").read())
        ppm = decode_ppm(open(f"{_IMGHDR_DATA}/python.ppm", "rb").read())
        png = decode_png(open(f"{_IMGHDR_DATA}/python.png", "rb").read())
        assert (ppm == png).all()  # lossless twins agree exactly
        err = np.abs(jpg.astype(float) - ppm.astype(float))
        assert jpg.shape == ppm.shape
        assert err.mean() < 12.0  # lossy 4:2:0 on a 16px logo

    def test_jpeg_malformed_rejected_corrupt_dropped(self, spark):
        import pytest as _pytest

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg
        from taar_gcp_etl_spark.operators.multimodal import DECODE_ERRORS

        import numpy as np

        good = _jpeg_bytes(np.zeros((8, 8), dtype=np.uint8))
        # SOF0 relabeled SOF2 is a MALFORMED progressive stream (its one
        # scan claims DC with Se=63) — rejected, not silently decoded
        relabeled = bytearray(good)
        sof_at = relabeled.index(b"\xff\xc0")
        relabeled[sof_at + 1] = 0xC2
        with _pytest.raises(DECODE_ERRORS, match="Se"):
            decode_jpeg(bytes(relabeled))
        lossless = bytearray(good)
        lossless[sof_at + 1] = 0xC3  # SOF3: genuinely unsupported
        with _pytest.raises(DECODE_ERRORS, match="supported"):
            decode_jpeg(bytes(lossless))
        with _pytest.raises(DECODE_ERRORS):
            decode_jpeg(good[: len(good) // 2])  # truncated entropy data
        with _pytest.raises(DECODE_ERRORS):
            decode_jpeg(b"\xff\xd8\xff\xee\x00\x04ab")  # no SOF/SOS
        # progressive SOS naming a component missing from SOF must be a
        # droppable DECODE_ERRORS, not a task-killing KeyError
        prog = bytearray(
            _jpeg_progressive_bytes(np.zeros((8, 8), dtype=np.uint8))
        )
        sos_at = prog.index(b"\xff\xda")
        prog[sos_at + 5] = 9  # bogus component id in the scan header
        with _pytest.raises(DECODE_ERRORS, match="unknown component"):
            decode_jpeg(bytes(prog))

    def test_jpeg_missing_tables_and_segments_are_clean_rejections(
        self, spark
    ):
        """ADVICE r5: KeyError (undefined DQT/DHT id) and StopIteration
        (fewer entropy segments than restart intervals demand) must
        surface as ValueError — StopIteration would PEP-479-convert to
        RuntimeError inside the mapInPandas generator and escape
        DECODE_ERRORS, failing the whole job on one corrupt blob."""
        import pytest as _pytest

        import numpy as np

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg

        good = _jpeg_bytes(np.zeros((8, 8), dtype=np.uint8))

        # (a) scan references a DQT id that was never transmitted
        bad_dqt = bytearray(good)
        at = bad_dqt.index(b"\xff\xdb")
        assert bad_dqt[at + 4] & 15 == 0  # precision<<4 | table id 0
        bad_dqt[at + 4] |= 0x01  # relabel as table 1; comp still wants 0
        with _pytest.raises(ValueError, match="quant table"):
            decode_jpeg(bytes(bad_dqt))

        # (b) scan component's Td/Ta points at Huffman tables never sent
        bad_dht = bytearray(good)
        sos = bad_dht.index(b"\xff\xda")
        bad_dht[sos + 6] = 0x55  # Td=5 / Ta=5 for the first component
        with _pytest.raises(ValueError, match="Huffman table"):
            decode_jpeg(bytes(bad_dht))

        # (c) DRI promises a restart every MCU, but the stream carries a
        # single entropy segment for a 2-MCU image
        two_mcu = _jpeg_bytes(np.zeros((8, 16), dtype=np.uint8))
        sos = two_mcu.index(b"\xff\xda")
        short = two_mcu[:sos] + b"\xff\xdd\x00\x04\x00\x01" + two_mcu[sos:]
        with _pytest.raises(ValueError, match="missing segment"):
            decode_jpeg(short)

    def test_jpeg_non_interleaved_sequential_rejected(self, spark):
        """ADVICE r5: a spec-valid multi-scan non-interleaved sequential
        JPEG (SOS subsets the frame components) is out of baseline
        scope — must reject with the documented ValueError, not
        mis-decode or KeyError."""
        import pytest as _pytest

        import numpy as np

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg

        rgb = np.zeros((8, 8, 3), dtype=np.uint8)
        full = _jpeg_bytes(rgb)
        sos = full.index(b"\xff\xda")
        ns = full[sos + 4]
        assert ns == 3
        # rewrite the SOS header to scan only the first component
        cid, tt = full[sos + 5], full[sos + 6]
        tail = full[sos + 4 + 1 + 2 * ns :]  # Ss Se AhAl + entropy data
        subset = (
            full[:sos]
            + b"\xff\xda"
            + bytes([0, 8, 1, cid, tt])
            + tail
        )
        with _pytest.raises(
            ValueError, match="non-interleaved sequential"
        ):
            decode_jpeg(subset)

    def test_jpeg_progressive_444_matches_baseline_decode(self, spark):
        """The SAME image through the progressive encoder (spectral
        bands + successive approximation + EOB runs) and the baseline
        encoder must decode to near-identical pixels: progressive
        coding is lossless re-ordering of the same quantized
        coefficients, so any divergence is a scan-merging bug."""
        import numpy as np

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg

        rng = np.random.default_rng(7)
        base = rng.integers(30, 226, (4, 5, 3)).astype(np.float64)
        img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)  # 32x40
        prog = _jpeg_progressive_bytes(img, quant=1, split=5)
        # SOF2 present, and at least the script's 9 scans (byte-pair
        # count can over-match inside table payloads, never under)
        assert b"\xff\xc2" in prog and prog.count(b"\xff\xda") >= 9
        got_p = decode_jpeg(prog)
        got_b = decode_jpeg(_jpeg_bytes(img, quant=1))
        assert got_p.shape == (32, 40, 3)
        # identical coefficients either way: tiny IDCT-rounding slack
        assert np.abs(
            got_p.astype(float) - got_b.astype(float)
        ).max() <= 1.0
        err = np.abs(got_p.astype(float) - img.astype(float))
        assert err.mean() < 2.0

    def test_jpeg_progressive_420_odd_dims_and_restarts(self, spark):
        """4:2:0 progressive with non-multiple-of-16 dims exercises the
        interleaved DC scan over multi-block MCUs AND the non-
        interleaved AC traversal of the luma's effective (not padded)
        block grid; restart intervals reset DC predictors and EOB runs
        mid-scan."""
        import numpy as np

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg

        yy, xx = np.mgrid[0:21, 0:19]
        img = np.stack(
            [
                (yy * 5 + 30) % 200,
                (xx * 5 + 60) % 200,
                ((yy + xx) * 3 + 90) % 200,
            ],
            axis=2,
        ).astype(np.uint8)
        got = decode_jpeg(
            _jpeg_progressive_bytes(img, sampling=(2, 2), quant=1, restart=2)
        )
        assert got.shape == (21, 19, 3)
        err = np.abs(got.astype(float) - img.astype(float))
        assert err.mean() < 8.0

    def test_jpeg_progressive_grayscale_flat_region_eob_runs(self, spark):
        """A mostly-flat grayscale image makes every AC first scan one
        long EOB run (EOBn symbols with n > 0) and the refinement scans
        pure correction-bit bands — the run-length paths a busy image
        never hits."""
        import numpy as np

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg

        g = np.full((40, 40), 120, dtype=np.uint8)
        g[:8, :8] = np.tile(np.arange(8, dtype=np.uint8) * 30, (8, 1))
        got = decode_jpeg(_jpeg_progressive_bytes(g, quant=1))
        assert got.shape == (40, 40, 3)
        err = np.abs(got[:, :, 0].astype(float) - g.astype(float))
        assert err.mean() < 2.0

    def test_gif_roundtrip_gct_and_lct(self, spark):
        """Spec-built encoder → decoder round-trip: exact pixel
        recovery through GIF LZW for global- and local-color-table
        variants, 87a and 89a (with a GCE extension to skip)."""
        import numpy as np

        from taar_gcp_etl_spark.operators.gif import decode_gif

        rng = np.random.RandomState(3)
        pal = rng.randint(0, 256, size=(7, 3)).astype(np.uint8)
        idx = rng.randint(0, 7, size=(9, 13)).astype(np.uint8)
        expect = pal[idx]
        for kw in (
            {},
            {"use_lct": True},
            {"v89": True},
            {"clear_every": 1},
        ):
            got = decode_gif(_gif_bytes(idx, pal, **kw))
            assert got.shape == (9, 13, 3)
            assert np.array_equal(got, expect), kw

    def test_gif_interlace_and_subrect_compose(self, spark):
        import numpy as np

        from taar_gcp_etl_spark.operators.gif import decode_gif

        rng = np.random.RandomState(4)
        pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
        idx = rng.randint(0, 16, size=(11, 6)).astype(np.uint8)
        got = decode_gif(_gif_bytes(idx, pal, interlace=True))
        assert np.array_equal(got, pal[idx])
        # frame as a sub-rectangle of a larger logical screen: composed
        # onto a background-color canvas
        got2 = decode_gif(
            _gif_bytes(idx, pal, subrect=(3, 2, 12, 15))
        )
        assert got2.shape == (15, 12, 3)
        assert np.array_equal(got2[2:13, 3:9], pal[idx])
        assert (got2[0, 0] == pal[0]).all()  # bg index 0

    def test_gif_malformed_rejected(self, spark):
        """Every corrupt-GIF shape is a clean DECODE_ERRORS rejection:
        bad signature, truncated LZW, code beyond dictionary, pixel
        index beyond palette, missing image block."""
        import numpy as np
        import pytest as _pytest

        from taar_gcp_etl_spark.operators.gif import decode_gif
        from taar_gcp_etl_spark.operators.multimodal import DECODE_ERRORS

        pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
        idx = np.zeros((4, 4), dtype=np.uint8)
        good = _gif_bytes(idx, pal)
        with _pytest.raises(DECODE_ERRORS, match="signature"):
            decode_gif(b"NOTAGIF" + good[7:])
        with _pytest.raises(DECODE_ERRORS):
            decode_gif(good[: len(good) - 8])  # truncated stream
        # flip high bits inside the LZW payload → code beyond dict
        bad = bytearray(good)
        data_at = len(good) - 4
        bad[data_at] ^= 0xFF
        with _pytest.raises(DECODE_ERRORS):
            decode_gif(bytes(bad))
        with _pytest.raises(DECODE_ERRORS, match="no image"):
            decode_gif(good[:13] + pal.tobytes() + b"\x00" * 0 + b"\x3b")

    def test_gif_animation_frames_iterate_and_sample(self, spark):
        """iter_gif_frames decodes every image descriptor; the
        fingerprint face samples evenly when the animation is longer
        than max_frames."""
        import numpy as np

        from taar_gcp_etl_spark.operators.gif_frames import (
            gif_frame_hashes,
            iter_gif_frames,
        )

        rng = np.random.RandomState(9)
        pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
        frames = [
            rng.randint(0, 8, size=(10, 12)).astype(np.uint8)
            for _ in range(5)
        ]
        blob = _gif_anim_bytes(frames, pal)
        got = list(iter_gif_frames(blob))
        assert len(got) == 5
        for g, idx in zip(got, frames):
            assert np.array_equal(g, pal[idx])
        long_blob = _gif_anim_bytes(frames * 4, pal)  # 20 frames
        hashes = gif_frame_hashes(long_blob, max_frames=4)
        ks = [k for k, _, _ in hashes]
        assert len(ks) == 4 and ks == sorted(ks)
        assert ks[0] == 0 and ks[-1] == 19

    def test_gif_frame_hashes_max_frames_edge_cases(self, spark):
        """ADVICE r6: max_frames=1 on a longer animation must sample
        one frame, not divide by zero; max_frames<=0 is a config
        defect and raises TypeError — NOT a DECODE_ERRORS member, so
        an executor-side `except DECODE_ERRORS` containment cannot
        silently drop the corpus over a bad argument; the DataFrame
        face additionally fails at plan time on the driver."""
        import numpy as np
        import pytest as _pytest

        from taar_gcp_etl_spark.operators.gif_frames import (
            gif_frame_hashes,
        )
        from taar_gcp_etl_spark.operators.multimodal import (
            media_frame_dhash,
        )

        rng = np.random.RandomState(11)
        pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
        frames = [
            rng.randint(0, 8, size=(8, 8)).astype(np.uint8)
            for _ in range(5)
        ]
        blob = _gif_anim_bytes(frames, pal)
        got = gif_frame_hashes(blob, max_frames=1)
        assert len(got) == 1 and got[0][0] == 0
        from taar_gcp_etl_spark.operators.multimodal import DECODE_ERRORS

        for bad in (0, -3):
            with _pytest.raises(TypeError, match="max_frames") as ei:
                gif_frame_hashes(blob, max_frames=bad)
            assert not isinstance(ei.value, DECODE_ERRORS)
        # and the DataFrame face fails at plan time on the driver
        with _pytest.raises(TypeError, match="max_frames"):
            media_frame_dhash(spark.range(0), max_frames=0)

    def test_animated_near_dup_uniform_animation_copies(self, spark):
        """ADVICE r6: shared_frames counts matched frame INSTANCES
        (multiset intersection), so two exact copies of a static-loop
        animation — every sampled frame identical — match at the
        default min_shared_frames=2 instead of collapsing to 1."""
        import numpy as np
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            animated_near_dup,
        )

        rng = np.random.RandomState(12)
        pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
        still = rng.randint(0, 8, size=(16, 16)).astype(np.uint8)
        uniform = [still] * 4  # static loop: 4 identical frames

        def media_row(i, frames):
            return Row(
                media_id=i, kind="image",
                content=_gif_anim_bytes(frames, pal),
                meta=Row(mime="image/gif", width=16, height=16,
                         duration_ms=None),
            )

        df = spark.createDataFrame(
            [media_row(1, uniform), media_row(2, uniform)],
            MEDIA_SCHEMA,
        )
        pairs = {
            (r.doc_a, r.doc_b): r.shared_frames
            for r in animated_near_dup(df, min_shared_frames=2).collect()
        }
        assert pairs.get((1, 2), 0) == 4

    def test_animated_near_dup_survives_reorder_and_trim(self, spark):
        """Two animations sharing frames (one is a reordered trim of
        the other) pair on shared frame hashes; a third with disjoint
        frames stays apart."""
        import numpy as np
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            animated_near_dup,
        )

        rng = np.random.RandomState(10)
        pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
        mk = lambda: rng.randint(0, 8, size=(16, 16)).astype(np.uint8)  # noqa: E731
        f = [mk() for _ in range(5)]
        g = [mk() for _ in range(3)]  # disjoint content

        def media_row(i, frames):
            return Row(
                media_id=i, kind="image",
                content=_gif_anim_bytes(frames, pal),
                meta=Row(mime="image/gif", width=16, height=16,
                         duration_ms=None),
            )

        df = spark.createDataFrame(
            [
                media_row(1, f),
                media_row(2, [f[3], f[1], f[4]]),  # reorder + trim
                media_row(3, g),
            ],
            MEDIA_SCHEMA,
        )
        pairs = {
            (r.doc_a, r.doc_b): r.shared_frames
            for r in animated_near_dup(df, min_shared_frames=2).collect()
        }
        assert pairs.get((1, 2), 0) >= 2
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_gif_png_twins_dedup_through_shared_hamming_engine(
        self, spark
    ):
        """GIF joins the codec-twin gate: the same gradient as GIF
        (palette) and PNG (truecolor) lands in one perceptual cluster;
        a mirrored PNG stays apart."""
        import numpy as np
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            media_near_dup,
        )

        g = np.tile(np.arange(32, dtype=np.uint8) * 8, (32, 1))
        base = np.stack([g, g, g], axis=2)
        # palette = the 32 gray levels; indices = column number
        pal = np.stack([np.arange(32) * 8] * 3, axis=1).astype(np.uint8)
        idx = np.tile(np.arange(32, dtype=np.uint8), (32, 1))

        def media_row(i, content, mime):
            return Row(
                media_id=i,
                kind="image",
                content=content,
                meta=Row(mime=mime, width=32, height=32, duration_ms=None),
            )

        rows = [
            media_row(1, _gif_bytes(idx, pal), "image/gif"),
            media_row(2, _png_bytes(base), "image/png"),
            media_row(3, _png_bytes(base[:, ::-1]), "image/png"),
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        pairs = {
            (r.doc_a, r.doc_b)
            for r in media_near_dup(df, max_hamming=8).collect()
        }
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_jpeg_png_twins_dedup_through_shared_hamming_engine(
        self, spark
    ):
        """The compressed-codec analogue of the PNG/BMP twin gate: the
        SAME image as PNG (lossless) and as JPEG (lossy 4:4:4) must
        land in one perceptual near-dup cluster — dHash survives the
        codec loss — while a mirrored PNG stays apart."""
        import numpy as np
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            media_near_dup,
        )

        g = np.tile(np.arange(32, dtype=np.uint8) * 8, (32, 1))
        base = np.stack([g, g, g], axis=2)

        def media_row(i, content, mime):
            return Row(
                media_id=i,
                kind="image",
                content=content,
                meta=Row(mime=mime, width=32, height=32, duration_ms=None),
            )

        rows = [
            media_row(1, _png_bytes(base, filters=[1] * 32), "image/png"),
            media_row(2, _jpeg_bytes(base, quant=2), "image/jpeg"),
            media_row(3, _png_bytes(base[:, ::-1]), "image/png"),
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        pairs = {
            (r.doc_a, r.doc_b)
            for r in media_near_dup(df, max_hamming=8).collect()
        }
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def _corrupt_rows(self):
        """Malformed blobs covering every exception class the stdlib
        decoders can raise: garbage deflate stream (zlib.error),
        truncated fixed-size header (struct.error), out-of-range palette
        index (IndexError), and a bad format guard (ValueError)."""
        import struct
        import zlib

        import numpy as np
        from pyspark.sql import Row

        def chunk(t, d):
            return (
                struct.pack(">I", len(d))
                + t
                + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        garbage_idat = sig + ihdr + chunk(b"IDAT", b"\xde\xad\xbe\xef" * 4)
        truncated_header = sig + b"\x00\x00\x00\x0dIHDR\x00\x01"
        pal = np.zeros((2, 3), dtype=np.uint8)
        idx = np.full((2, 2, 1), 7, dtype=np.uint8)  # palette has 2 entries
        bad_palette = _png_bytes(idx, color=3, palette=pal)
        truncated_bmp = _bmp_bytes(2, 2, self.PIXELS)[:20]

        def media_row(i, content, mime):
            return Row(
                media_id=i,
                kind="image",
                content=content,
                meta=Row(mime=mime, width=2, height=2, duration_ms=None),
            )

        return [
            media_row(1, _ppm_bytes(2, 2, self.PIXELS), "image/x-portable-pixmap"),
            media_row(2, garbage_idat, "image/png"),
            media_row(3, truncated_header, "image/png"),
            media_row(4, bad_palette, "image/png"),
            media_row(5, truncated_bmp, "image/bmp"),
        ]

    def test_corrupt_blobs_drop_instead_of_failing_dhash(self, spark):
        """ADVICE r4: decode_png raises zlib.error / struct.error /
        IndexError on corrupt input — one bad blob must not fail the
        whole-corpus media_dhash job; the well-formed row survives."""
        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            media_dhash,
        )

        df = spark.createDataFrame(self._corrupt_rows(), MEDIA_SCHEMA)
        got = media_dhash(df).collect()
        assert {r.media_id for r in got} == {1}

    def test_corrupt_blobs_yield_null_features(self, spark):
        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
        )

        df = spark.createDataFrame(self._corrupt_rows(), MEDIA_SCHEMA)
        got = {r.media_id: r for r in extract_features(df).collect()}
        assert len(got) == 5  # every row survives the pass
        assert got[1].feat is not None
        for mid in (2, 3, 4, 5):
            assert got[mid].feat is None
        # metadata columns still computed for corrupt rows
        assert got[2].n_bytes == len(self._corrupt_rows()[1].content)

    def test_decode_errors_cover_what_decoders_raise(self):
        """The DECODE_ERRORS tuple must actually cover each decoder's
        failure modes — pin the raw exception classes so a decoder change
        that raises something new fails here, not in production."""
        import pytest as _pytest

        from taar_gcp_etl_spark.operators.multimodal import (
            DECODE_ERRORS,
            decode_bmp,
            decode_png,
        )

        rows = {r.media_id: r.content for r in self._corrupt_rows()}
        for mid in (2, 3, 4):
            with _pytest.raises(DECODE_ERRORS):
                decode_png(rows[mid])
        with _pytest.raises(DECODE_ERRORS):
            decode_bmp(rows[5])


class TestRestSource:
    def test_fetch_urls_offline(self, spark):
        def fake(url):
            if url.endswith("bad"):
                raise OSError("boom")
            return 200, f"body-of-{url}"

        urls = spark.createDataFrame(
            [("u/1",), ("u/2",), ("u/bad",)], ["url"]
        )
        got = {r.url: r for r in fetch_urls(urls, workers=2, fetcher=fake).collect()}
        assert got["u/1"].body == "body-of-u/1" and got["u/1"].status == 200
        assert got["u/bad"].status is None and "boom" in got["u/bad"].error

    def test_retry_union_dedups(self, spark, tmp_path):
        """SET2 — first pass fails flaky urls, retry pass succeeds; union
        must contain each url exactly once."""
        marker = str(tmp_path / "seen-flaky")

        def flaky(url):
            # closures are re-pickled per task, so in-memory state won't
            # survive — a filesystem marker does (local mode, one machine)
            import os

            if url.endswith("flaky") and not os.path.exists(marker):
                open(marker, "w").close()
                raise OSError("transient")
            return 200, f"ok-{url}"

        urls = spark.createDataFrame(
            [("u/a",), ("u/flaky",), ("u/b",)], ["url"]
        )
        out = fetch_with_retry(urls, workers=2, fetcher=flaky).collect()
        assert sorted(r.url for r in out) == ["u/a", "u/b", "u/flaky"]
        assert all(r.status == 200 for r in out)


class TestContinuousRollup:
    def test_streamed_partials_cascade_equals_batch(self, spark, tmp_path):
        """Stream the events fixture through the minute-grain continuous
        aggregate, then derive hour/day from the STREAMED partials — the
        result must equal the batch rollup_cascade over the same raw
        events (one-scan continuous-aggregate contract)."""
        from taar_gcp_etl_spark.io import read_table
        from taar_gcp_etl_spark.operators.windows import (
            rollup_cascade,
            rollup_from_partials,
        )
        from taar_gcp_etl_spark.streaming import jobs as sj
        from tests.conftest import SF_SMOKE

        # watermarks require TIMESTAMP (not NTZ); the UTC-pinned session
        # makes the cast value-preserving
        ev = (
            read_table(spark, SF_SMOKE, "events")
            .drop("props")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        src = str(tmp_path / "stream_src")
        # two file drops → two micro-batches
        ev.filter(F.col("event_id") % 2 == 0).write.parquet(src + "/a")
        ev.filter(F.col("event_id") % 2 == 1).write.parquet(src + "/b")
        stream = spark.readStream.schema(ev.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src + "/*")
        q = (
            sj.continuous_minute_rollup(stream)
            .writeStream.format("memory")
            .queryName("minute_partials_t")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = spark.table("minute_partials_t")
        got = sorted(
            map(
                tuple,
                rollup_from_partials(streamed).collect(),
            )
        )
        want = sorted(map(tuple, rollup_cascade(ev).collect()))
        assert got == want

        # append mode must be ACCEPTED: it requires the state store's
        # eviction predicate, which only exists when the grouping carries
        # event-time metadata (the F.window expression, not date_trunc) —
        # this is the regression guard for unbounded streaming state
        q2 = (
            sj.continuous_minute_rollup(
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src + "/*")
            )
            .writeStream.format("memory")
            .queryName("minute_partials_append_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        appended = sorted(
            map(tuple, spark.table("minute_partials_append_t").collect())
        )
        complete = sorted(map(tuple, streamed.collect()))
        # append emits only watermark-closed windows → subset of complete
        assert set(appended) <= set(complete)


class TestCdcApply:
    CDC_SCHEMA = "id long, val string, seq long, op string"

    def test_seq_guarded_merge_and_replay_idempotence(self, spark, tmp_path):
        """Three applies: inserts; update + delete + insert; then a
        REPLAY of a stale op (foreachBatch is at-least-once). The seq
        guard makes the stale insert a no-op — key 1 keeps its seq-3
        update. (A stale upsert of a DELETED key would resurrect it —
        the documented no-tombstone limitation — so the replay here
        targets a live key, which is the guarantee the operator makes.)"""
        from taar_gcp_etl_spark.streaming.jobs import apply_cdc_batch

        table = str(tmp_path / "dim")
        b1 = spark.createDataFrame(
            [(1, "a0", 1, "I"), (2, "b0", 2, "I")], self.CDC_SCHEMA
        )
        apply_cdc_batch(b1, table)
        b2 = spark.createDataFrame(
            [(1, "a1", 3, "U"), (2, None, 4, "D"), (3, "c0", 5, "I")],
            self.CDC_SCHEMA,
        )
        apply_cdc_batch(b2, table)
        # replay k1's original insert (stale seq 1) — must not clobber a1
        b3 = spark.createDataFrame([(1, "a0", 1, "I")], self.CDC_SCHEMA)
        apply_cdc_batch(b3, table)

        rows = {
            r.id: (r.val, r.seq)
            for r in spark.read.parquet(table).collect()
        }
        assert rows == {1: ("a1", 3), 3: ("c0", 5)}

    def test_in_batch_ordering_latest_seq_wins(self, spark, tmp_path):
        from taar_gcp_etl_spark.streaming.jobs import apply_cdc_batch

        table = str(tmp_path / "dim2")
        b = spark.createDataFrame(
            [(1, "x1", 1, "I"), (1, "x3", 3, "U"), (1, "x2", 2, "U")],
            self.CDC_SCHEMA,
        )
        apply_cdc_batch(b, table)
        rows = spark.read.parquet(table).collect()
        assert len(rows) == 1 and rows[0].val == "x3"

    def test_streaming_cdc_file_drops(self, spark, tmp_path):
        from taar_gcp_etl_spark.streaming.jobs import stream_cdc_apply

        src = tmp_path / "cdc_src"
        src.mkdir()
        table = str(tmp_path / "dim3")
        spark.createDataFrame(
            [(1, "a0", 1, "I"), (2, "b0", 2, "I")], self.CDC_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))

        changes = (
            spark.readStream.schema(
                "id long, val string, seq long, op string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_cdc_apply(changes, table, str(tmp_path / "ckpt"))
        q.processAllAvailable()
        spark.createDataFrame(
            [(2, None, 3, "D"), (1, "a9", 4, "U")], self.CDC_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        q.stop()

        rows = {
            r.id: r.val for r in spark.read.parquet(table).collect()
        }
        assert rows == {1: "a9"}


class TestStreamRefreshAggregate:
    def test_batches_accumulate_and_replay_skipped(self, spark, tmp_path):
        """Two applied micro-batches accumulate into the stored aggregate;
        re-applying an epoch is a no-op (the at-least-once guard)."""
        from taar_gcp_etl_spark.streaming.jobs import (
            refresh_aggregate_store,
        )

        table = str(tmp_path / "mv")
        measures = {"total": ("sum", "v"), "n": ("count", "v")}
        b1 = spark.createDataFrame([(1, 2.0), (1, 3.0), (2, 1.0)], ["k", "v"])
        b2 = spark.createDataFrame([(1, 5.0), (3, 7.0)], ["k", "v"])
        assert refresh_aggregate_store(b1, table, ["k"], measures, 0)
        assert refresh_aggregate_store(b2, table, ["k"], measures, 1)
        # replay of epoch 1 must change nothing
        assert not refresh_aggregate_store(b2, table, ["k"], measures, 1)
        # replay of an OLDER epoch must also be skipped: markers live in
        # a sibling directory precisely so the table overwrite cannot
        # wipe them (in-table markers guarded only the latest epoch)
        assert not refresh_aggregate_store(b1, table, ["k"], measures, 0)
        rows = {
            r["k"]: (r["total"], r["n"])
            for r in spark.read.parquet(table).collect()
        }
        assert rows == {1: (10.0, 3), 2: (1.0, 1), 3: (7.0, 1)}

    def test_approx_distinct_through_the_streaming_face(
        self, spark, tmp_path
    ):
        """The HLL measure flows through the streaming store too:
        sketches written per epoch, unioned across micro-batches, exact
        at small cardinality."""
        from taar_gcp_etl_spark.operators.merge import sketch_estimates
        from taar_gcp_etl_spark.streaming.jobs import (
            refresh_aggregate_store,
        )

        table = str(tmp_path / "mvh")
        measures = {"u": ("approx_distinct", "v")}
        b1 = spark.createDataFrame(
            [(1, "x"), (1, "y"), (2, "x")], ["k", "v"]
        )
        b2 = spark.createDataFrame(
            [(1, "y"), (1, "z"), (3, "w")], ["k", "v"]
        )
        assert refresh_aggregate_store(b1, table, ["k"], measures, 0)
        assert refresh_aggregate_store(b2, table, ["k"], measures, 1)
        got = {
            r["k"]: r["u"]
            for r in sketch_estimates(
                spark.read.parquet(table), measures
            ).collect()
        }
        assert got == {1: 3, 2: 1, 3: 1}

    def test_streaming_end_to_end_matches_full_aggregate(
        self, spark, tmp_path
    ):
        from taar_gcp_etl_spark.streaming.jobs import (
            stream_refresh_aggregate,
        )

        src = tmp_path / "mv_src"
        src.mkdir()
        table = str(tmp_path / "mv2")
        rows1 = [(1, 2.0), (2, 4.0), (1, 6.0)]
        rows2 = [(2, 1.0), (3, 3.0)]
        spark.createDataFrame(rows1, ["k", "v"]).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = (
            spark.readStream.schema("k long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_refresh_aggregate(
            stream,
            table,
            str(tmp_path / "mv_ckpt"),
            ["k"],
            {"total": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")},
        )
        q.processAllAvailable()
        spark.createDataFrame(rows2, ["k", "v"]).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q.processAllAvailable()
        q.stop()

        got = {
            r["k"]: (r["total"], r["n"], r["mx"])
            for r in spark.read.parquet(table).collect()
        }
        full = spark.createDataFrame(rows1 + rows2, ["k", "v"]).groupBy(
            "k"
        ).agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.max("v").alias("mx"),
        )
        expect = {
            r["k"]: (r["total"], r["n"], r["mx"]) for r in full.collect()
        }
        assert got == expect


class TestAudioFingerprint:
    def _chord(self, freqs, n=16384, rate=8000, noise=0.0, seed=1):
        """Multi-tone signal — realistic audio has many spectral
        components; a noisy copy keeps its band profile while a
        different chord moves it."""
        import math
        import random

        rng = random.Random(seed)
        amp = 24000 / max(1, len(freqs))
        return [
            int(
                sum(
                    amp * math.sin(2 * math.pi * f * i / rate)
                    for f in freqs
                )
                + (rng.uniform(-1, 1) * 32767 * noise)
            )
            for i in range(n)
        ]

    CHORD_A = (220, 440, 660, 990, 1480, 2220)
    CHORD_B = (310, 520, 780, 1170, 1760, 2640)

    def _media(self, spark, rows):
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import MEDIA_SCHEMA

        return spark.createDataFrame(
            [
                Row(
                    media_id=mid,
                    kind="audio",
                    content=content,
                    meta=Row(
                        mime="audio/wav", width=None, height=None,
                        duration_ms=None,
                    ),
                )
                for mid, content in rows
            ],
            MEDIA_SCHEMA,
        )

    def test_noisy_copy_is_near_same_tone_far_from_other(self, spark):
        """The robustness contract: a mildly-noised copy of a tone keeps
        a small Hamming distance to the original, while a different
        frequency is far — the property the banded near-dup pairing
        depends on."""
        from taar_gcp_etl_spark.operators.multimodal import (
            media_audio_dhash,
        )

        a = _wav_bytes(self._chord(self.CHORD_A))
        a_noisy = _wav_bytes(self._chord(self.CHORD_A, noise=0.02, seed=7))
        b = _wav_bytes(self._chord(self.CHORD_B))
        df = self._media(spark, [(1, a), (2, a_noisy), (3, b)])
        fp = {
            r["media_id"]: (r["simhash_hi"], r["simhash_lo"])
            for r in media_audio_dhash(df).collect()
        }

        def ham(x, y):
            return bin(((x[0] ^ y[0]) << 32) | (x[1] ^ y[1])).count("1")

        assert ham(fp[1], fp[2]) <= 4
        assert ham(fp[1], fp[3]) >= 8

    def test_near_dup_pairs_through_shared_engine(self, spark):
        from taar_gcp_etl_spark.operators.multimodal import audio_near_dup

        a = _wav_bytes(self._chord(self.CHORD_A))
        a_noisy = _wav_bytes(self._chord(self.CHORD_A, noise=0.02, seed=7))
        b = _wav_bytes(self._chord(self.CHORD_B))
        short = _wav_bytes([0] * 100)  # below 2 frames → no identity
        df = self._media(
            spark, [(1, a), (2, a_noisy), (3, b), (4, short), (5, None)]
        )
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in audio_near_dup(df, max_hamming=8).collect()
        }
        assert pairs == {(1, 2)}


    def test_resampled_copy_keeps_its_fingerprint(self, spark):
        """Band edges live in Hz, not bin indices: the same chord
        rendered at 8 kHz and 16 kHz must fingerprint near-identically —
        the re-encode duplicate case the operator exists for."""
        from taar_gcp_etl_spark.operators.multimodal import (
            audio_fingerprint64,
            decode_wav,
        )

        a8 = _wav_bytes(self._chord(self.CHORD_A, rate=8000), rate=8000)
        a16 = _wav_bytes(
            self._chord(self.CHORD_A, n=32768, rate=16000), rate=16000
        )
        fp8 = audio_fingerprint64(*decode_wav(a8))
        fp16 = audio_fingerprint64(*decode_wav(a16))
        ham = bin(
            ((fp8[0] ^ fp16[0]) << 32) | (fp8[1] ^ fp16[1])
        ).count("1")
        assert ham <= 6


def _mp4_bytes(samples, w, h, timescale=1000, sample_delta=40,
               codec=b"jpeg", brand=b"isom", chunking=None,
               handler=b"vide", stsz_const=False):
    """Spec-built (ISO/IEC 14496-12) minimal MP4 — ftyp + mdat holding
    the given sample payloads + moov with FULL sample tables (stsd/
    stts/stsc/stsz/stco) — written independently of the parser under
    test, from the public spec's box layouts. ``chunking`` lists
    samples-per-chunk (default one chunk holding everything), so the
    stsc/stco reconstruction is exercised for real."""
    import struct as st

    def box(t, payload):
        return st.pack(">I", len(payload) + 8) + t + payload

    def full(t, ver, flags, payload):
        return box(t, bytes([ver]) + flags.to_bytes(3, "big") + payload)

    matrix = st.pack(
        ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    )
    ftyp = box(b"ftyp", brand + st.pack(">I", 0) + b"isommp42")
    mdat = box(b"mdat", b"".join(samples))
    if chunking is None:
        chunking = [len(samples)] if samples else []
    assert sum(chunking) == len(samples)
    chunk_offsets, stsc_runs = [], []
    off, i = len(ftyp) + 8, 0
    for ci, spc in enumerate(chunking, start=1):
        chunk_offsets.append(off)
        if not stsc_runs or stsc_runs[-1][1] != spc:
            stsc_runs.append((ci, spc))
        for _ in range(spc):
            off += len(samples[i])
            i += 1
    n = len(samples)
    duration = n * sample_delta
    mvhd = full(
        b"mvhd", 0, 0,
        st.pack(">IIII", 0, 0, timescale, duration)
        + st.pack(">I", 0x00010000) + st.pack(">H", 0x0100)
        + b"\x00" * 10 + matrix + b"\x00" * 24 + st.pack(">I", 2),
    )
    tkhd = full(
        b"tkhd", 0, 7,
        st.pack(">IIII", 0, 0, 1, 0) + st.pack(">I", duration)
        + b"\x00" * 8 + st.pack(">hhhh", 0, 0, 0, 0) + matrix
        + st.pack(">II", w << 16, h << 16),
    )
    mdhd = full(
        b"mdhd", 0, 0,
        st.pack(">IIII", 0, 0, timescale, duration)
        + st.pack(">HH", 0x55C4, 0),
    )
    hdlr = full(
        b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00"
    )
    entry = (
        st.pack(">I", 86) + codec + b"\x00" * 6 + st.pack(">H", 1)
        + b"\x00" * 16 + st.pack(">HH", w, h)
        + st.pack(">II", 0x00480000, 0x00480000) + st.pack(">I", 0)
        + st.pack(">H", 1) + b"\x00" * 32 + st.pack(">Hh", 24, -1)
    )
    stsd = full(b"stsd", 0, 0, st.pack(">I", 1) + entry)
    stts = full(
        b"stts", 0, 0, st.pack(">I", 1) + st.pack(">II", n, sample_delta)
    )
    stsc = full(
        b"stsc", 0, 0,
        st.pack(">I", len(stsc_runs))
        + b"".join(st.pack(">III", fc, spc, 1) for fc, spc in stsc_runs),
    )
    if stsz_const:
        assert len({len(s) for s in samples}) == 1
        stsz = full(
            b"stsz", 0, 0, st.pack(">II", len(samples[0]), n)
        )
    else:
        stsz = full(
            b"stsz", 0, 0,
            st.pack(">II", 0, n)
            + b"".join(st.pack(">I", len(s)) for s in samples),
        )
    stco = full(
        b"stco", 0, 0,
        st.pack(">I", len(chunk_offsets))
        + b"".join(st.pack(">I", o) for o in chunk_offsets),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", stbl))
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


class TestMp4Container:
    """ISO-BMFF structural parse + MJPEG sample decode (r7: closes the
    last modality stub honestly — stats for any parseable container,
    frame decode only where the codec is one the repo really decodes)."""

    def _frames(self, k=5, size=16):
        import numpy as np

        rng = np.random.RandomState(21)
        return [
            rng.randint(0, 256, size=(size, size, 3)).astype(np.uint8)
            for _ in range(k)
        ]

    def _mjpeg(self, frames, **kw):
        return _mp4_bytes(
            [_jpeg_bytes(f) for f in frames],
            frames[0].shape[1], frames[0].shape[0], **kw,
        )

    def test_parse_mp4_census(self):
        from taar_gcp_etl_spark.operators.mp4 import parse_mp4

        frames = self._frames()
        info = parse_mp4(self._mjpeg(frames))
        assert info["brand"] == "isom"
        assert info["duration_ms"] == 200.0  # 5 samples x 40/1000
        assert len(info["tracks"]) == 1
        t = info["tracks"][0]
        assert t["handler"] == "vide" and t["codecs"] == ["jpeg"]
        assert (t["width"], t["height"]) == (16, 16)
        assert t["n_samples"] == 5 and t["duration_ms"] == 200.0

    def test_mjpeg_frames_decode_exactly_like_their_samples(self):
        """iter_mp4_jpeg_frames must return byte-identical decodes of
        the located samples — proving the stsc/stco/stsz walk finds
        the exact ranges, including across a multi-chunk layout."""
        import numpy as np

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg
        from taar_gcp_etl_spark.operators.mp4 import iter_mp4_jpeg_frames

        frames = self._frames()
        samples = [_jpeg_bytes(f) for f in frames]
        for chunking in (None, [2, 2, 1], [1, 1, 1, 1, 1]):
            blob = _mp4_bytes(samples, 16, 16, chunking=chunking)
            got = list(iter_mp4_jpeg_frames(blob, max_frames=16))
            assert [k for k, _ in got] == [0, 1, 2, 3, 4]
            for (_, frame), s in zip(got, samples):
                assert np.array_equal(frame, decode_jpeg(s))
        # even sampling on long movies, max_frames=1 edge
        long_blob = _mp4_bytes(samples * 4, 16, 16)
        ks = [k for k, _ in iter_mp4_jpeg_frames(long_blob, max_frames=4)]
        assert len(ks) == 4 and ks[0] == 0 and ks[-1] == 19
        assert [k for k, _ in iter_mp4_jpeg_frames(long_blob, max_frames=1)] == [0]

    def test_h264_parses_but_declines_decode(self):
        import pytest as _pytest

        from taar_gcp_etl_spark.operators.mp4 import (
            iter_mp4_jpeg_frames,
            parse_mp4,
        )

        blob = _mp4_bytes(
            [b"\x00\x00\x01\x65fakeslice"], 64, 48, codec=b"avc1"
        )
        info = parse_mp4(blob)  # structural stats work
        assert info["tracks"][0]["codecs"] == ["avc1"]
        with _pytest.raises(ValueError, match="no video track with a JPEG"):
            list(iter_mp4_jpeg_frames(blob))

    def test_corrupt_containment(self):
        import pytest as _pytest

        from taar_gcp_etl_spark.operators.multimodal import DECODE_ERRORS
        from taar_gcp_etl_spark.operators.mp4 import (
            iter_mp4_jpeg_frames,
            parse_mp4,
        )

        good = self._mjpeg(self._frames(2))
        for bad in (
            b"",                          # empty
            bytes(range(16)),             # garbage
            good[:40],                    # truncated mid-box
            b"\x00\x00\x00\x04ftyp",      # size < header
            good.replace(b"moov", b"m\xffov", 1),  # non-ascii type
        ):
            with _pytest.raises(DECODE_ERRORS):
                parse_mp4(bad)
        # sample table pointing past EOF: drop the mdat tail
        with _pytest.raises(DECODE_ERRORS):
            list(iter_mp4_jpeg_frames(good[:len(good) // 2], 4))
        with _pytest.raises(TypeError, match="max_frames"):
            list(iter_mp4_jpeg_frames(good, 0))
        # hostile stts count must raise, not read sibling boxes' bytes
        # as sample counts (review fix)
        import struct as _st

        stts_at = good.find(b"stts") - 4
        size = _st.unpack_from(">I", good, stts_at)[0]
        evil = bytearray(good)
        _st.pack_into(">I", evil, stts_at + 12, 2_000_000)
        with _pytest.raises(DECODE_ERRORS, match="stts"):
            parse_mp4(bytes(evil))

    def test_media_container_stats_face(self, spark):
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            media_container_stats,
        )

        mj = self._mjpeg(self._frames(3))
        h264 = _mp4_bytes([b"fake"], 64, 48, codec=b"avc1")

        def media_row(i, blob):
            return Row(
                media_id=i, kind="video", content=blob,
                meta=Row(mime="video/mp4", width=None, height=None,
                         duration_ms=None),
            )

        df = spark.createDataFrame(
            [
                media_row(1, mj),
                media_row(2, h264),
                media_row(3, bytes(range(64))),  # corrupt -> dropped
                Row(media_id=4, kind="video", content=None, meta=Row(
                    mime="video/mp4", width=None, height=None,
                    duration_ms=None)),
            ],
            MEDIA_SCHEMA,
        )
        got = {r.media_id: r for r in media_container_stats(df).collect()}
        assert set(got) == {1, 2}
        assert got[1].video_codec == "jpeg" and got[1].n_tracks == 1
        assert got[1].duration_ms == 120.0 and got[1].width == 16
        assert got[2].video_codec == "avc1"
        assert got[2].width == 64 and got[2].height == 48

    def test_mjpeg_joins_the_frame_hash_pipeline(self, spark):
        """media_frame_dhash treats an MJPEG movie like a GIF
        animation: per-frame perceptual hashes equal to hashing the
        decoded samples directly; H.264 rows drop."""
        from pyspark.sql import Row

        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg
        from taar_gcp_etl_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            dhash64,
            media_frame_dhash,
        )

        frames = self._frames(3)
        samples = [_jpeg_bytes(f) for f in frames]
        mj = _mp4_bytes(samples, 16, 16)
        h264 = _mp4_bytes([b"fake"], 64, 48, codec=b"avc1")

        def media_row(i, blob):
            return Row(
                media_id=i, kind="video", content=blob,
                meta=Row(mime="video/mp4", width=None, height=None,
                         duration_ms=None),
            )

        df = spark.createDataFrame(
            [media_row(1, mj), media_row(2, h264)], MEDIA_SCHEMA
        )
        got = {
            (r.media_id, r.frame_idx): (r.simhash_hi, r.simhash_lo)
            for r in media_frame_dhash(df, max_frames=8).collect()
        }
        assert {m for m, _ in got} == {1}
        for k, s in enumerate(samples):
            assert got[(1, k)] == dhash64(decode_jpeg(s))

    def test_decode_media_mjpeg_features(self):
        from taar_gcp_etl_spark.operators.jpeg import decode_jpeg
        from taar_gcp_etl_spark.operators.multimodal import (
            _image_features,
            decode_media,
        )

        frames = self._frames(2)
        samples = [_jpeg_bytes(f) for f in frames]
        blob = _mp4_bytes(samples, 16, 16)
        assert decode_media(blob, "video/mp4") == _image_features(
            decode_jpeg(samples[0])
        )

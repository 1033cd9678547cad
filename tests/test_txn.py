"""Transaction-log table layout (taar_gcp_etl_spark/txn.py): atomic
manifest-swap commits, snapshot isolation, time travel, epoch replay
guards, CDC tombstones, and the two crash windows the plain-parquet
paths document as their limitations (VERDICT r3 next-2):

* delete-op CDC replay — a stale upsert after a newer delete must NOT
  resurrect the row (tombstone retention), and
* kill between the snapshot write and the manifest publish — the table
  must be unchanged, and the replay must apply exactly once.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from taar_gcp_etl_spark import txn

CDC_SCHEMA = "id long, val string, seq long, op string"


def _rows(df):
    return {r.id: (r.val, r.seq) for r in df.collect()}


class TestCommitRead:
    def test_roundtrip_and_versions(self, spark, tmp_path):
        t = str(tmp_path / "t")
        v1 = txn.commit_txn(
            spark.createDataFrame([(1, "a")], "id long, val string"), t
        )
        v2 = txn.commit_txn(
            spark.createDataFrame([(1, "b"), (2, "c")], "id long, val string"),
            t,
        )
        assert (v1, v2) == (1, 2)
        assert _rows(
            txn.read_txn(spark, t).withColumn("seq", F.lit(0))
        ) == {1: ("b", 0), 2: ("c", 0)}
        # time travel: version 1 still readable after version 2 commits
        old = txn.read_txn(spark, t, version=1)
        assert [r.val for r in old.collect()] == ["a"]

    def test_empty_table_reads_none(self, spark, tmp_path):
        assert txn.read_txn(spark, str(tmp_path / "missing")) is None

    def test_commit_may_read_own_table(self, spark, tmp_path):
        """The committed plan can lazily scan the current snapshot — the
        new snapshot is a fresh directory, so no lineage cut is needed
        (the plain-parquet overwrite path must localCheckpoint)."""
        t = str(tmp_path / "t")
        txn.commit_txn(
            spark.createDataFrame([(1, 10)], "id long, v long"), t
        )
        cur = txn.read_txn(spark, t)
        txn.commit_txn(cur.withColumn("v", F.col("v") + 1), t)
        assert txn.read_txn(spark, t).collect()[0].v == 11

    def test_epoch_replay_skipped(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame([(1, "a")], "id long, val string")
        assert txn.commit_txn(df, t, epoch_id=0) == 1
        assert txn.commit_txn(df, t, epoch_id=1) == 2
        # same and older epochs are skipped before any write
        assert txn.commit_txn(df, t, epoch_id=1) is None
        assert txn.commit_txn(df, t, epoch_id=0) is None
        assert len(txn._list_manifest_versions(spark, t)) == 2

    def test_manifest_extra_reserved_keys_rejected(self, spark, tmp_path):
        """ADVICE r10: reserved keys in manifest_extra raise instead of
        silently dropping — a caller passing 'file_stats' would believe
        the field persisted. Non-reserved keys still land."""
        t = str(tmp_path / "t")
        df = spark.createDataFrame([(1, "a")], "id long, val string")
        with pytest.raises(ValueError, match="reserved"):
            txn.commit_txn(df, t, manifest_extra={"file_stats": {}})
        with pytest.raises(ValueError, match="overlays"):
            txn.commit_txn(
                df, t, manifest_extra={"overlays": [], "note": "x"}
            )
        # the failed attempts must not have burned a version
        assert txn.latest_manifest(spark, t) is None
        txn.commit_txn(df, t, manifest_extra={"note": "x"})
        assert txn.latest_manifest(spark, t)["note"] == "x"

    def test_version_conflict_retries_to_next_slot(self, spark, tmp_path):
        """Optimistic concurrency: if another writer took the target
        manifest slot between log-read and publish, the commit re-reads
        and lands on the next version instead of clobbering."""
        t = str(tmp_path / "t")
        txn.commit_txn(
            spark.createDataFrame([(1, "a")], "id long, val string"), t
        )
        # squat on version 2 as a concurrent writer would
        squat = {
            "version": 2,
            "snapshot": "data/v0000000002-squat",
            "epoch_id": None,
            "parent": 1,
        }
        spark.createDataFrame(
            [(2, "x")], "id long, val string"
        ).write.parquet(f"{t}/data/v0000000002-squat")
        txn._write_bytes(
            spark,
            f"{t}/_log/{txn._manifest_name(2)}",
            json.dumps(squat).encode(),
        )
        v = txn.commit_txn(
            spark.createDataFrame([(3, "c")], "id long, val string"), t
        )
        assert v == 3
        assert txn.latest_manifest(spark, t)["version"] == 3
        assert [r.val for r in txn.read_txn(spark, t).collect()] == ["c"]


class TestCrashWindow:
    def test_kill_between_snapshot_write_and_manifest_publish(
        self, spark, tmp_path, monkeypatch
    ):
        """THE crash test: the snapshot lands but the process dies before
        the manifest rename. The table must still read as the previous
        version (orphan snapshot invisible), and re-running the batch
        must apply it exactly once."""
        t = str(tmp_path / "mv")
        measures = {"total": ("sum", "v"), "n": ("count", "v")}
        b1 = spark.createDataFrame([(1, 2.0), (2, 1.0)], ["k", "v"])
        b2 = spark.createDataFrame([(1, 5.0)], ["k", "v"])
        assert txn.refresh_aggregate_store_txn(b1, t, ["k"], measures, 0)

        real_write = txn._write_bytes
        boom = RuntimeError("killed before manifest publish")

        def dying_write(spark_, path, data):
            if "/_log/" in path:
                raise boom
            return real_write(spark_, path, data)

        monkeypatch.setattr(txn, "_write_bytes", dying_write)
        with pytest.raises(RuntimeError, match="killed before"):
            txn.refresh_aggregate_store_txn(b2, t, ["k"], measures, 1)
        monkeypatch.undo()

        # crash left the table at epoch-0 state — no partial apply
        assert txn.latest_manifest(spark, t)["version"] == 1
        assert {
            r.k: (r.total, r.n)
            for r in txn.read_txn(spark, t).collect()
        } == {1: (2.0, 1), 2: (1.0, 1)}

        # replayed batch applies EXACTLY once; a second replay is skipped
        assert txn.refresh_aggregate_store_txn(b2, t, ["k"], measures, 1)
        assert not txn.refresh_aggregate_store_txn(
            b2, t, ["k"], measures, 1
        )
        assert {
            r.k: (r.total, r.n)
            for r in txn.read_txn(spark, t).collect()
        } == {1: (7.0, 2), 2: (1.0, 1)}

        # the orphan snapshot from the crash is garbage-collected
        report = txn.vacuum_txn(spark, t, keep_last=2)
        assert report["removed_snapshots"] >= 1
        assert txn.read_txn(spark, t) is not None


class TestCdcTombstones:
    def test_stale_upsert_cannot_resurrect_deleted_key(
        self, spark, tmp_path
    ):
        """THE delete-replay test: I(seq1) → D(seq4) → replayed stale
        U(seq3). The plain-parquet path documents this as its
        resurrection gap; the tombstone's seq must win here."""
        t = str(tmp_path / "dim")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [(1, "a0", 1, "I"), (2, "b0", 2, "I")], CDC_SCHEMA
            ),
            t,
        )
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, None, 4, "D")], CDC_SCHEMA), t
        )
        # stale update from before the delete, replayed after it
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, "a1", 3, "U")], CDC_SCHEMA), t
        )
        live = _rows(txn.read_cdc_table(spark, t))
        assert live == {2: ("b0", 2)}  # key 1 stays dead
        raw = txn.read_cdc_table(spark, t, include_tombstones=True)
        tomb = {r.id: (r.seq, r._deleted) for r in raw.collect()}
        assert tomb[1] == (4, True)  # tombstone retained with delete seq

    def test_delete_of_unseen_key_guards_future_stale_inserts(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "dim")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(7, None, 10, "D")], CDC_SCHEMA), t
        )
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(7, "zombie", 9, "I")], CDC_SCHEMA), t
        )
        assert txn.read_cdc_table(spark, t).count() == 0
        # a genuinely NEWER insert does revive the key
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(7, "fresh", 11, "I")], CDC_SCHEMA), t
        )
        assert _rows(txn.read_cdc_table(spark, t)) == {7: ("fresh", 11)}

    def test_seq_guard_and_in_batch_ordering_parity(self, spark, tmp_path):
        """Same guarantees as the plain-parquet CDC tests, on the txn
        layout: in-batch latest-seq wins; replayed stale ops no-op."""
        t = str(tmp_path / "dim")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [(1, "x1", 1, "I"), (1, "x3", 3, "U"), (1, "x2", 2, "U")],
                CDC_SCHEMA,
            ),
            t,
        )
        assert _rows(txn.read_cdc_table(spark, t)) == {1: ("x3", 3)}
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, "x1", 1, "I")], CDC_SCHEMA), t
        )
        assert _rows(txn.read_cdc_table(spark, t)) == {1: ("x3", 3)}

    def test_epoch_stamped_replay_skips_before_merge(self, spark, tmp_path):
        t = str(tmp_path / "dim")
        b = spark.createDataFrame([(1, "a", 1, "I")], CDC_SCHEMA)
        assert txn.apply_cdc_batch_txn(b, t, epoch_id=5) == 1
        assert txn.apply_cdc_batch_txn(b, t, epoch_id=5) is None

    def test_tombstone_compaction_respects_horizon(self, spark, tmp_path):
        t = str(tmp_path / "dim")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [
                    (1, None, 3, "D"),
                    (2, None, 8, "D"),
                    (3, "live", 9, "I"),
                ],
                CDC_SCHEMA,
            ),
            t,
        )
        txn.compact_cdc_tombstones(spark, t, min_live_seq=5)
        raw = txn.read_cdc_table(spark, t, include_tombstones=True)
        state = {r.id: r._deleted for r in raw.collect()}
        # seq-3 tombstone retired, seq-8 tombstone (>= horizon) kept,
        # live row untouched
        assert state == {2: True, 3: False}

    def test_streaming_cdc_txn_end_to_end(self, spark, tmp_path):
        from taar_gcp_etl_spark.txn import stream_cdc_apply_txn

        src = tmp_path / "cdc_src"
        src.mkdir()
        t = str(tmp_path / "dim")
        spark.createDataFrame(
            [(1, "a0", 1, "I"), (2, "b0", 2, "I")], CDC_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        changes = (
            spark.readStream.schema(CDC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_cdc_apply_txn(changes, t, str(tmp_path / "ckpt"))
        q.processAllAvailable()
        spark.createDataFrame(
            [(2, None, 3, "D"), (1, "a9", 4, "U")], CDC_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        q.stop()
        assert _rows(txn.read_cdc_table(spark, t)) == {1: ("a9", 4)}


class TestVacuum:
    def test_vacuum_keeps_readable_recent_versions(self, spark, tmp_path):
        t = str(tmp_path / "t")
        for i in range(5):
            txn.commit_txn(
                spark.createDataFrame([(i, "v")], "id long, val string"), t
            )
        report = txn.vacuum_txn(spark, t, keep_last=2)
        assert report["removed_snapshots"] == 3
        assert report["kept_versions"] == [4, 5]
        assert txn.read_txn(spark, t).collect()[0].id == 4
        assert txn.read_txn(spark, t, version=4).collect()[0].id == 3
        with pytest.raises(Exception):
            txn.read_txn(spark, t, version=2)


class TestBucketedCdc:
    """Partition-pruned CDC (apply_cdc_batch_bucketed): per-batch cost
    bounded by touched buckets, atomicity and tombstone semantics
    identical to the flat path."""

    def _apply(self, spark, t, rows, **kw):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, CDC_SCHEMA), t, n_buckets=8, **kw
        )

    def test_semantics_parity_with_flat_path(self, spark, tmp_path):
        """The same op stream through flat and bucketed applies must
        yield identical live rows — bucketing is a layout choice, not a
        semantics choice."""
        ops1 = [(i, f"v{i}", i, "I") for i in range(1, 21)]
        ops2 = [(5, "v5b", 30, "U"), (6, None, 31, "D"), (21, "new", 32, "I")]
        ops3 = [(6, "zombie", 29, "U"), (5, "stale", 7, "U")]  # all stale
        flat, buck = str(tmp_path / "flat"), str(tmp_path / "buck")
        for ops in (ops1, ops2, ops3):
            df = spark.createDataFrame(ops, CDC_SCHEMA)
            txn.apply_cdc_batch_txn(df, flat)
            txn.apply_cdc_batch_bucketed(df, buck, n_buckets=8)
        a = _rows(txn.read_cdc_table(spark, flat))
        b = _rows(txn.read_cdc_table(spark, buck))
        assert a == b and (5, ("v5b", 30)) in a.items() and 6 not in a

    def test_untouched_buckets_not_rewritten(self, spark, tmp_path):
        """THE incremental guarantee: a batch touching one key repoints
        only that key's bucket; every other bucket's mapping entry (and
        its files on disk) stays byte-identical to the previous
        version."""
        t = str(tmp_path / "buck")
        self._apply(spark, t, [(i, f"v{i}", i, "I") for i in range(1, 41)])
        m1 = txn.latest_manifest(spark, t)
        self._apply(spark, t, [(1, "v1b", 100, "U")])
        m2 = txn.latest_manifest(spark, t)
        from pyspark.sql import functions as F2

        b1 = spark.createDataFrame([(1,)], "id long").select(
            txn._bucket_of("id", 8).alias("b")
        ).collect()[0].b
        assert m2["buckets"][str(b1)] != m1["buckets"][str(b1)]
        unchanged = {
            b: d for b, d in m2["buckets"].items() if b != str(b1)
        }
        assert unchanged == {
            b: d for b, d in m1["buckets"].items() if b != str(b1)
        }
        assert len(set(m2["buckets"].values())) == 2  # old dir + new dir

    def test_bucket_read_prunes_partitions(self, spark, tmp_path):
        """The bucket restriction must reach the scan as a PARTITION
        filter (directory pruning), not a post-scan row filter —
        inputFiles() can't show this (it lists the base relation), the
        physical plan can."""
        t = str(tmp_path / "buck")
        self._apply(spark, t, [(i, f"v{i}", i, "I") for i in range(1, 41)])
        df = txn.read_txn(spark, t, buckets=[0])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        import re

        assert re.search(r"PartitionFilters: \[[^\]]*_bucket", plan), plan
        full = txn.read_txn(spark, t)
        assert df.count() == full.filter(F.col("_bucket") == 0).count()
        assert 0 < df.count() < full.count()

    def test_tombstone_guard_and_epoch_replay(self, spark, tmp_path):
        t = str(tmp_path / "buck")
        assert self._apply(
            spark, t, [(1, "a", 1, "I"), (2, "b", 2, "I")], epoch_id=0
        ) == 1
        assert self._apply(spark, t, [(1, None, 5, "D")], epoch_id=1) == 2
        # stale upsert after delete: blocked by the bucketed tombstone
        assert self._apply(spark, t, [(1, "back", 3, "U")], epoch_id=2) == 3
        assert _rows(txn.read_cdc_table(spark, t)) == {2: ("b", 2)}
        # epoch replay skipped before any read or write
        assert self._apply(spark, t, [(9, "x", 9, "I")], epoch_id=2) is None

    def test_crash_before_publish_leaves_state_and_replay_applies_once(
        self, spark, tmp_path, monkeypatch
    ):
        t = str(tmp_path / "buck")
        self._apply(spark, t, [(1, "a", 1, "I")], epoch_id=0)

        real = txn._publish_manifest

        def dying(spark_, td, manifest, token):
            raise RuntimeError("killed before publish")

        monkeypatch.setattr(txn, "_publish_manifest", dying)
        with pytest.raises(RuntimeError, match="killed"):
            self._apply(spark, t, [(1, "a2", 2, "U")], epoch_id=1)
        monkeypatch.undo()
        assert _rows(txn.read_cdc_table(spark, t)) == {1: ("a", 1)}
        assert self._apply(spark, t, [(1, "a2", 2, "U")], epoch_id=1) == 2
        assert self._apply(spark, t, [(1, "a2", 2, "U")], epoch_id=1) is None
        assert _rows(txn.read_cdc_table(spark, t)) == {1: ("a2", 2)}

    def test_vacuum_keeps_old_dirs_still_owning_buckets(
        self, spark, tmp_path
    ):
        """An old snapshot dir must survive vacuum for as long as any
        kept manifest's mapping still points a bucket at it."""
        t = str(tmp_path / "buck")
        self._apply(spark, t, [(i, f"v{i}", i, "I") for i in range(1, 41)])
        self._apply(spark, t, [(1, "v1b", 100, "U")])
        self._apply(spark, t, [(2, "v2b", 101, "U")])
        report = txn.vacuum_txn(spark, t, keep_last=1)
        # latest mapping references up to 3 dirs (v1 remainder + v2 + v3):
        # none of them may be deleted even though only 1 manifest is kept
        assert _rows(txn.read_cdc_table(spark, t))[1] == ("v1b", 100)
        assert _rows(txn.read_cdc_table(spark, t))[2] == ("v2b", 101)
        assert _rows(txn.read_cdc_table(spark, t))[40] == ("v40", 40)
        assert report["removed_manifests"] == 2
        assert report["removed_snapshots"] == 0  # all dirs still owned
        # v2's change feed lost its manifest and was reclaimed; the
        # kept version's feed survives
        assert report["removed_change_feeds"] == 1

    def test_compaction_consolidates_dirs_and_keeps_layout(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "buck")
        self._apply(spark, t, [(i, f"v{i}", i, "I") for i in range(1, 41)])
        self._apply(spark, t, [(1, None, 100, "D")])
        self._apply(spark, t, [(2, "v2b", 101, "U")])
        txn.compact_cdc_tombstones(spark, t, min_live_seq=200)
        man = txn.latest_manifest(spark, t)
        assert "buckets" in man and len(set(man["buckets"].values())) == 1
        live = _rows(txn.read_cdc_table(spark, t))
        assert 1 not in live and live[2] == ("v2b", 101) and len(live) == 39
        raw = txn.read_cdc_table(spark, t, include_tombstones=True)
        assert raw.filter("_deleted").count() == 0  # horizon passed
        # now vacuum can actually reclaim the fragmented dirs
        report = txn.vacuum_txn(spark, t, keep_last=1)
        assert report["removed_snapshots"] == 3

    def test_layout_and_n_buckets_guards(self, spark, tmp_path):
        flat = str(tmp_path / "flat")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, "a", 1, "I")], CDC_SCHEMA), flat
        )
        with pytest.raises(ValueError, match="flat txn table"):
            self._apply(spark, flat, [(2, "b", 2, "I")])
        buck = str(tmp_path / "buck")
        self._apply(spark, buck, [(1, "a", 1, "I")])
        with pytest.raises(ValueError, match="n_buckets mismatch"):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame([(2, "b", 2, "I")], CDC_SCHEMA),
                buck,
                n_buckets=16,
            )

    def test_streaming_bucketed_end_to_end(self, spark, tmp_path):
        src = tmp_path / "cdc_src"
        src.mkdir()
        t = str(tmp_path / "buck")
        spark.createDataFrame(
            [(1, "a0", 1, "I"), (2, "b0", 2, "I")], CDC_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        changes = (
            spark.readStream.schema(CDC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = txn.stream_cdc_apply_bucketed(
            changes, t, str(tmp_path / "ckpt"), n_buckets=8,
            stats_cols=["seq"], target_file_rows=64,
        )
        q.processAllAvailable()
        spark.createDataFrame(
            [(2, None, 3, "D"), (1, "a9", 4, "U")], CDC_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        q.stop()
        assert _rows(txn.read_cdc_table(spark, t)) == {1: ("a9", 4)}
        # r7: the streaming face passes the layout knobs through — the
        # ingested table carries zone maps + the sticky roll size
        man = txn.latest_manifest(spark, t)
        assert man["stats_cols"] == ["seq"]
        assert man["cluster_rows"] == 64
        assert man["file_stats"]


class TestDeleteOverlays:
    """Merge-on-read delete overlays: a delete-only batch appends O(batch)
    tombstones and touches no bucket file; reads resolve latest-per-key
    across base + overlays; the next rewrite folds overlays in."""

    def _apply(self, spark, t, rows, **kw):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, CDC_SCHEMA), t, n_buckets=8, **kw
        )

    def _seed(self, spark, t, n=40):
        self._apply(spark, t, [(i, f"v{i}", i, "I") for i in range(1, n + 1)])

    def test_delete_only_batch_is_pure_append(self, spark, tmp_path):
        t = str(tmp_path / "mor")
        self._seed(spark, t)
        m1 = txn.latest_manifest(spark, t)
        self._apply(spark, t, [(1, None, 100, "D"), (2, None, 101, "D")])
        m2 = txn.latest_manifest(spark, t)
        # no bucket repointed — mapping byte-identical; overlay recorded
        assert m2["buckets"] == m1["buckets"]
        assert sum(len(v) for v in m2["overlays"].values()) >= 1
        live = _rows(txn.read_cdc_table(spark, t))
        assert 1 not in live and 2 not in live and live[3] == ("v3", 3)

    def test_stale_overlay_delete_loses_by_seq(self, spark, tmp_path):
        t = str(tmp_path / "mor")
        self._seed(spark, t)
        # key 5 stored at seq 5; a STALE delete at seq 3 must not kill it
        self._apply(spark, t, [(5, None, 3, "D")])
        assert _rows(txn.read_cdc_table(spark, t))[5] == ("v5", 5)

    def test_overlay_guards_and_rewrite_folds_in(self, spark, tmp_path):
        t = str(tmp_path / "mor")
        self._seed(spark, t)
        self._apply(spark, t, [(1, None, 100, "D")])
        # stale upsert after the overlay delete: loses to the tombstone
        self._apply(spark, t, [(1, "zombie", 50, "U")])
        assert 1 not in _rows(txn.read_cdc_table(spark, t))
        # that upsert batch REWROTE key 1's bucket → overlay folded in
        m = txn.latest_manifest(spark, t)
        b1 = spark.createDataFrame([(1,)], "id long").select(
            txn._bucket_of("id", 8).alias("b")
        ).collect()[0].b
        assert str(b1) not in m["overlays"]
        # newer upsert revives
        self._apply(spark, t, [(1, "fresh", 200, "U")])
        assert _rows(txn.read_cdc_table(spark, t))[1] == ("fresh", 200)

    def test_epoch_replay_skips_overlay_commit(self, spark, tmp_path):
        t = str(tmp_path / "mor")
        self._seed(spark, t)
        assert self._apply(spark, t, [(1, None, 100, "D")], epoch_id=7)
        assert (
            self._apply(spark, t, [(1, None, 100, "D")], epoch_id=7) is None
        )
        m = txn.latest_manifest(spark, t)
        assert sum(len(v) for v in m["overlays"].values()) == 1

    def test_compaction_clears_overlays_and_vacuum_reclaims(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "mor")
        self._seed(spark, t)
        self._apply(spark, t, [(1, None, 100, "D")])
        self._apply(spark, t, [(2, None, 101, "D")])
        txn.compact_cdc_tombstones(spark, t, min_live_seq=1000)
        m = txn.latest_manifest(spark, t)
        assert m["overlays"] == {}
        live = _rows(txn.read_cdc_table(spark, t))
        assert 1 not in live and 2 not in live and len(live) == 38
        report = txn.vacuum_txn(spark, t, keep_last=1)
        assert report["removed_snapshots"] >= 2  # old base + overlay dirs
        assert _rows(txn.read_cdc_table(spark, t)) == live

    def test_vacuum_keeps_overlay_dirs_of_kept_manifests(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "mor")
        self._seed(spark, t)
        self._apply(spark, t, [(1, None, 100, "D")])
        report = txn.vacuum_txn(spark, t, keep_last=1)
        assert report["removed_snapshots"] == 0  # base + overlay all live
        assert 1 not in _rows(txn.read_cdc_table(spark, t))


class TestBucketedCasRetry:
    def test_stale_log_read_retries_against_fresh_state(
        self, spark, tmp_path, monkeypatch
    ):
        """Concurrent-writer contract on the bucketed path: writer A reads
        the log, writer B publishes meanwhile, A's publish loses the
        version slot — A must RE-READ and re-merge against B's state,
        not commit a merge computed from the stale snapshot. Simulated
        by feeding A one stale manifest read; the retry loop re-invokes
        latest_manifest, so B's committed update must survive in A's
        final state."""
        t = str(tmp_path / "cas")
        df0 = spark.createDataFrame(
            [(1, "a", 1, "I"), (2, "b", 2, "I")], CDC_SCHEMA
        )
        txn.apply_cdc_batch_bucketed(df0, t, n_buckets=8)
        stale = txn.latest_manifest(spark, t)
        # writer B lands an update
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(2, "b2", 10, "U")], CDC_SCHEMA),
            t,
            n_buckets=8,
        )
        real = txn.latest_manifest
        calls = {"n": 0}

        def stale_once(spark_, table_dir):
            calls["n"] += 1
            return stale if calls["n"] == 1 else real(spark_, table_dir)

        monkeypatch.setattr(txn, "latest_manifest", stale_once)
        # writer A updates key 1; its first attempt targets B's taken slot
        v = txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(1, "a2", 11, "U")], CDC_SCHEMA),
            t,
            n_buckets=8,
        )
        monkeypatch.undo()
        assert v == 3 and calls["n"] >= 2
        live = _rows(txn.read_cdc_table(spark, t))
        # BOTH writers' effects present — the stale merge never published
        assert live == {1: ("a2", 11), 2: ("b2", 10)}


class TestOverlayAutoCompaction:
    def test_pressure_gauge_and_threshold_trigger(self, spark, tmp_path):
        t = str(tmp_path / "mor")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", i, "I") for i in range(1, 9)], CDC_SCHEMA
            ),
            t,
            n_buckets=2,  # force overlay stacking on few buckets
        )
        assert txn.overlay_pressure(spark, t) == 0
        for j, key in enumerate((1, 2, 3, 4)):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame(
                    [(key, None, 100 + j, "D")], CDC_SCHEMA
                ),
                t,
                n_buckets=2,
            )
        pressure = txn.overlay_pressure(spark, t)
        assert pressure >= 2
        # below threshold: no-op
        assert (
            txn.maybe_compact_overlays(
                spark, t, max_overlays_per_bucket=pressure
            )
            is None
        )
        # above threshold: folds everything, pressure back to zero
        assert txn.maybe_compact_overlays(
            spark, t, max_overlays_per_bucket=pressure - 1
        )
        assert txn.overlay_pressure(spark, t) == 0
        live = _rows(txn.read_cdc_table(spark, t))
        assert set(live) == {5, 6, 7, 8}


class TestSchemaEvolution:
    """Additive-only schema evolution: commits may ADD nullable columns
    (older data reads them as null), never drop or retype — the table-
    format default that keeps downstream readers from silently
    corrupting. CDC upserts must carry the full stored payload (rows
    replace whole); delete-only batches are exempt."""

    def test_flat_add_column_then_drop_and_retype_rejected(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "evo")
        txn.commit_txn(
            spark.createDataFrame([(1, "a")], "id long, val string"), t
        )
        txn.commit_txn(
            spark.createDataFrame(
                [(1, "a", 7.5)], "id long, val string, score double"
            ),
            t,
        )
        got = txn.read_txn(spark, t).collect()[0]
        assert (got.val, got.score) == ("a", 7.5)
        # time travel shows the pre-evolution schema
        assert "score" not in txn.read_txn(spark, t, version=1).columns
        with pytest.raises(ValueError, match="drops column"):
            txn.commit_txn(
                spark.createDataFrame([(1,)], "id long"), t
            )
        with pytest.raises(ValueError, match="changes column type"):
            txn.commit_txn(
                spark.createDataFrame(
                    [(1, 2, 0.0)], "id long, val int, score double"
                ),
                t,
            )

    def test_bucketed_cdc_additive_evolution_aligns_old_buckets(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "evo-b")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", i, "I") for i in range(1, 9)], CDC_SCHEMA
            ),
            t,
            n_buckets=4,
        )
        # evolved batch touches ONE key: other buckets stay in the old dir
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "v1b", 100, "U", "extra!")],
                "id long, val string, seq long, op string, note string",
            ),
            t,
            n_buckets=4,
        )
        live = {r.id: (r.val, r.note) for r in txn.read_cdc_table(spark, t).collect()}
        assert live[1] == ("v1b", "extra!")
        # rows served from PRE-evolution dirs present the new column as null
        assert all(live[i] == (f"v{i}", None) for i in range(2, 9))
        man = txn.latest_manifest(spark, t)
        assert ["note", "string"] in man["schema"]

    def test_cdc_upsert_missing_payload_rejected_deletes_exempt(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "evo-guard")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, "a", 1, "I")], CDC_SCHEMA), t
        )
        with pytest.raises(ValueError, match="missing stored payload"):
            txn.apply_cdc_batch_txn(
                spark.createDataFrame(
                    [(1, 2, "U")], "id long, seq long, op string"
                ),
                t,
            )
        # a delete-only batch without payload columns is fine
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [(1, 9, "D")], "id long, seq long, op string"
            ),
            t,
        )
        assert txn.read_cdc_table(spark, t).count() == 0

    def test_cdc_retype_rejected(self, spark, tmp_path):
        t = str(tmp_path / "evo-retype")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, "a", 1, "I")], CDC_SCHEMA), t
        )
        with pytest.raises(ValueError, match="retypes"):
            txn.apply_cdc_batch_txn(
                spark.createDataFrame(
                    [(1, 5, 2, "U")], "id long, val int, seq long, op string"
                ),
                t,
            )

    def test_clustered_commit_enforces_evolution(self, spark, tmp_path):
        from taar_gcp_etl_spark import layout

        t = str(tmp_path / "evo-z")
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "id long, v double"
        )
        layout.commit_clustered(df, t, ["id"], n_files=2)
        with pytest.raises(ValueError, match="drops column"):
            layout.commit_clustered(
                df.select("id"), t, ["id"], n_files=2
            )
        assert (
            layout.commit_clustered(
                df.withColumn("w", F.col("v") * 2), t, ["id"], n_files=2
            )
            == 2
        )


class TestManifestPublisherSeam:
    """The storage-specific CAS seam (NEXT.md r5 #1): commit atomicity
    rests entirely on put_if_absent being an atomic claim of one
    versioned manifest slot. These tests pin (a) WHY naive S3-style
    rename semantics are insufficient — the lost-update failure mode —
    and (b) that the conditional-put publisher gives exactly-one-winner
    under the same interleaving."""

    @staticmethod
    def _b_manifest(spark, t, version=2):
        """A concurrent writer's fully-committed version: snapshot dir +
        manifest, written directly (as writer B's process would)."""
        rel = f"data/v{version:010d}-writerb"
        spark.createDataFrame(
            [(99, "from-b")], "id long, val string"
        ).write.parquet(f"{t}/{rel}")
        txn._write_bytes(
            spark,
            f"{t}/_log/{txn._manifest_name(version)}",
            json.dumps(
                {
                    "version": version,
                    "snapshot": rel,
                    "epoch_id": None,
                    "parent": version - 1,
                }
            ).encode(),
        )

    def test_s3_style_rename_silently_loses_concurrent_commit(
        self, spark, tmp_path
    ):
        """S3 "rename" is copy+delete with NO destination guard: a
        check-then-copy publisher lets writer B land between A's
        exists-check and A's copy, and A clobbers B's committed
        manifest — both writers report success, B's commit is gone.
        This is the failure mode the seam exists to prevent; the test
        is the executable justification for ConditionalPutManifestPublisher
        on object stores."""
        t = str(tmp_path / "racy")
        txn.commit_txn(
            spark.createDataFrame([(1, "a")], "id long, val string"), t
        )
        test = self

        class RacyS3RenamePublisher:
            fired = False

            def put_if_absent(self, spark_, final, data, token):
                _, fs, p = txn._fs(spark_, final)
                if fs.exists(p):
                    return False
                if not self.fired:  # writer B commits in the gap
                    RacyS3RenamePublisher.fired = True
                    test._b_manifest(spark_, t)
                txn._write_bytes(spark_, final, data)  # unguarded copy
                return True

        prev = txn.set_manifest_publisher(RacyS3RenamePublisher())
        try:
            v = txn.commit_txn(
                spark.createDataFrame(
                    [(2, "from-a")], "id long, val string"
                ),
                t,
            )
        finally:
            txn.set_manifest_publisher(prev)
        # A believes it committed version 2 — and so did B
        assert v == 2
        # ...but B's committed state was silently destroyed
        vals = [r.val for r in txn.read_txn(spark, t).collect()]
        assert vals == ["from-a"] and "from-b" not in vals

    def test_conditional_put_gives_exactly_one_winner(
        self, spark, tmp_path
    ):
        """Same interleaving through the conditional-put publisher:
        writer B claims the slot first, A's put_if_absent FAILS, A
        retries against the fresh log and lands on the next version —
        both commits survive."""
        t = str(tmp_path / "cas-put")
        txn.commit_txn(
            spark.createDataFrame([(1, "a")], "id long, val string"), t
        )
        test = self

        class ContendedConditionalPut(txn.ConditionalPutManifestPublisher):
            fired = False

            def put_if_absent(self, spark_, final, data, token):
                if not ContendedConditionalPut.fired and final.endswith(
                    txn._manifest_name(2)
                ):
                    ContendedConditionalPut.fired = True
                    test._b_manifest(spark_, t)  # B wins the slot first
                return super().put_if_absent(spark_, final, data, token)

        prev = txn.set_manifest_publisher(ContendedConditionalPut())
        try:
            v = txn.commit_txn(
                spark.createDataFrame(
                    [(2, "from-a")], "id long, val string"
                ),
                t,
            )
        finally:
            txn.set_manifest_publisher(prev)
        assert v == 3  # A lost version 2, retried, won version 3
        assert [r.val for r in txn.read_txn(spark, t).collect()] == [
            "from-a"
        ]
        # B's commit is intact in the history (time travel to v2)
        assert [
            r.val for r in txn.read_txn(spark, t, version=2).collect()
        ] == ["from-b"]

    def test_put_if_absent_is_first_writer_wins(self, spark, tmp_path):
        pub = txn.ConditionalPutManifestPublisher()
        final = f"{tmp_path}/slot.json"
        assert pub.put_if_absent(spark, final, b"first", "t1")
        assert not pub.put_if_absent(spark, final, b"second", "t2")
        assert txn._read_bytes(spark, final) == b"first"

    def test_put_if_absent_surfaces_non_cas_failures(
        self, spark, tmp_path, monkeypatch
    ):
        """ADVICE r5: only destination-exists is a lost race. A
        persistent IO/permission failure must raise, not return False —
        else commit_txn burns max_attempts full snapshot rewrites and
        then reports a misleading 'version conflicts' error."""
        import pytest as _pytest

        pub = txn.ConditionalPutManifestPublisher()

        class DeniedFs:
            def create(self, p, overwrite):
                raise RuntimeError(
                    "java.io.IOException: Permission denied: slot.json"
                )

        monkeypatch.setattr(
            txn, "_fs", lambda spark, path: (None, DeniedFs(), None)
        )
        with _pytest.raises(RuntimeError, match="Permission denied"):
            pub.put_if_absent(spark, f"{tmp_path}/slot.json", b"x", "t1")

        class TakenFs:
            def create(self, p, overwrite):
                raise RuntimeError(
                    "org.apache.hadoop.fs.FileAlreadyExistsException: "
                    "slot.json already exists"
                )

        monkeypatch.setattr(
            txn, "_fs", lambda spark, path: (None, TakenFs(), None)
        )
        assert not pub.put_if_absent(
            spark, f"{tmp_path}/slot.json", b"x", "t2"
        )
        monkeypatch.undo()
        # real-FS CAS-lost condition still classified as a race: the
        # parent-is-file probe (Hadoop mkdirs raises
        # FileAlreadyExistsException there) and the taken slot
        blocker = f"{tmp_path}/blocker"
        txn._write_bytes(spark, blocker, b"i am a file")
        assert not pub.put_if_absent(
            spark, f"{blocker}/slot.json", b"x", "t3"
        )
        taken = f"{tmp_path}/taken.json"
        assert pub.put_if_absent(spark, taken, b"first", "t4")
        assert not pub.put_if_absent(spark, taken, b"second", "t5")

    def test_already_exists_ignores_nested_cause_messages(self):
        """ADVICE r6: the Java cause chain is matched on CLASS NAMES
        only — an unrelated IO failure whose nested cause merely says
        'already exists' must NOT be classified as a lost CAS race
        (it would be silently swallowed into the retry loop). Message
        matching applies solely to the top-level exception."""
        pub = txn.ConditionalPutManifestPublisher()

        class _JE:
            def __init__(self, cls, msg, cause=None):
                self._cls, self._msg, self._cause = cls, msg, cause

            def getClass(self):
                outer = self

                class _C:
                    def getName(self):
                        return outer._cls

                return _C()

            def getMessage(self):
                return self._msg

            def getCause(self):
                return self._cause

        class _Py4JErr(Exception):
            def __init__(self, je):
                super().__init__("An error occurred while calling o1.create")
                self.java_exception = je

        # nested cause mentions 'already exists' but every class is
        # unrelated → NOT a race; must surface
        nested = _JE(
            "java.io.IOException",
            "rename failed",
            _JE("java.io.IOException",
                "work dir /tmp/x already exists and is not writable"),
        )
        assert not pub._is_already_exists(_Py4JErr(nested))
        # top-level message match still classifies
        assert pub._is_already_exists(
            _Py4JErr(_JE("java.io.IOException", "slot.json already exists"))
        )
        # AlreadyExists CLASS anywhere in the chain still classifies
        assert pub._is_already_exists(
            _Py4JErr(_JE(
                "java.io.IOException", "create failed",
                _JE("org.apache.hadoop.fs.FileAlreadyExistsException", None),
            ))
        )
        # conditional-PUT 412 class family
        assert pub._is_already_exists(
            _Py4JErr(_JE("com.example.PreconditionFailedException", None))
        )
        # plain Python exception: direct message only (no chain rides
        # along), both polarities
        assert pub._is_already_exists(
            RuntimeError("org.apache.hadoop.fs.FileAlreadyExistsException: x")
        )
        assert not pub._is_already_exists(
            RuntimeError("java.io.IOException: Permission denied")
        )
        # ADVICE r7 extension point: a connector whose lost race
        # surfaces as a custom wrapper class (detail only in a nested
        # cause MESSAGE) is a hard failure by default, and a lost race
        # once its class-name marker is registered
        wrapped = _Py4JErr(_JE(
            "com.example.StorageResponseException",
            "409 conflict",
            _JE("com.example.StorageResponseException",
                "the object you tried to create already exists"),
        ))
        assert not pub._is_already_exists(wrapped)
        markers = txn.ConditionalPutManifestPublisher
        markers.ALREADY_EXISTS_CAUSE_MARKERS.add("StorageResponseException")
        try:
            assert pub._is_already_exists(wrapped)
        finally:
            markers.ALREADY_EXISTS_CAUSE_MARKERS.discard(
                "StorageResponseException"
            )

    def test_rename_publisher_still_default_and_race_safe(
        self, spark, tmp_path
    ):
        """The default publisher keeps the exists-check + rename
        semantics: claiming a taken slot fails and leaves no temp
        litter in _log/."""
        t = str(tmp_path / "ren")
        txn.commit_txn(
            spark.createDataFrame([(1, "a")], "id long, val string"), t
        )
        assert isinstance(
            txn._manifest_publisher, txn.RenameManifestPublisher
        )
        final = f"{t}/_log/{txn._manifest_name(1)}"
        assert not txn._manifest_publisher.put_if_absent(
            spark, final, b"clobber", "tx"
        )
        _, fs, log_p = txn._fs(spark, f"{t}/_log")
        names = [s.getPath().getName() for s in fs.listStatus(log_p)]
        assert names == [txn._manifest_name(1)]


class TestChangeDataFeed:
    def test_flat_diff_tags_insert_update_delete(self, spark, tmp_path):
        t = str(tmp_path / "cdf")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [(1, "a", 1, "I"), (2, "b", 2, "I")], CDC_SCHEMA
            ),
            t,
        )
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [(1, "a2", 10, "U"), (2, None, 11, "D"), (3, "c", 12, "I")],
                CDC_SCHEMA,
            ),
            t,
        )
        got = {
            r.id: (r.val, r._change_type)
            for r in txn.read_changes(spark, t, 1, 2).collect()
        }
        assert got == {
            1: ("a2", "update"),
            2: (None, "delete"),
            3: ("c", "insert"),
        }
        # same-version diff is empty; unchanged keys never appear
        assert txn.read_changes(spark, t, 2, 2).count() == 0

    def test_flat_from_version_zero_is_all_inserts(self, spark, tmp_path):
        """ADVICE r5: from_version=0 means 'since table creation' (the
        read_changes_bucketed-documented contract) — on a FLAT table it
        must return the snapshot tagged insert, not raise trying to
        read the nonexistent version-0 manifest. Both entry points."""
        t = str(tmp_path / "cdf0")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [(1, "a", 1, "I"), (2, "b", 2, "I"), (2, None, 3, "D")],
                CDC_SCHEMA,
            ),
            t,
        )
        for reader in (txn.read_changes, txn.read_changes_bucketed):
            got = {
                r.id: (r.val, r._change_type)
                for r in reader(spark, t, 0).collect()
            }
            assert got == {1: ("a", "insert")}  # tombstone absent

    def test_bucketed_diff_sees_overlay_deletes(self, spark, tmp_path):
        t = str(tmp_path / "cdf-b")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", i, "I") for i in range(1, 6)], CDC_SCHEMA
            ),
            t,
            n_buckets=4,
        )
        # delete-only batch lands as a merge-on-read overlay
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(3, None, 50, "D")], CDC_SCHEMA),
            t,
            n_buckets=4,
        )
        got = {
            r.id: r._change_type
            for r in txn.read_changes(spark, t, 1, 2).collect()
        }
        assert got == {3: "delete"}


class TestBucketGranularCdf:
    """read_changes_bucketed (round-6 backlog #7): the diff must read
    only the buckets whose manifest entries changed between the two
    versions, and must equal the full-snapshot diff exactly."""

    def _cdf(self, df):
        return {r.id: (r.val, r._change_type) for r in df.collect()}

    def _build(self, spark, t):
        """v1: 8 inserts; v2: update/delete/insert touching a few keys;
        v3: delete-only overlay batch."""
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", i, "I") for i in range(1, 9)], CDC_SCHEMA
            ),
            t,
            n_buckets=16,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(2, "v2x", 20, "U"), (5, None, 21, "D"), (9, "v9", 22, "I")],
                CDC_SCHEMA,
            ),
            t,
            n_buckets=16,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(7, None, 30, "D")], CDC_SCHEMA),
            t,
            n_buckets=16,
        )

    def test_equals_full_diff_across_all_version_pairs(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "bcdf")
        self._build(spark, t)
        for lo in (1, 2, 3):
            for hi in (1, 2, 3):
                full = txn.read_changes(spark, t, lo, hi)
                fast = txn.read_changes_bucketed(spark, t, lo, hi)
                assert self._cdf(fast) == self._cdf(full), (lo, hi)
                assert sorted(fast.columns) == sorted(full.columns)

    def test_changed_bucket_set_is_exactly_the_touched_buckets(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "bcdf2")
        self._build(spark, t)
        m1 = txn.read_manifest(spark, t, 1)
        m2 = txn.read_manifest(spark, t, 2)
        m3 = txn.read_manifest(spark, t, 3)
        def bucket(k):
            return (
                spark.createDataFrame([(k,)], "id long")
                .select(txn._bucket_of("id", 16))
                .first()[0]
            )
        assert txn.changed_buckets(m1, m2) == sorted(
            {bucket(2), bucket(5), bucket(9)}
        )
        # v3 is a pure overlay append: only the deleted key's bucket
        assert txn.changed_buckets(m2, m3) == [bucket(7)]
        assert txn.changed_buckets(m2, m2) == []

    def test_diff_plan_prunes_to_changed_bucket_partitions(
        self, spark, tmp_path
    ):
        import re

        t = str(tmp_path / "bcdf3")
        self._build(spark, t)
        plan = (
            txn.read_changes_bucketed(spark, t, 2, 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # both sides of the diff read through bucket-partition filters —
        # the read is O(changed buckets), never a table scan
        assert re.search(r"PartitionFilters: \[[^\]]*_bucket", plan), plan

    def test_cdf_mode_emits_preimages_and_delete_payloads(
        self, spark, tmp_path
    ):
        """Delta-CDF-compatible shape: deletes carry the OLD payload,
        updates emit preimage + postimage rows."""
        t = str(tmp_path / "cdfm")
        self._build(spark, t)
        rows = {
            (r.id, r._change_type): r.val
            for r in txn.read_changes_bucketed(
                spark, t, 1, 2, mode="cdf"
            ).collect()
        }
        assert rows == {
            (2, "update_preimage"): "v2",
            (2, "update_postimage"): "v2x",
            (5, "delete"): "v5",  # preimage payload, not null
            (9, "insert"): "v9",
        }
        # full-diff twin agrees
        full = {
            (r.id, r._change_type): r.val
            for r in txn.read_changes(spark, t, 1, 2, mode="cdf").collect()
        }
        assert full == rows

    def test_netting_composes_transitions_across_versions(
        self, spark, tmp_path
    ):
        """Multi-version windows net through the per-commit change
        files: insert→delete cancels, delete→re-insert becomes an
        update whose preimage is the deleted row, update chains
        collapse to first-preimage/last-postimage."""
        t = str(tmp_path / "net")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a1", 1, "I"), (2, "b1", 2, "I")], CDC_SCHEMA
            ),
            t, n_buckets=4,
        )
        # v2: insert 3; update 1
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(3, "c1", 10, "I"), (1, "a2", 11, "U")], CDC_SCHEMA
            ),
            t, n_buckets=4,
        )
        # v3: delete 3 (net: 3 never existed); update 1 again; delete 2
        # then v4: re-insert 2
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(3, None, 20, "D"), (1, "a3", 21, "U"), (2, None, 22, "D")],
                CDC_SCHEMA,
            ),
            t, n_buckets=4,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(2, "b2", 30, "I")], CDC_SCHEMA),
            t, n_buckets=4,
        )
        # every commit in (1, 4] materialized change files -> netting
        for v in (2, 3, 4):
            assert "change_files" in txn.read_manifest(spark, t, v)
        got = {
            (r.id, r._change_type): r.val
            for r in txn.read_changes_bucketed(
                spark, t, 1, 4, mode="cdf"
            ).collect()
        }
        assert got == {
            (1, "update_preimage"): "a1",
            (1, "update_postimage"): "a3",
            (2, "update_preimage"): "b1",  # delete+reinsert nets to update
            (2, "update_postimage"): "b2",
            # key 3: insert then delete -> no row at all
        }
        # and the netted result equals the snapshot-diff baseline
        base = {
            (r.id, r._change_type): r.val
            for r in txn.read_changes(spark, t, 1, 4, mode="cdf").collect()
        }
        assert got == base

    def test_diff_spans_additive_schema_evolution(self, spark, tmp_path):
        """A column added inside the diff window reads as typed null on
        the old side (review fix: the old snapshot was asked for the
        NEW schema's columns and crashed)."""
        t = str(tmp_path / "evo")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(1, "a", 1, "I")], CDC_SCHEMA),
            t, n_buckets=4,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a2", "x@y", 10, "U"), (2, "b", "p@q", 11, "I")],
                "id long, val string, email string, seq long, op string",
            ),
            t, n_buckets=4,
        )
        for mode in ("compact", "cdf"):
            got = {
                (r.id, r._change_type): r.email
                for r in txn.read_changes(spark, t, 1, 2, mode=mode)
                .collect()
            }
            assert got[(2, "insert")] == "p@q"
        # preimage rows show the pre-evolution row with email = null
        pre = [
            r
            for r in txn.read_changes(spark, t, 1, 2, mode="cdf").collect()
            if r._change_type == "update_preimage"
        ]
        assert len(pre) == 1 and pre[0].email is None and pre[0].val == "a"
        # invalid mode rejected eagerly on both entry points
        with pytest.raises(ValueError, match="compact"):
            txn.read_changes(spark, t, 1, 2, mode="CDF")
        with pytest.raises(ValueError, match="compact"):
            txn.read_changes_bucketed(spark, t, 1, 2, mode="nope")

    def test_netting_spans_tombstone_compaction(self, spark, tmp_path):
        """compact_cdc_tombstones repoints every bucket; without its
        empty change file any window over it would fall back to a
        FULL-table snapshot diff (review fix)."""
        t = str(tmp_path / "cmp")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", i, "I") for i in range(1, 9)], CDC_SCHEMA
            ),
            t, n_buckets=4,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "x", 10, "U"), (2, None, 11, "D")], CDC_SCHEMA
            ),
            t, n_buckets=4,
        )
        txn.compact_cdc_tombstones(spark, t, min_live_seq=100)   # v3
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(3, "y", 20, "U")], CDC_SCHEMA),
            t, n_buckets=4,                                      # v4
        )
        diff = txn.read_changes_bucketed(spark, t, 1, 4, mode="cdf")
        files = diff.inputFiles()
        assert files and all("/data/c" in f for f in files), files
        got = {(r.id, r._change_type) for r in diff.collect()}
        assert got == {
            (1, "update_preimage"), (1, "update_postimage"),
            (2, "delete"),
            (3, "update_preimage"), (3, "update_postimage"),
        }

    def test_netting_plan_reads_only_change_files(self, spark, tmp_path):
        """The fast path must not touch any snapshot dir: every input
        file of the diff plan comes from a per-commit change dir."""
        t = str(tmp_path / "netp")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", i, "I") for i in range(1, 9)], CDC_SCHEMA
            ),
            t, n_buckets=4,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(1, "x", 10, "U")], CDC_SCHEMA),
            t, n_buckets=4,
        )
        files = txn.read_changes_bucketed(spark, t, 1, 2).inputFiles()
        assert files, "expected a materialized change-file plan"
        assert all("/data/c" in f for f in files), files

    def test_vacuumed_from_version_raises_not_all_inserts(
        self, spark, tmp_path
    ):
        """A diff base that vacuum removed must raise — silently
        returning 'everything is an insert' would double-count in any
        downstream sync."""
        t = str(tmp_path / "netv")
        for i in range(4):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame(
                    [(1, f"v{i}", i + 1, "U" if i else "I")], CDC_SCHEMA
                ),
                t, n_buckets=4,
            )
        txn.vacuum_txn(spark, t, keep_last=2)
        with pytest.raises(Exception):
            txn.read_changes_bucketed(spark, t, 1, 4).collect()
        # the kept window still diffs fine
        assert {
            r._change_type
            for r in txn.read_changes_bucketed(spark, t, 3, 4).collect()
        } == {"update"}

    def test_flat_table_falls_back_to_full_diff(self, spark, tmp_path):
        t = str(tmp_path / "bcdf-flat")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, "a", 1, "I")], CDC_SCHEMA), t
        )
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, "a2", 2, "U")], CDC_SCHEMA), t
        )
        assert self._cdf(
            txn.read_changes_bucketed(spark, t, 1, 2)
        ) == self._cdf(txn.read_changes(spark, t, 1, 2))


class TestRescaleBuckets:
    """rescale_buckets: re-hash a bucketed CDC table to a new bucket
    count transactionally — content (live rows AND retention
    tombstones) preserved, pruning intact on the new modulus, CDF
    netting available across the maintenance version."""

    def _seed(self, spark, t):
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", i, "I") for i in range(1, 41)], CDC_SCHEMA
            ),
            t, n_buckets=4,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(5, None, 100, "D")], CDC_SCHEMA),
            t, n_buckets=4,
        )

    def test_content_and_tombstones_survive_rescale(self, spark, tmp_path):
        t = str(tmp_path / "rs")
        self._seed(spark, t)
        before = _rows(txn.read_cdc_table(spark, t))
        v = txn.rescale_buckets(spark, t, 16)
        assert v == 3
        man = txn.latest_manifest(spark, t)
        assert man["n_buckets"] == 16 and len(man["buckets"]) == 16
        assert man["overlays"] == {}
        assert _rows(txn.read_cdc_table(spark, t)) == before
        # the tombstone's retention state survived the re-hash: a stale
        # upsert for the deleted key still cannot resurrect it
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(5, "zombie", 50, "U")], CDC_SCHEMA),
            t, n_buckets=None,  # inherit the rescaled count
        )
        assert 5 not in _rows(txn.read_cdc_table(spark, t))
        # no-op when already at the target
        assert txn.rescale_buckets(spark, t, 16) is None
        # the old count is now rejected; inheritance works
        with pytest.raises(ValueError, match="n_buckets mismatch"):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame([(50, "x", 200, "I")], CDC_SCHEMA),
                t, n_buckets=4,
            )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(50, "x", 200, "I")], CDC_SCHEMA),
            t, n_buckets=None,
        )
        assert _rows(txn.read_cdc_table(spark, t))[50] == ("x", 200)

    def test_cdf_netting_spans_the_rescale_version(self, spark, tmp_path):
        """A diff window containing the rescale must stay on the
        O(changes) netting path (rescale records an EMPTY change file)
        and net to exactly the real changes either side of it."""
        t = str(tmp_path / "rsc")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", i, "I") for i in range(1, 9)], CDC_SCHEMA
            ),
            t, n_buckets=4,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(1, "x", 10, "U")], CDC_SCHEMA),
            t, n_buckets=4,
        )
        txn.rescale_buckets(spark, t, 8)                      # v3
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame([(2, "y", 11, "U")], CDC_SCHEMA),
            t, n_buckets=None,                                 # v4
        )
        diff = txn.read_changes_bucketed(spark, t, 1, 4)
        files = diff.inputFiles()
        assert files and all("/data/c" in f for f in files), files
        got = {(r.id, r._change_type): r.val for r in diff.collect()}
        assert got == {(1, "update"): "x", (2, "update"): "y"}
        # equality with the snapshot-diff baseline
        base = {
            (r.id, r._change_type): r.val
            for r in txn.read_changes(spark, t, 1, 4).collect()
        }
        assert got == base

    def test_inherit_requires_existing_table(self, spark, tmp_path):
        with pytest.raises(ValueError, match="inherit"):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame([(1, "a", 1, "I")], CDC_SCHEMA),
                str(tmp_path / "nope"), n_buckets=None,
            )


class TestIncrementalViewSync:
    """sync_aggregate_from_cdc: a materialized aggregate over a
    CDC-maintained table stays equal to a full re-aggregate of the live
    rows after every sync — through updates, group moves, deletes, and
    replays — while reading the source only through the bucket-granular
    change feed."""

    SRC = "id long, grp string, val long, seq long, op string"
    MEASURES = {"total": ("sum", "val"), "n": ("count", "*")}

    def _apply(self, spark, src, rows):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, self.SRC), src,
            key_col="id", n_buckets=8,
        )

    def _expect(self, spark, src, measures):
        from taar_gcp_etl_spark.operators.merge import _measure_agg

        live = txn.read_cdc_table(spark, src)
        mnames = sorted(measures)
        return {
            r.grp: tuple(r[m] for m in mnames)
            for r in live.groupBy("grp")
            .agg(*[_measure_agg(measures[m]).alias(m) for m in mnames])
            .collect()
        }

    def _got(self, spark, store, measures):
        df = txn.read_aggregate_store(spark, store)
        mnames = sorted(measures)
        assert set(df.columns) == {"grp", *mnames}  # counters hidden
        return {r.grp: tuple(r[m] for m in mnames) for r in df.collect()}

    def test_retraction_path_tracks_updates_moves_deletes(
        self, spark, tmp_path
    ):
        src = str(tmp_path / "src")
        store = str(tmp_path / "mv")
        self._apply(spark, src, [
            (1, "a", 10, 1, "I"), (2, "a", 20, 2, "I"),
            (3, "b", 5, 3, "I"), (4, "b", None, 4, "I"),
        ])
        v = txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp"], self.MEASURES
        )
        assert v == 1
        assert self._got(spark, store, self.MEASURES) == self._expect(
            spark, src, self.MEASURES
        )
        # update value, MOVE a row a->b, delete one row
        self._apply(spark, src, [
            (1, "a", 11, 10, "U"),      # value update in place
            (2, "b", 20, 11, "U"),      # group move: a loses, b gains
            (3, None, None, 12, "D"),   # delete
            (5, "c", 7, 13, "I"),       # new group
        ])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], self.MEASURES)
        assert self._got(spark, store, self.MEASURES) == self._expect(
            spark, src, self.MEASURES
        )
        # empty group a entirely: it must vanish from the store
        self._apply(spark, src, [(1, None, None, 20, "D")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], self.MEASURES)
        got = self._got(spark, store, self.MEASURES)
        assert "a" not in got
        assert got == self._expect(spark, src, self.MEASURES)
        # replay: already at source version -> no-op, store unchanged
        assert txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp"], self.MEASURES
        ) is None
        assert got == self._got(spark, store, self.MEASURES)

    def test_sum_returns_to_null_when_nonnull_inputs_retract(
        self, spark, tmp_path
    ):
        """The _nn counter edge: a group whose only non-null value is
        deleted must show sum NULL again (full-re-aggregate parity),
        not a frozen 0."""
        src = str(tmp_path / "srcn")
        store = str(tmp_path / "mvn")
        self._apply(spark, src, [(1, "g", None, 1, "I")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], self.MEASURES)
        assert self._got(spark, store, self.MEASURES)["g"] == (1, None)
        self._apply(spark, src, [(2, "g", 42, 2, "I")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], self.MEASURES)
        assert self._got(spark, store, self.MEASURES)["g"] == (2, 42)
        self._apply(spark, src, [(2, None, None, 3, "D")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], self.MEASURES)
        assert self._got(spark, store, self.MEASURES)["g"] == (1, None)
        assert self._got(spark, store, self.MEASURES) == self._expect(
            spark, src, self.MEASURES
        )

    def test_null_group_key_is_a_group(self, spark, tmp_path):
        src = str(tmp_path / "srcg")
        store = str(tmp_path / "mvg")
        self._apply(spark, src, [
            (1, None, 3, 1, "I"), (2, None, 4, 2, "I"), (3, "x", 9, 3, "I"),
        ])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], self.MEASURES)
        assert self._got(spark, store, self.MEASURES) == self._expect(
            spark, src, self.MEASURES
        )
        self._apply(spark, src, [(1, None, None, 9, "D")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], self.MEASURES)
        got = self._got(spark, store, self.MEASURES)
        assert got[None] == (1, 4)
        assert got == self._expect(spark, src, self.MEASURES)

    def test_minmax_recompute_path(self, spark, tmp_path):
        """Deleting the current max forces the group's recompute — the
        retraction identity cannot produce the new max."""
        measures = {"mx": ("max", "val"), "mn": ("min", "val")}
        src = str(tmp_path / "srcm")
        store = str(tmp_path / "mvm")
        self._apply(spark, src, [
            (1, "a", 10, 1, "I"), (2, "a", 99, 2, "I"), (3, "b", 7, 3, "I"),
        ])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert self._got(spark, store, measures) == self._expect(
            spark, src, measures
        )
        self._apply(spark, src, [(2, None, None, 10, "D")])  # drop the max
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        got = self._got(spark, store, measures)
        assert got["a"] == (10, 10)
        assert got == self._expect(spark, src, measures)
        # untouched group b must have survived the splice unchanged
        assert got["b"] == (7, 7)

    def test_approx_distinct_measure_tracks_live_rows(
        self, spark, tmp_path
    ):
        """approx_distinct routes through the group-targeted recompute
        (an HLL sketch cannot forget a value): after updates and
        deletes the estimate equals the exact distinct count of the
        LIVE rows (exact at these cardinalities), read back as a number
        via read_aggregate_store(measures=)."""
        measures = {"u": ("approx_distinct", "val"), "mx": ("max", "val")}
        src = str(tmp_path / "srch")
        store = str(tmp_path / "mvh")
        self._apply(spark, src, [
            (1, "a", 10, 1, "I"), (2, "a", 10, 2, "I"),
            (3, "a", 30, 3, "I"), (4, "b", 7, 4, "I"),
        ])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)

        def got():
            df = txn.read_aggregate_store(spark, store, measures=measures)
            assert dict(df.dtypes)["u"] == "bigint"
            return {r.grp: (r.u, r.mx) for r in df.collect()}

        assert got() == {"a": (2, 30), "b": (1, 7)}
        # delete one of the duplicated-value rows: distinct unchanged;
        # delete the unique 30: distinct drops — a sketch-union store
        # could never produce this, only the recompute can
        self._apply(spark, src, [(1, None, None, 10, "D")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert got() == {"a": (2, 30), "b": (1, 7)}
        self._apply(spark, src, [(3, None, None, 11, "D")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert got() == {"a": (1, 10), "b": (1, 7)}

    def test_insert_only_window_merges_without_source_read(
        self, spark, tmp_path, monkeypatch
    ):
        """An insert-only change window maintains min/max/HLL stores by
        MERGE (least/greatest/sketch-union), never reading the source:
        read_cdc_table and scan_cdc_pruned must not be called; deletes
        re-engage the recompute; a NULL group key disqualifies the fast
        path (plain-equality joins would split the null group)."""
        measures = {"mx": ("max", "val"), "u": ("approx_distinct", "val")}
        src = str(tmp_path / "srci")
        store = str(tmp_path / "mvi")
        self._apply(spark, src, [(1, "a", 10, 1, "I"), (2, "b", 5, 2, "I")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)

        reads = []
        real_read, real_scan = txn.read_cdc_table, txn.scan_cdc_pruned
        monkeypatch.setattr(
            txn, "read_cdc_table",
            lambda *a, **k: (reads.append("full"), real_read(*a, **k))[1],
        )
        monkeypatch.setattr(
            txn, "scan_cdc_pruned",
            lambda *a, **k: (reads.append("pruned"), real_scan(*a, **k))[1],
        )

        def got():
            df = txn.read_aggregate_store(spark, store, measures=measures)
            return {r.grp: (r.mx, r.u) for r in df.collect()}

        # insert-only window: new group + growth of an existing one
        self._apply(spark, src, [
            (3, "a", 99, 3, "I"), (4, "c", 7, 4, "I"),
        ])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert reads == []  # merged, no source scan
        assert got() == {"a": (99, 2), "b": (5, 1), "c": (7, 1)}

        # a delete re-engages the recompute (and may prune)
        self._apply(spark, src, [(3, None, None, 9, "D")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert reads != []
        assert got() == {"a": (10, 1), "b": (5, 1), "c": (7, 1)}

        # NULL group key: fast path declined, result still exact
        reads.clear()
        self._apply(spark, src, [(5, None, 42, 10, "I")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert reads != []
        assert got() == {
            "a": (10, 1), "b": (5, 1), "c": (7, 1), None: (42, 1),
        }
        assert got() == {
            r.grp: (r.mx, r.u)
            for r in txn.read_cdc_table(spark, src)
            .groupBy("grp")
            .agg(
                F.max("val").alias("mx"),
                F.countDistinct("val").alias("u"),
            )
            .collect()
        }

    def test_minmax_recompute_prunes_zone_mapped_source(
        self, spark, tmp_path, monkeypatch
    ):
        """NEXT.md r6 #6: when the source carries zone maps on the
        group key, the recompute reads only files whose stats intersect
        the touched keys — asserted by spying scan_cdc_pruned AND by
        the prune report, with the result still equal to a full
        re-aggregate. The cost gate is overridden to 1.0 here: this
        tests the MECHANISM; the gate policy has its own test."""
        measures = {"mx": ("max", "val"), "mn": ("min", "val")}
        src = str(tmp_path / "srcz")
        store = str(tmp_path / "mvz")

        def apply(rows):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame(rows, self.SRC), src,
                key_col="id", n_buckets=4, stats_cols=["grp"],
            )

        # two batches with disjoint group ranges → per-file grp stats
        # that separate them
        apply([(i, "aaa", i * 10, i, "I") for i in range(1, 5)])
        apply([(i, "zzz", i * 10, i, "I") for i in range(10, 14)])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)

        monkeypatch.setattr(txn, "_IVM_PRUNE_MAX_KEPT_FRACTION", 1.0)
        calls = []
        real = txn.scan_cdc_pruned

        def spy(spark_, table_dir, filters, **kw):
            calls.append(filters)
            return real(spark_, table_dir, filters, **kw)

        monkeypatch.setattr(txn, "scan_cdc_pruned", spy)
        apply([(2, None, None, 100, "D")])  # drop group aaa's max
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert calls == [[("grp", "in", ["aaa"])]]
        rep = txn.cdc_prune_report(spark, src, calls[0])
        assert 0 < rep["kept_files"] < rep["total_files"], rep
        got = self._got(spark, store, measures)
        assert got == self._expect(spark, src, measures)
        assert got["zzz"] == (100, 130)  # untouched group spliced intact

        # touched NULL group key: pruning must stand down, result exact
        apply([(20, None, 5, 101, "I"), (21, "aaa", 1, 102, "I")])
        calls.clear()
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert calls == []  # fell back to the full live scan
        assert self._got(spark, store, measures) == self._expect(
            spark, src, measures
        )

        # in-list cap: beyond it the filter degrades to the min/max
        # range (group move aaa→bbb + insert ccc: a retraction window,
        # so the recompute — not the insert-only merge — runs)
        monkeypatch.setattr(txn, "_IVM_IN_CAP", 1)
        calls.clear()
        apply([(21, "bbb", 2, 103, "U"), (23, "ccc", 3, 104, "I")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert calls == [[("grp", "between", ("aaa", "ccc"))]]
        assert self._got(spark, store, measures) == self._expect(
            spark, src, measures
        )

        # opt-out flag bypasses the pruned scan entirely (delete forces
        # the recompute branch; with pruning off it reads the full live
        # set)
        calls.clear()
        apply([(10, None, None, 105, "D")])
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp"], measures, prune_recompute=False
        )
        assert calls == []
        assert self._got(spark, store, measures) == self._expect(
            spark, src, measures
        )

    def test_prune_cost_gate_falls_back_when_little_is_skipped(
        self, spark, tmp_path, monkeypatch
    ):
        """The metadata cost gate: when the touched-key filters keep
        more than _IVM_PRUNE_MAX_KEPT_FRACTION of candidate files, the
        pruned scan (many per-file reads) loses to the plain dir scan —
        measured 1.8x at 44% kept in the sf1 soak — so the sync must
        fall back, and stay correct."""
        measures = {"mx": ("max", "val")}
        src = str(tmp_path / "srcg2")
        store = str(tmp_path / "mvg2")

        def apply(rows):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame(rows, self.SRC), src,
                key_col="id", n_buckets=4, stats_cols=["grp"],
            )

        # one commit, all groups mixed in every file: any filter keeps
        # every file (kept fraction 1.0 > 0.25)
        apply([(i, f"g{i % 3}", i, i, "I") for i in range(1, 13)])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        calls = []
        real = txn.scan_cdc_pruned
        monkeypatch.setattr(
            txn, "scan_cdc_pruned",
            lambda *a, **k: (calls.append(a[2]), real(*a, **k))[1],
        )
        apply([(1, None, None, 99, "D")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert calls == []  # gate declined the prune
        assert self._got(spark, store, measures) == self._expect(
            spark, src, measures
        )

    def test_composite_key_second_column_rides_residual(
        self, spark, tmp_path, monkeypatch
    ):
        """NEXT r8 #5: for a store keyed (grp, reg) where only grp is
        stats-covered, the touched-group filters now include a reg
        in-list — the manifest plan prices files on grp alone (sound:
        unknown columns are kept conservatively) while the residual
        pushed onto the base scan carries reg too, so the parquet
        reader's native stats skip inside kept files and the semi-join
        probe shrinks. Result stays equal to a full re-aggregate."""
        schema = (
            "id long, grp string, reg string, val long, seq long, "
            "op string"
        )
        measures = {"mx": ("max", "val"), "mn": ("min", "val")}
        src = str(tmp_path / "srccomp")
        store = str(tmp_path / "mvcomp")

        def apply(rows):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame(rows, schema), src,
                key_col="id", n_buckets=4, stats_cols=["grp"],
            )

        def expect():
            return {
                (r.grp, r.reg): (r.mx, r.mn)
                for r in txn.read_cdc_table(spark, src)
                .groupBy("grp", "reg")
                .agg(F.max("val").alias("mx"), F.min("val").alias("mn"))
                .collect()
            }

        def got():
            return {
                (r.grp, r.reg): (r.mx, r.mn)
                for r in txn.read_aggregate_store(spark, store).collect()
            }

        apply([(i, "aaa", f"r{i % 2}", i * 10, i, "I")
               for i in range(1, 5)])
        apply([(i, "zzz", f"r{i % 2}", i * 10, i, "I")
               for i in range(10, 14)])
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp", "reg"], measures
        )
        monkeypatch.setattr(txn, "_IVM_PRUNE_MAX_KEPT_FRACTION", 1.0)
        calls = []
        real = txn.scan_cdc_pruned
        monkeypatch.setattr(
            txn, "scan_cdc_pruned",
            lambda *a, **k: (calls.append(a[2]), real(*a, **k))[1],
        )
        apply([(2, None, None, None, 100, "D")])  # touches (aaa, r0)
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp", "reg"], measures
        )
        assert calls == [
            [("grp", "in", ["aaa"]), ("reg", "in", ["r0"])]
        ]
        assert got() == expect()

        # NULL in the residual-only column: reg contributes no filter,
        # grp still prunes files
        calls.clear()
        apply([(30, "aaa", None, 7, 101, "I")])
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp", "reg"], measures
        )
        assert calls == [[("grp", "in", ["aaa"])]]
        assert got() == expect()

        # stats-covered key NULL, residual-only key intact: no FILE can
        # be pruned soundly, so the whole prune stands down
        calls.clear()
        apply([(31, None, "r1", 9, 102, "I")])
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp", "reg"], measures
        )
        assert calls == []
        assert got() == expect()

    def test_prune_survives_bucket_rescale(
        self, spark, tmp_path, monkeypatch
    ):
        """A sync window spanning rescale_buckets still prunes: the
        full-rewrite manifest recollects per-dir zone maps, the rescale
        records an empty change file (CDF netting spans it), and the
        recompute reads only stat-intersecting files of the NEW layout."""
        measures = {"mx": ("max", "val"), "mn": ("min", "val")}
        src = str(tmp_path / "srcr")
        store = str(tmp_path / "mvr")

        def apply(rows, nb=2):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame(rows, self.SRC), src,
                key_col="id", n_buckets=nb, stats_cols=["grp"],
            )

        apply([(i, "aaa", i * 10, i, "I") for i in range(1, 5)])
        apply([(i, "zzz", i * 10, i, "I") for i in range(10, 14)])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)

        assert txn.rescale_buckets(spark, src, 8) is not None
        monkeypatch.setattr(txn, "_IVM_PRUNE_MAX_KEPT_FRACTION", 1.0)
        calls = []
        real = txn.scan_cdc_pruned
        monkeypatch.setattr(
            txn, "scan_cdc_pruned",
            lambda *a, **k: (calls.append(a[2]), real(*a, **k))[1],
        )
        apply([(13, None, None, 100, "D")], nb=None)  # drop zzz's max
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        assert calls == [[("grp", "in", ["zzz"])]]
        assert self._got(spark, store, measures) == self._expect(
            spark, src, measures
        )
        rep = txn.cdc_prune_report(spark, src, calls[0])
        assert 0 < rep["kept_files"] < rep["total_files"], rep

    def test_cursor_survives_multi_version_gaps(self, spark, tmp_path):
        """Several source commits between syncs: one sync catches up
        across all of them (the CDF diffs last-synced..latest)."""
        src = str(tmp_path / "srcc")
        store = str(tmp_path / "mvc")
        self._apply(spark, src, [(1, "a", 1, 1, "I")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], self.MEASURES)
        self._apply(spark, src, [(2, "a", 2, 2, "I")])
        self._apply(spark, src, [(1, "a", 5, 3, "U")])
        self._apply(spark, src, [(3, "b", 9, 4, "I")])
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], self.MEASURES)
        assert self._got(spark, store, self.MEASURES) == self._expect(
            spark, src, self.MEASURES
        )
        assert txn.latest_manifest(spark, store)["epoch_id"] == 4


class TestCdcZoneMaps:
    """Zone-map pruning over the bucketed CDC layout: time-correlated
    ingest leaves each commit's dir covering a narrow seq/date range,
    so range predicates skip old dirs wholesale — and the pruned scan
    must always equal the unpruned read + filter (soundness under
    multi-versioning, overlays, and superseded buckets)."""

    CDC_D = "id long, val string, day long, seq long, op string"

    def _batch(self, spark, rows):
        return spark.createDataFrame(rows, self.CDC_D)

    def _apply(self, spark, t, rows):
        return txn.apply_cdc_batch_bucketed(
            self._batch(spark, rows),
            t,
            n_buckets=4,
            stats_cols=["day"],
        )

    def _fixture(self, spark, t):
        # three day-correlated batches over overlapping buckets
        self._apply(
            spark, t, [(i, f"a{i}", 1, 100 + i, "I") for i in range(8)]
        )
        self._apply(
            spark, t, [(i, f"b{i}", 2, 200 + i, "I") for i in range(8, 16)]
        )
        self._apply(
            spark, t, [(i, f"c{i}", 3, 300 + i, "I") for i in range(16, 24)]
        )

    def _expect(self, spark, t, filters):
        from taar_gcp_etl_spark.layout import _residual

        return sorted(
            tuple(r)
            for r in txn.read_cdc_table(spark, t)
            .filter(_residual(filters))
            .collect()
        )

    def _got(self, spark, t, filters):
        df = txn.scan_cdc_pruned(spark, t, filters)
        return sorted(tuple(r) for r in df.collect())

    def test_day_predicate_prunes_old_dirs_and_matches(self, spark, tmp_path):
        t = str(tmp_path / "zm")
        self._fixture(spark, t)
        filters = [("day", ">=", 3)]
        rep = txn.cdc_prune_report(spark, t, filters)
        assert 0 < rep["kept_files"] < rep["total_files"]
        assert self._got(spark, t, filters) == self._expect(
            spark, t, filters
        )

    def test_update_moves_key_to_new_dir_stats(self, spark, tmp_path):
        """An updated key's base row moves to the newer dir — the
        pruned scan must pick the NEW version even when the predicate
        also matches the old dir's range."""
        t = str(tmp_path / "zm-up")
        self._fixture(spark, t)
        # update a day-1 key to day 9 (rewrites its bucket)
        self._apply(spark, t, [(2, "a2-new", 9, 900, "U")])
        got = self._got(spark, t, [("day", ">=", 9)])
        assert got == self._expect(spark, t, [("day", ">=", 9)])
        assert [r[1] for r in got] == ["a2-new"]
        # the OLD version must not resurface under a day-1 predicate
        old = self._got(spark, t, [("day", "=", 1)])
        assert all(r[0] != 2 for r in old)
        assert old == self._expect(spark, t, [("day", "=", 1)])

    def test_overlay_deletes_respected_by_pruned_scan(self, spark, tmp_path):
        t = str(tmp_path / "zm-del")
        self._fixture(spark, t)
        # delete-only batch -> MoR overlay (no base rewrite)
        txn.apply_cdc_batch_bucketed(
            self._batch(spark, [(17, None, None, 999, "D")]),
            t,
            n_buckets=4,
        )
        assert txn.overlay_pressure(spark, t) >= 1
        filters = [("day", "=", 3)]
        got = self._got(spark, t, filters)
        assert all(r[0] != 17 for r in got)
        assert got == self._expect(spark, t, filters)

    def test_empty_prune_returns_empty_with_schema(self, spark, tmp_path):
        t = str(tmp_path / "zm-empty")
        self._fixture(spark, t)
        df = txn.scan_cdc_pruned(spark, t, [("day", ">", 100)])
        assert df.count() == 0
        assert "val" in df.columns and "day" in df.columns

    def test_stats_survive_compaction(self, spark, tmp_path):
        t = str(tmp_path / "zm-compact")
        self._fixture(spark, t)
        txn.compact_cdc_tombstones(spark, t, min_live_seq=0)
        filters = [("day", "<=", 1)]
        rep = txn.cdc_prune_report(spark, t, filters)
        assert rep["total_files"] > 0
        assert self._got(spark, t, filters) == self._expect(
            spark, t, filters
        )

    def test_midlife_stats_adoption_keeps_pre_adoption_rows(
        self, spark, tmp_path, monkeypatch
    ):
        """r7 review repro: a table that adopts stats_cols mid-life has
        file_stats only for post-adoption dirs. The pruned scan must
        read pre-adoption dirs WHOLESALE (their owned buckets), not
        silently drop their rows; the report exposes them and the IVM
        gate declines while any exist."""
        from taar_gcp_etl_spark.layout import _residual

        t = str(tmp_path / "zm-adopt")
        # two batches WITHOUT stats, then adoption
        txn.apply_cdc_batch_bucketed(
            self._batch(
                spark, [(i, f"a{i}", 1, 100 + i, "I") for i in range(8)]
            ),
            t, n_buckets=4,
        )
        self._apply(spark, t, [(100, "new", 9, 300, "U")])
        man = txn.latest_manifest(spark, t)
        assert set(man["buckets"].values()) - set(man["file_stats"])
        for filters in ([("day", ">=", 1)], [("day", "=", 1)]):
            got = sorted(
                tuple(r)
                for r in txn.scan_cdc_pruned(spark, t, filters).collect()
            )
            expect = sorted(
                tuple(r)
                for r in txn.read_cdc_table(spark, t)
                .filter(_residual(filters))
                .collect()
            )
            assert got == expect and len(got) > 0, filters
        rep = txn.cdc_prune_report(spark, t, [("day", "=", 1)])
        assert rep["unstated_dirs"]
        touched = spark.createDataFrame([(9,)], "day long")
        monkeypatch.setattr(txn, "_IVM_PRUNE_MAX_KEPT_FRACTION", 1.0)
        assert txn._pruned_live_for_groups(
            spark, t, man, touched, ["day"], man["version"]
        ) is None
        # once every dir is post-adoption (full rewrite), pruning wakes
        txn.compact_cdc_tombstones(spark, t, min_live_seq=0)
        man = txn.latest_manifest(spark, t)
        rep = txn.cdc_prune_report(spark, t, [("day", "=", 9)])
        assert not rep["unstated_dirs"]
        assert txn._pruned_live_for_groups(
            spark, t, man, touched, ["day"], man["version"]
        ) is not None

    def test_stats_cols_sticky_across_batches(self, spark, tmp_path):
        t = str(tmp_path / "zm-sticky")
        self._apply(spark, t, [(1, "a", 1, 1, "I")])
        # later batch WITHOUT stats_cols still collects (manifest-sticky)
        txn.apply_cdc_batch_bucketed(
            self._batch(spark, [(2, "b", 5, 2, "I")]), t, n_buckets=4
        )
        man = txn.latest_manifest(spark, t)
        assert man["stats_cols"] == ["day"]
        assert len(man["file_stats"]) == 2  # both dirs carry zone maps


class TestSumSqMeasure:
    """r7: 'sum_sq' joins the mergeable/invertible vocabulary — the
    second moment, so variance/stddev derive from (sum_sq, sum, count)
    through every maintenance path with no exact-state store."""

    SRC = "id long, grp string, val double, seq long, op string"
    MEASURES = {"s": ("sum", "val"), "q": ("sum_sq", "val"),
                "n": ("count", "val")}

    def _apply(self, spark, src, rows):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, self.SRC), src,
            key_col="id", n_buckets=4,
        )

    def _got(self, spark, store):
        return {
            r.grp: (r.s, r.q, r.n)
            for r in txn.read_aggregate_store(spark, store).collect()
        }

    def _expect(self, spark, src):
        return {
            r.grp: (r.s, r.q, r.n)
            for r in txn.read_cdc_table(spark, src)
            .groupBy("grp")
            .agg(
                F.sum("val").alias("s"),
                F.sum(F.col("val") * F.col("val")).alias("q"),
                F.count("val").alias("n"),
            )
            .collect()
        }

    def test_invertible_through_churn_with_null_parity(
        self, spark, tmp_path, monkeypatch
    ):
        src = str(tmp_path / "src")
        store = str(tmp_path / "mv")
        self._apply(spark, src, [
            (1, "a", 3.0, 1, "I"), (2, "a", 4.0, 1, "I"),
            (3, "b", 5.0, 1, "I"), (4, "c", None, 1, "I"),
        ])
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp"], self.MEASURES
        )
        assert self._got(spark, store) == self._expect(spark, src)
        # all-sum_sq/sum/count measures: churn must take the INVERTIBLE
        # path (no source read), and stay exact through update + delete
        reads = []
        monkeypatch.setattr(
            txn, "read_cdc_table",
            lambda *a, **k: reads.append(1) or (_ for _ in ()).throw(
                AssertionError("invertible sync must not read source")
            ),
        )
        self._apply(spark, src, [
            (1, "a", 7.0, 2, "U"),            # 3.0 -> 7.0
            (3, None, None, 2, "D"),          # b retires
            (5, "c", 2.0, 2, "I"),            # c gains a non-null
        ])
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp"], self.MEASURES
        )
        monkeypatch.undo()
        got = self._got(spark, store)
        assert got == self._expect(spark, src)
        assert got["a"] == (11.0, 65.0, 2)    # 7+4, 49+16
        assert "b" not in got                 # group retired
        assert got["c"] == (2.0, 4.0, 1)      # NULL parity: was (None,
        #                                       None, 0) before the ins
        # derived variance matches an exact stddev_pop over live rows
        s, q, n = got["a"]
        var = q / n - (s / n) ** 2
        exact = (
            txn.read_cdc_table(spark, src)
            .filter(F.col("grp") == "a")
            .agg(F.var_pop("val")).first()[0]
        )
        assert abs(var - exact) < 1e-9

    def test_derived_moment_faces(self, spark, tmp_path):
        """read_aggregate_store(derive=) presents avg/var/stddev from
        the stored moments — population forms, NULL on empty count —
        matching exact aggregates over the live rows."""
        import math

        src = str(tmp_path / "src")
        store = str(tmp_path / "mv")
        self._apply(spark, src, [
            (1, "a", 3.0, 1, "I"), (2, "a", 4.0, 1, "I"),
            (3, "a", 8.0, 1, "I"), (4, "c", None, 1, "I"),
        ])
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp"], self.MEASURES
        )
        got = {
            r.grp: (r.mean, r.v, r.sd)
            for r in txn.read_aggregate_store(
                spark, store,
                derive={"mean": ("avg", "s", "n"),
                        "v": ("var", "q", "s", "n"),
                        "sd": ("stddev", "q", "s", "n")},
            ).collect()
        }
        exact = txn.read_cdc_table(spark, src).filter(
            F.col("grp") == "a"
        ).agg(F.avg("val"), F.var_pop("val"), F.stddev_pop("val")).first()
        assert got["a"][0] == exact[0]
        assert abs(got["a"][1] - exact[1]) < 1e-9
        assert abs(got["a"][2] - exact[2]) < 1e-9
        assert got["c"] == (None, None, None)  # n=0: no moments
        assert math.isclose(got["a"][2] ** 2, got["a"][1])
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not in"):
            txn.read_aggregate_store(
                spark, store, derive={"x": ("median", "s", "n")}
            )

    def test_streaming_store_merges_sum_sq(self, spark, tmp_path):
        from taar_gcp_etl_spark.streaming.jobs import (
            refresh_aggregate_store,
        )

        store = str(tmp_path / "st")
        b1 = spark.createDataFrame(
            [("a", 3.0), ("a", 4.0)], "grp string, val double"
        )
        b2 = spark.createDataFrame(
            [("a", 5.0), ("b", None)], "grp string, val double"
        )
        refresh_aggregate_store(b1, store, ["grp"], self.MEASURES,
                                epoch_id=1)
        refresh_aggregate_store(b2, store, ["grp"], self.MEASURES,
                                epoch_id=2)
        got = {
            r.grp: (r.s, r.q, r.n)
            for r in spark.read.parquet(store).collect()
        }
        assert got["a"] == (12.0, 50.0, 3)  # 9+16+25 merged across batches
        assert got["b"] == (None, None, 0)


class TestStreamSyncAggregate:
    """NEXT.md r7 #3: the streaming IVM loop — a file stream over the
    source's _log/ commit stream drives sync_aggregate_from_cdc per
    committed version; the sync's own cursor turns the at-least-once
    trigger into exactly-once on the store."""

    SRC = "id long, grp string, val long, seq long, op string"
    MEASURES = {"total": ("sum", "val"), "n": ("count", "*"),
                "mx": ("max", "val")}

    def _apply(self, spark, src, rows):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, self.SRC), src,
            key_col="id", n_buckets=4, stats_cols=["grp"],
        )

    def _expect(self, spark, src):
        from taar_gcp_etl_spark.operators.merge import _measure_agg

        mnames = sorted(self.MEASURES)
        return {
            r.grp: tuple(r[m] for m in mnames)
            for r in txn.read_cdc_table(spark, src)
            .groupBy("grp")
            .agg(*[_measure_agg(self.MEASURES[m]).alias(m)
                   for m in mnames])
            .collect()
        }

    def _got(self, spark, store):
        mnames = sorted(self.MEASURES)
        return {
            r.grp: tuple(r[m] for m in mnames)
            for r in txn.read_aggregate_store(spark, store).collect()
        }

    def test_stream_starts_before_first_commit(self, spark, tmp_path):
        """Review fix: deploying the sync stream BEFORE the source's
        first commit (the natural bootstrap order) must wait for it,
        not die on PATH_NOT_FOUND for the missing _log dir."""
        from taar_gcp_etl_spark.streaming.jobs import stream_sync_aggregate

        src = str(tmp_path / "src")
        store = str(tmp_path / "mv")
        q = stream_sync_aggregate(
            spark, src, store, str(tmp_path / "ckpt"), ["grp"],
            self.MEASURES,
        )
        try:
            q.processAllAvailable()  # nothing committed yet: no-op
            self._apply(spark, src, [(1, "a", 10, 1, "I")])
            q.processAllAvailable()
            assert self._got(spark, store) == self._expect(spark, src)
        finally:
            q.stop()

    def test_poison_version_fails_stream_cursor_unmoved(
        self, spark, tmp_path, monkeypatch
    ):
        """VERDICT r7: the failure CONTRACT of the streaming IVM loop.
        A sync that throws inside the trigger surfaces as a stream
        failure (at-least-once retry, never a silent skip), the store
        cursor does not move, and a restart with the fault cleared
        catches up exactly — no double-apply, no lost commit."""
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        from taar_gcp_etl_spark.streaming.jobs import stream_sync_aggregate

        src = str(tmp_path / "src")
        store = str(tmp_path / "mv")
        ckpt = str(tmp_path / "ckpt")
        self._apply(spark, src, [(1, "a", 10, 1, "I")])
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp"], self.MEASURES
        )
        cursor0 = txn.latest_manifest(spark, store)["epoch_id"]

        real = txn.sync_aggregate_from_cdc
        monkeypatch.setattr(
            txn, "sync_aggregate_from_cdc",
            lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("poisoned source version")
            ),
        )
        q = stream_sync_aggregate(
            spark, src, store, ckpt, ["grp"], self.MEASURES
        )
        try:
            self._apply(spark, src, [(2, "b", 5, 2, "I")])
            import pytest as _pytest

            with _pytest.raises(StreamingQueryException):
                q.processAllAvailable()
        finally:
            q.stop()
        # cursor unmoved: the poisoned commit was NOT marked synced
        assert txn.latest_manifest(spark, store)["epoch_id"] == cursor0
        assert self._got(spark, store) == {"a": (10, 1, 10)}

        # fault cleared → restart on the same checkpoint catches up
        monkeypatch.setattr(txn, "sync_aggregate_from_cdc", real)
        q2 = stream_sync_aggregate(
            spark, src, store, ckpt, ["grp"], self.MEASURES
        )
        try:
            q2.processAllAvailable()
            assert self._got(spark, store) == self._expect(spark, src)
            assert (
                txn.latest_manifest(spark, store)["epoch_id"] > cursor0
            )
        finally:
            q2.stop()

    def test_stream_survives_log_vacuum_race(self, spark, tmp_path):
        """The commit-stream file source lists _log/ manifests that
        vacuum_txn(keep_last=) may delete between listing and read —
        ignoreMissingFiles (plus tick() ignoring file CONTENT) keeps
        the stream alive through a vacuum, and later commits still
        sync exactly."""
        from taar_gcp_etl_spark.streaming.jobs import stream_sync_aggregate

        src = str(tmp_path / "src")
        store = str(tmp_path / "mv")
        ckpt = str(tmp_path / "ckpt")
        for k in range(4):  # several manifests so vacuum has victims
            self._apply(spark, src, [(k, "a", 10 + k, k + 1, "I")])
        q = stream_sync_aggregate(
            spark, src, store, ckpt, ["grp"], self.MEASURES
        )
        try:
            q.processAllAvailable()
            assert self._got(spark, store) == self._expect(spark, src)
            # vacuum while the stream is live, then keep committing
            report = txn.vacuum_txn(spark, src, keep_last=1)
            assert report["removed_manifests"] > 0
            self._apply(spark, src, [(9, "b", 5, 10, "I")])
            q.processAllAvailable()
            assert q.isActive  # no FileNotFound death
            assert self._got(spark, store) == self._expect(spark, src)
        finally:
            q.stop()

    def test_store_follows_churn_and_restart(self, spark, tmp_path):
        from taar_gcp_etl_spark.streaming.jobs import stream_sync_aggregate

        src = str(tmp_path / "src")
        store = str(tmp_path / "mv")
        ckpt = str(tmp_path / "ckpt")
        self._apply(spark, src, [
            (1, "a", 10, 1, "I"), (2, "a", 20, 1, "I"),
            (3, "b", 5, 1, "I"),
        ])
        q = stream_sync_aggregate(
            spark, src, store, ckpt, ["grp"], self.MEASURES
        )
        try:
            q.processAllAvailable()
            assert self._got(spark, store) == self._expect(spark, src)
            # churn WHILE the stream runs: update + group move +
            # delete (a retraction window → recompute path) and an
            # insert-only batch (→ merge fast path), two commits
            self._apply(spark, src, [
                (2, "b", 25, 2, "U"),           # move a→b
                (1, None, None, 2, "D"),        # delete a's other row
            ])
            self._apply(spark, src, [(4, "c", 7, 3, "I")])
            q.processAllAvailable()
            assert self._got(spark, store) == self._expect(spark, src)
        finally:
            q.stop()
        # restart on the same checkpoint: the processed manifests are
        # not replayed into double-applies (cursor no-op), and new
        # commits still flow
        self._apply(spark, src, [(5, "c", 100, 4, "I"),
                                 (3, None, None, 4, "D")])
        q2 = stream_sync_aggregate(
            spark, src, store, ckpt, ["grp"], self.MEASURES
        )
        try:
            q2.processAllAvailable()
            got = self._got(spark, store)
            assert got == self._expect(spark, src)
            assert got["c"] == (100, 2, 107)  # (mx, n, total)
        finally:
            q2.stop()


class TestClusteredRewritePruning:
    """r7: bucket-local sort + file rolling on CDC rewrite keeps
    per-file zone maps narrow under churn (the r6 soak's measured
    failure mode: hash-mixed rewrites converge every file's stats to
    the full range, kept_fraction 0.44, prune gate permanently
    declining)."""

    CDC_D = "id long, val string, day long, seq long, op string"

    def _apply(self, spark, t, rows, **kw):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, self.CDC_D),
            t,
            n_buckets=4,
            stats_cols=["day"],
            **kw,
        )

    def _seed_and_churn(self, spark, t, **kw):
        # 4 day-batches, keys hash into every bucket; then 4 MIXED
        # churn batches (update + insert per rotating day), each of
        # which re-merges every bucket — the layout-destroying pattern
        for day in range(4):
            self._apply(
                spark, t,
                [(day * 128 + i, f"d{day}-{i}", day, day + 1, "I")
                 for i in range(128)],
                **kw,
            )
        for b in range(4):
            day = b % 4
            self._apply(
                spark, t,
                [(day * 128 + i, f"upd{b}-{i}", day, 10 + b, "U")
                 for i in range(8)]
                + [(10000 + b * 128 + i, f"new{b}-{i}", day, 10 + b, "I")
                   for i in range(8)],
                **kw,
            )

    def test_one_day_filter_prunes_after_churn(self, spark, tmp_path):
        t = str(tmp_path / "clus")
        self._seed_and_churn(spark, t, target_file_rows=16)
        rep = txn.cdc_prune_report(spark, t, [("day", "=", 2)])
        # 1 of 4 days: kept-rows floor is the 0.25 selectivity plus one
        # 16-row boundary file per bucket (day runs straddle file
        # boundaries) — the unclustered layout kept ~100% here (every
        # file re-merged with all days after 8 batches)
        assert rep["kept_files"] / rep["total_files"] <= 0.4, rep
        assert rep["kept_rows"] / rep["total_rows"] <= 0.4, rep
        # and the prune stays SOUND: pruned scan == residual over live
        from taar_gcp_etl_spark.layout import _residual

        got = sorted(
            tuple(r)
            for r in txn.scan_cdc_pruned(
                spark, t, [("day", "=", 2)]
            ).collect()
        )
        expect = sorted(
            tuple(r)
            for r in txn.read_cdc_table(spark, t)
            .filter(_residual([("day", "=", 2)]))
            .collect()
        )
        assert got == expect and len(got) > 0

    def test_cluster_rows_sticky_and_maintenance_preserves(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "clus-sticky")
        # day runs (64 rows, ~16 per bucket) exceed the file roll (16),
        # so each rolled file covers ~one day
        self._apply(
            spark, t,
            [(i, f"a{i}", i // 64, 1, "I") for i in range(256)],
            target_file_rows=16,
        )
        # later batch WITHOUT the knob inherits it from the manifest
        self._apply(
            spark, t, [(1000 + i, f"b{i}", i % 4, 2, "I") for i in range(8)]
        )
        man = txn.latest_manifest(spark, t)
        assert man["cluster_rows"] == 16
        # the full-rewrite maintenance path re-clusters and re-rolls:
        # after compaction a one-day filter still keeps a minority of
        # rows (an unsorted rewrite would leave exactly one wide file
        # per bucket)
        txn.compact_cdc_tombstones(spark, t, min_live_seq=0)
        man = txn.latest_manifest(spark, t)
        assert man["cluster_rows"] == 16
        rep = txn.cdc_prune_report(spark, t, [("day", "=", 1)])
        assert rep["kept_rows"] / rep["total_rows"] <= 0.5, rep

    def test_cluster_rows_sticky_without_stats_cols(self, spark, tmp_path):
        """ADVICE r7: target_file_rows must persist even when the table
        tracks no stats_cols — file rolling is useful on its own, and the
        docstring promises 'sticky like stats_cols'."""
        t = str(tmp_path / "roll-nostats")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"a{i}", i // 64, 1, "I") for i in range(256)],
                self.CDC_D,
            ),
            t, n_buckets=4, target_file_rows=16,
        )
        man = txn.latest_manifest(spark, t)
        assert "stats_cols" not in man
        assert man["cluster_rows"] == 16
        # a later batch WITHOUT the knob inherits it
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1000 + i, f"b{i}", i % 4, 2, "I") for i in range(8)],
                self.CDC_D,
            ),
            t, n_buckets=4,
        )
        man = txn.latest_manifest(spark, t)
        assert man["cluster_rows"] == 16
        # and the maintenance full-rewrite path carries it too
        txn.compact_cdc_tombstones(spark, t, min_live_seq=0)
        man = txn.latest_manifest(spark, t)
        assert man["cluster_rows"] == 16
        assert self._got_all(spark, t) == 264

    def _got_all(self, spark, t):
        return txn.read_cdc_table(spark, t).count()

    def test_prune_plan_row_group_granularity(self):
        """_cdc_prune_plan metadata logic: row-group stats refine the
        rows estimate, and a file whose ENVELOPE overlaps but whose
        row groups are all disjoint is dropped outright."""
        man = {
            "buckets": {"0": "data/v1"},
            "stats_types": {"day": "bigint"},
            "file_stats": {
                "data/v1": [
                    {
                        "file": "_bucket=0/f1.parquet",
                        "rows": 100,
                        "stats": {"day": [0, 9]},
                        "row_groups": [
                            {"rows": 60, "stats": {"day": [0, 4]}},
                            {"rows": 40, "stats": {"day": [5, 9]}},
                        ],
                    },
                    {
                        "file": "_bucket=0/f2.parquet",
                        "rows": 50,
                        "stats": {"day": [0, 9]},
                        # gap: no row group covers day 7
                        "row_groups": [
                            {"rows": 25, "stats": {"day": [0, 4]}},
                            {"rows": 25, "stats": {"day": [8, 9]}},
                        ],
                    },
                    {  # legacy entry without row-group stats
                        "file": "_bucket=0/f3.parquet",
                        "rows": 30,
                        "stats": {"day": [6, 8]},
                    },
                ]
            },
        }
        plan = txn._cdc_prune_plan(man, "/t", [("day", "=", 7)])
        # f1: envelope hits, rg [5,9] hits → 40 rows; f2: envelope
        # hits, NO rg hits → dropped; f3: no rg info → all 30 rows
        assert plan["kept_files"] == 2 and plan["total_files"] == 3
        assert plan["kept_rows"] == 70 and plan["total_rows"] == 180
        assert sorted(plan["kept_paths"]) == [
            "/t/data/v1/_bucket=0/f1.parquet",
            "/t/data/v1/_bucket=0/f3.parquet",
        ]
        # a row group MISSING stats for the filtered column is kept
        man["file_stats"]["data/v1"][1]["row_groups"][0]["stats"] = {}
        plan = txn._cdc_prune_plan(man, "/t", [("day", "=", 7)])
        assert plan["kept_files"] == 3 and plan["kept_rows"] == 95

    def test_rowgroup_slice_stats_single_pass(self, spark, tmp_path):
        """r8: row-group stats come from the SAME rollup pass as the
        file-level stats (write-time data accounting, no parquet footer
        re-open): exact per-slice envelopes for every stats column —
        including strings, which the old footer path had to exclude —
        sliced by _metadata.row_index."""
        from taar_gcp_etl_spark.layout import collect_file_stats

        p = str(tmp_path / "rg")
        spark.createDataFrame(
            [(i // 10, f"s{i:02d}") for i in range(40)],
            "day long, name string",
        ).coalesce(1).sortWithinPartitions("day", "name").write.parquet(p)
        entries = collect_file_stats(
            spark, p, ["day", "name"], row_groups=True, slice_rows=10
        )
        assert len(entries) == 1
        e = entries[0]
        assert e["rows"] == 40 and e["stats"]["day"] == [0, 3]
        rgs = e["row_groups"]
        assert [g["rows"] for g in rgs] == [10, 10, 10, 10]
        assert [g["stats"]["day"] for g in rgs] == [
            [0, 0], [1, 1], [2, 2], [3, 3],
        ]
        # strings participate now: exact data-computed envelopes
        assert rgs[0]["stats"]["name"] == ["s00", "s09"]
        assert rgs[3]["stats"]["name"] == ["s30", "s39"]

    def test_rowgroup_slice_auto_sizing(self, spark, tmp_path):
        """slice_rows=None sizes slices at ~1/8 of the median file's
        rows (floor 1024) from a cheap count pass — unrolled layouts
        get sub-file granularity without a knob."""
        from taar_gcp_etl_spark.layout import collect_file_stats

        p = str(tmp_path / "rga")
        spark.createDataFrame(
            [(i // 2500, i) for i in range(20_000)], "day long, v long"
        ).coalesce(1).sortWithinPartitions("day").write.parquet(p)
        entries = collect_file_stats(spark, p, ["day"], row_groups=True)
        assert len(entries) == 1
        rgs = entries[0]["row_groups"]
        # 20000 // 8 = 2500 rows/slice -> 8 slices, one per day
        assert len(rgs) == 8
        assert [g["stats"]["day"] for g in rgs] == [
            [d, d] for d in range(8)
        ]
        # tiny files: floor keeps one slice, never an explosion
        p2 = str(tmp_path / "rgb")
        spark.createDataFrame(
            [(i, i) for i in range(64)], "day long, v long"
        ).coalesce(1).write.parquet(p2)
        entries = collect_file_stats(spark, p2, ["day"], row_groups=True)
        assert len(entries[0]["row_groups"]) == 1

    def test_rowgroup_slice_cap_under_skewed_file_sizes(
        self, spark, tmp_path, monkeypatch
    ):
        """Review fix: median-based auto-sizing alone would give a
        skewed giant file (one compaction output among small files)
        tens of thousands of manifest slice entries — the per-file cap
        bounds it."""
        from taar_gcp_etl_spark import layout
        from taar_gcp_etl_spark.layout import collect_file_stats

        monkeypatch.setattr(layout, "_RG_SLICE_MAX_PER_FILE", 4)
        p = str(tmp_path / "rgskew")
        for rows in (100, 100):
            spark.createDataFrame(
                [(i, i) for i in range(rows)], "day long, v long"
            ).coalesce(1).write.mode("append").parquet(p)
        spark.createDataFrame(
            [(i, i) for i in range(20_000)], "day long, v long"
        ).coalesce(1).write.mode("append").parquet(p)
        entries = collect_file_stats(spark, p, ["day"], row_groups=True)
        assert len(entries) == 3
        assert max(len(e["row_groups"]) for e in entries) <= 4
        assert sum(e["rows"] for e in entries) == 20_200

    def test_rowgroup_stats_survive_nonlocal_path_form(self, spark, tmp_path):
        """r8 (VERDICT r7 'What's missing' #2): the old implementation
        re-opened each file via a LOCAL-path pyarrow footer read and
        silently degraded to file-level stats on any non-posix path
        form. The single-pass implementation plans through Spark's own
        reader, so a scheme-prefixed (object-storage-style) path yields
        identical row-group stats — and layout.py no longer touches
        pyarrow at all."""
        from taar_gcp_etl_spark import layout
        from taar_gcp_etl_spark.layout import collect_file_stats

        p = str(tmp_path / "rg2")
        spark.createDataFrame(
            [(i // 8, i) for i in range(32)], "day long, v long"
        ).coalesce(1).sortWithinPartitions("day").write.parquet(p)
        posix = collect_file_stats(
            spark, p, ["day"], row_groups=True, slice_rows=8
        )
        uri = collect_file_stats(
            spark, f"file:{p}", ["day"], row_groups=True, slice_rows=8
        )
        assert posix and posix == uri
        assert all("row_groups" in e for e in uri)
        import inspect

        assert "import pyarrow" not in inspect.getsource(layout)
        # hive-partition subdirs survive a scheme-prefixed table path
        # (the old substring marker never matched 'file:' vs
        # 'file:///', silently degrading bucketed file names to
        # basenames — wrong pruned paths)
        p3 = str(tmp_path / "rg3")
        spark.createDataFrame(
            [(i % 2, i) for i in range(8)], "b int, v long"
        ).write.partitionBy("b").parquet(p3)
        names = sorted(
            e["file"]
            for e in collect_file_stats(
                spark, f"file:{p3}", ["v"], row_groups=True
            )
        )
        assert len(names) > 1 and all(n.startswith("b=") for n in names)

    def test_timestamp_stats_col_prunes_without_tz_clash(
        self, spark, tmp_path
    ):
        """Review fix: pyarrow returns TIMESTAMP_MICROS row-group stats
        tz-AWARE while Spark's file-level stats are naive (UTC
        session); unnormalized they made every pruner comparison raise
        TypeError. End-to-end: a timestamp stats_col prunes cleanly."""
        import datetime as dt

        t = str(tmp_path / "clus-ts")
        rows = [
            (i, dt.datetime(2024, 1, 1 + i // 32), 1, "I")
            for i in range(128)
        ]
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                rows, "id long, ts timestamp, seq long, op string"
            ),
            t, n_buckets=4, stats_cols=["ts"], target_file_rows=16,
        )
        man = txn.latest_manifest(spark, t)
        entries = next(iter(man["file_stats"].values()))
        assert any("row_groups" in e for e in entries)
        rep = txn.cdc_prune_report(
            spark, t, [("ts", ">=", dt.datetime(2024, 1, 4))]
        )
        assert 0 < rep["kept_rows"] < rep["total_rows"], rep
        got = txn.scan_cdc_pruned(
            spark, t, [("ts", ">=", dt.datetime(2024, 1, 4))]
        ).count()
        assert got == 32  # exactly the last day's rows

    def test_pruned_scan_pushes_residual_to_parquet(self, spark, tmp_path):
        """The residual lands on the BASE scan as PushedFilters, so
        parquet's native row-group stats skip inside kept files —
        manifest skipping and reader skipping stack."""
        from taar_gcp_etl_spark.plans import has_pushed_filter

        t = str(tmp_path / "clus-push")
        self._seed_and_churn(spark, t, target_file_rows=16)
        df = txn.scan_cdc_pruned(spark, t, [("day", "=", 2)])
        assert has_pushed_filter(df, "day")


class TestFlatCasRetryFreshRead:
    """ADVICE r4: the FLAT read-modify-write paths must re-read and
    re-merge inside the CAS retry loop (commit_txn's builder form) —
    losing a version race and re-committing the stale merge would
    silently drop the concurrent writer's changes."""

    def _stale_once(self, monkeypatch, stale):
        real = txn.latest_manifest
        calls = {"n": 0}

        def fn(spark_, table_dir):
            calls["n"] += 1
            return stale if calls["n"] == 1 else real(spark_, table_dir)

        monkeypatch.setattr(txn, "latest_manifest", fn)
        return calls

    def test_cdc_flat_retry_remerges_against_fresh_state(
        self, spark, tmp_path, monkeypatch
    ):
        t = str(tmp_path / "cas-flat")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [(1, "a", 1, "I"), (2, "b", 2, "I")], CDC_SCHEMA
            ),
            t,
        )
        stale = txn.latest_manifest(spark, t)
        # writer B lands an update A hasn't seen
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(2, "b2", 10, "U")], CDC_SCHEMA), t
        )
        calls = self._stale_once(monkeypatch, stale)
        v = txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, "a2", 11, "U")], CDC_SCHEMA), t
        )
        monkeypatch.undo()
        assert v == 3 and calls["n"] >= 2
        # BOTH writers' effects present — the stale merge never published
        assert _rows(txn.read_cdc_table(spark, t)) == {
            1: ("a2", 11),
            2: ("b2", 10),
        }

    def test_aggregate_refresh_retry_remerges_against_fresh_state(
        self, spark, tmp_path, monkeypatch
    ):
        t = str(tmp_path / "cas-agg")
        measures = {"total": ("sum", "v")}
        txn.refresh_aggregate_store_txn(
            spark.createDataFrame([(1, 2.0)], ["k", "v"]), t, ["k"], measures
        )
        stale = txn.latest_manifest(spark, t)
        txn.refresh_aggregate_store_txn(
            spark.createDataFrame([(1, 5.0)], ["k", "v"]), t, ["k"], measures
        )
        calls = self._stale_once(monkeypatch, stale)
        assert txn.refresh_aggregate_store_txn(
            spark.createDataFrame([(1, 1.0)], ["k", "v"]), t, ["k"], measures
        )
        monkeypatch.undo()
        assert calls["n"] >= 2
        # 2 + 5 + 1: B's partial (5.0) must survive A's retried merge
        assert txn.read_txn(spark, t).collect()[0].total == 8.0

    def test_compaction_retry_refilters_fresh_state(
        self, spark, tmp_path, monkeypatch
    ):
        t = str(tmp_path / "cas-compact")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [(1, "a", 1, "I"), (2, None, 2, "D")], CDC_SCHEMA
            ),
            t,
        )
        stale = txn.latest_manifest(spark, t)
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(3, "c", 5, "I")], CDC_SCHEMA), t
        )
        calls = self._stale_once(monkeypatch, stale)
        txn.compact_cdc_tombstones(spark, t, min_live_seq=3)
        monkeypatch.undo()
        assert calls["n"] >= 2
        live = _rows(txn.read_cdc_table(spark, t))
        assert live == {1: ("a", 1), 3: ("c", 5)}  # B's insert survived
        raw = txn.read_txn(spark, t)
        assert raw.filter(F.col(txn.DELETED_COL)).count() == 0

    def test_plain_df_reading_own_table_raises_on_lost_race(
        self, spark, tmp_path, monkeypatch
    ):
        """Safety net: a PLAIN DataFrame whose plan scans the table it
        commits to must refuse the retry (its re-execution would read
        the superseded snapshot) and tell the caller to pass a builder."""
        t = str(tmp_path / "cas-plain")
        txn.commit_txn(
            spark.createDataFrame([(1, 10)], "id long, v long"), t
        )
        derived = txn.read_txn(spark, t).withColumn("v", F.col("v") + 1)
        stale = txn.latest_manifest(spark, t)
        txn.commit_txn(
            spark.createDataFrame([(2, 20)], "id long, v long"), t
        )
        calls = self._stale_once(monkeypatch, stale)
        with pytest.raises(RuntimeError, match="builder"):
            txn.commit_txn(derived, t)
        monkeypatch.undo()
        assert calls["n"] >= 2
        # the concurrent commit is still the table state — nothing clobbered
        assert txn.latest_manifest(spark, t)["version"] == 2


class TestMoRSeqTieDeterminism:
    def test_equal_seq_overlay_tombstone_loses_to_base_row(
        self, spark, tmp_path
    ):
        """ADVICE r4: write path applies a staged row iff seq is STRICTLY
        newer; the merge-on-read resolution must match — an overlay
        tombstone with seq EQUAL to the stored row's loses
        deterministically (not per-read at random)."""
        t = str(tmp_path / "mor-tie")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", 5, "I"), (2, "b", 3, "I")], CDC_SCHEMA
            ),
            t,
            n_buckets=4,
        )
        # delete-only batch → overlay; key 1 ties the stored seq, key 2 wins
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, None, 5, "D"), (2, None, 9, "D")], CDC_SCHEMA
            ),
            t,
            n_buckets=4,
        )
        assert txn.overlay_pressure(spark, t) >= 1  # really merge-on-read
        for _ in range(5):  # deterministic across repeated reads
            assert _rows(txn.read_cdc_table(spark, t)) == {1: ("a", 5)}


class TestVacuumGrace:
    def test_young_unreferenced_dirs_survive_grace_window(
        self, spark, tmp_path
    ):
        """ADVICE r4: an in-flight commit's snapshot dir (written, not
        yet published) must not be vacuumed out from under the publish —
        dirs younger than grace_seconds are skipped."""
        t = str(tmp_path / "vg")
        txn.commit_txn(
            spark.createDataFrame([(1, "a")], "id long, val string"), t
        )
        # simulate a concurrent writer mid-commit: snapshot written,
        # manifest rename not yet executed
        spark.createDataFrame(
            [(9, "inflight")], "id long, val string"
        ).write.parquet(f"{t}/data/v0000000002-inflight")

        report = txn.vacuum_txn(spark, t, keep_last=2, grace_seconds=3600)
        assert report["skipped_young"] == 1
        assert report["removed_snapshots"] == 0
        # the in-flight writer can still publish against its intact dir
        txn._write_bytes(
            spark,
            f"{t}/_log/{txn._manifest_name(2)}",
            json.dumps(
                {
                    "version": 2,
                    "snapshot": "data/v0000000002-inflight",
                    "epoch_id": None,
                    "parent": 1,
                }
            ).encode(),
        )
        assert [r.val for r in txn.read_txn(spark, t).collect()] == [
            "inflight"
        ]

    def test_zero_grace_reclaims_immediately(self, spark, tmp_path):
        t = str(tmp_path / "vg0")
        txn.commit_txn(
            spark.createDataFrame([(1, "a")], "id long, val string"), t
        )
        spark.createDataFrame(
            [(9, "orphan")], "id long, val string"
        ).write.parquet(f"{t}/data/v0000000009-orphan")
        report = txn.vacuum_txn(spark, t, keep_last=2, grace_seconds=0)
        assert report["removed_snapshots"] == 1
        assert report["skipped_young"] == 0


class TestMaintainCdcTable:
    """maintain_cdc_table: the one cadence entry point — each primitive
    fires only when due, in dependency order, and an hourly no-op run
    is safe."""

    SRC = "id long, val string, seq long, op string"

    def _apply(self, spark, t, rows, nb=4):
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, self.SRC), t,
            key_col="id", n_buckets=nb,
        )

    def test_full_pass_fires_each_due_step(self, spark, tmp_path):
        t = str(tmp_path / "mt")
        self._apply(spark, t, [(i, f"v{i}", 1, "I") for i in range(1, 9)])
        # stack overlays past the threshold with delete-only batches
        for s in range(2, 8):
            self._apply(spark, t, [(1, None, s, "D")])
        assert txn.overlay_pressure(spark, t) > 2
        rep = txn.maintain_cdc_table(
            spark, t,
            max_overlays_per_bucket=2,
            tombstone_min_live_seq=100,   # every tombstone retireable
            target_n_buckets=8,
            vacuum_keep_last=1,
            vacuum_grace_seconds=0.0,
        )
        assert rep["compacted_version"] is not None
        assert rep["tombstone_version"] is not None
        assert rep["rescaled_version"] is not None
        assert rep["vacuum"]["removed_snapshots"] > 0
        man = txn.latest_manifest(spark, t)
        assert man["n_buckets"] == 8 and man["overlays"] == {}
        # table state intact through all four steps
        rows = {r.id: r.val for r in txn.read_cdc_table(spark, t).collect()}
        assert rows == {i: f"v{i}" for i in range(2, 9)}
        # tombstone for key 1 retired: a stale late insert CAN now land
        # (that's what the min_live_seq promise means)
        assert 1 not in rows

    def test_idempotent_noop_when_nothing_due(self, spark, tmp_path):
        t = str(tmp_path / "mt2")
        self._apply(spark, t, [(1, "a", 1, "I")])
        v = txn.latest_manifest(spark, t)["version"]
        for _ in range(2):  # hourly-cron shape: repeated no-op passes
            rep = txn.maintain_cdc_table(
                spark, t, vacuum_keep_last=5, vacuum_grace_seconds=3600
            )
            assert rep["compacted_version"] is None
            assert rep["tombstone_version"] is None
            assert rep["rescaled_version"] is None
            assert rep["vacuum"]["removed_snapshots"] == 0
        assert txn.latest_manifest(spark, t)["version"] == v

    def test_group_member_can_skip_vacuum(self, spark, tmp_path):
        t = str(tmp_path / "mt3")
        self._apply(spark, t, [(1, "a", 1, "I")])
        rep = txn.maintain_cdc_table(spark, t, vacuum_keep_last=0)
        assert rep["vacuum"] is None


class TestJoinBucketed:
    """Bucket-aligned join face (VERDICT r8 #4): two tables bucketed by
    the same hash/modulus join with ZERO shuffle exchange of either
    side — per-bucket pruned reads coalesced to one partition satisfy
    the join's clustered distribution, so EnsureRequirements inserts no
    Exchange and the sort-merge runs task-local."""

    def _mk(self, spark, t, rows, schema=CDC_SCHEMA, **kw):
        kw.setdefault("n_buckets", 8)
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, schema), t, **kw
        )

    def _plain_equal(self, spark, left, right, how):
        """Reference result: read_cdc_table + standard join with the
        same rsuffix discipline."""
        l = txn.read_cdc_table(spark, left)
        r = txn.read_cdc_table(spark, right)
        ren = {c: c + "_r" for c in r.columns if c in l.columns and c != "id"}
        return l.join(r.withColumnsRenamed(ren), "id", how)

    def test_inner_and_outer_equal_plain_join(self, spark, tmp_path):
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._mk(spark, left, [(i, f"l{i}", i, "I") for i in range(1, 31)])
        self._mk(
            spark, right, [(i, f"r{i}", i, "I") for i in range(15, 46)]
        )

        def norm(df):
            return sorted(
                tuple(r) for r in df.select(sorted(df.columns)).collect()
            )

        for how in ("inner", "left", "full"):
            got = txn.join_bucketed(spark, left, right, how=how)
            want = self._plain_equal(spark, left, right, how)
            assert sorted(got.columns) == sorted(want.columns), how
            assert norm(got) == norm(want), how

    def test_zero_shuffle_exchange_on_both_sides(self, spark, tmp_path):
        """THE plan contract: no Exchange hashpartitioning / range-
        partitioning anywhere in the bucket-aligned plan, while the
        plain join of the same tables DOES shuffle (contrast keeps the
        assertion honest)."""
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._mk(spark, left, [(i, f"l{i}", i, "I") for i in range(1, 41)])
        self._mk(spark, right, [(i, f"r{i}", i, "I") for i in range(1, 41)])
        got = txn.join_bucketed(spark, left, right)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert "Exchange rangepartitioning" not in plan
        plain = self._plain_equal(spark, left, right, "inner")
        # disable broadcast so the contrast join actually shuffles
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            pplan = (
                plain._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "Exchange hashpartitioning" in pplan

    def test_bucket_count_mismatch_raises(self, spark, tmp_path):
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._mk(spark, left, [(1, "a", 1, "I")], n_buckets=8)
        self._mk(spark, right, [(1, "b", 1, "I")], n_buckets=16)
        with pytest.raises(ValueError, match="bucket-count mismatch"):
            txn.join_bucketed(spark, left, right)

    def test_key_type_mismatch_raises(self, spark, tmp_path):
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._mk(spark, left, [(1, "a", 1, "I")])
        self._mk(
            spark, right, [("1", "b", 1, "I")],
            schema="id string, val string, seq long, op string",
        )
        with pytest.raises(ValueError, match="key type mismatch"):
            txn.join_bucketed(spark, left, right)

    def test_flat_table_raises(self, spark, tmp_path):
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._mk(spark, left, [(1, "a", 1, "I")])
        txn.apply_cdc_batch_txn(
            spark.createDataFrame([(1, "b", 1, "I")], CDC_SCHEMA), right
        )
        with pytest.raises(ValueError, match="not a bucketed"):
            txn.join_bucketed(spark, left, right)

    def test_overlay_deletes_resolved_inside_bucket(self, spark, tmp_path):
        """A delete-only batch leaves a merge-on-read overlay; the
        bucket-aligned join must not resurrect the deleted key."""
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._mk(spark, left, [(i, f"l{i}", i, "I") for i in range(1, 21)])
        self._mk(spark, right, [(i, f"r{i}", i, "I") for i in range(1, 21)])
        self._mk(spark, left, [(7, None, 100, "D")])  # overlay tombstone
        man = txn.latest_manifest(spark, left)
        assert man["overlays"], "fixture must exercise the overlay path"
        got = txn.join_bucketed(spark, left, right)
        ids = {r.id for r in got.collect()}
        assert 7 not in ids and len(ids) == 19

    def test_disjoint_mappings_inner_is_empty_with_schema(
        self, spark, tmp_path
    ):
        """Two single-key tables whose keys hash to different buckets:
        the inner result is an EMPTY frame with the joined schema (not
        None — both tables have committed versions)."""
        b_of = lambda k: spark.createDataFrame(  # noqa: E731
            [(k,)], "id long"
        ).select(txn._bucket_of("id", 8).alias("b")).collect()[0].b
        k1 = 1
        k2 = next(k for k in range(2, 100) if b_of(k) != b_of(k1))
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._mk(spark, left, [(k1, "a", 1, "I")])
        self._mk(spark, right, [(k2, "b", 1, "I")])
        got = txn.join_bucketed(spark, left, right)
        assert got.count() == 0
        assert "val" in got.columns and "val_r" in got.columns

    def test_version_pinned_against_concurrent_commit(self, spark, tmp_path):
        """The plan reads both sides at the manifest version seen up
        front: a commit AFTER join_bucketed returns must not change the
        already-built DataFrame's rows."""
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._mk(spark, left, [(i, f"l{i}", i, "I") for i in range(1, 11)])
        self._mk(spark, right, [(i, f"r{i}", i, "I") for i in range(1, 11)])
        got = txn.join_bucketed(spark, left, right)
        self._mk(spark, left, [(99, "late", 200, "I")])
        assert got.count() == 10


class TestPruneGateBlend:
    """ADVICE r8: kept_rows (logical-slice model) is an OPTIMISTIC IO
    bound — a rolled file is often ONE physical parquet row group, so
    the residual may skip nothing inside kept files. The plan now also
    reports kept_file_rows (pessimistic bound) and the IVM gate prices
    the mean of the two."""

    def _man(self):
        return {
            "buckets": {"0": "data/v1"},
            "stats_types": {"day": "bigint"},
            "file_stats": {
                "data/v1": [
                    {
                        # wide-envelope giant: slices say only 100 of
                        # 1000 rows match, but if the file is one
                        # physical row group the scan reads all 1000
                        "file": "_bucket=0/big.parquet",
                        "rows": 1000,
                        "stats": {"day": [0, 9]},
                        "row_groups": [
                            {"rows": 100, "stats": {"day": [7, 7]}},
                            {"rows": 900, "stats": {"day": [0, 6]}},
                        ],
                    },
                    {
                        "file": "_bucket=0/skip.parquet",
                        "rows": 1000,
                        "stats": {"day": [0, 5]},
                    },
                ]
            },
        }

    def test_plan_reports_both_bounds(self):
        plan = txn._cdc_prune_plan(self._man(), "/t", [("day", "=", 7)])
        assert plan["kept_rows"] == 100  # optimistic: matching slices
        assert plan["kept_file_rows"] == 1000  # pessimistic: whole file
        assert plan["total_rows"] == 2000

    def test_bounds_equal_without_slice_stats(self):
        """Legacy entries (no row_groups) must keep the old semantics:
        both bounds are the file's rows, so the blend degrades to the
        r7 row-fraction gate exactly."""
        man = self._man()
        del man["file_stats"]["data/v1"][0]["row_groups"]
        plan = txn._cdc_prune_plan(man, "/t", [("day", "=", 7)])
        assert plan["kept_rows"] == plan["kept_file_rows"] == 1000

    def test_gate_declines_on_blend_where_slice_model_alone_passed(
        self, spark, tmp_path
    ):
        """End-to-end: every file's slices say a touched-group filter
        keeps ~1/8 of rows (under the 0.25 gate), but every file's
        envelope overlaps every group — each kept file may be one
        physical row group, so the blend ~(0.125 + 1.0)/2 > 0.25 and
        the sync must fall back to the plain dir scan, staying exact."""
        schema = "id long, grp long, val long, seq long, op string"
        measures = {"mx": ("max", "val")}
        src = str(tmp_path / "srcblend")
        store = str(tmp_path / "mvblend")

        def apply(rows, seq):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame(
                    [(i, g, v, seq, "I") for i, g, v in rows], schema
                ),
                src, key_col="id", n_buckets=1, stats_cols=["grp"],
                # rows interleave all 8 groups; slice ~1/8 of the file
                # so each slice is nearly group-pure after the
                # bucket-local sort on grp
                target_file_rows=4096,
            )

        n, n_grp = 4096, 8
        apply([(i, i % n_grp, i) for i in range(n)], seq=1)
        txn.sync_aggregate_from_cdc(spark, src, store, ["grp"], measures)
        plan_calls = []
        real = txn.scan_cdc_pruned
        import taar_gcp_etl_spark.txn as txn_mod

        orig_plan = txn_mod._cdc_prune_plan

        def spy_plan(*a, **k):
            p = orig_plan(*a, **k)
            plan_calls.append(p)
            return p

        txn_mod._cdc_prune_plan = spy_plan
        scan_calls = []
        txn_mod.scan_cdc_pruned = lambda *a, **k: (
            scan_calls.append(1), real(*a, **k)
        )[1]
        try:
            apply([(0, 0, 10_000_000)], seq=2)  # touch group 0 only
            txn.sync_aggregate_from_cdc(
                spark, src, store, ["grp"], measures
            )
        finally:
            txn_mod._cdc_prune_plan = orig_plan
            txn_mod.scan_cdc_pruned = real
        assert plan_calls, "the planner ran"
        p = plan_calls[-1]
        slice_frac = p["kept_rows"] / p["total_rows"]
        blend = (p["kept_rows"] + p["kept_file_rows"]) / (
            2 * p["total_rows"]
        )
        assert slice_frac <= txn._IVM_PRUNE_MAX_KEPT_FRACTION, p
        assert blend > txn._IVM_PRUNE_MAX_KEPT_FRACTION, p
        assert scan_calls == []  # gate declined under the blend
        # and the store is still exact
        got = {
            r.grp: r.mx
            for r in txn.read_aggregate_store(spark, store).collect()
        }
        assert got[0] == 10_000_000


class TestJoinBucketedRenameCollision:
    """Review fix: the rsuffix rename must not itself collide — a right
    table carrying both 'val' and 'val_r' (with 'val' colliding against
    the left) previously produced two 'val_r' output columns."""

    def test_suffixed_name_collision_avoided(self, spark, tmp_path):
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", 1, "I")], CDC_SCHEMA
            ),
            left, n_buckets=8,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "b", "pre-existing", 1, "I")],
                "id long, val string, val_r string, seq long, op string",
            ),
            right, n_buckets=8,
        )
        out = txn.join_bucketed(spark, left, right)
        cols = out.columns
        assert len(cols) == len(set(cols)), cols  # no duplicates
        row = out.collect()[0]
        # left val kept, right val renamed PAST the taken val_r
        assert row.val == "a" and row.val_r == "pre-existing"
        assert row.val_r_r == "b"


class TestSyncJoinFromCdc:
    """Incremental materialized JOIN view (sync_join_from_cdc): store ==
    live(L) JOIN live(R) on the key columns, maintained from the change
    feeds with O(touched keys) probes — the join-view sibling of
    sync_aggregate_from_cdc. Every test's final assertion is equality
    with a from-scratch join of the live sides (the full-recompute
    truth)."""

    L = "id long, lval string, seq long, op string"
    R = "id long, rval string, seq long, op string"

    def _apply(self, spark, t, rows, schema, **kw):
        kw.setdefault("n_buckets", 8)
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, schema), t, **kw
        )

    def _truth(self, spark, left, right, how):
        l = txn.read_cdc_table(spark, left)
        r = txn.read_cdc_table(spark, right)
        ren = {c: c + "_r" for c in r.columns if c in l.columns and c != "id"}
        return l.join(r.withColumnsRenamed(ren), "id", how)

    def _norm(self, df):
        return sorted(
            (tuple(r) for r in df.select(sorted(df.columns)).collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    def _check(self, spark, left, right, store, how):
        got = txn.read_join_store(spark, store)
        want = self._truth(spark, left, right, how)
        assert sorted(got.columns) == sorted(want.columns)
        assert self._norm(got) == self._norm(want)

    def test_cold_start_then_incremental_all_change_kinds(
        self, spark, tmp_path
    ):
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        self._apply(
            spark, left,
            [(i, f"l{i}", 1, "I") for i in range(1, 21)], self.L,
        )
        self._apply(
            spark, right,
            [(i, f"r{i}", 1, "I") for i in range(5, 26)], self.R,
        )
        v1 = txn.sync_join_from_cdc(spark, left, right, store)
        assert v1 == 1
        self._check(spark, left, right, store, "inner")
        # delta: left update (7), left delete (8), left insert (30);
        # right delete (9), right insert (2 — completes a pair)
        self._apply(
            spark, left,
            [(7, "l7b", 2, "U"), (8, None, 2, "D"), (30, "l30", 2, "I")],
            self.L,
        )
        self._apply(
            spark, right,
            [(9, None, 2, "D"), (2, "r2", 2, "I")], self.R,
        )
        v2 = txn.sync_join_from_cdc(spark, left, right, store)
        assert v2 == 2
        self._check(spark, left, right, store, "inner")
        got = {r.id: r.lval for r in txn.read_join_store(spark, store).collect()}
        assert got[7] == "l7b" and 8 not in got and 9 not in got
        assert got[2] == "l2"  # right insert completed the pair

    def test_replay_skip_and_one_sided_advance(self, spark, tmp_path):
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        self._apply(spark, left, [(1, "a", 1, "I")], self.L)
        self._apply(spark, right, [(1, "b", 1, "I")], self.R)
        assert txn.sync_join_from_cdc(spark, left, right, store) == 1
        # neither source advanced: exactly-once replay skip
        assert txn.sync_join_from_cdc(spark, left, right, store) is None
        # only the RIGHT advances
        self._apply(spark, right, [(1, "b2", 2, "U")], self.R)
        assert txn.sync_join_from_cdc(spark, left, right, store) == 2
        self._check(spark, left, right, store, "inner")

    def test_left_join_null_fill_and_completion(self, spark, tmp_path):
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        self._apply(
            spark, left,
            [(i, f"l{i}", 1, "I") for i in (1, 2, 3)], self.L,
        )
        self._apply(spark, right, [(1, "r1", 1, "I")], self.R)
        txn.sync_join_from_cdc(spark, left, right, store, how="left")
        self._check(spark, left, right, store, "left")
        rows = {r.id: r.rval for r in txn.read_join_store(spark, store).collect()}
        assert rows == {1: "r1", 2: None, 3: None}
        # a later right insert fills the null row incrementally
        self._apply(spark, right, [(2, "r2", 2, "I")], self.R)
        txn.sync_join_from_cdc(spark, left, right, store, how="left")
        self._check(spark, left, right, store, "left")
        rows = {r.id: r.rval for r in txn.read_join_store(spark, store).collect()}
        assert rows[2] == "r2"
        # deleting the LEFT row evicts the key entirely under 'left'
        self._apply(spark, left, [(3, None, 2, "D")], self.L)
        txn.sync_join_from_cdc(spark, left, right, store, how="left")
        rows = {r.id for r in txn.read_join_store(spark, store).collect()}
        assert rows == {1, 2}

    def test_probe_is_bucket_pruned(self, spark, tmp_path, monkeypatch):
        """The incremental probe must pass a bucket restriction to
        read_txn — O(touched buckets), never a table scan."""
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        self._apply(
            spark, left,
            [(i, f"l{i}", 1, "I") for i in range(1, 41)], self.L,
        )
        self._apply(
            spark, right,
            [(i, f"r{i}", 1, "I") for i in range(1, 41)], self.R,
        )
        txn.sync_join_from_cdc(spark, left, right, store)
        self._apply(spark, left, [(5, "l5b", 2, "U")], self.L)
        seen = []
        real = txn.read_txn

        def spy(spark_, table_dir, *a, **kw):
            if table_dir in (left, right):
                seen.append((table_dir, kw.get("buckets")))
            return real(spark_, table_dir, *a, **kw)

        monkeypatch.setattr(txn, "read_txn", spy)
        txn.sync_join_from_cdc(spark, left, right, store)
        probes = [b for _, b in seen if b is not None]
        assert probes, "probes must restrict buckets"
        b5 = spark.createDataFrame([(5,)], "id long").select(
            txn._bucket_of("id", 8).alias("b")
        ).collect()[0].b
        for b in probes:
            assert b == [b5]
        self._check(spark, left, right, store, "inner")

    def test_full_outer_differing_key_names(self, spark, tmp_path):
        """'full' with different key columns: the store key (left name)
        carries the coalesce, so right-only keys stay addressable by
        later syncs — including when the cold start took the
        bucket-aligned path."""
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", 1, "I"), (2, "b", 1, "I")],
                "lid long, lval string, seq long, op string",
            ),
            left, key_col="lid", n_buckets=8,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(2, "x", 1, "I"), (3, "y", 1, "I")],
                "rid long, rval string, seq long, op string",
            ),
            right, key_col="rid", n_buckets=8,
        )
        txn.sync_join_from_cdc(spark, left, right, store, how="full")
        got = {r.lid: (r.lval, r.rval)
               for r in txn.read_join_store(spark, store).collect()}
        assert got == {1: ("a", None), 2: ("b", "x"), 3: (None, "y")}
        # update the right-only key: the store row must be replaced,
        # not duplicated (the coalesced key addresses it)
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(3, "y2", 2, "U")],
                "rid long, rval string, seq long, op string",
            ),
            right, key_col="rid", n_buckets=8,
        )
        txn.sync_join_from_cdc(spark, left, right, store, how="full")
        rows = txn.read_join_store(spark, store).collect()
        assert len(rows) == 3
        got = {r.lid: (r.lval, r.rval) for r in rows}
        assert got[3] == (None, "y2")

    def test_cursor_pack_roundtrip(self):
        for vl, vr in ((0, 0), (1, 2), (12345, 67890), (1, (1 << 31) - 1)):
            assert txn._unpack_join_cursor(
                txn._pack_join_cursor(vl, vr)
            ) == (vl, vr)
        with pytest.raises(ValueError, match="packed-cursor"):
            txn._pack_join_cursor(1, 1 << 31)
        # monotone in each argument
        assert txn._pack_join_cursor(2, 0) > txn._pack_join_cursor(1, 5)
        assert txn._pack_join_cursor(1, 6) > txn._pack_join_cursor(1, 5)

    def test_incremental_equals_rebuild_under_churn(self, spark, tmp_path):
        """Property-style: 4 random-ish churn batches on both sides;
        after each sync the store equals a from-scratch join."""
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        self._apply(
            spark, left,
            [(i, f"l{i}", 0, "I") for i in range(1, 31)], self.L,
        )
        self._apply(
            spark, right,
            [(i, f"r{i}", 0, "I") for i in range(10, 41)], self.R,
        )
        txn.sync_join_from_cdc(spark, left, right, store)
        for step in range(1, 5):
            seq = step * 10
            self._apply(
                spark, left,
                [(3 * step, f"lu{step}", seq, "U"),
                 (5 * step, None, seq, "D"),
                 (100 + step, f"ln{step}", seq, "I")],
                self.L,
            )
            self._apply(
                spark, right,
                [(4 * step, f"ru{step}", seq, "U"),
                 (7 * step, None, seq, "D"),
                 (100 + step, f"rn{step}", seq, "I")],
                self.R,
            )
            txn.sync_join_from_cdc(spark, left, right, store)
            self._check(spark, left, right, store, "inner")


    def test_store_lifecycle_compact_vacuum_rescale(self, spark, tmp_path):
        """VERDICT r9 #4: store maintenance under churn — tombstone
        compaction (every churned key writes one into the store),
        vacuum, and a bucket rescale all apply cleanly to a
        sync_join_from_cdc store: the packed two-version cursor
        survives each op (replayed syncs still no-op, fresh churn still
        syncs) and the store stays equal to the from-scratch join."""
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        self._apply(
            spark, left,
            [(i, f"l{i}", 1, "I") for i in range(40)], self.L,
        )
        self._apply(
            spark, right,
            [(i, f"r{i}", 1, "I") for i in range(40)], self.R,
        )
        txn.sync_join_from_cdc(spark, left, right, store)
        # churn rounds: deletes stack tombstones into the store
        for rnd in range(2, 5):
            dels = [(i, None, rnd, "D") for i in range(rnd * 5, rnd * 5 + 3)]
            ups = [(i + 20, f"l{i}v{rnd}", rnd, "U") for i in range(3)]
            self._apply(spark, left, dels + ups, self.L, n_buckets=None)
            txn.sync_join_from_cdc(spark, left, right, store)
        self._check(spark, left, right, store, "inner")
        man = txn.latest_manifest(spark, store)
        cursor = man["epoch_id"]
        raw = txn.read_cdc_table(spark, store, include_tombstones=True)
        n_tomb = raw.filter(F.col("_deleted")).count()
        assert n_tomb >= 9  # the churn really stacked tombstones

        # compact at the current cursor horizon (single writer: no
        # older sync can replay) — tombstones retire, cursor survives
        assert txn.compact_cdc_tombstones(
            spark, store, min_live_seq=cursor + 1, seq_col="_mv_seq"
        ) is not None
        man2 = txn.latest_manifest(spark, store)
        assert man2["epoch_id"] == cursor
        raw2 = txn.read_cdc_table(spark, store, include_tombstones=True)
        assert raw2.filter(F.col("_deleted")).count() == 0
        # a replayed sync still no-ops on the preserved cursor
        assert txn.sync_join_from_cdc(spark, left, right, store) is None

        # vacuum the superseded snapshots — cursor and content intact
        txn.vacuum_txn(spark, store, keep_last=1)
        assert txn.latest_manifest(spark, store)["epoch_id"] == cursor
        self._check(spark, left, right, store, "inner")

        # fresh churn after maintenance still syncs incrementally
        self._apply(
            spark, left, [(0, "l0z", 9, "U"), (1, None, 9, "D")],
            self.L, n_buckets=None,
        )
        assert txn.sync_join_from_cdc(spark, left, right, store) is not None
        self._check(spark, left, right, store, "inner")

        # bucket rescale of the store: layout changes, cursor + rows
        # survive, and the next sync keeps maintaining it
        txn.rescale_buckets(spark, store, 16)
        assert txn.latest_manifest(spark, store)["n_buckets"] == 16
        self._check(spark, left, right, store, "inner")
        self._apply(
            spark, left, [(2, "l2z", 10, "U")], self.L, n_buckets=None,
        )
        assert txn.sync_join_from_cdc(spark, left, right, store) is not None
        self._check(spark, left, right, store, "inner")

class TestStreamSyncJoin:
    """Streaming maintenance of the materialized join view
    (stream_sync_join): a commit on EITHER source's log fires a
    txn.sync_join_from_cdc tick; exactly-once rides the packed
    two-version cursor; poison contract inherited from the aggregate
    loop. Truth for every check is a from-scratch join of the live
    sides."""

    L = "id long, lval string, seq long, op string"
    R = "id long, rval string, seq long, op string"

    def _apply(self, spark, t, rows, schema):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, schema), t, n_buckets=8
        )

    def _truth(self, spark, left, right, how="inner"):
        l = txn.read_cdc_table(spark, left)
        r = txn.read_cdc_table(spark, right)
        ren = {c: c + "_r" for c in r.columns if c in l.columns and c != "id"}
        return l.join(r.withColumnsRenamed(ren), "id", how)

    def _norm(self, df):
        return sorted(
            (tuple(r) for r in df.select(sorted(df.columns)).collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    def _check(self, spark, left, right, store, how="inner"):
        got = txn.read_join_store(spark, store)
        want = self._truth(spark, left, right, how)
        assert sorted(got.columns) == sorted(want.columns)
        assert self._norm(got) == self._norm(want)

    def test_stream_starts_before_either_commit(self, spark, tmp_path):
        """Deploy-first bootstrap: the sync stream starts with NEITHER
        source committed (both _log dirs missing) and must wait, then
        cold-start the view on the first commits."""
        from taar_gcp_etl_spark.streaming.jobs import stream_sync_join

        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        q = stream_sync_join(
            spark, left, right, store, str(tmp_path / "ckpt")
        )
        try:
            q.processAllAvailable()  # nothing committed yet: no-op
            assert txn.latest_manifest(spark, store) is None
            self._apply(spark, left, [(1, "a", 1, "I")], self.L)
            self._apply(spark, right, [(1, "b", 1, "I")], self.R)
            q.processAllAvailable()
            self._check(spark, left, right, store)
        finally:
            q.stop()

    def test_one_sided_commits_fire_and_restart_no_replay(
        self, spark, tmp_path
    ):
        """A commit on EITHER side alone fires a sync; a restart on the
        same checkpoint replays no double-apply (packed-cursor no-op)
        and later commits still flow."""
        from taar_gcp_etl_spark.streaming.jobs import stream_sync_join

        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        ckpt = str(tmp_path / "ckpt")
        self._apply(
            spark, left, [(i, f"l{i}", 1, "I") for i in (1, 2, 3)], self.L
        )
        self._apply(
            spark, right, [(i, f"r{i}", 1, "I") for i in (2, 3, 4)], self.R
        )
        q = stream_sync_join(spark, left, right, store, ckpt)
        try:
            q.processAllAvailable()
            self._check(spark, left, right, store)
            # LEFT-only churn: update + delete
            self._apply(
                spark, left,
                [(2, "l2b", 2, "U"), (3, None, 2, "D")], self.L,
            )
            q.processAllAvailable()
            self._check(spark, left, right, store)
            # RIGHT-only churn: insert completes a pair
            self._apply(spark, right, [(1, "r1", 2, "I")], self.R)
            q.processAllAvailable()
            self._check(spark, left, right, store)
            got = {r.id: (r.lval, r.rval)
                   for r in txn.read_join_store(spark, store).collect()}
            assert got == {1: ("l1", "r1"), 2: ("l2b", "r2")}
        finally:
            q.stop()
        ver = txn.latest_manifest(spark, store)["version"]
        # restart on the same checkpoint: processed manifests replay
        # into cursor no-ops, not double-applies; new commits flow
        self._apply(spark, left, [(5, "l5", 3, "I")], self.L)
        self._apply(spark, right, [(5, "r5", 3, "I")], self.R)
        q2 = stream_sync_join(spark, left, right, store, ckpt)
        try:
            q2.processAllAvailable()
            self._check(spark, left, right, store)
            assert txn.latest_manifest(spark, store)["version"] > ver
        finally:
            q2.stop()

    def test_poison_fails_stream_cursor_unmoved(
        self, spark, tmp_path, monkeypatch
    ):
        """Inherited poison contract: a throwing sync fails the stream
        visibly, the packed cursor does not move, and a restart with
        the fault cleared catches up exactly."""
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        from taar_gcp_etl_spark.streaming.jobs import stream_sync_join

        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        ckpt = str(tmp_path / "ckpt")
        self._apply(spark, left, [(1, "a", 1, "I")], self.L)
        self._apply(spark, right, [(1, "b", 1, "I")], self.R)
        txn.sync_join_from_cdc(spark, left, right, store)
        cursor0 = txn.latest_manifest(spark, store)["epoch_id"]

        real = txn.sync_join_from_cdc
        monkeypatch.setattr(
            txn, "sync_join_from_cdc",
            lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("poisoned source version")
            ),
        )
        q = stream_sync_join(spark, left, right, store, ckpt)
        try:
            self._apply(spark, right, [(2, "b2", 2, "I")], self.R)
            with pytest.raises(StreamingQueryException):
                q.processAllAvailable()
        finally:
            q.stop()
        assert txn.latest_manifest(spark, store)["epoch_id"] == cursor0

        monkeypatch.setattr(txn, "sync_join_from_cdc", real)
        q2 = stream_sync_join(spark, left, right, store, ckpt)
        try:
            q2.processAllAvailable()
            self._check(spark, left, right, store)
            assert txn.latest_manifest(spark, store)["epoch_id"] > cursor0
        finally:
            q2.stop()


class TestMergeInto:
    """Declarative MERGE INTO (txn.merge_into): Delta-ordered clause
    semantics compiled onto the bucketed CDC apply. Truth for each test
    is the hand-computed post-merge live state."""

    T = "id long, val string, flag boolean"

    def _seed(self, spark, t, rows):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, v, f, 1, "I") for i, v, f in rows],
                self.T + ", seq long, op string",
            ),
            t, n_buckets=8,
        )

    def _src(self, spark, rows):
        return spark.createDataFrame(rows, self.T)

    def _live(self, spark, t):
        return {
            r.id: (r.val, r.flag)
            for r in txn.read_cdc_table(spark, t).collect()
        }

    def test_upsert_default_clauses(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False), (2, "b", False)])
        v = txn.merge_into(
            spark, t,
            self._src(spark, [(2, "b2", True), (3, "c", False)]),
        )
        assert v == 2
        assert self._live(spark, t) == {
            1: ("a", False), 2: ("b2", True), 3: ("c", False),
        }

    def test_cold_start_creates_table(self, spark, tmp_path):
        t = str(tmp_path / "t")
        v = txn.merge_into(
            spark, t, self._src(spark, [(1, "a", False)]),
            n_buckets=4,
        )
        assert v == 1
        assert self._live(spark, t) == {1: ("a", False)}
        man = txn.latest_manifest(spark, t)
        assert man["n_buckets"] == 4 and man["key_col"] == "id"
        # the created table takes further merges (warm path)
        txn.merge_into(spark, t, self._src(spark, [(1, "a2", True)]))
        assert self._live(spark, t) == {1: ("a2", True)}

    def test_cold_start_requires_key(self, spark, tmp_path):
        src = spark.createDataFrame([(1, "x")], "k long, val string")
        with pytest.raises(ValueError, match="key_col"):
            txn.merge_into(spark, str(tmp_path / "t"), src)
        t = str(tmp_path / "t2")
        txn.merge_into(spark, t, src, key_col="k")
        assert txn.latest_manifest(spark, t)["key_col"] == "k"

    def test_clause_order_delete_flag_wins(self, spark, tmp_path):
        """The CDC-extract shape: matched_delete_condition (Delta's
        first WHEN MATCHED clause) beats the update clause; unmatched
        deletes fall through to insert unless filtered out."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False), (2, "b", False)])
        txn.merge_into(
            spark, t,
            self._src(
                spark,
                [(1, "a2", True),   # matched + flag → DELETE
                 (2, "b2", False),  # matched, no flag → UPDATE
                 (3, "c", True)],   # unmatched + flag → not inserted
            ),
            matched_delete_condition="flag",
            not_matched_condition="NOT flag",
        )
        assert self._live(spark, t) == {2: ("b2", False)}

    def test_conditions_see_target_columns(self, spark, tmp_path):
        """matched_condition over t_<col>: only update rows whose
        incoming val differs from the stored one (idempotent-extract
        guard) — the unchanged row must NOT advance."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False), (2, "b", False)])
        v = txn.merge_into(
            spark, t,
            self._src(spark, [(1, "a", False), (2, "b2", False)]),
            matched_condition="val <> t_val",
            when_not_matched=None,
        )
        assert v == 2
        assert self._live(spark, t) == {1: ("a", False), 2: ("b2", False)}
        # nothing qualifies → no commit at all
        assert txn.merge_into(
            spark, t,
            self._src(spark, [(2, "b2", False)]),
            matched_condition="val <> t_val",
            when_not_matched=None,
        ) is None
        assert txn.latest_manifest(spark, t)["version"] == 2

    def test_when_matched_delete(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False), (2, "b", False)])
        txn.merge_into(
            spark, t, self._src(spark, [(1, "x", False)]),
            when_matched="delete", when_not_matched=None,
        )
        assert self._live(spark, t) == {2: ("b", False)}

    def test_duplicate_source_keys_raise(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False)])
        with pytest.raises(ValueError, match="one row per key"):
            txn.merge_into(
                spark, t,
                self._src(spark, [(1, "x", False), (1, "y", False)]),
            )

    def test_null_source_key_raises(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False)])
        with pytest.raises(ValueError, match="NULL id"):
            txn.merge_into(
                spark, t,
                self._src(spark, [(None, "x", False), (2, "y", False)]),
            )

    def test_outranks_user_supplied_seqs(self, spark, tmp_path):
        """Review r9 (verified repro): a table whose stored seqs are
        user-supplied (binlog LSN / timestamp scale) must still accept
        merge updates — the stamp is per-key current-seq + 1, not the
        version count."""
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", False, 1000, "I"), (2, "b", False, 2000, "I")],
                self.T + ", seq long, op string",
            ),
            t, n_buckets=4,
        )
        v = txn.merge_into(
            spark, t, self._src(spark, [(1, "a2", True), (3, "c", False)])
        )
        assert v == 2
        assert self._live(spark, t) == {
            1: ("a2", True), 2: ("b", False), 3: ("c", False),
        }
        # and a delete against the high-seq row must also win
        txn.merge_into(
            spark, t, self._src(spark, [(2, None, True)]),
            when_matched="delete", when_not_matched=None,
        )
        assert 2 not in self._live(spark, t)
        # insert over a HIGH-SEQ TOMBSTONE must resurrect (the stamp
        # reads the tombstone's seq even though the key is unmatched)
        txn.merge_into(spark, t, self._src(spark, [(2, "back", False)]))
        assert self._live(spark, t)[2] == ("back", False)

    def test_source_key_type_coerced_to_table_type(self, spark, tmp_path):
        """Review r9 (verified repro): xxhash64 buckets int 5 and
        long 5 differently — the source key is cast to the table's key
        type before the bucket probe, so an int-keyed extract against
        a long-keyed table still classifies matches correctly."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(i, f"v{i}", False) for i in range(1, 9)])
        src = spark.createDataFrame(
            [(5, "v5b", True)], "id int, val string, flag boolean"
        )
        v = txn.merge_into(spark, t, src)
        assert v == 2
        live = self._live(spark, t)
        assert live[5] == ("v5b", True)
        assert len(live) == 8  # matched as update, NOT inserted anew

    def test_delete_only_merge_accepts_key_only_source(
        self, spark, tmp_path
    ):
        """Review r9: D rows never read payload — a delete-keys
        extract (just the key) suffices for delete-only merges."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False), (2, "b", False)])
        txn.merge_into(
            spark, t,
            spark.createDataFrame([(1,)], "id long"),
            when_matched="delete", when_not_matched=None,
        )
        assert self._live(spark, t) == {2: ("b", False)}

    def test_t_prefix_collision_raises(self, spark, tmp_path):
        """A source column named t_<target col> would shadow the
        t_-prefixed target column conditions refer to — refuse rather
        than silently binding the condition to the source copy."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False)])
        src = spark.createDataFrame(
            [(1, "x", False, "shadow")],
            self.T + ", t_val string",
        )
        with pytest.raises(ValueError, match="collide"):
            txn.merge_into(spark, t, src)

    def test_extra_source_columns_feed_conditions(self, spark, tmp_path):
        """CDC-extract shape: the source carries a metadata column the
        table doesn't have; conditions read it, the batch drops it."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False), (2, "b", False)])
        src = spark.createDataFrame(
            [(1, "a2", False, True), (2, "b2", False, False),
             (3, "c", False, False)],
            self.T + ", is_delete boolean",
        )
        txn.merge_into(spark, t, src, matched_delete_condition="is_delete")
        assert self._live(spark, t) == {
            2: ("b2", False), 3: ("c", False),
        }
        live_df = txn.read_cdc_table(spark, t)
        assert "is_delete" not in live_df.columns

    def test_merge_probe_is_bucket_pruned(self, spark, tmp_path, monkeypatch):
        t = str(tmp_path / "t")
        self._seed(
            spark, t, [(i, f"v{i}", False) for i in range(1, 41)]
        )
        seen = []
        real = txn.read_txn

        def spy(spark_, table_dir, *a, **kw):
            if table_dir == t:
                seen.append(kw.get("buckets"))
            return real(spark_, table_dir, *a, **kw)

        monkeypatch.setattr(txn, "read_txn", spy)
        txn.merge_into(spark, t, self._src(spark, [(5, "v5b", True)]))
        probes = [b for b in seen if b is not None]
        assert probes, "classification probe must restrict buckets"
        b5 = spark.createDataFrame([(5,)], "id long").select(
            txn._bucket_of("id", 8).alias("b")
        ).collect()[0].b
        assert probes[0] == [b5]
        assert self._live(spark, t)[5] == ("v5b", True)

    def test_epoch_replay_skips(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False)])
        src = self._src(spark, [(1, "a2", False)])
        assert txn.merge_into(spark, t, src, epoch_id=7) == 2
        assert txn.merge_into(spark, t, src, epoch_id=7) is None
        assert txn.latest_manifest(spark, t)["version"] == 2

    def test_flat_table_routes_through_flat_apply(self, spark, tmp_path):
        """A flat (dimension-sized) CDC table takes the same clause
        semantics through apply_cdc_batch_txn — no bucket machinery."""
        t = str(tmp_path / "flat")
        txn.apply_cdc_batch_txn(
            spark.createDataFrame(
                [(1, "a", False, 1, "I"), (2, "b", False, 1, "I")],
                self.T + ", seq long, op string",
            ),
            t,
        )
        v = txn.merge_into(
            spark, t,
            self._src(spark, [(2, "b2", True), (3, "c", False)]),
        )
        assert v == 2
        assert self._live(spark, t) == {
            1: ("a", False), 2: ("b2", True), 3: ("c", False),
        }
        assert "buckets" not in txn.latest_manifest(spark, t)

    def test_matched_update_set_expressions(self, spark, tmp_path):
        """Delta SET-list semantics: named columns take the expression
        (reading source AND current-target values), UNNAMED columns
        keep the target value; a key-plus-inputs source suffices when
        no insert clause is active."""
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, 100, "keep1", 1, "I"), (2, 200, "keep2", 1, "I")],
                "id long, bal long, note string, seq long, op string",
            ),
            t, n_buckets=4,
        )
        # source carries only the key + the expression's input
        src = spark.createDataFrame(
            [(1, 5), (3, 7)], "id long, delta long"
        )
        v = txn.merge_into(
            spark, t, src,
            matched_update_set={"bal": "t_bal + delta"},
            when_not_matched=None,
        )
        assert v == 2
        rows = {
            r.id: (r.bal, r.note)
            for r in txn.read_cdc_table(spark, t).collect()
        }
        # 1 accumulated, note KEPT; 3 unmatched and dropped (no insert)
        assert rows == {1: (105, "keep1"), 2: (200, "keep2")}
        # second merge accumulates again (reads the NEW target value)
        txn.merge_into(
            spark, t, spark.createDataFrame([(1, 10)], "id long, delta long"),
            matched_update_set={"bal": "t_bal + delta"},
            when_not_matched=None,
        )
        got = {r.id: r.bal for r in txn.read_cdc_table(spark, t).collect()}
        assert got[1] == 115

    def test_matched_update_set_validation(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False)])
        src = self._src(spark, [(1, "x", False)])
        with pytest.raises(ValueError, match="when_matched='update'"):
            txn.merge_into(
                spark, t, src, when_matched="delete",
                matched_update_set={"val": "'x'"},
            )
        with pytest.raises(ValueError, match="not settable"):
            txn.merge_into(
                spark, t, src, matched_update_set={"id": "id + 1"},
            )
        # key-only source is NOT enough when the insert clause is live
        with pytest.raises(ValueError, match="missing table columns"):
            txn.merge_into(
                spark, t,
                spark.createDataFrame([(1,)], "id long"),
                matched_update_set={"val": "'x'"},
            )

    def test_evolve_schema_adds_source_columns(self, spark, tmp_path):
        """Delta-style automatic schema evolution: with
        evolve_schema=True an extra source column becomes a table
        column (additive); untouched rows read it as null. Default
        remains metadata-drop."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False), (2, "b", False)])
        src = spark.createDataFrame(
            [(2, "b2", True, "fr")],
            self.T + ", lang string",
        )
        txn.merge_into(spark, t, src, evolve_schema=True)
        live = txn.read_cdc_table(spark, t)
        assert "lang" in live.columns
        got = {r.id: (r.val, r.lang) for r in live.collect()}
        assert got == {1: ("a", None), 2: ("b2", "fr")}
        # a later non-evolving merge must still supply lang (it is a
        # table column now)
        with pytest.raises(ValueError, match="missing table columns"):
            txn.merge_into(spark, t, self._src(spark, [(3, "c", False)]))

    def test_full_width_source_warns(self, spark, tmp_path):
        """A source touching every bucket degrades to a full rewrite —
        said at plan time (RuntimeWarning), not silently."""
        import warnings as _w

        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", False, 1, "I") for i in range(16)],
                self.T + ", seq long, op string",
            ),
            t, n_buckets=2,
        )
        wide = self._src(
            spark, [(i, f"w{i}", False) for i in range(16)]
        )
        with pytest.warns(RuntimeWarning, match="touch all 2 buckets"):
            txn.merge_into(spark, t, wide)
        # a narrow source stays silent
        with _w.catch_warnings():
            _w.simplefilter("error", RuntimeWarning)
            txn.merge_into(
                spark, t, self._src(spark, [(1, "z", False)])
            )
        assert self._live(spark, t)[1] == ("z", False)

    # --- r10: N-ordered clause lists (when=[...]) ----------------------

    def test_clause_list_first_match_wins(self, spark, tmp_path):
        """Two overlapping matched-update clauses: the FIRST listed
        clause claims the row (Delta ordering) — VERDICT r9 #2's 'done'
        shape. Key 1 satisfies both conditions and must take clause
        0's SET; key 2 only the second; key 3 falls to the catch-all
        delete."""
        t = str(tmp_path / "t")
        self._seed(
            spark, t,
            [(1, "a", False), (2, "b", False), (3, "c", False)],
        )
        src = spark.createDataFrame(
            [(1, "hot", False), (2, "warm", False), (3, "cold", True)],
            self.T,
        )
        txn.merge_into(
            spark, t, src,
            when=[
                {"matched": "update", "condition": "val = 'hot'",
                 "set": {"val": "concat(val, '-first')"}},
                {"matched": "update",
                 "condition": "val in ('hot', 'warm')",
                 "set": {"val": "concat(val, '-second')"}},
                {"matched": "delete"},
            ],
        )
        assert self._live(spark, t) == {
            1: ("hot-first", False),   # both matched → first wins
            2: ("warm-second", False),
        }

    def test_clause_list_per_clause_sets_keep_semantics(self, spark, tmp_path):
        """Each update clause carries its OWN set; unnamed columns KEEP
        the current target value per clause independently."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False), (2, "b", True)])
        src = spark.createDataFrame(
            [(1, "x", True), (2, "y", False)], self.T
        )
        txn.merge_into(
            spark, t, src,
            when=[
                # clause 0: sets val only → flag KEEPS target (False)
                {"matched": "update", "condition": "t_val = 'a'",
                 "set": {"val": "upper(val)"}},
                # clause 1: sets flag only → val KEEPS target ('b')
                {"matched": "update", "set": {"flag": "flag"}},
            ],
            key_col="id",
        )
        assert self._live(spark, t) == {
            1: ("X", False), 2: ("b", False),
        }

    def test_clause_list_multiple_inserts_first_match(self, spark, tmp_path):
        """Several not-matched insert clauses OR together (every insert
        takes the source row); rows claimed by none are dropped."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False)])
        src = self._src(
            spark,
            [(2, "keep-flag", True), (3, "keep-k", False),
             (4, "drop", False)],
        )
        txn.merge_into(
            spark, t, src,
            when=[
                {"not_matched": "insert", "condition": "flag"},
                {"not_matched": "insert",
                 "condition": "val like 'keep%'"},
            ],
        )
        assert self._live(spark, t) == {
            1: ("a", False), 2: ("keep-flag", True), 3: ("keep-k", False),
        }

    def test_clause_list_validation(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False)])
        src = self._src(spark, [(1, "a2", False)])
        with pytest.raises(ValueError, match="replaces the clause kwargs"):
            txn.merge_into(
                spark, t, src,
                when=[{"matched": "update"}],
                matched_condition="flag",
            )
        with pytest.raises(ValueError, match="except the last"):
            txn.merge_into(
                spark, t, src,
                when=[{"matched": "update"}, {"matched": "delete"}],
            )
        with pytest.raises(ValueError, match="exactly one of"):
            txn.merge_into(spark, t, src, when=[{"condition": "flag"}])
        with pytest.raises(ValueError, match="delete clause"):
            txn.merge_into(
                spark, t, src,
                when=[{"matched": "delete", "set": {"val": "'x'"}}],
            )
        with pytest.raises(ValueError, match="non-empty list"):
            txn.merge_into(spark, t, src, when=[])

    def test_clause_list_cold_start_insert_or(self, spark, tmp_path):
        """Cold start with a clause list: the insert clauses' OR decides
        which source rows seed the table."""
        t = str(tmp_path / "t")
        txn.merge_into(
            spark, t,
            self._src(spark, [(1, "a", True), (2, "b", False)]),
            when=[{"not_matched": "insert", "condition": "flag"}],
            n_buckets=4,
        )
        assert self._live(spark, t) == {1: ("a", True)}

    # --- r10: cold-start payload trim (payload_cols=) ------------------

    def test_cold_start_payload_cols_trims_metadata(self, spark, tmp_path):
        """VERDICT r9 #8: a cold-start merge from a CDC extract carrying
        a delete-flag column stores only the named payload."""
        t = str(tmp_path / "t")
        src = spark.createDataFrame(
            [(1, "a", False), (2, "b", True)],
            "id long, val string, is_del boolean",
        )
        txn.merge_into(
            spark, t, src,
            matched_delete_condition="is_del",
            not_matched_condition="NOT is_del",
            payload_cols=["val"],
            n_buckets=4,
        )
        live = txn.read_cdc_table(spark, t)
        assert set(live.columns) == {"id", "val", "seq"}
        assert {r.id: r.val for r in live.collect()} == {1: "a"}
        # warm merges reject the parameter — the schema now decides
        with pytest.raises(ValueError, match="cold-start parameter"):
            txn.merge_into(spark, t, src, payload_cols=["val"])
        # and the warm path drops the metadata column automatically
        txn.merge_into(
            spark, t,
            spark.createDataFrame(
                [(1, "a2", False), (2, "b2", False)],
                "id long, val string, is_del boolean",
            ),
            matched_delete_condition="is_del",
            not_matched_condition="NOT is_del",
        )
        assert {r.id: r.val
                for r in txn.read_cdc_table(spark, t).collect()} == {
            1: "a2", 2: "b2",
        }

    def test_cold_start_payload_cols_validation(self, spark, tmp_path):
        src = spark.createDataFrame([(1, "a")], "id long, val string")
        with pytest.raises(ValueError, match="not in source"):
            txn.merge_into(
                spark, str(tmp_path / "t"), src, payload_cols=["nope"]
            )
        with pytest.raises(ValueError, match="repeat the key"):
            txn.merge_into(
                spark, str(tmp_path / "t2"), src, payload_cols=["id"]
            )

    # --- r10: source key type safety (ADVICE r9) -----------------------

    def test_key_type_mismatch_raises_not_wraps(self, spark, tmp_path):
        """An int-keyed table merged from a long-keyed source whose keys
        overflow int must RAISE a type error — the old blind non-ANSI
        cast silently wrapped the key and merged under a wrong one."""
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", 1, "I")],
                "id int, val string, seq long, op string",
            ),
            t, n_buckets=4,
        )
        overflow = spark.createDataFrame(
            [(2**40, "boom")], "id long, val string"
        )
        with pytest.raises(ValueError, match="does not fit"):
            txn.merge_into(spark, t, overflow)
        # a string key that fails the cast raises the same way, not the
        # misleading NULL-key error
        bad_str = spark.createDataFrame(
            [("not-a-number", "x")], "id string, val string"
        )
        with pytest.raises(ValueError, match="does not fit"):
            txn.merge_into(spark, t, bad_str)
        # in-range values of a differing type still merge fine
        ok = spark.createDataFrame([(1, "a2")], "id long, val string")
        txn.merge_into(spark, t, ok)
        assert {r.id: r.val
                for r in txn.read_cdc_table(spark, t).collect()} == {1: "a2"}

    # --- r10: flat tables with non-default keys (ADVICE r9) ------------

    def test_flat_table_non_default_key_merges(self, spark, tmp_path):
        """apply_cdc_batch_txn stamps key_col/seq_col into flat
        manifests, so a flat table keyed on a non-default column is
        mergeable — the r9 manifest omission made it unmergeable."""
        from taar_gcp_etl_spark.txn import apply_cdc_batch_txn

        t = str(tmp_path / "t")
        apply_cdc_batch_txn(
            spark.createDataFrame(
                [("g1", 1.0, 1, "I"), ("g2", 2.0, 1, "I")],
                "guid string, score double, seq long, op string",
            ),
            t, key_col="guid",
        )
        man = txn.latest_manifest(spark, t)
        assert man["key_col"] == "guid" and man["seq_col"] == "seq"
        src = spark.createDataFrame(
            [("g2", 2.5), ("g3", 3.0)], "guid string, score double"
        )
        txn.merge_into(spark, t, src)  # key_col read off the manifest
        assert {r.guid: r.score
                for r in txn.read_cdc_table(spark, t).collect()} == {
            "g1": 1.0, "g2": 2.5, "g3": 3.0,
        }
        # explicit matching key_col is accepted, a wrong one raises
        txn.merge_into(
            spark, t,
            spark.createDataFrame([("g1", 1.5)],
                                  "guid string, score double"),
            key_col="guid",
        )
        with pytest.raises(ValueError, match="does not match"):
            txn.merge_into(spark, t, src, key_col="score")

    def test_stampless_flat_manifest_falls_back_to_caller_key(
        self, spark, tmp_path
    ):
        """A pre-r10 flat manifest (no key_col field) must trust the
        CALLER's key_col instead of rejecting it against the 'id'
        default (ADVICE r9 medium)."""
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [("g1", 1.0, 1, False)],
            "guid string, score double, seq long, _deleted boolean",
        )
        txn.commit_txn(df, t)  # plain commit: no key stamp
        man = txn.latest_manifest(spark, t)
        assert "key_col" not in man
        src = spark.createDataFrame(
            [("g1", 9.0)], "guid string, score double"
        )
        # naming a non-column raises clearly while the table is
        # stampless (afterwards the stamp itself rejects mismatches)
        with pytest.raises(ValueError, match="no key_col stamp"):
            txn.merge_into(spark, t, src, key_col="absent")
        txn.merge_into(spark, t, src, key_col="guid")
        assert {r.guid: r.score
                for r in txn.read_cdc_table(spark, t).collect()} == {
            "g1": 9.0,
        }
        # the merge routed through apply_cdc_batch_txn, which stamps
        # the manifest — the table has healed into a keyed one
        assert txn.latest_manifest(spark, t)["key_col"] == "guid"
        with pytest.raises(ValueError, match="does not match"):
            txn.merge_into(spark, t, src, key_col="absent")

    def test_maintenance_rewrite_keeps_key_stamp(self, spark, tmp_path):
        """compact/maintenance commits route through commit_txn, which
        carries key_col/seq_col forward from the prior manifest — the
        stamp survives a rewrite that doesn't know about it."""
        from taar_gcp_etl_spark.txn import apply_cdc_batch_txn

        t = str(tmp_path / "t")
        apply_cdc_batch_txn(
            spark.createDataFrame(
                [("g1", 1.0, 1, "I"), ("g2", 2.0, 2, "D")],
                "guid string, score double, seq long, op string",
            ),
            t, key_col="guid",
        )
        txn.compact_cdc_tombstones(spark, t, min_live_seq=10)
        man = txn.latest_manifest(spark, t)
        assert man["key_col"] == "guid" and man["seq_col"] == "seq"

    # --- r10: broadcast size gate (VERDICT r9 #3) -----------------------

    def test_broadcast_gate_switches_plan_same_result(
        self, spark, tmp_path, monkeypatch
    ):
        """Past MERGE_BROADCAST_KEY_GATE source rows the classification
        probe drops the broadcast hint (AQE plans the semi-join); the
        merge result is identical either way."""
        t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
        rows = [(i, f"v{i}", False) for i in range(40)]
        for t in (t1, t2):
            self._seed(spark, t, rows)
        src_rows = [(i, f"m{i}", i % 3 == 0) for i in range(0, 60, 2)]
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore", RuntimeWarning)
            txn.merge_into(
                spark, t1, self._src(spark, src_rows),
                matched_delete_condition="flag",
            )
            monkeypatch.setattr(txn, "MERGE_BROADCAST_KEY_GATE", 5)
            txn.merge_into(
                spark, t2, self._src(spark, src_rows),
                matched_delete_condition="flag",
            )
        assert self._live(spark, t1) == self._live(spark, t2)

    def test_fractional_key_truncation_raises(self, spark, tmp_path):
        """Review r10: ANSI cast truncates double->long (5.7 -> 5,
        non-null), sneaking past a null-only probe and merging under a
        NEIGHBOR key — the round-trip check must raise instead."""
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(5, "a", 1, "I")], "id long, val string, seq long, op string",
            ),
            t, n_buckets=4,
        )
        frac = spark.createDataFrame(
            [(5.7, "boom")], "id double, val string"
        )
        with pytest.raises(ValueError, match="does not fit"):
            txn.merge_into(spark, t, frac)
        # whole-valued doubles (the JSON-decoded-int shape) still merge
        ok = spark.createDataFrame([(5.0, "a2")], "id double, val string")
        txn.merge_into(spark, t, ok)
        assert {r.id: r.val
                for r in txn.read_cdc_table(spark, t).collect()} == {5: "a2"}

    def test_cast_path_releases_persisted_source(self, spark, tmp_path):
        """Review r10: the key-cast path rebound `source` before the
        finally-unpersist, leaking one cache entry per merge — the
        cache manager must be empty after a cast-path merge."""
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", 1, "I")], "id long, val string, seq long, op string",
            ),
            t, n_buckets=4,
        )
        spark.catalog.clearCache()
        txn.merge_into(
            spark, t,
            spark.createDataFrame([(1, "a2")], "id int, val string"),
        )
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty()

class TestPrunedUserReads:
    """VERDICT r9 #5: zone-map pushdown on the USER-FACING read faces —
    read_cdc_table(filters=) and join_bucketed(filters_left/right=) —
    must equal the plain read + filter while scanning fewer files."""

    CDC_D = "id long, val string, day long, seq long, op string"

    def _apply(self, spark, t, rows, **kw):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, self.CDC_D),
            t, n_buckets=4, stats_cols=["day"], **kw
        )

    def _fixture(self, spark, t):
        # three day-correlated batches (time-correlated ingest: each
        # commit's files cover a narrow day range)
        self._apply(
            spark, t, [(i, f"a{i}", 1, 100 + i, "I") for i in range(8)]
        )
        self._apply(
            spark, t,
            [(i, f"b{i}", 2, 200 + i, "I") for i in range(8, 16)],
        )
        self._apply(
            spark, t,
            [(i, f"c{i}", 3, 300 + i, "I") for i in range(16, 24)],
        )

    def test_read_cdc_table_filters_equal_and_prune(self, spark, tmp_path):
        from taar_gcp_etl_spark.layout import _residual

        t = str(tmp_path / "t")
        self._fixture(spark, t)
        filters = [("day", ">=", 3)]
        plain = txn.read_cdc_table(spark, t)
        pruned = txn.read_cdc_table(spark, t, filters=filters)
        assert sorted(
            tuple(r) for r in pruned.collect()
        ) == sorted(
            tuple(r) for r in plain.filter(_residual(filters)).collect()
        )
        # strictly fewer files scanned than the full read
        assert 0 < len(pruned.inputFiles()) < len(plain.inputFiles())
        # the residual reaches the parquet reader
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "day" in plan

    def test_read_cdc_table_filters_flat_table(self, spark, tmp_path):
        """No zone maps (flat layout): the filter applies as a plain
        pushed predicate — same rows, no error."""
        from taar_gcp_etl_spark.txn import apply_cdc_batch_txn

        t = str(tmp_path / "t")
        apply_cdc_batch_txn(
            spark.createDataFrame(
                [(i, f"v{i}", i % 3, i, "I") for i in range(12)],
                self.CDC_D,
            ),
            t,
        )
        got = txn.read_cdc_table(spark, t, filters=[("day", "=", 1)])
        assert sorted(r.id for r in got.collect()) == [
            i for i in range(12) if i % 3 == 1
        ]
        with pytest.raises(ValueError, match="include_tombstones"):
            txn.read_cdc_table(
                spark, t, filters=[("day", "=", 1)],
                include_tombstones=True,
            )

    def test_read_filters_hide_deletes_and_overlays(self, spark, tmp_path):
        """Soundness under tombstones: deleted keys stay hidden from the
        pruned read; a filter that matches a tombstone's old base row
        must not resurrect it."""
        t = str(tmp_path / "t")
        self._fixture(spark, t)
        # delete two day-3 keys (overlay or rewrite, whichever the
        # layer picks)
        self._apply(
            spark, t,
            [(16, None, 3, 400, "D"), (17, None, 3, 401, "D")],
        )
        got = txn.read_cdc_table(spark, t, filters=[("day", "=", 3)])
        assert sorted(r.id for r in got.collect()) == list(range(18, 24))

    def test_join_bucketed_filters_equal_and_prune(self, spark, tmp_path):
        from taar_gcp_etl_spark.layout import _residual

        lt, rt = str(tmp_path / "l"), str(tmp_path / "r")
        self._fixture(spark, lt)
        self._fixture(spark, rt)
        filters = [("day", ">=", 3)]
        plain = txn.join_bucketed(spark, lt, rt, how="inner")
        pruned = txn.join_bucketed(
            spark, lt, rt, how="inner",
            filters_left=filters, filters_right=filters,
        )
        assert sorted(
            tuple(r) for r in pruned.collect()
        ) == sorted(
            tuple(r)
            for r in plain.filter(_residual(filters))
            .filter(_residual([("day_r", ">=", 3)]))
            .collect()
        )
        assert 0 < len(pruned.inputFiles()) < len(plain.inputFiles())
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan

    def test_join_bucketed_filter_collapses_branches(self, spark, tmp_path):
        """A filter matching NOTHING prunes every base file — the inner
        join collapses to the empty relation without scanning a byte of
        either side's data files."""
        lt, rt = str(tmp_path / "l"), str(tmp_path / "r")
        self._fixture(spark, lt)
        self._fixture(spark, rt)
        out = txn.join_bucketed(
            spark, lt, rt, how="inner",
            filters_left=[("day", ">=", 99)],
        )
        assert out.count() == 0
        assert out.inputFiles() == []

    def test_join_bucketed_outer_keeps_unfiltered_side(self, spark, tmp_path):
        """filters_left on a LEFT join restricts the preserved side;
        the right side still enriches whatever survives."""
        lt, rt = str(tmp_path / "l"), str(tmp_path / "r")
        self._fixture(spark, lt)
        self._fixture(spark, rt)
        out = txn.join_bucketed(
            spark, lt, rt, how="left",
            filters_left=[("day", "=", 2)],
        )
        rows = {r.id: (r.day, r.day_r) for r in out.collect()}
        assert set(rows) == set(range(8, 16))
        assert all(v == (2, 2) for v in rows.values())

class TestRegisterCdcTable:
    """SQL face over the txn layer: register_cdc_table exposes live
    rows (or a pinned version) as a temp view; snapshot captured at
    registration."""

    def test_register_live_and_time_travel(self, spark, tmp_path):
        t = str(tmp_path / "t")
        assert not txn.register_cdc_table(spark, t, "missing_tbl")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", 1, "I"), (2, "b", 1, "I")],
                "id long, val string, seq long, op string",
            ),
            t, n_buckets=4,
        )
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(2, None, 2, "D"), (3, "c", 2, "I")],
                "id long, val string, seq long, op string",
            ),
            t, n_buckets=None,
        )
        assert txn.register_cdc_table(spark, t, "reg_live")
        got = {
            r.id: r.val
            for r in spark.sql(
                "SELECT id, val FROM reg_live ORDER BY id"
            ).collect()
        }
        assert got == {1: "a", 3: "c"}
        # time travel to version 1 under a second name
        assert txn.register_cdc_table(spark, t, "reg_v1", version=1)
        got1 = {
            r.id: r.val for r in spark.sql(
                "SELECT id, val FROM reg_v1"
            ).collect()
        }
        assert got1 == {1: "a", 2: "b"}
        # snapshot-at-registration: a later commit is NOT visible
        # through the existing view until re-registration
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(4, "d", 3, "I")],
                "id long, val string, seq long, op string",
            ),
            t, n_buckets=None,
        )
        assert spark.sql(
            "SELECT count(*) AS n FROM reg_live"
        ).collect()[0].n == 2
        txn.register_cdc_table(spark, t, "reg_live")
        assert spark.sql(
            "SELECT count(*) AS n FROM reg_live"
        ).collect()[0].n == 3
        spark.catalog.dropTempView("reg_live")
        spark.catalog.dropTempView("reg_v1")

    def test_register_join_store_hides_cursor(self, spark, tmp_path):
        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        store = str(tmp_path / "mv")
        for d, col in ((left, "lval"), (right, "rval")):
            txn.apply_cdc_batch_bucketed(
                spark.createDataFrame(
                    [(1, "x", 1, "I")],
                    f"id long, {col} string, seq long, op string",
                ),
                d, n_buckets=4,
            )
        txn.sync_join_from_cdc(spark, left, right, store)
        assert txn.register_cdc_table(spark, store, "reg_mv")
        cols = spark.sql("SELECT * FROM reg_mv").columns
        assert "_mv_seq" not in cols and "lval" in cols and "rval" in cols
        spark.catalog.dropTempView("reg_mv")

    def test_register_aggregate_store_snapshot(self, spark, tmp_path):
        """Review r9 fix: aggregate stores are snapshot-shaped (no
        tombstone column) — registration must route through read_txn
        and hide the maintenance counters instead of raising."""
        src = str(tmp_path / "src")
        store = str(tmp_path / "agg")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", 10, 1, "I"), (2, "a", 20, 1, "I"),
                 (3, "b", 5, 1, "I")],
                "id long, grp string, val long, seq long, op string",
            ),
            src, n_buckets=4, stats_cols=["grp"],
        )
        txn.sync_aggregate_from_cdc(
            spark, src, store, ["grp"],
            {"total": ("sum", "val"), "n": ("count", "*")},
        )
        assert txn.register_cdc_table(spark, store, "reg_agg")
        rows = {
            r.grp: (r.total, r.n)
            for r in spark.sql(
                "SELECT grp, total, n FROM reg_agg"
            ).collect()
        }
        assert rows == {"a": (30, 2), "b": (5, 1)}
        cols = spark.sql("SELECT * FROM reg_agg").columns
        assert not any(
            c == "_live_rows" or c.startswith("_nn_") for c in cols
        )
        spark.catalog.dropTempView("reg_agg")

    def test_filters_delegate_to_pruned_read(self, spark, tmp_path):
        """register_cdc_table(filters=) bakes file skipping into the
        view; snapshot-shaped tables reject the parameter with
        guidance (filter in SQL instead)."""
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, i % 4, f"v{i}", 1, "I") for i in range(24)],
                "id long, day int, val string, seq long, op string",
            ),
            t, n_buckets=4, stats_cols=["day"],
        )
        assert txn.register_cdc_table(
            spark, t, "slice_view", filters=[("day", "=", 2)]
        )
        got = spark.sql("SELECT id FROM slice_view ORDER BY id")
        assert [r.id for r in got.collect()] == [
            i for i in range(24) if i % 4 == 2
        ]
        snap = str(tmp_path / "snap")
        txn.commit_txn(
            spark.createDataFrame([(1, 2)], "a long, b long"), snap
        )
        with pytest.raises(ValueError, match="plain"):
            txn.register_cdc_table(
                spark, snap, "v2", filters=[("a", "=", 1)]
            )


class TestStreamMergeInto:
    """Streaming MERGE (streaming.jobs.stream_merge_into): foreachBatch
    + txn.merge_into with per-batch key dedup and epoch replay skip —
    the Delta streaming-upsert recipe as one call."""

    D = "id long, val string, flag boolean, ts long"

    def test_end_to_end_with_dedup_and_clauses(self, spark, tmp_path):
        from taar_gcp_etl_spark.streaming.jobs import stream_merge_into

        src = tmp_path / "src"
        src.mkdir()
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", False, 0, 1, "I"), (2, "b", False, 0, 1, "I")],
                self.D + ", seq long, op string",
            ),
            t, n_buckets=4,
        )
        # trigger 1: key 3 arrives TWICE in one batch (ts 5 then 9 —
        # dedup keeps ts 9); key 1 updates; key 2 delete-flagged
        spark.createDataFrame(
            [(3, "c-old", False, 5), (3, "c-new", False, 9),
             (1, "a2", False, 7), (2, None, True, 8)],
            self.D,
        ).coalesce(1).write.mode("append").parquet(str(src))
        stream = (
            spark.readStream.schema(self.D)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_merge_into(
            stream, t, str(tmp_path / "ckpt"),
            dedup_order="ts",
            matched_delete_condition="flag",
            not_matched_condition="NOT flag",
        )
        q.processAllAvailable()
        live = {
            r.id: r.val for r in txn.read_cdc_table(spark, t).collect()
        }
        assert live == {1: "a2", 3: "c-new"}
        v_after = txn.latest_manifest(spark, t)["version"]
        # trigger 2: another file
        spark.createDataFrame(
            [(3, "c3", False, 12)], self.D
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        q.stop()
        assert txn.latest_manifest(spark, t)["version"] > v_after
        assert {
            r.id: r.val for r in txn.read_cdc_table(spark, t).collect()
        } == {1: "a2", 3: "c3"}

    def test_epoch_replay_skips(self, spark, tmp_path):
        """A replayed epoch (fresh checkpoint over already-merged
        files) must not double-apply an accumulating SET expression."""
        from taar_gcp_etl_spark.streaming.jobs import stream_merge_into

        src = tmp_path / "src"
        src.mkdir()
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", False, 0, 1, "I")],
                self.D + ", seq long, op string",
            ),
            t, n_buckets=4,
        )
        spark.createDataFrame(
            [(1, "a", False, 3)], self.D
        ).coalesce(1).write.mode("append").parquet(str(src))

        def run(ckpt):
            stream = spark.readStream.schema(self.D).parquet(str(src))
            q = stream_merge_into(
                stream, t, str(tmp_path / ckpt),
                when=[{"matched": "update",
                       "set": {"ts": "t_ts + ts"}}],
            )
            q.processAllAvailable()
            q.stop()

        run("ckpt1")
        got = {r.id: r.ts for r in txn.read_cdc_table(spark, t).collect()}
        assert got == {1: 3}
        # same files, FRESH checkpoint: epoch_id restarts at 0, which
        # the manifest guard treats as already-committed — no re-apply
        run("ckpt2")
        got2 = {r.id: r.ts for r in txn.read_cdc_table(spark, t).collect()}
        assert got2 == {1: 3}

    def test_dedup_tiebreak_tolerates_map_columns(self, spark, tmp_path):
        """Review r10: the dedup tie-break hashed every column, which
        xxhash64 rejects for maps at analysis time — a map-carrying
        stream must still merge."""
        from taar_gcp_etl_spark.streaming.jobs import stream_merge_into

        src = tmp_path / "src"
        src.mkdir()
        t = str(tmp_path / "t")
        d = "id long, attrs map<string,string>, ts long"
        spark.createDataFrame(
            [(1, {"k": "v1"}, 1), (1, {"k": "v2"}, 2)], d
        ).coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(d).parquet(str(src))
        q = stream_merge_into(
            stream, t, str(tmp_path / "ckpt"),
            dedup_order="ts", key_col="id", n_buckets=4,
        )
        q.processAllAvailable()
        q.stop()
        got = txn.read_cdc_table(spark, t).collect()
        assert len(got) == 1 and got[0].attrs == {"k": "v2"}


class TestMergeNotMatchedBySource:
    """Delta's WHEN NOT MATCHED BY SOURCE (r10): target rows absent
    from the source — the full-snapshot-sync shape."""

    T = "id long, val string, flag boolean"

    def _seed(self, spark, t, rows):
        return txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, v, f, 1, "I") for i, v, f in rows],
                self.T + ", seq long, op string",
            ),
            t, n_buckets=8,
        )

    def _live(self, spark, t):
        return {
            r.id: (r.val, r.flag)
            for r in txn.read_cdc_table(spark, t).collect()
        }

    def test_snapshot_sync_delete_absent(self, spark, tmp_path):
        """The canonical shape: source = today's full extract; rows the
        extract no longer carries are deleted, carried rows upsert."""
        t = str(tmp_path / "t")
        self._seed(
            spark, t,
            [(1, "a", False), (2, "b", False), (3, "c", False)],
        )
        src = spark.createDataFrame(
            [(2, "b2", False), (4, "d", False)], self.T
        )
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore", RuntimeWarning)
            txn.merge_into(
                spark, t, src,
                when=[
                    {"matched": "update"},
                    {"not_matched": "insert"},
                    {"not_matched_by_source": "delete"},
                ],
            )
        assert self._live(spark, t) == {
            2: ("b2", False), 4: ("d", False),
        }

    def test_conditional_stale_stamp_first_match(self, spark, tmp_path):
        """Two NBS clauses, first-match-wins: flagged absentees delete,
        the rest get a stale marker via SET over t_ columns only."""
        t = str(tmp_path / "t")
        self._seed(
            spark, t,
            [(1, "a", True), (2, "b", False), (3, "c", False)],
        )
        src = spark.createDataFrame([(3, "c3", False)], self.T)
        txn.merge_into(
            spark, t, src,
            when=[
                {"matched": "update"},
                {"not_matched_by_source": "delete",
                 "condition": "t_flag"},
                {"not_matched_by_source": "update",
                 "set": {"val": "concat(t_val, '-stale')"}},
            ],
        )
        assert self._live(spark, t) == {
            2: ("b-stale", False), 3: ("c3", False),
        }

    def test_validation(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False)])
        src = spark.createDataFrame([(1, "a2", False)], self.T)
        with pytest.raises(ValueError, match="'set' is required"):
            txn.merge_into(
                spark, t, src,
                when=[{"not_matched_by_source": "update"}],
            )
        with pytest.raises(ValueError, match="must be 'update' or"):
            txn.merge_into(
                spark, t, src,
                when=[{"not_matched_by_source": "insert"}],
            )
        with pytest.raises(ValueError, match="except the last"):
            txn.merge_into(
                spark, t, src,
                when=[{"not_matched_by_source": "delete"},
                      {"not_matched_by_source": "update",
                       "set": {"val": "t_val"}}],
            )

    def test_evolve_schema_with_nbs_clause(self, spark, tmp_path):
        """ADVICE r10: evolve_schema=True + a new source column + an
        NBS clause crashed at plan time (F.lit(None).cast(None) for the
        evolved column, which the prior manifest's types don't know).
        The absent row must survive with the evolved column null."""
        t = str(tmp_path / "t")
        self._seed(
            spark, t,
            [(1, "a", False), (2, "b", False)],
        )
        src = spark.createDataFrame(
            [(2, "b2", False, "fr")], self.T + ", lang string"
        )
        txn.merge_into(
            spark, t, src,
            when=[
                {"matched": "update"},
                {"not_matched": "insert"},
                {"not_matched_by_source": "update",
                 "set": {"val": "concat(t_val, '-stale')"}},
            ],
            evolve_schema=True,
        )
        live = txn.read_cdc_table(spark, t)
        got = {r.id: (r.val, r.lang) for r in live.collect()}
        assert got == {1: ("a-stale", None), 2: ("b2", "fr")}

    def test_tombstones_not_resurrected(self, spark, tmp_path):
        """A tombstoned key is not a live target row — an NBS update
        must not resurrect it, and an NBS delete must not re-stamp it
        into the batch."""
        t = str(tmp_path / "t")
        self._seed(spark, t, [(1, "a", False), (2, "b", False)])
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(2, None, None, 5, "D")],
                self.T + ", seq long, op string",
            ),
            t, n_buckets=None,
        )
        src = spark.createDataFrame([(9, "z", False)], self.T)
        txn.merge_into(
            spark, t, src,
            when=[
                {"not_matched": "insert"},
                {"not_matched_by_source": "update",
                 "set": {"val": "concat(t_val, '!')"}},
            ],
        )
        assert self._live(spark, t) == {
            1: ("a!", False), 9: ("z", False),
        }

    def test_seq_outranks_user_scale(self, spark, tmp_path):
        """NBS rows stamp max(version+1, current seq+1) like the main
        path — a high user-supplied seq on the target row is outranked."""
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(1, "a", False, 1000, "I")],
                self.T + ", seq long, op string",
            ),
            t, n_buckets=8,
        )
        src = spark.createDataFrame([(2, "b", False)], self.T)
        txn.merge_into(
            spark, t, src,
            when=[
                {"not_matched": "insert"},
                {"not_matched_by_source": "delete"},
            ],
        )
        assert self._live(spark, t) == {2: ("b", False)}


class TestNbsZoneMapPrune:
    """Round 11 (VERDICT r10 #4): structured NBS clause conditions
    enable zone-map pruning of the absent-row scan — and restore the
    matched side's bucket probe. Soundness: a row claimed by clause i
    satisfies i's whole conjunction, so its file overlaps every
    predicate of i and survives in the union of per-clause kept sets;
    pruned files contain only rows no clause could touch."""

    T = "id long, d long, val string"

    def _seed(self, spark, t, n=400, n_buckets=2, target_file_rows=50):
        """n rows, d = id // 10 (a date-like monotone column);
        stats_cols clustering rolls each bucket into date-narrow
        files, the shape the prune exploits."""
        rows = [(i, i // 10, f"v{i}", 1, "I") for i in range(n)]
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, self.T + ", seq long, op string"),
            t, key_col="id", n_buckets=n_buckets,
            stats_cols=["d"], target_file_rows=target_file_rows,
        )

    def _live(self, spark, t):
        return {
            r.id: (r.d, r.val)
            for r in txn.read_cdc_table(spark, t).collect()
        }

    def _merge(self, spark, t, cond, src_rows=None):
        src = spark.createDataFrame(
            src_rows
            or [(i, i // 10, f"n{i}") for i in range(100, 400)],
            self.T,
        )
        txn.merge_into(
            spark, t, src,
            when=[
                {"matched": "update"},
                {"not_matched": "insert"},
                {"not_matched_by_source": "delete", "condition": cond},
            ],
        )

    def test_pruned_equals_unpruned(self, spark, tmp_path):
        """The done criterion: the structured-condition (pruned) merge
        and the string-condition (O(table)) merge land the same state.
        Source carries keys 100..399; absentees 0..99 (d 0..9) are
        deleted when d < 5 -> keys 0..49 go, 50..99 stay."""
        ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
        for t in (ta, tb):
            self._seed(spark, t)
        self._merge(spark, ta, [("d", "<", 5)])
        # parenthesized so _parse_nbs_condition rejects it (r12): the
        # control side must stay the honest O(table) string path
        self._merge(spark, tb, "(t_d < 5)")
        a, b = self._live(spark, ta), self._live(spark, tb)
        assert a == b
        assert set(a) == set(range(50, 400))
        assert a[50] == (5, "v50") and a[150] == (15, "n150")

    def test_prune_engages_and_falls_back(self, spark, tmp_path, monkeypatch):
        """The pruned scan is actually taken for structured conditions
        on a stats-bearing table (kept fraction ~2/16) AND for simple
        SQL strings (r12: _parse_nbs_condition normalizes them to the
        structured form), and NOT taken for non-parseable strings or
        stats-less tables."""
        calls = []
        orig = txn.scan_cdc_pruned

        def spy(*a, **kw):
            if kw.get("raw"):
                calls.append(kw.get("kept_paths"))
            return orig(*a, **kw)

        monkeypatch.setattr(txn, "scan_cdc_pruned", spy)
        t = str(tmp_path / "t")
        self._seed(spark, t)
        man = txn.latest_manifest(spark, t)
        total = sum(len(v) for v in man["file_stats"].values())
        assert total >= 8  # clustered rolling produced narrow files
        self._merge(spark, t, [("d", "<", 5)])
        assert len(calls) == 1
        # the kept set is a real prune, not the whole table
        assert 0 < len(calls[0]) < total / 2
        # simple SQL string (VERDICT r11 #5): parsed to the structured
        # form at normalize time — the prune engages for string callers
        t2 = str(tmp_path / "t2")
        self._seed(spark, t2)
        self._merge(spark, t2, "t_d < 5")
        assert len(calls) == 2 and len(calls[1]) == len(calls[0])
        # non-parseable string (disjunction): honest O(table) read
        t2b = str(tmp_path / "t2b")
        self._seed(spark, t2b)
        self._merge(spark, t2b, "t_d < 5 OR t_d < 3")
        assert len(calls) == 2
        # stats-less table: falls back silently
        t3 = str(tmp_path / "t3")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, i // 10, f"v{i}", 1, "I") for i in range(100)],
                self.T + ", seq long, op string",
            ),
            t3, key_col="id", n_buckets=2,
        )
        self._merge(
            spark, t3, [("d", "<", 5)],
            src_rows=[(i, i // 10, f"n{i}") for i in range(50, 100)],
        )
        assert len(calls) == 2
        assert set(self._live(spark, t3)) == set(range(5 * 10, 100))

    def test_matched_side_bucket_probe_restored(self, spark, tmp_path):
        """With a prunable NBS clause the matched side goes back to the
        bucket-pruned probe: a narrow source must NOT trip the
        full-width RuntimeWarning that the O(table) path suppressed by
        never probing."""
        import warnings as _w

        t = str(tmp_path / "t")
        self._seed(spark, t, n_buckets=8)
        # one key -> one bucket; NBS clause structured -> probe runs
        src = spark.createDataFrame([(7, 0, "x")], self.T)
        with _w.catch_warnings():
            _w.simplefilter("error", RuntimeWarning)
            txn.merge_into(
                spark, t, src,
                when=[
                    {"matched": "update"},
                    {"not_matched_by_source": "delete",
                     "condition": [("d", "<", 0)]},  # claims nothing
                ],
            )
        live = self._live(spark, t)
        assert live[7] == (0, "x") and len(live) == 400

    def test_overlay_tombstone_respected_through_prune(self, spark, tmp_path):
        """A key whose base row sits in a KEPT file but was tombstoned
        by a later overlay must not be claimed by an NBS clause — the
        raw pruned scan resolves overlays before the ~deleted filter."""
        t = str(tmp_path / "t")
        self._seed(spark, t)
        # tombstone key 3 (d=0, inside the claimed range)
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(3, None, None, 9, "D")],
                self.T + ", seq long, op string",
            ),
            t, key_col="id", n_buckets=None,
        )
        self._merge(spark, t, [("d", "<", 5)])
        live = self._live(spark, t)
        assert 3 not in live and 2 not in live  # 2 deleted by clause
        assert set(live) == set(range(50, 400))

    def test_multi_clause_union_and_first_match(self, spark, tmp_path):
        """Two structured NBS clauses: kept set is the UNION of the
        per-clause prunes, and first-match-wins still decides rows
        matching both."""
        t = str(tmp_path / "t")
        self._seed(spark, t)
        src = spark.createDataFrame(
            [(i, i // 10, f"n{i}") for i in range(100, 400)], self.T
        )
        txn.merge_into(
            spark, t, src,
            when=[
                {"matched": "update"},
                {"not_matched_by_source": "delete",
                 "condition": [("d", "<", 2)]},
                {"not_matched_by_source": "update",
                 "condition": [("d", "between", (1, 6))],
                 "set": {"val": "concat(t_val, '-stale')"}},
            ],
        )
        live = self._live(spark, t)
        # d<2 (keys 0..19) deleted; d in [2,6] (20..69) stale-stamped
        # (d=1 rows matched BOTH: first clause won -> deleted)
        assert 0 not in live and 19 not in live
        assert live[20] == (2, "v20-stale") and live[69] == (6, "v69-stale")
        assert live[70] == (7, "v70")  # claimed by neither
        assert live[150] == (15, "n150")

    def test_structured_condition_rejected_off_nbs(self, spark, tmp_path):
        t = str(tmp_path / "t")
        self._seed(spark, t, n=20)
        src = spark.createDataFrame([(1, 0, "x")], self.T)
        with pytest.raises(ValueError, match="structured"):
            txn.merge_into(
                spark, t, src,
                when=[{"matched": "update",
                       "condition": [("d", "<", 5)]}],
            )
        with pytest.raises(ValueError, match="not in"):
            txn.merge_into(
                spark, t, src,
                when=[
                    {"matched": "update"},
                    {"not_matched_by_source": "delete",
                     "condition": [("d", "!=", 5)]},
                ],
            )

    def test_null_condition_column_never_claimed(self, spark, tmp_path):
        """Null semantics parity between prune and predicate: a row
        with NULL in the condition column is claimed by no comparison
        clause, pruned or not."""
        t = str(tmp_path / "t")
        rows = [(1, None, "a", 1, "I"), (2, 0, "b", 1, "I")]
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, self.T + ", seq long, op string"),
            t, key_col="id", n_buckets=2,
            stats_cols=["d"], target_file_rows=1,
        )
        src = spark.createDataFrame([(9, 9, "z")], self.T)
        txn.merge_into(
            spark, t, src,
            when=[
                {"not_matched": "insert"},
                {"not_matched_by_source": "delete",
                 "condition": [("d", "<", 5)]},
            ],
        )
        live = self._live(spark, t)
        assert 1 in live and 2 not in live and 9 in live

    def test_prune_planning_type_mismatch_falls_back(self, spark, tmp_path):
        """ADVICE r11 (medium): a condition literal whose Python type
        can't compare against the stats-deserialized values (datetime
        cutoff vs date-typed stats → TypeError in _overlaps) must NOT
        crash the merge — prune planning falls back to the unpruned
        absent-row scan with a warning, and the executed predicate
        (Spark coerces) still lands the right state."""
        import datetime
        import warnings as _w

        schema = "id long, d date, val string"
        rows = [
            (i, datetime.date(1970, 1, 1 + i // 10), f"v{i}", 1, "I")
            for i in range(100)
        ]
        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(rows, schema + ", seq long, op string"),
            t, key_col="id", n_buckets=2,
            stats_cols=["d"], target_file_rows=20,
        )
        src = spark.createDataFrame(
            [
                (i, datetime.date(1970, 1, 1 + i // 10), f"n{i}")
                for i in range(50, 100)
            ],
            schema,
        )
        cutoff = datetime.datetime(1970, 1, 6)  # datetime, stats are date
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            txn.merge_into(
                spark, t, src,
                when=[
                    {"matched": "update"},
                    {"not_matched_by_source": "delete",
                     "condition": [("d", "<", cutoff)]},
                ],
            )
        assert any("prune planning failed" in str(w.message) for w in caught)
        live = {r.id for r in txn.read_cdc_table(spark, t).collect()}
        # absentees 0..49 have d <= Jan 5 < Jan 6 cutoff -> deleted
        assert live == set(range(50, 100))

    def test_tuple_cond_value_shape_validated(self, spark, tmp_path):
        """ADVICE r11 (low): bad between/in value shapes must fail at
        the documented validation point, not as an opaque TypeError
        deep in _tuple_pred or prune planning."""
        t = str(tmp_path / "t")
        self._seed(spark, t, n=20)
        src = spark.createDataFrame([(1, 0, "x")], self.T)

        def merge(cond):
            txn.merge_into(
                spark, t, src,
                when=[
                    {"matched": "update"},
                    {"not_matched_by_source": "delete", "condition": cond},
                ],
            )

        with pytest.raises(ValueError, match="between.*2-element"):
            merge([("d", "between", 5)])
        with pytest.raises(ValueError, match="between.*2-element"):
            merge([("d", "between", (1, 2, 3))])
        with pytest.raises(ValueError, match="'in' condition"):
            merge([("d", "in", 3)])
        merge([("d", "between", (98, 99)), ("d", "in", [98, 99])])

    def test_parse_nbs_condition_grammar(self):
        """r12 (VERDICT r11 #5): the SQL-string → structured translator
        accepts exactly the simple conjunctive grammar and rejects
        everything else (parse, don't trust)."""
        p = txn._parse_nbs_condition
        assert p("t_d < 5") == [("d", "<", 5)]
        assert p("  t_d  <=  5  AND  t_val = 'x'  ") == [
            ("d", "<=", 5), ("val", "=", "x")
        ]
        assert p("t_score >= -1.5") == [("score", ">=", -1.5)]
        assert p("t_a == 3 and t_b > 0") == [("a", "=", 3), ("b", ">", 0)]
        # a quoted literal containing ' AND ' must not split
        assert p("t_val = 'x AND y' AND t_d = 1") == [
            ("val", "=", "x AND y"), ("d", "=", 1)
        ]
        # rejections: outside the grammar → None (runs as string)
        for s in (
            "(t_d < 5)",
            "t_d < 5 OR t_d > 9",
            "NOT t_d < 5",
            "t_d BETWEEN 1 AND 5",
            "t_d IN (1, 2)",
            "t_d IS NULL",
            "t_d + 1 < 5",
            "t_d < t_other",
            "d < 5",              # not t_-prefixed
            "t_d < 'unclosed",
            "t_d != 5",
        ):
            assert p(s) is None, s

    def test_string_condition_equals_structured(self, spark, tmp_path):
        """End-to-end equality: the parsed string path and the explicit
        structured path land byte-identical states (both pruned), and
        both match the unparsed-string O(table) control."""
        ta, tb, tc = (str(tmp_path / x) for x in "abc")
        for t in (ta, tb, tc):
            self._seed(spark, t)
        self._merge(spark, ta, [("d", "<", 3)])
        self._merge(spark, tb, "t_d < 3")
        self._merge(spark, tc, "(t_d < 3)")  # unparsed control
        a, b, c = (self._live(spark, t) for t in (ta, tb, tc))
        assert a == b == c
        assert set(a) == set(range(30, 400))

    def test_legacy_kwargs_reject_structured_condition(self, spark, tmp_path):
        """ADVICE r11 (low): the legacy kwargs path must reject
        structured conditions with the same ValueError the when=[...]
        path raises, instead of silently evaluating them over
        t_-prefixed columns."""
        t = str(tmp_path / "t")
        self._seed(spark, t, n=20)
        src = spark.createDataFrame([(1, 0, "x")], self.T)
        for kw in (
            {"matched_condition": [("d", "<", 5)]},
            {"matched_delete_condition": [("d", "<", 5)]},
            {"when_not_matched": "insert",
             "not_matched_condition": [("d", "<", 5)]},
        ):
            with pytest.raises(ValueError, match="structured"):
                txn.merge_into(spark, t, src, **kw)


class TestMergeSourcePersist:
    """VERDICT r10 #5: merge_into traverses the source four times
    (cardinality probe, count, bucket probe, classification join) —
    the call-scoped persist must make a derived source's plan execute
    ONCE, not four times. Counted with an accumulator-ticking UDF in
    the source plan: under the persist the tick runs only during cache
    materialization."""

    def test_source_plan_executes_once_across_probes(self, spark, tmp_path):
        from pyspark.sql.functions import udf

        acc = spark.sparkContext.accumulator(0)

        @udf("long")
        def tick(v):
            acc.add(1)
            return v

        t = str(tmp_path / "t")
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(i, f"v{i}", 1, "I") for i in range(40)],
                "id long, val string, seq long, op string",
            ),
            t, key_col="id", n_buckets=4,
        )
        n_src = 50
        src = spark.createDataFrame(
            [(i, f"n{i}") for i in range(n_src)], "id long, val string"
        ).select(tick(F.col("id")).alias("id"), "val")
        txn.merge_into(spark, t, src)
        live = {r.id: r.val for r in txn.read_cdc_table(spark, t).collect()}
        assert live == {i: f"n{i}" for i in range(n_src)}
        # one materialization (the persist) — not one per traversal.
        # Exactly n_src under the cache; 4-5x that if the persist broke.
        assert acc.value == n_src, acc.value


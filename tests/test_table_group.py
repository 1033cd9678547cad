"""Table groups (taar_gcp_etl_spark/table_group.py): cross-table
atomic visibility over the txn layer — a reader through a group version
sees every member table from one consistent cut, a crash between member
commits and the group publish leaves the old cut intact, and one epoch
guard covers all member tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from taar_gcp_etl_spark import table_group as tg
from taar_gcp_etl_spark import txn


def _orders(spark, rows):
    return spark.createDataFrame(rows, "o_id long, amount long")


def _summary_of(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("amount").alias("total")
    )


class TestGroupCommit:
    def _paths(self, tmp_path):
        return (
            str(tmp_path / "grp"),
            {"orders": str(tmp_path / "orders"),
             "summary": str(tmp_path / "summary")},
        )

    def _commit(self, spark, grp, dirs, rows, epoch=None):
        orders = _orders(spark, rows)
        return tg.group_commit(
            spark,
            grp,
            {"orders": orders, "summary": _summary_of(orders)},
            table_dirs=dirs,
            epoch_id=epoch,
        )

    def test_consistent_cut_and_time_travel(self, spark, tmp_path):
        grp, dirs = self._paths(tmp_path)
        assert self._commit(spark, grp, dirs, [(1, 10), (2, 20)]) == 1
        assert self._commit(spark, grp, dirs, [(1, 10), (2, 20), (3, 30)]) == 2
        # at EVERY group version, the summary matches its orders — the
        # pairing invariant a consistent cut guarantees
        for gv in (1, 2):
            orders = tg.read_group(spark, grp, "orders", group_version=gv)
            summary = tg.read_group(spark, grp, "summary", group_version=gv)
            exp = _summary_of(orders).collect()[0]
            got = summary.collect()[0]
            assert (got.n, got.total) == (exp.n, exp.total)
        assert tg.read_group(spark, grp, "orders").count() == 3  # latest
        hist = tg.group_history(spark, grp)
        assert [h["version"] for h in hist] == [1, 2]

    def test_crash_after_member_commit_keeps_old_cut(
        self, spark, tmp_path
    ):
        """A member table advanced WITHOUT a group publish (the crash
        window, or any out-of-band writer) must stay invisible to group
        readers: the old vector is still the truth."""
        grp, dirs = self._paths(tmp_path)
        self._commit(spark, grp, dirs, [(1, 10)])
        # simulate: group commit crashed after committing orders v2
        txn.commit_txn(_orders(spark, [(1, 10), (9, 900)]), dirs["orders"])
        assert txn.read_txn(spark, dirs["orders"]).count() == 2  # direct
        assert tg.read_group(spark, grp, "orders").count() == 1  # pinned
        # summary still matches the pinned orders — the cut holds
        s = tg.read_group(spark, grp, "summary").collect()[0]
        assert (s.n, s.total) == (1, 10)
        # the next successful group commit flips both together
        self._commit(spark, grp, dirs, [(1, 11), (9, 900)])
        s2 = tg.read_group(spark, grp, "summary").collect()[0]
        assert (s2.n, s2.total) == (2, 911)

    def test_one_epoch_guard_covers_all_members(self, spark, tmp_path):
        """A replayed epoch skips BEFORE any member commit — no member
        version advances, closing the cross-table double-apply window
        of independent per-table guards."""
        grp, dirs = self._paths(tmp_path)
        assert self._commit(spark, grp, dirs, [(1, 10)], epoch=7) == 1
        ov = txn.latest_manifest(spark, dirs["orders"])["version"]
        assert self._commit(spark, grp, dirs, [(1, 99)], epoch=7) is None
        assert txn.latest_manifest(spark, dirs["orders"])["version"] == ov
        assert tg.read_group(spark, grp, "orders").collect()[0].amount == 10

    def test_builder_member_and_carry_forward(self, spark, tmp_path):
        """Read-modify-write members use commit_txn's builder form;
        tables absent from a write set carry forward at their pinned
        versions."""
        grp, dirs = self._paths(tmp_path)
        self._commit(spark, grp, dirs, [(1, 10)])

        def bump(cur_version):
            cur = txn.read_txn(spark, dirs["orders"], version=cur_version)
            return cur.withColumn("amount", F.col("amount") + 1)

        gv = tg.group_commit(spark, grp, {"orders": bump})
        assert gv == 2
        assert tg.read_group(spark, grp, "orders").collect()[0].amount == 11
        # summary not written this commit: carried forward, still v1's
        d, v = tg.group_table_version(spark, grp, "summary")
        assert v == 1

    def test_replay_after_crash_completes_without_double_apply(
        self, spark, tmp_path
    ):
        """Crash window + replay: members committed with the group's
        epoch, group manifest never published, foreachBatch replays the
        SAME epoch. The member guards skip the re-commit (no
        double-apply of read-modify-write builders) and the replay
        COMPLETES the group commit by pinning the members' current
        versions."""
        grp, dirs = self._paths(tmp_path)
        self._commit(spark, grp, dirs, [(1, 10)], epoch=1)

        def add_total(cur_version):
            cur = txn.read_txn(spark, dirs["summary"], version=cur_version)
            return cur.withColumn("total", F.col("total") + 5)

        # simulate the crashed group commit: member committed WITH the
        # group epoch, but the group manifest publish never happened
        txn.commit_txn(add_total, dirs["summary"], epoch_id=2, spark=spark)
        assert tg.read_group_manifest(spark, grp)["version"] == 1
        # replay of epoch 2 through the group path
        gv = tg.group_commit(spark, grp, {"summary": add_total}, epoch_id=2)
        assert gv == 2
        s = tg.read_group(spark, grp, "summary").collect()[0]
        assert s.total == 15  # +5 applied ONCE, not twice
        # member history: exactly one commit beyond v1
        assert txn.latest_manifest(spark, dirs["summary"])["version"] == 2

    def test_foreign_epoch_domain_fails_loudly(self, spark, tmp_path):
        """A member table already driven by ANOTHER writer's (higher)
        epoch domain must not be silently skipped-and-pinned as if the
        group write succeeded (review fix)."""
        import pytest

        grp, dirs = self._paths(tmp_path)
        # member maintained outside the group with epoch 100
        txn.commit_txn(
            _orders(spark, [(1, 1)]), dirs["orders"], epoch_id=100
        )
        with pytest.raises(ValueError, match="epoch domain"):
            tg.group_commit(
                spark,
                grp,
                {"orders": _orders(spark, [(2, 2)])},
                table_dirs=dirs,
                epoch_id=1,
            )

    def test_unknown_table_requires_dir(self, spark, tmp_path):
        import pytest

        grp, dirs = self._paths(tmp_path)
        with pytest.raises(ValueError, match="no table_dir"):
            tg.group_commit(spark, grp, {"orders": _orders(spark, [(1, 1)])})


class TestGroupVacuum:
    """group_vacuum: retention aligned through the group — a member
    version an old-but-kept group manifest pins survives the member
    vacuum; everything older (and orphan member versions) is
    reclaimed."""

    def _paths(self, tmp_path):
        return (
            str(tmp_path / "grp"),
            {"orders": str(tmp_path / "orders"),
             "summary": str(tmp_path / "summary")},
        )

    def _commit(self, spark, grp, dirs, rows):
        orders = _orders(spark, rows)
        return tg.group_commit(
            spark,
            grp,
            {"orders": orders, "summary": _summary_of(orders)},
            table_dirs=dirs,
        )

    def test_kept_group_versions_stay_readable(self, spark, tmp_path):
        grp, dirs = self._paths(tmp_path)
        for i in range(1, 5):  # group v1..v4; members at v1..v4 too
            self._commit(spark, grp, dirs, [(j, j * 10) for j in range(i)])
        rep = tg.group_vacuum(
            spark, grp, keep_last=2, member_keep_last=1
        )
        assert rep["kept_group_versions"] == [3, 4]
        assert rep["removed_group_manifests"] == 2
        # member v1/v2 reclaimed, v3 kept ONLY via the group pin
        assert rep["members"]["orders"]["kept_versions"] == [3, 4]
        assert rep["members"]["orders"]["removed_manifests"] == 2
        # both surviving group versions resolve fully
        for gv in (3, 4):
            got = {
                r.o_id: r.amount
                for r in tg.read_group(spark, grp, "orders", gv).collect()
            }
            assert got == {j: j * 10 for j in range(gv)}
            assert tg.read_group(spark, grp, "summary", gv).first().n == gv
        # reclaimed group version is gone from the log
        import pytest

        with pytest.raises(Exception):
            tg.read_group(spark, grp, "orders", 2).collect()

    def test_orphan_member_versions_reclaimed(self, spark, tmp_path):
        """A member commit whose group publish crashed (orphan version,
        invisible to every group vector) is reclaimable once member
        retention passes it — the module docstring's promise."""
        grp, dirs = self._paths(tmp_path)
        self._commit(spark, grp, dirs, [(1, 10)])            # member v1
        txn.commit_txn(_orders(spark, [(9, 90)]), dirs["orders"])  # orphan v2
        self._commit(spark, grp, dirs, [(1, 10), (2, 20)])   # member v3
        rep = tg.group_vacuum(
            spark, grp, keep_last=2, member_keep_last=1
        )
        # group v1 pins member v1; group v2 pins member v3; orphan v2
        # is neither pinned nor inside member_keep_last → reclaimed
        assert rep["members"]["orders"]["kept_versions"] == [1, 3]
        for gv in (1, 2):
            assert tg.read_group(spark, grp, "orders", gv).count() == gv

    def test_member_outside_kept_manifests_still_vacuumed(
        self, spark, tmp_path
    ):
        """Review fix: a member referenced ONLY by group manifests
        outside the retention window must still get a member vacuum
        (plain retention, no pins) — otherwise its storage leaks right
        as the manifests referencing it are deleted."""
        grp = str(tmp_path / "grp")
        old_dir, new_dir = str(tmp_path / "ord_old"), str(tmp_path / "ord_new")
        tg.group_commit(
            spark, grp, {"orders": _orders(spark, [(1, 10)])},
            table_dirs={"orders": old_dir},
        )
        # pile up versions on the old dir, then remap the name: the old
        # dir is referenced only by group v1
        txn.commit_txn(_orders(spark, [(1, 11)]), old_dir)
        txn.commit_txn(_orders(spark, [(1, 12)]), old_dir)
        for i in range(2, 5):  # group v2..v4 pin the NEW dir
            tg.group_commit(
                spark, grp, {"orders": _orders(spark, [(i, i)])},
                table_dirs={"orders": new_dir},
            )
        rep = tg.group_vacuum(spark, grp, keep_last=2, member_keep_last=1)
        assert rep["kept_group_versions"] == [3, 4]
        # the old dir is outside every kept vector, but it must STILL
        # be vacuumed under plain member retention (no pins)
        key_old = f"orders@{old_dir}"
        assert key_old in rep["members"], sorted(rep["members"])
        assert rep["members"][key_old]["kept_versions"] == [3]
        assert rep["members"][key_old]["removed_manifests"] == 2
        # and the kept vectors' dir keeps its pinned versions
        key_new = f"orders@{new_dir}"
        assert rep["members"][key_new]["kept_versions"] == [2, 3]

    def test_member_grace_passthrough(self, spark, tmp_path):
        """grace_seconds reaches the member vacuums: young snapshot
        dirs survive even when unreferenced."""
        grp, dirs = self._paths(tmp_path)
        self._commit(spark, grp, dirs, [(1, 10)])
        # orphan member v2: unreferenced by any group vector and below
        # member retention after the next commit — but its snapshot dir
        # is YOUNG, so the grace window must protect it
        txn.commit_txn(_orders(spark, [(9, 90)]), dirs["orders"])
        self._commit(spark, grp, dirs, [(1, 10), (2, 20)])   # member v3
        rep = tg.group_vacuum(
            spark, grp, keep_last=1, member_keep_last=1,
            grace_seconds=3600,
        )
        assert rep["members"]["orders"]["skipped_young"] >= 1
        assert rep["members"]["orders"]["removed_snapshots"] == 0

"""Cross-table atomic commits: TABLE GROUPS over the txn layer.

The single-table manifest swap (txn.py) makes each table's commits
atomic, but a pipeline that maintains SEVERAL tables per batch — a
fact table and its aggregate store, a corpus and its dedup index, the
reference's catalog + whitelist pair (`taar_amodump` feeding
`taar_amowhitelist`, README.md:33-91 job DAG) — still exposes readers
to mixed states: table A at the new version while B lags. Classic
lakehouses punt on this (Delta/Iceberg transactions are per-table);
engines with a catalog (BigQuery scripting, Nessie) solve it with a
commit object that pins a VERSION VECTOR.

This module is that commit object, built from parts txn.py already
has:

* a group directory carries its own ``_log`` of group manifests, each
  pinning ``{table name -> (dir, version)}``;
* ``group_commit`` first commits every member table through the
  normal per-table path (full MVCC: versions are immutable history),
  then CAS-publishes ONE group manifest with the new vector. The
  group publish is the only commit point: a crash after some member
  commits leaves orphan member versions (invisible to group readers,
  reclaimable by vacuum) and the group still reads the old vector —
  all-or-nothing VISIBILITY without two-phase commit;
* ``read_group`` resolves a table through a pinned vector — every
  table read through the same group version is from one consistent
  cut, and group versions time-travel like table versions do.

Concurrency: member commits serialize through their own CAS loops;
concurrent group commits serialize through the group-manifest CAS.
Two concurrent group writers each publish a vector of versions they
themselves committed — both vectors are valid cuts, ordered by group
version (snapshot isolation at the group level, not cross-writer
merge: the second writer's vector simply supersedes the first's for
tables both touched, exactly like two blind single-table commits).

Scale posture: a group manifest is O(tables) metadata; member data
paths are untouched. The epoch guard gives exactly-once semantics for
a foreachBatch maintaining N tables per micro-batch — previously each
table had its own guard, which could double-apply table B after a
crash between B's commit and A's.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from taar_gcp_etl_spark import txn


def _latest_group(spark: SparkSession, group_dir: str) -> dict | None:
    return txn.latest_manifest(spark, group_dir)


def read_group_manifest(
    spark: SparkSession, group_dir: str, version: int | None = None
) -> dict | None:
    if version is None:
        return _latest_group(spark, group_dir)
    return txn.read_manifest(spark, group_dir, version)


def group_commit(
    spark: SparkSession,
    group_dir: str,
    writes: dict,
    table_dirs: dict[str, str] | None = None,
    epoch_id: int | None = None,
    max_attempts: int = 5,
) -> int | None:
    """Commit a consistent batch across member tables.

    ``writes`` maps table name -> DataFrame (blind write) or builder
    ``f(current_version|None) -> DataFrame`` (read-modify-write, same
    contract as commit_txn). ``table_dirs`` maps names to storage dirs
    for tables not yet in the group (first commit registers them; later
    commits inherit the recorded dirs). Tables in the group but absent
    from ``writes`` carry forward at their pinned versions.

    The member commits happen first (plain per-table commits — their
    versions are durable, immutable history); the single group-manifest
    publish then flips all of them visible together. ``epoch_id`` is
    checked BEFORE any member commit, so a replayed micro-batch is
    skipped without touching any table. Returns the group version, or
    None on replay skip."""
    group_dir = group_dir.rstrip("/")
    man = _latest_group(spark, group_dir)
    if epoch_id is not None and man is not None:
        last = man.get("epoch_id")
        if last is not None and epoch_id <= last:
            return None
    known = {n: e["dir"] for n, e in (man or {}).get("tables", {}).items()}
    dirs = {**known, **(table_dirs or {})}
    missing = set(writes) - set(dirs)
    if missing:
        raise ValueError(
            f"group_commit: no table_dir known for {sorted(missing)} — "
            "pass table_dirs= on first commit"
        )

    committed: dict[str, int] = {}
    for name, df in sorted(writes.items()):
        # members share the GROUP's epoch: a replay after a crash
        # between member commits and the group publish must not
        # double-apply read-modify-write members. The member's own
        # guard skips the re-commit (returns None); the vector then
        # pins the member's current version — the replay COMPLETES the
        # crashed group commit instead of re-running it.
        v = txn.commit_txn(
            df,
            dirs[name],
            epoch_id=epoch_id,
            spark=spark if callable(df) else None,
        )
        if v is None:
            # the member guard skipped this write. Legitimate only when
            # the member's recorded epoch IS this group epoch (the
            # crashed-group-commit replay); a HIGHER member epoch means
            # the table is being driven by another epoch domain — pin
            # nothing, fail loudly instead of publishing a vector that
            # silently dropped this write.
            member_man = txn.latest_manifest(spark, dirs[name])
            if member_man.get("epoch_id") != epoch_id:
                raise ValueError(
                    f"group_commit: member {name!r} skipped epoch "
                    f"{epoch_id} but its manifest records epoch "
                    f"{member_man.get('epoch_id')} — the table is "
                    "maintained by a different epoch domain; a group "
                    "member must receive its epochs only through the "
                    "group"
                )
            v = member_man["version"]
        committed[name] = v

    token = uuid.uuid4().hex[:8]
    for _ in range(max_attempts):
        man = _latest_group(spark, group_dir)
        if epoch_id is not None and man is not None:
            last = man.get("epoch_id")
            if last is not None and epoch_id <= last:
                return None  # lost to a concurrent replay of same epoch
        version = (man["version"] if man else 0) + 1
        tables = dict((man or {}).get("tables", {}))
        for name, v in committed.items():
            tables[name] = {"dir": dirs[name], "version": v}
        manifest = {
            "version": version,
            "tables": tables,
            "epoch_id": epoch_id,
            "parent": man["version"] if man else None,
        }
        if txn._publish_manifest(spark, group_dir, manifest, token):
            return version
    raise RuntimeError(
        f"group_commit: gave up after {max_attempts} version conflicts "
        f"on {group_dir}"
    )


def group_table_version(
    spark: SparkSession,
    group_dir: str,
    table: str,
    group_version: int | None = None,
) -> tuple[str, int]:
    """(dir, pinned table version) for a member at a group version."""
    man = read_group_manifest(spark, group_dir, group_version)
    if man is None or table not in man.get("tables", {}):
        raise ValueError(
            f"table {table!r} not in group {group_dir}"
            + (f" at v{group_version}" if group_version else "")
        )
    e = man["tables"][table]
    return e["dir"], e["version"]


def read_group(
    spark: SparkSession,
    group_dir: str,
    table: str,
    group_version: int | None = None,
    cdc: bool = False,
) -> DataFrame:
    """Read a member table at the group's pinned version — every table
    read through the same ``group_version`` is one consistent cut.
    ``cdc=True`` reads through read_cdc_table (tombstones hidden)."""
    d, v = group_table_version(spark, group_dir, table, group_version)
    if cdc:
        return txn.read_cdc_table(spark, d, version=v)
    return txn.read_txn(spark, d, version=v)


def group_history(spark: SparkSession, group_dir: str) -> list[dict]:
    """All group versions, oldest first: [{version, tables, epoch_id}]."""
    out = []
    for v in txn._list_manifest_versions(spark, group_dir):
        man = txn.read_manifest(spark, group_dir, v)
        out.append(
            {
                "version": man["version"],
                "tables": {
                    n: e["version"] for n, e in man["tables"].items()
                },
                "epoch_id": man.get("epoch_id"),
            }
        )
    return out


def group_vacuum(
    spark: SparkSession,
    group_dir: str,
    keep_last: int = 2,
    member_keep_last: int = 1,
    grace_seconds: float = 0.0,
) -> dict:
    """Garbage-collect a group AND its members coherently (NEXT.md r6
    #7): keep the newest ``keep_last`` group manifests, then vacuum
    every member table keeping its newest ``member_keep_last`` versions
    PLUS every version a kept group manifest still pins. Vacuuming
    members independently can reclaim a version an old-but-retained
    group vector still resolves to — read_group at that group version
    would then point at deleted data; this entry point is the retention
    alignment the module previously required operators to do by hand.

    Orphan member versions (committed by a crashed group_commit whose
    group publish never happened, and not covered by member retention)
    are reclaimed by the member vacuums — exactly the reclamation the
    module docstring promises. ``grace_seconds`` passes through to the
    member vacuums to protect in-flight commits.

    Returns {removed_group_manifests, kept_group_versions, members:
    {name: member vacuum report}}."""
    group_dir = group_dir.rstrip("/")
    versions = txn._list_manifest_versions(spark, group_dir)
    keep_group = versions[-keep_last:] if keep_last > 0 else []
    # pins keyed by storage dir (a name could in principle be remapped
    # to a new dir across group versions; the DIR owns the data). Every
    # dir ANY group manifest ever referenced is a vacuum target —
    # restricting to kept manifests would leave a member dropped or
    # remapped before the retention window with its storage retained
    # forever, right as the manifests referencing it are deleted
    # (review fix).
    pins: dict[str, set[int]] = {}
    names: dict[str, str] = {}
    for v in versions:
        man = txn.read_manifest(spark, group_dir, v)
        for name, e in man.get("tables", {}).items():
            pinset = pins.setdefault(e["dir"], set())
            if v in keep_group:
                pinset.add(e["version"])
            names[e["dir"]] = name
    removed_group = 0
    for v in versions:
        if v not in keep_group:
            _, fs, mp = txn._fs(
                spark,
                f"{group_dir}/{txn._LOG}/{txn._manifest_name(v)}",
            )
            fs.delete(mp, False)
            removed_group += 1
    dirs_per_name: dict[str, int] = {}
    for d, name in names.items():
        dirs_per_name[name] = dirs_per_name.get(name, 0) + 1
    members = {}
    for d in sorted(pins):
        name = names[d]
        # a name remapped to a new dir names TWO vacuum targets —
        # disambiguate the report key by dir
        label = name if dirs_per_name[name] == 1 else f"{name}@{d}"
        members[label] = txn.vacuum_txn(
            spark,
            d,
            keep_last=member_keep_last,
            grace_seconds=grace_seconds,
            pin_versions=sorted(pins[d]),
        )
    return {
        "removed_group_manifests": removed_group,
        "kept_group_versions": keep_group,
        "members": members,
    }


def stream_group_commit(
    changes: DataFrame,
    group_dir: str,
    make_writes,
    table_dirs: dict[str, str],
    checkpoint: str,
):
    """Streaming face: maintain N tables per micro-batch with ONE
    exactly-once guard. ``make_writes(batch_df) -> {name: df|builder}``
    builds the per-table writes from each micro-batch; a replayed epoch
    skips before any member commit, closing the cross-table
    double-apply window two independent epoch guards would leave."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        group_commit(
            batch_df.sparkSession,
            group_dir,
            make_writes(batch_df),
            table_dirs=table_dirs,
            epoch_id=epoch_id,
        )

    return (
        changes.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


__all__ = [
    "group_commit",
    "group_vacuum",
    "read_group",
    "read_group_manifest",
    "group_table_version",
    "group_history",
    "stream_group_commit",
]

"""Atomic versioned-parquet publication.

Plain ``df.write.mode("overwrite").parquet(path)`` is NOT atomic for
readers: overwrite deletes the old files first, so a concurrent reader sees
a missing or half-written table. Delta/Iceberg solve this with a
transaction log; this module is the minimal plain-parquet equivalent the
sink operators share (sink_upsert, the foreachBatch incremental sink):

  root/
    versions/v000000042/   immutable parquet snapshots, never rewritten
    LATEST                 one-line pointer file, flipped with os.replace

Writers publish a NEW version dir, then atomically flip the pointer
(``os.replace`` is atomic on POSIX). Readers resolve LATEST once and read
an immutable snapshot — they see the old version or the new one, never a
partial table. Old versions are pruned with a retention floor so in-flight
readers of the previous snapshot don't lose their files mid-query.

Reference analog: per-row INSERT+commit into SQLite
(sdg-ai/sdg_data_catalog utils/db_connection.py:61-87) — single-writer,
no snapshot isolation; at 100 TB this pointer dance is what MERGE INTO
gives you transactionally on a real table format.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class QualityGateError(RuntimeError):
    """A publish gate reported violations: the version was quarantined
    (staged dir removed) and LATEST was NOT flipped — readers keep the
    previous snapshot."""


def latest_version(root: str) -> tuple[str, int] | None:
    """(current snapshot dir, version number), or None before first publish."""
    ptr = os.path.join(root, "LATEST")
    if not os.path.isfile(ptr):
        return None
    with open(ptr) as fh:
        name = fh.read().strip()
    return os.path.join(root, "versions", name), int(name[1:])


def publish(
    df: DataFrame,
    root: str,
    version: int,
    keep: int = 2,
    gate: Callable[[DataFrame], DataFrame] | None = None,
    partition_by: list[str] | None = None,
) -> str:
    """Write ``df`` as snapshot ``version`` and atomically flip LATEST to it.

    Idempotent per version: re-publishing an already-current-or-older
    version (a replayed micro-batch, a retried job) is a no-op. Returns the
    directory readers of this version should use.

    ``gate``: optional data-quality verdict run BETWEEN the snapshot write
    and the pointer flip — the order that makes the gate trustworthy: it
    validates the bytes that were actually persisted (re-read from the
    staged, still-invisible version dir), not the logical plan. The gate
    receives that DataFrame and returns a (check_name, violations) report;
    any violations > 0 quarantines the batch (staged dir removed, pointer
    untouched, QualityGateError raised) so readers keep the previous
    snapshot. This is the publish discipline a 100 TB pipeline needs:
    a bad batch must never become LATEST.

    ``partition_by`` + ``gate`` interaction (no current caller combines
    them): the gate validates a RE-READ of the staged dir, and a
    partitioned re-read moves the partition columns to the end of the
    schema and may narrow their types via partition-value inference
    (a long written as a partition key reads back as int). A gate that
    checks schema or per-column stats must canonicalize column order and
    cast partition keys before comparing, or it will flag every
    partitioned publish."""
    cur = latest_version(root)
    vname = f"v{version:09d}"
    vdir = os.path.join(root, "versions", vname)
    if cur is not None and cur[1] >= version:
        # replay of a committed version: already published. If retention
        # has since pruned that version's dir, hand back the LIVE snapshot
        # instead of a dangling path — the replayer's data is stale either
        # way, and readers must get a directory that exists.
        return vdir if os.path.isdir(vdir) else cur[0]
    os.makedirs(root, exist_ok=True)
    writer = df.write.mode("overwrite")
    if partition_by:
        # partitioned snapshots (e.g. the ANN cell layout) keep their
        # pruning keys across versions — the flip is no less atomic,
        # the version dir just contains key=value subdirectories
        writer = writer.partitionBy(*partition_by)
    writer.parquet(vdir)
    if gate is not None:
        report = gate(df.sparkSession.read.parquet(vdir))
        bad = {
            r["check_name"]: r["violations"]
            for r in report.collect()
            if r["violations"]
        }
        if bad:
            # quarantine: a failed dir must not linger in versions/ (the
            # retention pruner sorts by name and could otherwise evict the
            # live snapshot while keeping the dead one)
            shutil.rmtree(vdir, ignore_errors=True)
            raise QualityGateError(f"v{version} blocked by publish gate: {bad}")
    tmp_ptr = os.path.join(root, f".LATEST.{version}.tmp")
    with open(tmp_ptr, "w") as fh:
        fh.write(vname)
    os.replace(tmp_ptr, os.path.join(root, "LATEST"))  # atomic flip
    vroot = os.path.join(root, "versions")
    names = sorted(os.listdir(vroot))
    for old in names[:-keep]:  # retention floor for in-flight readers
        shutil.rmtree(os.path.join(vroot, old), ignore_errors=True)
    return vdir


def prune(root: str, keep: int = 2) -> list[int]:
    """Retention as a first-class operation: remove superseded snapshot
    dirs beyond the newest ``keep``, returning the pruned version numbers.

    Two invariants a side-effect-of-publish pruner doesn't owe you:
    (a) the LIVE snapshot (whatever LATEST points at) is NEVER removed,
    even when a rollback has repointed LATEST at a version older than
    the newest ``keep`` — retention must not evict what readers resolve;
    (b) pruning only ever deletes immutable, superseded version dirs, so
    a crash mid-prune leaves a strictly smaller history and a valid
    pointer — re-running completes the job (idempotent).

    After a version is pruned, a replayed ``publish`` of it returns the
    live snapshot dir (see publish's replay clamp), and ``read_version``
    of it raises — history past the horizon is genuinely gone, which is
    the point: at 100 TB, unbounded version history IS the storage leak.
    """
    cur = latest_version(root)
    if cur is None:
        raise FileNotFoundError(f"no published version under {root}")
    vroot = os.path.join(root, "versions")
    names = sorted(n for n in os.listdir(vroot) if n.startswith("v"))
    live = f"v{cur[1]:09d}"
    doomed = [n for n in names[: -keep if keep else None] if n != live]
    for name in doomed:
        shutil.rmtree(os.path.join(vroot, name), ignore_errors=True)
    return [int(n[1:]) for n in doomed]


def read_latest(spark: SparkSession, root: str) -> DataFrame:
    cur = latest_version(root)
    if cur is None:
        raise FileNotFoundError(f"no published version under {root}")
    return spark.read.parquet(cur[0])


def rollback(root: str) -> tuple[str, int]:
    """Atomically repoint LATEST to the previous retained snapshot —
    the bad-deploy undo a versioned catalog owes its operators. The flip
    is the same tmp-file + os.replace the forward publish uses, so a
    crash mid-rollback leaves the pointer on ONE of the two versions,
    never between them; data dirs are untouched (the rolled-back version
    stays on disk for inspection or re-promotion). Returns the now-live
    (dir, version). Raises if there is no earlier retained version."""
    cur = latest_version(root)
    if cur is None:
        raise FileNotFoundError(f"no published version under {root}")
    vroot = os.path.join(root, "versions")
    names = sorted(n for n in os.listdir(vroot) if n.startswith("v"))
    idx = names.index(f"v{cur[1]:09d}")
    if idx == 0:
        raise ValueError(f"no version before v{cur[1]} retained under {root}")
    prev = names[idx - 1]
    tmp_ptr = os.path.join(root, f".LATEST.rollback.{prev}.tmp")
    with open(tmp_ptr, "w") as fh:
        fh.write(prev)
    os.replace(tmp_ptr, os.path.join(root, "LATEST"))
    return os.path.join(vroot, prev), int(prev[1:])


def read_version(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Time travel: read a specific published snapshot (if retained). The
    versioned layout is what makes this free — each publish is an immutable
    dir, so historical reads need no log replay, just the dir path."""
    return spark.read.parquet(os.path.join(root, "versions", f"v{version:09d}"))

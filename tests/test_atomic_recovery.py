"""Crash-recovery semantics of the atomic versioned publish: a writer
dying at any point before the pointer flip must leave readers on the old
snapshot, and a retry of the same version must complete cleanly."""

from __future__ import annotations

import os

import pytest

from sdg_data_catalog_spark.sources.atomic import (
    latest_version,
    publish,
    read_latest,
    rollback,
)


def test_rollback_lifecycle(spark, tmp_path):
    """Rollback repoints LATEST to the previous retained snapshot, keeps
    the rolled-back data dir for inspection, refuses to fall off the
    retention floor, and re-promotion forward works afterwards."""
    root = str(tmp_path / "rb")
    publish(spark.range(5).withColumnRenamed("id", "k"), root, 0)
    publish(spark.range(9).withColumnRenamed("id", "k"), root, 1)
    vdir, live = rollback(root)
    assert live == 0
    assert read_latest(spark, root).count() == 5
    # the rolled-back version's data survives (inspection / re-promotion)
    import os

    assert os.path.isdir(os.path.join(root, "versions", "v000000001"))
    # nothing earlier than v0 is retained: a second rollback must refuse
    with pytest.raises(ValueError):
        rollback(root)
    # forward publishing after a rollback resumes normally
    publish(spark.range(3).withColumnRenamed("id", "k"), root, 2)
    assert latest_version(root)[1] == 2
    assert read_latest(spark, root).count() == 3


def test_publish_crash_before_flip_is_invisible_then_retryable(spark, tmp_path):
    root = str(tmp_path / "t")
    publish(spark.range(5).withColumnRenamed("id", "k"), root, 0)
    assert latest_version(root)[1] == 0

    # Simulate a writer that crashed AFTER materializing the snapshot but
    # BEFORE the pointer flip: the staged dir exists, LATEST does not move.
    stale = os.path.join(root, "versions", "v000000001")
    spark.range(3).withColumnRenamed("id", "k").write.parquet(stale)
    assert latest_version(root)[1] == 0
    assert read_latest(spark, root).count() == 5

    # Simulate a crash mid-pointer-write: a stray tmp pointer file must
    # never be interpreted as the pointer.
    with open(os.path.join(root, ".LATEST.9.tmp"), "w") as fh:
        fh.write("v000000009")
    assert latest_version(root)[1] == 0

    # The retry of v1 overwrites the orphaned staging and completes.
    publish(spark.range(7).withColumnRenamed("id", "k"), root, 1)
    assert latest_version(root)[1] == 1
    assert read_latest(spark, root).count() == 7

    # Replaying the now-committed version is a no-op (idempotent retry).
    publish(spark.range(99).withColumnRenamed("id", "k"), root, 1)
    assert read_latest(spark, root).count() == 7


def test_publish_partitioned_snapshot(spark, tmp_path):
    """publish(partition_by=...) writes key=value subdirectories inside
    the version dir, the pointer flip and replay-idempotence semantics
    are unchanged, readers see the partition column back, and a
    partition-filtered read of the published snapshot prunes to the
    matching subdirectory (the layout the ANN compaction relies on)."""
    import glob
    import os

    from pyspark.sql import functions as F

    root = str(tmp_path / "p")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("part")
    )
    vdir = publish(df.repartition("part"), root, 1, partition_by=["part"])
    assert latest_version(root)[1] == 1
    parts = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(vdir, "part=*"))
    )
    assert parts == ["part=0", "part=1", "part=2", "part=3"]
    back = read_latest(spark, root)
    assert back.count() == 100
    assert set(back.columns) == {"k", "part"}
    # pruning: a partition predicate on the published snapshot scans one dir
    plan = (
        back.filter(F.col("part") == 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "part=2" in plan or "PartitionFilters" in plan
    assert back.filter(F.col("part") == 2).count() == 25
    # replay of the committed version is still a no-op
    publish(spark.range(3).select(F.col("id").alias("k"), F.lit(0).alias("part")),
            root, 1, partition_by=["part"])
    assert read_latest(spark, root).count() == 100


def test_publish_replay_of_pruned_version_returns_live_snapshot(spark, tmp_path):
    """Replaying a version that retention has already pruned must hand
    back the LIVE snapshot directory, never a dangling path."""
    import os

    root = str(tmp_path / "r")
    for v in (1, 2, 3):
        publish(
            spark.range(v * 10).withColumnRenamed("id", "k"), root, v, keep=2
        )
    assert latest_version(root)[1] == 3
    assert not os.path.isdir(os.path.join(root, "versions", "v000000001"))
    got = publish(spark.range(5).withColumnRenamed("id", "k"), root, 1, keep=2)
    assert os.path.isdir(got)
    assert got == latest_version(root)[0]
    assert read_latest(spark, root).count() == 30

"""Append-mode snapshot commits: O(delta) write volume, cumulative reads,
time travel, and crash-rollback over segment manifests."""

import os

from webindex_spark.sources.snapshots import SnapshotTable


def _files(root):
    out = {}
    for d, _dirs, fs in os.walk(root):
        for f in fs:
            p = os.path.join(d, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


def test_append_commits_are_delta_sized_and_cumulative(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "seen")
    s1 = t.commit(spark.range(0, 100).selectExpr("CAST(id AS STRING) AS uri"))
    before = _files(t._snap_dir(s1))

    s2 = t.commit(
        spark.range(100, 130).selectExpr("CAST(id AS STRING) AS uri"),
        mode="append",
    )
    # the parent segment is immutable — untouched by the append commit
    assert _files(t._snap_dir(s1)) == before
    # the new segment holds ONLY the delta rows (O(delta) write volume)
    assert spark.read.parquet(t._snap_dir(s2)).count() == 30
    # the table view is cumulative
    assert t.read(spark).count() == 130
    assert t.manifest(s2)["segments"] == ["snap-00001", "snap-00002"]

    s3 = t.commit(
        spark.range(130, 131).selectExpr("CAST(id AS STRING) AS uri"),
        mode="append",
    )
    assert t.read(spark).count() == 131
    # time travel reads each snapshot's own segment set
    assert t.read(spark, s1).count() == 100
    assert t.read(spark, s2).count() == 130
    # rollback (crash simulation) re-exposes the older cumulative view
    t.rollback(s2)
    assert t.read(spark).count() == 130
    # a full commit after rollback resets the segment chain
    s4 = t.commit(spark.range(0, 7).selectExpr("CAST(id AS STRING) AS uri"))
    assert t.read(spark).count() == 7
    assert t.manifest(s4)["segments"] == [f"snap-{s4:05d}"]
    assert s4 == s3  # id sequence continues from the rolled-back head

"""Snapshot-committed parquet tables — the engine's checkpoint substrate.

The north rule requires frontier state, dedup filters, and per-partition
lineage/metrics to "checkpoint to Iceberg snapshots so a killed run resumes
without refetching".  No Iceberg runtime jar exists in this sandbox
(pyspark 4.1.2 ships none, and there is no network for ``--packages``), so
the engine writes through this seam instead (SURVEY.md §7.3): on a real
cluster you point the same call sites at Iceberg (``df.writeTo(...)`` /
``MERGE INTO``); locally this class provides the exact transactional
properties the resume logic relies on:

  * **atomic commit**: data is fully written to an immutable
    ``snap-NNNNN`` directory plus a manifest before a single atomic
    ``os.replace`` of the HEAD pointer publishes it; a kill at ANY earlier
    point leaves HEAD on the previous snapshot (orphan dirs are ignored
    and reclaimed by the next commit attempt);
  * **snapshot isolation / time travel**: readers name a snapshot id or
    take HEAD; ids are monotonically increasing ints (≡ Iceberg
    snapshot-id / sequence-number);
  * **lineage + metrics in the manifest**: each commit records the input
    snapshots it was computed from and the engine's per-partition meter
    values (BASELINE.md's ten webindex meter names), so "which partitions
    already processed epoch E" is answerable without re-reading data —
    that is the per-partition lineage check FIXTURES.md §7 asks for.

This mirrors the role Fluo's MVCC transactions + sequenced export queue
play in the reference (PageObserver.java:72-124, IndexClient.java:250-306):
a deterministic job re-run after a crash is idempotent because its output
commit either already happened (resume skips it) or never published.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.name = name
        os.makedirs(self.dir, exist_ok=True)

    # ------------------------------------------------------------- pointers

    @property
    def _head_path(self) -> str:
        return os.path.join(self.dir, "_HEAD")

    def head(self) -> int | None:
        """Current committed snapshot id, or None for an empty table."""
        try:
            with open(self._head_path, encoding="utf-8") as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _snap_dir(self, sid: int) -> str:
        return os.path.join(self.dir, f"snap-{sid:05d}")

    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self.dir, f"manifest-{sid:05d}.json")

    # --------------------------------------------------------------- reads

    def exists(self) -> bool:
        return self.head() is not None

    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        sid = self.head() if snapshot is None else snapshot
        if sid is None:
            raise FileNotFoundError(f"table {self.name} has no committed snapshot")
        segs = self.manifest(sid).get("segments")
        if segs:
            return spark.read.parquet(*[os.path.join(self.dir, s) for s in segs])
        return spark.read.parquet(self._snap_dir(sid))

    def manifest(self, snapshot: int | None = None) -> dict:
        sid = self.head() if snapshot is None else snapshot
        with open(self._manifest_path(sid), encoding="utf-8") as f:
            return json.load(f)

    def history(self) -> list[dict]:
        out = []
        sid = self.head()
        while sid is not None:
            m = self.manifest(sid)
            out.append(m)
            sid = m.get("parent")
        return list(reversed(out))

    # -------------------------------------------------------------- commits

    def commit(
        self,
        df: DataFrame,
        *,
        epoch: int | None = None,
        lineage: dict | None = None,
        metrics: dict | None = None,
        partition_metrics: list | None = None,
        mode: str = "full",
    ) -> int:
        """Write ``df`` as the next snapshot; returns its id.

        ``mode="full"``: ``df`` is the complete table state (Iceberg
        overwrite).  ``mode="append"``: ``df`` is only the NEW rows; the
        snapshot's manifest references the parent's immutable segments
        plus the freshly-written one, so the commit cost is O(delta)
        rows, never O(table) — this is how the engine's monotone tables
        (seen, fetch_log, pages_state, fetched_images) avoid the
        quadratic write volume a full-state rewrite per epoch would cost
        (Iceberg equivalent: ``df.writeTo(t).append()``, a fast-append
        snapshot whose manifest list points at the prior manifests).

        Either way the write lands in a scratch dir first, is renamed to
        its immutable location, the manifest is written, and only then
        does the atomic HEAD replace publish the snapshot.
        """
        if mode not in ("full", "append"):
            raise ValueError(f"unknown commit mode {mode!r}")
        parent = self.head()
        sid = (parent or 0) + 1
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        target = self._snap_dir(sid)
        if os.path.exists(target):  # orphan from a killed earlier attempt
            shutil.rmtree(target)
        os.replace(tmp, target)
        own_seg = os.path.basename(target)
        if mode == "append" and parent is not None:
            parent_segs = self.manifest(parent).get(
                "segments", [os.path.basename(self._snap_dir(parent))]
            )
            segments = parent_segs + [own_seg]
        else:
            segments = [own_seg]
        man = {
            "table": self.name,
            "snapshot": sid,
            "parent": parent,
            "epoch": epoch,
            "mode": mode,
            "segments": segments,
            "lineage": lineage or {},
            "metrics": metrics or {},
            "partition_metrics": partition_metrics or [],
        }
        with open(self._manifest_path(sid), "w", encoding="utf-8") as f:
            json.dump(man, f)
        head_tmp = self._head_path + f".tmp-{uuid.uuid4().hex}"
        with open(head_tmp, "w", encoding="utf-8") as f:
            f.write(str(sid))
        os.replace(head_tmp, self._head_path)  # the commit point
        return sid

    def rollback(self, snapshot: int) -> None:
        """Move HEAD back to an earlier snapshot (crash simulation/tests)."""
        if not os.path.exists(self._snap_dir(snapshot)):
            raise FileNotFoundError(f"snapshot {snapshot} does not exist")
        head_tmp = self._head_path + f".tmp-{uuid.uuid4().hex}"
        with open(head_tmp, "w", encoding="utf-8") as f:
            f.write(str(snapshot))
        os.replace(head_tmp, self._head_path)

    def epoch_of_head(self) -> int | None:
        sid = self.head()
        return None if sid is None else self.manifest(sid).get("epoch")

    def snapshot_before_epoch(self, epoch: int) -> int | None:
        """Latest snapshot committed for an epoch strictly below ``epoch``
        (walking parents from HEAD); snapshots without an epoch tag count
        as older than any tagged one.

        This is the read-pinning a multi-table transaction needs for
        idempotent replay: a re-run of epoch/batch E must read every input
        table AS OF the pre-E state, even when a previous crashed attempt
        already pushed some table's HEAD to E (Iceberg equivalent:
        ``VERSION AS OF`` the snapshot preceding E's commit)."""
        sid = self.head()
        while sid is not None:
            m = self.manifest(sid)
            e = m.get("epoch")
            if e is None or e < epoch:
                return sid
            sid = m.get("parent")
        return None


class Catalog:
    """A directory of SnapshotTables — the engine's 'warehouse'."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.root, name)

"""S5 distributed copy stage (operators/copyjob.py vs Copy.java:46-103):
partitioned copy loop, idempotent resume, torn-write repair, per-file
failure isolation, manifest integrity."""

from __future__ import annotations

import hashlib
import os

from webindex_spark.operators.copyjob import distributed_copy, verify_copy
from webindex_spark.sources.paths import get_paths_range


def _mk_sources(tmp_path, n=6):
    src_dir = tmp_path / "src"
    os.makedirs(src_dir)
    paths = []
    for i in range(n):
        p = src_dir / f"file_{i:02d}.warc"
        p.write_bytes(os.urandom(1024 * (i + 1)) if i else b"x" * 2048)
        paths.append(str(p))
    return paths


def test_copy_manifest_and_integrity(spark, tmp_path):
    paths = _mk_sources(tmp_path)
    dest = str(tmp_path / "dest")
    manifest = distributed_copy(spark, paths, dest, parallelism=3)
    rows = {r["src"]: r for r in manifest.collect()}
    assert len(rows) == len(paths)
    for src, r in rows.items():
        assert r["status"] == "copied"
        with open(src, "rb") as f:
            data = f.read()
        assert r["bytes"] == len(data)
        assert r["sha256"] == hashlib.sha256(data).hexdigest()
        with open(r["dest"], "rb") as f:
            assert f.read() == data
    # the distributed verify sweep finds nothing wrong
    assert verify_copy(spark, manifest).count() == 0


def test_copy_resume_skips_and_repairs(spark, tmp_path):
    paths = _mk_sources(tmp_path, n=4)
    dest = str(tmp_path / "dest")
    first = {r["src"]: r for r in
             distributed_copy(spark, paths, dest).collect()}
    assert all(r["status"] == "copied" for r in first.values())

    # simulate a killed run: one destination torn (truncated), one
    # source file brand new, the rest intact
    torn = first[paths[1]]["dest"]
    with open(torn, "wb") as f:
        f.write(b"partial")
    extra = tmp_path / "src" / "file_99.warc"
    extra.write_bytes(b"late arrival" * 100)

    again = {r["src"]: r for r in
             distributed_copy(spark, paths + [str(extra)], dest).collect()}
    assert again[paths[1]]["status"] == "fixed"
    assert again[str(extra)]["status"] == "copied"
    intact = [p for p in paths if p != paths[1]]
    assert all(again[p]["status"] == "skipped" for p in intact)
    # repaired file is byte-identical to its source again
    with open(paths[1], "rb") as f:
        want = f.read()
    with open(torn, "rb") as f:
        assert f.read() == want


def test_copy_failure_isolation(spark, tmp_path):
    paths = _mk_sources(tmp_path, n=3)
    missing = str(tmp_path / "src" / "never_existed.warc")
    dest = str(tmp_path / "dest")
    rows = {r["src"]: r for r in
            distributed_copy(spark, paths + [missing], dest).collect()}
    assert rows[missing]["status"].startswith("failed")
    assert all(rows[p]["status"] == "copied" for p in paths)
    # no temp debris left behind
    assert not [f for f in os.listdir(dest) if ".tmp-" in f]


def test_copy_from_paths_range(spark, tmp_path):
    """The reference wiring: Copy.java consumes IndexEnv.getPathsRange —
    our paths_range feeds distributed_copy the same way."""
    paths = _mk_sources(tmp_path, n=5)
    listing = tmp_path / "paths.txt"
    listing.write_text("\n".join(paths))
    sel = get_paths_range(str(listing), "1-3")
    dest = str(tmp_path / "dest")
    manifest = distributed_copy(spark, sel, dest)
    got = sorted(os.path.basename(r["dest"]) for r in manifest.collect())
    assert got == ["file_01.warc", "file_02.warc", "file_03.warc"]


def test_copy_duplicate_basenames_fail_fast(spark, tmp_path):
    """Two sources sharing a basename would race on one destination
    (last writer wins with both manifest rows claiming success) — the
    job must refuse before launching."""
    import pytest

    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    os.makedirs(a_dir)
    os.makedirs(b_dir)
    (a_dir / "part-00000.warc").write_bytes(b"alpha")
    (b_dir / "part-00000.warc").write_bytes(b"bravo")
    dest = str(tmp_path / "dest")
    with pytest.raises(ValueError, match="part-00000.warc"):
        distributed_copy(
            spark,
            [str(a_dir / "part-00000.warc"), str(b_dir / "part-00000.warc")],
            dest,
        )


def test_copy_resume_detects_same_size_corruption(spark, tmp_path):
    """A same-size-but-different-content destination must not be
    'skipped' with a self-certifying manifest hash: the skip path hashes
    the SOURCE, detects the mismatch, and recopies as 'fixed'."""
    paths = _mk_sources(tmp_path, n=2)
    dest = str(tmp_path / "dest")
    distributed_copy(spark, paths, dest).collect()
    victim = os.path.join(dest, os.path.basename(paths[1]))
    size = os.path.getsize(victim)
    with open(victim, "wb") as f:  # same size, different bytes
        f.write(b"\xff" * size)
    manifest = distributed_copy(spark, paths, dest)
    rows = {os.path.basename(r["src"]): r for r in manifest.collect()}
    assert rows[os.path.basename(paths[1])]["status"] == "fixed"
    assert rows[os.path.basename(paths[0])]["status"] == "skipped"
    with open(paths[1], "rb") as f:
        want = f.read()
    with open(victim, "rb") as f:
        assert f.read() == want
    # manifest hashes now verify clean end to end
    assert verify_copy(spark, manifest).count() == 0

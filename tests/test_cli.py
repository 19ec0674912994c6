"""The two dev CLIs (TestParser.java / Configure.java analogs)."""

from __future__ import annotations

import os

import pytest

from webindex_spark import cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_test_parser_counts_pages_and_errors(spark, tmp_path, monkeypatch):
    """paths-file + range through the production WAT pipeline; parse
    errors are counted, never fatal (buildPageIgnoreErrors semantics)."""
    paths = tmp_path / "cc.paths"
    paths.write_text("tests/golden/wat.warc\ntests/golden/wat-18.warc\n")
    # reuse the test session instead of building one per invocation
    monkeypatch.setattr(
        "webindex_spark.session.get_spark", lambda *a, **k: spark
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    out = cli.test_parser(str(paths), "0-1", base_dir=REPO)
    assert out["files"] == 2
    assert out["pages"] > 0
    assert out["parse_errors"] >= 0

    with pytest.raises(SystemExit):
        cli.test_parser(str(paths), "5-9", base_dir=REPO)  # empty range slice


def test_configure_inits_table_and_appends_props(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(
        "webindex_spark.session.get_spark", lambda *a, **k: spark
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    props = tmp_path / "app.props"
    props.write_text("existing.key = 1\n")
    cli.configure(
        os.path.join(REPO, "conf", "examples", "webindex.yml"),
        str(props), str(tmp_path / "cat"),
    )
    text = props.read_text()
    assert text.startswith("existing.key = 1\n")  # APPEND, not overwrite
    assert "webindex.app = webindex" in text
    assert "webindex.indexTable = webindex_search" in text
    from webindex_spark.sources.snapshots import Catalog

    t = Catalog(str(tmp_path / "cat")).table("webindex_search")
    assert t.exists()
    assert len(t.manifest()["splits"]) > 0  # pre-split points recorded

    with pytest.raises(SystemExit):
        cli.configure(
            os.path.join(REPO, "conf", "examples", "webindex.yml"),
            str(tmp_path / "missing.props"), str(tmp_path / "cat2"),
        )

"""The spark-submit --py-files artifact (tools/make_submit_zip.py) must
be self-contained: a python process whose ONLY path entry for the
engine is the zip (repo root removed from sys.path) imports the package
and its data-file-dependent modules — exactly what executors do under
``--py-files`` via zipimport."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_builds_and_imports_standalone(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_submit_zip import build

    out = str(tmp_path / "webindex_spark.zip")
    names = build(out)
    # source plus the vendored data files the modules read at import
    assert "webindex_spark/functions/public_suffix_list.dat" in names
    assert "webindex_spark/resources/accumulo_default_splits.dat" in names
    assert not any("__pycache__" in n for n in names)
    assert not any(n.startswith(("tests/", "tools/")) for n in names)

    probe = (
        "import sys\n"
        # drop every path that could resolve the package from the repo
        f"sys.path = [p for p in sys.path if p not in ('', {REPO!r})]\n"
        f"sys.path.insert(0, {out!r})\n"
        "import webindex_spark\n"
        f"assert webindex_spark.__file__.startswith({out!r}), webindex_spark.__file__\n"
        # psl reads the vendored .dat via importlib.resources; urlnorm
        # and lexicoder are the hot import chain every executor needs
        "from webindex_spark.functions import psl, urlnorm, lexicoder\n"
        "assert psl.public_suffix('www.example.co.uk') == 'co.uk'\n"
        "assert psl.top_private_domain('www.example.co.uk') == 'example.co.uk'\n"
        "print('ZIP_OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ZIP_OK" in r.stdout

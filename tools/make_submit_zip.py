"""Build the ``--py-files`` artifact for cluster submission.

The engine ships to a real multi-executor cluster exactly the way the
north rule specifies: one zip of the ``webindex_spark`` package handed
to ``spark-submit --py-files`` (no install step on executors, no wheel
build — python's zipimport loads the package on every worker).

Usage:
    python tools/make_submit_zip.py [out.zip]      # default dist/webindex_spark.zip

then, on the cluster:

    spark-submit \
        --master <cluster-master> \
        --py-files dist/webindex_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        your_job.py

where ``your_job.py`` does ``from webindex_spark.session import
get_spark`` and drives any operator.  tests/test_submit_zip.py proves
the zip is self-contained: a python process with ONLY the zip on
``sys.path`` (repo root removed) imports the package and its heaviest
modules.

The zip contains source only — no tests, no tools, no caches — so it
stays small enough to broadcast to 1000 executors without staging cost.
Vendored data files the package reads at runtime (the publicsuffix.org
snapshot) are included explicitly.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "webindex_spark"
KEEP_SUFFIXES = (".py", ".dat", ".txt", ".yml")
SKIP_PARTS = ("__pycache__",)


def build(out_path: str) -> list[str]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    names: list[str] = []
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = sorted(
                d for d in dirnames if d not in SKIP_PARTS
            )
            for fn in sorted(filenames):
                if not fn.endswith(KEEP_SUFFIXES):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, root)
                zf.write(full, arc)
                names.append(arc)
    return names


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/webindex_spark.zip"
    names = build(out)
    size = os.path.getsize(out)
    print(f"{out}: {len(names)} files, {size / 1024:.0f} KiB")


if __name__ == "__main__":
    main()

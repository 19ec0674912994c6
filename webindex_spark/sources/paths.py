"""Common Crawl paths-file range select (SURVEY.md §2.1 S6).

The reference's ``IndexEnv.getPathsRange`` (IndexEnv.java:247-272) picks an
inclusive 0-based line range ``"start-end"`` out of the WAT paths listing
(e.g. ``wat.paths`` from a Common Crawl segment) to shard a copy/index run.
Same semantics here, driver-side (a paths file is a few MB of metadata —
the DATA the paths point at is what Spark parallelizes over, via
``sources.warc.read_wat``).
"""

from __future__ import annotations

import itertools
import os


def get_paths_range(cc_paths: str, range_str: str) -> list[str]:
    """Lines ``start..end`` (inclusive, 0-based) of ``cc_paths``.

    Mirrors the reference's accept/reject behavior: missing file, a range
    that Integer.parseInt can't parse, or start > end are errors (we raise
    instead of System.exit); a range past EOF just returns fewer lines
    (Stream.skip/limit semantics).
    """
    if not os.path.exists(cc_paths):
        raise FileNotFoundError(f"CC paths file {cc_paths} does not exist")
    try:
        start_s, end_s = range_str.split("-")[0], range_str.split("-")[1]
        start, end = int(start_s), int(end_s)
    except (IndexError, ValueError) as e:
        raise ValueError(f"Invalid range: {range_str}") from e
    if start > end:
        raise ValueError(f"Invalid range: {range_str}")
    with open(cc_paths, encoding="utf-8") as f:
        lines = (line.rstrip("\n") for line in f)
        return list(itertools.islice(lines, start, end + 1))

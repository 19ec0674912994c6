"""Iceberg dry-run: the exact statement each snapshot-seam commit site
issues on a real cluster.

No Iceberg runtime jar exists in this sandbox, so the engine checkpoints
through ``sources/snapshots.py`` (same transactional contract: atomic
publish, snapshot ids, lineage manifests, fast-append).  This module is
the executable form of the docs/PLANS.md "Iceberg mapping" table: for
every table ``operators/frontier.run_epoch`` commits, it renders the
statement a real deployment runs — append tables as ``writeTo().append()``
DataFrame calls, merge tables as the full ``MERGE INTO`` SQL with the
engine's actual key columns and zero-drop/delete clauses.

Kept in sync three ways (tests/test_iceberg_sql.py):
  * the table set here == frontier.TABLES (a commit site can't be added
    without mapping it);
  * append-vs-merge here == the mode run_epoch actually commits with;
  * the rendered statements match the checked-in golden
    (tests/golden/iceberg_epoch_sql.txt) and appear verbatim in
    docs/PLANS.md, so docs, code and golden cannot drift apart.
"""

from __future__ import annotations

# tables run_epoch commits in append mode (monotone logs: O(delta) fast-
# append snapshots) -> their Iceberg write and partition layout
APPEND_TABLES: dict[str, dict] = {
    "seen": {
        "df": "newly_seen",
        "partitioned_by": "bucket(N, host), salt",
        "note": "appends land in the buckets the fused anti-join reuses",
    },
    "fetch_log": {"df": "fetch_log", "partitioned_by": "epoch"},
    "pages_state": {"df": "new_pages", "partitioned_by": "epoch"},
    "fetched_images": {"df": "fetched_images", "partitioned_by": "epoch"},
}

# the mutating tables' MERGE INTO restatements (merge-on-read deltas —
# the local seam commits the same shape via mode="merge" snapshots)
MERGE_TABLES: dict[str, str] = {
    "bloom": (
        "MERGE INTO {cat}.bloom t USING updates u ON t.pid = u.pid "
        "WHEN MATCHED THEN UPDATE SET words = u.words "
        "WHEN NOT MATCHED THEN INSERT *"
    ),
    "frontier": (
        "MERGE INTO {cat}.frontier t USING changes c ON t.uri = c.uri "
        "WHEN MATCHED AND c.consumed THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET priority = greatest(t.priority, c.priority) "
        "WHEN NOT MATCHED THEN INSERT *"
    ),
    "uri_counts": (
        "MERGE INTO {cat}.uri_counts t USING deltas d ON t.uri = d.uri "
        "WHEN MATCHED AND t.links_to + d.links_to = 0 AND t.docs + d.docs = 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET links_to = t.links_to + d.links_to, "
        "docs = t.docs + d.docs "
        "WHEN NOT MATCHED THEN INSERT *"
    ),
    "domain_counts": (
        "MERGE INTO {cat}.domain_counts t USING deltas d ON t.rev_domain = d.rev_domain "
        "WHEN MATCHED AND t.pagecount + d.d_count = 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET pagecount = t.pagecount + d.d_count "
        "WHEN NOT MATCHED THEN INSERT *"
    ),
    "index_rows": (
        "MERGE INTO {cat}.index_rows t USING deltas d "
        "ON t.row = d.row AND t.cf = d.cf AND t.cq = d.cq "
        "WHEN MATCHED AND d.op = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = d.v "
        "WHEN NOT MATCHED AND d.op != 'del' THEN INSERT *"
    ),
    "index_pages": (
        "MERGE INTO {cat}.index_pages t USING deltas d ON t.uri = d.uri "
        "WHEN MATCHED AND d.op = 'delete' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND d.op != 'delete' THEN INSERT *"
    ),
}


# what the LOCAL snapshot seam actually commits per epoch (asserted
# against run_epoch's real manifests in tests/test_iceberg_sql.py):
# append tables fast-append; every mutating table INCLUDING the
# bloom/cuckoo filter commits mode="merge" (upsert rows + delete keys,
# merge-on-read — the executable local form of the MERGE INTO statements
# above).  The filter's merge carries only the shards the epoch's uris
# touched (seen.bloom_insert delta_only), matching its MERGE INTO on pid.
LOCAL_COMMIT_MODES: dict[str, str] = {
    **{t: "append" for t in APPEND_TABLES},
    **{t: "merge" for t in MERGE_TABLES},
}


def append_statement(table: str, cat: str = "cat") -> str:
    meta = APPEND_TABLES[table]
    return f"{meta['df']}.writeTo(\"{cat}.{table}\").append()"


def merge_statement(table: str, cat: str = "cat") -> str:
    return MERGE_TABLES[table].format(cat=cat)


def epoch_statements(cat: str = "cat") -> dict[str, str]:
    """table -> the one Iceberg statement its per-epoch commit maps to
    (the dry-run of run_epoch's outputs dict, frontier.py)."""
    out = {t: append_statement(t, cat) for t in APPEND_TABLES}
    out.update({t: merge_statement(t, cat) for t in MERGE_TABLES})
    return out


def render(cat: str = "cat") -> str:
    """Human-readable dry-run block (the golden file's exact content)."""
    lines = ["# Iceberg statements per run_epoch commit site (dry-run)", ""]
    for table, stmt in sorted(epoch_statements(cat).items()):
        mode = "append" if table in APPEND_TABLES else "merge"
        lines.append(
            f"[{table}] mode={mode} local_commit={LOCAL_COMMIT_MODES[table]}"
        )
        if table in APPEND_TABLES:
            lines.append(
                f"  layout: PARTITIONED BY ({APPEND_TABLES[table]['partitioned_by']})"
            )
        lines.append(f"  {stmt}")
        lines.append("")
    return "\n".join(lines)

"""Streaming incremental index maintenance — the Structured Streaming
restatement of the reference's ``load-hdfs -> Fluo observer cascade``
(SURVEY.md §3.2): page-JSON files land in a directory, each micro-batch
runs the SAME delta engine the snapshot loop uses (operators/delta.py:
diff -> UriInfo combine -> domain ±1 -> delete-old-write-new export), and
every state table commits a snapshot tagged with the micro-batch id.

Exactly-once state maintenance comes from the same two pieces the batch
loop uses, arranged the Structured Streaming way:

  * the file source's checkpoint guarantees each input file is assigned
    to exactly one ``batch_id`` and replayed with the same id on restart;
  * ``foreachBatch`` + the snapshot tables' idempotent commit check
    (skip when the table's committed epoch >= batch_id) make the replay
    of a crashed micro-batch a no-op for tables that already published —
    the streaming twin of run_epoch's crash-resume discipline.

The invariant the tests lock: after any sequence of micro-batches, the
streamed state equals a from-scratch batch build over all pages seen so
far (the reference's IndexIT equivalence, continuously).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from webindex_spark.sources.pages_json import GSON_PAGE_SCHEMA, gson_pages_transform
from webindex_spark.sources.snapshots import Catalog

STREAM_TABLES = ("index_pages", "uri_counts", "domain_counts", "index_rows")


def _empty_state(spark: SparkSession, cat: Catalog) -> None:
    from webindex_spark.operators.frontier import URI_COUNTS_SCHEMA, INDEX_ROW_SCHEMA
    from webindex_spark.operators.index_batch import PAGE_SCHEMA

    if cat.table("index_pages").exists():
        return
    cat.table("index_pages").commit(spark.createDataFrame([], PAGE_SCHEMA), epoch=-1)
    cat.table("uri_counts").commit(
        spark.createDataFrame([], URI_COUNTS_SCHEMA), epoch=-1
    )
    cat.table("domain_counts").commit(
        spark.createDataFrame([], "rev_domain string, pagecount long"), epoch=-1
    )
    cat.table("index_rows").commit(
        spark.createDataFrame([], INDEX_ROW_SCHEMA), epoch=-1
    )


def apply_page_batch(spark: SparkSession, cat: Catalog, pages: DataFrame,
                     batch_id: int) -> None:
    """One micro-batch through the incremental delta engine, committed as
    snapshot epoch ``batch_id`` (idempotent re-entry per table)."""
    from webindex_spark.operators import delta as delta_ops

    def _epoch(t):
        e = cat.table(t).epoch_of_head()
        return -(10 ** 9) if e is None else e  # NB: epoch 0 is falsy

    if all(_epoch(t) >= batch_id for t in STREAM_TABLES):
        return  # crashed-after-commit replay: nothing to do

    # Read every input pinned at the last snapshot BELOW batch_id, never
    # HEAD: if a crash landed between the four per-table commits, some
    # HEADs are already at batch_id (e.g. index_pages committed, then
    # death before uri_counts).  Reading that HEAD would diff the replayed
    # batch against already-updated state, yield empty deltas, and commit
    # stale tables as batch_id — silently losing the batch.  Pinning makes
    # the replay recompute the SAME outputs the crashed attempt did, and
    # the per-table epoch check turns its re-commit into skip-or-publish.
    def _read_before(t: str) -> DataFrame:
        tbl = cat.table(t)
        sid = tbl.snapshot_before_epoch(batch_id)
        if sid is None:
            raise RuntimeError(
                f"table {t} has no snapshot below batch {batch_id}"
            )
        return tbl.read(spark, sid)

    deltas = pages.withColumn("op", F.lit("put"))
    index_pages_prev = _read_before("index_pages")
    uri_counts_prev = _read_before("uri_counts")
    domain_counts_prev = _read_before("domain_counts")
    index_rows_prev = _read_before("index_rows")

    index_pages_next, uri_deltas, mutations = delta_ops.diff_pages(
        index_pages_prev, deltas
    )
    uri_counts_next, changes = delta_ops.merge_uri_counts(uri_counts_prev, uri_deltas)
    changes = changes.localCheckpoint(eager=True)  # cut streaming lineage
    domain_counts_next, domain_changes = delta_ops.merge_domain_counts(
        domain_counts_prev, changes, with_changes=True
    )
    index_rows_next = delta_ops.update_index_rows(
        index_rows_prev, changes, domain_changes, mutations
    )
    outputs = {
        "index_pages": index_pages_next,
        "uri_counts": uri_counts_next,
        "domain_counts": domain_counts_next,
        "index_rows": index_rows_next,
    }
    for name, df in outputs.items():
        t = cat.table(name)
        if _epoch(name) >= batch_id:
            continue
        t.commit(df, epoch=batch_id, lineage={"stream_batch": batch_id})


def start_page_stream(spark: SparkSession, input_dir: str, cat: Catalog,
                      checkpoint_dir: str, available_now: bool = True):
    """readStream(json lines) -> foreachBatch(delta engine) -> snapshots.

    ``available_now=True`` drains everything currently in ``input_dir``
    and stops (the batch-replay mode tests use); ``False`` runs the
    continuous micro-batch loop.
    """
    _empty_state(spark, cat)
    raw = spark.readStream.schema(GSON_PAGE_SCHEMA).json(input_dir)
    pages = gson_pages_transform(raw)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_page_batch(spark, cat, batch_df, batch_id)

    writer = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Line-JSON page source parity + Structured Streaming rollup."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from webindex_spark.functions import pagejson
from webindex_spark.operators import index_batch
from webindex_spark.sources import pages_json
from tests.test_index_batch import make_set1_pages


def test_read_pages_json_roundtrip(spark, tmp_path):
    """Render set1 pages to Gson-style line JSON (the 5-pages.txt format),
    read back through the source, and verify the batch index still matches
    the golden byte-for-byte."""
    pages = make_set1_pages(spark)
    lines = []
    for r in pages.collect():
        links = [(l["url"], l["uri"], l["anchor_text"]) for l in r["outbound_links"]]
        lines.append(pagejson.page_json(r["url"], r["uri"], links))
    p = tmp_path / "pages.json"
    p.write_text("\n".join(lines))

    df = pages_json.read_pages_json(spark, str(p))
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in pages.schema.fields
    ]
    a = {tuple(map(str, row)) for row in pages.collect()}
    b = {tuple(map(str, row)) for row in df.collect()}
    assert a == b

    uc, dc, ir = index_batch.build_index(df, cache=False)
    rows = index_batch.sorted_index_rows(ir).collect()
    got = [pagejson.render_kv_line(r["row"], r["cf"], r["cq"], r["v"]) for r in rows]
    with open("tests/golden/set1-accumulo-data.txt", encoding="utf-8") as f:
        expected = [line.rstrip("\n") for line in f if line.strip()]
    assert got == expected


def test_streaming_running_counts_stateful(spark, tmp_path):
    """applyInPandasWithState counter across two micro-batches: state must
    carry over (the streaming twin of the UriInfo combine queue)."""
    from webindex_spark.streaming import event_stream

    src = tmp_path / "ev2"
    os.makedirs(src)

    def write_batch(name, start, n):
        rows = [
            {"event_id": start + i, "ts": "2026-01-01T00:00:00Z",
             "user_id": i, "event_type": ["click", "view"][i % 2],
             "value": 1.0, "props": "{}"}
            for i in range(n)
        ]
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    write_batch("b1.json", 0, 10)
    stream = (
        spark.readStream.schema(event_stream.EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1).json(str(src))
    )
    ckpt = str(tmp_path / "ckpt")
    got = {}

    def sink(df, _epoch):
        for r in df.collect():
            got[r["event_type"]] = r["total"]

    def run_once():
        q = (
            event_stream.running_counts(stream)
            .writeStream.foreachBatch(sink).outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    assert got == {"click": 5, "view": 5}
    write_batch("b2.json", 100, 6)
    run_once()  # restart from checkpoint — state carries over
    # batch1: 5 click + 5 view; batch2: 3 click + 3 view => totals carry
    assert got == {"click": 8, "view": 8}


def test_streaming_windowed_rollup(spark, tmp_path):
    """File-source stream, availableNow trigger, watermark + window agg;
    result must equal the equivalent batch aggregation."""
    from webindex_spark.streaming import event_stream

    src = tmp_path / "events"
    os.makedirs(src)
    rows = [
        {"event_id": i, "ts": f"2026-01-01T0{i % 4}:1{i % 6}:00Z",
         "user_id": i % 3, "event_type": ["click", "view"][i % 2],
         "value": float(i), "props": "{}"}
        for i in range(24)
    ]
    (src / "part1.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema(event_stream.EVENT_SCHEMA)
        .json(str(src))
    )
    out = event_stream.windowed_rollup(stream, window="1 hour", watermark="4 hours")
    # complete mode: append would hold rows until the watermark advances in
    # a LATER micro-batch, and availableNow runs exactly one
    q = (
        out.writeStream.format("memory").queryName("rollup_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from rollup_test").collect()
    }
    batch = (
        spark.read.schema(event_stream.EVENT_SCHEMA).json(str(src))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    expected = {
        (str(r["w"]["start"]), r["event_type"]): (r["n"], r["s"])
        for r in batch.collect()
    }
    assert got == expected and len(got) >= 4

"""WAT/WARC archive source (SURVEY.md §2.1 S1-S3).

Re-implements, against the public WARC/1.0 format and the Common Crawl WAT
JSON layout, what the reference gets from webarchive-commons +
ArchiveUtil.buildPage
(/root/reference/modules/data/src/main/java/webindex/data/util/ArchiveUtil.java:35-115):

  * mimetype gate: only ``application/json`` records produce pages (P7);
  * page URL = WARC-Target-URI, validated/canonicalized (rejects -> empty);
  * crawlDate = WARC-Date header string, kept opaque;
  * outbound links from Envelope > Payload-Metadata >
    HTTP-Response-Metadata > HTML-Metadata > Links[], keeping only
    ``path == "A@/href"`` entries (P4), anchor = text | title | "";
  * intra-domain links dropped (P3), TreeSet dedup/order semantics;
  * title from HTML-Metadata.Head.Title, server from Headers.Server.

Spark integration (the reference's one-ArchiveReader-per-file scan,
WARCFileInputFormat.java, restated): ``read_wat`` loads whole files via
the binaryFile source and flattens records inside ``mapInPandas`` — one
Arrow batch of pages out per archive, executors decompress in parallel.
WAT files are non-splittable (per-record gzip members), exactly why the
reference repartitions 50x after parse (IndexUtil.java:68-70); we expose
``repartition_factor`` for the same move.
"""

from __future__ import annotations

import gzip
import io
import json
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from webindex_spark.functions import urlnorm
from webindex_spark.operators.index_batch import PAGE_SCHEMA


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per WARC record. Accepts plain or gzip (whole-file
    or concatenated per-record members, the Common Crawl layout)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    buf = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines (spec says CRLF; tolerate bare LF,
        # which the reference's own fixtures use)
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n or not data[pos:pos + 5] == b"WARC/":
            break
        crlf_end = data.find(b"\r\n\r\n", pos)
        lf_end = data.find(b"\n\n", pos)
        if crlf_end != -1 and (lf_end == -1 or crlf_end < lf_end):
            head_end, sep = crlf_end, 4
        elif lf_end != -1:
            head_end, sep = lf_end, 2
        else:
            break
        header_block = data[pos:head_end].decode("utf-8", "replace")
        headers: dict[str, str] = {}
        for line in header_block.splitlines()[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        payload = bytes(buf[head_end + sep:head_end + sep + length])
        pos = head_end + sep + length
        yield headers, payload


class WatParseError(ValueError):
    """Invalid JSON in an application/json record (ArchiveUtil raises
    ParseException there; everything else degrades to an empty page)."""


def build_page(headers: dict, payload: bytes) -> dict | None:
    """ArchiveUtil.buildPage semantics; None == Page.EMPTY.

    Gate parity (ArchiveUtil.java:36,68): the record-level gate is a FULL
    mimetype equalsIgnoreCase — no ';parameter' splitting — while link
    extraction additionally requires the EXACT case-sensitive string
    "application/json" (the reference's inner check uses equals, so a
    record typed "Application/JSON" yields title/server but no links).
    """
    ctype = headers.get("content-type", "")
    if ctype.lower() != "application/json":
        return None
    extract_links = ctype == "application/json"
    if not payload:
        return None
    try:
        doc = json.loads(payload.decode("utf-8", "replace"))
    except (ValueError, UnicodeDecodeError) as e:
        raise WatParseError(str(e)) from e

    raw_url = headers.get("warc-target-uri", "")
    parsed = urlnorm.parse_one(raw_url)
    if parsed is None:
        return None
    page = {
        "url": parsed["url_norm"],
        "uri": parsed["uri"],
        "crawl_date": headers.get("warc-date"),
        "server": None,
        "title": None,
        "outbound_links": [],
    }
    meta = doc.get("Envelope", {}).get("Payload-Metadata", {}).get(
        "HTTP-Response-Metadata", {}
    )
    if isinstance(meta, dict):
        html = meta.get("HTML-Metadata", {})
        links = html.get("Links") if isinstance(html, dict) else None
        seen = {}
        if not extract_links:
            links = None
        if isinstance(links, list):
            for link in links:
                if not isinstance(link, dict):
                    continue
                if link.get("path") != "A@/href" or "url" not in link:
                    continue
                anchor = link.get("text", link.get("title", ""))
                if not isinstance(anchor, str):
                    anchor = str(anchor)
                lp = urlnorm.parse_one(str(link["url"]))
                if lp is None or lp["domain"] == parsed["domain"]:
                    continue  # invalid or intra-domain (ArchiveUtil.java:84)
                key = (lp["uri"], lp["url_norm"])
                if key not in seen:  # TreeSet.add keeps the first
                    seen[key] = {
                        "url": lp["url_norm"], "uri": lp["uri"], "anchor_text": anchor
                    }
        page["outbound_links"] = [seen[k] for k in sorted(seen)]
        head = html.get("Head") if isinstance(html, dict) else None
        if isinstance(head, dict) and isinstance(head.get("Title"), str):
            page["title"] = head["Title"]
        hdrs = meta.get("Headers")
        if isinstance(hdrs, dict) and isinstance(hdrs.get("Server"), str):
            page["server"] = hdrs["Server"]
    return page


WAT_OUT_SCHEMA = T.StructType(
    PAGE_SCHEMA.fields
    + [
        T.StructField("source_file", T.StringType()),
        T.StructField("parse_error", T.BooleanType()),
    ]
)


def read_wat(
    spark: SparkSession, path: str | list[str], repartition_factor: int = 0
) -> DataFrame:
    """Archive files -> pages DataFrame (empty/non-page records dropped,
    JSON parse errors surfaced as rows with parse_error=true).  ``path``
    is a file/glob/directory or an explicit list of them (the TestParser
    CLI passes the resolved paths-range list)."""

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for headers, payload in iter_warc_records(bytes(content)):
                    try:
                        page = build_page(headers, payload)
                    except WatParseError:
                        rows.append(
                            {f.name: None for f in PAGE_SCHEMA.fields}
                            | {"source_file": fpath, "parse_error": True}
                        )
                        continue
                    if page is not None:
                        rows.append(page | {"source_file": fpath, "parse_error": False})
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAT_OUT_SCHEMA.fields]
            )

    paths = path if isinstance(path, list) else [path]
    files = spark.read.format("binaryFile").load(paths).select("path", "content")
    pages = files.mapInPandas(parse_files, schema=WAT_OUT_SCHEMA)
    if repartition_factor:
        n_files = files.count()
        pages = pages.repartition(repartition_factor * max(n_files, 1))
    return pages

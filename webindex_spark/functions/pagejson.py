"""Gson-canonical Page JSON serializer (F11 in SURVEY.md §2.8).

The reference serializes ``Page`` with a default Gson instance
(/root/reference/modules/data/src/main/java/webindex/data/spark/IndexUtil.java:54,123)
and its goldens depend byte-for-byte on Gson's conventions:

* fields in declaration order: url, uri, numInbound, numOutbound,
  crawlDate, server, title, outboundLinks (Page.java:32-41);
* null fields omitted entirely;
* HTML-sensitive chars escaped as unicode escapes: ``<`` ``>`` ``&`` ``=``
  ``'`` -> ``\\u003c \\u003e \\u0026 \\u003d \\u0027`` (visible in golden
  data accumulo-data.txt:10 and 5-pages.txt);
* no whitespace; links sorted by (uri, url) because outboundLinks is a
  ``TreeSet<Link>`` (Page.java:39-41, Link.java:83-91), each link rendered
  {url, uri, anchorText} in that order.

Spark's ``to_json`` cannot reproduce this (different escaping, keeps
nulls), so this is a small pure-python kernel applied via pandas UDF only
at golden-render time; the engine itself keeps pages columnar.
"""

from __future__ import annotations

_GSON_HTML = {"<": "\\u003c", ">": "\\u003e", "&": "\\u0026", "=": "\\u003d", "'": "\\u0027"}
_JSON_CTRL = {"\\": "\\\\", '"': '\\"', "\b": "\\b", "\f": "\\f", "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def gson_escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in _JSON_CTRL:
            out.append(_JSON_CTRL[ch])
        elif ch in _GSON_HTML:
            out.append(_GSON_HTML[ch])
        elif ord(ch) < 0x20 or ch in ("\u2028", "\u2029"):
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def _q(s: str) -> str:
    return '"' + gson_escape(s) + '"'


def link_json(url: str, uri: str, anchor_text: str) -> str:
    parts = []
    if url is not None:
        parts.append('"url":' + _q(url))
    if uri is not None:
        parts.append('"uri":' + _q(uri))
    if anchor_text is not None:
        parts.append('"anchorText":' + _q(anchor_text))
    return "{" + ",".join(parts) + "}"


def page_json(
    url: str | None,
    uri: str | None,
    outbound_links,
    num_inbound: int | None = None,
    crawl_date: str | None = None,
    server: str | None = None,
    title: str | None = None,
) -> str:
    """Render one Page exactly as the reference's Gson does.

    ``outbound_links`` is an iterable of (url, uri, anchor_text) tuples; it
    is sorted here by (uri, url) to mirror the TreeSet ordering, and
    de-duplicated by (url, uri) (Link equality, Link.java:67-74).
    ``numOutbound`` is always rendered (non-null Long default 0,
    Page.java:35); ``numInbound`` only when set.
    """
    links = outbound_links if outbound_links is not None else []
    seen = set()
    uniq = []
    for l_url, l_uri, l_anchor in links:
        k = (l_url, l_uri)
        if k not in seen:
            seen.add(k)
            uniq.append((l_url, l_uri, l_anchor))
    uniq.sort(key=lambda t: (t[1], t[0]))

    parts = []
    if url is not None:
        parts.append('"url":' + _q(url))
    if uri is not None:
        parts.append('"uri":' + _q(uri))
    if num_inbound is not None:
        parts.append('"numInbound":' + str(int(num_inbound)))
    parts.append('"numOutbound":' + str(len(uniq)))
    if crawl_date is not None:
        parts.append('"crawlDate":' + _q(crawl_date))
    if server is not None:
        parts.append('"server":' + _q(server))
    if title is not None:
        parts.append('"title":' + _q(title))
    parts.append(
        '"outboundLinks":['
        + ",".join(link_json(u, i, a) for u, i, a in uniq)
        + "]"
    )
    return "{" + ",".join(parts) + "}"


def enc_non_ascii(b: bytes) -> str:
    """Test-side printable rendering, mirroring the reference's Hex helper
    (modules/data/src/test/java/webindex/data/spark/Hex.java:21-43):
    printable ASCII other than backslash verbatim, else ``\\xNN``.
    """
    out = []
    for x in b:
        if 32 <= x <= 126 and x != 0x5C:
            out.append(chr(x))
        else:
            out.append(f"\\x{x:02x}")
    return "".join(out)


def render_kv_line(row: str, cf: str, cq: str, value: str, sep: str = "|") -> str:
    """One golden-file line: encNonAscii(row)|cf|cq|value."""
    return sep.join(
        enc_non_ascii(x.encode("utf-8")) for x in (row, cf, cq, value)
    )

"""Kernel golden-vector tests.

Ports the assertion tables of the reference's unit tests:
  * URLTest.java:49-214 (URL parse/validate/canonicalize/ports/PSL/reverse
    host/toUri-fromUri roundtrips/isImage)
  * the lexicoder vectors implied by golden rows accumulo-data.txt:2,4,5
  * the Gson-canonical Page JSON strings embedded in accumulo-data.txt:10,12
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, strategies as st

from webindex_spark.functions import lexicoder, pagejson, psl, urlnorm

# ---------------------------------------------------------------- URL: valid


VALID_URLS = [
    "http://ab.com/",
    "https://ab.com/1/2/3",
    "https://ab.com:8080?1/2/3",
    "http://ab.com#1/2/3",
    "https://ab.com/",
    "https://h.d.ab.com/1/2/3",
    " \thttp://example.com/ \t\n\r\n",
    "http://1.2.3.4:80/test?a=b&c=d",
    "http://1.2.3.4/",
    "http://a.b.c.d.com/1/2/3/4/5",
    "http://a.b.com:281/1/2",
    "http://A.B.Com:281/a/b",
    "http://A.b.Com:281/A/b",
    "http://a.B.Com?A/b/C",
    "http://A.Be.COM",
    "http://1.2.3.4:281/1/2",
]

INVALID_URLS = [
    "ab.com",
    "ab.com/1/2/3",
    "htttp://ab.com/",
    "httpss://ab.com/",
    "http:/ab.com/",
    "http::/ab.com/",
    "http:///ab.com/",
    "hhttp://ab.com/",
    "http://a.com:/test/",
    "http://a.com:",
    "http://a.com:/test",
    "http://z.com:",
    "http://1.2.3:80/test?a=b&c=d",
    "http://1.2.3/",
    "http://com/",
    "http://a.b.c.com/bad>et",
    "http://test",
    "http://co.uk",
    "http:///example.com/",
    "http:://example.com/",
    "example.com",
    "127.0.0.1",
    "http://ab@example.com",
    "ftp://example.com",
]


@pytest.mark.parametrize("raw", VALID_URLS)
def test_valid_urls(raw):
    assert urlnorm.parse_one(raw) is not None, raw


@pytest.mark.parametrize("raw", INVALID_URLS)
def test_invalid_urls(raw):
    assert urlnorm.parse_one(raw) is None, raw


def test_valid_roundtrip_tostring():
    # URLTest.testBasic: toString of already-canonical URLs is identity
    for raw in VALID_URLS[:6]:
        assert urlnorm.parse_one(raw)["url_norm"] == raw


# ------------------------------------------------------------- URL: cleanups

CLEAN_CASES = [
    ("Http://example.com  ", "http://example.com/"),
    (" HTTPS://example.com/ ", "https://example.com/"),
    ("http://A.B.Com:281/a/b", "http://a.b.com:281/a/b"),
    ("http://A.b.Com:281/A/b", "http://a.b.com:281/A/b"),
    ("http://a.B.Com?A/b/C", "http://a.b.com?A/b/C"),
    ("http://A.Be.COM", "http://a.be.com/"),
    ("http://www.ab.com:80/", "http://www.ab.com/"),
    ("https://www.ab.com:443/", "https://www.ab.com/"),
    ("http://www.ab.com:8888/", "http://www.ab.com:8888/"),
]


@pytest.mark.parametrize("raw,expected", CLEAN_CASES)
def test_clean(raw, expected):
    assert urlnorm.parse_one(raw)["url_norm"] == expected


def test_ports():
    assert urlnorm.parse_one("http://www.ab.com:80/")["port"] == 80
    assert urlnorm.parse_one("http://www.ab.com:80/")["host"] == "www.ab.com"
    r = urlnorm.parse_one("https://ab.com/")
    assert r["port"] == 443 and r["secure"]
    assert urlnorm.parse_one("https://ab.com:8888/")["port"] == 8888


def test_paths():
    assert urlnorm.parse_one("http://A.B.Example.Com/A/b/C")["path"] == "/A/b/C"
    assert urlnorm.parse_one("http://A.B.Example.Com?D/E/f")["path"] == "?D/E/f"


# --------------------------------------------------- URL: host/domain/PSL

def test_host_reversal_and_domain():
    r = urlnorm.parse_one("http://a.b.c.d.com/1/2/3")
    assert r["host"] == "a.b.c.d.com"
    assert r["rev_host"] == "com.d.c.b.a"
    assert r["domain"] == "d.com"
    assert r["rev_domain"] == "com.d"

    assert urlnorm.parse_one("http://example.com:281/1")["rev_host"] == "com.example"
    assert urlnorm.parse_one("http://a.b.example.com/1/2")["rev_host"] == "com.example.b.a"
    assert urlnorm.parse_one("http://1.2.3.4:89/1/2")["rev_host"] == "1.2.3.4"

    assert urlnorm.parse_one("http://a.b.c.com")["domain"] == "c.com"
    assert urlnorm.parse_one("http://a.b.c.com")["rev_domain"] == "com.c"
    assert urlnorm.parse_one("http://a.b.c.co.uk")["domain"] == "c.co.uk"
    assert urlnorm.parse_one("http://a.b.c.co.uk")["rev_domain"] == "uk.co.c"
    assert urlnorm.parse_one("http://www.d.com.au")["domain"] == "d.com.au"
    assert urlnorm.parse_one("http://www.d.com.au")["rev_domain"] == "au.com.d"


def test_reverse_host_trailing_dot():
    assert urlnorm.reverse_host("a.b.c.com") == "com.c.b.a"
    assert urlnorm.reverse_host("a.b.") == "b.a."
    assert urlnorm.reverse_host("com.c.") == "c.com."


def test_psl_wildcard_exception():
    assert psl.public_suffix("a.b.ck") == "b.ck"       # *.ck
    assert psl.public_suffix("www.ck") == "ck"          # !www.ck
    assert psl.top_private_domain("x.a.b.ck") == "a.b.ck"
    assert psl.top_private_domain("www.ck") == "www.ck"
    assert not psl.is_under_public_suffix("co.uk")
    assert not psl.is_under_public_suffix("com")
    assert not psl.is_under_public_suffix("test")


# ------------------------------------------------------------- URL: toUri

URI_CASES = [
    ("https://a.b.C.com:8329", "com.c>.b.a>s8329>/"),
    ("http://d.com/a/b/c", "com.d>>o>/a/b/c"),
    ("http://1.2.3.4/a/b/c", "1.2.3.4>>o>/a/b/c"),
    ("https://a.b.com:80", "com.b>.a>s80>/"),
    ("https://www.d.com.au:9443/a/bc", "au.com.d>.www>s9443>/a/bc"),
    ("http://a.com/1", "com.a>>o>/1"),
    ("http://b.com", "com.b>>o>/"),
]


@pytest.mark.parametrize("raw,uri", URI_CASES)
def test_to_uri(raw, uri):
    assert urlnorm.to_uri(raw) == uri


@pytest.mark.parametrize("raw,uri", URI_CASES)
def test_from_uri_roundtrip(raw, uri):
    back = urlnorm.from_uri(uri)
    parsed = urlnorm.parse_one(raw)
    assert back["host"] == parsed["host"]
    assert back["domain"] == parsed["domain"]
    assert back["path"] == parsed["path"]
    assert back["port"] == parsed["port"]
    assert back["secure"] == parsed["secure"]
    assert back["url"] == parsed["url_norm"]


def test_from_uri_specials():
    assert urlnorm.from_uri("au.com.d>.www>s9443>/a/bc")["url"] == "https://www.d.com.au:9443/a/bc"
    assert urlnorm.from_uri("au.com.d>.www>s9443>/a/bc")["domain"] == "d.com.au"
    assert urlnorm.from_uri("au.com.d>.www>s9443>/a/bc")["host"] == "www.d.com.au"
    with pytest.raises(ValueError):
        urlnorm.from_uri("com.a>o>/")
    with pytest.raises(ValueError):
        urlnorm.from_uri("com.a>>x>/")
    assert urlnorm.uri_rev_domain("com.b>.a>s80>/") == "com.b"


def test_is_image():
    assert urlnorm.parse_one("http://a.com/a.jpg")["is_image"]
    assert urlnorm.parse_one("http://a.com/a.JPEG")["is_image"]
    assert urlnorm.parse_one("http://a.com/c/b/a.png")["is_image"]
    assert not urlnorm.parse_one("http://a.com/a.txt")["is_image"]
    assert not urlnorm.parse_one("http://a.com/")["is_image"]


def test_parse_frame_vectorized_matches_scalar():
    raws = VALID_URLS + INVALID_URLS
    df = urlnorm.parse_frame(pd.Series(raws))
    assert df["valid"].tolist() == [True] * len(VALID_URLS) + [False] * len(INVALID_URLS)


# -------------------------------------------------- property-based roundtrips

_LABEL = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8).filter(
    lambda s: not s.isdigit() and not s.startswith("-") and not s.endswith("-")
)


@given(
    labels=st.lists(_LABEL, min_size=0, max_size=3),
    suffix=st.sampled_from(["com", "org", "co.uk", "com.au", "io", "net"]),
    secure=st.booleans(),
    port=st.one_of(st.none(), st.integers(min_value=1, max_value=65535)),
    path=st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789/._-?#&=%", max_size=20
    ),
)
def test_url_roundtrip_property(labels, suffix, secure, port, path):
    """parse -> toUri -> fromUri -> toString is a fixed point for any
    structurally valid URL (the reference asserts this only on fixed
    vectors; we fuzz it)."""
    host = ".".join(labels + ["site", suffix])
    proto = "https" if secure else "http"
    portstr = f":{port}" if port is not None else ""
    raw = f"{proto}://{host}{portstr}/{path}"
    parsed = urlnorm.parse_one(raw)
    assert parsed is not None, raw
    back = urlnorm.from_uri(parsed["uri"])
    assert back["url"] == parsed["url_norm"]
    assert back["host"] == parsed["host"]
    assert back["domain"] == parsed["domain"]
    # canonicalization is idempotent
    again = urlnorm.parse_one(parsed["url_norm"])
    assert again is not None and again["uri"] == parsed["uri"]


@given(st.text(max_size=30))
def test_parse_never_crashes(garbage):
    """URL.isValid never throws (URL.java:153-161) — ours likewise."""
    urlnorm.parse_one("http://" + garbage)
    urlnorm.parse_one(garbage)


# ------------------------------------------------------------------ lexicoder

LEX_VECTORS = [(0, "fefeff"), (1, "fefdfefdff"), (2, "fefdfdff"), (3, "fefdfcff")]


@pytest.mark.parametrize("n,expected", LEX_VECTORS)
def test_rev_encode_vectors(n, expected):
    assert lexicoder.rev_encode_long(n) == expected


@given(st.integers(min_value=0, max_value=2**63 - 1), st.integers(min_value=0, max_value=2**63 - 1))
def test_rev_encode_order(a, b):
    # hex(enc(a)) < hex(enc(b))  <=>  a > b
    ea, eb = lexicoder.rev_encode_long(a), lexicoder.rev_encode_long(b)
    if a == b:
        assert ea == eb
    elif a > b:
        assert ea < eb
    else:
        assert ea > eb


def test_rank_row_composers():
    assert lexicoder.create_total_row("com.a>>o>/1", 0) == "t:fefeff:com.a>>o>/1"
    assert (
        lexicoder.encode_domain_rank_uri("com.b", 2, "com.b>>o>/3")
        == "d:com.b:fefdfdff:com.b>>o>/3"
    )


# ------------------------------------------------------------------- pagejson

GOLDEN_PAGE_A = (
    '{"url":"http://a.com/1","uri":"com.a\\u003e\\u003eo\\u003e/1","numOutbound":3,'
    '"outboundLinks":[{"url":"http://b.com/1","uri":"com.b\\u003e\\u003eo\\u003e/1",'
    '"anchorText":"b1"},{"url":"http://b.com/3","uri":"com.b\\u003e\\u003eo\\u003e/3",'
    '"anchorText":"b3"},{"url":"http://c.com/1","uri":"com.c\\u003e\\u003eo\\u003e/1",'
    '"anchorText":"c1"}]}'
)


def test_page_json_golden():
    # exact JSON from golden accumulo-data.txt:10 (after \x5c unescaping)
    links = [
        ("http://b.com/1", "com.b>>o>/1", "b1"),
        ("http://c.com/1", "com.c>>o>/1", "c1"),  # deliberately out of order
        ("http://b.com/3", "com.b>>o>/3", "b3"),
    ]
    got = pagejson.page_json("http://a.com/1", "com.a>>o>/1", links)
    assert got == GOLDEN_PAGE_A


def test_page_json_null_omission_and_escaping():
    got = pagejson.page_json(
        "http://a.com/x=1&y='2'<3", "com.a>>o>/x=1", [],
        crawl_date="2015-04-18T03:35:13Z",
    )
    assert '"numInbound"' not in got
    assert '"server"' not in got and '"title"' not in got
    assert '"crawlDate":"2015-04-18T03:35:13Z"' in got
    assert "\\u003d" in got and "\\u0026" in got and "\\u0027" in got and "\\u003c" in got


def test_enc_non_ascii():
    assert pagejson.enc_non_ascii(b"abc") == "abc"
    assert pagejson.enc_non_ascii(b"a\\b") == "a\\x5cb"
    assert pagejson.enc_non_ascii(bytes([3, 0xE3])) == "\\x03\\xe3"
    line = pagejson.render_kv_line("d:com.a", "domain", "pagecount", "1")
    assert line == "d:com.a|domain|pagecount|1"


def test_psl_full_list_loaded():
    """The full public_suffix_list.dat (vendored from the host's
    publicsuffix package, MPL-2.0) must be in effect — Guava's
    InternetDomainName uses the complete list INCLUDING the private
    section (blogspot et al.) and ccSLDs, so topPrivateDomain parity on
    real Common Crawl hosts needs more than the built-in snapshot."""
    from webindex_spark.functions import psl

    # private-section suffix: blogspot.com is itself a (private) suffix
    assert psl.top_private_domain("foo.blogspot.com") == "foo.blogspot.com"
    # ccSLD beyond the snapshot
    assert psl.top_private_domain("www.example.co.uk") == "example.co.uk"
    assert psl.top_private_domain("shop.example.com.br") == "example.com.br"
    # wildcard + exception rules still honored
    assert psl.top_private_domain("a.b.ck") == "a.b.ck" and psl.is_under_public_suffix("x.a.b.ck")
    assert psl.top_private_domain("www.ck") == "www.ck"

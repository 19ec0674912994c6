"""WAT parser parity vs the reference's golden archives
(ArchiveUtilTest.java:36-71; fixtures copied verbatim from
modules/data/src/test/resources/)."""

from __future__ import annotations

from webindex_spark.sources import warc


def _records(path):
    with open(path, "rb") as f:
        return list(warc.iter_warc_records(f.read()))


def test_wat_single_record_golden():
    recs = _records("tests/golden/wat.warc")
    assert len(recs) == 1
    page = warc.build_page(*recs[0])
    assert page is not None
    assert page["url"] == (
        "http://1079ishot.com/presale-password-trey-songz-young-jeezy-"
        "pre-christmas-bash/screen-shot-2011-10-27-at-11-12-06-am/"
    )
    assert page["uri"] == (
        "com.1079ishot>>o>/presale-password-trey-songz-young-jeezy-"
        "pre-christmas-bash/screen-shot-2011-10-27-at-11-12-06-am/"
    )
    assert page["crawl_date"] == "2015-04-18T03:35:13Z"
    assert page["server"] == "nginx/1.6.2"
    assert page["title"] == (
        "Presale Password &#8211; Trey Songz &#038; Young Jeezy "
        "Pre-Christmas Bash Screen shot 2011-10-27 at "
    )
    assert page["outbound_links"] == []


def test_wat_18_records_parse_clean():
    recs = _records("tests/golden/wat-18.warc")
    assert len(recs) == 18
    pages = 0
    for headers, payload in recs:
        page = warc.build_page(headers, payload)  # must not raise
        if page is not None:
            pages += 1
    assert pages >= 1


def test_read_wat_dataframe(spark):
    df = warc.read_wat(spark, "tests/golden/wat-18.warc").cache()
    rows = df.collect()
    assert not any(r["parse_error"] for r in rows)
    assert all(r["uri"].startswith("com.") or ">" in r["uri"] for r in rows)
    # links are external-domain only and TreeSet-ordered
    for r in rows:
        doms = {l["uri"].split(">", 1)[0] for l in r["outbound_links"]}
        assert r["uri"].split(">", 1)[0] not in doms
        keys = [(l["uri"], l["url"]) for l in r["outbound_links"]]
        assert keys == sorted(keys)

    # the parsed pages feed the batch index directly
    from webindex_spark.operators import index_batch

    uc, dc, ir = index_batch.build_index(
        df.select(*[f.name for f in index_batch.PAGE_SCHEMA.fields]), cache=False
    )
    assert ir.count() > 0


def test_paths_range_select(tmp_path):
    """S6 (IndexEnv.getPathsRange, IndexEnv.java:247-272): inclusive
    0-based line range, fewer lines past EOF, errors on bad input."""
    import pytest

    from webindex_spark.sources.paths import get_paths_range

    p = tmp_path / "wat.paths"
    p.write_text("".join(f"seg/{i}.warc.wat.gz\n" for i in range(10)))
    assert get_paths_range(str(p), "0-2") == [
        "seg/0.warc.wat.gz", "seg/1.warc.wat.gz", "seg/2.warc.wat.gz"
    ]
    assert get_paths_range(str(p), "9-9") == ["seg/9.warc.wat.gz"]
    assert get_paths_range(str(p), "8-15") == [
        "seg/8.warc.wat.gz", "seg/9.warc.wat.gz"
    ]  # skip/limit past EOF
    with pytest.raises(ValueError):
        get_paths_range(str(p), "5-2")
    with pytest.raises(ValueError):
        get_paths_range(str(p), "x-2")
    with pytest.raises(FileNotFoundError):
        get_paths_range(str(p) + ".nope", "0-1")

"""REP (robots.txt) parser + matcher: RFC 9309 / Google REP semantics —
group selection, longest-match precedence with Allow winning ties,
wildcards, $ anchors, crawl-delay. Matcher runs JVM-side over a broadcast
of the parsed table."""

import pandas as pd
import pyspark.sql.functions as F

from webindex_spark.operators import robots as R

BODY = """
# global rules
User-agent: *
Disallow: /private/
Allow: /private/public*
Crawl-delay: 2.5

User-agent: specialbot
Disallow: /
Allow: /only/this/

User-agent: multi1
User-agent: multi2
Disallow: /m/
"""


def test_group_selection_and_precedence():
    rules, delay = R.parse_robots_body(BODY, agent="webindex")
    assert delay == 2.5 and len(rules) == 2  # the * group
    rules_sb, delay_sb = R.parse_robots_body(BODY, agent="SpecialBot")
    assert delay_sb == R.DEFAULT_CRAWL_DELAY and len(rules_sb) == 2
    rules_m, _ = R.parse_robots_body(BODY, agent="multi2")
    assert len(rules_m) == 1  # multi-agent group header


def _decide(body, agent, path):
    """Pure-python oracle of the REP decision for cross-checking."""
    import re as _re

    rules, _ = R.parse_robots_body(body, agent)
    hits = [(plen, allow) for plen, allow, rx in rules if _re.search(rx, path)]
    return max(hits)[1] if hits else True


REP_CASES = [
    # (path, expected allowed for agent '*' under BODY)
    ("/public/x", True),
    ("/private/x", False),
    ("/private/publicfile", True),     # Allow longer than Disallow
    ("/private/pub", False),
    ("/", True),
]


def test_rep_decisions_python_oracle():
    for path, want in REP_CASES:
        assert _decide(BODY, "webindex", path) is want, path
    # specialbot: everything blocked except /only/this/
    assert _decide(BODY, "specialbot", "/x") is False
    assert _decide(BODY, "specialbot", "/only/this/page") is True


def test_wildcards_and_anchor():
    body = "User-agent: *\nDisallow: /*.pdf$\nAllow: /docs/*.pdf$\nDisallow: /tmp*\n"
    assert _decide(body, "x", "/a/b/file.pdf") is False
    assert _decide(body, "x", "/a/b/file.pdf?x=1") is True   # $ anchors the end
    assert _decide(body, "x", "/docs/file.pdf") is True      # longer Allow wins
    assert _decide(body, "x", "/tmpfile") is False
    # allow wins a length TIE (RFC 9309 §2.2.2: least restrictive)
    tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert _decide(tie, "x", "/page1") is True


def test_spark_matcher_matches_python_oracle(spark):
    hosts = {
        "a.com": BODY,
        "b.com": "User-agent: *\nDisallow: /*.pdf$\nAllow: /docs/*.pdf$\n",
        "c.com": "User-agent: *\nDisallow:\n",  # empty Disallow = allow all
    }
    bodies = spark.createDataFrame(
        pd.DataFrame([{"host": h, "robots_txt": t} for h, t in hosts.items()])
    )
    parsed = R.parse_robots_txt(bodies, agent="webindex")
    paths = ["/", "/private/x", "/private/publicfile", "/a/file.pdf",
             "/docs/file.pdf", "/anything"]
    frontier = spark.createDataFrame(
        [(h, p) for h in [*hosts, "norobots.com"] for p in paths],
        ["host", "path"],
    )
    got = {
        (r["host"], r["path"]): (r["allowed"], r["crawl_delay"])
        for r in R.apply_robots_rules(frontier, parsed).collect()
    }
    for h in hosts:
        for p in paths:
            want = _decide(hosts[h], "webindex", p)
            assert got[(h, p)][0] is want, (h, p)
    # unknown host: allowed, default delay
    assert got[("norobots.com", "/")] == (True, R.DEFAULT_CRAWL_DELAY)
    # crawl-delay propagated from the * group of a.com
    assert got[("a.com", "/")][1] == 2.5

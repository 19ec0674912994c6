"""Robots gate (north-rule core; SURVEY.md §7.2 M3).

Two layers:

* **apply_robots** — the fast gate over a pre-parsed rules table
  ``(host, disallow: array<string>, crawl_delay: double)`` where disallow
  entries are path prefixes (the dominant robots.txt idiom).
* **parse_robots_txt / apply_robots_rules** — a real REP parser + matcher
  for raw robots.txt bodies: user-agent group selection (exact agent
  name, else ``*``), Allow/Disallow with ``*`` wildcards and ``$``
  anchors, longest-pattern-wins with Allow beating Disallow on ties (the
  Google REP / RFC 9309 precedence), Crawl-delay per group, empty
  Disallow = allow-all, no matching rule = allowed.  Parsing runs once
  per host in an Arrow batch (robots bodies are KB-sized metadata);
  matching is JVM-side — ``regexp_like`` against per-rule anchored
  regexes inside a higher-order filter, then ``array_max`` over
  ``struct(pattern_len, allow)`` implements longest-match-wins (struct
  ordering breaks ties toward allow=true exactly as the spec does).

The rules side is tiny relative to the frontier (one row per host), so
both matchers join by explicit broadcast: at 100 TB the frontier never
shuffles for robots gating.  Hosts with no rules row are allowed with the
default crawl delay.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

DEFAULT_CRAWL_DELAY = 1.0


def apply_robots(
    frontier: DataFrame,
    robots: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """frontier + (allowed: bool, crawl_delay: double).

    The caller filters on ``allowed``; keeping the column (rather than
    filtering here) lets the metrics layer count robots-blocked URLs per
    partition before dropping them.
    """
    r = robots.select(
        F.col("host").alias("__r_host"),
        F.col("disallow").alias("__r_disallow"),
        F.col("crawl_delay").alias("__r_delay"),
    )
    joined = frontier.join(
        F.broadcast(r), frontier[host_col] == r["__r_host"], "left"
    )
    blocked = F.exists(
        F.coalesce(F.col("__r_disallow"), F.array()),
        lambda p: F.col(path_col).startswith(p),
    )
    return (
        joined.withColumn("allowed", ~F.coalesce(blocked, F.lit(False)))
        .withColumn(
            "crawl_delay", F.coalesce(F.col("__r_delay"), F.lit(DEFAULT_CRAWL_DELAY))
        )
        .drop("__r_host", "__r_disallow", "__r_delay")
    )


# ------------------------------------------------------------- REP parser

PARSED_ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField(
            "rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("plen", T.IntegerType()),
                        T.StructField("allow", T.BooleanType()),
                        T.StructField("regex", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)


def _pattern_regex(pattern: str) -> str:
    """REP path pattern -> anchored Java/RE2-safe regex: '*' matches any
    run (including '/'), a trailing '$' anchors the end, everything else
    is literal; the match is a PREFIX match otherwise."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def parse_robots_body(text: str, agent: str = "webindex") -> tuple[list, float]:
    """One robots.txt body -> (rules, crawl_delay) for ``agent``.

    Group selection per RFC 9309: all groups whose user-agent line equals
    the agent (case-insensitive token match) if any exist, else the ``*``
    groups.  Rules: (pattern_len, allow, regex); empty-pattern Disallow
    lines are dropped (allow-all).
    """
    groups: list[tuple[list[str], list, float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list = []
    cur_delay: float | None = None
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
                in_group_body = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:
                cur_rules.append((len(val), key == "allow", _pattern_regex(val)))
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        # other directives (sitemap, host, ...) are group-neutral: ignored
    flush()

    agent = agent.lower()
    exact = [g for g in groups if agent in g[0]]
    chosen = exact if exact else [g for g in groups if "*" in g[0]]
    rules: list = []
    delay: float | None = None
    for _agents, rs, d in chosen:
        rules.extend(rs)
        if d is not None and delay is None:
            delay = d
    return rules, float(delay if delay is not None else DEFAULT_CRAWL_DELAY)


def parse_robots_txt(
    bodies: DataFrame, agent: str = "webindex",
    host_col: str = "host", txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) -> PARSED_ROBOTS_SCHEMA, one Arrow batch at a
    time (robots bodies are KB-scale per-host metadata; the frontier is
    what Spark parallelizes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                rules, delay = parse_robots_body(getattr(r, txt_col), agent)
                out.append(
                    {
                        "host": getattr(r, host_col),
                        "rules": rules,
                        "crawl_delay": delay,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in PARSED_ROBOTS_SCHEMA.fields]
            )

    return bodies.mapInPandas(run, schema=PARSED_ROBOTS_SCHEMA)


def apply_robots_rules(
    frontier: DataFrame,
    parsed: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """frontier + (allowed, crawl_delay) under full REP precedence.

    JVM-side: broadcast-join the parsed table, ``filter`` the rule array
    by ``regexp_like(path, rule.regex)``, then ``array_max`` over
    ``struct(plen, allow)`` = the longest matching pattern, Allow winning
    length ties (struct ordering).  No match / no rules row -> allowed.
    """
    r = parsed.select(
        F.col("host").alias("__r_host"),
        F.col("rules").alias("__r_rules"),
        F.col("crawl_delay").alias("__r_delay"),
    )
    joined = frontier.join(
        F.broadcast(r), frontier[host_col] == r["__r_host"], "left"
    )
    matches = F.filter(
        F.coalesce(F.col("__r_rules"), F.array()),
        lambda rule: F.regexp_like(F.col(path_col), rule["regex"]),
    )
    best = F.array_max(
        F.transform(
            matches, lambda rule: F.struct(rule["plen"].alias("plen"),
                                           rule["allow"].alias("allow"))
        )
    )
    return (
        joined.withColumn(
            "allowed", F.coalesce(F.col("__r_rules").isNull() | best.isNull() | best["allow"], F.lit(True))
        )
        .withColumn(
            "crawl_delay", F.coalesce(F.col("__r_delay"), F.lit(DEFAULT_CRAWL_DELAY))
        )
        .drop("__r_host", "__r_rules", "__r_delay")
    )

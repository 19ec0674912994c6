"""Pure-python reference model of the crawl loop.

Independently implements the frontier/politeness/seen semantics (same
specification, no Spark) so tests can assert the engine's crawl ordering
and URL-seen membership EXACTLY — the north rule's correctness bar.
Shares only the URL kernel (urlnorm) with the engine, which is itself
locked to the reference's URLTest vectors.
"""

from __future__ import annotations

from webindex_spark.functions import urlnorm

DEFAULT_CRAWL_DELAY = 1.0


def _canon(raw_url: str):
    row = urlnorm.parse_one(raw_url)
    if row is None:
        return None
    return {
        "uri": row["uri"], "url": row["url_norm"], "host": row["host"],
        "path": row["path"], "is_image": bool(row["is_image"]),
    }


class ModelCrawler:
    def __init__(self, corpus_df, images_df, robots_df, budget: int, decay: float):
        # corpus: pandas (url, uri, host, title, out_urls)
        self.corpus = {r.uri: list(r.out_urls) for r in corpus_df.itertuples()}
        self.titles = {r.uri: r.title for r in corpus_df.itertuples()}
        self.images = set(images_df["image_id"])
        self.robots = {
            r.host: (list(r.disallow), float(r.crawl_delay))
            for r in robots_df.itertuples()
        }
        self.budget = budget
        self.decay = decay
        self.frontier: dict[str, dict] = {}  # uri -> row
        self.seen: set[str] = set()
        self.fetch_log: list[tuple] = []  # (epoch, host, uri, slot, tick, is_image)
        self.uri_counts: dict[str, list] = {}  # uri -> [links_to, docs]
        self.fetched_pages: set[str] = set()
        self.fetched_images: set[str] = set()

    def add_seed(self, raw_url: str, priority: float, discovered_epoch: int):
        c = _canon(raw_url)
        if c is None:
            return
        f = self.frontier.get(c["uri"])
        if f is None:
            self.frontier[c["uri"]] = {**c, "priority": priority,
                                       "discovered_epoch": discovered_epoch}
        else:
            f["priority"] = max(f["priority"], priority)
            f["discovered_epoch"] = min(f["discovered_epoch"], discovered_epoch)

    def _rules(self, host: str):
        return self.robots.get(host, ([], DEFAULT_CRAWL_DELAY))

    def run_epoch(self, epoch: int):
        # robots gate
        allowed, blocked = [], []
        for row in self.frontier.values():
            dis, _delay = self._rules(row["host"])
            (blocked if any(row["path"].startswith(p) for p in dis) else allowed).append(row)

        # politeness schedule
        by_host: dict[str, list] = {}
        for row in allowed:
            by_host.setdefault(row["host"], []).append(row)
        scheduled = []
        for host in by_host:
            rows = sorted(by_host[host], key=lambda r: (-r["priority"], r["uri"]))
            _dis, delay = self._rules(host)
            for slot, row in enumerate(rows[: self.budget]):
                self.fetch_log.append(
                    (epoch, host, row["uri"], slot, slot * delay, row["is_image"])
                )
                scheduled.append(row)

        newly_seen = {r["uri"] for r in scheduled} | {r["uri"] for r in blocked}
        self.seen |= newly_seen
        for uri in newly_seen:
            self.frontier.pop(uri, None)

        # fetch + parse + index update
        children: dict[str, dict] = {}
        for row in scheduled:
            if row["is_image"]:
                if row["uri"] in self.images:
                    self.fetched_images.add(row["uri"])
                continue
            if row["uri"] not in self.corpus:
                continue  # 404
            self.fetched_pages.add(row["uri"])
            uc = self.uri_counts.setdefault(row["uri"], [0, 0])
            uc[1] += 1
            targets = {}
            for raw in self.corpus[row["uri"]]:
                c = _canon(raw)
                if c is None:
                    continue
                targets[c["uri"]] = c
                key = c["uri"]
                prio = row["priority"] * self.decay
                if key in children:
                    children[key]["priority"] = max(children[key]["priority"], prio)
                else:
                    children[key] = {**c, "priority": prio}
            for t in targets:
                self.uri_counts.setdefault(t, [0, 0])[0] += 1

        # frontier update
        for uri, c in children.items():
            if uri in self.seen:
                continue
            f = self.frontier.get(uri)
            if f is None:
                self.frontier[uri] = {**c, "discovered_epoch": epoch + 1}
            else:
                f["priority"] = max(f["priority"], c["priority"])

    def run(self, n_epochs: int):
        for e in range(1, n_epochs + 1):
            self.run_epoch(e)

    def domain_counts(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for uri in self.uri_counts:
            d = uri.split(">", 1)[0]
            out[d] = out.get(d, 0) + 1
        return out

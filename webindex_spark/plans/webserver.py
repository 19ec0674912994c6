"""Thin HTTP serving layer over the query surface (plans/queries.py) —
the runtime counterpart of the reference's WebServer routes
(WebServer.java:71-132: "/", "/pages", "/page", "/links" over
IndexClient; DevServer.java boots the same app on dev fixtures).

This is a DEV/read-path demonstrator, not a production gateway: the
reference serves Freemarker HTML over Accumulo range scans; here each
route runs the corresponding DataFrame query over the engine's state
tables and returns JSON.  State tables are cached once at construction —
every route's query is a point/top-k read (collecting ≤ a page of rows),
the same access pattern the reference's key-design gives its scans.

Routes (query params mirror WebServer's):
  GET /top?next=<links_to|uri>        -> getTopResults (keyset-paginated)
  GET /pages?domain=<forward-domain>  -> getPages: {domain, total, pages[]}
  GET /page?url=<raw url>             -> getPage: body + num_inbound
  GET /domain?domain=<forward-domain> -> getDomainStats: {domain, total}
  GET /links?uri=<uri>&linkType=in|out&offset=N -> getLinks

Serving uses only the stdlib ThreadingHTTPServer; Spark sessions are
thread-safe for read queries, and each route collects a bounded page.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession

from webindex_spark.plans import queries


class InvalidRequest(ValueError):
    """A request whose parameters cannot be served -> HTTP 400."""


class WebIndexApp:
    """Route implementations over cached state tables."""

    def __init__(self, spark: SparkSession, uri_counts: DataFrame,
                 domain_counts: DataFrame, pages_state: DataFrame):
        self.spark = spark
        self.uri_counts = uri_counts.cache()
        self.domain_counts = domain_counts.cache()
        self.pages_state = pages_state.cache()
        for df in (self.uri_counts, self.domain_counts, self.pages_state):
            df.count()  # materialize once; every route reads the cache

    # one method per WebServer route -------------------------------------

    def top(self, next_token: str | None = None) -> dict:
        rows = [
            r.asDict()
            for r in queries.top_results(self.uri_counts, next_token).collect()
        ]
        nxt = None
        if len(rows) > queries.PAGE_SIZE:
            look = rows.pop()  # the Pager's lookahead row
            nxt = f"{look['links_to']}|{look['uri']}"
        return {"results": rows, "next": nxt}

    def pages(self, domain: str) -> dict:
        rows = queries.pages_in_domain(self.uri_counts, domain).collect()
        rev = ".".join(reversed(domain.split(".")))
        total = self.uri_counts.where(
            self.uri_counts.uri.startswith(rev + ">")
        ).count()
        return {
            "domain": domain,
            "total": total,
            "pages": [
                {"uri": r["uri"], "score": r["links_to"], "rank": r["rank"]}
                for r in rows
            ],
        }

    def page(self, url: str) -> dict:
        from webindex_spark.functions.urlnorm import parse_one

        parsed = parse_one(url)  # None for an unparseable/invalid url
        if parsed is None:
            raise InvalidRequest(f"invalid url: {url}")
        rows = queries.page_details(
            self.pages_state, self.uri_counts, parsed["uri"]
        ).collect()
        # always one row (reference getPage synthesizes an empty page for
        # link-only targets and still reports numInbound)
        return rows[0].asDict(recursive=True)

    def domain(self, domain: str) -> dict:
        rows = queries.domain_stats(self.domain_counts, domain).collect()
        return {
            "domain": domain,
            "total": int(rows[0]["pagecount"]) if rows else 0,
        }

    def links(self, uri: str, link_type: str = "in", offset: int = 0) -> dict:
        rows = [
            r.asDict()
            for r in queries.links_of(
                self.pages_state, uri, link_type, offset
            ).collect()
        ]
        return {"uri": uri, "linkType": link_type, "links": rows}


class _Handler(BaseHTTPRequestHandler):
    app: WebIndexApp  # set by serve()

    def do_GET(self):  # noqa: N802 (stdlib casing)
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        try:
            if u.path in ("/", "/top"):
                body = self.app.top(q.get("next"))
            elif u.path == "/pages":
                body = self.app.pages(q["domain"])
            elif u.path == "/page":
                body = self.app.page(q["url"])
            elif u.path == "/domain":
                body = self.app.domain(q["domain"])
            elif u.path == "/links":
                body = self.app.links(
                    q["uri"], q.get("linkType", "in"), int(q.get("offset", 0))
                )
            else:
                self.send_error(404)
                return
        except KeyError as e:
            self.send_error(400, f"missing query param {e}")
            return
        except (ValueError, InvalidRequest) as e:
            # non-integer offset, invalid url, ... -> a real 400, never a
            # dropped connection or a 200 with an error body
            self.send_error(400, str(e))
            return
        except Exception:  # Spark analysis errors etc. -> 500, not EOF
            self.send_error(500, "internal error")
            return
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # quiet test output
        pass


def serve(app: WebIndexApp, port: int = 0) -> ThreadingHTTPServer:
    """Start the server on a daemon thread; returns it (``server_port``
    carries the bound port; ``shutdown()`` stops it)."""
    handler = type("BoundHandler", (_Handler,), {"app": app})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv

"""Arrow-vectorized pandas UDF wrappers around the pure kernels.

Per the engine's north rule there is no per-row Python ``udf()`` anywhere —
every row-level kernel crosses the JVM<->Python boundary as Arrow batches.
Each wrapper here is a thin adapter: the real logic lives in the pure,
unit-tested modules (urlnorm/lexicoder/pagejson).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from webindex_spark.functions import lexicoder, pagejson, urlnorm

URL_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("valid", T.BooleanType()),
        T.StructField("host", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("port", T.IntegerType()),
        T.StructField("secure", T.BooleanType()),
        T.StructField("ip_host", T.BooleanType()),
        T.StructField("uri", T.StringType()),
        T.StructField("url_norm", T.StringType()),
        T.StructField("rev_domain", T.StringType()),
        T.StructField("rev_host", T.StringType()),
        T.StructField("is_image", T.BooleanType()),
    ]
)


@pandas_udf(URL_PARSE_SCHEMA)
def parse_url(raw: pd.Series) -> pd.DataFrame:
    """URL.from as a struct column; invalid URLs -> valid=false, null fields."""
    return urlnorm.parse_frame(raw)


@pandas_udf(T.StringType())
def rev_encode(counts: pd.Series) -> pd.Series:
    """IndexClient.revEncodeLong (descending-order hex sort key)."""
    return lexicoder.rev_encode_series(counts)


@pandas_udf(T.StringType())
def page_json(page: pd.DataFrame) -> pd.Series:
    """Gson-canonical Page JSON from a struct
    (url, uri, outbound_links, crawl_date, server, title)."""
    links_col = page["outbound_links"]
    out = []
    for url, uri, links, cd, sv, ti in zip(
        page["url"], page["uri"], links_col,
        page.get("crawl_date", pd.Series([None] * len(page))),
        page.get("server", pd.Series([None] * len(page))),
        page.get("title", pd.Series([None] * len(page))),
    ):
        tuples = [
            (l["url"], l["uri"], l["anchor_text"]) for l in (links if links is not None else [])
        ]
        out.append(
            pagejson.page_json(
                url, uri, tuples,
                crawl_date=None if cd is None or (isinstance(cd, float) and pd.isna(cd)) else cd,
                server=None if sv is None or (isinstance(sv, float) and pd.isna(sv)) else sv,
                title=None if ti is None or (isinstance(ti, float) and pd.isna(ti)) else ti,
            )
        )
    return pd.Series(out, dtype="string")


def uri_rev_domain_col(uri: Column | str) -> Column:
    """getReverseDomain from a canonical URI — pure built-in (field 1 of the
    ``>``-separated pageID; double-reversal is the identity, see
    urlnorm.uri_rev_domain). Stays inside whole-stage codegen."""
    return F.split_part(F.col(uri) if isinstance(uri, str) else uri, F.lit(">"), F.lit(1))


def uri_host_col(uri: Column | str) -> Column:
    """Reversed host (fields 1+2 concatenated) — the politeness grouping key.
    Note this is the REVERSED host form (e.g. ``com.example.www``); it is a
    bijection of the host so grouping semantics are identical and it sorts
    domain-adjacent, which is exactly why the reference keys on it."""
    c = F.col(uri) if isinstance(uri, str) else uri
    return F.concat(
        F.split_part(c, F.lit(">"), F.lit(1)), F.split_part(c, F.lit(">"), F.lit(2))
    )

"""URL parse / canonicalize / validate (F1-F8 in SURVEY.md §2.8).

Reproduces the semantics of the reference's ``URL`` model
(/root/reference/modules/core/src/main/java/webindex/core/models/URL.java):

* ``URL.from`` (URL.java:77-147): reject raw URLs containing ``>``; trim;
  require length >= 8; case-insensitive ``http://`` (port 80) /
  ``https://`` (port 443) protocols only; host+port split from path at the
  first ``[/?#]`` with the separator kept as the first path char and a
  missing path rendered ``/``; host+port lowercased, path case preserved;
  explicit port parsed (invalid/empty port rejects); empty host rejects;
  host must be a valid IPv4/IPv6 literal or a syntactically valid hostname
  under a public suffix; registrable domain via the PSL.
* ``reverseHost`` (URL.java:167-180): dot-reverse, preserving a trailing dot.
* ``toUri`` / ``fromUri`` (URL.java:230-267): the 4-field ``>``-separated
  canonical pageID ``revDomain>hostRest>proto[port]>path``.
* ``toString`` (URL.java:213-228): re-render dropping default ports.
* ``isImage`` (URL.java:209-211): path extension regex.

Everything is vectorized: the batch entry point is ``parse_frame`` which
takes a pandas Series of raw URLs and returns a pandas DataFrame of parsed
columns.  Host validation and PSL lookups are done once per *unique* host
per batch, then broadcast back with a dict map — the standard
vectorization pattern for string-heavy kernels inside pandas UDFs.
"""

from __future__ import annotations

import ipaddress
import re
from functools import lru_cache

import numpy as np
import pandas as pd

from webindex_spark.functions import psl

URI_SEP = ">"
_PROTO_HTTP = "http://"
_PROTO_HTTPS = "https://"

# Guava InternetDomainName syntax (approximation, see note below): labels of
# 1-63 chars from [a-z0-9_-] (already lowercased), not starting/ending with
# '-', total length <= 253, and the final label not fully numeric (numeric
# final labels are IP-like and handled by the IP branch).  This matches the
# reference's behavior on every vector in URLTest.java; hosts containing
# '@', empty labels, etc. are rejected just as HostSpecifier does.
_LABEL_RE = re.compile(r"^[a-z0-9_](?:[a-z0-9_-]{0,61}[a-z0-9_])?$")
_IMAGE_RE = re.compile(r"[^\s]+\.(?:jpeg|jpg|png|gif|bmp)$", re.IGNORECASE)


@lru_cache(maxsize=65536)
def is_valid_ip(host: str) -> bool:
    """commons-validator InetAddressValidator semantics (URL.java:163-165)."""
    try:
        ipaddress.ip_address(host)
        return True
    except ValueError:
        return False


@lru_cache(maxsize=65536)
def is_valid_host(host: str) -> bool:
    """``URL.isValidHost`` (URL.java:72-75): syntax + under a public suffix."""
    if not host or len(host) > 253:
        return False
    h = host[:-1] if host.endswith(".") else host
    labels = h.split(".")
    if not labels:
        return False
    for lab in labels:
        if not _LABEL_RE.match(lab):
            return False
    if labels[-1].isdigit():
        return False
    return psl.is_under_public_suffix(h)


def reverse_host(host: str) -> str:
    """``URL.reverseHost`` (URL.java:167-180): dot-reverse, keep trailing dot.

    Java's ``split("\\.")`` drops trailing empty strings, so ``"a.b."``
    splits to ``["a","b"]`` and re-renders ``"b.a."``.
    """
    parts = host.split(".")
    while parts and parts[-1] == "":
        parts.pop()
    out = ".".join(reversed(parts))
    if host.endswith("."):
        out += "."
    return out


def parse_frame(raw: pd.Series) -> pd.DataFrame:
    """Vectorized ``URL.from`` over a Series of raw URL strings.

    Returns a DataFrame indexed like ``raw`` with columns:
      valid(bool), host, domain, path, port(int32), secure(bool),
      ip_host(bool), uri, url_norm, rev_domain, rev_host, is_image(bool).
    Invalid rows have valid=False and null string columns.
    """
    s = raw.astype("string").fillna("")
    n = len(s)
    valid = np.ones(n, dtype=bool)

    # URI_SEP reject (URL.java:84-86)
    valid &= ~s.str.contains(">", regex=False).to_numpy(dtype=bool)
    t = s.str.strip()
    # min length (URL.java:88-91)
    valid &= (t.str.len() >= 8).to_numpy(dtype=bool)

    # protocol (URL.java:93-104)
    low7 = t.str[:7].str.lower()
    low8 = t.str[:8].str.lower()
    is_http = (low7 == _PROTO_HTTP).to_numpy(dtype=bool)
    is_https = (low8 == _PROTO_HTTPS).to_numpy(dtype=bool)
    valid &= is_http | is_https
    secure = is_https & valid
    rest = pd.Series(
        np.where(is_http, t.str[7:].fillna(""), t.str[8:].fillna("")),
        index=s.index, dtype="string",
    )

    # split host+port from path at first [/?#], keeping the separator as the
    # first char of path; missing path renders "/" (URL.java:106-118)
    ext = rest.str.extract(r"^([^/?#]*)(.*)$", expand=True)
    hostport = ext[0].fillna("").str.lower()
    path = ext[1].fillna("")
    path = path.mask(path == "", "/")

    # port split (URL.java:120-131).  The accept/reject boundary is exactly
    # Java Integer.parseInt: optional +/- sign, >=1 digits (any number of
    # leading zeros), and the VALUE must fit an int32 — so the 10-digit
    # http://h.com:2147483647/ is valid while :2147483648 and :99999999999
    # are not, and negative ports parse to their (accepted) values.
    pext = hostport.str.extract(r"^([^:]*)(?::(.*))?$", expand=True)
    host = pext[0].fillna("")
    portstr = pext[1]
    has_port = portstr.notna().to_numpy(dtype=bool)
    pm = portstr.fillna("")
    form_ok = pm.str.match(r"^[+-]?\d+$")
    sig = pm.str.replace(r"^[+-]", "", regex=True).str.lstrip("0")
    small = sig.str.len() <= 10  # <=10 significant digits: safe to parse
    pval = pd.to_numeric(pm.where(form_ok & small), errors="coerce")
    in_range = (pval >= -2147483648) & (pval <= 2147483647)
    port_ok = (form_ok & small & in_range.fillna(False)).to_numpy(dtype=bool)
    valid &= ~has_port | port_ok
    port = np.where(is_https & valid, 443, 80).astype(np.int64)
    parsed_port = (
        pd.to_numeric(portstr.where(port_ok), errors="coerce")
        .fillna(0)
        .to_numpy(dtype=np.int64)
    )
    port = np.where(has_port & port_ok, parsed_port, port)

    # empty host rejects (URL.java:133-135)
    valid &= (host.str.len() > 0).to_numpy(dtype=bool)

    # host validation + domain via per-unique-host maps (URL.java:137-144)
    uniq = pd.unique(host[valid])
    ip_map = {h: is_valid_ip(h) for h in uniq}
    host_ok_map = {h: (ip_map[h] or is_valid_host(h)) for h in uniq}
    dom_map = {
        h: (h if ip_map[h] else (psl.top_private_domain(h.rstrip(".")) or ""))
        for h in uniq
    }
    ip_host = host.map(lambda h: ip_map.get(h, False)).to_numpy(dtype=bool) & valid
    valid &= host.map(lambda h: host_ok_map.get(h, False)).to_numpy(dtype=bool)
    domain = host.map(dom_map).fillna("")

    # derived: reverse host / reverse domain (IP hosts are not reversed,
    # URL.java:190-195,273-278)
    rev_map = {h: reverse_host(h) for h in uniq}
    rev_host = host.map(rev_map).fillna("")
    rev_host = rev_host.mask(pd.Series(ip_host, index=s.index), host)
    rev_dom_map = {d: reverse_host(d) for d in pd.unique(domain[valid]) if d}
    rev_domain = domain.map(rev_dom_map).fillna("")
    rev_domain = rev_domain.mask(pd.Series(ip_host, index=s.index), domain)

    # toUri (URL.java:230-239)
    default_port = np.where(secure, 443, 80)
    nondefault = (port != default_port) & valid
    port_str = pd.Series(np.where(nondefault, port.astype(str), ""), index=s.index)
    host_rest = pd.Series(
        [rh[len(rd):] if v else "" for rh, rd, v in
         zip(rev_host.fillna(""), rev_domain.fillna(""), valid)],
        index=s.index, dtype="string",
    )
    proto_char = pd.Series(np.where(secure, "s", "o"), index=s.index)
    uri = (
        rev_domain.astype("string") + URI_SEP + host_rest + URI_SEP
        + proto_char.astype("string") + port_str.astype("string") + URI_SEP
        + path.astype("string")
    )

    # toString re-render (URL.java:213-228)
    proto = pd.Series(np.where(secure, "https://", "http://"), index=s.index)
    colon_port = pd.Series(np.where(nondefault, ":" + pd.Series(port.astype(str), index=s.index), ""), index=s.index)
    url_norm = proto.astype("string") + host.astype("string") + colon_port.astype("string") + path.astype("string")

    is_image = path.str.fullmatch(_IMAGE_RE).fillna(False).to_numpy(dtype=bool) & valid

    out = pd.DataFrame(
        {
            "valid": valid,
            "host": host.where(valid),
            "domain": domain.where(valid),
            "path": path.where(valid),
            "port": pd.Series(port, index=s.index).where(valid).astype("Int32"),
            "secure": pd.Series(secure, index=s.index),
            "ip_host": pd.Series(ip_host, index=s.index),
            "uri": uri.where(valid),
            "url_norm": url_norm.where(valid),
            "rev_domain": rev_domain.where(valid),
            "rev_host": rev_host.where(valid),
            "is_image": pd.Series(is_image, index=s.index),
        }
    )
    return out


def parse_one(raw_url: str):
    """Single-URL convenience wrapper over ``parse_frame`` (tests/tools)."""
    df = parse_frame(pd.Series([raw_url]))
    row = df.iloc[0]
    return None if not row["valid"] else row


def to_uri(raw_url: str) -> str | None:
    row = parse_one(raw_url)
    return None if row is None else row["uri"]


def uri_rev_domain(uri: str) -> str:
    """``URL.fromUri(uri).getReverseDomain()``: the first ``>`` field.

    Reversing the stored reverse-domain twice is the identity (URL.java
    fromUri:246-252 + getReverseDomain:273-278), so no string surgery is
    needed — this is why domain rollups in Spark are a pure built-in
    ``split(uri,'>')[0]``.
    """
    return uri.split(URI_SEP, 1)[0]


def from_uri(uri: str) -> dict:
    """``URL.fromUri`` (URL.java:241-267), for tests and round-trips.

    Java's ``split`` drops trailing empty fields; we mimic that before the
    4-part check.
    """
    parts = uri.split(URI_SEP)
    while parts and parts[-1] == "":
        parts.pop()
    if len(parts) != 4:
        raise ValueError(f"Page ID has too few or many parts: {uri}")
    rev_domain, host_rest, proto, path = parts
    host = rev_domain + host_rest
    ip = is_valid_ip(host)
    domain = rev_domain if ip else reverse_host(rev_domain)
    host = host if ip else reverse_host(host)
    secure = False
    port = 80
    if proto.startswith("s"):
        secure = True
        port = 443
    elif not proto.startswith("o"):
        raise ValueError(f"Page ID does not have port info beg with 's' or 'o': {uri}")
    if len(proto) > 1:
        port = int(proto[1:])
    url = "http" + ("s" if secure else "") + "://" + host
    if not (port == 80 and not secure) and not (port == 443 and secure):
        url += f":{port}"
    url += path
    return {
        "domain": domain, "host": host, "path": path, "port": port,
        "secure": secure, "ip_host": ip, "url": url,
    }

"""Descending-count sort-key codec (F9/F10 in SURVEY.md §2.8).

Reproduces ``IndexClient.revEncodeLong``
(/root/reference/modules/core/src/main/java/webindex/core/IndexClient.java:308-311),
i.e. hex(ReverseLexicoder(ULongLexicoder).encode(n)) from Accumulo's
lexicoder algebra, re-derived from first principles and verified against the
golden rows in
/root/reference/modules/data/src/test/resources/data/set1/accumulo-data.txt
(0 -> "fefeff", 1 -> "fefdfefdff", 2 -> "fefdfdff").

Algorithm:
  1. ULong encode: ``n == 0`` -> ``[0x00]``; else ``[k] + big-endian(n)``
     where k = number of significant bytes (1-8).
  2. Escape: ``0x00 -> 0x01 0x01``, ``0x01 -> 0x01 0x02``.
  3. Complement every byte (0xff - x), append terminator 0xff.
  4. Lowercase-hex encode.

Lexicographic ascending order of the encodings equals descending numeric
order, which is what turns a plain range scan over ``t:``/``d:`` rows into
a rank-ordered read (IndexClient.java:313-319).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd


@lru_cache(maxsize=65536)
def rev_encode_long(n: int) -> str:
    """Hex sort key with descending numeric order; n must be >= 0."""
    if n < 0:
        raise ValueError(f"rev_encode_long requires n >= 0, got {n}")
    if n == 0:
        data = b"\x00"
    else:
        body = n.to_bytes((n.bit_length() + 7) // 8, "big")
        data = bytes([len(body)]) + body
    out = bytearray()
    for x in data:
        if x == 0:
            out += b"\x01\x01"
        elif x == 1:
            out += b"\x01\x02"
        else:
            out.append(x)
    return bytes(0xFF - x for x in out).hex() + "ff"


def rev_encode_series(counts: pd.Series) -> pd.Series:
    """Vectorized form used inside pandas UDFs: per-unique-value encode."""
    uniq = pd.unique(counts)
    m = {int(v): rev_encode_long(int(v)) for v in uniq}
    return counts.map(lambda v: m[int(v)])


def encode_domain_rank_uri(domain: str, links_to: int, uri: str) -> str:
    """``IndexClient.encodeDomainRankUri`` (IndexClient.java:313-315)."""
    return f"d:{domain}:{rev_encode_long(links_to)}:{uri}"


def create_total_row(uri: str, links_to: int) -> str:
    """``IndexClient.createTotalRow`` (IndexClient.java:317-319)."""
    return f"t:{rev_encode_long(links_to)}:{uri}"

"""Deterministic synthetic crawl world (FIXTURES.md §1-4).

Everything is seeded and wall-clock-free: the same parameters always
produce byte-identical tables, which is what lets the crawl tests assert
*exact* crawl ordering and URL-seen membership against the pure-python
model, and lets the image verifier regenerate ground-truth pixels from
``image_id`` alone.

The world model:
  * ``n_hosts`` hosts named ``h<k>.com`` (plus a skew knob that
    concentrates pages on host 0);
  * each host has ``pages_per_host`` HTML pages ``http://h<k>.com/p/<i>``;
  * page (k, i) deterministically links to ``fanout`` other pages chosen
    by a hash mix, always cross-host (the reference drops intra-domain
    links at parse time, ArchiveUtil.java:84), and to one image URL
    ``http://img<k mod n_img_hosts>.com/i/<j>.png`` (image URLs are
    detected with the reference's extension predicate, URL.java:209-211);
  * a controlled fraction of emitted raw link strings is malformed to
    exercise URL.isValid rejects (URL.java:77-161).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from webindex_spark.operators import images as img_ops

SEED = 42


def _mix(*parts) -> int:
    h = hashlib.blake2b("|".join(str(p) for p in parts).encode(), digest_size=8)
    return int.from_bytes(h.digest(), "big")


# ----------------------------------------------------------------- the web


def web_hosts(n_hosts: int) -> list[str]:
    return [f"h{k}.com" for k in range(n_hosts)]


def page_url(k: int, i: int) -> str:
    return f"http://h{k}.com/p/{i}"


def image_url(k: int, j: int, n_img_hosts: int) -> str:
    return f"http://img{k % n_img_hosts}.com/i/{j}.png"


def image_id_of(k: int, j: int, n_img_hosts: int) -> str:
    """Canonical URI of the image URL — the join key into the image table
    (FIXTURES.md §2: image_id = canonical URI of the image URL)."""
    return f"com.img{k % n_img_hosts}>>o>/i/{j}.png"


def page_out_urls(
    k: int, i: int, n_hosts: int, pages_per_host: int, fanout: int,
    bad_link_every: int = 17, n_img_hosts: int = 4,
) -> list[str]:
    """Deterministic outbound raw-URL list of page (k, i)."""
    out = []
    for f in range(fanout):
        r = _mix("link", k, i, f)
        dk = r % n_hosts
        if dk == k:  # force cross-host
            dk = (dk + 1) % n_hosts
        di = (r >> 20) % pages_per_host
        out.append(page_url(dk, di))
    if _mix("bad", k, i) % bad_link_every == 0:
        out.append("htttp://broken .example/ uh")  # invalid on purpose
    # one image link per page
    j = _mix("img", k, i) % (pages_per_host // 2 + 1)
    out.append(image_url(k, j, n_img_hosts))
    return out


def gen_web_pandas(
    n_hosts: int = 20, pages_per_host: int = 50, fanout: int = 5,
    skew_host_frac: float = 0.0, n_img_hosts: int = 4,
) -> pd.DataFrame:
    """The crawlable corpus: (url, uri, host, title, out_urls:list[str]).

    ``skew_host_frac`` > 0 moves that fraction of all pages onto host 0
    (hot-domain skew for the salting tests).
    """
    rows = []
    total = n_hosts * pages_per_host
    n_hot = int(total * skew_host_frac)
    idx = 0
    for k in range(n_hosts):
        for i in range(pages_per_host):
            kk, ii = k, i
            if idx < n_hot:
                kk, ii = 0, pages_per_host + idx  # extra pages on host 0
            rows.append(
                {
                    "url": page_url(kk, ii),
                    "uri": f"com.h{kk}>>o>/p/{ii}",
                    "host": f"h{kk}.com",
                    "title": f"page {kk}/{ii}",
                    "out_urls": page_out_urls(
                        kk, ii, n_hosts, pages_per_host, fanout,
                        n_img_hosts=n_img_hosts,
                    ),
                }
            )
            idx += 1
    return pd.DataFrame(rows)


# --------------------------------------------------------------- the images


def image_pixels(image_id: str, w: int = 32, h: int = 24) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(SEED ^ _mix("pix", image_id)))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def image_caption(image_id: str) -> str:
    words = ["amber", "basalt", "cedar", "dune", "ember", "fjord", "grove", "heron"]
    r = _mix("cap", image_id)
    picks = [words[(r >> (4 * i)) % len(words)] for i in range(4)]
    return f"{' '.join(picks)} — {image_id}"


def gen_images_pandas(image_ids: list[str], w: int = 32, h: int = 24) -> pd.DataFrame:
    """The input-hint table: (image_id, bytes, w, h, fmt, caption, phash).
    fmt cycles png/raw/lossy deterministically."""
    fmts = ["png", "raw", "lossy"]
    rows = []
    for iid in sorted(set(image_ids)):
        px = image_pixels(iid, w, h)
        fmt = fmts[_mix("fmt", iid) % 3]
        data = img_ops.encode(px, fmt)
        # phash describes the STORED payload: computed over the decoded
        # bytes (for lossy that is the quantized image), so verification
        # can demand an exact phash match for every format
        ph = img_ops.average_phash(img_ops.decode(data, w, h, fmt))
        rows.append(
            {
                "image_id": iid, "bytes": data, "w": np.int32(w), "h": np.int32(h),
                "fmt": fmt, "caption": image_caption(iid), "phash": np.int64(ph),
            }
        )
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype("int32")
    df["h"] = df["h"].astype("int32")
    df["phash"] = df["phash"].astype("int64")
    return df


def all_image_ids(
    n_hosts: int = 20, pages_per_host: int = 50, n_img_hosts: int = 4
) -> list[str]:
    ids = set()
    for k in range(n_hosts):
        for j in range(pages_per_host // 2 + 1):
            ids.add(image_id_of(k, j, n_img_hosts))
    return sorted(ids)


# --------------------------------------------------------------- the robots


def gen_robots_pandas(n_hosts: int = 20, n_img_hosts: int = 4) -> pd.DataFrame:
    """Per-host rules: every 5th host disallows /p/4* prefixes; crawl
    delays vary deterministically. Image hosts allow everything."""
    rows = []
    for k in range(n_hosts):
        dis = ["/p/4"] if k % 5 == 2 else []
        rows.append(
            {
                "host": f"h{k}.com",
                "disallow": dis,
                "crawl_delay": float(1 + (k % 3)),
            }
        )
    for k in range(n_img_hosts):
        rows.append({"host": f"img{k}.com", "disallow": [], "crawl_delay": 1.0})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------- the seeds


def gen_seeds_pandas(
    n_hosts: int = 20, seeds_per_host: int = 3, invalid_every: int = 7,
    skew_host_frac: float = 0.0,
) -> pd.DataFrame:
    """(url, priority, discovered_epoch) with a deliberate invalid slice.
    Priorities are deterministic doubles; ties broken downstream by uri."""
    rows = []
    n = 0
    for k in range(n_hosts):
        for s in range(seeds_per_host):
            kk = 0 if (skew_host_frac > 0 and (n / max(1, n_hosts * seeds_per_host)) < skew_host_frac) else k
            rows.append(
                {
                    "url": page_url(kk, s),
                    "priority": float((_mix("prio", kk, s) % 1000) / 10.0),
                    "discovered_epoch": 0,
                }
            )
            n += 1
            if n % invalid_every == 0:
                rows.append(
                    {"url": f"http://bad host {n}/", "priority": 1.0, "discovered_epoch": 0}
                )
    return pd.DataFrame(rows)


# ----------------------------------------------------------------- audio


def audio_wave(audio_id: str, n_samples: int = 4096, sr: int = 8000) -> np.ndarray:
    """Deterministic clip: a 3-sine mixture + low noise, params seeded
    from the id (same scheme as image_pixels)."""
    rng = np.random.Generator(np.random.PCG64(SEED ^ _mix("wav", audio_id)))
    t = np.arange(n_samples) / sr
    wave = np.zeros(n_samples)
    for _ in range(3):
        freq = rng.uniform(80.0, sr / 2.5)
        wave += rng.uniform(0.1, 0.3) * np.sin(2 * np.pi * freq * t + rng.uniform(0, 2 * np.pi))
    wave += rng.normal(0, 0.01, n_samples)
    return np.clip(wave, -0.999, 0.999)


def audio_caption(audio_id: str) -> str:
    words = ["chime", "drone", "hum", "pulse", "ring", "swell", "tone", "whirr"]
    r = _mix("acap", audio_id)
    picks = [words[(r >> (4 * i)) % len(words)] for i in range(3)]
    return f"{' '.join(picks)} — {audio_id}"


def gen_audio_pandas(
    audio_ids: list[str], n_samples: int = 4096, sr: int = 8000
) -> pd.DataFrame:
    """The audio input table: (audio_id, bytes, sample_rate, n_samples,
    fmt, caption); rawa = real PCM16 payloads."""
    from webindex_spark.operators import audio as audio_ops

    rows = []
    for aid in sorted(set(audio_ids)):
        wave = audio_wave(aid, n_samples, sr)
        rows.append(
            {
                "audio_id": aid,
                "bytes": audio_ops.encode(wave, "rawa"),
                "sample_rate": np.int32(sr),
                "n_samples": np.int32(n_samples),
                "fmt": "rawa",
                "caption": audio_caption(aid),
            }
        )
    df = pd.DataFrame(rows)
    df["sample_rate"] = df["sample_rate"].astype("int32")
    df["n_samples"] = df["n_samples"].astype("int32")
    return df

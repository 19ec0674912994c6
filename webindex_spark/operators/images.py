"""Image payload operators (BASELINE.json input_hint; SURVEY.md §7.2 M4).

The input table carries ``(image_id:string, bytes:binary, w:int32, h:int32,
fmt:string, caption:string, phash:int64)``.  No image libraries exist in
this container, so the codecs here are dependency-free and deterministic:

  * ``fmt='png'``  — a real, spec-conformant minimal PNG codec (8-bit RGB,
    zlib/DEFLATE, filter 0) written against the public PNG spec; lossless.
  * ``fmt='raw'``  — width*height*3 RGB bytes; lossless.
  * ``fmt='lossy'``— raw RGB quantized to 6 bits/channel; the decoded
    pixels differ from the original by <= 4/channel, i.e. PSNR ~= 44 dB —
    above the north rule's >=40 dB bar, used to exercise the lossy branch
    of the per-row invariant.

``phash`` is a 64-bit average-hash (8x8 block-mean of the grayscale,
thresholded by the global mean) — deterministic, pure numpy.

The per-row verification invariant (north rule): decoded-pixel allclose
for lossless formats, PSNR >= 40 dB for lossy, plus caption equality.
``verify_batch`` implements it over pandas batches; ``verify_images``
lifts it to a DataFrame via mapInPandas (Arrow batches, no per-row
Python at the Spark level).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------------- codecs


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> minimal PNG (color type 2, bit depth 8)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Minimal PNG -> RGB uint8 (h, w, 3); supports what png_encode emits
    plus filters 1 (Sub) and 2 (Up) for robustness."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for row in range(h):
        f = raw[row * (stride + 1)]
        line = np.frombuffer(
            raw[row * (stride + 1) + 1:(row + 1) * (stride + 1)], dtype=np.uint8
        ).copy()
        if f == 0:
            pass
        elif f == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 1:  # Sub
            line = line.astype(np.int16)
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
            line = line.astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {f}")
        out[row] = line
        prev = line
    return out.reshape(h, w, 3)


def lossy_encode(pixels: np.ndarray) -> bytes:
    """Emulated lossy codec: 6 bits/channel quantization (PSNR ~= 44 dB)."""
    q = (pixels & 0xFC) | (pixels >> 6)
    return q.tobytes()


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(bytes(data))
    if fmt in ("raw", "lossy"):
        return np.frombuffer(bytes(data), dtype=np.uint8).reshape(h, w, 3)
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires an image library not present in "
        "this container; plug a real decoder in here on a full cluster"
    )


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "lossy":
        return lossy_encode(pixels)
    raise NotImplementedError(f"encode for fmt={fmt!r}")


# ----------------------------------------------------------- hash / metrics


def average_phash(pixels: np.ndarray) -> int:
    """64-bit average hash: grayscale -> 8x8 block means -> >= global mean.

    Signed int64 (bit 63 becomes the sign bit) to match the table schema
    ``phash:int64``.
    """
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # block-mean resample to 8x8 (pad to multiples of 8 by edge-clamping)
    ys = (np.arange(8 + 1) * h // 8).astype(int)
    xs = (np.arange(8 + 1) * w // 8).astype(int)
    blocks = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks >= blocks.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ------------------------------------------------------- the Spark operator

VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("pixels_ok", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("phash_ok", T.BooleanType()),
        T.StructField("caption_ok", T.BooleanType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def verify_batch(pdf: pd.DataFrame, expected_pixels_fn, expected_caption_fn) -> pd.DataFrame:
    """Per-row invariant over one pandas batch: decoded-pixel allclose
    (lossless) / PSNR >= 40 dB (lossy) + phash recompute + caption equality.

    ``expected_pixels_fn(image_id, w, h) -> np.ndarray`` regenerates the
    ground truth deterministically (synthetic data is seeded by image_id);
    ``expected_caption_fn(image_id) -> str`` likewise.
    """
    rows = []
    for r in pdf.itertuples(index=False):
        exp = expected_pixels_fn(r.image_id, int(r.w), int(r.h))
        got = decode(r.bytes, r.w, r.h, r.fmt)
        if r.fmt == "lossy":
            p = psnr(exp, got)
            pixels_ok = bool(p >= 40.0)
        else:
            p = psnr(exp, got)
            pixels_ok = bool(np.array_equal(exp, got))
        phash_ok = bool(average_phash(got) == r.phash)
        caption_ok = bool(r.caption == expected_caption_fn(r.image_id))
        rows.append(
            {
                "image_id": r.image_id,
                "pixels_ok": pixels_ok,
                "psnr_db": float(min(p, 1e9)),
                "phash_ok": phash_ok,
                "caption_ok": caption_ok,
                "ok": pixels_ok and phash_ok and caption_ok,
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in VERIFY_SCHEMA.fields])


def verify_images(images: DataFrame, expected_pixels_fn, expected_caption_fn) -> DataFrame:
    """mapInPandas lift of verify_batch: Arrow-batched, partition-parallel.
    The decode kernel is per-image numpy work; Spark's only job is moving
    binary columns in Arrow batches — which is exactly the right division
    of labor for multimodal columns at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield verify_batch(pdf, expected_pixels_fn, expected_caption_fn)

    return images.mapInPandas(run, schema=VERIFY_SCHEMA)


# ------------------------------------------------- resize / features / video
#
# The rest of the training-pipeline image stack.  Same architecture rule as
# verify_images: Spark moves binary columns in Arrow batches and handles
# partitioning; the per-image kernel is vectorized numpy.  The resize and
# feature kernels are REAL (pure-numpy bilinear/nearest, histograms);
# only foreign codecs are stubbed (decode() raises NotImplementedError for
# formats that need an image library this container lacks).


def resize_kernel(pixels: np.ndarray, out_w: int, out_h: int,
                  method: str = "bilinear") -> np.ndarray:
    """RGB uint8 (h, w, 3) -> (out_h, out_w, 3), half-pixel-center sampling
    (the OpenCV/PIL convention): src = (dst + 0.5) * in/out - 0.5."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    if method == "nearest":
        yi = np.clip(np.rint(ys), 0, h - 1).astype(int)
        xi = np.clip(np.rint(xs), 0, w - 1).astype(int)
        return pixels[yi][:, xi]
    if method != "bilinear":
        raise NotImplementedError(f"resize method {method!r}")
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(int)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(int)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = pixels.astype(np.float64)
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def resize_images(images: DataFrame, out_w: int, out_h: int,
                  method: str = "bilinear", out_fmt: str = "png") -> DataFrame:
    """decode -> resize -> re-encode -> re-phash, per Arrow batch.

    Output keeps the input_hint table shape, so resized tables compose
    with every other image operator (verify, features, dedup-by-phash).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = resize_kernel(
                    decode(r.bytes, r.w, r.h, r.fmt), out_w, out_h, method
                )
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": encode(px, out_fmt),
                        "w": out_w,
                        "h": out_h,
                        "fmt": out_fmt,
                        "caption": r.caption,
                        "phash": average_phash(px),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_SCHEMA.fields])

    return images.mapInPandas(run, schema=IMAGE_SCHEMA)


FEATURE_DIM = 3 + 3 + 24 + 1  # per-channel mean, std, 8-bin hists, entropy

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def feature_kernel(pixels: np.ndarray) -> np.ndarray:
    """Deterministic 31-dim image descriptor: per-channel mean/std (scaled
    to [0,1]), per-channel 8-bin normalized histograms, and gray-level
    entropy.  Real feature extraction (no stub) — the descriptor feeds the
    same ANN/simsearch operators as text embeddings."""
    p = pixels.astype(np.float64)
    means = p.mean(axis=(0, 1)) / 255.0
    stds = p.std(axis=(0, 1)) / 255.0
    hists = [
        np.bincount((pixels[..., c].ravel() >> 5), minlength=8)
        / pixels[..., c].size
        for c in range(3)
    ]
    gray = (p @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    gh = np.bincount(gray.ravel() >> 4, minlength=16) / gray.size
    nz = gh[gh > 0]
    entropy = float(-(nz * np.log2(nz)).sum()) / 4.0  # / log2(16)
    return np.concatenate([means, stds, *hists, [entropy]]).astype(np.float32)


def image_features(images: DataFrame) -> DataFrame:
    """(image_id, embedding: array<float>) — plugs straight into
    operators/simsearch (brute_force_topk / lsh_topk) for image
    near-duplicate detection and similarity search."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "image_id": list(pdf["image_id"]),
                "embedding": [
                    feature_kernel(decode(r.bytes, r.w, r.h, r.fmt))
                    for r in pdf.itertuples(index=False)
                ],
            }
            yield pd.DataFrame(out, columns=["image_id", "embedding"])

    return images.mapInPandas(run, schema=FEATURES_SCHEMA)


# Video: opaque binary + typed metadata.  fmt='rawv' is a REAL codec
# (n_frames contiguous raw RGB frames); real container formats (mp4 et al.)
# need a decoder this sandbox lacks -> decode raises NotImplementedError,
# but the Spark-side plumbing (schema, batching, explode shape) is the
# production path either way.

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def decode_frame(data: bytes, w: int, h: int, n_frames: int, fmt: str,
                 idx: int) -> np.ndarray:
    if fmt == "rawv":
        sz = w * h * 3
        return np.frombuffer(
            bytes(data[idx * sz:(idx + 1) * sz]), dtype=np.uint8
        ).reshape(h, w, 3)
    raise NotImplementedError(
        f"frame decode for fmt={fmt!r} requires a video library not present "
        "in this container; plug ffmpeg/pyav in here on a full cluster"
    )


def sample_frames(videos: DataFrame, every: int = 10,
                  out_fmt: str = "png") -> DataFrame:
    """One FRAME row per sampled frame (indices 0, every, 2*every, ...) —
    the video analog of the image table, feeding the same downstream
    operators (phash dedup, features, verify)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for idx in range(0, int(r.n_frames), every):
                    px = decode_frame(r.bytes, r.w, r.h, r.n_frames, r.fmt, idx)
                    rows.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": idx,
                            "bytes": encode(px, out_fmt),
                            "w": int(r.w),
                            "h": int(r.h),
                            "fmt": out_fmt,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


def phash_near_dups(
    images: DataFrame, max_hamming: int = 6, blocks: int = 8,
    id_col: str = "image_id", phash_col: str = "phash",
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance —
    the multimodal entry of the dedup stack (columns id_a, id_b,
    hamming).

    Runs straight off the stored ``phash`` column (no decode pass) and
    delegates to the simhash block-trick join
    (dedup.simhash_near_pairs): any pair within ``max_hamming < blocks``
    shares at least one exact 64/blocks-bit block, so candidates come
    from per-block bucket joins and the exact bit_count verify runs on
    candidates only — never an all-pairs stage, the same 100 TB posture
    as the text dedup lane.  ``max_bucket`` is the hot-bucket guard
    (dedup.simhash_near_pairs): near-duplicate image corpora concentrate
    on few phash block values (solid-color thumbnails, logo tiles), and
    an unguarded bucket of n members costs n²/2 candidate pairs — hot
    buckets are dropped whole, loggable via
    dedup.dropped_block_buckets."""
    import pyspark.sql.functions as F

    from webindex_spark.operators import dedup

    sig = images.select(
        F.col(id_col).alias("id"), F.col(phash_col).alias("simhash")
    )
    return dedup.simhash_near_pairs(
        sig, max_hamming=max_hamming, blocks=blocks, max_bucket=max_bucket
    )


GATE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("pix_sum", T.LongType()),
        T.StructField("gray_sum", T.LongType()),
        T.StructField("iphash", T.LongType()),
    ]
)


def gate_features(images: DataFrame) -> DataFrame:
    """Per-row pixel-integrity descriptor through the SAME decode +
    mapInPandas plumbing as verify_images, reduced to INTEGER-EXACT
    values a SQL oracle can recompute from the raw pixel ints: total
    channel sum, gray1000 sum (299R + 587G + 114B — the production
    grayscale weights times 1000, so no float dot product), and an
    integer 8x8 average hash.  The hash compares 64·block_sum against
    the total gray sum (equal block areas ⇒ identical bits to a
    mean-threshold over block means, with no float rounding), packed
    into a signed int64 via two 32-bit halves — the same arithmetic on
    both engines.  Requires w and h multiples of 8.  The production
    float `average_phash` stays pytest-locked; this gate certifies the
    DECODE path (including the real PNG/zlib codec) and per-row pixel
    integrity by value hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ps, gs, hs = [], [], []
            for r in pdf.itertuples():
                px = decode(r.bytes, int(r.w), int(r.h), r.fmt).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                ps.append(int(px.sum()))
                gray = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                gs.append(int(gray.sum()))
                bsum = gray.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
                bits = (64 * bsum >= gray.sum()).flatten()
                hi = lo = 0
                for k in range(32):
                    hi |= int(bits[k]) << (31 - k)
                    lo |= int(bits[32 + k]) << (31 - k)
                hs.append((hi - ((1 << 32) if hi >= (1 << 31) else 0)) * (1 << 32) + lo)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "pix_sum": np.asarray(ps, dtype=np.int64),
                    "gray_sum": np.asarray(gs, dtype=np.int64),
                    "iphash": np.asarray(hs, dtype=np.int64),
                }
            )

    return images.mapInPandas(run, schema=GATE_SCHEMA)

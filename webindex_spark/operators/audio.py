"""Audio as an opaque binary column with typed metadata — the third
multimodal lane (image: operators/images.py, video: images.sample_frames).

The brief's contract (multimodal columns): the decode step for foreign
containers is honestly stubbed (no audio libraries exist in this
container), while the Spark-side plumbing — schema, Arrow batch shape,
mapInPandas kernel signatures, partition parallelism — is real and
tested.  ``rawa`` (PCM16 little-endian mono) is a REAL codec, exercised
end-to-end; mp3/ogg/flac raise NotImplementedError at the decode seam a
deployment would swap for a library call.

Table shape: ``(audio_id string, bytes binary, sample_rate int,
n_samples int, fmt string, caption string)``.

Kernels (all pure numpy over Arrow batches, no shuffle — the same
embarrassingly-partition-parallel posture as the image lane, so the
measured image-job scaling ~1.0 transfers):
  * :func:`decode` / :func:`encode` — PCM16 <-> float64 waveform in [-1, 1).
  * :func:`clip_features` — fixed-dim descriptor per clip (RMS, ZCR,
    8 coarse spectral-band energy ratios via rfft) feeding the same
    simsearch shapes as image features.
  * :func:`resample_kernel` — linear-interpolation rate conversion
    (the audio analog of images.resize_kernel), per-sample oracle-tested.
  * :func:`audio_features` / :func:`resample_audio` — mapInPandas
    DataFrame wrappers.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F  # noqa: F401  (kept for API symmetry)
import pyspark.sql.types as T
from pyspark.sql import DataFrame

SUPPORTED_FMTS = ("rawa",)


def decode(data: bytes, n_samples: int, fmt: str) -> np.ndarray:
    """binary payload -> float64 waveform in [-1, 1), length n_samples."""
    if fmt == "rawa":
        wave = np.frombuffer(data, dtype="<i2", count=n_samples)
        return wave.astype(np.float64) / 32768.0
    raise NotImplementedError(
        f"audio container {fmt!r}: no audio codec library exists in this "
        "environment — a deployment swaps this seam for e.g. soundfile"
    )


def encode(wave: np.ndarray, fmt: str = "rawa") -> bytes:
    if fmt == "rawa":
        q = np.clip(np.round(wave * 32768.0), -32768, 32767).astype("<i2")
        return q.tobytes()
    raise NotImplementedError(f"audio container {fmt!r}")


N_SPECTRAL_BANDS = 8
FEATURE_DIM = 2 + N_SPECTRAL_BANDS  # rms, zcr, band energy ratios


def clip_features(wave: np.ndarray) -> np.ndarray:
    """Fixed FEATURE_DIM descriptor: [rms, zero-crossing rate, 8 coarse
    spectral-band energy ratios].  Deterministic, scale-normalized —
    the audio analog of images.feature_kernel, and shaped to feed
    simsearch (brute force / LSH / IVF) directly."""
    n = wave.size
    if n == 0:
        return np.zeros(FEATURE_DIM)
    rms = float(np.sqrt(np.mean(wave * wave)))
    zcr = float(np.mean(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
    spec = np.abs(np.fft.rfft(wave)) ** 2
    # drop DC, split the positive spectrum into 8 equal bands
    spec = spec[1:]
    if spec.size < N_SPECTRAL_BANDS:
        spec = np.pad(spec, (0, N_SPECTRAL_BANDS - spec.size))
    bands = np.array(
        [b.sum() for b in np.array_split(spec, N_SPECTRAL_BANDS)]
    )
    total = bands.sum()
    ratios = bands / total if total > 0 else np.zeros(N_SPECTRAL_BANDS)
    return np.concatenate(([rms, zcr], ratios))


def resample_kernel(wave: np.ndarray, from_sr: int, to_sr: int) -> np.ndarray:
    """Linear-interpolation resample to round(n * to_sr / from_sr)
    samples — the deterministic numpy oracle the DataFrame op is tested
    against (the audio analog of bilinear image resize)."""
    n = wave.size
    m = int(round(n * to_sr / from_sr))
    if m == n:
        return wave.copy()
    # sample positions of the output grid in input coordinates
    pos = np.arange(m, dtype=np.float64) * (from_sr / to_sr)
    return np.interp(pos, np.arange(n, dtype=np.float64), wave)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, sample_rate, n_samples, features: array<double>) via
    mapInPandas — decode + descriptor per Arrow batch, partition-parallel,
    no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                clip_features(decode(r.bytes, int(r.n_samples), r.fmt)).tolist()
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "sample_rate": pdf["sample_rate"].astype("int32"),
                    "n_samples": pdf["n_samples"].astype("int32"),
                    "features": feats,
                }
            )

    return audio.mapInPandas(run, schema=FEATURES_SCHEMA)


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
    ]
)


def resample_audio(audio: DataFrame, to_sr: int) -> DataFrame:
    """Rate-convert every clip to ``to_sr`` (decode -> linear resample ->
    re-encode rawa), preserving the table shape so the output feeds every
    other audio operator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                wave = decode(r.bytes, int(r.n_samples), r.fmt)
                out = resample_kernel(wave, int(r.sample_rate), to_sr)
                rows.append(
                    {
                        "audio_id": r.audio_id,
                        "bytes": encode(out, "rawa"),
                        "sample_rate": np.int32(to_sr),
                        "n_samples": np.int32(out.size),
                        "fmt": "rawa",
                        "caption": r.caption,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESAMPLED_SCHEMA.fields]
            )

    return audio.mapInPandas(run, schema=RESAMPLED_SCHEMA)


GATE_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def gate_features(audio: DataFrame) -> DataFrame:
    """RMS/ZCR through the SAME decode + mapInPandas plumbing as
    ``audio_features``, reduced to the INTEGER-EXACT descriptor a SQL
    oracle can recompute: the int16 samples are recovered exactly from
    the decoded float wave (the codec's /32768 is lossless round-trip),
    so sum-of-squares and sign-change counts are plain integers both
    engines compute identically — no float-summation-order hazard.
    RMS = sqrt(sum_sq/n)/32768 and ZCR = crossings/(n-1) then derive
    from the longs by single correctly-rounded IEEE ops (crawl_queries'
    ``audio_gate`` computes them identically on both sides)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sum_sqs, zcs = [], []
            for r in pdf.itertuples():
                wave = decode(r.bytes, int(r.n_samples), r.fmt)
                q = np.round(wave * 32768.0).astype(np.int64)
                sum_sqs.append(int((q * q).sum()))
                zcs.append(int(((q[1:] < 0) != (q[:-1] < 0)).sum()))
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "n_samples": pdf["n_samples"].astype("int32"),
                    "sum_sq": np.asarray(sum_sqs, dtype=np.int64),
                    "zero_crossings": np.asarray(zcs, dtype=np.int64),
                }
            )

    return audio.mapInPandas(run, schema=GATE_SCHEMA)

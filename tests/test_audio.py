"""Audio multimodal lane: real rawa (PCM16) codec end-to-end, numpy
oracles for features/resample, honest NotImplementedError at the foreign-
container decode seam, and duplicate retrieval through the shared
simsearch stack."""

from __future__ import annotations

import numpy as np
import pytest

from webindex_spark.operators import audio as audio_ops
from webindex_spark.operators import simsearch, synth


def test_rawa_codec_roundtrip():
    wave = synth.audio_wave("a0", 2048, 8000)
    back = audio_ops.decode(audio_ops.encode(wave, "rawa"), 2048, "rawa")
    assert np.abs(back - wave).max() <= 1.0 / 32768  # PCM16 quantization


def test_foreign_containers_honestly_stubbed():
    with pytest.raises(NotImplementedError):
        audio_ops.decode(b"\x00" * 16, 8, "mp3")
    with pytest.raises(NotImplementedError):
        audio_ops.encode(np.zeros(8), "ogg")


def test_resample_kernel_oracle():
    wave = synth.audio_wave("r1", 1000, 8000)
    out = audio_ops.resample_kernel(wave, 8000, 4000)
    assert out.size == 500
    # linear interpolation at exactly 2:1: every output sample sits on an
    # input sample
    assert np.allclose(out, wave[::2][:500])
    up = audio_ops.resample_kernel(wave, 8000, 16000)
    assert up.size == 2000
    assert np.allclose(up[::2], wave)  # originals preserved on the grid


def test_audio_features_dataframe_matches_numpy(spark):
    ids = [f"clip/{i}" for i in range(12)]
    df = spark.createDataFrame(synth.gen_audio_pandas(ids, 2048, 8000))
    got = {
        r["audio_id"]: np.array(r["features"])
        for r in audio_ops.audio_features(df).collect()
    }
    assert len(got) == 12
    for aid in ids:
        want = audio_ops.clip_features(synth.audio_wave(aid, 2048, 8000))
        # PCM16 quantization perturbs the waveform slightly
        assert np.allclose(got[aid], want, atol=2e-3), aid
        assert got[aid].shape == (audio_ops.FEATURE_DIM,)


def test_resample_audio_dataframe(spark):
    ids = [f"clip/{i}" for i in range(4)]
    df = spark.createDataFrame(synth.gen_audio_pandas(ids, 2048, 8000))
    out = {r["audio_id"]: r for r in audio_ops.resample_audio(df, 4000).collect()}
    for aid in ids:
        r = out[aid]
        assert r["sample_rate"] == 4000 and r["n_samples"] == 1024
        wave = synth.audio_wave(aid, 2048, 8000)
        want = audio_ops.resample_kernel(
            audio_ops.decode(audio_ops.encode(wave), 2048, "rawa"), 8000, 4000
        )
        back = audio_ops.decode(r["bytes"], 1024, "rawa")
        assert np.abs(back - want).max() <= 2.0 / 32768
        assert r["caption"] == synth.audio_caption(aid)


def test_audio_near_dup_through_simsearch(spark):
    """A resampled copy of a clip retrieves its original as the nearest
    neighbor by feature cosine — the audio dedup path reuses the exact
    simsearch operators (no audio-specific ANN code)."""
    ids = [f"clip/{i}" for i in range(20)]
    pdf = synth.gen_audio_pandas(ids, 2048, 8000)
    df = spark.createDataFrame(pdf)
    feats = audio_ops.audio_features(df)
    corpus = feats.selectExpr("audio_id AS vec_id", "features AS embedding")
    # near-duplicate: clip/0 mildly rate-shifted 8000 -> 7900 (band edges
    # move ~1%, so the descriptor stays close; a 2x downsample would
    # re-map every frequency to a different band — the descriptor is
    # deliberately NOT invariant to Nyquist-halving)
    dup = audio_ops.audio_features(
        audio_ops.resample_audio(
            spark.createDataFrame(pdf[pdf.audio_id == "clip/0"]), 7900
        )
    )
    queries = dup.selectExpr("'dup' AS q_id", "features AS q_emb")
    top = simsearch.brute_force_topk(corpus, queries, k=1).collect()
    assert top[0]["vec_id"] == "clip/0" and top[0]["cosine"] > 0.95


def test_gate_features_matches_clip_features(spark):
    """The oracle-gate descriptor (integer sum_sq / crossings through the
    same decode plumbing) agrees with clip_features' float rms/zcr:
    rms == sqrt(sum_sq/n)/32768 and zcr == crossings/(n-1) exactly,
    because wave == q/32768 losslessly."""
    import numpy as np

    ids = [f"au{i}" for i in range(6)]
    n = 2048
    df = spark.createDataFrame(synth.gen_audio_pandas(ids, n, 8000))
    got = {
        r["audio_id"]: (r["sum_sq"], r["zero_crossings"])
        for r in audio_ops.gate_features(df).collect()
    }
    for aid in ids:
        wave = synth.audio_wave(aid, n, 8000)
        q = np.round(
            np.clip(wave, -1, 32767 / 32768) * 32768.0
        ).astype(np.int64)
        feats = audio_ops.clip_features(q / 32768.0)
        sum_sq, zc = got[aid]
        assert abs(np.sqrt(sum_sq / n) / 32768.0 - feats[0]) < 1e-12
        assert zc == round(feats[1] * (n - 1))

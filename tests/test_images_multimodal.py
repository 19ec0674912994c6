"""Multimodal image/video operators beyond verify: resize, feature
extraction (feeding the same ANN operators as text embeddings), and video
frame sampling.  Kernels are checked against independent per-pixel python
oracles; the Spark level is exercised through mapInPandas end to end."""

import numpy as np
import pytest

from webindex_spark.operators import images as img_ops
from webindex_spark.operators import simsearch, synth


def _images_df(spark, ids, w=32, h=24):
    return spark.createDataFrame(synth.gen_images_pandas(ids, w, h))


def _bilinear_oracle(px, out_w, out_h):
    h, w, _ = px.shape
    out = np.zeros((out_h, out_w, 3), dtype=np.uint8)
    for dy in range(out_h):
        for dx in range(out_w):
            sy = min(max((dy + 0.5) * h / out_h - 0.5, 0), h - 1)
            sx = min(max((dx + 0.5) * w / out_w - 0.5, 0), w - 1)
            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            fy, fx = sy - y0, sx - x0
            for c in range(3):
                v = (px[y0, x0, c] * (1 - fx) * (1 - fy)
                     + px[y0, x1, c] * fx * (1 - fy)
                     + px[y1, x0, c] * (1 - fx) * fy
                     + px[y1, x1, c] * fx * fy)
                out[dy, dx, c] = int(np.clip(np.rint(v), 0, 255))
    return out


def test_resize_kernel_vs_oracle():
    px = synth.image_pixels("k1", 13, 9)
    got = img_ops.resize_kernel(px, 7, 5, "bilinear")
    assert np.array_equal(got, _bilinear_oracle(px, 7, 5))
    # identity resize is exact for both methods
    assert np.array_equal(img_ops.resize_kernel(px, 13, 9, "bilinear"), px)
    assert np.array_equal(img_ops.resize_kernel(px, 13, 9, "nearest"), px)
    # nearest picks real source pixels
    nn = img_ops.resize_kernel(px, 26, 18, "nearest")
    assert set(np.unique(nn)) <= set(np.unique(px))
    with pytest.raises(NotImplementedError):
        img_ops.resize_kernel(px, 4, 4, "lanczos")


def test_resize_images_dataframe(spark):
    ids = [f"img/{i}" for i in range(12)]
    df = _images_df(spark, ids)
    out = img_ops.resize_images(df, 16, 12, "bilinear", out_fmt="png")
    rows = {r["image_id"]: r for r in out.collect()}
    assert len(rows) == 12 and all(r["w"] == 16 and r["h"] == 12 for r in rows.values())
    # decoded output == kernel applied to the original pixels, bit-exact
    rid = ids[3]
    want = img_ops.resize_kernel(synth.image_pixels(rid, 32, 24), 16, 12)
    got = img_ops.png_decode(bytes(rows[rid]["bytes"]))
    assert np.array_equal(got, want)
    assert rows[rid]["phash"] == img_ops.average_phash(want)
    assert rows[rid]["caption"] == synth.image_caption(rid)


def test_image_features_feed_simsearch(spark):
    """Feature vectors plug into the SAME ANN operator as text embeddings:
    an exact duplicate image is the top-1 cosine neighbor at ~1.0."""
    ids = [f"img/{i}" for i in range(20)]
    pdf = synth.gen_images_pandas(ids, 32, 24)
    dup = pdf.iloc[[0]].copy()
    dup["image_id"] = "img/dup-of-0"
    import pandas as pd

    df = spark.createDataFrame(pd.concat([pdf, dup], ignore_index=True))
    emb = img_ops.image_features(df)
    first = emb.where("image_id = 'img/0'").collect()[0]
    assert len(first["embedding"]) == img_ops.FEATURE_DIM
    queries = (
        emb.where("image_id = 'img/0'")
        .selectExpr("image_id AS q_id", "embedding AS q_emb")
    )
    top = simsearch.brute_force_topk(
        emb, queries, k=1, id_col="image_id", q_id_col="q_id"
    ).collect()
    assert top[0]["image_id"] == "img/dup-of-0"
    assert abs(top[0]["cosine"] - 1.0) < 1e-9


def test_sample_frames_rawv(spark):
    import pandas as pd

    w, h, n_frames = 8, 6, 25
    frames = [synth.image_pixels(f"v0/f{i}", w, h) for i in range(n_frames)]
    blob = b"".join(f.tobytes() for f in frames)
    vdf = spark.createDataFrame(
        pd.DataFrame([{"video_id": "v0", "bytes": blob, "w": w, "h": h,
                       "n_frames": n_frames, "fmt": "rawv"}]),
    )
    out = img_ops.sample_frames(vdf, every=10, out_fmt="raw").collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 10, 20]
    for r in out:
        got = np.frombuffer(bytes(r["bytes"]), dtype=np.uint8).reshape(h, w, 3)
        assert np.array_equal(got, frames[r["frame_idx"]])
    with pytest.raises(NotImplementedError):
        img_ops.decode_frame(b"", 1, 1, 1, "mp4", 0)


def test_phash_near_dups_finds_planted_pair(spark):
    """Retrieval off the stored phash column: a hash 3 bits from image
    0's (a re-encode-level perturbation) is found with its exact
    distance; the 40 unrelated synth-image hashes produce no pairs.
    (The perturbation is planted at the hash level deliberately — the
    synth images are near-uniform noise, for which an average-hash is
    legitimately unstable to global-brightness edits; the operator's
    contract is over the hashes.)"""
    ids = [f"com.img>>o>/d/{i}.png" for i in range(40)]
    rows = [
        (iid, int(img_ops.average_phash(synth.image_pixels(iid, 32, 24))))
        for iid in ids
    ]
    base_hash = rows[0][1]
    near_hash = base_hash ^ (1 << 5) ^ (1 << 20) ^ (1 << 41)
    rows.append(("com.img>>o>/d/0-tweaked.png", near_hash))
    df = spark.createDataFrame(rows, ["image_id", "phash"])
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in img_ops.phash_near_dups(df, max_hamming=6).collect()
    }
    key = tuple(sorted([ids[0], "com.img>>o>/d/0-tweaked.png"]))
    assert pairs.get(key) == 3
    assert all(k == key for k in pairs), pairs  # no random-pair noise

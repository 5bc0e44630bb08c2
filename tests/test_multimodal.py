"""Multimodal plumbing: vectorized decode, resize composition, frame
sampling — over the deterministic synthetic payloads (codecs stubbed,
operators/multimodal.py module docstring)."""

import pytest

from pywdcollections_spark.operators.multimodal import (
    _decode_image,
    extract_media_features,
    resize_media,
    sample_frames,
    synthetic_media,
)


def test_decode_stub_raises_for_real_codec():
    with pytest.raises(NotImplementedError):
        _decode_image(b"\x00" * 16, real_codec=True)


def test_extract_features_matches_scalar_decoder(spark):
    media = synthetic_media(spark, 32)
    rows = {r["media_id"]: r for r in extract_media_features(media).collect()}
    pays = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(rows) == 32
    for i, p in pays.items():
        h, w, feat = _decode_image(p)
        r = rows[i]
        assert (r["height"], r["width"], r["n_bytes"]) == (h, w, len(p))
        assert [round(float(x), 4) for x in r["feature"]] == feat


def test_resize_composes_with_feature_extraction(spark):
    media = synthetic_media(spark, 16)
    small = resize_media(media, max_body_bytes=16)
    out = {r["media_id"]: r for r in small.collect()}
    assert all(len(bytes(r["payload"])) == 4 + 16 for r in out.values())
    assert all(r["meta"]["n_bytes"] == 20 for r in out.values())
    feats = extract_media_features(small).collect()
    assert len(feats) == 16       # schema-compatible downstream


def test_sample_frames_deterministic(spark):
    fr = sample_frames(synthetic_media(spark, 8), frame_bytes=8, stride=2)
    rows = fr.collect()
    assert len(rows) == 8 * 4     # frames 0,2,4,6 per media
    by_key = {(r["media_id"], r["frame_idx"]): r for r in rows}
    i, k = 5, 4
    exp = round(sum((i * j) % 251 for j in range(k * 8, k * 8 + 8)) / 8, 4)
    r = by_key[(i, k)]
    assert (r["offset"], r["frame_bytes"], r["mean"]) == (4 + k * 8, 8, exp)

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyrope_spark.multimodal import (
    decode_image_stub,
    extract_features,
    frame_sample_stub,
    media_stats,
    resize_image_stub,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img1", "image", bytearray(b"\x89PNGfakepayload1"), "image/png"),
        ("img2", "image", bytearray(b"\x89PNGfakepayload2"), "image/png"),
        ("vid1", "video", bytearray(b"\x00\x00ftypfakemp4"), "video/mp4"),
    ]
    return spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, mime string"
    ).cache()


def test_metadata_and_stats(media):
    meta = with_media_metadata(media)
    rows = {r["media_id"]: r for r in meta.collect()}
    assert rows["img1"]["payload_bytes"] == 16
    assert len(rows["img1"]["payload_sha1"]) == 40
    stats = {r["kind"]: r for r in media_stats(media).collect()}
    assert stats["image"]["n"] == 2 and stats["video"]["n"] == 1


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_image_stub(media.filter("kind = 'image'")).collect()


def test_decode_resize_features_pipeline(media):
    imgs = media.filter("kind = 'image'")
    decoded = decode_image_stub(imgs, out_h=16, out_w=16, deterministic_fake=True)
    rows = decoded.collect()
    assert len(rows) == 2
    assert all(len(r["pixels"]) == 16 * 16 * 3 for r in rows)
    # deterministic: same payload -> same pixels across runs
    again = decode_image_stub(imgs, out_h=16, out_w=16, deterministic_fake=True).collect()
    assert {r["media_id"]: r["pixels"] for r in rows} == {
        r["media_id"]: r["pixels"] for r in again
    }
    resized = resize_image_stub(decoded, 8, 8)
    assert all(len(r["pixels"]) == 8 * 8 * 3 for r in resized.collect())
    feats = extract_features(decoded).collect()
    assert all(len(r["features"]) == 7 for r in feats)


def test_frame_sampling(media):
    frames = frame_sample_stub(
        media.filter("kind = 'video'"), every_n=10, deterministic_fake=True
    ).collect()
    assert [r["frame_no"] for r in frames] == [0, 10, 20]
    assert all(len(r["pixels"]) == 8 * 8 * 3 for r in frames)

"""Multimodal plumbing: schemas, Arrow batching, 1->k frame explosion."""

import pytest
from pyspark.sql import functions as F

from geolake_spark.functions import media

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 100
JPG = b"\xff\xd8\xff\xe0" + b"\x01" * 1000
RAW = b"justbytes" * 50


@pytest.fixture(scope="module")
def blobs(spark):
    return spark.createDataFrame(
        [(1, PNG), (2, JPG), (3, RAW)], ["media_id", "payload"])


def test_decode_image_meta(blobs):
    out = media.decode_image_meta(blobs).select("media_id", "meta.*")
    rows = {r["media_id"]: r.asDict() for r in out.collect()}
    assert rows[1]["format"] == "png" and rows[2]["format"] == "jpeg"
    assert rows[3]["format"] == "unknown"
    assert rows[1]["byte_len"] == len(PNG)
    w, h = media.fake_dims(JPG)
    assert (rows[2]["width"], rows[2]["height"]) == (w, h)


def test_decode_real_path_is_stubbed(blobs):
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        media.decode_image_meta(blobs, fake=False).collect()


def test_feature_extraction_shape_and_determinism(blobs):
    out = media.extract_image_features(blobs, dim=8)
    rows = {r["media_id"]: r["features"] for r in out.collect()}
    assert all(len(v) == 8 for v in rows.values())
    assert all(abs(sum(v) - 1.0) < 1e-5 for v in rows.values())
    rows2 = {r["media_id"]: r["features"] for r in
             media.extract_image_features(blobs, dim=8).collect()}
    assert rows == rows2  # deterministic


def test_frame_sampling_explodes(blobs):
    out = media.sample_video_frames(blobs, every_n=4)
    per = out.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)  # 16 windows / every 4
    frames = out.filter(F.col("media_id") == 2).orderBy("frame_idx").collect()
    assert all(len(bytes(r["frame"])) > 0 for r in frames)

"""Multimodal plumbing: schema, Arrow batch shape, stubbed decode."""

import pytest
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_stub,
    decode_media,
)


def test_stub_is_deterministic_and_gated():
    w1, h1 = decode_image_stub(b"payload-bytes")
    w2, h2 = decode_image_stub(b"payload-bytes")
    assert (w1, h1) == (w2, h2)
    assert 64 <= w1 < 64 + 1920 and 64 <= h1 < 64 + 1080
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"x", real_decode=True)
    assert decode_image_stub(None) == (0, 0)


def test_decode_media_pipeline(spark):
    rows = [
        (1, b"\x89PNG-fake-image-data", "image", None),
        (2, b"RIFF-fake-audio", "audio", None),
        (3, None, "image", None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_media(df).collect()}
    assert len(out) == 3
    assert out[1]["payload_bytes"] == len(b"\x89PNG-fake-image-data")
    assert out[3]["payload_bytes"] == 0 and out[3]["width"] == 0
    assert out[2]["feature_norm"] > 0
    # partitioned execution yields identical results (Arrow batch safety)
    out4 = {r["media_id"]: r for r in decode_media(df.repartition(4)).collect()}
    assert {k: (v["width"], v["height"]) for k, v in out.items()} \
        == {k: (v["width"], v["height"]) for k, v in out4.items()}

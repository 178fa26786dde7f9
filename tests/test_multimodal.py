"""Multimodal plumbing: schema, Arrow batch shape, stubbed decode."""

import pytest

from demo_cdc_users_airline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_stub,
    decode_media,
    resize_stub,
    sample_frames,
    sample_frames_stub,
)


def test_stub_is_deterministic_and_gated():
    w1, h1 = decode_image_stub(b"payload-bytes")
    w2, h2 = decode_image_stub(b"payload-bytes")
    assert (w1, h1) == (w2, h2)
    assert 64 <= w1 < 64 + 1920 and 64 <= h1 < 64 + 1080
    # real_decode now dispatches to the REAL codec: unknown containers
    # raise ValueError; genuine PNGs return their true dimensions
    with pytest.raises(ValueError):
        decode_image_stub(b"x", real_decode=True)
    import numpy as np

    from demo_cdc_users_airline_spark.operators.media_codec import (
        encode_png_gray,
    )

    png = encode_png_gray(np.zeros((3, 5), dtype=np.uint8))
    assert decode_image_stub(png, real_decode=True) == (5, 3)
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


def test_resize_and_frame_sampling(spark):
    p, w, h = resize_stub(b"x" * 1000, 1920, 1080, 64, 64)
    assert (w, h) == (64, 64) and 0 < len(p) < 1000
    assert resize_stub(None, 0, 0, 64, 64)[0] == b""

    frames = sample_frames_stub(b"0123456789abcdef", n_frames=8, every_k=2)
    assert len(frames) == 4 and all(isinstance(f, bytes) for f in frames)
    assert sample_frames_stub(b"", 8, 2) == []

    rows = [(i, b"video-payload-%d" % i * 20, "video", None) for i in range(5)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_frames(df, n_frames=8, every_k=2).collect()
    # fan-out: each media row produced multiple frame rows
    per_media = {}
    for r in out:
        per_media.setdefault(r["media_id"], []).append(r)
    assert set(per_media) == {0, 1, 2, 3, 4}
    assert all(len(v) >= 2 for v in per_media.values())
    assert all(r["frame_bytes"] == len(r["frame"]) for r in out)


def test_resize_real_png_path():
    """PNG payloads take the REAL resize path: decode -> nearest-neighbor
    -> re-encode; the output is a valid PNG whose pixels equal the exact
    (2y, 2x) sampling rule."""
    import numpy as np

    from demo_cdc_users_airline_spark.operators.media_codec import (
        decode_png,
        encode_png_gray,
    )

    px = np.arange(8 * 16, dtype=np.uint8).reshape(8, 16)
    payload, w, h = resize_stub(encode_png_gray(px), 16, 8, 8, 4)
    assert (w, h) == (8, 4)
    got_w, got_h, out = decode_png(payload)
    assert (got_w, got_h) == (8, 4)
    assert np.array_equal(out[:, :, 0], px[::2][:, ::2])


def test_sample_frames_real_gif_path():
    """GIF payloads take the REAL frame-sample path: LZW decode, every
    k-th frame re-encoded as a valid PNG with the exact source pixels."""
    import numpy as np

    from demo_cdc_users_airline_spark.operators.media_codec import (
        decode_png,
        encode_gif_gray,
    )

    rng = np.random.RandomState(29)
    frames = [rng.randint(0, 256, (4, 5)).astype(np.uint8) for _ in range(6)]
    out = sample_frames_stub(encode_gif_gray(frames), n_frames=6, every_k=2)
    assert len(out) == 3                      # frames 0, 2, 4
    for png, src in zip(out, frames[::2]):
        w, h, px = decode_png(png)
        assert (w, h) == (5, 4)
        assert np.array_equal(px[:, :, 0], src)

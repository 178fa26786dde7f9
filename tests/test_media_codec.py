"""The real pure-Python/numpy image codec: PNG encode/decode round
trips across filter types, strict error handling (CRC, truncation,
unsupported features), BMP orientation/padding, and the exact
nearest-neighbor resize rule the oracle reproduces."""

import struct
import zlib

import numpy as np
import pytest

from demo_cdc_users_airline_spark.operators.media_codec import (
    PNG_MAGIC,
    decode_bmp,
    decode_image,
    decode_png,
    encode_png_gray,
    resize_nearest,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _png(w, h, color_type, raw) -> bytes:
    return (PNG_MAGIC
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                          0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


@pytest.mark.parametrize("ft", [0, 1, 2])
def test_png_gray_roundtrip_all_encoder_filters(ft):
    rng = np.random.RandomState(3 + ft)
    px = rng.randint(0, 256, (11, 17)).astype(np.uint8)
    w, h, out = decode_png(encode_png_gray(px, filter_type=ft))
    assert (w, h) == (17, 11)
    assert np.array_equal(out[:, :, 0], px)


def test_png_rgb_and_rgba_decode():
    rng = np.random.RandomState(9)
    for ct, ch in ((2, 3), (6, 4)):
        px = rng.randint(0, 256, (5, 7, ch)).astype(np.uint8)
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(5))
        w, h, out = decode_png(_png(7, 5, ct, raw))
        assert (w, h) == (7, 5) and np.array_equal(out, px)


def test_png_average_and_paeth_unfilter():
    """Hand-filter scanlines with types 3/4 per the PNG spec and check
    the decoder inverts them exactly (the encoder never emits these, so
    they need spec-built fixtures)."""
    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, (6, 9)).astype(np.uint8)
    lines, prev = [], np.zeros(9, dtype=np.int32)
    for y, ft in zip(range(6), (0, 3, 4, 4, 3, 1)):
        line = gray[y].astype(np.int32)
        filt = np.zeros(9, dtype=np.int32)
        for x in range(9):
            a = int(line[x - 1]) if x else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (line[x] - pred) % 256
        lines.append(bytes([ft]) + bytes(filt.astype(np.uint8)))
        prev = line
    w, h, out = decode_png(_png(9, 6, 0, b"".join(lines)))
    assert np.array_equal(out[:, :, 0], gray)


def test_png_rejects_corruption_and_unsupported():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    good = bytearray(encode_png_gray(px))
    # flip one IDAT byte -> CRC must catch it
    bad = bytearray(good)
    bad[45] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|truncated|invalid"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(None)
    # 16-bit depth unsupported
    deep = (PNG_MAGIC
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(deep)
    # truncated scanline data
    short = _png(4, 3, 0, b"\x00" + b"\x01" * 4)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(short)


def _bmp(px: np.ndarray, bottom_up: bool = True) -> bytes:
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = b""
    for row in range(h):
        y = (h - 1 - row) if bottom_up else row
        rows += px[y][:, ::-1].tobytes() + b"\x00" * (stride - w * 3)
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h if bottom_up else -h,
                       1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows


@pytest.mark.parametrize("bottom_up", [True, False])
def test_bmp_roundtrip_both_orientations(bottom_up):
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (3, 5, 3)).astype(np.uint8)  # stride padding hits
    w, h, out = decode_bmp(_bmp(px, bottom_up))
    assert (w, h) == (5, 3) and np.array_equal(out, px)


def test_decode_image_dispatch():
    px = np.zeros((2, 2), dtype=np.uint8)
    assert decode_image(encode_png_gray(px))[0:2] == (2, 2)
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_image(_bmp(rgb))[0:2] == (2, 2)
    with pytest.raises(ValueError, match="unknown"):
        decode_image(b"GIF89a....")


def test_resize_nearest_exact_rule():
    px = np.arange(8 * 16, dtype=np.uint8).reshape(8, 16)
    r = resize_nearest(px, 8, 4)
    # target (y, x) samples source (floor(y*8/4), floor(x*16/8)) = (2y, 2x)
    assert np.array_equal(r, px[::2][:, ::2])
    up = resize_nearest(px, 32, 16)   # upscale repeats samples
    assert up.shape == (16, 32)
    assert np.array_equal(up[::2][:, ::2], px)


def test_png_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2),
           st.integers(0, 2 ** 32 - 1))
    def check(w, h, ft, seed):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, (h, w)).astype(np.uint8)
        got_w, got_h, out = decode_png(encode_png_gray(px, filter_type=ft))
        assert (got_w, got_h) == (w, h)
        assert np.array_equal(out[:, :, 0], px)

    check()


def test_gif_multiframe_roundtrip():
    from demo_cdc_users_airline_spark.operators.media_codec import (
        decode_gif,
        encode_gif_gray,
    )

    rng = np.random.RandomState(17)
    frames = [rng.randint(0, 256, (6, 9)).astype(np.uint8) for _ in range(5)]
    w, h, out = decode_gif(encode_gif_gray(frames))
    assert (w, h) == (9, 6) and len(out) == 5
    for a, b in zip(frames, out):
        # grayscale palette: every RGB channel equals the index
        for ch in range(3):
            assert np.array_equal(b[:, :, ch], a)


def test_gif_lzw_crosses_clear_and_subblock_boundaries():
    """A 64x64 frame forces many LZW CLEAR cycles and multiple 255-byte
    sub-blocks — the decoder must reassemble and resync exactly."""
    from demo_cdc_users_airline_spark.operators.media_codec import (
        decode_gif,
        encode_gif_gray,
    )

    rng = np.random.RandomState(23)
    big = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    w, h, out = decode_gif(encode_gif_gray([big]))
    assert (w, h) == (64, 64)
    assert np.array_equal(out[0][:, :, 0], big)


def test_gif_rejects_garbage():
    from demo_cdc_users_airline_spark.operators.media_codec import decode_gif

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG...")
    with pytest.raises(ValueError,
                       match="not a GIF|no frames|truncated|unexpected"):
        decode_gif(b"GIF89a" + b"\x00" * 20)


def test_wav_roundtrip_and_validation():
    from demo_cdc_users_airline_spark.operators.media_codec import (
        decode_wav,
        encode_wav_pcm16,
    )

    rng = np.random.RandomState(31)
    s = rng.randint(-32768, 32767, 777).astype(np.int16)  # odd size: pad path
    rate, ch, out = decode_wav(encode_wav_pcm16(s, 44100))
    assert (rate, ch) == (44100, 1) and np.array_equal(out, s)
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"RIFFxxxxAVI ")
    with pytest.raises(ValueError, match="unsupported"):
        # 8-bit fmt chunk
        import struct as st

        fmt = st.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
                + b"data" + st.pack("<I", 0))
        decode_wav(b"RIFF" + st.pack("<I", len(body)) + body)


# ---------------------------------------------------------------------------
# JPEG (baseline DCT): losslessness on block-constant inputs, bounded
# error in general, byte stuffing, and strict marker handling
# ---------------------------------------------------------------------------

from demo_cdc_users_airline_spark.operators.media_codec import (  # noqa: E402
    decode_jpeg,
    encode_jpeg_gray,
)


def test_jpeg_block_constant_is_exact():
    rng = np.random.default_rng(7)
    for _ in range(10):
        vals = rng.integers(0, 256, (3, 2), dtype=np.uint8)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        w, h, px = decode_jpeg(encode_jpeg_gray(img))
        assert (w, h) == (16, 24)
        assert (px == img).all()


def test_jpeg_roundtrip_error_bounded_and_shapes():
    rng = np.random.default_rng(11)
    worst = 0
    for _ in range(25):
        hh, ww = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        img = rng.integers(0, 256, (hh, ww), dtype=np.uint8)
        w, h, px = decode_jpeg(encode_jpeg_gray(img))
        assert (w, h) == (ww, hh)
        assert px.shape == img.shape
        worst = max(worst, int(np.abs(px.astype(int) - img.astype(int)).max()))
    # all-8s quant: per-coefficient error <= 4, IDCT spreads it thin
    assert worst <= 32


def test_jpeg_byte_stuffing_really_happens():
    # white image: DC diff 127*8/8 = 127 encodes with enough 1-bits that
    # stuffed FF bytes appear across a few blocks
    rng = np.random.default_rng(3)
    seen = False
    for _ in range(20):
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        p = encode_jpeg_gray(img)
        body = p[2:-2]
        if b"\xff\x00" in body:
            seen = True
            w, h, px = decode_jpeg(p)   # and the decoder un-stuffs it
            assert (w, h) == (16, 16)
    assert seen


def test_jpeg_rejects_garbage_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    p = bytearray(encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    sof = p.find(b"\xff\xc0")
    p[sof + 1] = 0xC2                   # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(p))


def test_jpeg_smooth_gradient_small_error():
    gx = np.tile(np.arange(64, dtype=np.uint8) * 4, (16, 1))
    w, h, px = decode_jpeg(encode_jpeg_gray(gx))
    assert int(np.abs(px.astype(int) - gx.astype(int)).max()) <= 2


# ---------------------------------------------------------------------------
# G.711 mu-law and the AVI/MJPEG container
# ---------------------------------------------------------------------------

from demo_cdc_users_airline_spark.operators.media_codec import (  # noqa: E402
    ULAW_CLIP,
    decode_avi,
    decode_mulaw,
    encode_avi_mjpeg,
    encode_mulaw,
)


def test_mulaw_matches_scalar_replay():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, 2000).astype(np.int16)
    dec = decode_mulaw(encode_mulaw(s))

    def replay(x: int) -> int:
        sign = x < 0
        a = min(abs(x), ULAW_CLIP) + 132
        v = a >> 7
        e = sum(v >= (1 << k) for k in range(1, 8))
        m = (a >> (e + 3)) & 15
        rec = (((m << 3) + 132) << e) - 132
        return -rec if sign else rec

    assert all(replay(int(x)) == int(d) for x, d in zip(s, dec))
    # companding error bound: half the largest segment step (<< e=7 cell)
    err = np.abs(dec.astype(int) - s.astype(int))
    assert err.max() <= 1024
    # small samples compress nearly losslessly
    small = np.arange(-64, 64, dtype=np.int16)
    derr = np.abs(decode_mulaw(encode_mulaw(small)).astype(int)
                  - small.astype(int))
    assert derr.max() <= 4


def test_mulaw_extremes_and_silence():
    s = np.array([0, 1, -1, 32767, -32768], dtype=np.int16)
    dec = decode_mulaw(encode_mulaw(s))
    assert int(dec[0]) == 0
    assert abs(int(dec[3]) - 32635) <= 1024   # clip region
    assert int(dec[4]) < -31000


def test_avi_mjpeg_roundtrip_exact_on_constant_frames():
    frames = [np.full((8, 16), v, dtype=np.uint8) for v in (3, 120, 255)]
    w, h, out = decode_avi(encode_avi_mjpeg(frames))
    assert (w, h) == (16, 8)
    assert len(out) == 3
    assert all((a == b).all() for a, b in zip(frames, out))


def test_avi_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxWAVE")
    p = encode_avi_mjpeg([np.zeros((8, 8), dtype=np.uint8)])
    with pytest.raises(ValueError):
        decode_avi(p[:40])


def test_avi_general_frames_bounded_error():
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (16, 16), dtype=np.uint8)
              for _ in range(4)]
    w, h, out = decode_avi(encode_avi_mjpeg(frames))
    assert (w, h, len(out)) == (16, 16, 4)
    worst = max(int(np.abs(o.astype(int) - f.astype(int)).max())
                for f, o in zip(frames, out))
    assert worst <= 32

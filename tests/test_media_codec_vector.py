"""Byte-exactness of the r14 vectorized LZW codec paths.

The GIF oracle hashes pixel sums derived from the encoded payloads, so
the vectorized encoder must be byte-identical to the scalar emitter it
replaced, and the vectorized decode fast path must (a) reproduce the
general decoder exactly on the literal-only streams it accepts and
(b) reject anything else (dictionary references, width growth,
truncation) so the general decoder keeps handling them."""

import numpy as np
import pytest

from demo_cdc_users_airline_spark.operators import media_codec as mc


def scalar_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    # the pre-r14 scalar emitter, kept verbatim as the reference
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cnt = 0
    for b in indices:
        emit(b)
        cnt += 1
        if cnt == 250:
            emit(clear)
            cnt = 0
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# boundary sizes: empty, tiny, the 8x8 frame (64), around the CLEAR
# cadence (249/250/251), multiples of 250, and a big frame
SIZES = [0, 1, 2, 63, 64, 249, 250, 251, 255, 256, 499, 500, 501,
         750, 1000, 4096]


@pytest.mark.parametrize("n", SIZES)
def test_encode_byte_identical(n):
    rng = np.random.default_rng(n)
    data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    assert mc._lzw_encode_uncompressed(data) == scalar_encode(data)


@pytest.mark.parametrize("n", SIZES)
def test_decode_roundtrip_and_truncation(n):
    rng = np.random.default_rng(1000 + n)
    data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    enc = mc._lzw_encode_uncompressed(data)
    assert bytes(mc._lzw_decode(enc, 8, n)) == data
    for mp in (0, 1, n // 2, n + 5):
        assert bytes(mc._lzw_decode(enc, 8, mp)) == data[:mp]


def _real_lzw_compress(indices: bytes, mcs: int = 8) -> bytes:
    # a genuine dictionary-building LZW compressor, to produce streams
    # the fast path must refuse
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    out = bytearray()
    acc = nbits = 0

    def emit(c: int) -> None:
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    table = {bytes([j]): j for j in range(clear)}
    nxt = clear + 2
    cur = b""
    for byte in indices:
        nxtb = cur + bytes([byte])
        if nxtb in table:
            cur = nxtb
            continue
        emit(table[cur])
        table[nxtb] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_fast_path_rejects_dictionary_streams():
    data = bytes([1, 2, 3] * 400)
    comp = _real_lzw_compress(data)
    assert mc._lzw_decode_literal_fast(comp, 8, len(data)) is None
    assert bytes(mc._lzw_decode(comp, 8, len(data))) == data


def test_fast_path_rejects_non8_mcs_and_empty():
    assert mc._lzw_decode_literal_fast(b"\x00\x01", 7, 4) is None
    assert mc._lzw_decode_literal_fast(b"", 8, 4) is None


def test_gif_roundtrip_pixels_exact():
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (8, 8), dtype=np.uint8)
              for _ in range(4)]
    w, h, out = mc.decode_gif(mc.encode_gif_gray(frames))
    assert (w, h) == (8, 8)
    assert all((out[i][:, :, 0] == frames[i]).all() for i in range(4))

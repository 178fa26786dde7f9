"""Perceptual-hash invariants: the codec-path hashes must equal an
independent byte-rule replay (proving the PNG encode->decode->resize
chain is lossless), identical images must collide at hamming 0, and the
banded candidate search must be pigeonhole-complete vs brute force."""

import pytest

from demo_cdc_users_airline_spark.operators.multimodal import (
    _AH_H,
    _AH_W,
    _DH_W,
    _PH_MAX_HAMMING,
    PNG_H,
    PNG_W,
    multimodal_image_phash,
    multimodal_phash_neardup,
)

SF = "/root/testdata/sf0.001"


def _ref_hashes(text: str) -> tuple[int, int]:
    """Byte-rule replay with NO codec involved: generative pixels ->
    resize index math -> comparisons, straight from the spec."""
    b = text.encode("utf-8")

    def byte(i: int) -> int:
        return b[i % len(b)] if b else 0

    ys = [(y * PNG_H) // _AH_H for y in range(_AH_H)]
    a_xs = [(x * PNG_W) // _AH_W for x in range(_AH_W)]
    d_xs = [(x * PNG_W) // _DH_W for x in range(_DH_W)]
    a60 = [byte(ys[j // _AH_W] * PNG_W + a_xs[j % _AH_W]) for j in range(60)]
    s = sum(a60)
    ah = sum(1 << j for j in range(60) if 60 * a60[j] > s)
    dh = 0
    for j in range(60):
        y, x = divmod(j, _AH_W)
        left = byte(ys[y] * PNG_W + d_xs[x])
        right = byte(ys[y] * PNG_W + d_xs[x + 1])
        if right > left:
            dh |= 1 << j
    return ah, dh


@pytest.fixture(scope="module")
def sig(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect()}
    hashes = {r["media_id"]: (r["ahash"], r["dhash"])
              for r in multimodal_image_phash(spark, SF).collect()}
    return docs, hashes


def test_codec_path_equals_byte_rule_replay(sig):
    docs, hashes = sig
    assert set(docs) == set(hashes)
    for doc_id, text in docs.items():
        assert hashes[doc_id] == _ref_hashes(text), f"doc {doc_id}"
    # hashes fit the 60-bit budget (sign bit never touched)
    assert all(0 <= a < 2 ** 60 and 0 <= d < 2 ** 60
               for a, d in hashes.values())


def test_banded_search_is_pigeonhole_complete(spark, sig):
    _, hashes = sig
    ids = sorted(hashes)
    brute = {(i, j) for n, i in enumerate(ids) for j in ids[n + 1:]
             if bin(hashes[i][0] ^ hashes[j][0]).count("1")
             <= _PH_MAX_HAMMING}
    got = {(r["id1"], r["id2"]): (r["hamming_a"], r["hamming_d"])
           for r in multimodal_phash_neardup(spark, SF).collect()}
    assert set(got) == brute
    for (i, j), (ha, hd) in got.items():
        assert ha == bin(hashes[i][0] ^ hashes[j][0]).count("1")
        assert hd == bin(hashes[i][1] ^ hashes[j][1]).count("1")


def test_identical_images_collide_at_zero(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("phashcorpus")
    docs = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        # 1 repeats doc 0's text exactly (different doc_id -> different
        # PNG filter type, SAME decoded pixels -> hamming 0)
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a completely different document about airline reservations"),
        (3, ""),                                    # empty -> all-zero image
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    hashes = {r["media_id"]: (r["ahash"], r["dhash"])
              for r in multimodal_image_phash(spark, str(d)).collect()}
    assert hashes[0] == hashes[1]
    assert hashes[0] != hashes[2]
    assert hashes[3] == (0, 0)                      # flat image: no bits set
    pairs = {(r["id1"], r["id2"]): r["hamming_a"]
             for r in multimodal_phash_neardup(spark, str(d)).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs

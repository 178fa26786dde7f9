"""Winnowing semantics: the operator must equal a pure-Python replay of
Schleimer et al.'s algorithm (rightmost-min window selection), and the
recall guarantee — shared spans of >= w+k-1 tokens always share a
fingerprint — must hold on a doctored corpus."""

import hashlib

import pytest

from demo_cdc_users_airline_spark.operators.text import _WIN_W, text_winnowing

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens

DOCS = [
    (0, f"intro words here {SHARED} trailing tail"),
    (1, f"{SHARED} completely different ending material"),
    (2, " ".join(f"u{i}" for i in range(12))),     # unique tokens
    (3, "tiny doc"),                               # < 3 tokens: no grams
    (4, "one two three four"),                     # 2 grams < window
]


def _gram_hashes(text: str) -> list[int]:
    toks = text.lower().strip().split()
    return [int(hashlib.md5(" ".join(toks[i:i + 3]).encode()).hexdigest()[:15],
                16) for i in range(len(toks) - 2)] if len(toks) >= 3 else []


def _winnow(hs: list[int], w: int = _WIN_W) -> set[tuple[int, int]]:
    out = set()
    for i in range(max(len(hs) - w + 1, 1)):
        win = hs[i:i + w]
        if not win:
            continue
        mn = min(win)
        j = max(k for k, v in enumerate(win) if v == mn)  # rightmost tie
        out.add((i + j + 1, hs[i + j]))                   # 1-based pos
    return out


@pytest.fixture(scope="module")
def fps(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("winnowcorpus")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    rows = text_winnowing(spark, str(d)).collect()
    out: dict[int, set] = {i: set() for i, _ in DOCS}
    for r in rows:
        out[r["doc_id"]].add((r["pos"], r["fp"]))
    return out


def test_matches_pure_python_replay(fps):
    for doc_id, text in DOCS:
        assert fps[doc_id] == _winnow(_gram_hashes(text)), f"doc {doc_id}"


def test_recall_guarantee_on_shared_span(fps):
    # 8 shared tokens >= _WIN_W + 2 -> the two docs MUST share a
    # fingerprint VALUE (positions differ by the embedding offset)
    v0 = {fp for _, fp in fps[0]}
    v1 = {fp for _, fp in fps[1]}
    assert v0 & v1
    # and the disjoint doc shares nothing with either
    v2 = {fp for _, fp in fps[2]}
    assert not (v2 & v0) and not (v2 & v1)


def test_density_and_degenerate_docs(fps):
    m = len(_gram_hashes(dict(DOCS)[2]))
    assert 1 <= len(fps[2]) < m          # strictly sub-sampled
    assert fps[3] == set()               # < 3 tokens: no grams at all
    assert len(fps[4]) == 1              # m < w: single truncated window

"""BPE merge learning: hand-computed merges on a doctored corpus, and
structural invariants on the real testdata."""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.tokenizer import (
    _merge_loop,
    _word_freq,
    learn_bpe_merges,
    text_bpe_merges,
)

SF = "/root/testdata/sf0.001"


def _doctor(spark, tmp_path, texts):
    d = tmp_path / "bpe_corpus"
    d.mkdir()
    (spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                           "doc_id long, text string")
     .write.parquet(str(d / "documents.parquet")))
    return str(d)


def test_hand_computed_merges(spark, tmp_path):
    """Corpus = 'aaab' x3: round 1 merges (a,a) cnt 6; round 2 the tie
    between (aa,a) and (a,b) at 3 breaks lexicographically to (a,b);
    round 3 merges (aa,ab); then no pairs remain (the run 'a a a'
    resolves by the documented boundary-consuming replace spec)."""
    sf = _doctor(spark, tmp_path, ["aaab aaab aaab"])
    merges = learn_bpe_merges(spark, sf)
    assert merges == [(1, "a", "a", 6), (2, "a", "b", 3), (3, "aa", "ab", 3)]


def test_word_freq_weighted_pairs(spark, tmp_path):
    sf = _doctor(spark, tmp_path, ["to to to be", "be to"])
    wf = _word_freq(spark, sf)
    rows = {r["w"]: r["n"] for r in wf.collect()}
    assert rows == {"t o": 4, "b e": 2}
    # the merge loop sees occurrence-weighted pair counts: (t,o)=4 wins
    # round 1, (b,e)=2 wins round 2, then nothing remains
    merges = _merge_loop(sorted(rows.items()), 8)
    assert merges == [(1, "t", "o", 4), (2, "b", "e", 2)]


def test_merge_loop_runs_no_spark_jobs(spark, tmp_path):
    """VERDICT r5 item 1: merge learning must cost ONE distributed pass
    (the word-frequency collect) regardless of n_merges — the job count
    at n_merges=64 equals the job count at n_merges=2."""
    from demo_cdc_users_airline_spark.sources.loader import (
        clear_session_memos,
    )

    sf = _doctor(spark, tmp_path,
                 ["the quick brown fox jumps over the lazy dog " * 3,
                  "pack my box with five dozen liquor jugs"])
    sc = spark.sparkContext
    counts = {}
    for n_merges in (2, 64):
        clear_session_memos(spark)
        sc.setJobGroup(f"bpe-{n_merges}", "bpe job-count probe")
        try:
            merges = learn_bpe_merges(spark, sf, n_merges=n_merges)
        finally:
            sc.setJobGroup("", "")
        jobs = sc.statusTracker().getJobIdsForGroup(f"bpe-{n_merges}")
        counts[n_merges] = len(jobs)
        assert len(merges) >= n_merges if n_merges == 2 else len(merges) > 20
    assert counts[64] == counts[2], counts
    assert counts[64] <= 4, counts  # the collect (plus AQE sub-jobs) only


def test_real_corpus_invariants(spark):
    df = text_bpe_merges(spark, SF)
    rows = df.orderBy("merge_rank").collect()
    assert [r["merge_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) >= 1
    # each round's chosen count never exceeds the previous round's: a
    # pair born of merge m occurs at most count(m) times, and old pairs
    # only lose occurrences
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["merged"] == r["left_sym"] + r["right_sym"]
        assert " " not in r["merged"]


def test_encode_hand_computed(spark, tmp_path):
    """'aaab' x3 corpus: merges are (a,a), (a,b), (aa,ab). Encoding
    'aaab' applies them in rank order: a a a b → aa a b (boundary-
    consuming run spec) → aa ab → aaab, i.e. ONE token of 4 chars."""
    from demo_cdc_users_airline_spark.operators.tokenizer import (
        text_bpe_encode,
    )

    sf = _doctor(spark, tmp_path, ["aaab aaab aaab", ""])
    rows = {r["doc_id"]: r for r in text_bpe_encode(spark, sf).collect()}
    assert rows[0]["n_words"] == 3
    assert rows[0]["n_chars"] == 12
    assert rows[0]["n_tokens"] == 3          # one merged token per word
    assert rows[0]["chars_per_token_micro"] == 4_000_000
    assert rows[1]["n_words"] == 0 and rows[1]["n_tokens"] == 0
    assert rows[1]["chars_per_token_micro"] == 0


def test_encode_real_corpus_invariants(spark):
    from demo_cdc_users_airline_spark.operators.tokenizer import (
        text_bpe_encode,
    )

    rows = text_bpe_encode(spark, SF).collect()
    assert len(rows) >= 1
    for r in rows:
        # merges only ever shrink the symbol count: chars >= tokens >= words
        assert r["n_chars"] >= r["n_tokens"] >= r["n_words"]
        if r["n_tokens"]:
            assert r["chars_per_token_micro"] >= 1_000_000


def test_merge_loop_matches_naive_recount_property():
    """Property (pure Python, no Spark): the incremental merge loop
    (pair-delta updates + inverted index, stale-entry tolerant) must
    equal a naive implementation that recounts every pair from scratch
    each round — same chosen pairs, same counts, same final words."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def naive(rows, n_merges):
        words = [[w, n] for w, n in rows if w]
        merges = []
        for k in range(1, n_merges + 1):
            cnt = {}
            for w, n in words:
                syms = w.split(" ")
                for p in zip(syms, syms[1:]):
                    cnt[p] = cnt.get(p, 0) + n
            if not cnt:
                break
            (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((k, a, b, c))
            pat, rep = f" {a} {b} ", f" {a}{b} "
            for row in words:
                row[0] = (" " + row[0] + " ").replace(pat, rep).strip()
        return merges, [tuple(r) for r in words]

    alphabet = st.sampled_from("ab c")  # tiny alphabet → many collisions

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.tuples(st.text(alphabet, min_size=0, max_size=8),
                  st.integers(min_value=1, max_value=5)),
        min_size=0, max_size=12),
        st.integers(min_value=1, max_value=10))
    def check(raw, n_merges):
        # normalize to the _word_freq contract: space-joined symbol
        # strings over nonempty whitespace-free words
        rows = []
        for t, n in raw:
            for w in t.split():
                rows.append((" ".join(w), n))
        words_in = [list(r) for r in rows]
        got = _merge_loop([tuple(r) for r in words_in], n_merges)
        want, _ = naive([tuple(r) for r in words_in], n_merges)
        assert got == want

    check()


def test_vocab_consistent_with_encode(spark, tmp_path):
    """The vocabulary is the encode sweep viewed symbol-wise: total
    occurrences == total BPE tokens, total symbol chars == total corpus
    chars, merged symbols are exactly the distinct survivors of the
    merge table, single chars cover the rest."""
    from demo_cdc_users_airline_spark.operators.tokenizer import (
        text_bpe_encode,
        text_bpe_vocab,
    )

    sf = _doctor(spark, tmp_path, ["aaab aaab aaab", "xy aaab"])
    vocab = {r["symbol"]: r for r in text_bpe_vocab(spark, sf).collect()}
    enc = text_bpe_encode(spark, sf).collect()
    assert sum(r["n_occurrences"] for r in vocab.values()) == \
        sum(r["n_tokens"] for r in enc)
    assert sum(r["n_occurrences"] * r["sym_len"] for r in vocab.values()) \
        == sum(r["n_chars"] for r in enc)
    for sym, r in vocab.items():
        assert r["sym_len"] == len(sym)
        assert r["is_merged"] == (1 if len(sym) > 1 else 0)
    # 'aaab' merges to one 4-char token (see test_encode_hand_computed)
    assert vocab["aaab"]["n_occurrences"] == 4

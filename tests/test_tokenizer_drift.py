"""Tokenizer drift monitor (VERDICT r12 #6) — the doctored-corpus test.

The gate corpus shares one character set across splits (oov_ppm = 0
everywhere), so these tests build a corpus where the fresh split HAS
drifted — unseen characters and an un-mergeable word distribution —
and require the monitor to say so, with the DuckDB oracle replayed
over the same doctored corpus for cross-engine exactness (the repo's
binding-regime test pattern, tests/test_tokenizer_cap.py).
"""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from demo_cdc_users_airline_spark.operators.tokenizer import (  # noqa: E402
    T_DRIFT_MOD,
    _tokenizer_drift_oracle_sql,
    text_tokenizer_drift_report,
)

BASE_SENTENCE = "the quick brown fox jumps over the lazy dog " * 3
# drifted arrivals: characters the base alphabet has never seen
# (digits, ß, ç) inside words whose pair distribution defeats the
# base-trained merges
FRESH_SENTENCE = "zq9ß3 çx7w1 9z8q7 ßß11 q2ç4 " * 3


@pytest.fixture(scope="module")
def drift_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("driftcorpus")
    rows = []
    for doc_id in range(40):
        fresh = doc_id % T_DRIFT_MOD == 0
        rows.append((doc_id, FRESH_SENTENCE if fresh else BASE_SENTENCE))
    (spark.createDataFrame(rows, "doc_id long, text string")
     .coalesce(1).write.mode("overwrite")
     .parquet(str(p / "documents.parquet")))
    return str(p)


@pytest.fixture(scope="module")
def report(spark, drift_dir):
    rows = text_tokenizer_drift_report(spark, drift_dir).collect()
    return {int(r["split"]): r for r in rows}


def test_fresh_split_reports_oov(report):
    base, fresh = report[-1], report[0]
    assert base["oov_chars"] == 0 and base["oov_ppm"] == 0
    assert fresh["oov_chars"] > 0
    assert fresh["oov_ppm"] == (fresh["oov_chars"] * 1_000_000
                                // fresh["n_chars"])


def test_fresh_split_compression_degrades(report):
    # base merges can't segment the drifted words: tokens inflate, the
    # chars-per-token ratio collapses toward 1.0 — the retrain trigger
    assert (report[0]["chars_per_token_micro"]
            < report[-1]["chars_per_token_micro"])
    # and the base split itself still compresses (sanity of the signal)
    assert report[-1]["chars_per_token_micro"] > 1_000_000


def test_doctored_corpus_matches_oracle(report, drift_dir):
    con = duckdb.connect()
    # Spark writes the table as a directory of part files
    con.execute(f"CREATE VIEW documents AS SELECT * FROM"
                f" '{drift_dir}/documents.parquet/*.parquet'")
    want = con.execute(_tokenizer_drift_oracle_sql()).fetchall()
    got = [tuple(report[s]) for s in sorted(report)]
    assert got == [tuple(r) for r in want]

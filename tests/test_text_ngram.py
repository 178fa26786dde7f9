"""Learned char-trigram language-ID invariants."""

from collections import Counter

from demo_cdc_users_airline_spark.operators.text import text_lang_id_ngram
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_lang_id_ngram_covers_all_docs_and_beats_chance(spark):
    rows = text_lang_id_ngram(spark, SF).collect()
    assert len(rows) == load_table(spark, SF, "documents").count()
    preds = Counter(r["pred_lang"] for r in rows)
    langs = {r["actual_lang"] for r in rows}
    assert set(preds) <= langs
    acc = sum(r["pred_lang"] == r["actual_lang"] for r in rows) / len(rows)
    # the synthetic corpus carries little lang-content signal (the fixed
    # marker predictor measures 0.29, majority class 0.44); the learned
    # profiles measure 0.38 — assert only a loose above-uniform floor so
    # the test checks the dataflow, not the generator's entropy
    assert acc > 1 / len(langs), f"accuracy {acc:.2f}"
    assert all(r["best_score"] >= 0 for r in rows)

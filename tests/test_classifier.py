"""The learned quality classifier: structural consistency on the real
corpus, exact driver-side training replay, and genuine learning on a
balanced separable corpus (where majority-class guessing fails)."""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.classifier import (
    QC_EPOCHS,
    QC_MOD,
    _features,
    corpus_quality_classifier,
    train_quality_perceptron,
)

SF = "/root/testdata/sf0.01"


def test_classifier_output_consistency(spark):
    rows = corpus_quality_classifier(spark, SF).collect()
    n = len(rows)
    assert n == 500
    for r in rows:
        assert r["pred"] == (1 if r["margin"] > 0 else 0)
        want_agree = 1 if (1 if r["margin"] > 0 else -1) == \
            (1 if r["heuristic_label"] else -1) else 0
        assert r["agrees"] == want_agree
        assert r["in_train"] == (1 if r["doc_id"] % QC_MOD == 0 else 0)
    in_train = sum(r["in_train"] for r in rows)
    assert 0 < in_train < n / 10  # the labeled subset is a small sample
    # the fitted filter must at least track the rule on its train set
    tr = [r for r in rows if r["in_train"]]
    assert sum(r["agrees"] for r in tr) / len(tr) >= 0.8


def test_training_replay_matches_weights(spark):
    """Pure-Python replay of the mistake-driven loop over the collected
    labeled features == the memoized artifact (exact integers)."""
    feats = sorted(
        (int(r["doc_id"]), int(r["x0"]), int(r["x1"]), int(r["x2"]),
         int(r["x3"]), int(r["y"]))
        for r in _features(spark, SF)
        .filter(F.col("doc_id") % QC_MOD == 0).collect())
    w = [0, 0, 0, 0]
    for _ in range(QC_EPOCHS):
        for _d, x0, x1, x2, x3, y in feats:
            if y * (w[0] * x0 + w[1] * x1 + w[2] * x2 + w[3] * x3) <= 0:
                for i, x in enumerate((x0, x1, x2, x3)):
                    w[i] += y * x
    assert train_quality_perceptron(spark, SF) == w


def test_classifier_learns_balanced_separable_corpus(spark, tmp_path):
    """On a 50/50 corpus where good docs (varied text with stopwords)
    and bad docs (one token repeated) are linearly separable in the
    stop/distinct micro features, held-out agreement must clearly beat
    the 0.5 majority baseline — i.e. the perceptron actually learns."""
    d = tmp_path / "qc"
    d.mkdir()
    good = "the quick brown fox jumps over a lazy dog near the old pier " \
           "with many more distinct words in this sentence of thirty total"
    bad = " ".join(["zzz"] * 30)
    docs = [(i, good if i % 2 == 0 else bad) for i in range(200)]
    (spark.createDataFrame(docs, "doc_id long, text string")
     .coalesce(1).write.parquet(str(d / "documents.parquet")))
    rows = corpus_quality_classifier(spark, str(d)).collect()
    held = [r for r in rows if r["in_train"] == 0]
    labels = {r["heuristic_label"] for r in rows}
    assert labels == {0, 1}                      # genuinely two classes
    agree = sum(r["agrees"] for r in held) / len(held)
    assert agree >= 0.95, agree                  # far above the 0.5 baseline

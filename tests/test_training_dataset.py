"""corpus_training_dataset — the capstone composition's identity tests
(VERDICT r12 #1: "a green CORRECTNESS row whose oracle re-derives the
full chain, plus a row-count/budget identity test").

The oracle gate certifies cross-engine exactness; these tests pin the
SEMANTIC identities of the manifest against the composed stages run
independently — the composition must agree with its own parts.
"""

import hashlib
import sys
from collections import Counter, defaultdict

import pytest

sys.path.insert(0, "/root/repo")

from demo_cdc_users_airline_spark.operators import curation as _cu  # noqa: E402
from demo_cdc_users_airline_spark.operators import sampling as _sa  # noqa: E402
from demo_cdc_users_airline_spark.operators import tokenizer as _tok  # noqa: E402
from demo_cdc_users_airline_spark.operators.training_dataset import (  # noqa: E402
    _TDS_SALT,
    corpus_training_dataset,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def manifest(spark):
    return corpus_training_dataset(spark, SF).collect()


@pytest.fixture(scope="module")
def stages(spark):
    from demo_cdc_users_airline_spark.sources.loader import load_table
    verdict = {r["doc_id"]: r["retained"]
               for r in _cu.curation_verdict(spark, SF).collect()}
    split = {r["doc_id"]: r["split"]
             for r in _sa.corpus_cluster_split(spark, SF).collect()}
    ntok = {r["doc_id"]: r["n_tokens"]
            for r in _tok.text_bpe_encode_served(spark, SF).collect()}
    source = {r["doc_id"]: r["source"]
              for r in load_table(spark, SF, "documents")
              .select("doc_id", "source").collect()}
    return verdict, split, ntok, source


def _bern(doc_id: int, rf_ppm: int) -> int:
    # the query's salted-hash Bernoulli draw, recomputed independently
    h = int(hashlib.md5(f"{_TDS_SALT}{doc_id}".encode()).hexdigest()[:8], 16)
    return 1 if h % 1_000_000 < rf_ppm % 1_000_000 else 0


def test_only_retained_docs_enter(manifest, stages):
    verdict, split, _, _ = stages
    docs = {r["doc_id"] for r in manifest}
    assert docs  # non-degenerate
    for d in docs:
        assert verdict[d] == 1
    # and each doc carries its cluster-split tag verbatim
    for r in manifest:
        assert r["split"] == split[r["doc_id"]]


def test_eval_splits_never_epoch_expand(manifest):
    ev = [r for r in manifest if r["split"] != "train"]
    assert ev  # the gate corpus has val/test rows
    assert all(r["copy"] == 1 and r["rf_ppm"] == 1_000_000 for r in ev)
    assert len({r["doc_id"] for r in ev}) == len(ev)  # one row per doc


def test_row_count_identity(manifest, stages):
    """Train multiplicity == floor(rf) + Bernoulli(frac(rf)), doc by
    doc — the row-count identity of the temperature stage."""
    verdict, split, _, _ = stages
    per_doc = Counter(r["doc_id"] for r in manifest
                      if r["split"] == "train")
    rf_of = {r["doc_id"]: r["rf_ppm"] for r in manifest
             if r["split"] == "train"}
    assert per_doc  # non-degenerate
    for d, n in per_doc.items():
        rf = rf_of[d]
        assert n == rf // 1_000_000 + _bern(d, rf)
    # retained train docs ABSENT from the manifest are exactly the
    # rf-downsampled ones whose copies evaluated to zero: their
    # source's rf < 1.0 AND the Bernoulli coin failed (a doc with
    # rf >= 1.0 gets floor(rf) >= 1 copies and MUST be present)
    retained_train = {d for d, v in verdict.items()
                      if v == 1 and split[d] == "train"}
    src_of = stages[3]
    rf_by_source = {src_of[r["doc_id"]]: r["rf_ppm"] for r in manifest
                    if r["split"] == "train"}
    absent = retained_train - set(per_doc)
    for d in absent:
        rf = rf_by_source.get(src_of[d])
        assert rf is not None, f"source of absent doc {d} vanished"
        assert rf < 1_000_000 and _bern(d, rf) == 0, (d, rf)
    # and nothing with rf >= 1.0 is ever absent
    for d in retained_train - absent:
        assert d in per_doc


def test_token_budget_identity(manifest, stages):
    """n_tokens is the ARTIFACT-SERVED BPE budget, and per (split,
    shard) the packing offsets are the exact running sum — the budget
    identity of the packing stage."""
    _, _, ntok, _ = stages
    for r in manifest:
        assert r["n_tokens"] == ntok[r["doc_id"]]
    streams = defaultdict(list)
    for r in manifest:
        streams[(r["split"], r["shard"])].append(r)
    budget = _cu._PACK_BUDGET
    for (sp, sh), rows in streams.items():
        rows.sort(key=lambda r: (r["doc_id"], r["copy"]))
        off = 0
        for r in rows:
            assert r["pack_id"] == sh * 1_000_000 + off // budget
            assert r["pack_offset"] == off % budget
            assert r["spans_boundary"] == (
                1 if off % budget + r["n_tokens"] > budget else 0)
            off += r["n_tokens"]


def test_manifest_key_is_unique(manifest):
    keys = [(r["split"], r["doc_id"], r["copy"]) for r in manifest]
    assert len(keys) == len(set(keys))

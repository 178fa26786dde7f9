"""Above-gate-SF headroom check (VERDICT r9 item 7): the DECIMAL/int64
widenings claim "loud failure, not silent divergence" above the gate
scales — prove it once by oracle-checking the heaviest decimal/int64-
sensitive queries on a corpus ~10× the sf0.1 builder-verified size.

Synthesizes documents/embeddings at MULT× sf0.1 (disjoint token/label
spaces per copy — the scaling_probe builders' regime, rendered to
SINGLE parquet files so oracle_check's DuckDB views read them) into
/tmp/spark-graft-headroom/x{MULT}, copies the other eight tables
through unchanged, then runs tools/oracle_check.py on the target
queries. Records the outcome in SCALING.md's Headroom section.

Usage: python tools/headroom_check.py [mult]      (default 10)

NOTE: like scaling_probe, this writes GBs of scratch — a bench run
right after is page-cache-cold; rm -rf /tmp/spark-graft-headroom and
discard any bench artifact taken in that window (CLAUDE.md).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import duckdb

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spark-graft-headroom"

# the decimal/int64-sensitive heavy hitters: Lloyd chains (centroid-mean
# + objective sums), PQ codebooks, the two-chain staleness monitor, the
# global-rank budget selection, importance/divergence totals
QUERIES = (
    "similarity_kmeans_ivf",
    "corpus_topic_clusters",
    "corpus_topic_keywords",
    "similarity_index_staleness",
    "similarity_incremental_ivf",
    "corpus_budget_selection",
    "similarity_pq_codes",
    "similarity_ivfpq_topk",
    "score_dsir_importance",
    "corpus_source_divergence",
    # r11: the persisted-PQ serving + drift paths (DECIMAL-widened
    # pq_err sums, avg-ratio ppm, two Lloyd families)
    "similarity_pq_serve_topk",
    "similarity_pq_drift_report",
    # r12: the persisted-SQ8 serving + clip paths (clamped floor-div
    # encode chains, DECIMAL/HUGEINT-widened clip sums + ppm)
    "similarity_sq8_serve_topk",
    "similarity_sq8_clip_report",
    # r13: the residual-SQ8 ranges (int64 residual subtractions feed
    # the floor-div chain), the tokenizer drift ppm pair, and the
    # capstone manifest (rf IEEE formula over int64 masses + the
    # pack running sums — the largest integer accumulations of the
    # composed stages)
    "similarity_sq8_residual_topk",
    "text_tokenizer_drift_report",
    "corpus_training_dataset",
)

HEADER = "## Headroom: oracle exactness above the gate SF"


def build_corpus(mult: int) -> str:
    out = os.path.join(SCRATCH, f"x{mult}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.sql(
        f"SELECT count(*) FROM '{BASE}/documents.parquet'").fetchone()[0]
    n_vecs = con.sql(
        f"SELECT count(*) FROM '{BASE}/embeddings.parquet'").fetchone()[0]
    # disjoint token space per copy: per-shingle df and near-dup
    # structure stay constant while the corpus grows (the honest
    # linear regime — scaling_probe.build_scaled_documents)
    con.execute(f"""
        COPY (
          SELECT doc_id + i * {n_docs} AS doc_id,
                 regexp_replace(text, '(\\S+)', '\\1_' || i, 'g') AS text,
                 lang, source, n_chars
          FROM '{BASE}/documents.parquet'
          CROSS JOIN (SELECT unnest(range({mult})) AS i)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    # disjoint labels per copy (scaling_probe.build_scaled_embeddings)
    con.execute(f"""
        COPY (
          SELECT vec_id + i * {n_vecs} AS vec_id,
                 label + i * 1000 AS label,
                 * EXCLUDE (vec_id, label)
          FROM '{BASE}/embeddings.parquet'
          CROSS JOIN (SELECT unnest(range({mult})) AS i)
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(BASE, f"{t}.parquet"), dst)
    return out


def _splice_section(text: str, header: str, body: str) -> str:
    """Replace ONLY the section from ``header`` to the next '## '
    heading (or EOF), leaving later sections intact — truncating at
    the header and appending at EOF would silently delete whatever
    section happens to live after this one."""
    if header not in text:
        return text.rstrip() + "\n" + body
    start = text.index(header)
    nxt = text.find("\n## ", start + len(header))
    tail = "" if nxt == -1 else text[nxt + 1:]
    return text[:start].rstrip() + "\n" + body + "\n" + tail


def record(mult: int, n_docs: int, n_vecs: int, ok: bool,
           detail: str) -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    with open(path) as f:
        text = f.read()
    verdict = "PASS (hash-exact)" if ok else "FAIL (loud — see below)"
    body = f"""
{HEADER}

{mult}× the sf0.1 corpus ({n_docs:,} documents / {n_vecs:,} embeddings,
disjoint token/label spaces per copy), all {len(QUERIES)} decimal/
int64-sensitive heavy queries re-gated against DuckDB on the same
parquet (tools/headroom_check.py): **{verdict}**.

{detail}
"""
    with open(path, "w") as f:
        f.write(_splice_section(text, HEADER, body))


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = build_corpus(mult)
    con = duckdb.connect()
    n_docs = con.sql(
        f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    n_vecs = con.sql(
        f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"== headroom corpus: {n_docs:,} docs / {n_vecs:,} vecs at {out}")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "oracle_check.py"), out, *QUERIES],
        capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).strip().splitlines()[-14:])
    print(tail)
    ok = r.returncode == 0
    passed = [ln for ln in r.stdout.splitlines() if ln.startswith("PASS")]
    detail = "\n".join(f"- {ln}" for ln in passed) if ok else \
        "```\n" + tail + "\n```"
    record(mult, n_docs, n_vecs, ok, detail)
    print(f"== headroom check {'PASSED' if ok else 'FAILED'};"
          f" SCALING.md updated")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

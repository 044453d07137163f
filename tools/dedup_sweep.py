"""Dedup quality sweep: measured recall/precision of MinHash-LSH banding
against exact n-gram Jaccard ground truth, across (num_hashes, bands)
configurations and similarity thresholds.

The LSH S-curve P[candidate] = 1-(1-t^r)^b is the THEORY; a production
dedup pipeline needs the measured curve on real text, because shingle
distributions are nothing like the uniform-hash ideal. This writes
DEDUP_SWEEP.json (the dedup analogue of ANN_SWEEP.json):

  per config, per threshold t:
    candidate_recall  — fraction of true pairs (exact jaccard ≥ t) that
                        collide in ≥1 band (what banding alone surfaces)
    est_recall/precision — after the est_jaccard ≥ t signature filter
                        (what the pipeline actually keeps)
    theory_p_at_t     — the textbook 1-(1-t^r)^b at s = t for comparison

Usage: python tools/dedup_sweep.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [(16, 4), (16, 8), (32, 4), (32, 8), (64, 8), (64, 16)]
THRESHOLDS = [0.5, 0.7, 0.8]
SHINGLE_N = 3
# token-replacement rates for the synthetic variants — chosen so true
# jaccard lands across the gray zone where banding actually trades off
PERTURB_RATES = (0.02, 0.05, 0.10, 0.20, 0.35)
N_BASE_DOCS = 150


def _perturbed_corpus(rows):
    """originals + deterministic token-replacement variants spanning the
    similarity spectrum. The raw testdata's true near-dup pairs are all
    jaccard ≈ 1 (exact dup families), which makes every banding config
    measure recall 1.0 — the S-curve only shows on pairs between the
    thresholds, so we manufacture them, deterministically (md5 of
    (doc_id, rate, position) decides each replacement)."""
    import hashlib

    out = []
    for doc_id, text in rows:
        toks = text.split()
        out.append((doc_id, text))
        for k, rate in enumerate(PERTURB_RATES):
            var = []
            for i, tok in enumerate(toks):
                h = hashlib.md5(f"{doc_id}:{rate}:{i}".encode()).digest()
                if h[0] / 256.0 < rate:
                    var.append("xq" + h.hex()[:6])
                else:
                    var.append(tok)
            out.append((1_000_000 + doc_id * 10 + k, " ".join(var)))
    return out


def main() -> int:
    from pyspark.sql import functions as F

    from frappe_data_pipelines_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from frappe_data_pipelines_spark.session import get_spark
    from frappe_data_pipelines_spark.sources.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="dedup-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(N_BASE_DOCS)
        .collect()
    )
    docs = spark.createDataFrame(
        _perturbed_corpus([(r.doc_id, r.text) for r in base]),
        "doc_id long, text string",
    ).repartition(32)
    n_docs = docs.count()

    # exact ground truth once (threshold 0 keeps every pair sharing ≥1
    # shingle, with its true jaccard — all sweep thresholds slice this)
    truth = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=SHINGLE_N, threshold=0.0).collect()
    }

    results = []
    for num_hashes, bands in CONFIGS:
        cand = {
            (r.id_a, r.id_b): r.est_jaccard
            for r in minhash_lsh_pairs(
                docs, num_hashes=num_hashes, bands=bands, shingle_n=SHINGLE_N
            ).collect()
        }
        r_rows = num_hashes // bands
        for t in THRESHOLDS:
            true_t = {p for p, j in truth.items() if j >= t}
            sel = {p for p, e in cand.items() if e >= t}
            sel_true = sel & true_t
            cand_true = set(cand) & true_t
            results.append(
                {
                    "num_hashes": num_hashes,
                    "bands": bands,
                    "rows_per_band": r_rows,
                    "threshold": t,
                    "n_true_pairs": len(true_t),
                    "n_candidates": len(cand),
                    "n_selected": len(sel),
                    "candidate_recall": round(len(cand_true) / len(true_t), 4)
                    if true_t
                    else None,
                    "est_recall": round(len(sel_true) / len(true_t), 4)
                    if true_t
                    else None,
                    "est_precision": round(len(sel_true) / len(sel), 4)
                    if sel
                    else None,
                    "theory_p_at_t": round(1.0 - (1.0 - t**r_rows) ** bands, 4),
                }
            )
            print(
                f"h={num_hashes:>2} b={bands:>2} t={t}: "
                f"cand_recall={results[-1]['candidate_recall']} "
                f"est_recall={results[-1]['est_recall']} "
                f"est_precision={results[-1]['est_precision']} "
                f"(true={len(true_t)}, cand={len(cand)})"
            )

    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "shingle_n": SHINGLE_N,
        "thresholds": THRESHOLDS,
        "results": results,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "DEDUP_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote DEDUP_SWEEP.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())

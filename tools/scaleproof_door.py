"""Door-path 100x scale probe (VERDICT r9 task 5): a FIXED 200-doc
micro-batch is scrubbed against 1x / 10x / 100x standing corpora, timing
only the PER-TRIGGER work (the corpus fingerprint caches are built and
persisted once per tier, exactly the stream-lifetime cost the door pays
once). Two rows per tier:

* ``local``  — the trickle fast path (``incremental_scrub_local``: one
  map-only probe of the per-doc fingerprint table + driver stitch);
* ``distributed`` — the fallback path (``incremental_substring_scrub``
  with a persisted ``corpus_fp``), executed to a noop write.

Corpora replicate via the duplication-free affine substitution of
``scaleproof.replicate_documents`` — replica 0 keeps the original text,
so the batch's boilerplate overlap (and hence the candidate/stitch work)
stays CONSTANT across tiers; what scales is only the corpus-side
fingerprint scan, which is the ~2/(w+1)-density claim this probe is
meant to test. Exponent = log(t_100x / t_1x) / log(100); the door claim
holds when it is < 1.0.

Artifact: SCALE_PROOF_DOOR.json.
Usage: python tools/scaleproof_door.py [base_sf_dir] [out_json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_BATCH = 200
TIERS = [1, 10, 100]


def main() -> None:
    base_sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROOF_DOOR.json",
    )
    from scaleproof import replicate_documents

    from frappe_data_pipelines_spark.operators.dedup import (
        corpus_doc_fingerprints,
        corpus_winnow_fingerprints,
        incremental_scrub_local,
        incremental_substring_scrub,
    )
    from frappe_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="scaleproof-door")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(base_sf, "documents.parquet"))
    batch_df = docs.filter(F.col("doc_id") < N_BATCH).select("doc_id", "text").cache()
    batch_rows = batch_df.collect()
    ids = [r.doc_id for r in batch_rows]
    texts = [r.text for r in batch_rows]
    base_corpus = docs.filter(F.col("doc_id") >= N_BATCH)

    tmp = tempfile.mkdtemp(prefix="fdp_door_scale_")
    tiers: dict[str, dict] = {}
    try:
        for reps in TIERS:
            path = os.path.join(tmp, f"corpus_{reps}x")
            replicate_documents(base_corpus, reps).repartition(
                max(32, 4 * reps)
            ).write.mode("overwrite").parquet(path)
            corpus = spark.read.parquet(path).select("doc_id", "text")
            n_corpus = corpus.count()
            fp = corpus_winnow_fingerprints(corpus).persist()
            fp.count()  # stream-start cost, excluded from per-trigger timing
            docfp = corpus_doc_fingerprints(corpus, corpus_fp=fp).persist()
            docfp.count()

            t_local = math.inf
            for _ in range(3):
                t0 = time.time()
                res = incremental_scrub_local(spark, docfp, ids, texts)
                t_local = min(t_local, time.time() - t0)
            n_scrubbed = sum(1 for ns, _, _ in res if ns)

            t_dist = math.inf
            for _ in range(3):
                t0 = time.time()
                incremental_substring_scrub(
                    corpus, batch_df, corpus_fp=fp
                ).write.format("noop").mode("overwrite").save()
                t_dist = min(t_dist, time.time() - t0)

            fp.unpersist()
            docfp.unpersist()
            tiers[f"{reps}x"] = {
                "corpus_docs": n_corpus,
                "local_sec": round(t_local, 3),
                "distributed_sec": round(t_dist, 3),
                "batch_docs_scrubbed": n_scrubbed,
            }
            print(f"{reps}x: corpus={n_corpus} local={t_local:.2f}s "
                  f"dist={t_dist:.2f}s scrubbed={n_scrubbed}", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    hi = TIERS[-1]
    out = {
        "base_sf_dir": base_sf,
        "batch_docs": len(ids),
        "tiers": tiers,
        "exponents": {
            "local": round(
                math.log(tiers[f"{hi}x"]["local_sec"] / tiers["1x"]["local_sec"])
                / math.log(hi), 3,
            ),
            "distributed": round(
                math.log(
                    tiers[f"{hi}x"]["distributed_sec"]
                    / tiers["1x"]["distributed_sec"]
                )
                / math.log(hi), 3,
            ),
        },
        "note": "fixed 200-doc batch vs 1x/10x/100x standing corpora; "
        "per-trigger timing only (fingerprint caches persisted once per "
        "tier, the stream-lifetime cost); replica 0 keeps original text "
        "so batch overlap is constant across tiers. exponent = "
        "log(t_100x/t_1x)/log(100); door claim holds when < 1.0.",
    }
    print(json.dumps(out["exponents"]))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()

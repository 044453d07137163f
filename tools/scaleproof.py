"""Scale-up proof run (VERDICT r5 #6): synthesize a ~10x corpus from
sf0.1 and measure how the dedup / ANN / web headline queries scale.

Replication is structure-preserving but duplication-free across replicas:

* ``documents``: replica r applies a Caesar substitution (shift r) to the
  text — token lengths, whitespace, and intra-replica duplicate structure
  are preserved, but no shingle/window/fingerprint collides across
  replicas, so the duplicate density per byte stays constant (the honest
  scaling regime; naive copying would make every doc a 10-way near-dup and
  measure a data artifact, not the plan).
* ``embeddings``: replica r rotates each vector by r positions — norms
  preserved, directions distinct across replicas, neighborhood structure
  preserved within a replica.

Emits SCALE_PROOF.json: per-query seconds at 1x and ~10x rows plus the
scaling exponent log(t_10x / t_1x) / log(10). Exponent <= ~1.15 is the
"no worse than linear" bar (fixed per-query overheads bias the ratio DOWN,
shuffle log-factors slightly up).

Usage: python tools/scaleproof.py [replicas] [out_json]
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

QUERIES = [
    # dedup
    "exact_substring_spans",
    "exact_substring_spans_winnow",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "corpus_segment_dedup",
    "dedup_minhash_signatures",
    # ANN / vector
    "ann_lsh_pairs",
    "c6_knn_topk",
    "b6_filtered_knn",
    # web
    "html_extract_main",
    "warc_roundtrip_extract",
    "url_normalize_canonical",
    # round-6 additions: image near-dup, soft dedup, LM scoring, mixture,
    # span decontamination, batched serving KNN (fixed query set — the
    # linear-scaling serving shape; hard_negative_mining is EXCLUDED
    # because its query set is a fixed fraction of the corpus, so
    # |queries|×|vectors| work is quadratic by definition, not by plan)
    "image_dhash_neardup",
    "audio_fingerprint_neardup",
    "video_dhash_neardup",
    "soft_dedup_weights",
    "kneser_ney_bigram_lm",
    "temperature_language_mixture",
    "benchmark_span_decontaminate",
    "knn_batch_topk",
    # round-7 addition: the scrub pays the span machinery plus one doc_id
    # shuffle + join.
    "exact_substring_scrub",
    # round-7 ninth-session additions. substring_frequency_search is
    # probeable: consecutive replica id spans put ~1/100 of every replica
    # inside its doc_id % 100 slice, so the sliced input genuinely scales
    # with the corpus. The FULL-suffix queries (ranks/LCP) stay excluded:
    # at this corpus size their O(log max_len) fixed round count dominates
    # wall time, so the exponent would measure scheduler overhead, not the
    # plan.
    "substring_frequency_search",
    "cluster_safe_splits",
    "blocklist_term_audit",
    "training_shard_manifest",
    # round-8: measure the token-suffix prefix-doubling machinery and the
    # backoff serving step directly (VERDICT r7 #7). Their doc_id-slice
    # inputs scale with the replicated corpus (consecutive replica spans
    # keep 1/50 and 1/100 of every replica inside the slice); the round
    # count stays O(log max_len) — the exponent measures per-round work
    # growth, which is the claim to prove.
    "token_suffix_array_ranks",
    "infinigram_backoff_inference",
    # round-12: the persisted-index SERVING paths the headline suite now
    # carries. time_query is best-of-2 with a cold first pass, so these
    # measure the WARM serve (pass 1 pays the one-time build at the
    # synthesized sf_dir's keyed cache, pass 2 wins the min) — the
    # exponent proves the serve-side plan scales, independent of
    # construction. kn/sq serving should grow ~linearly in the scoring
    # corpus / codes table; the ∞-gram lookups ride the skey dictionary
    # + wide-table scan.
    "kneser_ney_cached",
    "ann_sq_search_cached",
    "infinigram_query_cached",
    "substring_frequency_cached",
    "token_ngram_frequency_cached",
]

ID_OFFSET = 10_000_000


def replicate_documents(docs, replicas: int):
    """Duplication-free replicated documents DF (see module docstring).

    Per-replica AFFINE substitution x -> a*x + b (mod 26), a coprime to
    26: 12 x 26 = 312 distinct maps, and two distinct affine maps agree
    on at most TWO letters (26 = 2 x 13), so no window using >= 3
    distinct letters collides across replicas — word-like text always
    does. Plain Caesar (the original r < 10 scheme) repeats at shift
    distance 26 — a 100x corpus would give every doc ~3 exact twins and
    dedup timings would measure that artifact, not the plan.

    Replica doc ids are CONSECUTIVE spans (r * (max_id + 1)), not the big
    ID_OFFSET: the image/audio/video pattern corpora derive pixels from
    doc_id arithmetic with parameter period 64,256, and a large offset
    aliases into that space — replica pairs whose offset difference mod
    64,256 is small collide on identical patterns, inflating cross-replica
    near-dups ∝ replicas² (measured: video exponent 1.23 under ID_OFFSET
    vs sublinear with spans). Consecutive spans keep every replica's
    parameter groups distinct, so duplicate density per row stays constant
    — the honest scaling regime for id-derived corpora too."""
    from pyspark.sql import functions as F

    alpha = "abcdefghijklmnopqrstuvwxyz"
    _AS = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]

    def subst(r: int) -> str:
        a = _AS[(r // 26) % len(_AS)]
        b = r % 26
        return "".join(alpha[(a * i + b) % 26] for i in range(26))

    doc_span = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for r in range(replicas):
        shifted = subst(r)
        d = docs.select(
            (F.col("doc_id") + r * doc_span).alias("doc_id"),
            F.translate(
                F.col("text"), alpha + alpha.upper(), shifted + shifted.upper()
            ).alias("text"),
            "lang",
            # keep the eval-slice sources intact (src0/src1) so the
            # decontamination query's hard-coded eval set scales with the
            # corpus instead of emptying; other sources get per-replica
            # names so source-keyed grouping cardinality scales too
            F.when(
                F.col("source").isin("src0", "src1"), F.col("source")
            ).otherwise(F.concat(F.col("source"), F.lit(f"_r{r}"))).alias("source"),
            "n_chars",
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_corpus(spark, src_dir: str, dst_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    replicate_documents(docs, replicas).repartition(32).write.mode(
        "overwrite"
    ).parquet(os.path.join(dst_dir, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    parts = []
    for r in range(replicas):
        rot = r % dim or dim
        e = emb.select(
            (F.col("vec_id") + r * ID_OFFSET).alias("vec_id"),
            F.concat(
                F.slice("embedding", rot + 1, dim - rot), F.slice("embedding", 1, rot)
            ).alias("embedding"),
            "label",
        )
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst_dir, "embeddings.parquet")
    )


def time_query(q, spark, sf_dir: str, passes: int = 2) -> float:
    best = math.inf
    for _ in range(passes):
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best


def main() -> None:
    # usage: scaleproof.py [replicas] [out_json] [--queries a,b,c]
    #   --queries restricts the probe set (the 100x flagship run probes
    #   only the dedup/suffix/knn family; all 27 at 100x would take hours)
    argv = list(sys.argv[1:])
    only: list[str] | None = None
    if "--queries" in argv:
        i = argv.index("--queries")
        only = argv[i + 1].split(",")
        del argv[i : i + 2]
    replicas = int(argv[0]) if argv else 10
    out_path = argv[1] if len(argv) > 1 else "SCALE_PROOF.json"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from frappe_data_pipelines_spark.plans.catalog import queries
    from frappe_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="fdp-scaleproof")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    tmp = tempfile.mkdtemp(prefix="fdp_scaleproof_")
    try:
        build_corpus(spark, src, tmp, replicas)
        # warm-up
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        spark.range(64).repartition(32).mapInPandas(
            lambda it: (p for p in it), "id long"
        ).count()

        results = {}
        for name in (only or QUERIES):
            try:
                t1 = time_query(q[name], spark, src)
                t10 = time_query(q[name], spark, tmp)
                exp = math.log(t10 / t1) / math.log(replicas)
                results[name] = {
                    "sec_1x": round(t1, 3),
                    f"sec_{replicas}x": round(t10, 3),
                    "exponent": round(exp, 3),
                }
                print(f"{name}: {t1:.2f}s -> {t10:.2f}s  exponent {exp:.2f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                results[name] = {"error": str(e)[:300]}
                print(f"{name}: ERROR {e}", flush=True)

        payload = {
            "replicas": replicas,
            "base_sf_dir": src,
            "queries": results,
        }
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps({k: v.get("exponent") for k, v in results.items()}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_suite_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is executed to completion (collect) so the measured time includes
the full physical plan, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_chunk_embed_search",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "c6_knn_topk",
    "b6_filtered_knn",
    "c5_find_similar",
    "embedding_neardup_pairs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "bm25_keyword_search",
    "rrf_hybrid_fusion",
    "sessionization",
    "e1_chunk_enumeration",
    "chunk_recursive",
    "c1_permission_semi_join",
    "ann_lsh_pairs",
    "asof_join_purchase_click",
    "dedup_minhash_signatures",
    "multimodal_decode_meta",
    "j2_enrich_contexts",
    "tumbling_hourly_counts",
    "a2_extraction_dispatch",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from frappe_data_pipelines_spark.plans.catalog import queries
    from frappe_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="fdp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    # one tiny warm-up action so JVM/codegen startup isn't billed to query 1
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    t_suite = time.time()
    for name in HEADLINE:
        t0 = time.time()
        try:
            df = q[name](spark, sf_dir)
            n = len(df.collect())
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)
    total = round(time.time() - t_suite, 3)

    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Streaming latency/throughput bench: feeds document files into the ingest
stream one batch at a time and measures per-micro-batch latency percentiles
(arrival → chunks durably written) plus steady-state docs/sec.

Complements bench.py's bulk-ingest rate with the latency view a streaming
pipeline is judged on (SURVEY §2.I): p50/p95 micro-batch latency under a
steady trickle. Artifact: STREAM_BENCH.json.

Usage: python tools/stream_bench.py [sf_dir] [n_waves] [docs_per_wave]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pctl(xs: list[float], p: float) -> float:
    s = sorted(xs)
    i = min(len(s) - 1, int(round(p * (len(s) - 1))))
    return s[i]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    docs_per_wave = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    from frappe_data_pipelines_spark.session import get_spark
    from frappe_data_pipelines_spark.sources.tables import load_table
    from frappe_data_pipelines_spark.streaming.ingest import start_ingest_stream

    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").limit(n_waves * docs_per_wave).cache()
    waves = [
        docs.filter((docs.doc_id % n_waves) == i).coalesce(1) for i in range(n_waves)
    ]
    [w.count() for w in waves]

    tmp = tempfile.mkdtemp(prefix="fdp_stream_bench_")
    inp, outp, ckpt = (os.path.join(tmp, d) for d in ("in", "out", "ckpt"))
    os.makedirs(inp)

    q = start_ingest_stream(
        spark, inp, outp, ckpt, max_files_per_trigger=1, available_now=False
    )

    chunks_dir = os.path.join(outp, "chunks")

    def chunks_rows() -> int:
        try:
            return spark.read.parquet(chunks_dir).count()
        except Exception:  # noqa: BLE001 — sink not created yet
            return 0

    # wave 0 warms the stream (JVM source init, first python workers)
    latencies: list[float] = []
    total_docs = 0
    t_start = None
    for i, w in enumerate(waves):
        before = chunks_rows()
        t0 = time.time()
        w.write.mode("append").parquet(inp)
        # wait until this wave's chunks are durably visible in the sink
        deadline = t0 + 120
        while time.time() < deadline:
            if chunks_rows() > before:
                break
            time.sleep(0.2)
        dt = time.time() - t0
        if i == 0:
            t_start = time.time()
        else:
            latencies.append(dt)
            total_docs += docs_per_wave
    steady_sec = time.time() - t_start
    q.stop()

    out = {
        "sf_dir": sf_dir,
        "waves": n_waves,
        "docs_per_wave": docs_per_wave,
        "p50_batch_latency_sec": round(pctl(latencies, 0.50), 3),
        "p95_batch_latency_sec": round(pctl(latencies, 0.95), 3),
        "max_batch_latency_sec": round(max(latencies), 3),
        "steady_docs_per_sec": round(total_docs / steady_sec, 1),
        "note": "latency = file arrival -> chunk rows durably readable in the "
        "sink (poll 200ms); wave 0 excluded as stream warmup",
    }
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out, indent=2))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "STREAM_BENCH.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

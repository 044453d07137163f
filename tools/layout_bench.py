"""Layout-pruning evidence → LAYOUT_BENCH.json: the same events table
written scattered vs range-clustered vs Z-ordered, then a selective
query measured on each. Footer-level file-hit counts show WHY the
clustered layouts win (parquet min/max pruning), the timings show THAT
they win even at local scale — at 100 TB the ratio is the point.

Usage: python tools/layout_bench.py [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def file_hits(path: str, column: str, probe) -> tuple[int, int]:
    total = hits = 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        total += 1
        hits += lo <= probe <= hi
    return hits, total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from frappe_data_pipelines_spark.operators.layout import write_range_clustered
    from frappe_data_pipelines_spark.session import get_spark
    from frappe_data_pipelines_spark.sources.tables import load_table

    spark = get_spark(app_name="layout-bench")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.dayofyear("ts").alias("day")
    )
    stats = events.agg(
        F.max("user_id").alias("u"), F.min("day").alias("d0"), F.max("day").alias("d1")
    ).first()
    u_max, d0, d1 = stats["u"], stats["d0"], stats["d1"]
    probe_user = int(u_max // 2)
    probe_day = int((d0 + d1) // 2)
    n_files = 16

    root = tempfile.mkdtemp(prefix="layout_bench_")
    layouts = {}
    scattered = os.path.join(root, "scattered")
    events.repartition(n_files).write.mode("overwrite").parquet(scattered)
    layouts["scattered"] = scattered
    clustered = os.path.join(root, "clustered_user")
    write_range_clustered(events, clustered, ["user_id"], n_files=n_files)
    layouts["clustered_user"] = clustered
    zordered = os.path.join(root, "zorder_user_day")
    write_range_clustered(
        events, zordered, [], n_files=n_files,
        zorder=[("user_id", 0.0, float(u_max)), ("day", float(d0), float(d1))],
    )
    layouts["zorder_user_day"] = zordered

    out = {
        "sf_dir": sf_dir, "n_files": n_files,
        "probe_user": probe_user, "probe_day": probe_day, "layouts": {},
    }
    for name, path in layouts.items():
        hits_u, total = file_hits(path, "user_id", probe_user)
        hits_d, _ = file_hits(path, "day", probe_day)
        df = spark.read.parquet(path)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            df.where(F.col("user_id") == probe_user).agg(
                F.sum("value"), F.count("*")
            ).collect()
            best = min(best, time.time() - t0)
        out["layouts"][name] = {
            "files_matching_user_probe": hits_u,
            "files_matching_day_probe": hits_d,
            "total_files": total,
            "filtered_agg_best_sec": round(best, 3),
        }
    root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root_dir, "LAYOUT_BENCH.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

"""Layout optimization (operators/layout.py): footer-level proof that
range clustering makes parquet min/max stats prune, and that the Z-order
Column expression matches its Python mirror."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.layout import (
    write_range_clustered,
    zorder_key_expr,
    zorder_py,
)


def _file_ranges(path: str, column: str) -> list[tuple[int, int]]:
    """(min, max) of ``column`` per parquet file, from footer stats only."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def test_range_clustering_prunes_point_predicates(spark, tmp_path):
    df = spark.range(0, 20000).select(
        (F.col("id") * 2654435761 % 1000).alias("user_id"),
        F.col("id").alias("seq"),
    )
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    write_range_clustered(df, clustered, ["user_id"], n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(scattered)

    probe = 500
    c_ranges = _file_ranges(clustered, "user_id")
    s_ranges = _file_ranges(scattered, "user_id")
    c_hits = sum(lo <= probe <= hi for lo, hi in c_ranges)
    s_hits = sum(lo <= probe <= hi for lo, hi in s_ranges)
    # clustered: the probe key lives in (at most) one boundary-straddling
    # pair of files; scattered: every file's range covers it
    assert c_hits <= 2, c_ranges
    assert s_hits == len(s_ranges), s_ranges
    # the layouts hold identical data
    assert (
        spark.read.parquet(clustered).agg(F.sum("seq")).first()[0]
        == spark.read.parquet(scattered).agg(F.sum("seq")).first()[0]
    )


def test_zorder_expr_matches_python_mirror(spark):
    rows = [(x, y) for x in (0, 3, 7, 100, 255) for y in (0, 1, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    key = zorder_key_expr([(F.col("x"), 0.0, 255.0), (F.col("y"), 0.0, 255.0)], bits=8)
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", key.alias("z")).collect()}
    for x, y in rows:
        assert got[(x, y)] == zorder_py([x, y], bits=8), (x, y)


def test_zorder_locality_prunes_both_dimensions(spark, tmp_path):
    """Clustering by z(user, day) lets BOTH a user predicate and a day
    predicate skip most files — the multi-dim win a single-column sort
    cannot give."""
    df = spark.range(0, 40000).select(
        (F.col("id") * 2654435761 % 256).alias("user_id"),
        (F.col("id") * 40503 % 256).alias("day"),
    )
    path = str(tmp_path / "zordered")
    write_range_clustered(
        df, path, [], n_files=16,
        zorder=[("user_id", 0.0, 255.0), ("day", 0.0, 255.0)],
    )
    u_ranges = _file_ranges(path, "user_id")
    d_ranges = _file_ranges(path, "day")
    u_hits = sum(lo <= 7 <= hi for lo, hi in u_ranges)
    d_hits = sum(lo <= 7 <= hi for lo, hi in d_ranges)
    # 16 files over a 256x256 z-curve: a point predicate on either
    # dimension overlaps only the files containing its z-stripes
    assert u_hits <= len(u_ranges) // 2, u_ranges
    assert d_hits <= len(d_ranges) // 2, d_ranges


def test_zorder_bit_budget_guard():
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key_expr([(F.lit(0), 0, 1)] * 5, bits=16)


def test_bloom_index_skips_files_without_false_negatives(spark, tmp_path):
    from frappe_data_pipelines_spark.operators.layout import (
        bloom_candidate_files,
        build_bloom_index,
    )

    # user_id ranges are contiguous per file (clustered), so each file
    # holds ~1/8 of the key space — blooms must reflect exactly that
    df = spark.range(0, 16000).select(
        (F.col("id") % 800).alias("user_id"), F.col("id").alias("seq")
    )
    path = str(tmp_path / "bloomed")
    write_range_clustered(df, path, ["user_id"], n_files=8)
    index = build_bloom_index(spark, path, "user_id")
    assert len(index) == 8

    full = spark.read.parquet(path).select("user_id", F.input_file_name().alias("f"))
    for probe in (0, 399, 799):
        truth = {r["f"] for r in full.where(F.col("user_id") == probe).select("f").distinct().collect()}
        cand = set(bloom_candidate_files(index, probe))
        assert truth <= cand, "false negative!"
        assert len(cand) <= 3, f"bloom skipped nothing: {len(cand)}"
    # absent values: with 5 hashes over 64Kbit vs ~100 distinct/file,
    # false positives are vanishingly rare
    misses = sum(len(bloom_candidate_files(index, v)) for v in range(10_000, 10_050))
    assert misses == 0, misses

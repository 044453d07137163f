"""Approximate-quantile accuracy: approx_percentile (the 100 TB path — one
pass, mergeable sketch) must stay within the configured rank error of the
exact percentile (which needs a full sort at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from frappe_data_pipelines_spark.sources.tables import load_table


def test_approx_percentile_within_rank_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    accuracy = 1000  # rank error <= n / accuracy
    row = ev.agg(
        F.expr(f"approx_percentile(value, array(0.5, 0.95, 0.99), {accuracy})").alias("ap"),
        F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("ex"),
    ).first()
    values = sorted(r["value"] for r in ev.select("value").collect())
    max_rank_err = n // accuracy + 1
    for approx, exact, q in zip(row["ap"], row["ex"], (0.5, 0.95, 0.99)):
        # translate the value difference into a rank difference
        import bisect

        r_approx = bisect.bisect_left(values, approx)
        r_exact = bisect.bisect_left(values, exact)
        assert abs(r_approx - r_exact) <= max_rank_err, (
            f"q={q}: approx rank {r_approx} vs exact {r_exact}"
        )

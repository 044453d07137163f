"""Generic plan linter (operators/planlint.py): each smell is provoked by
a deliberately bad plan and must be flagged; each good plan must pass
clean. The linter is pure plan-text analysis — nothing executes.

(No ``from __future__ import annotations`` here: stringified type hints
break pandas_udf signature inference.)"""

import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.planlint import (
    PlanLintError,
    assert_scale_safe,
    lint_plan,
)


def _checks(findings):
    return {f.check for f in findings}


class TestSmells:
    def test_cartesian_flagged_and_sanctionable(self, spark):
        a = spark.range(10).select(F.col("id").alias("x"))
        b = spark.range(10).select(F.col("id").alias("y"))
        bad = a.crossJoin(b)
        assert "cartesian" in _checks(lint_plan(bad))
        with pytest.raises(PlanLintError, match="cartesian"):
            assert_scale_safe(bad)
        # the sanctioned scalar-broadcast pattern is opt-in
        assert_scale_safe(bad, allow_cartesian=True)

    def test_row_at_a_time_udf_flagged(self, spark):
        slow = F.udf(lambda v: v + 1, "bigint")
        bad = spark.range(10).select(slow("id").alias("v"))
        assert "python_udf" in _checks(lint_plan(bad))
        with pytest.raises(PlanLintError, match="python_udf"):
            assert_scale_safe(bad)

    def test_pandas_udf_not_flagged(self, spark):
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("bigint")
        def fast(v: pd.Series) -> pd.Series:
            return v + 1

        good = spark.range(10).select(fast("id").alias("v"))
        assert "python_udf" not in _checks(lint_plan(good))

    def test_global_sort_flagged_but_topk_is_fine(self, spark):
        df = spark.range(100)
        sorted_all = df.orderBy(F.col("id").desc())
        assert "global_sort" in _checks(lint_plan(sorted_all))
        topk = df.orderBy(F.col("id").desc()).limit(5)
        assert "global_sort" not in _checks(lint_plan(topk))

    def test_join_sorts_not_flagged(self, spark):
        # SortMergeJoin's per-partition sorts are local — no finding
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.range(1000).select(F.col("id").alias("k"), F.lit(1).alias("va"))
            b = spark.range(1000).select(F.col("id").alias("k"), F.lit(2).alias("vb"))
            joined = a.join(b, "k")
            assert "global_sort" not in _checks(lint_plan(joined))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_pushdown_clean_on_parquet_filter(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.range(100).select(
            "id", (F.col("id") % 7).alias("grp")
        ).write.parquet(path)
        good = spark.read.parquet(path).filter(F.col("grp") == 3)
        assert "unpushed_filter" not in _checks(lint_plan(good))

    def test_unpushed_filter_flagged_on_unpushable_predicate(self, spark, tmp_path):
        path = str(tmp_path / "t2")
        spark.range(100).write.parquet(path)
        # null-tolerant arithmetic predicates yield NO pushed filters (not
        # even an inferred IsNotNull), while the Filter sits on the scan's
        # column — the shape the warn exists for
        bad = spark.read.parquet(path).filter(
            F.coalesce(F.col("id"), F.lit(0)) % 7 == 3
        )
        assert "unpushed_filter" in _checks(lint_plan(bad))

    def test_partial_pushdown_residual_not_flagged(self, spark, tmp_path):
        # Spark keeps a residual Filter even when it pushed predicates —
        # a scan with ANY pushed filter passes
        path = str(tmp_path / "t2b")
        spark.range(100).write.parquet(path)
        ok = spark.read.parquet(path).filter((F.col("id") % 7) == 3)
        assert "unpushed_filter" not in _checks(lint_plan(ok))

    def test_post_aggregation_filter_not_flagged(self, spark, tmp_path):
        # a HAVING-style filter on an aggregate output can never push to the
        # scan — must NOT be reported (review regression)
        path = str(tmp_path / "t3")
        spark.range(100).select(
            "id", (F.col("id") % 5).alias("g")
        ).write.parquet(path)
        df = (
            spark.read.parquet(path)
            .groupBy("g").count()
            .filter(F.col("count") > 5)
        )
        assert "unpushed_filter" not in _checks(lint_plan(df))

    def test_many_shuffles_info(self, spark):
        # adjacent repartitions collapse; a repartition on one key followed
        # by a groupBy on another leaves two REAL shuffles
        df = (
            spark.range(1000)
            .select("id", (F.col("id") % 10).alias("k"))
            .repartition(8, "id")
            .groupBy("k")
            .count()
        )
        findings = lint_plan(df, max_shuffles=1)
        assert "many_shuffles" in _checks(findings)
        assert all(
            f.severity == "info" for f in findings if f.check == "many_shuffles"
        )

    def test_shuffle_count_is_node_exact(self, spark):
        # one real shuffle: the count must be 1 (not doubled by the details
        # section), and a broadcast join must contribute 0 (review regression)
        one = spark.range(100).groupBy((F.col("id") % 3).alias("k")).count()
        assert "many_shuffles" not in _checks(lint_plan(one, max_shuffles=1))
        dim = spark.range(5).select(F.col("id").alias("k"), F.lit("d").alias("n"))
        joined = (
            spark.range(1000).select((F.col("id") % 5).alias("k"))
            .join(F.broadcast(dim), "k")
        )
        assert "many_shuffles" not in _checks(lint_plan(joined, max_shuffles=0))

    def test_global_sort_on_one_branch_not_exempted_by_topk(self, spark):
        # a top-k subquery on one branch must not hide a genuine global
        # sort on another (review regression)
        base = spark.range(100).select("id", (F.col("id") % 7).alias("s"))
        topk = base.orderBy(F.col("s").desc()).limit(5).select(
            F.col("id").alias("tid")
        )
        df = base.join(topk, base.id == topk.tid, "left").orderBy("s")
        assert "global_sort" in _checks(lint_plan(df))

    def test_clean_aggregation_passes(self, spark):
        df = (
            spark.range(1000)
            .select((F.col("id") % 10).alias("k"), F.col("id").alias("v"))
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
        )
        findings = assert_scale_safe(df)
        assert "cartesian" not in _checks(findings)
        assert "python_udf" not in _checks(findings)


class TestEngineQueriesAreCleanByLint:
    """The generic linter agrees with the hand-written audit: headline
    engine plans carry no error-severity findings (KNN passes its
    sanctioned-cartesian flag)."""

    def test_tpch_q5(self, spark, sf_dir):
        from frappe_data_pipelines_spark.plans.catalog import queries

        q = queries()
        assert_scale_safe(q["tpch_q5_local_supplier_volume"](spark, sf_dir))
        assert_scale_safe(q["c1_permission_semi_join"](spark, sf_dir))

    def test_knn_under_sanctioned_cartesian(self, spark, sf_dir):
        from frappe_data_pipelines_spark.plans.catalog import queries

        df = queries()["c6_knn_topk"](spark, sf_dir)
        assert_scale_safe(df, allow_cartesian=True)



class TestGlobalWindowRule:
    """The no-unpartitioned-WindowExec rule (VERDICT r7: the audit missed
    rrf_fuse's and lm_perplexity_buckets' global windows because nothing
    banned the shape)."""

    def test_flags_unpartitioned_window(self, spark):
        from pyspark.sql import Window

        from frappe_data_pipelines_spark.operators.planlint import (
            PlanLintError,
            find_unpartitioned_windows,
        )

        df = spark.range(100).withColumn(
            "rn", F.row_number().over(Window.orderBy("id"))
        )
        assert find_unpartitioned_windows(df)
        with pytest.raises(PlanLintError, match="global_window"):
            assert_scale_safe(df)

    def test_partitioned_window_passes(self, spark):
        from pyspark.sql import Window

        from frappe_data_pipelines_spark.operators.planlint import (
            find_unpartitioned_windows,
        )

        df = spark.range(100).withColumn(
            "rn",
            F.row_number().over(Window.partitionBy(F.col("id") % 7).orderBy("id")),
        )
        assert find_unpartitioned_windows(df) == []

    def test_bounded_window_key_declares_boundedness(self, spark):
        """A constant lit() partition key is folded out (reads as global);
        bounded_window_key survives and satisfies the rule — and still
        puts every row, null keys included, in ONE partition."""
        from pyspark.sql import Window

        from frappe_data_pipelines_spark.operators.guards import bounded_window_key
        from frappe_data_pipelines_spark.operators.planlint import (
            find_unpartitioned_windows,
        )

        base = spark.createDataFrame(
            [(None, 3), ("a", 1), ("b", 2)], "k string, v int"
        )
        folded = base.withColumn(
            "rn", F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("v"))
        )
        assert find_unpartitioned_windows(folded)  # lit(0) folds away
        kept = base.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(bounded_window_key("k")).orderBy("v")
            ),
        )
        assert find_unpartitioned_windows(kept) == []
        assert [r.rn for r in kept.orderBy("v").collect()] == [1, 2, 3]

    def test_fixed_catalog_queries_are_window_clean(self, spark, sf_dir):
        """The two r7 weak-at-scale queries plus the swept bounded-window
        sites build with no unpartitioned Window in their plans."""
        from frappe_data_pipelines_spark.operators.planlint import (
            find_unpartitioned_windows,
        )
        from frappe_data_pipelines_spark.plans.catalog import queries

        q = queries()
        for name in [
            "rrf_hybrid_fusion",
            "lm_perplexity_buckets",
            "token_zipf_fit",
            "vocab_growth_curve",
            "unimax_language_budgets",
            "temperature_language_mixture",
        ]:
            assert find_unpartitioned_windows(q[name](spark, sf_dir)) == [], name

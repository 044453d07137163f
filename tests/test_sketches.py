"""Bloom / count-min sketch contracts (operators/sketches.py).

The catalog queries prove exact DuckDB parity; these tests pin the
*guarantees* the sketches are used for at scale:

* Bloom: zero false negatives (every history key re-probes true), bounded
  bitmap size, and a sane false-positive rate on disjoint keys at the
  designed load factor.
* CMS: estimate ≥ exact count for every key (one-sided error), grid-size
  bound, and mergeability — the sketch of a union equals the cell-wise sum
  of the parts' sketches, which is what lets daily sketches roll up.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.sketches import (
    bloom_bitmap,
    bloom_maybe_member,
    cms_cells,
    cms_estimates,
    hll_estimate,
    hll_registers,
    priority_sample,
)

M, K = 1 << 12, 4


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 300).select(
        F.col("id"), F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


class TestBloom:
    def test_no_false_negatives(self, spark, keys):
        bitmap = bloom_bitmap(keys, "k", M, K)
        flags = bloom_maybe_member(keys, bitmap, "k", "id", M, K)
        assert flags.where(~F.col("maybe_member")).count() == 0

    def test_bitmap_bounded_and_typed(self, spark, keys):
        rows = bloom_bitmap(keys, "k", M, K).collect()
        assert len(rows) <= M // 32
        assert all(0 <= r["word"] < M // 32 for r in rows)
        # 32-bit words: every mask fits in the low 32 bits, bits stays positive
        assert all(0 < r["bits"] < (1 << 32) for r in rows)

    def test_false_positive_rate_sane(self, spark, keys):
        bitmap = bloom_bitmap(keys, "k", M, K)
        other = spark.range(1000, 2000).select(
            F.col("id"), F.concat(F.lit("other-"), F.col("id")).alias("k")
        )
        flags = bloom_maybe_member(other, bitmap, "k", "id", M, K)
        fp = flags.where(F.col("maybe_member")).count()
        # load: kn/m = 4*300/4096 ≈ 0.29 → theoretical fp ≈ (1-e^-0.29)^4 ≈ 0.4%.
        # Allow a wide deterministic margin; the point is "far below 50%".
        assert fp / 1000 < 0.05

    def test_null_keys_report_false_not_null(self, spark, keys):
        bitmap = bloom_bitmap(keys, "k", M, K)
        probe = spark.sql(
            "SELECT id, CASE WHEN id % 2 = 0 THEN concat('key-', id) END AS k FROM range(10)"
        )
        rows = {r["id"]: r["maybe_member"] for r in
                bloom_maybe_member(probe, bitmap, "k", "id", M, K).collect()}
        assert len(rows) == 10
        # odd ids have NULL keys → false (never NULL); even ids are members
        assert all(rows[i] is False for i in rows if i % 2 == 1)
        assert all(rows[i] is True for i in rows if i % 2 == 0)

    def test_null_keys_excluded_from_bitmap(self, spark):
        df = spark.sql("SELECT CAST(NULL AS STRING) AS k FROM range(5)")
        assert bloom_bitmap(df, "k", M, K).count() == 0

    def test_membership_is_deterministic(self, spark, keys):
        bitmap = bloom_bitmap(keys, "k", M, K)
        a = sorted(bloom_maybe_member(keys, bitmap, "k", "id", M, K).collect())
        b = sorted(bloom_maybe_member(keys, bitmap, "k", "id", M, K).collect())
        assert a == b


class TestCms:
    D, W = 4, 64

    def _stream(self, spark):
        # skewed stream: key-0 x 200, key-1 x 50, 100 singletons
        return spark.sql(
            "SELECT id, CASE WHEN id < 200 THEN 'key-0' WHEN id < 250 THEN 'key-1' "
            "ELSE concat('tail-', id) END AS k FROM range(350)"
        )

    def test_never_undercounts(self, spark):
        st = self._stream(spark)
        cells = cms_cells(st, "k", self.D, self.W)
        exact = st.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        est = cms_estimates(st.select("k").distinct(), cells, "k", self.D, self.W)
        bad = exact.join(est, "k").where(F.col("cms_est") < F.col("exact_cnt")).count()
        assert bad == 0

    def test_grid_bounded(self, spark):
        cells = cms_cells(self._stream(spark), "k", self.D, self.W).collect()
        assert len(cells) <= self.D * self.W
        assert {r["row_i"] for r in cells} <= set(range(self.D))
        assert all(0 <= r["col_i"] < self.W for r in cells)

    def test_heavy_key_estimate_dominates(self, spark):
        st = self._stream(spark)
        cells = cms_cells(st, "k", self.D, self.W)
        est = {
            r["k"]: r["cms_est"]
            for r in cms_estimates(st.select("k").distinct(), cells, "k", self.D, self.W).collect()
        }
        assert est["key-0"] >= 200 and est["key-1"] >= 50
        # the heavy key stands clear of the tail even with collisions
        assert est["key-0"] > max(v for k, v in est.items() if k.startswith("tail-"))

    def test_mergeable(self, spark):
        st = self._stream(spark)
        a = st.where("id < 175")
        b = st.where("id >= 175")
        merged = (
            cms_cells(a, "k", self.D, self.W)
            .unionByName(cms_cells(b, "k", self.D, self.W))
            .groupBy("row_i", "col_i")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
        whole = cms_cells(st, "k", self.D, self.W)
        assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))

    def test_null_keys_excluded(self, spark):
        st = spark.sql("SELECT CASE WHEN id % 2 = 0 THEN 'a' ELSE NULL END AS k FROM range(10)")
        cells = cms_cells(st, "k", self.D, self.W)
        # only the 5 non-null rows counted
        assert cells.agg(F.sum("cnt")).collect()[0][0] == 5 * self.D


class TestHll:
    def _keys(self, spark, lo, hi):
        return spark.sql(f"SELECT concat('u-', id) AS k FROM range({lo}, {hi})")

    def test_registers_bounded(self, spark):
        regs = hll_registers(self._keys(spark, 0, 2000), "k", 256).collect()
        assert len(regs) <= 256
        assert all(0 <= r["bucket"] < 256 and 1 <= r["m_j"] <= 53 for r in regs)

    def test_estimate_within_hll_error(self, spark):
        # m=256 → relative standard error 1.04/sqrt(256) ≈ 6.5%; allow 4σ
        for n in (100, 2000):
            est = hll_estimate(hll_registers(self._keys(spark, 0, n), "k", 256), 256).collect()[0]
            assert abs(est["hll_est"] - n) / n < 0.26, (n, est)

    def test_duplicates_do_not_move_registers(self, spark):
        once = self._keys(spark, 0, 500)
        thrice = once.unionAll(once).unionAll(once)
        a = sorted(map(tuple, hll_registers(once, "k", 256).collect()))
        b = sorted(map(tuple, hll_registers(thrice, "k", 256).collect()))
        assert a == b

    def test_merge_via_max(self, spark):
        whole = hll_registers(self._keys(spark, 0, 1000), "k", 256)
        merged = (
            hll_registers(self._keys(spark, 0, 600), "k", 256)
            .unionByName(hll_registers(self._keys(spark, 600, 1000), "k", 256))
            .groupBy("bucket")
            .agg(F.max("m_j").alias("m_j"))
        )
        assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


class TestPrioritySample:
    def _docs(self, spark):
        return spark.sql(
            "SELECT id AS doc_id, CASE WHEN id < 10 THEN 1000 ELSE 10 END AS w FROM range(500)"
        )

    def test_k_rows_and_determinism(self, spark):
        d = self._docs(spark)
        a = priority_sample(d, "w", "doc_id", 50).collect()
        b = priority_sample(d, "w", "doc_id", 50).collect()
        assert len(a) == 50 and a == b

    def test_weight_bias(self, spark):
        # the 10 heavy docs (100× weight) should essentially all be sampled
        rows = priority_sample(self._docs(spark), "w", "doc_id", 50).collect()
        heavy = sum(1 for r in rows if r["doc_id"] < 10)
        assert heavy >= 8

    def test_priorities_sorted_and_positive(self, spark):
        rows = priority_sample(self._docs(spark), "w", "doc_id", 50).collect()
        ps = [r["priority"] for r in rows]
        assert all(p > 0 for p in ps)
        assert ps == sorted(ps, reverse=True)


# ---------------------------------------------------------------------------
# Property tests: the guarantees must hold for ARBITRARY unicode keys, not
# just the deterministic ascii fixtures above (encoding edge cases: empty
# string, non-BMP code points, keys differing only in normalization).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_keys_strategy = st.lists(
    st.text(min_size=0, max_size=40), min_size=1, max_size=40, unique=True
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=_keys_strategy)
def test_bloom_no_false_negatives_property(spark, ks):
    df = spark.createDataFrame([(i, k) for i, k in enumerate(ks)], "id long, k string")
    bitmap = bloom_bitmap(df, "k", M, K)
    flags = bloom_maybe_member(df, bitmap, "k", "id", M, K)
    assert flags.where(~F.col("maybe_member")).count() == 0


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=60))
def test_cms_never_undercounts_property(spark, ks):
    df = spark.createDataFrame([(k,) for k in ks], "k string")
    cells = cms_cells(df, "k", 4, 32)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
    est = cms_estimates(df.distinct(), cells, "k", 4, 32)
    assert exact.join(est, "k").where(F.col("cms_est") < F.col("exact_cnt")).count() == 0

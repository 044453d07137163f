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

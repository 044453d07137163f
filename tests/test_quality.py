"""Tests for operators/quality.py: Gopher repetition metrics, deterministic
hash sampling, and exact heavy hitters via Misra-Gries candidates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.quality import (
    gopher_repetition_metrics,
    hash_bernoulli_sample,
    misra_gries_heavy_hitters,
    rate_threshold_hex,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopherRepetition:
    def test_fully_repetitive_bigram(self, spark):
        # tokens [a b a b a b]: top 2-gram "a b" x3, 2 token-chars each;
        # total token chars = 6 -> frac 1.0
        out = gopher_repetition_metrics(_docs(spark, [(1, "a b a b a b")])).collect()[0]
        assert out["top_2gram_char_frac"] == 1.0
        assert not out["keep"]

    def test_all_distinct(self, spark):
        # six 1-char tokens, every 2-gram unique: top = 2/6
        out = gopher_repetition_metrics(_docs(spark, [(1, "q w e r t y")])).collect()[0]
        assert out["top_2gram_char_frac"] == pytest.approx(0.333333, abs=1e-6)
        assert out["dup_5gram_char_frac"] == 0.0

    def test_duplicated_5gram(self, spark):
        # "a b c d e" twice in sequence -> the 5-gram "a b c d e" occurs
        # twice (positions 0 and 5); 5 token-chars per occurrence, 10 total
        text = "a b c d e a b c d e"
        out = gopher_repetition_metrics(_docs(spark, [(1, text)])).collect()[0]
        assert out["dup_5gram_char_frac"] == pytest.approx(1.0, abs=1e-6)

    def test_short_and_empty_docs(self, spark):
        rows = [(1, ""), (2, "one"), (3, "two words")]
        out = {r["doc_id"]: r for r in gopher_repetition_metrics(_docs(spark, rows)).collect()}
        assert out[1]["top_2gram_char_frac"] == 0.0
        assert out[2]["top_2gram_char_frac"] == 0.0  # < 2 tokens: no grams
        # a 2-token doc's single bigram covers all its chars -> filtered;
        # gram-less docs trivially pass
        assert out[1]["keep"] and out[2]["keep"]
        assert out[3]["top_2gram_char_frac"] == 1.0 and not out[3]["keep"]

    def test_tokenization_case_and_punct(self, spark):
        # "Foo! foo?" tokenizes to [foo, foo] -> no 2-gram repetition but
        # a single 2-gram "foo foo" occurring once
        out = gopher_repetition_metrics(_docs(spark, [(1, "Foo! foo? Foo.")])).collect()[0]
        assert out["n_tokens"] == 3


class TestHashSample:
    def test_threshold_hex(self):
        assert rate_threshold_hex(0.0) == "00000000"
        assert rate_threshold_hex(0.5) == "80000000"
        # rate >= 1.0 -> sentinel above every hex string, so u < t keeps all
        assert rate_threshold_hex(1.0) == "g"
        assert "ffffffff" < rate_threshold_hex(1.0)
        assert len(rate_threshold_hex(0.123)) == 8

    def test_rate_one_keeps_everything(self, spark):
        df = spark.range(1000).select(F.col("id").alias("doc_id"))
        out = hash_bernoulli_sample(df, "doc_id", {}, default_rate=1.0)
        assert out.count() == 1000

    def test_rate_one_stratum(self, spark):
        df = spark.range(400).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        )
        out = hash_bernoulli_sample(
            df, "doc_id", {"en": 1.0}, strata_col="lang", default_rate=0.0
        )
        got = out.groupBy("lang").count().collect()
        assert {r["lang"]: r["count"] for r in got} == {"en": 200}

    def test_deterministic_and_stratified(self, spark):
        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        )
        kw = dict(key_col="doc_id", rates={"en": 0.1}, strata_col="lang", default_rate=0.9)
        a = hash_bernoulli_sample(df, **kw)
        b = hash_bernoulli_sample(df, **kw)
        ra = sorted(r["doc_id"] for r in a.collect())
        assert ra == sorted(r["doc_id"] for r in b.collect())
        by_lang = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by_lang["en"] < 1000 * 0.2  # ~100 expected
        assert by_lang["de"] > 1000 * 0.8  # ~900 expected

    def test_salt_changes_sample(self, spark):
        df = spark.range(500).select(F.col("id").alias("doc_id"))
        a = {r["doc_id"] for r in hash_bernoulli_sample(df, "doc_id", {}, default_rate=0.5).collect()}
        b = {
            r["doc_id"]
            for r in hash_bernoulli_sample(df, "doc_id", {}, default_rate=0.5, salt="other:").collect()
        }
        assert a != b


class TestHeavyHitters:
    def test_matches_exact_groupby(self, spark):
        # zipf-ish: key i repeated (200 - i) times for i in 0..99, plus a
        # long unique tail that the MG summaries must prune
        rows = [(f"k{i}",) for i in range(100) for _ in range(200 - i)]
        rows += [(f"tail{j}",) for j in range(5000)]
        df = spark.createDataFrame(rows, "key string").repartition(8)
        got = {
            (r["key"], r["cnt"])
            for r in misra_gries_heavy_hitters(df, "key", threshold_frac=0.008).collect()
        }
        total = len(rows)
        exact = {
            (r["key"], r["cnt"])
            for r in df.groupBy("key")
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .where(F.col("cnt") > int(total * 0.008))
            .collect()
        }
        assert got == exact
        assert got  # the threshold actually selects something

    def test_no_heavy_hitters(self, spark):
        df = spark.range(1000).select(F.col("id").cast("string").alias("key"))
        out = misra_gries_heavy_hitters(df, "key", threshold_frac=0.01).collect()
        assert out == []

    def test_numeric_key_column(self, spark):
        df = spark.range(100).select((F.col("id") % 3).alias("key"))
        out = misra_gries_heavy_hitters(df, "key", threshold_frac=0.2)
        assert {r["key"] for r in out.collect()} == {"0", "1", "2"}

    def test_null_keys_excluded_from_denominator(self, spark):
        # 60 'hot' rows, 40 distinct tail keys, 900 NULLs. Over the non-null
        # population (100 rows) 'hot' is 60% — reportable at 30%. If NULLs
        # leaked into the denominator (1000 rows) it would be 6% and hidden.
        rows = [("hot",)] * 60 + [(f"t{j}",) for j in range(40)] + [(None,)] * 900
        df = spark.createDataFrame(rows, "key string").repartition(8)
        got = {(r["key"], r["cnt"]) for r in
               misra_gries_heavy_hitters(df, "key", threshold_frac=0.3).collect()}
        assert got == {("hot", 60)}


def test_domain_cap_skew_aware_equivalence(spark, sf_dir):
    """The under-cap short-circuit must select exactly the same documents
    as the plain windowed cap — only the execution shape differs (the long
    tail of small domains never enters the ranking window)."""
    from frappe_data_pipelines_spark.operators.quality import (
        domain_cap,
        domain_cap_skew_aware,
    )
    from frappe_data_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id"),
        ),
    )
    for cap in (1, 3, 1000):  # crowded, mixed, nothing-capped
        plain = {r.doc_id for r in domain_cap(docs, cap=cap).collect()}
        skew = {r.doc_id for r in domain_cap_skew_aware(docs, cap=cap).collect()}
        assert plain == skew, f"cap={cap} diverged"
    # cap large enough: nothing dropped
    assert len({r.doc_id for r in domain_cap_skew_aware(docs, cap=1000).collect()}) \
        == docs.count()


def test_domain_extraction_edge_cases(spark):
    from frappe_data_pipelines_spark.operators.quality import extract_domain

    df = spark.createDataFrame(
        [
            ("https://WWW.Example.COM/path?q=1", "www.example.com"),
            ("http://host.tld:8080/x", "host.tld"),
            ("ftp://files.example.org", "files.example.org"),
            ("not a url", ""),
        ],
        "url string, want string",
    )
    rows = df.select(extract_domain(F.col("url")).alias("got"), "want").collect()
    for r in rows:
        assert r.got == r.want, (r.got, r.want)

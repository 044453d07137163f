"""Trained byte-level BPE: merge learning, distributed encode, round-trip."""

from frappe_data_pipelines_spark.operators.bpe import (
    PRETOKEN_RE,
    bpe_token_counts,
    decode_tokens,
    encode_text,
    pretoken_frequencies,
    train_bpe,
)


def test_train_merges_hand_computed():
    # corpus: "low" x5, "lower" x2 — classic BPE textbook example.
    freqs = [("low", 5), ("lower", 2)]
    merges = train_bpe(freqs, n_merges=4)
    # pair counts round 1: (l,o)=7 (o,w)=7 (w,e)=2 (e,r)=2 → tie 7/7,
    # lexicographic: ("l","o") wins. round 2: ("lo","w")=7 wins. round 3:
    # "low" is fully merged and drops out; remaining "lower": (low,e)=2,
    # (e,r)=2 → lexicographic ("e","r")... ("low","e") vs ("e","r"):
    # "e" < "low" so ("e","r") first.
    # round 4 merges ("low","er") and the corpus is exhausted.
    assert merges == [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_text("low", ranks) == ["low"]
    assert encode_text("lower", ranks) == ["lower"]
    ranks3 = {p: i for i, p in enumerate(merges[:3])}
    assert encode_text("lower", ranks3) == ["low", "er"]


def test_encode_decode_roundtrip_unicode():
    merges = train_bpe([("hello", 3), (" world", 3), ("héllo", 2)], n_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    for text in ["hello world", "héllo — naïve ∑", "", "  spaces\t\n", "1234!?"]:
        assert decode_tokens(encode_text(text, ranks)) == text


def test_spark_counts_match_pure_python(spark, sf_dir):
    from frappe_data_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    freqs = pretoken_frequencies(docs, max_pretokens=20000)
    merges = train_bpe(freqs, n_merges=128)
    ranks = {p: i for i, p in enumerate(merges)}

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_pretokens"])
        for r in bpe_token_counts(docs, merges).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        text = row["text"] or ""
        want_tokens = len(encode_text(text, ranks))
        want_pre = len(PRETOKEN_RE.findall(text))
        assert got[row["doc_id"]] == (want_tokens, want_pre), row["doc_id"]
    # merges actually compress: fewer tokens than raw bytes, more than pretokens
    total_tokens = sum(t for t, _ in got.values())
    total_pre = sum(p for _, p in got.values())
    assert total_pre <= total_tokens  # pretokens split into >= 1 token each
    assert merges, "training produced no merges"


def test_spark_pretokenizer_matches_python_on_ws_punct_runs(spark):
    # Regression for the F.expr SQL-literal escaping bug: inside a Spark SQL
    # double-quoted literal \s became s, so 'x  ,  y' pretokenized into 3
    # pieces JVM-side vs 5 Python-side. Pin parity on exactly those shapes.
    texts = ["x  ,  y", "a ,  b", "end.  Next", "tabs\t ; \t mix", "a b"]
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    freqs = dict(pretoken_frequencies(docs, max_pretokens=1000))
    want: dict[str, int] = {}
    for t in texts:
        for pt in PRETOKEN_RE.findall(t):
            want[pt] = want.get(pt, 0) + 1
    assert freqs == want

    got = {
        r["doc_id"]: r["n_pretokens"] for r in bpe_token_counts(docs, []).collect()
    }
    for i, t in enumerate(texts):
        assert got[f"d{i}"] == len(PRETOKEN_RE.findall(t)), t


def test_training_deterministic(spark, sf_dir):
    from frappe_data_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    f1 = pretoken_frequencies(docs, max_pretokens=5000)
    f2 = pretoken_frequencies(docs.repartition(7), max_pretokens=5000)
    assert f1 == f2
    assert train_bpe(f1, n_merges=64) == train_bpe(f2, n_merges=64)

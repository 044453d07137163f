"""Corpus-quality + time-series-repair queries (training-data extensions:
Gopher repetition filtering, deterministic stratified sampling, exact
heavy hitters with a Misra-Gries pre-filter, linear gap interpolation).

All four are DuckDB-oracled; the sampling + heavy-hitter oracles verify
the *exact result*, which is the point — the Spark side earns its scale
tricks (hash thresholds, per-partition sketches) without changing the
answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frappe_data_pipelines_spark.operators.quality import (
    gopher_repetition_metrics,
    hash_bernoulli_sample,
    misra_gries_heavy_hitters,
    rate_threshold_hex,
)
from frappe_data_pipelines_spark.plans.catalog import register
from frappe_data_pipelines_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Gopher-style repetition filter
# ---------------------------------------------------------------------------

_GOPHER_SQL = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents
    ), base AS (
      SELECT doc_id, t,
             CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) AS total_chars,
             list_transform(generate_series(1, greatest(len(t) - 1, 0)), i -> array_to_string(t[i:i+1], ' ')) AS g2,
             list_transform(generate_series(1, greatest(len(t) - 4, 0)), i -> array_to_string(t[i:i+4], ' ')) AS g5
      FROM toks
    ), c2 AS (
      SELECT doc_id, max(cnt * chars) AS top_chars FROM (
        SELECT doc_id, g, count(*) AS cnt, len(g) - 1 AS chars
        FROM (SELECT doc_id, unnest(g2) AS g FROM base) GROUP BY doc_id, g
      ) GROUP BY doc_id
    ), c5 AS (
      SELECT doc_id, sum(cnt * chars) AS dup_chars FROM (
        SELECT doc_id, g, count(*) AS cnt, len(g) - 4 AS chars
        FROM (SELECT doc_id, unnest(g5) AS g FROM base) GROUP BY doc_id, g
      ) WHERE cnt > 1 GROUP BY doc_id
    ), metrics AS (
      SELECT b.doc_id,
             CAST(len(b.t) AS BIGINT) AS n_tokens,
             round(coalesce(c2.top_chars / nullif(b.total_chars, 0), 0), 6) AS top_2gram_char_frac,
             round(coalesce(c5.dup_chars / nullif(b.total_chars, 0), 0), 6) AS dup_5gram_char_frac
      FROM base b
      LEFT JOIN c2 ON b.doc_id = c2.doc_id
      LEFT JOIN c5 ON b.doc_id = c5.doc_id
    )
    SELECT doc_id, n_tokens, top_2gram_char_frac, dup_5gram_char_frac,
           (top_2gram_char_frac <= 0.20 AND dup_5gram_char_frac <= 0.10) AS keep
    FROM metrics
    """


@register("gopher_repetition_filter", oracle=_GOPHER_SQL, tags=("quality", "extension"))
def gopher_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021) repetition metrics per document:
    char-fraction of the top bigram and of duplicated 5-grams, plus the
    keep/drop verdict. Pure higher-order array functions — zero shuffle,
    one codegen map stage; the scale cost is linear in corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return gopher_repetition_metrics(docs, top_n=2, dup_n=5, top_frac_max=0.20, dup_frac_max=0.10)


# ---------------------------------------------------------------------------
# Deterministic stratified hash sampling
# ---------------------------------------------------------------------------

_SAMPLE_RATES = {"en": 0.30}
_SAMPLE_DEFAULT = 0.65
_SAMPLE_SALT = "sample:v1:"

_SAMPLE_SQL = f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substring(md5('{_SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8) <
          CASE WHEN lang = 'en' THEN '{rate_threshold_hex(_SAMPLE_RATES["en"])}'
               ELSE '{rate_threshold_hex(_SAMPLE_DEFAULT)}' END
    """


@register("hash_stratified_sample", oracle=_SAMPLE_SQL, tags=("sampling", "extension"))
def hash_stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli sample (downsample the
    over-represented 'en' stratum to rebalance the mixture). The draw is an
    md5-prefix threshold — re-runnable, engine-portable, shuffle-free, and
    needs no count pass: exactly how you sample 100 TB in one map stage."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_bernoulli_sample(
        docs, key_col="doc_id", rates=_SAMPLE_RATES, strata_col="lang",
        default_rate=_SAMPLE_DEFAULT, salt=_SAMPLE_SALT,
    ).select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# Exact heavy hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------

_HH_FRAC = 0.0015

_HH_SQL = f"""
    WITH keyed AS (
      SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS key FROM events
    )
    SELECT key, CAST(count(*) AS BIGINT) AS cnt
    FROM keyed GROUP BY key
    HAVING count(*) > CAST(floor((SELECT count(*) FROM events) * {_HH_FRAC}) AS BIGINT)
    """


@register("heavy_hitters_exact", oracle=_HH_SQL, tags=("agg", "sketch", "extension"))
def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (user, event_type) keys above 0.15% frequency. Spark path:
    per-partition weighted Misra-Gries summaries (bounded memory, no
    shuffle) give a guaranteed candidate superset; an IN-filtered exact
    recount confirms. The long tail never shuffles — the oracle's plain
    GROUP BY..HAVING is what this avoids at scale."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat_ws(":", F.col("user_id").cast("string"), F.col("event_type")).alias("key")
    )
    return misra_gries_heavy_hitters(keyed, "key", threshold_frac=_HH_FRAC)


# ---------------------------------------------------------------------------
# Linear interpolation of time-series gaps
# ---------------------------------------------------------------------------

_INTERP_SQL = """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value), 6) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), grid AS (
      SELECT s.event_type, s.hour, h.v
      FROM spine s LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hour = h.hour
    ), ctx AS (
      SELECT event_type, hour, v,
        last_value(CASE WHEN v IS NOT NULL THEN struct_pack(h := hour, x := v) END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        first_value(CASE WHEN v IS NOT NULL THEN struct_pack(h := hour, x := v) END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
      FROM grid
    )
    SELECT event_type, hour,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN p IS NULL THEN nx.x
                      WHEN nx IS NULL THEN p.x
                      ELSE p.x + (nx.x - p.x) * (epoch(hour) - epoch(p.h)) / (epoch(nx.h) - epoch(p.h))
                 END, 6) AS value_interp,
           (v IS NULL) AS was_gap
    FROM ctx
    """


@register("ts_linear_interpolation", oracle=_INTERP_SQL, tags=("time-series", "extension"))
def ts_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type averages on a dense spine with gaps filled by linear
    interpolation between nearest non-null neighbors (edges clamp to the
    nearest value). Complements events_gap_fill's zero-fill: this is the
    sensor-style repair. Two IGNORE-NULLS windows partitioned by
    event_type — state per partition is O(1), so the plan scales with the
    spine, not the events."""
    ev = load_table(spark, sf_dir, "events")
    # DECIMAL-accumulated mean: a float avg() differs from DuckDB's by the
    # summation order (1 ulp), which flips round(.,6) at a boundary once
    # enough rows exist per hour (seen at sf0.1) — round-then-decimal-sum
    # is associative, so the mean is bit-identical on both engines
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.round(
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)")).cast("double")
            / F.count("value"),
            6,
        ).alias("v")
    )
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    grid = spine.join(hourly, ["event_type", "hour"], "left")

    nn = F.when(F.col("v").isNotNull(), F.struct(F.col("hour").alias("h"), F.col("v").alias("x")))
    w_prev = (
        Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ctx = grid.select(
        "event_type", "hour", "v",
        F.last(nn, ignorenulls=True).over(w_prev).alias("p"),
        F.first(nn, ignorenulls=True).over(w_next).alias("nx"),
    )
    # associate EXACTLY like the oracle's `a * b / c` = (a*b)/c — the
    # algebraically-equal a*(b/c) differs by 1 ulp on some rows, which
    # flips round(.,6) at a boundary (seen at sf0.01/sf0.1)
    dt_num = (F.unix_timestamp("hour") - F.unix_timestamp("p.h")).cast("double")
    dt_den = (F.unix_timestamp("nx.h") - F.unix_timestamp("p.h")).cast("double")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("p").isNull(), F.col("nx.x"))
        .when(F.col("nx").isNull(), F.col("p.x"))
        .otherwise(
            F.col("p.x") + ((F.col("nx.x") - F.col("p.x")) * dt_num) / dt_den
        )
    )
    return ctx.select(
        "event_type", "hour",
        F.round(interp, 6).alias("value_interp"),
        F.col("v").isNull().alias("was_gap"),
    )

# ---------------------------------------------------------------------------
# C4-style document filter (word-level rules; Raffel et al. 2020 §2.2,
# adapted to word-salad corpora: no line/sentence structure to key on)
# ---------------------------------------------------------------------------

_C4_SQL = """
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS word_count,
             round(CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) / nullif(len(t), 0), 6) AS mean_word_len,
             (contains(text, '{') OR contains(lower(text), 'lorem ipsum')) AS has_bad_tokens,
             CAST(len(list_intersect(list_distinct(t),
                  ['the','a','an','and','or','of','to','in','is','it'])) AS BIGINT) AS n_stopwords
      FROM toks
    )
    SELECT doc_id, word_count, mean_word_len, has_bad_tokens, n_stopwords,
           (word_count BETWEEN 30 AND 100000
            AND mean_word_len BETWEEN 2 AND 10
            AND NOT has_bad_tokens
            AND n_stopwords >= 2) AS keep
    FROM m
    """


@register("c4_doc_filter", oracle=_C4_SQL, tags=("quality", "extension"))
def c4_doc_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleanliness rules per document: word-count bounds, mean word
    length bounds, boilerplate/bad-token markers ('{', 'lorem ipsum'),
    minimum distinct-stopword presence (prose-likeness). One map stage,
    no shuffle, all whole-stage-codegen expressions."""
    from frappe_data_pipelines_spark.functions.text import STOPWORDS, tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    staged = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("word_count"),
        F.round(
            F.try_divide(
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
                ).cast("double"),
                F.size(toks).cast("double"),
            ),
            6,
        ).alias("mean_word_len"),
        (
            F.col("text").contains("{") | F.lower(F.col("text")).contains("lorem ipsum")
        ).alias("has_bad_tokens"),
        F.size(
            F.array_intersect(
                F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS])
            )
        ).cast("bigint").alias("n_stopwords"),
    )
    return staged.withColumn(
        "keep",
        F.col("word_count").between(30, 100000)
        & F.col("mean_word_len").between(2, 10)
        & ~F.col("has_bad_tokens")
        & (F.col("n_stopwords") >= 2),
    )


# ---------------------------------------------------------------------------
# Corpus-level duplicated-segment removal (CCNet / RefinedWeb line dedup)
# ---------------------------------------------------------------------------

_SEG_DEDUP_SQL = """
    WITH segs AS (
      SELECT doc_id, CAST(i.i - 1 AS INT) AS seg_no,
             array_to_string(ws[(i.i-1)*10+1:(i.i-1)*10+10], ' ') AS seg
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           LATERAL (
             SELECT unnest(generate_series(1, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS i
           ) i
    ), seg_df AS (
      SELECT seg, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
      FROM segs GROUP BY seg
    )
    SELECT s.doc_id,
           coalesce(
             string_agg(CASE WHEN d.nd < 2 THEN s.seg END, ' ' ORDER BY s.seg_no),
             ''
           ) AS clean_text,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           round(CAST(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS removed_frac
    FROM segs s JOIN seg_df d USING (seg)
    GROUP BY s.doc_id
    """


@register("corpus_segment_dedup", oracle=_SEG_DEDUP_SQL, tags=("dedup", "extension"))
def corpus_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-segment removal (CCNet's paragraph dedup /
    RefinedWeb's line dedup, over 10-word segments since this corpus is
    single-line): drop every copy of any exact segment present in ≥2
    distinct documents, reconstruct surviving text in order, report removal
    accounting. One segment-hash aggregation + one join back + one per-doc
    regroup — uniform keys throughout, no all-pairs stage."""
    from frappe_data_pipelines_spark.operators.dedup import (
        boilerplate_segment_removal,
    )

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_segment_removal(docs, seg_words=10, min_docs=2)


# ---------------------------------------------------------------------------
# Exact substring dedup spans (Lee et al. 2021-style, shingle approximation)
# ---------------------------------------------------------------------------

_SUBSTR_SQL = """
    WITH sh AS (
      SELECT doc_id, p.p AS pos, substr(text, p.p, 40) AS s
      FROM documents, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(text) - 39, 1), 10)) AS p
      ) p
      WHERE len(substr(text, p.p, 40)) = 40
    ), dup AS (
      SELECT s, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM sh GROUP BY s HAVING count(DISTINCT doc_id) > 1
    )
    SELECT sh.doc_id, CAST(sh.pos AS BIGINT) AS pos, md5(sh.s) AS fp, dup.n_docs
    FROM sh JOIN dup ON sh.s = dup.s
    """


@register("substring_dup_spans", oracle=_SUBSTR_SQL, tags=("dedup", "extension"))
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring duplication (the signal behind
    suffix-array dedup, Lee et al. 2021), approximated with 40-char shingles
    at stride 10: every span whose shingle appears verbatim in ≥2 docs.
    Shingling is a higher-order-function map (no explode blowup beyond
    len/10 rows per doc); the duplicate test is one shuffle keyed on the
    shingle — the inverted-index pattern that scales to 100 TB because
    unique shingles (the vast majority) partial-aggregate away map-side."""
    docs = load_table(spark, sf_dir, "documents")
    spans = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 39, F.lit(1)), F.lit(10)),
            lambda p: F.struct(
                p.cast("long").alias("pos"), F.substring(F.col("text"), p, 40).alias("s")
            ),
        ),
        lambda st: F.length(st["s"]) == 40,
    )
    sh = docs.select("doc_id", F.explode(spans).alias("sp")).select(
        "doc_id", F.col("sp.pos").alias("pos"), F.col("sp.s").alias("s")
    )
    dup = (
        sh.groupBy("s")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )
    return sh.join(dup, "s").select(
        "doc_id", "pos", F.md5(F.col("s").cast("binary")).alias("fp"), "n_docs"
    )


# ---------------------------------------------------------------------------
# TF-IDF cosine near-duplicates (lexical-vector alternative to MinHash)
# ---------------------------------------------------------------------------

_TFIDF_SQL = """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM toks GROUP BY 1, 2
    ), idf AS (
      SELECT tok, ln((SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) FROM tf) /
                     CAST(count(DISTINCT doc_id) AS DOUBLE)) AS idf
      FROM tf GROUP BY tok
    ), w AS (
      SELECT doc_id, tok, tf.tf * idf.idf AS w FROM tf JOIN idf USING (tok)
    ), nrm AS (
      SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1
    ), dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(dot / (x.nrm * y.nrm), 6) AS cosine
    FROM dots JOIN nrm x ON id_a = x.doc_id JOIN nrm y ON id_b = y.doc_id
    WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.9
    """


@register("tfidf_cosine_pairs", oracle=_TFIDF_SQL, tags=("dedup", "extension"))
def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-weighted cosine near-dup pairs (τ=0.9) via the inverted-index
    join — the dot product only materializes for docs sharing a term, so
    cost is bounded by posting-list co-occurrence, not n². Every stage is a
    keyed hash aggregate (tok or doc_id): partial aggregation and AQE skew
    handling apply; no crossJoin anywhere."""
    from frappe_data_pipelines_spark.functions.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").cast("double").alias("tf"))
    n_docs = tf.select(F.countDistinct("doc_id").cast("double").alias("n"))
    idf = (
        tf.groupBy("tok")
        .agg(F.countDistinct("doc_id").cast("double").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select("tok", F.log(F.col("n") / F.col("df")).alias("idf"))
    )
    w = tf.join(idf, "tok").select("doc_id", "tok", (F.col("tf") * F.col("idf")).alias("w"))
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    x = nrm.alias("x")
    y = nrm.alias("y")
    cos = F.round(F.col("dot") / (F.col("x.nrm") * F.col("y.nrm")), 6)
    return (
        dots.join(x, F.col("id_a") == F.col("x.doc_id"))
        .join(y, F.col("id_b") == F.col("y.doc_id"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.9)
    )


# ---------------------------------------------------------------------------
# Graph analytics over the similarity graph: k-NN edges + triangle count
# ---------------------------------------------------------------------------

_TRIANGLE_SQL = """
    WITH sims AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS s
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ), knn AS (
      SELECT src, dst FROM (
        SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rn
        FROM sims
      ) WHERE rn <= 5
    ), edges AS (
      SELECT DISTINCT least(src, dst) AS id_a, greatest(src, dst) AS id_b FROM knn
    )
    SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM edges e1
                 JOIN edges e2 ON e1.id_b = e2.id_a
                 JOIN edges e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b) AS BIGINT) AS n_triangles
    """


def _knn_edges(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Undirected k-cosine-NN edge list over the embeddings table. Norms
    hoisted to one per row (dot/(na*nb) — identical fold arithmetic to
    cosine_similarity, so 6-dp scores and oracle hashes are unchanged).
    Brute-force O(n²) construction is the correctness baseline; at 100 TB
    the edge list comes from the LSH / IVF candidate generators (ann_*)."""
    from frappe_data_pipelines_spark.functions.vectors import dot_product, vector_norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", vector_norm(F.col("embedding")).alias("nrm")
    )
    # a small parquet arrives as ONE input partition; the nested-loop
    # self-join streams it through a single task unless spread first
    par = spark.sparkContext.defaultParallelism
    a, b = emb.repartition(par).alias("a"), emb.alias("b")
    sims = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("dst"),
        F.round(
            F.try_divide(
                dot_product(F.col("a.embedding"), F.col("b.embedding")),
                F.col("a.nrm") * F.col("b.nrm"),
            ),
            6,
        ).alias("s"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("dst"))
    knn = sims.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return knn.select(
        F.least("src", "dst").alias("id_a"), F.greatest("src", "dst").alias("id_b")
    ).distinct()


@register("knn_graph_triangles", oracle=_TRIANGLE_SQL, tags=("graph", "extension"))
def knn_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-graph analytics: build the undirected k=5 cosine-NN graph
    over the embeddings and count triangles (the standard node-iterator
    3-way self-join on ordered edges, so each triangle counts once).
    Ordering uses the 6-dp-rounded score with a dst tie-break, so the graph
    is engine-deterministic; the triangle join itself stays keyed on vertex
    ids (shuffle-partitionable, AQE-skew-safe)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    edges = _knn_edges(spark, sf_dir, k=5)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.id_b") == F.col("e2.id_a"))
        .join(e3, (F.col("e3.id_a") == F.col("e1.id_a")) & (F.col("e3.id_b") == F.col("e2.id_b")))
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    n_nodes = emb.agg(F.count("*").cast("bigint").alias("n_nodes"))
    n_edges = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    return n_nodes.crossJoin(n_edges).crossJoin(tri)


_DOMAIN_CAP_SQL = """
WITH u AS (
  SELECT doc_id, n_chars,
         'https://' || source || '.example.com/docs/' || doc_id AS url
  FROM documents
), d AS (
  SELECT doc_id, n_chars, url,
         lower(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)) AS domain
  FROM u
), r AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain
                            ORDER BY n_chars DESC, doc_id ASC) AS domain_rank
  FROM d
)
SELECT doc_id, domain, domain_rank FROM r WHERE domain_rank <= 5
"""


@register("corpus_domain_cap", oracle=_DOMAIN_CAP_SQL, tags=("quality", "dedup", "extension"))
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (RefinedWeb/C4-style host-dominance guard):
    extract the registered host from each document URL, keep at most 5
    documents per host by deterministic priority (longest first). URLs are
    synthesized from (source, doc_id) so both engines derive identical
    inputs; the operator itself (operators/quality.py:domain_cap) is the
    real URL-parse → hash-shuffle-on-domain → windowed-cap pipeline. The
    skew-aware twin short-circuits under-cap domains past the window
    (equivalence pinned in tests/test_quality.py)."""
    from frappe_data_pipelines_spark.operators.quality import domain_cap

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id"),
        ),
    )
    return domain_cap(docs, cap=5).select("doc_id", "domain", "domain_rank")


# ---------------------------------------------------------------------------
# Exact substring dedup, stride-1 (Lee et al. ExactSubstr) + winnowing
# ---------------------------------------------------------------------------

_EXACT_SPAN_SQL = """
    WITH win AS (
      SELECT doc_id, p.p AS pos, substr(text, p.p, 40) AS s
      FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text) - 39)) AS p) p
      WHERE len(text) >= 40
    ), dup AS (
      SELECT s FROM win GROUP BY s HAVING count(DISTINCT doc_id) >= 2
    ), d AS (
      SELECT w.doc_id, w.pos FROM win w JOIN dup USING (s)
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + 40) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_isl
      FROM d
    ), isl2 AS (
      SELECT doc_id, pos,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 40 AS BIGINT) AS span_end,
           CAST(max(pos) + 40 - min(pos) AS BIGINT) AS span_len
    FROM isl2
    GROUP BY doc_id, island
    """


@register("exact_substring_spans", oracle=_EXACT_SPAN_SQL, tags=("dedup", "extension"))
def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact suffix-array-equivalent dedup spans (Lee et al. 2021): maximal
    regions covered by stride-1 40-char windows duplicated verbatim across
    >=2 documents — the exact detection the round-4 ``substring_dup_spans``
    only approximated at stride 10. One inverted-index shuffle on window
    content + a per-doc gaps-and-islands merge. The winnow-prefiltered
    variant (same result, differentially tested) is the 100 TB path."""
    from frappe_data_pipelines_spark.operators.dedup import exact_dup_spans

    docs = load_table(spark, sf_dir, "documents")
    return exact_dup_spans(docs, min_len=40, min_docs=2).select(
        "doc_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("span_len").cast("bigint").alias("span_len"),
    )


@register("exact_substring_spans_winnow", oracle=_EXACT_SPAN_SQL,
          tags=("dedup", "extension", "bench"))
def exact_substring_spans_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for exact-substring dedup (VERDICT r5 #4): the SAME
    spans as ``exact_substring_spans`` — same oracle, winnowing is lossless
    by the SIGMOD'03 guarantee — but only the cohort of documents sharing a
    selected fingerprint pays the stride-1 window blowup. At sf0.1 the
    cohort is a fraction of the corpus; at 100 TB it is the difference
    between feasible and not. Benched head-to-head with the full path in
    bench.py."""
    from frappe_data_pipelines_spark.operators.dedup import exact_dup_spans

    docs = load_table(spark, sf_dir, "documents")
    return exact_dup_spans(docs, min_len=40, min_docs=2, prefilter="winnow").select(
        "doc_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("span_len").cast("bigint").alias("span_len"),
    )


_SCRUB_SQL = f"""
    WITH spans AS ({_EXACT_SPAN_SQL}
    ), per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(span_len) AS BIGINT) AS chars_removed
      FROM spans GROUP BY doc_id
    ), segs AS (
      -- kept gaps between spans (maximal + non-overlapping by construction)
      SELECT doc_id,
             coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start), 1)
               AS seg_start,
             span_start AS seg_end
      FROM spans
      UNION ALL
      -- the tail gap after the last span
      SELECT s.doc_id, max(s.span_end), max(len(d.text)) + 1
      FROM spans s JOIN documents d USING (doc_id)
      GROUP BY s.doc_id
    ), stitched AS (
      SELECT g.doc_id,
             string_agg(substr(d.text, CAST(g.seg_start AS INT),
                               CAST(g.seg_end - g.seg_start AS INT)),
                        '' ORDER BY g.seg_start) AS cleaned_text
      FROM segs g JOIN documents d USING (doc_id)
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.text) AS BIGINT) AS n_chars,
           coalesce(p.n_spans, 0) AS n_spans,
           coalesce(p.chars_removed, 0) AS chars_removed,
           CAST(len(d.text) - coalesce(p.chars_removed, 0) AS BIGINT) AS n_kept,
           coalesce(s.cleaned_text, d.text) AS cleaned_text
    FROM documents d
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN stitched s USING (doc_id)
    """


@register("exact_substring_scrub", oracle=_SCRUB_SQL, tags=("dedup", "extension"))
def exact_substring_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of exact-substring dedup (Lee et al. 2021): cut every
    duplicated span out of every document and emit the cleaned corpus with
    removal accounting. The oracle restitches the text from the span
    complement in SQL, so the emitted cleaned_text is value-checked
    character for character — not just counted."""
    from frappe_data_pipelines_spark.operators.dedup import exact_substring_scrub

    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_scrub(docs, min_len=40, min_docs=2)


_SUFFIX_SQL = """
    SELECT doc_id,
           CAST(p.p AS BIGINT) AS pos,
           CAST(dense_rank() OVER (ORDER BY substr(text, CAST(p.p AS INT)))
                AS BIGINT) AS rank
    FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text))) AS p) p
    WHERE doc_id % 50 = 0 AND len(text) > 0
    """


@register("suffix_array_ranks", oracle=_SUFFIX_SQL, tags=("dedup", "extension"))
def suffix_array_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed suffix-array construction (Manber-Myers prefix doubling,
    operators/suffix.py): the dense lexicographic rank of EVERY suffix of
    every document in the slice, built as O(log max_len) rounds of global
    re-ranking — range-partitioned rank assignment, no single-partition
    window, no per-string sort key longer than the doubling width. The
    oracle is the definition itself (dense_rank over the string-sorted
    suffixes), so every rank is value-checked. The slice keeps the gate
    fast; the construction is corpus-size-agnostic."""
    from frappe_data_pipelines_spark.operators.suffix import suffix_ranks

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return suffix_ranks(docs)


_TOKEN_SUFFIX_SQL = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents WHERE doc_id % 50 = 0
    ), s AS (
      SELECT doc_id, CAST(p.p AS BIGINT) AS pos, t[CAST(p.p AS INT):] AS suf
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS p) p
      WHERE len(t) > 0
    )
    SELECT doc_id, pos,
           CAST(dense_rank() OVER (ORDER BY suf) AS BIGINT) AS rank
    FROM s
    """


@register("token_suffix_array_ranks", oracle=_TOKEN_SUFFIX_SQL,
          tags=("dedup", "extension"))
def token_suffix_array_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-level distributed suffix array — the unit Lee et al. 2021's
    exact-substring dedup and infini-gram actually index
    (operators/suffix.py:token_suffix_ranks): the corpus-global dense
    lexicographic rank of every token suffix, built by the same
    prefix-doubling rounds as the char-level array with array ``slice``
    keys (Spark and DuckDB order array<string> identically —
    element-wise, shorter-prefix-first). The oracle is the definition:
    dense_rank over the list-sliced suffixes, so every rank is
    value-checked."""
    from frappe_data_pipelines_spark.operators.suffix import token_suffix_ranks

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    tokens = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("tokens"),
    )
    return token_suffix_ranks(tokens)


# token n-gram query parameters, identical in the Spark createDataFrame
# and the SQL VALUES: lengths 1/2/3/5 exercise every decomposition shape,
# with a guaranteed miss for the zero row
_TOKEN_FREQ_PATTERNS = [
    (1, ["value"]),
    (2, ["hash", "value"]),
    (3, ["the", "line", "sort"]),
    (4, ["no", "such", "gram"]),
    (5, ["row", "fast", "merge", "batch", "part"]),
]

_TOKEN_FREQ_SQL = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents WHERE doc_id % 50 = 0
    ), pats AS (
      SELECT * FROM (VALUES {vals}) v(pattern_id, pat)
    ), pos AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
    ), occ AS (
      SELECT p.pattern_id, x.doc_id
      FROM pos x CROSS JOIN pats p
      WHERE x.i + len(p.pat) - 1 <= len(x.t)
        AND list_slice(x.t, CAST(x.i AS INT),
                       CAST(x.i + len(p.pat) - 1 AS INT)) = p.pat
    )
    SELECT p.pattern_id, CAST(len(p.pat) AS BIGINT) AS pattern_len,
           CAST(count(DISTINCT o.doc_id) AS BIGINT) AS n_docs,
           CAST(count(o.doc_id) AS BIGINT) AS n_occurrences
    FROM pats p LEFT JOIN occ o USING (pattern_id)
    GROUP BY p.pattern_id, p.pat
    """.format(vals=", ".join(
        "({}, [{}])".format(i, ", ".join(f"'{t}'" for t in p))
        for i, p in _TOKEN_FREQ_PATTERNS
    ))


@register("token_ngram_frequency_search", oracle=_TOKEN_FREQ_SQL,
          tags=("dedup", "extension"))
def token_ngram_frequency_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-n-gram frequency search — the infini-gram query unit at the
    unit it actually serves (operators/suffix.py:token_pattern_counts):
    exact overlapping occurrence counts of token sequences of any length
    over the token-level suffix machinery (array slice keys, binary rank
    decomposition, no token comparison after construction). The oracle
    recounts every position by direct list-slice comparison, zero rows
    included."""
    from frappe_data_pipelines_spark.operators.suffix import token_pattern_counts

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    tokens = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("tokens"),
    )
    pats = spark.createDataFrame(
        _TOKEN_FREQ_PATTERNS, "pattern_id long, pattern array<string>"
    )
    return token_pattern_counts(tokens, pats)


_LRS_SQL = """
    WITH sufs AS (
      SELECT doc_id, CAST(p.p AS BIGINT) AS pos, substr(text, CAST(p.p AS INT)) AS s
      FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text))) AS p) p
      WHERE doc_id % 100 = 0 AND len(text) > 0
    ), ordered AS (
      SELECT doc_id AS doc_a, pos AS pos_a, s,
             lead(doc_id) OVER w AS doc_b,
             lead(pos) OVER w AS pos_b,
             lead(s) OVER w AS s2
      FROM sufs WINDOW w AS (ORDER BY s, doc_id, pos)
    ), lcps AS (
      SELECT doc_a, pos_a, doc_b, pos_b,
             (SELECT coalesce(max(k.k), 0)
              FROM (SELECT unnest(generate_series(1, least(len(s), len(s2)))) AS k) k
              WHERE substr(s, 1, CAST(k.k AS INT)) = substr(s2, 1, CAST(k.k AS INT)))
               AS lcp
      FROM ordered WHERE s2 IS NOT NULL
    )
    SELECT CAST(lcp AS BIGINT) AS lcp, doc_a, pos_a, doc_b, pos_b,
           substr(s, 1, CAST(lcp AS INT)) AS repeated
    FROM lcps JOIN sufs ON sufs.doc_id = lcps.doc_a AND sufs.pos = lcps.pos_a
    WHERE lcp >= 1
    ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b
    LIMIT 5
    """


@register("longest_repeated_substring", oracle=_LRS_SQL, tags=("dedup", "extension"))
def longest_repeated_substring_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 longest substrings occurring >= 2 times in the slice — the
    flagship suffix-array application (operators/suffix.py): global
    suffix adjacency from the prefix-doubling ranks, per-pair LCP
    decomposed over the O(log n) rank tables with no character
    comparison anywhere. The oracle recomputes every adjacent-pair LCP
    by direct prefix comparison in SQL, so lengths, occurrence
    coordinates, AND the repeated text itself are value-checked."""
    from frappe_data_pipelines_spark.operators.suffix import (
        longest_repeated_substrings,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    return longest_repeated_substrings(docs, k=5)


_LCP_ARRAY_SQL = """
    WITH sufs AS (
      SELECT doc_id, CAST(p.p AS BIGINT) AS pos, substr(text, CAST(p.p AS INT)) AS s
      FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text))) AS p) p
      WHERE doc_id % 100 = 0 AND len(text) > 0
    ), ordered AS (
      SELECT doc_id AS doc_a, pos AS pos_a, s,
             lead(doc_id) OVER w AS doc_b,
             lead(pos) OVER w AS pos_b,
             lead(s) OVER w AS s2
      FROM sufs WINDOW w AS (ORDER BY s, doc_id, pos)
    )
    SELECT doc_a, pos_a, doc_b, pos_b,
           CAST((SELECT coalesce(max(k.k), 0)
                 FROM (SELECT unnest(generate_series(1, least(len(s), len(s2)))) AS k) k
                 WHERE substr(s, 1, CAST(k.k AS INT)) = substr(s2, 1, CAST(k.k AS INT)))
                AS BIGINT) AS lcp
    FROM ordered WHERE s2 IS NOT NULL
    """


@register("suffix_lcp_array", oracle=_LCP_ARRAY_SQL, tags=("dedup", "extension"))
def suffix_lcp_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LCP array of the generalized suffix array as a first-class
    relation: EVERY lexicographically adjacent suffix pair with its
    longest-common-prefix length, computed character-comparison-free over
    the prefix-doubling rank tables (operators/suffix.py). The oracle
    recomputes each LCP by direct prefix comparison, so the whole array
    — including the zero entries — is value-checked."""
    from frappe_data_pipelines_spark.operators.suffix import suffix_lcp_adjacent

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    return suffix_lcp_adjacent(docs).select(
        "doc_a",
        F.col("pos_a").cast("bigint").alias("pos_a"),
        "doc_b",
        F.col("pos_b").cast("bigint").alias("pos_b"),
        F.col("lcp").cast("bigint").alias("lcp"),
    )


_DISTINCT_SUBSTR_SQL = """
    WITH sufs AS (
      SELECT doc_id, CAST(p.p AS BIGINT) AS pos, substr(text, CAST(p.p AS INT)) AS s
      FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text))) AS p) p
      WHERE doc_id % 100 = 0 AND len(text) > 0
    ), ordered AS (
      SELECT s, lead(s) OVER (ORDER BY s, doc_id, pos) AS s2 FROM sufs
    ), lcps AS (
      SELECT (SELECT coalesce(max(k.k), 0)
              FROM (SELECT unnest(generate_series(1, least(len(s), len(s2)))) AS k) k
              WHERE substr(s, 1, CAST(k.k AS INT)) = substr(s2, 1, CAST(k.k AS INT)))
               AS lcp
      FROM ordered WHERE s2 IS NOT NULL
    )
    SELECT (SELECT CAST(sum(len(s)) AS DECIMAL(38,0)) FROM sufs) AS n_suffix_chars,
           (SELECT CAST(coalesce(sum(lcp), 0) AS DECIMAL(38,0)) FROM lcps) AS sum_lcp,
           CAST((SELECT CAST(sum(len(s)) AS DECIMAL(38,0)) FROM sufs)
             - (SELECT CAST(coalesce(sum(lcp), 0) AS DECIMAL(38,0)) FROM lcps)
             AS DECIMAL(38,0))
             AS n_distinct_substrings
    """


@register("corpus_distinct_substrings", oracle=_DISTINCT_SUBSTR_SQL,
          tags=("dedup", "extension"))
def corpus_distinct_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count of DISTINCT substrings of every length in the slice —
    the generalized-suffix-array identity (sum of suffix lengths minus the
    LCP-array sum), a corpus-diversity statistic no sketch computes
    exactly. Rides the same character-comparison-free LCP machinery as
    longest_repeated_substring; the oracle recomputes every adjacent LCP
    by direct prefix comparison."""
    from frappe_data_pipelines_spark.operators.suffix import (
        distinct_substring_stats,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    return distinct_substring_stats(docs)


# fixed query parameters, identical on both sides: lengths 1..21 exercise
# every shape of the binary rank decomposition (1 / 8+2 / 16+2+1 / 16+4 /
# 16+4+1), with present AND absent patterns so the zero path is checked too
_FREQ_PATTERNS = [
    (1, "value"),
    (2, "value fast"),
    (3, "the line sort table"),
    (4, "zz-not-in-the-corpus"),
    (5, "a"),
    (6, "batch part value fast"),
]

_SUBSTR_FREQ_SQL = """
    WITH pats(pattern_id, pattern) AS (VALUES {vals}),
    docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 100 = 0 AND len(text) > 0
    ), occ AS (
      SELECT p.pattern_id, d.doc_id
      FROM docs d CROSS JOIN pats p,
           LATERAL (SELECT unnest(generate_series(
                      1, len(d.text) - len(p.pattern) + 1)) AS i) i
      WHERE substr(d.text, CAST(i.i AS INT), CAST(len(p.pattern) AS INT))
              = p.pattern
    )
    SELECT p.pattern_id, p.pattern,
           CAST(len(p.pattern) AS BIGINT) AS pattern_len,
           CAST(count(DISTINCT o.doc_id) AS BIGINT) AS n_docs,
           CAST(count(o.doc_id) AS BIGINT) AS n_occurrences
    FROM pats p LEFT JOIN occ o USING (pattern_id)
    GROUP BY p.pattern_id, p.pattern
    """.format(vals=", ".join(f"({i}, '{p}')" for i, p in _FREQ_PATTERNS))


@register("substring_frequency_search", oracle=_SUBSTR_FREQ_SQL,
          tags=("dedup", "extension"))
def substring_frequency_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-frequency queries over the suffix machinery
    (operators/suffix.py:substring_pattern_counts): exact overlapping
    occurrence counts of arbitrary-length patterns — the rank-range
    application a suffix array exists for (infini-gram-style counting).
    Patterns join the corpus as pseudo-documents before prefix doubling,
    then each is consumed by its binary decomposition over the rank
    levels: seed at 2^floor(log2 L), refine down the bit-widths — no
    character comparison, no per-pattern corpus scan. The oracle counts
    by direct substring comparison at every position, so hit counts,
    doc counts, AND the zero rows are value-checked."""
    from frappe_data_pipelines_spark.operators.suffix import (
        substring_pattern_counts,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    pats = spark.createDataFrame(_FREQ_PATTERNS, "pattern_id long, pattern string")
    return substring_pattern_counts(docs, pats)


_CONT_PATTERNS = [(1, "value"), (2, "the "), (3, "a"), (4, "zz-none")]

_CONTINUATION_SQL = """
    WITH pats(pattern_id, pattern) AS (VALUES {vals}),
    docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 100 = 0 AND len(text) > 0
    ), occ AS (
      SELECT p.pattern_id, p.pattern,
             substr(d.text, CAST(i.i + len(p.pattern) AS INT), 1) AS next_char
      FROM docs d CROSS JOIN pats p,
           LATERAL (SELECT unnest(generate_series(
                      1, len(d.text) - len(p.pattern) + 1)) AS i) i
      WHERE substr(d.text, CAST(i.i AS INT), CAST(len(p.pattern) AS INT))
              = p.pattern
    )
    SELECT pattern_id, pattern, next_char,
           CAST(count(*) AS BIGINT) AS n_continuations
    FROM occ GROUP BY 1, 2, 3
    """.format(vals=", ".join(f"({i}, '{p}')" for i, p in _CONT_PATTERNS))


@register("pattern_continuation_counts", oracle=_CONTINUATION_SQL,
          tags=("dedup", "extension"))
def pattern_continuation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ∞-gram continuation query (infini-gram, Liu et al. 2024) over
    the suffix machinery (operators/suffix.py:pattern_continuations): for
    each context pattern, the full next-character distribution across
    every exact corpus occurrence — normalize per pattern and you have
    the backoff-free ∞-gram LM the paper serves from a suffix array.
    Matching is the character-comparison-free binary rank decomposition;
    the single extra step reads one following char per occurrence via a
    broadcast join. The oracle recounts every continuation positionally,
    so the whole distribution is value-checked (absent patterns
    contribute no rows on either side)."""
    from frappe_data_pipelines_spark.operators.suffix import (
        pattern_continuations,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    pats = spark.createDataFrame(_CONT_PATTERNS, "pattern_id long, pattern string")
    return pattern_continuations(docs, pats)


_TOKEN_CONT_PATTERNS = [(1, "the"), (2, "hash"), (3, "zz-none")]

_TOKEN_CONT_SQL = """
    WITH pats(pattern_id, pattern) AS (VALUES {vals}),
    docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 100 = 0 AND len(text) > 0
    ), occ AS (
      SELECT p.pattern_id, p.pattern,
             regexp_extract(substr(d.text, CAST(i.i + len(p.pattern) AS INT)),
                            '^ *([^ ]*)', 1) AS next_token
      FROM docs d CROSS JOIN pats p,
           LATERAL (SELECT unnest(generate_series(
                      1, len(d.text) - len(p.pattern) + 1)) AS i) i
      WHERE substr(d.text, CAST(i.i AS INT), CAST(len(p.pattern) AS INT))
              = p.pattern
    )
    SELECT pattern_id, pattern, next_token,
           CAST(count(*) AS BIGINT) AS n_continuations
    FROM occ GROUP BY 1, 2, 3
    """.format(vals=", ".join(f"({i}, '{p}')" for i, p in _TOKEN_CONT_PATTERNS))


@register("pattern_token_continuations", oracle=_TOKEN_CONT_SQL,
          tags=("dedup", "extension"))
def pattern_token_continuations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-TOKEN distributions after each context — the unit an ∞-gram
    LM actually predicts (operators/suffix.py:pattern_token_continuations):
    the shared character-comparison-free matcher plus one regexp over the
    post-match substring extracts the maximal space-delimited token. The
    oracle recounts positionally and re-extracts every token, so the
    whole distribution — including the absent pattern's empty one — is
    value-checked."""
    from frappe_data_pipelines_spark.operators.suffix import (
        pattern_token_continuations,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    pats = spark.createDataFrame(
        _TOKEN_CONT_PATTERNS, "pattern_id long, pattern string"
    )
    return pattern_token_continuations(docs, pats)


# the inference prompt: its 3+-char suffixes miss the corpus, so backoff
# must land on the 2-char context ' s' — which fans out into a real
# multi-char distribution (words starting with s)
_BACKOFF_QUERY = "zzqq s"

_BACKOFF_SQL = """
    WITH pats(pattern_id, pattern) AS (VALUES {vals}),
    docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 100 = 0 AND len(text) > 0
    ), occ AS (
      SELECT p.pattern_id, p.pattern,
             substr(d.text, CAST(i.i + len(p.pattern) AS INT), 1) AS next_char
      FROM docs d CROSS JOIN pats p,
           LATERAL (SELECT unnest(generate_series(
                      1, len(d.text) - len(p.pattern) + 1)) AS i) i
      WHERE substr(d.text, CAST(i.i AS INT), CAST(len(p.pattern) AS INT))
              = p.pattern
    ), best AS (SELECT max(pattern_id) AS b FROM occ),
    chosen AS (SELECT o.* FROM occ o JOIN best ON o.pattern_id = best.b),
    f AS (
      SELECT pattern_id, pattern, next_char,
             CAST(count(*) AS BIGINT) AS n_continuations
      FROM chosen GROUP BY 1, 2, 3
    ), t AS (SELECT pattern_id, sum(n_continuations) AS total FROM f GROUP BY 1)
    SELECT f.pattern_id AS context_len, f.pattern AS context, f.next_char,
           f.n_continuations,
           round(f.n_continuations / t.total, 6) AS p
    FROM f JOIN t USING (pattern_id)
    """.format(
    vals=", ".join(
        f"({n}, '{_BACKOFF_QUERY[len(_BACKOFF_QUERY) - n:]}')"
        for n in range(1, len(_BACKOFF_QUERY) + 1)
    )
)


@register("infinigram_backoff_inference", oracle=_BACKOFF_SQL,
          tags=("dedup", "extension"))
def infinigram_backoff_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ∞-gram INFERENCE step (operators/suffix.py:infinigram_backoff):
    longest query suffix present in the corpus wins, and its
    next-character distribution with backoff-free probabilities is the
    answer — the full infini-gram LM serving operation, not just the
    counting primitive. All of the prompt's candidate suffixes ride ONE
    rank-level construction as pseudo-docs; the winning context is
    selected with a 1-row cross join, no driver round trip. The oracle
    recounts every candidate suffix positionally, re-derives the argmax
    context, and re-normalizes — lengths, contexts, counts, AND
    probabilities all value-checked."""
    from frappe_data_pipelines_spark.operators.suffix import infinigram_backoff

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    return infinigram_backoff(docs, _BACKOFF_QUERY)


def _suffix_index_cache_dir(sf_dir: str) -> str:
    """Deterministic per-(sf_dir, corpus-subset, max_width) cache location
    for the persisted suffix index — keyed so sf0.01 correctness runs and
    sf0.1 bench runs never share an index. /tmp because the index is a
    derived cache, not repo content; the source table's size+mtime ride
    the key (VERDICT r12 item 8), so replaced testdata yields a NEW dir
    and a rebuild — a stale index can never serve."""
    import hashlib
    import os
    import tempfile

    from frappe_data_pipelines_spark.sources.tables import source_stat_key

    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|doc_id%100|w8|v1"
        f"|{source_stat_key(sf_dir, 'documents')}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"fdp_suffix_index_{key}")


# the index stores, per power-of-two width w: a rank LEVEL (one row per
# suffix position) and the dense-rank DICTIONARY that created it. The
# oracle re-derives both tables' invariants from scratch: n_positions =
# every (doc, pos), and n_distinct = max(rank) = the number of distinct
# clamped w-char substrings ((r1, r2) pairs biject onto clamped 2h-strings
# under prefix doubling, so count(DISTINCT substr) checks the dictionary
# sizes exactly). Assumes max doc length >= 8, which the documents table
# guarantees at every sf.
_SUFFIX_INDEX_SQL = """
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 100 = 0 AND len(text) > 0
    ), pos AS (
      SELECT text, i.i FROM docs,
             LATERAL (SELECT unnest(generate_series(1, len(text))) AS i) i
    ), w(width) AS (VALUES (1), (2), (4), (8))
    SELECT CAST(w.width AS BIGINT) AS width,
           CAST(count(*) AS BIGINT) AS n_positions,
           CAST(count(DISTINCT substr(text, CAST(i AS INT), w.width)) AS BIGINT)
             AS n_distinct
    FROM pos CROSS JOIN w
    GROUP BY w.width
    """


@register("suffix_index_build", oracle=_SUFFIX_INDEX_SQL,
          tags=("dedup", "extension"))
def suffix_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD half of the ∞-gram build-once/query-many split (VERDICT r10
    task 2; operators/suffixindex.py:build_suffix_index): construct and
    persist the prefix-doubling rank levels + dense-rank dictionaries up
    to width 8 — the suite's per-round tracking of the construction cost,
    separated from the serving cost (``infinigram_query_cached``). Always
    rebuilds (that is the cost being measured); the index lands in the
    cache dir the query half reads. Returns the per-level summary
    (width, n_positions, n_distinct), which the oracle re-derives from
    the raw text — so what's ON DISK is value-checked, not just row
    counts."""
    from frappe_data_pipelines_spark.operators.suffixindex import (
        build_suffix_index,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    idx = build_suffix_index(docs, _suffix_index_cache_dir(sf_dir), max_width=8)
    return spark.createDataFrame(
        idx.summary(), "width long, n_positions long, n_distinct long"
    )


# cached-counting parameters: lengths 1..15 (the w=8 index's servable
# bound is 2*8-1) exercising seed-only (1, 8), seed+1 (9), and the full
# 8+4+2+1 decomposition (15), plus an absent pattern for the zero path
_FREQ_CACHED_PATTERNS = [
    (1, "value"),
    (2, "a"),
    (3, "value fast"),
    (4, "zz-not-here"),
    (5, "the line sort t"),
    (6, "rank sum"),
]

_SUBSTR_FREQ_CACHED_SQL = """
    WITH pats(pattern_id, pattern) AS (VALUES {vals}),
    docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 100 = 0 AND len(text) > 0
    ), occ AS (
      SELECT p.pattern_id, d.doc_id
      FROM docs d CROSS JOIN pats p,
           LATERAL (SELECT unnest(generate_series(
                      1, len(d.text) - len(p.pattern) + 1)) AS i) i
      WHERE substr(d.text, CAST(i.i AS INT), CAST(len(p.pattern) AS INT))
              = p.pattern
    )
    SELECT p.pattern_id, p.pattern,
           CAST(len(p.pattern) AS BIGINT) AS pattern_len,
           CAST(count(DISTINCT o.doc_id) AS BIGINT) AS n_docs,
           CAST(count(o.doc_id) AS BIGINT) AS n_occurrences
    FROM pats p LEFT JOIN occ o USING (pattern_id)
    GROUP BY p.pattern_id, p.pattern
    """.format(vals=", ".join(f"({i}, '{p}')" for i, p in _FREQ_CACHED_PATTERNS))


@register("substring_frequency_cached", oracle=_SUBSTR_FREQ_CACHED_SQL,
          tags=("dedup", "extension"))
def substring_frequency_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-frequency counting served from the PERSISTED index
    (operators/suffixindex.py:indexed_pattern_counts) — the counting twin
    of ``infinigram_query_cached``: piece ranks from one string-dictionary
    lookup, occurrences from one kernel pass over the wide rank table, no
    construction, no corpus rescan. The oracle counts by direct substring
    comparison at every position (hit counts, doc counts, AND zero rows
    value-checked), identical in form to ``substring_frequency_search``'s
    — so the driver gate proves cached == from-scratch on disjoint
    pattern shapes up to the servable length bound."""
    from frappe_data_pipelines_spark.operators.suffixindex import (
        SuffixIndex,
        indexed_pattern_counts_local,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    idx = SuffixIndex.read_or_build(
        spark, docs, _suffix_index_cache_dir(sf_dir), max_width=8
    )
    # patterns are query literals — the local serving path skips the
    # pattern-DataFrame collect job (serving budget is JOB COUNT)
    return indexed_pattern_counts_local(idx, _FREQ_CACHED_PATTERNS)


@register("infinigram_query_cached", oracle=_BACKOFF_SQL,
          tags=("dedup", "extension"))
def infinigram_query_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY half of the split (operators/suffixindex.py:
    infinigram_backoff_indexed): ∞-gram inference served from the
    PERSISTED index — pattern ranks come from the stored dense-rank
    dictionaries (O(log max_width) map-only broadcast joins), the match
    reuses the uncached path's refinement loop, and NO rank construction
    runs. Same oracle as ``infinigram_backoff_inference``: identical
    result contract, so the cached path is value-checked against the
    from-scratch SQL recount. Builds the index on a cold cache (first
    call after ``suffix_index_build`` is always warm)."""
    from frappe_data_pipelines_spark.operators.suffixindex import (
        SuffixIndex,
        infinigram_backoff_indexed,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    idx = SuffixIndex.read_or_build(
        spark, docs, _suffix_index_cache_dir(sf_dir), max_width=8
    )
    return infinigram_backoff_indexed(docs, idx, _BACKOFF_QUERY)


def _token_suffix_index_cache_dir(sf_dir: str) -> str:
    """Cache location for the persisted TOKEN suffix index — keyed like
    ``_suffix_index_cache_dir`` (per sf_dir, corpus subset, width, source
    size+mtime) so correctness and bench runs never share an index and
    replaced testdata forces a rebuild."""
    import hashlib
    import os
    import tempfile

    from frappe_data_pipelines_spark.sources.tables import source_stat_key

    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|doc_id%50|w8|tok|v1"
        f"|{source_stat_key(sf_dir, 'documents')}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"fdp_token_suffix_index_{key}")


def _doc_tokens(spark: SparkSession, sf_dir: str):
    """The token family's shared corpus: doc_id %% 50 slice, lowercased
    [^a-z0-9]+ split — identical to ``token_suffix_array_ranks``'s, so
    every token-index query shares one tokenization contract with its
    oracle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("tokens"),
    )


# oracle re-derives both persisted-table invariants from raw text at the
# TOKEN unit: n_positions = every (doc, token-pos); n_distinct = max(rank)
# = the number of distinct CLAMPED w-token slices (list_slice clamps at
# the document tail exactly like the index's clamped keys)
_TOKEN_INDEX_SQL = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents WHERE doc_id % 50 = 0
    ), pos AS (
      SELECT t, unnest(generate_series(1, len(t))) AS i
      FROM toks WHERE len(t) > 0
    ), w(width) AS (VALUES (1), (2), (4), (8))
    SELECT CAST(w.width AS BIGINT) AS width,
           CAST(count(*) AS BIGINT) AS n_positions,
           CAST(count(DISTINCT list_slice(t, CAST(i AS INT),
                  CAST(i + w.width - 1 AS INT))) AS BIGINT) AS n_distinct
    FROM pos CROSS JOIN w
    GROUP BY w.width
    """


@register("token_suffix_index_build", oracle=_TOKEN_INDEX_SQL,
          tags=("dedup", "extension"))
def token_suffix_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD half of the TOKEN-level build/serve split (VERDICT r11 task
    2; operators/suffixindex.py:build_token_suffix_index): the same
    persisted rank-level + dictionary + wide-serving-table layout the
    char-level ∞-gram index got in r11, at the token unit Lee et al. 2021
    and infini-gram actually operate on — so the token pattern/
    continuation family stops paying Manber–Myers construction per query.
    Always rebuilds (the cost being measured); returns the per-level
    summary the oracle re-derives from raw tokenized text, value-checking
    what's ON DISK."""
    from frappe_data_pipelines_spark.operators.suffixindex import (
        build_token_suffix_index,
    )

    idx = build_token_suffix_index(
        _doc_tokens(spark, sf_dir), _token_suffix_index_cache_dir(sf_dir),
        max_width=8,
    )
    return spark.createDataFrame(
        idx.summary(), "width long, n_positions long, n_distinct long"
    )


@register("token_ngram_frequency_cached", oracle=_TOKEN_FREQ_SQL,
          tags=("dedup", "extension"))
def token_ngram_frequency_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-n-gram frequency served from the PERSISTED token index
    (operators/suffixindex.py:indexed_token_pattern_counts) — the cached
    twin of ``token_ngram_frequency_search``, same oracle, same pattern
    parameters: piece ranks from one skey scan, occurrences from one
    map-only kernel pass, no construction, no token comparison. The gate
    proves cached == from-scratch at the token unit."""
    from frappe_data_pipelines_spark.operators.suffixindex import (
        SuffixIndex,
        indexed_token_pattern_counts_local,
    )

    tokens = _doc_tokens(spark, sf_dir)
    idx = SuffixIndex.read_or_build_tokens(
        spark, tokens, _token_suffix_index_cache_dir(sf_dir), max_width=8
    )
    return indexed_token_pattern_counts_local(idx, _TOKEN_FREQ_PATTERNS)


# next-token contexts: a unigram (wide fan-out), a present bigram, and a
# guaranteed miss (zero rows)
_TOKEN_NEXT_PATTERNS = [
    (1, ["the"]),
    (2, ["hash", "value"]),
    (3, ["no", "such", "gram"]),
]

_TOKEN_NEXT_SQL = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents WHERE doc_id % 50 = 0
    ), pats AS (
      SELECT * FROM (VALUES {vals}) v(pattern_id, pat)
    ), pos AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
    ), occ AS (
      SELECT p.pattern_id,
             coalesce(t[CAST(x.i + len(p.pat) AS INT)], '') AS next_token
      FROM pos x CROSS JOIN pats p
      WHERE x.i + len(p.pat) - 1 <= len(x.t)
        AND list_slice(x.t, CAST(x.i AS INT),
                       CAST(x.i + len(p.pat) - 1 AS INT)) = p.pat
    )
    SELECT pattern_id, next_token,
           CAST(count(*) AS BIGINT) AS n_continuations
    FROM occ GROUP BY 1, 2
    """.format(vals=", ".join(
        "({}, [{}])".format(i, ", ".join(f"'{t}'" for t in p))
        for i, p in _TOKEN_NEXT_PATTERNS
    ))


@register("token_next_distribution_cached", oracle=_TOKEN_NEXT_SQL,
          tags=("dedup", "extension"))
def token_next_distribution_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-TOKEN distribution after each context n-gram, served from the
    persisted token index (operators/suffixindex.py:
    indexed_next_token_distribution) — the token-unit ∞-gram prediction:
    following tokens come back as width-1 ranks from the kernel scan and
    map to strings through one vocabulary-sized broadcast ('' at a
    document boundary). The oracle recounts positionally by list-slice
    comparison — contexts, tokens, AND counts value-checked, boundary
    events included."""
    from frappe_data_pipelines_spark.operators.suffixindex import (
        SuffixIndex,
        indexed_next_token_distribution_local,
    )

    tokens = _doc_tokens(spark, sf_dir)
    idx = SuffixIndex.read_or_build_tokens(
        spark, tokens, _token_suffix_index_cache_dir(sf_dir), max_width=8
    )
    return indexed_next_token_distribution_local(idx, _TOKEN_NEXT_PATTERNS)


_INCR_SPAN_SQL = """
    WITH win AS (
      SELECT doc_id, p.p AS pos, substr(text, p.p, 40) AS s
      FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text) - 39)) AS p) p
      WHERE len(text) >= 40
    ), corp AS (
      SELECT DISTINCT s FROM win WHERE doc_id % 20 <> 3
    ), d AS (
      SELECT w.doc_id, w.pos FROM win w JOIN corp USING (s)
      WHERE w.doc_id % 20 = 3
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + 40) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_isl
      FROM d
    ), isl2 AS (
      SELECT doc_id, pos,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 40 AS BIGINT) AS span_end,
           CAST(max(pos) + 40 - min(pos) AS BIGINT) AS span_len
    FROM isl2
    GROUP BY doc_id, island
    """


@register("incremental_dup_spans", oracle=_INCR_SPAN_SQL, tags=("dedup", "extension"))
def incremental_dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup at the ingest door: the doc_id%20==3 slice
    plays the arriving micro-batch, everything else the standing corpus;
    every maximal span of a new doc whose 40-char windows occur verbatim
    in the corpus is reported. The Spark path runs the winnow-prefiltered
    production shape (corpus pays a ~2/(w+1)-density fingerprint scan,
    never the stride-1 blowup; new windows broadcast) — lossless by the
    SIGMOD'03 guarantee, so it matches the direct two-sided window
    semi-join the oracle runs."""
    from frappe_data_pipelines_spark.operators.dedup import incremental_dup_spans

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 20 == 3)
    corpus = docs.filter(F.col("doc_id") % 20 != 3)
    return incremental_dup_spans(corpus, new, min_len=40).select(
        "doc_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("span_len").cast("bigint").alias("span_len"),
    )


_INCR_SCRUB_SQL = f"""
    WITH spans AS ({_INCR_SPAN_SQL}
    ), newdocs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 20 = 3
    ), per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(span_len) AS BIGINT) AS chars_removed
      FROM spans GROUP BY doc_id
    ), segs AS (
      SELECT doc_id,
             coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start), 1)
               AS seg_start,
             span_start AS seg_end
      FROM spans
      UNION ALL
      SELECT s.doc_id, max(s.span_end), max(len(d.text)) + 1
      FROM spans s JOIN newdocs d USING (doc_id)
      GROUP BY s.doc_id
    ), stitched AS (
      SELECT g.doc_id,
             string_agg(substr(d.text, CAST(g.seg_start AS INT),
                               CAST(g.seg_end - g.seg_start AS INT)),
                        '' ORDER BY g.seg_start) AS cleaned_text
      FROM segs g JOIN newdocs d USING (doc_id)
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.text) AS BIGINT) AS n_chars,
           coalesce(p.n_spans, 0) AS n_spans,
           coalesce(p.chars_removed, 0) AS chars_removed,
           CAST(len(d.text) - coalesce(p.chars_removed, 0) AS BIGINT) AS n_kept,
           coalesce(s.cleaned_text, d.text) AS cleaned_text
    FROM newdocs d
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN stitched s USING (doc_id)
    """


@register("incremental_substring_scrub", oracle=_INCR_SCRUB_SQL,
          tags=("dedup", "extension"))
def incremental_substring_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean arriving documents at the ingest door: every region of a
    doc_id%20==3 arrival that exists verbatim in the standing corpus is
    cut before the doc proceeds — the incremental APPLY, sharing the
    winnow-prefiltered span detection and the JVM stitch with the batch
    scrub. cleaned_text is value-checked character for character."""
    from frappe_data_pipelines_spark.operators.dedup import (
        incremental_substring_scrub,
    )

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 20 == 3)
    corpus = docs.filter(F.col("doc_id") % 20 != 3)
    return incremental_substring_scrub(corpus, new, min_len=40)


_WINNOW_SQL = """
    WITH grams AS (
      SELECT doc_id, p.p AS pos,
             substr(md5(substr(text, p.p, 8)), 1, 16)
               || lpad(CAST(99999999 - p.p AS VARCHAR), 8, '0') AS key
      FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text) - 7)) AS p) p
      WHERE len(text) >= 8
    ), winm AS (
      SELECT doc_id, pos,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 32 FOLLOWING) AS wmin,
             count(*) OVER (PARTITION BY doc_id) AS n
      FROM grams
    )
    SELECT DISTINCT doc_id,
           CAST(99999999 - CAST(substr(wmin, 17, 8) AS BIGINT) AS BIGINT) AS pos,
           substr(wmin, 1, 16) AS fp
    FROM winm
    WHERE pos <= n - 32
    """


@register("winnow_fingerprint_select", oracle=_WINNOW_SQL, tags=("dedup", "extension"))
def winnow_fingerprint_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD'03) at
    k=8, w=33: in every window of 33 consecutive 8-gram hashes keep the
    minimum (rightmost on ties) — ~2/(w+1) of positions, with the guarantee
    that any cross-doc duplicate of length >= w+k-1 = 40 shares a selected
    fingerprint. The argmin is ONE sliding-frame min over an order-encoding
    key (hash hex ‖ inverted position), identical SQL on the oracle side —
    no self-join, no UDF, so the selection pass streams at scan speed."""
    from frappe_data_pipelines_spark.operators.dedup import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=8, w=33).select(
        "doc_id", F.col("pos").cast("bigint").alias("pos"), "fp"
    )


# ---------------------------------------------------------------------------
# PII redaction (pre-training scrub)
# ---------------------------------------------------------------------------

def _pii_oracle() -> str:
    from frappe_data_pipelines_spark.operators.quality import PII_PATTERNS

    inj = (
        "substr(text, 1, 80) || ' contact: user' || doc_id || '@example.com tel 555-' "
        "|| lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' "
        "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
        "|| ' card 4111 1111 1111 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
        "|| ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' "
        "|| lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' "
        "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
        "|| ' ip 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)"
    )
    chain = "t"
    for name, pat in PII_PATTERNS.items():
        chain = f"regexp_replace({chain}, '{pat}', '<{name.upper()}>', 'g')"
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    total = " + ".join(
        f"len(regexp_extract_all(t, '{pat}'))" for pat in PII_PATTERNS.values()
    )
    return f"""
    WITH inj AS (SELECT doc_id, {inj} AS t FROM documents)
    SELECT doc_id,
           {chain} AS redacted,
           {counts},
           CAST({total} AS BIGINT) AS pii_total
    FROM inj
    """


@register("pii_redaction", oracle=_pii_oracle(), tags=("quality", "extension"))
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: deterministic PII-shaped strings (email,
    phone, credit card, SSN, IPv4 — all derived from doc_id so the oracle
    can rebuild the identical input) are injected, then redacted and
    counted by ``redact_pii`` (five pattern families vs pii_scrub's three;
    adds per-type counts). Pure regexp Column expressions: a map-only
    whole-stage-codegen pass, no shuffle at any scale. Reference has no
    PII pass; this is the standard pre-training scrub (cf. C4/RefinedWeb).
    """
    from frappe_data_pipelines_spark.operators.quality import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def _lp(mod: int, w: int) -> F.Column:
        return F.lpad((d % mod).cast("string"), w, "0")

    injected = F.concat(
        F.substring("text", 1, 80),
        F.lit(" contact: user"), d.cast("string"), F.lit("@example.com tel 555-"),
        _lp(1000, 3), F.lit("-"), _lp(10000, 4),
        F.lit(" card 4111 1111 1111 "), _lp(10000, 4),
        F.lit(" ssn "), _lp(1000, 3), F.lit("-"), _lp(100, 2), F.lit("-"), _lp(10000, 4),
        F.lit(" ip 10.0."), (d % 256).cast("string"), F.lit("."),
        ((d * 7) % 256).cast("string"),
    )
    inj = docs.select("doc_id", injected.alias("text"))
    return redact_pii(inj, keep_cols=["doc_id"])



# ---------------------------------------------------------------------------
# Intra-document exact repetition (suffix automaton)
# ---------------------------------------------------------------------------

# Oracle: longest repeated token sequence == max LCP over ADJACENT suffixes
# in sorted order (suffix-array identity) — tractable in SQL because prefix
# equality is monotone in i, so counting equal prefixes measures the LCP.
_INTRA_REPEAT_SQL = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents
    ), suf AS (
      SELECT doc_id, t[g.i:len(t)] AS s
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g
      WHERE len(t) >= 1
    ), ordered AS (
      SELECT doc_id, s, lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
      FROM suf
    ), lcp AS (
      SELECT doc_id,
             CASE WHEN prev IS NULL THEN 0 ELSE
               len(list_filter(generate_series(1, least(len(s), len(prev))),
                               i -> s[1:i] = prev[1:i]))
             END AS l
      FROM ordered
    )
    SELECT doc_id, CAST(max(l) AS BIGINT) AS max_repeat_tokens
    FROM lcp GROUP BY doc_id
"""


@register("intra_doc_repeat_len", oracle=_INTRA_REPEAT_SQL, tags=("dedup", "quality", "extension"))
def intra_doc_repeat_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest repeated token sequence per document via a suffix automaton
    (operators/dedup.py:longest_intra_doc_repeat) — the exact repetition
    metric behind Gopher-style boilerplate pruning. Linear per doc, pure
    map stage; the oracle cross-checks with the suffix-array adjacent-LCP
    identity, so two independent algorithms must agree on every doc."""
    from frappe_data_pipelines_spark.operators.dedup import longest_intra_doc_repeat

    docs = load_table(spark, sf_dir, "documents")
    return longest_intra_doc_repeat(docs)


# ---------------------------------------------------------------------------
# PageRank over the k-NN similarity graph
# ---------------------------------------------------------------------------

def _pagerank_sql(iters: int = 3) -> str:
    """Oracle with the fixed-point iterations unrolled as CTEs (the same
    determinism move as semdedup's unrolled k-means)."""
    parts = [
        """sims AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS s
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )""",
        """knn AS (
      SELECT src, dst FROM (
        SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rn
        FROM sims
      ) WHERE rn <= 5
    )""",
        """edges AS (
      SELECT DISTINCT least(src, dst) AS id_a, greatest(src, dst) AS id_b FROM knn
    )""",
        """directed AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION ALL SELECT id_b AS src, id_a AS dst FROM edges
    )""",
        "deg AS (SELECT src, count(*) AS deg FROM directed GROUP BY src)",
        "consts AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg)",
        # rank mass in exact BIGINT nano-units, mirroring operators/graph.py
        """r0 AS (
      SELECT src AS vid,
             CAST(floor(1000000000.0 / (SELECT n FROM consts)) AS BIGINT) AS r
      FROM deg
    )""",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""c{t} AS (
      SELECT d.dst AS vid, r{t-1}.r // g.deg AS c
      FROM directed d JOIN r{t-1} ON d.src = r{t-1}.vid JOIN deg g ON d.src = g.src
    )"""
        )
        parts.append(
            f"s{t} AS (SELECT vid, CAST(sum(c) AS BIGINT) AS s FROM c{t} GROUP BY vid)"
        )
        parts.append(
            f"""r{t} AS (
      SELECT r{t-1}.vid,
             CAST(floor((1.0 - 0.85) * 1000000000.0 / (SELECT n FROM consts)) AS BIGINT)
             + CAST(floor(0.85 * coalesce(s{t}.s, 0)) AS BIGINT) AS r
      FROM r{t-1} LEFT JOIN s{t} ON r{t-1}.vid = s{t}.vid
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT vid, r AS pagerank_nanos,"
        f" r / 1000000000.0 AS pagerank FROM r{iters}"
    )


@register("knn_graph_pagerank", oracle=_pagerank_sql(3), tags=("graph", "extension"))
def knn_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed-point steps, d=0.85) over the undirected k=5
    cosine-NN graph on the embeddings table — graph-centrality data
    selection (operators/graph.py:pagerank). Each iteration is one keyed
    join + one partial-agg groupBy; rank mass rides in exact BIGINT
    nano-units so Spark and the unrolled-CTE oracle agree bit-for-bit."""
    from frappe_data_pipelines_spark.operators.graph import pagerank

    return pagerank(_knn_edges(spark, sf_dir, k=5), damping=0.85, iters=3)


# ---------------------------------------------------------------------------
# Corpus mixture rebalance (uniform target, downsample-only)
# ---------------------------------------------------------------------------

_MIXTURE_SQL = """
    WITH counts AS (
      SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), rates AS (
      SELECT stratum, n_docs,
             CAST((SELECT min(n_docs) FROM counts) AS DOUBLE) / n_docs AS rate
      FROM counts
    ), th AS (
      SELECT stratum, n_docs, rate,
             CASE WHEN rate >= 1.0 THEN 'g'
                  ELSE lpad(lower(to_hex(CAST(floor(rate * 4294967296.0) AS BIGINT))), 8, '0')
             END AS thresh
      FROM rates
    ), drawn AS (
      SELECT d.source AS stratum,
             substring(md5('sample:v1:' || d.doc_id), 1, 8) AS u
      FROM documents d
    ), survivors AS (
      SELECT drawn.stratum, CAST(count(*) AS BIGINT) AS sampled_docs
      FROM drawn JOIN th ON drawn.stratum = th.stratum
      WHERE drawn.u < th.thresh
      GROUP BY drawn.stratum
    )
    SELECT th.stratum, th.n_docs, round(th.rate, 6) AS rate,
           CAST(coalesce(s.sampled_docs, 0) AS BIGINT) AS sampled_docs
    FROM th LEFT JOIN survivors s ON th.stratum = s.stratum
"""


@register("mixture_rebalance", oracle=_MIXTURE_SQL, tags=("quality", "sampling", "extension"))
def mixture_rebalance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-target corpus mixing (operators/quality.py:mixture_rebalance):
    per-source sampling rates that equalize expected counts across sources,
    realized by the deterministic md5-threshold draw — re-runnable and
    engine-portable, no RNG state, no count pass per row. The standard
    pre-training mixture step when one crawl dominates."""
    from frappe_data_pipelines_spark.operators.quality import mixture_rebalance

    docs = load_table(spark, sf_dir, "documents")
    return mixture_rebalance(docs)


# ---------------------------------------------------------------------------
# Naive-Bayes quality classifier (operators/classifier.py) — the trainable
# quality-filter bootstrap (CCNet §4.3 / GPT-3 appendix A), train + score
# both in plain aggregates so the whole model fits in one SQL oracle.
# ---------------------------------------------------------------------------

_NB_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

_NB_SCORES_SQL = f"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS pos, unnest({_NB_TOKS}) AS term FROM documents
    ), counts AS (
      SELECT term,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS c0
      FROM toks GROUP BY term HAVING count(*) >= 2
    ), totals AS (
      SELECT CAST(sum(c1) AS DOUBLE) AS n1_tok, CAST(sum(c0) AS DOUBLE) AS n0_tok,
             CAST(count(*) AS DOUBLE) AS vocab
      FROM counts
    ), w AS (
      SELECT term,
             CAST(round(ln((c1 + 0.5) / (n1_tok + 0.5 * vocab))
                      - ln((c0 + 0.5) / (n0_tok + 0.5 * vocab)), 6)
                  AS DECIMAL(28,6)) AS w
      FROM counts, totals
    ), prior AS (
      SELECT CAST(round(ln(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                         / sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)), 6)
                  AS DECIMAL(28,6)) AS p
      FROM documents
    ), sums AS (
      SELECT doc_id, sum(w.w) AS sw FROM toks JOIN w USING (term) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(p + COALESCE(sw, 0) AS DOUBLE) AS nb_llr,
           (p + COALESCE(sw, 0)) >= 0 AS pred,
           d.lang = 'en' AS is_en
    FROM documents d CROSS JOIN prior LEFT JOIN sums USING (doc_id)
"""


def _nb_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frappe_data_pipelines_spark.operators.classifier import nb_score, nb_train

    docs = load_table(spark, sf_dir, "documents")
    weights, prior = nb_train(docs, label=F.col("lang") == "en", min_count=2)
    return nb_score(docs, weights, prior).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("is_en")), "doc_id"
    )


@register("nb_quality_classifier", oracle=_NB_SCORES_SQL, tags=("quality", "classifier", "extension"))
def nb_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial NB trained on the corpus (reference class: lang='en')
    and scored back over every document — per-doc log-likelihood ratio and
    verdict, bit-identical to the SQL restatement via the exact-decimal
    weight trick. On this synthetic corpus token rates are homogeneous
    across languages, so learned weights hover near zero — the unit tests
    (tests/test_classifier.py) prove real separation on a corpus that has
    signal; THIS query proves distributed train+score parity at scale."""
    return _nb_scored(spark, sf_dir).select("doc_id", "nb_llr", "pred", "is_en")


@register(
    "nb_quality_confusion",
    oracle=f"""
    WITH scored AS ({_NB_SCORES_SQL})
    SELECT pred, is_en, CAST(count(*) AS BIGINT) AS n
    FROM scored GROUP BY pred, is_en
    """,
    tags=("quality", "classifier", "extension"),
)
def nb_quality_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the NB verdict vs the true reference class — the
    accuracy report a filtering run ships with its corpus."""
    return (
        _nb_scored(spark, sf_dir)
        .groupBy("pred", "is_en")
        .agg(F.count("*").cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# Label-propagation communities over the k-NN similarity graph
# ---------------------------------------------------------------------------

def _label_prop_sql(iters: int = 3) -> str:
    """Unrolled-CTE oracle (same determinism move as pagerank): majority
    neighbor label per round, ties to the smallest label."""
    parts = [
        """sims AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS s
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )""",
        """knn AS (
      SELECT src, dst FROM (
        SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rn
        FROM sims
      ) WHERE rn <= 5
    )""",
        """edges AS (
      SELECT DISTINCT least(src, dst) AS id_a, greatest(src, dst) AS id_b FROM knn
    )""",
        """directed AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION ALL SELECT id_b AS src, id_a AS dst FROM edges
    )""",
        "l0 AS (SELECT DISTINCT src AS vid, src AS lbl FROM directed)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""n{t} AS (
      SELECT d.src AS vid, l{t-1}.lbl FROM directed d JOIN l{t-1} ON d.dst = l{t-1}.vid
    )"""
        )
        parts.append(
            f"c{t} AS (SELECT vid, lbl, CAST(count(*) AS BIGINT) AS c FROM n{t} GROUP BY vid, lbl)"
        )
        parts.append(
            f"""l{t} AS (
      SELECT vid, lbl FROM (
        SELECT vid, lbl, row_number() OVER (PARTITION BY vid ORDER BY c DESC, lbl ASC) AS rn
        FROM c{t}
      ) WHERE rn = 1
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    sizes AS (SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
              FROM l{iters} GROUP BY lbl)
    SELECT l.vid, l.lbl AS community, sizes.community_size
    FROM l{iters} l JOIN sizes USING (lbl)"""
    )


@register("knn_graph_communities", oracle=_label_prop_sql(3), tags=("graph", "extension"))
def knn_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the undirected k=5 cosine-NN graph via 3
    synchronous label-propagation rounds (operators/graph.py) — the
    cluster-then-curate step between pairwise near-dup and corpus-level
    caps. Deterministic by construction (majority label, smallest-label
    ties), so the unrolled SQL oracle matches hash-for-hash."""
    from frappe_data_pipelines_spark.operators.graph import label_propagation

    return label_propagation(_knn_edges(spark, sf_dir, k=5), iters=3)


# ---------------------------------------------------------------------------
# Token-budget selection: fill a fixed training budget from the top of the
# quality ranking. The operator avoids the global sort (score-bucket
# aggregation + boundary-bucket window); the oracle states the textbook
# global-window form — both must pick the identical document set.
# ---------------------------------------------------------------------------

_BUDGET_SQL = """
    WITH scored AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens,
             round(len(list_filter(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''),
                                   t -> list_contains(['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'], t)))
                   / CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS DOUBLE), 4) AS score
      FROM documents
      WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) > 0
    ), ranked AS (
      SELECT *, sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                                    ROWS UNBOUNDED PRECEDING) AS cum
      FROM scored
    )
    SELECT doc_id, n_tokens, score FROM ranked WHERE cum <= 15000
"""


@register("token_budget_select", oracle=_BUDGET_SQL, tags=("quality", "selection", "extension"))
def token_budget_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the best-scoring documents that fit a 15k-token budget
    (operators/selection.py:token_budget_select) — exact, but with no
    global sort: one bounded bucket table on the driver, broadcast
    threshold filter, boundary-bucket-only window."""
    from frappe_data_pipelines_spark.operators.selection import token_budget_select

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_select(docs, budget_tokens=15_000)


# ---------------------------------------------------------------------------
# Corpus diversity: distinct-n per source (Li et al. 2016's distinct-1/2/3,
# the standard text-diversity measure — low values flag template/boilerplate
# sources worth capping before training).
# ---------------------------------------------------------------------------

_DISTINCT_N_SQL = """
    WITH toks AS (
      SELECT source, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT source, n, unnest(CASE WHEN len(t) >= n
               THEN list_transform(range(0, len(t) - n + 1),
                                   i -> array_to_string(t[i + 1 : i + n], ' '))
               ELSE [] END) AS g
      FROM toks, (VALUES (1), (2), (3)) AS ns(n)
    )
    SELECT source, n,
           CAST(count(*) AS BIGINT) AS total_ngrams,
           CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
           round(count(DISTINCT g) / CAST(count(*) AS DOUBLE), 6) AS distinct_ratio
    FROM grams GROUP BY source, n
"""


@register("corpus_distinct_ngrams", oracle=_DISTINCT_N_SQL, tags=("quality", "diversity", "extension"))
def corpus_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct-1/2/3 per source: unique-ngram ratio over total ngrams —
    one explode + one two-level aggregate (partial distinct on (source, n,
    gram), then the count rollup); shuffles key on the gram space, which is
    uniform, so the plan is skew-safe at corpus scale."""
    from frappe_data_pipelines_spark.functions.text import tokens_expr
    from frappe_data_pipelines_spark.operators.quality import _grams_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    per_n = [
        docs.select(
            "source",
            F.lit(n).alias("n"),
            F.explode(_grams_expr(toks, n)).alias("g"),
        )
        for n in (1, 2, 3)
    ]
    grams = per_n[0].unionByName(per_n[1]).unionByName(per_n[2])
    return grams.groupBy("source", "n").agg(
        F.count("*").cast("long").alias("total_ngrams"),
        F.countDistinct("g").cast("long").alias("distinct_ngrams"),
        F.round(F.countDistinct("g") / F.count("*"), 6).alias("distinct_ratio"),
    )


# ---------------------------------------------------------------------------
# Soft deduplication: reweight common docs instead of removing them
# (SoftDedup, He et al. 2024 — operators/dedup.py:soft_dedup_weights)
# ---------------------------------------------------------------------------

_SOFT_DEDUP_SQL = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 2),
               i -> array_to_string(t[i:i+2], ' ')))) AS gram
      FROM toks WHERE len(t) >= 3
    ), dfc AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS df FROM grams GROUP BY gram
    ), per_doc AS (
      SELECT g.doc_id,
             CAST(count(*) AS BIGINT) AS n_ngrams,
             SUM(CAST(round(ln(CAST(d.df AS DOUBLE)), 6) AS DECIMAL(28,6)))
               AS sum_lndf
      FROM grams g JOIN dfc d USING (gram)
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_ngrams,
           round(CAST(sum_lndf AS DOUBLE) / n_ngrams, 6) AS commonness,
           round(1.0 / (1.0 + CAST(sum_lndf AS DOUBLE) / n_ngrams), 6) AS weight
    FROM per_doc
"""


@register(
    "soft_dedup_weights",
    oracle=_SOFT_DEDUP_SQL,
    tags=("dedup", "quality", "extension", "training"),
)
def soft_dedup_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup (SoftDedup, He et al. 2024): per-document training
    weight from n-gram commonness — keep everything, down-weight
    duplicated content, the reweight-don't-remove alternative to
    ``dedup_canonical_corpus``. Two bounded shuffles (gram df, doc mean),
    DECIMAL-accumulated mean so the score is summation-order exact."""
    from frappe_data_pipelines_spark.operators.dedup import soft_dedup_weights

    docs = load_table(spark, sf_dir, "documents")
    return soft_dedup_weights(docs, n=3)


# ---------------------------------------------------------------------------
# Span-level benchmark decontamination (operators/dedup.py:
# benchmark_span_decontaminate) — cut the leaked chars, not the whole doc
# ---------------------------------------------------------------------------

_SPAN_DECON_SQL = """
    WITH ev AS (
      SELECT DISTINCT substr(text, p.p, 40) AS s
      FROM documents,
           LATERAL (SELECT unnest(generate_series(1, len(text) - 39)) AS p) p
      WHERE source IN ('src0', 'src1') AND len(text) >= 40
    ), tw AS (
      SELECT doc_id, p.p AS pos, substr(text, p.p, 40) AS s
      FROM documents,
           LATERAL (SELECT unnest(generate_series(1, len(text) - 39)) AS p) p
      WHERE source NOT IN ('src0', 'src1') AND len(text) >= 40
    ), d AS (
      SELECT tw.doc_id, tw.pos FROM tw JOIN ev USING (s)
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + 40) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_isl
      FROM d
    ), isl2 AS (
      SELECT doc_id, pos,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 40 AS BIGINT) AS span_end,
           CAST(max(pos) + 40 - min(pos) AS BIGINT) AS span_len
    FROM isl2
    GROUP BY doc_id, island
    """


@register(
    "benchmark_span_decontaminate",
    oracle=_SPAN_DECON_SQL,
    tags=("dedup", "decontamination", "extension", "training"),
)
def benchmark_span_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level eval-set decontamination (GPT-3 appendix C / Lee et al.
    2021): the exact char ranges of training documents that verbatim-leak
    a 40-char window of the benchmark slice (sources src0/src1 stand in
    for the eval set) — what a surgical decontamination pass removes,
    where ``dedup_benchmark_contamination`` only flags whole documents.
    The eval window set broadcasts (benchmarks are tiny next to a corpus);
    one semi-join + the shared per-doc island merge, no corpus-wide
    inverted index needed."""
    from frappe_data_pipelines_spark.operators.dedup import (
        benchmark_span_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    return benchmark_span_decontaminate(
        docs, eval_sources=["src0", "src1"], min_len=40
    ).select(
        "doc_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("span_len").cast("bigint").alias("span_len"),
    )


# ---------------------------------------------------------------------------
# Corpus-normalized quality-signal fusion (operators/quality.py:
# quality_signal_fusion) — heuristic + repetition + commonness ensemble
# ---------------------------------------------------------------------------

from frappe_data_pipelines_spark.functions.text import STOPWORDS as _SW

_FUSION_SW = "['" + "', '".join(_SW) + "']"

_FUSION_SQL = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents
    ), gbase AS (
      SELECT doc_id, t,
             CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) AS total_chars,
             list_transform(generate_series(1, greatest(len(t) - 4, 0)), i -> array_to_string(t[i:i+4], ' ')) AS g5
      FROM toks
    ), c5 AS (
      SELECT doc_id, sum(cnt * chars) AS dup_chars FROM (
        SELECT doc_id, g, count(*) AS cnt, len(g) - 4 AS chars
        FROM (SELECT doc_id, unnest(g5) AS g FROM gbase) GROUP BY doc_id, g
      ) WHERE cnt > 1 GROUP BY doc_id
    ), rep AS (
      SELECT b.doc_id,
             round(coalesce(c5.dup_chars / nullif(b.total_chars, 0), 0), 6) AS rep_frac
      FROM gbase b LEFT JOIN c5 ON b.doc_id = c5.doc_id
    ), qual AS (
      SELECT doc_id,
             floor((least(CAST(length(text) AS DOUBLE) / 1000.0, 1.0)
                    + (1.0 - least(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) * 5.0, 1.0))
                    + least(CAST(len(list_filter(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), t -> list_contains({_FUSION_SW}, t))) AS DOUBLE)
                            / len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) * 5.0, 1.0)) / 3.0 * 1000000) / 1000000 AS quality
      FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 2),
               i -> array_to_string(t[i:i+2], ' ')))) AS gram
      FROM toks WHERE len(t) >= 3
    ), dfc AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS df FROM grams GROUP BY gram
    ), comm AS (
      SELECT g.doc_id,
             round(CAST(SUM(CAST(round(ln(CAST(d.df AS DOUBLE)), 6) AS DECIMAL(28,6))) AS DOUBLE)
                   / count(*), 6) AS commonness
      FROM grams g JOIN dfc d USING (gram)
      GROUP BY g.doc_id
    ), joined AS (
      SELECT q.doc_id, q.quality, r.rep_frac,
             coalesce(c.commonness, 0.0) AS commonness
      FROM qual q JOIN rep r USING (doc_id) LEFT JOIN comm c USING (doc_id)
    ), stats AS (
      SELECT min(quality) AS q0, max(quality) AS q1,
             min(rep_frac) AS r0, max(rep_frac) AS r1,
             min(commonness) AS c0, max(commonness) AS c1
      FROM joined
    )
    SELECT doc_id, quality, rep_frac, commonness,
           floor(((coalesce((quality - q0) / nullif(q1 - q0, 0), 0.5)
                 + (1.0 - coalesce((rep_frac - r0) / nullif(r1 - r0, 0), 0.5))
                 + (1.0 - coalesce((commonness - c0) / nullif(c1 - c0, 0), 0.5)))
                 / 3.0) * 1000000) / 1000000 AS fused
    FROM joined, stats
"""


@register(
    "quality_signal_fusion",
    oracle=_FUSION_SQL,
    tags=("quality", "extension", "training"),
)
def quality_signal_fusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble quality selection (the FineWeb move — no single filter is
    trusted alone): prose-likeness heuristic + Gopher dup-5gram repetition
    (inverted) + SoftDedup n-gram commonness (inverted), each min-max
    normalized over the whole corpus, fused by mean. Normalization uses
    one 6-value aggregate broadcast — never a corpus-wide rank sort."""
    from frappe_data_pipelines_spark.operators.quality import quality_signal_fusion

    docs = load_table(spark, sf_dir, "documents")
    return quality_signal_fusion(docs)


# ---------------------------------------------------------------------------
# Quality-aware canonical selection: collapse each near-dup cluster to its
# BEST member, not its min-id member
# ---------------------------------------------------------------------------

_QUALITY_CANONICAL_SQL = """
    WITH RECURSIVE toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 4, 0)),
               i -> array_to_string(t[i:i+4], ' ')))) AS shingle
      FROM toks WHERE len(t) >= 5
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(c / (sa.n_sh + sb.n_sh - c), 6) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ), clusters AS (
      SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    ), qual AS (
      SELECT doc_id,
             floor((least(CAST(length(text) AS DOUBLE) / 1000.0, 1.0)
                    + (1.0 - least(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) * 5.0, 1.0))
                    + least(CAST(len(list_filter(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), t -> list_contains({SW}, t))) AS DOUBLE)
                            / len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) * 5.0, 1.0)) / 3.0 * 1000000) / 1000000 AS quality
      FROM documents
    ), members AS (
      SELECT c.cluster_id, c.doc_id, q.quality,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
      FROM clusters c JOIN qual q USING (doc_id)
    )
    SELECT cluster_id, doc_id AS kept_doc_id, quality AS kept_quality,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM members WHERE rn = 1
""".replace("{SW}", "__SW__")


@register(
    "dedup_quality_canonical",
    oracle=_QUALITY_CANONICAL_SQL.replace("__SW__", _FUSION_SW),
    tags=("dedup", "quality", "extension", "training"),
)
def dedup_quality_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: near-dup clusters (n-gram
    Jaccard pairs → star-contraction components) each collapse to their
    HIGHEST-quality member (prose-likeness heuristic; ties broken by min
    doc_id) — the production dedup move ``dedup_canonical_corpus``'s
    min-id policy approximates: when a crawl holds five copies of an
    article, keep the cleanest one, not the one with the smallest id.
    One row per duplicate cluster: (cluster_id, kept_doc_id,
    kept_quality, cluster_size). The per-cluster argmax is a window over
    the cluster relation (bounded: one row per DUPLICATE doc, a tiny
    fraction of any corpus), never a corpus-wide sort."""
    from pyspark.sql.window import Window

    from frappe_data_pipelines_spark.functions.text import quality_score_expr
    from frappe_data_pipelines_spark.operators.dedup import (
        connected_components_star,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=5, threshold=0.5)
    clusters = connected_components_star(pairs)
    qual = docs.select("doc_id", quality_score_expr(F.col("text")).alias("quality"))
    members = clusters.join(qual, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("cluster_id")
    return (
        members.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count("*").over(wc).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("quality").alias("kept_quality"),
            "cluster_size",
        )
    )

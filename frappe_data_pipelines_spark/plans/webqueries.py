"""Web-corpus queries: HTML boilerplate removal + link graph.

Beyond the reference (its dispatch stops at pdf/txt/docx/md/images —
``services/text_extraction.py:13-27``): a web-scale training pipeline opens
with main-content extraction over crawled HTML (C4 §2.1, CCNet, RefinedWeb).
``operators/htmlmini.py`` implements the extractor; ``operators/docgen.py``
wraps every document in realistic page chrome so the extractor gets a
corpus-scale workload whose correct output is a closed-form function of the
raw tables — hence fully DuckDB-oracled, like the PDF/DOCX round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.plans.catalog import register
from frappe_data_pipelines_spark.sources.tables import load_table

# Closed-form chrome accounting for docgen's synthetic page: h1 (13) + three
# nav links ("doc " + id) + aside (33) + footer ("© corpus " + id) = 67 fixed
# chars + the digit counts of the page id and its three outlink targets.
_MAIN_SQL = """
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT doc_id,
           text AS main_text,
           CAST(1 AS BIGINT) AS n_content_blocks,
           CAST(length(text) AS BIGINT) AS content_chars,
           CAST(67 + length(CAST(doc_id AS VARCHAR))
                  + length(CAST((doc_id + 1 * (1 + n_chars % 7)) % n_docs AS VARCHAR))
                  + length(CAST((doc_id + 2 * (1 + n_chars % 7)) % n_docs AS VARCHAR))
                  + length(CAST((doc_id + 3 * (1 + n_chars % 7)) % n_docs AS VARCHAR))
                AS BIGINT) AS boiler_chars
    FROM documents, n
"""


@register("html_extract_main", oracle=_MAIN_SQL, tags=("web", "extraction", "bench"))
def html_extract_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal at corpus scale: every document wrapped as a web
    page (head/script/style + header/nav/aside/footer chrome), then the
    block classifier must return exactly the original text and account for
    every removed chrome character. One Arrow pass, no shuffle — the plan
    is scan → mapInPandas → mapInPandas, embarrassingly parallel."""
    from frappe_data_pipelines_spark.operators.docgen import documents_as_html
    from frappe_data_pipelines_spark.operators.htmlmini import html_extract

    docs = load_table(spark, sf_dir, "documents")
    return html_extract(documents_as_html(docs), html_col="html").select(
        "doc_id", "main_text", "n_content_blocks", "content_chars", "boiler_chars"
    )


_LINK_SQL = """
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    e AS (
      SELECT (doc_id + k * (1 + n_chars % 7)) % n_docs AS dst
      FROM documents, n, (VALUES (1), (2), (3)) AS ks(k)
    )
    SELECT dst AS doc_id, CAST(count(*) AS BIGINT) AS in_degree
    FROM e GROUP BY dst
"""


@register("html_link_graph", oracle=_LINK_SQL, tags=("web", "graph"))
def html_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-graph construction from extracted <a href>: parse pages, pull
    internal links, aggregate in-degree per target page. The only shuffle is
    the final groupBy on the link target — uniform by construction of the
    synthetic graph; at 100 TB the same plan holds because href extraction
    is map-side and in-degree is a partial-aggregated count."""
    from frappe_data_pipelines_spark.operators.docgen import documents_as_html
    from frappe_data_pipelines_spark.operators.htmlmini import html_extract

    docs = load_table(spark, sf_dir, "documents")
    pages = html_extract(documents_as_html(docs), html_col="html")
    edges = (
        pages.select(F.explode("links").alias("href"))
        .filter(F.col("href").rlike(r"^/doc_\d+\.html$"))
        .select(F.regexp_extract("href", r"/doc_(\d+)\.html", 1).cast("long").alias("doc_id"))
    )
    return edges.groupBy("doc_id").agg(F.count("*").cast("long").alias("in_degree"))


# ---------------------------------------------------------------------------
# Hand-written messy fixtures: no <article>/<main> — the length and
# link-density rules do all the work (golden main text pinned in the oracle).
# ---------------------------------------------------------------------------

FIXTURE_PAGES = {
    "blog": (
        '<html><body>\n'
        '<div id="top"><a href="/">Home</a> | <a href="/about">About</a> | '
        '<a href="/contact">Contact</a></div>\n'
        '<div class="post">\n'
        "<h2>Performance notes for the quarterly report</h2>\n"
        "<div>Partition pruning cuts the scan cost before execution begins, "
        "and broadcast joins avoid the shuffle entirely.</div>\n"
        "<div>Skewed keys need salting before the aggregation or one task "
        "drags the whole stage.</div>\n"
        '</div>\n'
        '<div class="share">Share: <a href="#">tw</a> <a href="#">fb</a></div>\n'
        '<div class="foot">Copyright 2026 Example</div>\n'
        "</body></html>"
    ),
    "portal": (
        "<html><body>\n<ul>\n"
        '<li><a href="/a.html">alpha section of the portal</a></li>\n'
        '<li><a href="/b.html">bravo section of the portal</a></li>\n'
        "</ul>\n"
        "<div>The portal also hosts a long-form engineering digest, and the "
        '<a href="/d.html">digest</a> index is refreshed weekly.</div>\n'
        "</body></html>"
    ),
    "broken": (
        "<div>Broken &amp; unclosed <b>markup still parses into a readable "
        "block<br>with a second line after the break\n"
        '<div class="menu"><a href="/x">x</a><a href="/y">y</a></div>'
    ),
}

_FIXTURE_SQL = """
    SELECT * FROM (VALUES
      ('blog',
       'Performance notes for the quarterly report' || chr(10) ||
       'Partition pruning cuts the scan cost before execution begins, and broadcast joins avoid the shuffle entirely.' || chr(10) ||
       'Skewed keys need salting before the aggregation or one task drags the whole stage.',
       CAST(3 AS BIGINT)),
      ('portal',
       'The portal also hosts a long-form engineering digest, and the digest index is refreshed weekly.',
       CAST(1 AS BIGINT)),
      ('broken',
       'Broken & unclosed markup still parses into a readable block' || chr(10) ||
       'with a second line after the break',
       CAST(1 AS BIGINT))
    ) AS t(page, main_text, n_content_blocks)
"""


@register("html_fixture_boilerplate", oracle=_FIXTURE_SQL, tags=("web", "extraction"))
def html_fixture_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extractor against adversarial hand-written pages — nav/share/
    footer chrome as plain <div>s, a link farm whose items clear the length
    bar but fail link density, malformed unclosed markup with entities and
    <br>. Golden main text pinned as a VALUES oracle (the same move as
    a3_a5_real_kernel_decode)."""
    from frappe_data_pipelines_spark.operators.htmlmini import html_extract

    pages = spark.createDataFrame(
        [(k, v) for k, v in sorted(FIXTURE_PAGES.items())], "page string, html string"
    )
    return html_extract(pages, html_col="html", id_col="page").select(
        "page", "main_text", "n_content_blocks"
    )


# ---------------------------------------------------------------------------
# URL canonicalization (functions/urls.py) — crawl-dedup's first step.
# Messy URLs are synthesized deterministically from the documents table;
# the oracle states the expected canonical form in closed form per case,
# so it verifies the normalizer's OUTPUT without re-implementing it.
# ---------------------------------------------------------------------------

_URL_SQL = """
    SELECT doc_id,
           CASE doc_id % 3
             WHEN 0 THEN 'https://' || lower(source) || '.example.com/Docs/'
                         || doc_id || '?a=1&b=2'
             WHEN 1 THEN 'http://' || lower(source) || '.example.com/?a=1&z=9'
             ELSE 'https://' || lower(source) || '.example.com/'
           END AS url_norm,
           lower(source) || '.example.com' AS host
    FROM documents
"""


@register("url_normalize_canonical", oracle=_URL_SQL, tags=("web", "dedup", "extension"))
def url_normalize_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize deliberately messy URLs (uppercase scheme/host, www
    prefix, default ports, tracking params, unsorted query, fragments,
    trailing slashes). Pure Column expressions — whole-stage codegen, no
    UDF, no shuffle; at 100 TB this is a free map over the scan."""
    from frappe_data_pipelines_spark.functions.urls import (
        url_host_expr,
        url_normalize_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("HTTPS://WWW.")).otherwise(
                F.when(F.col("doc_id") % 3 == 1, F.lit("HTTP://www.")).otherwise(
                    F.lit("https://")
                )
            ),
            F.upper(F.col("source")),
            F.lit(".Example.COM"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(":443/Docs/"), F.col("doc_id").cast("string"),
                            F.lit("/?utm_source=x&b=2&a=1#frag")))
             .when(F.col("doc_id") % 3 == 1, F.lit(":80?z=9&utm_campaign=c&a=1"))
             # fragment containing '?': ADVICE r5 — the query must anchor
             # before '#' or '?sec=2' leaks into the canonical form
             .otherwise(F.lit("/#top?sec=2")),
        ).alias("url"),
    )
    return messy.select(
        "doc_id",
        url_normalize_expr(F.col("url")).alias("url_norm"),
        url_host_expr(F.col("url")).alias("host"),
    )


# ---------------------------------------------------------------------------
# robots.txt politeness filter (operators/robots.py). Hosts get a real
# robots body (archiver fully blocked; '*' blocks /private/, odd-length
# hosts also block /Docs/ except /Docs/pub/); the oracle states the
# resulting per-URL verdicts in closed form.
# ---------------------------------------------------------------------------

_ROBOTS_SQL = """
    WITH urls AS (
      SELECT doc_id, lower(source) || '.example.com' AS host, source,
             CASE doc_id % 4
               WHEN 0 THEN '/Docs/' || doc_id
               WHEN 1 THEN '/Docs/pub/' || doc_id
               WHEN 2 THEN '/private/profile'
               ELSE '/blog/' || doc_id
             END AS path
      FROM documents
    )
    SELECT doc_id, host, path,
           CASE WHEN path LIKE '/private/%' THEN false
                WHEN length(source) % 2 = 1 AND path LIKE '/Docs/%'
                     AND path NOT LIKE '/Docs/pub/%' THEN false
                ELSE true END AS allowed
    FROM urls
"""


@register("robots_politeness_filter", oracle=_ROBOTS_SQL, tags=("web", "extension"))
def robots_politeness_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-politeness filtering end to end: per-host robots.txt BODIES are
    synthesized, parsed by the real RFC 9309 group parser (agent-group
    selection, longest prefix match, Allow tie-wins, default allow), and
    applied to the URL fact side via a broadcast host→rules join — the
    oracle pins every verdict, including the /Docs/pub/ override where a
    longer Allow beats a shorter Disallow."""
    from frappe_data_pipelines_spark.operators.robots import (
        robots_filter,
        robots_rules,
    )

    docs = load_table(spark, sf_dir, "documents")
    hosts = docs.select("source").distinct().select(
        F.concat(F.lower("source"), F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit(
                "# synthetic corpus robots\n"
                "User-agent: archiver\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /private/\n"
            ),
            F.when(
                F.length("source") % 2 == 1,
                F.lit("Disallow: /Docs/\nAllow: /Docs/pub/\n"),
            ).otherwise(F.lit("")),
        ).alias("robots_txt"),
    )
    rules = robots_rules(hosts)
    urls = docs.select(
        "doc_id",
        F.concat(F.lower("source"), F.lit(".example.com")).alias("host"),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("/Docs/"), F.col("doc_id").cast("string")))
         .when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit("/Docs/pub/"), F.col("doc_id").cast("string")))
         .when(F.col("doc_id") % 4 == 2, F.lit("/private/profile"))
         .otherwise(F.concat(F.lit("/blog/"), F.col("doc_id").cast("string")))
         .alias("path"),
    )
    return robots_filter(urls, rules).select("doc_id", "host", "path", "allowed")


# ---------------------------------------------------------------------------
# WARC ingestion (sources/warc.py): the container web corpora arrive in.
# ---------------------------------------------------------------------------

_WARC_SQL = """
    SELECT doc_id,
           'https://corpus.example.com/doc_' || doc_id || '.html' AS uri,
           text AS main_text
    FROM documents
"""


@register("warc_roundtrip_extract", oracle=_WARC_SQL, tags=("web", "source", "extension"))
def warc_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl ingest chain: documents packaged as member-gzipped
    WARC archives (warcinfo + HTTP response records) → WARC record parse
    (gzip members, Content-Length framing, HTTP envelope strip, charset) →
    HTML boilerplate removal → original text, exactly. WARC files parse
    independently (no shuffle); the oracle pins uri and recovered text
    per document."""
    from frappe_data_pipelines_spark.operators.docgen import documents_as_warc
    from frappe_data_pipelines_spark.operators.htmlmini import html_extract
    from frappe_data_pipelines_spark.sources.warc import read_warc

    docs = load_table(spark, sf_dir, "documents")
    # the archive frame is tiny in ROWS (one per file) but heavy in BYTES;
    # AQE would coalesce it to one task — pin one parse task per archive
    par = spark.sparkContext.defaultParallelism
    recs = read_warc(documents_as_warc(docs, n_files=par).repartition(par))
    pages = recs.select(F.col("uri"), F.col("text").alias("html"))
    out = html_extract(pages, html_col="html", id_col="uri")
    return out.select(
        F.regexp_extract("uri", r"doc_(\d+)\.html", 1).cast("long").alias("doc_id"),
        "uri",
        "main_text",
    )


# ---------------------------------------------------------------------------
# End-to-end web pipeline: WARC → extract → quality-filter → exact-dedup.
# Each stage is individually oracled above / in textqueries; this composes
# them the way a crawl-to-corpus job actually runs and oracles the
# funnel accounting in one row.
# ---------------------------------------------------------------------------

_PIPELINE_SQL = """
    WITH q AS (
      SELECT text FROM documents
      WHERE regexp_matches(text, '[a-zA-Z]')
        AND NOT regexp_matches(text, '[؀-ۿ一-鿿]')
        AND length(text) BETWEEN 100 AND 100000
        AND length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
              <= length(text) * 0.2
        AND len(list_filter(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''),
                            t -> list_contains(['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'], t)))
              * 10 >= len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_fetched,
           CAST(count(*) AS BIGINT) AS n_quality,
           CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
           CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS quality_chars
    FROM q
"""


@register("web_corpus_pipeline", oracle=_PIPELINE_SQL, tags=("web", "pipeline", "extension"))
def web_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-to-corpus funnel in one job: package documents as WARC
    archives, parse the records, strip page boilerplate, apply the
    C4/Gopher-style quality conjunction to the EXTRACTED text, and count
    exact-unique survivors — the accounting row (fetched → quality →
    unique) every corpus build publishes. Plan shape: Arrow synth/parse
    chain (round-robin spread) → codegen'd filter → one partial-agged
    global aggregate; the only keyed shuffle is count(DISTINCT text)."""
    from frappe_data_pipelines_spark.functions.text import STOPWORDS, tokens_expr
    from frappe_data_pipelines_spark.operators.docgen import documents_as_warc
    from frappe_data_pipelines_spark.operators.htmlmini import html_extract
    from frappe_data_pipelines_spark.sources.warc import read_warc

    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    recs = read_warc(documents_as_warc(docs, n_files=par).repartition(par))
    pages = html_extract(
        recs.select("uri", F.col("text").alias("html")), html_col="html", id_col="uri"
    ).select(F.col("main_text").alias("text"))
    toks = tokens_expr(F.col("text"))
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(F.lit(STOPWORDS).cast("array<string>"), t))
    )
    punct_len = F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9\\s]", ""))
    quality = pages.filter(
        F.col("text").rlike("[a-zA-Z]")
        & ~F.col("text").rlike("[؀-ۿ一-鿿]")
        & F.length("text").between(100, 100000)
        & (punct_len <= F.length("text") * 0.2)
        & (n_stop * 10 >= F.size(toks))
    )
    fetched = docs.agg(F.count("*").cast("long").alias("n_fetched"))
    return (
        quality.agg(
            F.count("*").cast("long").alias("n_quality"),
            F.countDistinct("text").cast("long").alias("n_unique"),
            F.coalesce(F.sum(F.length("text")), F.lit(0)).cast("long").alias("quality_chars"),
        )
        .crossJoin(F.broadcast(fetched))
        .select("n_fetched", "n_quality", "n_unique", "quality_chars")
    )


# Blocklist terms are query parameters, identical on both sides: corpus-vocab
# words that DO occur, a multi-word phrase, and a guaranteed miss, so the
# zero/null path is value-checked too.
_BLOCK_TERMS = [
    (1, "slow"),
    (2, "hash value"),
    (3, "Customer"),  # case-insensitive: matches lowercase corpus text
    (4, "zz-banned-term"),
]

_BLOCKLIST_SQL = """
    WITH terms(term_id, term) AS (VALUES {vals}),
    occ AS (
      SELECT d.doc_id, t.term_id, i.i AS pos
      FROM documents d CROSS JOIN terms t,
           LATERAL (SELECT unnest(generate_series(
                      1, len(d.text) - len(t.term) + 1)) AS i) i
      WHERE substr(lower(d.text), CAST(i.i AS INT), CAST(len(t.term) AS INT))
              = lower(t.term)
    )
    SELECT d.doc_id,
           CAST(count(o.term_id) AS BIGINT) AS n_hits,
           CAST(count(DISTINCT o.term_id) AS BIGINT) AS n_terms,
           CAST(min(o.pos) AS BIGINT) AS first_pos
    FROM documents d LEFT JOIN occ o USING (doc_id)
    GROUP BY d.doc_id
    """.format(vals=", ".join(f"({i}, '{t}')" for i, t in _BLOCK_TERMS))


@register("blocklist_term_audit", oracle=_BLOCKLIST_SQL,
          tags=("text-analysis", "web", "extension", "scale-path"))
def blocklist_term_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 §2.2 banned-words rule as per-document accounting
    (operators/blocklist.py): ONE Aho-Corasick automaton pass per doc
    finds every overlapping occurrence of every blocklist term —
    O(text + matches) however long the list, vs per-term regex's
    O(terms x text). Emits (doc_id, n_hits, n_terms, first_pos) for
    EVERY doc, null first_pos when clean; the oracle recounts by direct
    substring comparison at each position, so hit totals, distinct-term
    counts, and the clean rows are all value-checked. The drop rule
    itself (``blocklist_filter``) and the word-boundary variant are
    differentially tested in tests/test_blocklist.py."""
    from frappe_data_pipelines_spark.operators.blocklist import blocklist_hits

    docs = load_table(spark, sf_dir, "documents")
    terms = spark.createDataFrame(_BLOCK_TERMS, "term_id long, term string")
    return blocklist_hits(docs, terms)

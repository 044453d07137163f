"""HTML block segmentation + boilerplate classifier (operators/htmlmini.py).

Covers the parser's tolerance contract (malformed markup, entities, <br>,
stray close tags), each classifier rule at its boundary, link extraction,
and the synthetic-page round trip the html_extract_main oracle relies on.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from frappe_data_pipelines_spark.operators.docgen import (
    link_targets,
    synth_html,
)
from frappe_data_pipelines_spark.operators.htmlmini import (
    MIN_CONTENT_CHARS,
    extract_links,
    extract_main,
    html_extract,
    is_content_block,
    parse_blocks,
)

LONG = "a sufficiently long sentence that clears the content length bar"


def blocks_text(html):
    return [b["text"] for b in parse_blocks(html)]


class TestParser:
    def test_script_style_head_dropped(self):
        html = (
            "<head><title>t</title></head><style>p{}</style>"
            "<script>if (1 < 2) {}</script><p>kept body text</p>"
        )
        assert blocks_text(html) == ["kept body text"]

    def test_entities_resolved(self):
        assert blocks_text("<p>a &amp; b &lt;c&gt; &#169;</p>") == ["a & b <c> ©"]

    def test_br_becomes_newline_and_whitespace_collapses(self):
        html = "<p>first   line<br>second\t line</p>"
        assert blocks_text(html) == ["first line\nsecond line"]

    def test_nested_blocks_split(self):
        html = "<div>outer start<p>inner</p></div>"
        assert blocks_text(html) == ["outer start", "inner"]

    def test_unclosed_and_stray_tags_do_not_raise(self):
        html = "</div></article><div>text<b>bold"
        assert blocks_text(html) == ["textbold"]

    def test_link_chars_counted(self):
        (b,) = parse_blocks('<p>pre <a href="/x">link text</a> post</p>')
        assert b["chars"] == len("pre link text post")
        assert b["link_chars"] == len("link text")

    def test_whitespace_only_blocks_skipped(self):
        assert parse_blocks("<div>\n   \n</div><p>x y</p>") == [
            {
                "tag": "p", "text": "x y", "chars": 3, "link_chars": 0,
                "boiler": False, "content": False,
            }
        ]


class TestClassifier:
    def test_boiler_container_dropped_even_if_long(self):
        (b,) = parse_blocks(f"<nav><p>{LONG}</p></nav>")
        assert b["boiler"] and not is_content_block(b)

    def test_content_container_kept_even_if_short(self):
        (b,) = parse_blocks("<article><p>hi</p></article>")
        assert b["content"] and is_content_block(b)

    def test_length_boundary(self):
        short = "x" * (MIN_CONTENT_CHARS - 1)
        exact = "x" * MIN_CONTENT_CHARS
        (b1,) = parse_blocks(f"<p>{short}</p>")
        (b2,) = parse_blocks(f"<p>{exact}</p>")
        assert not is_content_block(b1)
        assert is_content_block(b2)

    def test_link_density_boundary(self):
        # 60 chars total, 20 inside <a> → exactly 1/3: kept; 21 → dropped
        kept = f'<p>{"x" * 40}<a href="/">{"y" * 20}</a></p>'
        dropped = f'<p>{"x" * 39}<a href="/">{"y" * 21}</a></p>'
        assert is_content_block(parse_blocks(kept)[0])
        assert not is_content_block(parse_blocks(dropped)[0])

    def test_nav_flag_clears_after_close(self):
        blocks = parse_blocks(f"<nav><li>menu item</li></nav><p>{LONG}</p>")
        assert [b["boiler"] for b in blocks] == [True, False]


class TestLinks:
    def test_links_in_order_with_duplicates(self):
        html = '<a href="/a">1</a><a href="/b">2</a><a href="/a">3</a><a>no href</a>'
        assert extract_links(html) == ["/a", "/b", "/a"]


class TestSyntheticRoundTrip:
    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(0, 499),
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\r\x0b\x0c  \x85  "
            ),
            min_size=1,
            max_size=200,
        ),
    )
    def test_extract_main_round_trips_any_text(self, doc_id, text):
        # the page embeds escaped text; extraction must return it after
        # HTML whitespace collapse (the oracle corpus is pre-collapsed, so
        # there it is the identity)
        collapsed = "\n".join(
            " ".join(line.split()) for line in text.split("\n")
        ).strip("\n")
        html = synth_html(doc_id, text, len(text), 500)
        got = extract_main(html)["main_text"]
        assert got == collapsed

    def test_chrome_accounting_closed_form(self):
        doc_id, text, n = 123, "some body words here now ok", 500
        t1, t2, t3 = link_targets(doc_id, len(text), n)
        res = extract_main(synth_html(doc_id, text, len(text), n))
        expect = 67 + sum(len(str(x)) for x in (doc_id, t1, t2, t3))
        assert res["boiler_chars"] == expect
        assert res["content_chars"] == len(text)
        assert res["n_content_blocks"] == 1


def test_html_extract_string_keys(spark):
    df = spark.createDataFrame(
        [("p1", f"<p>{LONG}</p>"), ("p2", "<nav><li>menu</li></nav>")],
        "page string, html string",
    )
    rows = {r["page"]: r for r in html_extract(df, id_col="page").collect()}
    assert rows["p1"]["main_text"] == LONG
    assert rows["p2"]["main_text"] == ""
    assert rows["p2"]["boiler_chars"] == len("menu")


class TestUrlNormalize:
    CASES = [
        # (input, expected canonical)
        ("HTTPS://WWW.Ex.COM:443/Docs/9/?utm_source=x&b=2&a=1#f",
         "https://ex.com/Docs/9?a=1&b=2"),
        ("http://www.ex.com:80?z=9&utm_campaign=c&a=1", "http://ex.com/?a=1&z=9"),
        ("https://ex.com/#top", "https://ex.com/"),
        ("https://ex.com:8443/x/", "https://ex.com:8443/x"),  # non-default port kept
        ("http://EX.com/CaseSensitive/Path", "http://ex.com/CaseSensitive/Path"),
        ("https://ex.com/?utm_source=a&utm_medium=b", "https://ex.com/"),
        ("  https://ex.com/a  ", "https://ex.com/a"),  # trimmed
    ]

    def test_normalize_cases(self, spark):
        from pyspark.sql import functions as F

        from frappe_data_pipelines_spark.functions.urls import url_normalize_expr

        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "url string")
        got = [r["n"] for r in df.select(url_normalize_expr(F.col("url")).alias("n")).collect()]
        assert got == [e for _, e in self.CASES]

    def test_host_extraction(self, spark):
        from pyspark.sql import functions as F

        from frappe_data_pipelines_spark.functions.urls import url_host_expr

        df = spark.createDataFrame(
            [("HTTPS://WWW.Sub.Ex.COM:443/p",), ("http://ex.com:8080/q",)], "url string"
        )
        got = [r["h"] for r in df.select(url_host_expr(F.col("url")).alias("h")).collect()]
        assert got == ["sub.ex.com", "ex.com"]


class TestRobots:
    def test_group_selection_prefers_exact_agent(self):
        from frappe_data_pipelines_spark.operators.robots import parse_robots

        txt = (
            "User-agent: mybot\nDisallow: /only-mybot/\n\n"
            "User-agent: *\nDisallow: /everyone/\n"
        )
        assert parse_robots(txt, agent="MyBot") == [(False, "/only-mybot/")]
        assert parse_robots(txt) == [(False, "/everyone/")]

    def test_multi_agent_group_and_comments(self):
        from frappe_data_pipelines_spark.operators.robots import parse_robots

        txt = (
            "User-agent: a\nUser-agent: b  # both\nDisallow: /x/  # comment\n"
            "Allow: /x/pub/\n"
        )
        assert parse_robots(txt, agent="b") == [(False, "/x/"), (True, "/x/pub/")]

    def test_empty_disallow_and_wildcards_skipped(self):
        from frappe_data_pipelines_spark.operators.robots import parse_robots

        txt = "User-agent: *\nDisallow:\nDisallow: /a*/b\nAllow: /c$\nDisallow: /real/\n"
        assert parse_robots(txt) == [(False, "/real/")]

    def test_no_matching_group(self):
        from frappe_data_pipelines_spark.operators.robots import parse_robots

        assert parse_robots("User-agent: other\nDisallow: /\n") == []

    def test_repeated_star_groups_merge(self):
        from frappe_data_pipelines_spark.operators.robots import parse_robots

        txt = (
            "User-agent: *\nDisallow: /private/\n\n"
            "User-agent: googlebot\nDisallow: /nogoog/\n\n"
            "User-agent: *\nDisallow: /secret/\n"
        )
        assert parse_robots(txt) == [(False, "/private/"), (False, "/secret/")]

    def test_filter_longest_match_semantics(self, spark):
        from frappe_data_pipelines_spark.operators.robots import (
            robots_filter,
            robots_rules,
        )

        hosts = spark.createDataFrame(
            [("h1", "User-agent: *\nDisallow: /d/\nAllow: /d/pub/\n"),
             ("h2", "User-agent: *\nDisallow: /\n"),
             ("h3", "")],
            "host string, robots_txt string",
        )
        urls = spark.createDataFrame(
            [(1, "h1", "/d/secret"), (2, "h1", "/d/pub/x"), (3, "h1", "/open"),
             (4, "h2", "/anything"), (5, "h3", "/x")],
            "uid long, host string, path string",
        )
        got = {r["uid"]: r["allowed"]
               for r in robots_filter(urls, robots_rules(hosts)).collect()}
        assert got == {1: False, 2: True, 3: True, 4: False, 5: True}


class TestParserFuzz:
    def test_parse_blocks_total_on_arbitrary_text(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=80, deadline=None)
        @given(st.text(max_size=300))
        def run(s):
            blocks = parse_blocks(s)
            for b in blocks:
                assert b["chars"] == len(b["text"])
                assert 0 <= b["link_chars"] <= b["chars"]

        run()

    def test_parse_blocks_total_on_tag_soup(self):
        import random

        frags = ["<div>", "</div>", "<a href='/x'>", "</a>", "<br>", "<p", ">",
                 "text ", "&amp;", "&#x41;", "<script>", "</script>", "<!--", "-->",
                 "<nav>", "</nav>", "<article>", "</article>", "<![CDATA[", "]]>"]
        rng = random.Random(5)
        for _ in range(200):
            soup = "".join(rng.choice(frags) for _ in range(rng.randrange(1, 40)))
            parse_blocks(soup)  # must not raise


class TestMenuBoundary:
    def test_menu_flushes_surrounding_content(self):
        # <menu> must delimit blocks like every other boiler container:
        # content before it survives, menu items drop, tail text survives
        long_pre = "a real content sentence long enough to clear the bar"
        html = f"<p>{long_pre}<menu><li><a href='/x'>x</a></li></menu> and a trailing clause long enough to keep</p>"
        res = extract_main(html)
        assert long_pre in res["main_text"]
        assert "x" not in res["main_text"].replace("clause", "")

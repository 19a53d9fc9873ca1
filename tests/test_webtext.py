"""HTML extraction + line-level corrections (operators/webtext.py)."""

import pytest
from pyspark.sql import functions as F

from mofka_spark.operators import webtext


def _one(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return webtext.html_to_text(df).collect()[0]["text"]


def test_html_basic_extraction(spark):
    html = (
        "<html><head><title>My Page</title>"
        "<script type='text/javascript'>var x = 1 < 2;</script>"
        "<style>.a { color: red; }</style></head>"
        "<body><h1>Header</h1><p>First <b>paragraph</b>.</p>"
        "<!-- hidden --><p>Second &amp; last.</p></body></html>"
    )
    assert _one(spark, html) == "My Page\nHeader\nFirst paragraph.\nSecond & last."


def test_html_entities_and_whitespace(spark):
    html = "<p>a&lt;b &gt; c &quot;q&quot; &#39;s&#39;&nbsp;end</p>"
    assert _one(spark, html) == 'a<b > c "q" \'s\' end'
    # &amp;lt; decodes to the literal text &lt;, not <
    assert _one(spark, "<p>&amp;lt;</p>") == "&lt;"


def test_html_inline_tags_no_space(spark):
    assert _one(spark, "<p><em>word</em>s</p>") == "words"


def test_html_blank_line_collapse(spark):
    html = "<div>  </div><div>a</div><div></div><div>b</div>"
    assert _one(spark, html) == "a\nb"


def test_html_case_insensitive_and_multiline_script(spark):
    html = "<SCRIPT>\nif (a > b) { x(); }\n</SCRIPT ><P>kept</P>"
    assert _one(spark, html) == "kept"


def test_html_empty_and_tagless(spark):
    assert _one(spark, "") == ""
    assert _one(spark, "just plain text") == "just plain text"


def _lines_df(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_filter_lines_rules(spark):
    doc = "\n".join([
        "A normal sentence with words.",
        "",                            # empty -> dropped
        "3 / 12",                      # numeric counter -> dropped
        "SHOUTING HEADER LINE",        # caps -> dropped
        "All rights reserved.",        # boilerplate -> dropped
        "Another good line here",
    ])
    out = webtext.filter_lines(_lines_df(spark, [(1, doc)])).collect()[0]
    assert out["clean_text"] == (
        "A normal sentence with words.\nAnother good line here"
    )
    assert out["n_lines"] == 6 and out["n_kept"] == 2
    assert out["kept"] is False  # removed 4/6 > 0.5


def test_filter_lines_doc_kept_flag(spark):
    doc = "good line one\ngood line two\n"  # trailing empty line dropped
    out = webtext.filter_lines(_lines_df(spark, [(1, doc)])).collect()[0]
    assert out["n_kept"] == 2 and out["kept"] is True


def test_dedup_lines_within_doc(spark):
    doc = "menu\nbody text one\nmenu\nbody text two\nmenu"
    out = webtext.dedup_lines_within_doc(_lines_df(spark, [(1, doc)])).collect()[0]
    assert out["clean_text"] == "menu\nbody text one\nbody text two"
    assert (out["n_lines"], out["n_kept"]) == (5, 3)


def test_dedup_lines_across_docs(spark):
    shared = "Subscribe to the newsletter today"
    rows = [
        (1, f"{shared}\nunique one alpha"),
        (2, f"{shared}\nunique two beta"),
        (3, "only unique gamma"),
        (4, shared),  # every line shared -> empty doc survives with 0
    ]
    out = {
        r["id"]: r
        for r in webtext.dedup_lines_across_docs(
            _lines_df(spark, rows), min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "unique one alpha"
    assert out[2]["clean_text"] == "unique two beta"
    assert out[3]["clean_text"] == "only unique gamma"
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1


def test_dedup_across_docs_short_lines_exempt(spark):
    rows = [(1, "- item\nlong unique body line one"),
            (2, "- item\nlong unique body line two")]
    out = {
        r["id"]: r
        for r in webtext.dedup_lines_across_docs(
            _lines_df(spark, rows), min_docs=2, min_line_chars=10
        ).collect()
    }
    # "- item" repeats but is under min_line_chars -> kept
    assert out[1]["clean_text"].startswith("- item")


def test_split_lines_order(spark):
    got = webtext.split_lines(_lines_df(spark, [(7, "a\nb\nc")])).collect()
    assert [(r["line_no"], r["line"]) for r in got] == [
        (1, "a"), (2, "b"), (3, "c")
    ]


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(webtext.canonicalize_url(df["url"]).alias("c")).collect()[0]["c"]


def test_url_canonicalization(spark):
    assert _canon(spark, "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag") == \
        "http://example.com/a/b?a=1&b=2"
    assert _canon(spark, "https://Example.com:443/") == "https://example.com"
    # non-default port survives; path case survives
    assert _canon(spark, "http://example.com:8080/CaseSensitive") == \
        "http://example.com:8080/CaseSensitive"
    # all-tracking query vanishes entirely (no dangling '?')
    assert _canon(spark, "http://a.com/x?utm_medium=e&fbclid=1") == "http://a.com/x"
    # non-URL passes through trimmed
    assert _canon(spark, "  not a url  ") == "not a url"


def test_url_domains(spark):
    df = spark.createDataFrame(
        [("https://www.Blog.Example.CO.UK:443/p?q=1",),
         ("http://sub.site.org/x",)],
        "url string",
    )
    got = df.select(
        webtext.url_domain(df["url"]).alias("d"),
        webtext.url_base_domain(df["url"]).alias("b"),
    ).collect()
    assert (got[0]["d"], got[0]["b"]) == ("blog.example.co.uk", "example.co.uk")
    assert (got[1]["d"], got[1]["b"]) == ("sub.site.org", "site.org")


def test_dedup_urls(spark):
    df = spark.createDataFrame(
        [
            (1, "http://www.a.com/p/?b=2&a=1&utm_source=x"),
            (2, "HTTP://A.com:80/p?a=1&b=2"),
            (3, "http://a.com/other"),
        ],
        "id long, url string",
    )
    got = {r["id"]: r for r in webtext.dedup_urls(df).collect()}
    assert got[1]["is_dup"] is False and got[1]["keeper_id"] == 1
    assert got[2]["is_dup"] is True and got[2]["keeper_id"] == 1
    assert got[3]["is_dup"] is False
    assert got[1]["canon_url"] == got[2]["canon_url"] == "http://a.com/p?a=1&b=2"


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [(f"http://s{i % 2}.dom.com/p{i}",) for i in range(6)]
        + [("http://other.net/x",)],
        "url string",
    )
    got = {r["base_domain"]: r for r in webtext.domain_stats(df).collect()}
    assert got["dom.com"]["n_urls"] == 6
    assert got["dom.com"]["n_hosts"] == 2
    assert got["dom.com"]["n_unique_canon"] == 6
    assert got["other.net"]["n_urls"] == 1


def test_pipeline_composition(spark):
    """html_to_text -> filter_lines end to end."""
    html = (
        "<body><h1>Title Words Here</h1>"
        "<p>Real content sentence that stays.</p>"
        "<div>Cookie Policy</div>"
        "<footer>All rights reserved</footer></body>"
    )
    df = webtext.html_to_text(
        spark.createDataFrame([(1, html)], "id long, html string")
    )
    out = webtext.filter_lines(df).collect()[0]
    assert out["clean_text"] == (
        "Title Words Here\nReal content sentence that stays."
    )


class TestLinksAndBlocklist:
    def test_extract_links(self, spark):
        html = (
            '<body><a href="http://a.com/x">First <b>link</b></a>'
            "<a class='c' href='http://b.com/y'>second</a>"
            '<a href="/relative">rel</a><a>no href</a></body>'
        )
        df = spark.createDataFrame([(1, html)], "id long, html string")
        got = [
            (r["link_no"], r["href"], r["anchor"])
            for r in webtext.extract_links(df).orderBy("link_no").collect()
        ]
        assert got == [
            (0, "http://a.com/x", "First link"),
            (1, "/relative", "rel"),
            (2, "http://b.com/y", "second"),
        ]

    def test_web_graph_edges(self, spark):
        rows = [
            (1, "http://WWW.A.com:80/", '<a href="http://b.com/p/">b</a>'
                '<a href="http://a.com">self</a>'
                '<a href="/rel">rel dropped</a>'
                '<a href="HTTPS://c.com/q?utm_source=x">c</a>'),
            (2, "http://b.com/p", '<a href="http://a.com/">a</a>'
                '<a href="http://a.com/?utm_medium=m">a again</a>'),
        ]
        df = spark.createDataFrame(rows, "id long, url string, html string")
        edges = {(r["src"], r["dst"]) for r in webtext.web_graph(df).collect()}
        assert edges == {
            ("http://a.com", "http://b.com/p"),
            ("http://a.com", "https://c.com/q"),
            ("http://b.com/p", "http://a.com"),  # utm variant deduped
        }

    def test_domain_blocklist_suffix_match(self, spark):
        df = spark.createDataFrame(
            [(1, "http://www.Spam.Example.com/x"),
             (2, "http://notexample.com/y"),
             (3, "https://example.com/z"),
             (4, "http://fine.org/w")],
            "id long, url string",
        )
        got = {
            r["id"]: r["blocked"]
            for r in webtext.domain_blocklist_filter(
                df, ["example.com"]
            ).collect()
        }
        # subdomain blocked, exact blocked, substring NOT blocked
        assert got == {1: True, 2: False, 3: True, 4: False}

    def test_web_graph_feeds_pagerank(self, spark):
        from mofka_spark.operators.graph import pagerank

        rows = [
            (i, f"http://s{i}.ex.com/",
             f'<a href="http://s{(i + 1) % 4}.ex.com/">n</a>'
             '<a href="http://hub.ex.com/">hub</a>')
            for i in range(4)
        ]
        df = spark.createDataFrame(rows, "id long, url string, html string")
        edges = webtext.web_graph(df)
        nodes = edges.select(F.col("src").alias("id")).unionByName(
            edges.select(F.col("dst").alias("id"))
        ).distinct()
        pr = pagerank(nodes, edges, src_col="src", dst_col="dst", iters=3)
        got = {r["id"]: r["rank"] for r in pr.collect()}
        # the hub is linked by everyone -> highest rank
        assert max(got, key=got.get) == "http://hub.ex.com"


    def test_empty_blocklist_blocks_nothing(self, spark):
        df = spark.createDataFrame([(1, "http://a.com/x")], "id long, url string")
        got = webtext.domain_blocklist_filter(df, []).collect()[0]
        assert got["blocked"] is False and got["domain"] == "a.com"

    def test_www_prefixed_blocklist_entry_matches(self, spark):
        # url_domain strips a leading www. from hosts; entries get the
        # identical normalization, so 'www.example.com' must behave
        # exactly like 'example.com' (it used to silently match nothing)
        df = spark.createDataFrame(
            [(1, "http://www.example.com/x"),
             (2, "https://example.com/y"),
             (3, "http://sub.example.com/z"),
             (4, "http://wwwexample.com/w")],  # no dot: different host
            "id long, url string",
        )
        got = {
            r["id"]: r["blocked"]
            for r in webtext.domain_blocklist_filter(
                df, ["www.Example.com"]
            ).collect()
        }
        assert got == {1: True, 2: True, 3: True, 4: False}


class TestRobotsRules:
    def _run(self, spark, rules, urls):
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "id long, url string"
        )
        return {
            r["id"]: (r["rule_path"], r["allowed"])
            for r in webtext.robots_rules_filter(df, rules).collect()
        }

    def test_longest_match_wins(self, spark):
        rules = [
            ("ex.com", "/", False),
            ("ex.com", "/public", True),
            ("ex.com", "/public/tmp", False),
        ]
        got = self._run(spark, rules, [
            "http://ex.com/private/x",      # '/' disallow
            "http://ex.com/public/doc",     # '/public' allow
            "http://ex.com/public/tmp/y",   # '/public/tmp' disallow
            "http://other.org/anything",    # no rule -> allowed
        ])
        assert got == {
            0: ("/", False),
            1: ("/public", True),
            2: ("/public/tmp", False),
            3: (None, True),
        }

    def test_allow_beats_disallow_on_equal_length(self, spark):
        # same-length prefixes can only both match when identical —
        # provide identical prefixes with conflicting verdicts
        rules = [("ex.com", "/a", False), ("ex.com", "/a", True)]
        got = self._run(spark, rules, ["http://ex.com/a/x"])
        assert got == {0: ("/a", True)}

    def test_subdomain_and_www_normalization(self, spark):
        rules = [("www.Ex.com", "/", False)]
        got = self._run(spark, rules, [
            "http://ex.com/x",
            "http://www.ex.com/y",
            "http://sub.ex.com/z",
            "http://notex.com/w",
        ])
        assert got == {
            0: ("/", False), 1: ("/", False), 2: ("/", False),
            3: (None, True),
        }

    def test_empty_rules_and_empty_path(self, spark):
        got = self._run(spark, [], ["http://ex.com"])
        assert got == {0: (None, True)}
        got2 = self._run(spark, [("ex.com", "/", False)], ["http://ex.com"])
        assert got2 == {0: ("/", False)}  # bare host reads as path '/'

    def test_domain_specificity_beats_path_tie(self, spark):
        # a parent-domain ALLOW and a subdomain DISALLOW with the same
        # path prefix: the subdomain's own rule group wins (robots.txt
        # resolves within one host's group) — r12 verdict nit #1
        rules = [
            ("ex.com", "/a", True),
            ("sub.ex.com", "/a", False),
        ]
        got = self._run(spark, rules, [
            "http://sub.ex.com/a/x",   # subdomain group: disallow
            "http://ex.com/a/x",       # parent only: allow
            "http://other.ex.com/a/x", # parent group applies: allow
        ])
        assert got == {
            0: ("/a", False),
            1: ("/a", True),
            2: ("/a", True),
        }

    def test_broadcast_regime_parity(self, spark):
        # forcing the broadcast-join swap (max_literal_entries=0) must
        # produce byte-identical results to the literal-folded plan
        rules = [
            ("ex.com", "/", False),
            ("ex.com", "/public", True),
            ("sub.ex.com", "/public", False),
            ("b.co.uk", "/x", True),
        ]
        urls = [
            "http://ex.com/public/doc",
            "http://sub.ex.com/public/doc",
            "http://www.ex.com/private",
            "http://b.co.uk/x/1",
            "http://none.org/y",
            "http://ex.com",
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "id long, url string"
        )
        lit = sorted(
            tuple(r) for r in webtext.robots_rules_filter(
                df, rules
            ).select("id", "domain", "path", "rule_path", "allowed").collect()
        )
        bc_df = webtext.robots_rules_filter(
            df, rules, max_literal_entries=0
        )
        bc = sorted(
            tuple(r) for r in bc_df.select(
                "id", "domain", "path", "rule_path", "allowed"
            ).collect()
        )
        assert lit == bc
        # plan pin: the swap is BroadcastHashJoins, not a giant literal
        # and not a BroadcastNestedLoopJoin / corpus exchange
        plan = bc_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestDomainBlocklistBroadcast:
    def test_regime_parity_and_plan(self, spark):
        blocked = ["Example.com", "www.b.co.uk", "deep.sub.c.org"]
        urls = [
            "http://example.com/x",
            "http://sub.example.com/y",
            "http://notexample.com/z",
            "http://b.co.uk/1",
            "http://a.deep.sub.c.org/2",
            "http://sub.c.org/3",
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "id long, url string"
        )
        cols = ["id", "domain", "base_domain", "blocked"]
        lit = sorted(
            tuple(r)
            for r in webtext.domain_blocklist_filter(df, blocked)
            .select(*cols).collect()
        )
        bc_df = webtext.domain_blocklist_filter(
            df, blocked, max_literal_entries=0
        )
        bc = sorted(tuple(r) for r in bc_df.select(*cols).collect())
        assert lit == bc
        assert [r[3] for r in lit] == [True, True, False, True, True, False]
        plan = bc_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestParseRobotsTxt:
    BODIES = [
        ("a.com", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
        ("b.com", "User-agent: bot\nUser-agent: crawler\nDisallow: /tmp\n\n"
                  "User-agent: other\nDisallow: /\n"),
        ("c.com", "# top comment\nUser-agent: *\nDisallow:\n"),
        ("d.com", "Disallow: /orphan\nUser-agent: BOT\nAllow: /a\n"
                  "Disallow: /a/b # inline\n"),
        ("e.com", "User-agent: other\nDisallow: /x\n"),
    ]

    def test_group_structure_and_edge_cases(self, spark):
        # multi-UA runs share a group; agent match is case-insensitive;
        # comments strip; empty Disallow contributes no rule; orphan
        # directives before any group are ignored; non-matching groups
        # contribute nothing
        df = spark.createDataFrame(
            self.BODIES, "domain string, robots_txt string"
        )
        got = sorted(
            tuple(r) for r in webtext.parse_robots_txt(df, agent="bot").collect()
        )
        assert got == sorted([
            ("a.com", "/private", False), ("a.com", "/private/ok", True),
            ("b.com", "/tmp", False),
            ("d.com", "/a", True), ("d.com", "/a/b", False),
        ])

    def test_star_agent_only_match(self, spark):
        df = spark.createDataFrame(
            self.BODIES, "domain string, robots_txt string"
        )
        got = sorted(
            tuple(r)
            for r in webtext.parse_robots_txt(df, agent="nobody").collect()
        )
        # only the '*' groups apply (a.com rules; c.com's is empty)
        assert got == sorted([
            ("a.com", "/private", False), ("a.com", "/private/ok", True),
        ])

    def test_crlf_and_dedup(self, spark):
        df = spark.createDataFrame(
            [("x.com", "User-agent: *\r\nDisallow: /p\r\nDisallow: /p\r\n")],
            "domain string, robots_txt string",
        )
        got = webtext.parse_robots_txt(df).collect()
        assert [tuple(r) for r in got] == [("x.com", "/p", False)]

    def test_rules_df_filter_matches_list_filter(self, spark):
        bodies = spark.createDataFrame(
            self.BODIES, "domain string, robots_txt string"
        )
        rules = webtext.parse_robots_txt(bodies, agent="bot")
        urls = spark.createDataFrame(
            [(1, "http://a.com/private/ok/x"),
             (2, "http://sub.a.com/private/y"),
             (3, "http://b.com/tmp/z"),
             (4, "http://e.com/x"),
             (5, "http://d.com/a/b/c")],
            "id long, url string",
        )
        cols = ["id", "domain", "path", "rule_path", "allowed"]
        via_df = sorted(
            tuple(r)
            for r in webtext.robots_rules_filter_df(urls, rules)
            .select(*cols).collect()
        )
        via_list = sorted(
            tuple(r)
            for r in webtext.robots_rules_filter(
                urls, [tuple(r) for r in rules.collect()]
            ).select(*cols).collect()
        )
        assert via_df == via_list
        flags = {r[0]: r[4] for r in via_df}
        assert flags == {1: True, 2: False, 3: False, 4: True, 5: False}

    def test_rules_df_empty_allows_everything(self, spark):
        urls = spark.createDataFrame(
            [(1, "http://a.com/x")], "id long, url string"
        )
        empty = spark.createDataFrame(
            [], "domain string, prefix string, allow boolean"
        )
        (row,) = webtext.robots_rules_filter_df(urls, empty).collect()
        assert row["allowed"] is True and row["rule_path"] is None


class TestSitemapAndSchedule:
    def test_parse_sitemap_both_kinds(self, spark):
        xml1 = (
            '<?xml version="1.0"?>\n<urlset xmlns="http://x">\n'
            "  <url><loc> http://a.com/p1 </loc>"
            "<lastmod>2024-01-05</lastmod></url>\n"
            "  <url><loc>http://a.com/p2</loc></url>\n"
            "  <url><lastmod>2024-01-01</lastmod></url>\n</urlset>"
        )
        xml2 = (
            "<sitemapindex>\n  <sitemap><loc>http://b.com/more.xml</loc>"
            "<lastmod>2024-02-02T10:00:00Z</lastmod></sitemap>\n"
            "</sitemapindex>"
        )
        df = spark.createDataFrame(
            [("a.com", xml1), ("b.com", xml2)],
            "domain string, sitemap_xml string",
        )
        got = sorted(tuple(r) for r in webtext.parse_sitemap(df).collect())
        assert got == sorted([
            ("a.com", "url", "http://a.com/p1", "2024-01-05"),
            ("a.com", "url", "http://a.com/p2", None),  # no lastmod
            ("b.com", "sitemap", "http://b.com/more.xml",
             "2024-02-02T10:00:00Z"),
        ])  # loc-less entry dropped

    def test_lastmod_parses_as_timestamp(self, spark):
        # both W3C forms feed straight into to_timestamp
        df = spark.createDataFrame(
            [("a.com", "<urlset><url><loc>http://a.com/x</loc>"
                       "<lastmod>2024-03-04</lastmod></url></urlset>")],
            "domain string, sitemap_xml string",
        )
        (row,) = (
            webtext.parse_sitemap(df)
            .select(F.to_timestamp("lastmod").alias("ts"))
            .collect()
        )
        assert row["ts"] is not None

    def test_crawl_schedule_per_domain_spacing(self, spark):
        urls = spark.createDataFrame(
            [("a.com", "http://a.com/x", 5),
             ("a.com", "http://a.com/y", 9),
             ("a.com", "http://a.com/z", 9),
             ("b.com", "http://b.com/q", 1)],
            "domain string, url string, prio int",
        )
        got = {
            r["url"]: (r["slot"], r["fetch_offset_sec"])
            for r in webtext.crawl_schedule(
                urls, delay_sec=1.5, priority_col="prio"
            ).collect()
        }
        # priority desc, url tiebreak; each domain's queue independent
        assert got == {
            "http://a.com/y": (0, 0.0), "http://a.com/z": (1, 1.5),
            "http://a.com/x": (2, 3.0), "http://b.com/q": (0, 0.0),
        }

    def test_crawl_schedule_without_priority(self, spark):
        urls = spark.createDataFrame(
            [("a.com", "http://a.com/b"), ("a.com", "http://a.com/a")],
            "domain string, url string",
        )
        got = {
            r["url"]: r["slot"]
            for r in webtext.crawl_schedule(urls).collect()
        }
        assert got == {"http://a.com/a": 0, "http://a.com/b": 1}


class TestUrlTemplates:
    def test_digit_collapse_and_explosive_flag(self, spark):
        urls = (
            [(f"http://a.com/cal/2024/{i}",) for i in range(30)]
            + [("http://a.com/about",), ("http://a.com/about",)]
            + [("http://b.com/p/7/x/8",)]
        )
        df = spark.createDataFrame(urls, "url string")
        got = {
            (r["domain"], r["template"]): r
            for r in webtext.url_templates(
                df, max_urls_per_template=10
            ).collect()
        }
        cal = got[("a.com", "/cal/{n}/{n}")]
        assert cal["n_urls"] == 30 and cal["n_unique_paths"] == 30
        assert cal["explosive"] is True  # the trap
        about = got[("a.com", "/about")]
        assert about["n_urls"] == 2 and about["n_unique_paths"] == 1
        assert about["explosive"] is False
        assert got[("b.com", "/p/{n}/x/{n}")]["n_urls"] == 1

    def test_no_threshold_no_flag_column(self, spark):
        df = spark.createDataFrame([("http://a.com/x1",)], "url string")
        cols = webtext.url_templates(df).columns
        assert "explosive" not in cols

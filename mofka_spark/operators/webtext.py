"""Web-crawl text extraction: HTML → text plus line-level corrections.

Beyond-reference (the LLM-pipeline mandate): the first stage of a
FineWeb/RefinedWeb-style pipeline over crawled HTML — tag stripping,
entity decoding, line-wise quality corrections, within-document line
dedup, and cross-corpus boilerplate-line removal.

Scale design (100 TB): everything except :func:`dedup_lines_across_docs`
is scan-local Column work — regexp chains and higher-order array
functions that run inside whole-stage codegen with zero shuffles, so
extraction throughput is pure scan bandwidth. Cross-corpus line dedup
is ONE hash shuffle on the line fingerprint (the same key for the
count and the join-back, so AQE reuses the exchange), never an
all-pairs operation. Regexes are written in the Java∩RE2 common
subset (no lookaround, no backreferences) so the DuckDB oracles run
the same patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# -- HTML → text -------------------------------------------------------------

# Elements whose CONTENT is not text (dropped wholesale). One pattern
# per element — RE2 has no backreferences, and an alternation of the
# open/close names would let ``<script>…</style>`` match.
_CONTAINER_RES = [
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
]
_COMMENT_RE = r"(?s)<!--.*?-->"
# Block-level elements break lines; inline tags vanish without a space
# (``<em>word</em>s`` → ``words``).
_BLOCK_TAGS = (
    "p|div|br|hr|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|tbody|"
    "blockquote|pre|section|article|aside|header|footer|form|nav|title|"
    "figure|figcaption|main"
)
_BLOCK_RE = rf"(?is)</?({_BLOCK_TAGS})\b[^>]*>"
_ANY_TAG_RE = r"(?s)<[^>]*>"
# Minimal named-entity map (decoded in this order; ``&amp;`` LAST so
# ``&amp;lt;`` decodes to the literal text ``&lt;``, not ``<``).
HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def html_text_column(html: Column) -> Column:
    """Extracted plain text of an HTML column (one Column expression).

    Pipeline: drop script/style bodies and comments → block tags become
    newlines → remaining tags vanish → named entities decode →
    horizontal whitespace collapses to single spaces → blank/padded
    lines collapse → outer whitespace trims. Numeric character
    references (``&#NN;``) other than ``&#39;`` are NOT decoded (a
    deliberate pure-SQL limit, identical on the oracle side).
    """
    c = html
    for pat in _CONTAINER_RES:
        c = F.regexp_replace(c, pat, "")
    c = F.regexp_replace(c, _COMMENT_RE, "")
    c = F.regexp_replace(c, _BLOCK_RE, "\n")
    c = F.regexp_replace(c, _ANY_TAG_RE, "")
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    # horizontal whitespace (NOT \n — lines are structure here)
    c = F.regexp_replace(c, r"[ \t\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    return F.btrim(c, F.lit(" \n"))


def html_to_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Add ``out_col`` = extracted plain text of ``html_col``."""
    return df.withColumn(out_col, html_text_column(F.col(html_col)))


# -- line-level signals and corrections --------------------------------------

# RefinedWeb-style boilerplate phrases (line dropped when its lowercase
# form CONTAINS one). Kept short and high-precision; callers pass their
# own list for a real crawl.
BOILERPLATE_PHRASES = [
    "all rights reserved",
    "cookie policy",
    "terms of service",
    "terms of use",
    "privacy policy",
    "click here",
    "read more",
    "share this",
    "sign in",
    "log in to",
    "subscribe to our newsletter",
    "javascript is disabled",
    "enable javascript",
]


def _boilerplate_regex(phrases: list[str] | None = None) -> str:
    import re as _re

    return "|".join(
        _re.escape(p.lower()) for p in (phrases or BOILERPLATE_PHRASES)
    )


def _line_drop_cond(
    line: Column,
    min_words: int,
    max_caps_ratio: float,
    boilerplate_re: str,
) -> Column:
    """True when a line should be removed (RefinedWeb line-wise
    corrections: mainly-uppercase lines, numeric-only lines / counters,
    too-short lines, boilerplate phrases)."""
    n_chars = F.length(line)
    n_alpha = n_chars - F.length(F.regexp_replace(line, r"[A-Za-z]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(line, r"[A-Z]", ""))
    n_words = F.size(F.split(F.btrim(line), r" +"))
    caps_ratio = n_upper / F.greatest(n_alpha, F.lit(1))
    return (
        (F.length(F.btrim(line)) == 0)
        | (n_words < F.lit(min_words))
        | line.rlike(r"^[0-9 .,:/-]+$")  # numeric-only / counter lines
        | ((n_alpha >= 5) & (caps_ratio > F.lit(max_caps_ratio)))
        | F.lower(line).rlike(boilerplate_re)
    )


def filter_lines(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    min_words: int = 1,
    max_caps_ratio: float = 0.8,
    max_removed_frac: float = 0.5,
    phrases: list[str] | None = None,
) -> DataFrame:
    """Line-wise corrections: drop bad lines, reassemble the document,
    drop documents that lost more than ``max_removed_frac`` of their
    lines (RefinedWeb drops docs whose line corrections removed too
    much). Zero shuffles — split/filter/join run as array expressions
    inside the scan.

    Returns (id, clean_text, n_lines, n_kept, removed_frac, kept).
    """
    bre = _boilerplate_regex(phrases)
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda l: ~_line_drop_cond(l, min_words, max_caps_ratio, bre),
    )
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    removed_frac = (n_lines - n_kept) / F.greatest(n_lines, F.lit(1))
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("clean_text"),
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        (F.round(removed_frac, 6) + F.lit(0.0)).alias("removed_frac"),
        (removed_frac <= F.lit(max_removed_frac)).alias("kept"),
    )


def split_lines(
    df: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """Explode a document frame to (id, line_no, line) — 1-based
    line_no in document order."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select("id", (F.col("pos") + 1).cast("int").alias("line_no"), "line")


def dedup_lines_within_doc(
    df: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """Remove repeated lines WITHIN each document, keeping the first
    occurrence (within-page menu/nav repetition). Scan-local: the seen-
    set accumulates in an array aggregate, no shuffle; documents are
    bounded (a page), so the O(lines²) membership scan is constant
    work per row.

    Returns (id, clean_text, n_lines, n_kept).
    """
    lines = F.split(F.col(text_col), "\n")
    uniq = F.aggregate(
        lines,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(uniq, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(uniq).cast("long").alias("n_kept"),
    )


# -- URL / domain curation ----------------------------------------------------

# Tracking query parameters stripped during canonicalization (name
# matched against the part before '='). Java∩RE2-safe alternation.
TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|ref_src|igshid|mc_cid|mc_eid)"
    r"(=.*)?$"
)
# Second-level labels under which a 2-char ccTLD hosts registrations
# ("example.co.uk"). A heuristic, NOT the public-suffix list — callers
# with a real crawl should join their own PSL snapshot instead.
_COMMON_SLD_RE = r"^(co|com|net|org|gov|edu|ac)$"

_URL_SCHEME_RE = r"^([^:/?#]+)://.*$"
_URL_HOST_RE = r"^[^:/?#]+://([^/?#]*).*$"
_URL_PATH_RE = r"^[^:/?#]+://[^/?#]*([^?#]*).*$"
_URL_QUERY_RE = r"^[^#?]*\?([^#]*).*$"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one Column
    expression (scan-local; zero shuffles):

    - scheme and host lowercase; a leading ``www.`` strips
    - default ports strip (``:80`` for http, ``:443`` for https)
    - the fragment drops
    - tracking query params (:data:`TRACKING_PARAM_RE`) drop; the
      survivors SORT (order-insensitive dedup) and rejoin
    - trailing slashes on the path strip (``/`` alone becomes empty)

    Non-URL strings (no ``scheme://``) pass through trimmed — garbage
    in, garbage out, but deterministic.
    """
    scheme, host, path, query = _canon_parts(url)
    return F.when(
        scheme == F.lit(""),  # not an absolute URL
        F.btrim(url),
    ).otherwise(
        F.concat(
            scheme, F.lit("://"), host, path,
            F.when(query == F.lit(""), F.lit("")).otherwise(
                F.concat(F.lit("?"), query)
            ),
        )
    )


def _canon_parts(url: Column) -> tuple[Column, Column, Column, Column]:
    u = F.btrim(url)
    scheme = F.lower(F.regexp_extract(u, _URL_SCHEME_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, _URL_HOST_RE, 1)), r"^www\.", ""
    )
    host = F.when(
        (scheme == F.lit("http")), F.regexp_replace(host, r":80$", "")
    ).otherwise(host)
    host = F.when(
        (scheme == F.lit("https")), F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    path = F.regexp_replace(
        F.regexp_extract(u, _URL_PATH_RE, 1), r"/+$", ""
    )
    query = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract(u, _URL_QUERY_RE, 1), "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return scheme, host, path, query


def url_domain(url: Column) -> Column:
    """Host of an absolute URL, lowercased, ``www.``-stripped, port
    dropped (``site.example.com:8080`` → ``site.example.com``)."""
    host = F.regexp_replace(
        F.lower(F.regexp_extract(F.btrim(url), _URL_HOST_RE, 1)),
        r"^www\.", "",
    )
    return F.regexp_replace(host, r":[0-9]+$", "")


def url_base_domain(url: Column) -> Column:
    """Registrable-domain HEURISTIC: last two host labels, or last
    three when the middle one is a common SLD under a 2-char ccTLD
    (``a.b.example.co.uk`` → ``example.co.uk``). See
    :data:`_COMMON_SLD_RE` for the PSL caveat."""
    labels = F.split(url_domain(url), r"\.")
    n = F.size(labels)
    take3 = (
        (n >= 3)
        & (F.length(F.element_at(labels, -1)) == 2)
        & F.element_at(labels, -2).rlike(_COMMON_SLD_RE)
    )
    k = F.when(take3, F.lit(3)).otherwise(F.lit(2))
    return F.array_join(
        F.slice(labels, F.greatest(n - k + 1, F.lit(1)), k), "."
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canon_url"
) -> DataFrame:
    """Add canonical-URL + domain + base-domain columns (all
    scan-local)."""
    return (
        df.withColumn(out_col, canonicalize_url(F.col(url_col)))
        .withColumn("domain", url_domain(F.col(url_col)))
        .withColumn("base_domain", url_base_domain(F.col(url_col)))
    )


def dedup_urls(
    df: DataFrame, id_col: str = "id", url_col: str = "url"
) -> DataFrame:
    """URL-level exact dedup after canonicalization: rows sharing a
    canonical URL collapse to one keeper (lowest id — the
    dedup_normalized keeper rule, operators/dedup.py). One shuffle on
    the canonical-URL hash; no pair table is ever formed.

    Returns (id, canon_url, keeper_id, is_dup)."""
    from pyspark.sql import Window

    canon = df.select(
        F.col(id_col).alias("id"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
    )
    w = Window.partitionBy("canon_url")
    return canon.select(
        "id",
        "canon_url",
        F.min("id").over(w).alias("keeper_id"),
        (F.col("id") != F.min("id").over(w)).alias("is_dup"),
    )


def domain_stats(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-base-domain corpus stats (feeds group_cap/corpus_report for
    domain budgets): n_urls, n_unique_canon, n_hosts."""
    parts = df.select(
        canonicalize_url(F.col(url_col)).alias("canon_url"),
        url_domain(F.col(url_col)).alias("domain"),
        url_base_domain(F.col(url_col)).alias("base_domain"),
    )
    return parts.groupBy("base_domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.count_distinct("canon_url").alias("n_unique_canon"),
        F.count_distinct("domain").alias("n_hosts"),
    )


def dedup_lines_across_docs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    min_docs: int = 2,
    min_line_chars: int = 10,
) -> DataFrame:
    """Cross-corpus boilerplate-line removal: a line (trimmed form)
    appearing in ``min_docs``+ DISTINCT documents is removed from all
    of them (CCNet/RefinedWeb shard-level line dedup). Short lines
    (< ``min_line_chars``) are exempt — list markers and headers
    legitimately repeat.

    ONE shuffle: lines hash-partition on the line fingerprint for the
    distinct-doc count, and the join back is on the same key, so the
    exchange is reused; the filtered reassembly groups by id (second
    bounded shuffle on the doc key). No step is all-pairs.

    Returns (id, clean_text, n_lines, n_kept).
    """
    lines = split_lines(df, id_col, text_col).withColumn(
        "fp", F.xxhash64(F.btrim(F.col("line")))
    )
    counts = (
        lines.filter(F.length(F.btrim("line")) >= min_line_chars)
        .groupBy("fp")
        .agg(F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("fp", F.lit(True).alias("shared"))
    )
    return remove_lines_by_fp(df, counts, id_col, text_col)


def remove_lines_by_fp(
    df: DataFrame,
    shared_fps: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every line whose trimmed-form xxhash64 fingerprint
    appears in ``shared_fps`` (a (fp[, ...]) frame) and reassemble the
    documents — the shared removal tail of
    :func:`dedup_lines_across_docs`, also driven by the streaming
    line-count store (streaming/linestore.py) where the shared set
    comes from accumulated history instead of this frame's own counts.
    ``shared_fps`` must be fp-unique (both callers produce it from a
    groupBy) — a duplicate fp would duplicate the joined lines.

    Returns (id, clean_text, n_lines, n_kept)."""
    lines = split_lines(df, id_col, text_col).withColumn(
        "fp", F.xxhash64(F.btrim(F.col("line")))
    )
    shared = shared_fps.select("fp", F.lit(True).alias("shared"))
    kept = (
        lines.join(shared, "fp", "left")
        .filter(F.col("shared").isNull())
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "line"))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count("*").cast("long").alias("n_kept"),
        )
    )
    totals = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    # left join from totals: a document whose EVERY line was shared
    # still appears, with an empty clean_text and n_kept = 0
    return totals.join(kept, "id", "left").select(
        "id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


# -- link extraction / web graph ---------------------------------------------

# <a href="..."> pairs, double- and single-quoted forms (unquoted
# hrefs — rare and spec-discouraged — are not extracted; documented).
_A_DQ_RE = r'(?is)<a\b[^>]*\bhref\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>'
_A_SQ_RE = r"(?is)<a\b[^>]*\bhref\s*=\s*'([^']*)'[^>]*>(.*?)</a\s*>"


def extract_links(
    df: DataFrame, id_col: str = "id", html_col: str = "html"
) -> DataFrame:
    """(id, link_no, href, anchor) rows for every ``<a href=...>`` in
    each HTML document — the outlink stage that turns a crawl into a
    web graph (feeds canonicalize_url + graph.pagerank). Anchor text
    is tag-stripped and trimmed; double-quoted links order before
    single-quoted ones, each group in document order.

    Scale shape: regexp_extract_all + array zip/explode, all inside
    the scan — zero shuffles, zero UDFs."""
    h = F.col(html_col)

    def pairs(pat: str) -> Column:
        return F.zip_with(
            F.regexp_extract_all(h, F.lit(pat), F.lit(1)),
            F.regexp_extract_all(h, F.lit(pat), F.lit(2)),
            lambda u, a: F.struct(
                u.alias("href"),
                F.btrim(F.regexp_replace(a, r"(?s)<[^>]*>", "")).alias(
                    "anchor"
                ),
            ),
        )

    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.concat(pairs(_A_DQ_RE), pairs(_A_SQ_RE))).alias(
            "link_no", "link"
        ),
    ).select(
        "id",
        F.col("link_no").cast("int").alias("link_no"),
        F.col("link.href").alias("href"),
        F.col("link.anchor").alias("anchor"),
    )


def web_graph(
    df: DataFrame,
    id_col: str = "id",
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Canonical (src, dst) edge list from crawled pages: extract
    outlinks, canonicalize both endpoints, keep absolute http(s)
    targets, drop self-loops, dedup repeated edges. The output feeds
    graph.pagerank / graph.triangle_count unchanged.

    Scale shape: link extraction and canonicalization are scan-local;
    the only shuffle is the (src, dst) distinct — edge-keyed,
    uniform."""
    links = extract_links(
        df.select(
            canonicalize_url(F.col(url_col)).alias("src"),
            F.col(html_col).alias("html"),
        ),
        id_col="src",
        html_col="html",
    ).withColumnRenamed("id", "src")
    dst = canonicalize_url(F.col("href"))
    return (
        links.filter(F.col("href").rlike(r"(?i)^https?://"))
        .select("src", dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def url_path(url: Column) -> Column:
    """Path component of an absolute URL (query/fragment stripped);
    an empty path reads as ``/`` — the form robots-style path rules
    match against."""
    p = F.regexp_extract(F.btrim(url), _URL_PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


#: Above this many entries, rule-set operators stop folding the set
#: into the plan as a literal array (plan size / codegen compile time
#: blow up long before data cost matters — a production crawl
#: blocklist is millions of domains) and switch to broadcast hash
#: joins with identical results. Override per call via
#: ``max_literal_entries``.
LITERAL_FOLD_MAX = 10_000

#: Struct field ORDER is the resolution order (array_max compares
#: lexicographically): domain-match length first (a subdomain's own
#: rule beats a parent domain's, mirroring robots.txt's per-host rule
#: groups), then path-prefix length, then allow-beats-disallow. The
#: prefix field only makes the order total: distinct equal-length
#: domains cannot both suffix-match one host, and within one domain
#: distinct equal-length prefixes cannot both match one path.
_RULE_STRUCT = "struct<dlen:int,plen:int,allow:boolean,prefix:string>"


def _rules_winner_cols(winner):
    return winner["prefix"], F.coalesce(winner["allow"], F.lit(True))


def _host_suffix(labels, n, i):
    """The host's label-boundary suffix of exactly ``i`` labels (NULL
    when the host has fewer) — ``a.b.c`` at i=2 is ``b.c``. Joining
    suffix_i against entries with i labels is exactly the
    suffix-at-label-boundary match, with an equi-join key."""
    return F.when(
        n >= i, F.array_join(F.slice(labels, n - F.lit(i) + 1, i), ".")
    )


def robots_rules_filter(
    df: DataFrame,
    rules: list[tuple[str, str, bool]],
    url_col: str = "url",
    max_literal_entries: int = LITERAL_FOLD_MAX,
) -> DataFrame:
    """robots.txt-style allow/disallow path rules with most-specific
    resolution — the crawl-politeness / curation stage next to
    :func:`domain_blocklist_filter`'s all-or-nothing domain stage.

    ``rules``: (domain, path_prefix, allow) triples. A rule applies
    when the URL's host equals the domain or is a subdomain of it
    (label-boundary, ``www.``-normalized both sides, the blocklist
    discipline) AND the URL's path starts with ``path_prefix``. Among
    applicable rules the most specific DOMAIN wins first (longest
    matched domain — a subdomain's own rule beats a parent domain's,
    mirroring robots.txt's per-host rule groups), then the LONGEST
    path prefix, then allow beats disallow (the de-facto robots.txt
    tie order). No applicable rule = allowed.

    Adds (domain, path, rule_path, allowed); ``rule_path`` is NULL
    where no rule applied. Callers filter on ``allowed``.

    Scale shape, two regimes with identical results:

    - ``len(rules) <= max_literal_entries``: the ruleset folds into
      the plan as a literal array of structs probed with array HOFs —
      scan-local, zero shuffles, zero UDFs (one site's robots rules
      are tens of lines).
    - larger: rules pre-group into per-domain arrays and broadcast;
      the corpus takes one BroadcastHashJoin per distinct domain
      label-depth (hosts are ≤ ~10 labels) on the host's
      label-boundary suffix — still zero corpus exchanges, and the
      plan carries no giant literal. Each join matches at most one
      domain (suffixes at a fixed depth are unique), so rows never
      multiply; the winner logic runs on the small joined arrays.
    """
    host = url_domain(F.col(url_col))
    path = url_path(F.col(url_col))
    if not rules:
        return (
            df.withColumn("domain", host)
            .withColumn("path", path)
            .withColumn("rule_path", F.lit(None).cast("string"))
            .withColumn("allowed", F.lit(True))
        )
    # dedupe + normalize entries like hosts (lowercase, one www. off)
    norm = sorted(
        {
            (_strip_www(d.lower().lstrip(".")), p, bool(a))
            for d, p, a in rules
        }
    )
    if len(norm) <= max_literal_entries:
        rule_arr = F.array(
            *[
                F.struct(
                    F.lit(len(d)).cast("int").alias("dlen"),
                    F.lit(len(p)).cast("int").alias("plen"),
                    F.lit(a).alias("allow"),
                    F.lit(p).alias("prefix"),
                    F.lit(d).alias("dom"),
                )
                for d, p, a in norm
            ]
        )
        applicable = F.filter(
            rule_arr,
            lambda r: (
                (host == r["dom"])
                | host.endswith(F.concat(F.lit("."), r["dom"]))
            )
            & path.startswith(r["prefix"]),
        )
        winner = F.array_max(applicable)  # see _RULE_STRUCT order note
        rule_path, allowed = _rules_winner_cols(winner)
        return (
            df.withColumn("domain", host)
            .withColumn("path", path)
            .withColumn("rule_path", rule_path)
            .withColumn("allowed", allowed)
        )
    # broadcast regime: per-domain rule arrays, one broadcast join per
    # domain label-depth on the host suffix of that depth
    spark = df.sparkSession
    by_dom: dict[str, list] = {}
    for d, p, a in norm:
        # tuple order == _RULE_STRUCT field order
        by_dom.setdefault(d, []).append((len(d), len(p), a, p))
    rdf = spark.createDataFrame(
        [(d, d.count(".") + 1, rl) for d, rl in by_dom.items()],
        f"dom string, depth int, rules array<{_RULE_STRUCT}>",
    )
    return _robots_filter_broadcast(df, rdf, host, path)


def _robots_filter_broadcast(
    df: DataFrame, rdf: DataFrame, host: Column, path: Column
) -> DataFrame:
    """The broadcast regime over a pre-grouped rules frame
    ``rdf = (dom, depth, rules array<_RULE_STRUCT>)`` — shared by the
    python-list path (above the literal ceiling) and the
    ``rules_df=`` path (rules living in a DataFrame, e.g. the output
    of :func:`parse_robots_txt` at crawl scale)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # O(10) distinct label depths — tiny driver-side metadata
    depths = sorted(
        r["depth"] for r in rdf.select("depth").distinct().collect()
    )
    out = df.withColumn("domain", host).withColumn("path", path)
    cand_cols = []
    for i in depths:
        sub = rdf.filter(F.col("depth") == i).select(
            F.col("dom").alias(f"_rr_dom_{i}"),
            F.col("rules").alias(f"_rr_rules_{i}"),
        )
        out = out.join(
            F.broadcast(sub),
            _host_suffix(labels, n, i) == F.col(f"_rr_dom_{i}"),
            "left",
        )
        cand_cols.append(
            F.coalesce(
                F.col(f"_rr_rules_{i}"),
                F.expr(f"CAST(array() AS array<{_RULE_STRUCT}>)"),
            )
        )
    if not cand_cols:  # empty rules frame: everything allowed
        return (
            out.withColumn("rule_path", F.lit(None).cast("string"))
            .withColumn("allowed", F.lit(True))
        )
    cand = cand_cols[0] if len(cand_cols) == 1 else F.concat(*cand_cols)
    applicable = F.filter(
        cand, lambda r: F.col("path").startswith(r["prefix"])
    )
    winner = F.array_max(applicable)
    rule_path, allowed = _rules_winner_cols(winner)
    return (
        out.withColumn("rule_path", rule_path)
        .withColumn("allowed", allowed)
        .drop(
            *[c for i in depths for c in (f"_rr_dom_{i}", f"_rr_rules_{i}")]
        )
    )


def robots_rules_filter_df(
    df: DataFrame,
    rules_df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """:func:`robots_rules_filter` with the rule set in a DATAFRAME
    (columns domain, prefix, allow) instead of a python list — the
    crawl-scale form where rules come out of
    :func:`parse_robots_txt` over millions of fetched robots.txt
    bodies and never pass through the driver. Same normalization
    (lowercase, one leading ``www.`` off, dedup) and the same
    most-specific resolution, via the shared broadcast machinery; the
    grouped rules frame must fit in a broadcast (rules are tens of
    bytes per domain — ~GB-scale rule sets; beyond that, pre-filter
    rules_df to the crawl's domains first)."""
    dom = F.regexp_replace(
        F.lower(F.regexp_replace(F.col("domain"), r"^\.+", "")),
        r"^www\.", "",
    )
    norm = rules_df.select(
        dom.alias("dom"),
        F.col("prefix").cast("string").alias("prefix"),
        F.col("allow").cast("boolean").alias("allow"),
    ).distinct()
    grouped = norm.groupBy("dom").agg(
        F.collect_list(
            F.struct(
                F.length("dom").cast("int").alias("dlen"),
                F.length("prefix").cast("int").alias("plen"),
                F.col("allow").alias("allow"),
                F.col("prefix").alias("prefix"),
            )
        ).alias("rules")
    ).withColumn("depth", F.size(F.split(F.col("dom"), r"\.")))
    host = url_domain(F.col(url_col))
    path = url_path(F.col(url_col))
    return _robots_filter_broadcast(df, grouped, host, path)


# robots.txt line kinds (comments/whitespace already stripped)
_ROBOTS_DIRECTIVE_RE = r"^[^:]*:(.*)$"


def parse_robots_txt(
    df: DataFrame,
    domain_col: str = "domain",
    body_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt BODIES into (domain, prefix, allow) rule rows —
    the fetch-side companion of :func:`robots_rules_filter`: a crawl
    pipeline fetches ``/robots.txt`` per host, parses the group(s)
    applying to its user agent, and feeds the rules to the filter
    (list form under the literal ceiling, ``robots_rules_filter_df``
    at scale).

    Grammar handled (RFC 9309 group structure): ``User-agent:`` runs
    open a group (several consecutive UA lines share one group; a
    directive line closes the run), ``Allow:``/``Disallow:`` lines
    attach to the current group, ``#`` comments and blank lines are
    stripped, matching is case-insensitive on field names and agent
    names. A group applies when it names ``*`` or ``agent``. An EMPTY
    ``Disallow:`` value means "allow everything" — it contributes no
    rule. Directives before any group are invalid and ignored.
    DELIBERATE simplification, documented: path values are treated as
    PLAIN PREFIXES — RFC 9309 ``*``/``$`` wildcards are not
    interpreted (they pass through verbatim and, as prefixes, simply
    never match), exactly the semantics robots_rules_filter resolves.

    Scale shape: lines explode scan-local; the group-assignment
    windows and the rules↔agents join are keyed by (domain), so the
    one shuffle carries parsed DIRECTIVE rows only (tens per domain),
    never bodies.

    Input contract: at most ONE body per domain. The group-assignment
    window partitions by domain with per-row line indexes, so two
    bodies for the same domain (refetches) would interleave lines and
    cross-attach directives. Dedup to the latest fetch first —
    exactly what :mod:`mofka_spark.streaming.robots`'s sink does
    before calling this (latest-per-domain wins).
    """
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(body_col), "\r?\n")).alias("idx", "raw"),
    )
    val = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    lo = F.lower(val)
    kind = (
        F.when(lo.startswith("user-agent:"), "ua")
        .when(lo.startswith("allow:"), "allow")
        .when(lo.startswith("disallow:"), "disallow")
    )
    typed = lines.select(
        "domain",
        "idx",
        kind.alias("kind"),
        F.trim(F.regexp_extract(val, _ROBOTS_DIRECTIVE_RE, 1)).alias("v"),
    ).filter(F.col("kind").isNotNull())
    w = Window.partitionBy("domain").orderBy("idx")
    prev = F.lag("kind").over(w)
    grouped = typed.withColumn(
        "grp",
        F.sum(
            (
                (F.col("kind") == "ua") & (prev.isNull() | (prev != "ua"))
            ).cast("int")
        ).over(w),
    )
    agents = (
        grouped.filter(F.col("kind") == "ua")
        .groupBy("domain", "grp")
        .agg(F.collect_set(F.lower(F.col("v"))).alias("agents"))
    )
    rules = grouped.filter(
        F.col("kind").isin("allow", "disallow")
        & (F.col("grp") > 0)
        & (F.col("v") != "")
    )
    return (
        rules.join(agents, ["domain", "grp"])
        .filter(
            F.array_contains("agents", "*")
            | F.array_contains("agents", agent.lower())
        )
        .select(
            "domain",
            F.col("v").alias("prefix"),
            (F.col("kind") == "allow").alias("allow"),
        )
        .distinct()
    )


def _strip_www(domain: str) -> str:
    """One leading ``www.`` label off a blocklist entry — the same
    normalization :func:`url_domain` applies to hosts."""
    return domain[4:] if domain.startswith("www.") else domain


def domain_blocklist_filter(
    df: DataFrame,
    blocked_domains: list[str],
    url_col: str = "url",
    max_literal_entries: int = LITERAL_FOLD_MAX,
) -> DataFrame:
    """Flag rows whose base domain (or any parent suffix of their
    host) is blocklisted — the URL-level safety stage next to
    text.blocklist_scan's term stage. A blocked ``example.com`` also
    blocks ``sub.example.com`` (suffix-at-label-boundary match, never
    substring — ``notexample.com`` stays). Adds (domain, base_domain,
    blocked); callers filter on ~blocked.

    Scale shape, two regimes with identical results:

    - ``len(blocked_domains) <= max_literal_entries``: the blocklist
      folds into the plan as an array-literal membership probe over
      the host's label suffixes — scan-local, no join.
    - larger (a production crawl blocklist is millions of domains —
      an array literal that size blows up plan size and codegen):
      the blocklist splits by label depth and broadcasts; the corpus
      takes one BroadcastHashJoin per depth on the host's
      label-boundary suffix of that depth. Hash probes replace the
      O(entries) linear array scan, rows never multiply (one suffix
      per depth), and the corpus still never shuffles.
    """
    host = url_domain(F.col(url_col))
    if not blocked_domains:  # empty blocklist blocks nothing
        return (
            df.withColumn("domain", host)
            .withColumn("base_domain", url_base_domain(F.col(url_col)))
            .withColumn("blocked", F.lit(False))
        )
    # normalize entries exactly as url_domain normalizes hosts (strip
    # one leading "www."): a 'www.example.com' entry otherwise never
    # matches any suffix of a www-stripped host
    norm = sorted(
        {_strip_www(d.lower().lstrip(".")) for d in blocked_domains}
    )
    labels = F.split(host, r"\.")
    if len(norm) <= max_literal_entries:
        from mofka_spark.operators.text import _let

        blocked_arr = F.array(*[F.lit(d) for d in norm])

        # every label-boundary suffix of the host: ["a.b.c", "b.c", "c"]
        # — label array bound once per row via _let (the inlined
        # split-of-regexp-host would re-evaluate per suffix depth)
        def _hit(lab: Column) -> Column:
            ln = F.size(lab)
            suffixes = F.transform(
                F.sequence(F.lit(1), ln),
                lambda i: F.array_join(F.slice(lab, i, ln), "."),
            )
            return F.exists(
                suffixes, lambda s: F.array_contains(blocked_arr, s)
            )

        hit = _let(labels, _hit)
        return (
            df.withColumn("domain", host)
            .withColumn("base_domain", url_base_domain(F.col(url_col)))
            .withColumn("blocked", hit)
        )
    # broadcast regime: one join per blocklist label depth
    spark = df.sparkSession
    depths: dict[int, list] = {}
    for d in norm:
        depths.setdefault(d.count(".") + 1, []).append((d,))
    out = (
        df.withColumn("domain", host)
        .withColumn("base_domain", url_base_domain(F.col(url_col)))
    )
    hits = []
    for i in sorted(depths):
        bdf = spark.createDataFrame(depths[i], f"_bl_dom_{i} string")
        out = out.join(
            F.broadcast(bdf),
            _host_suffix(F.split(F.col("domain"), r"\."),
                         F.size(F.split(F.col("domain"), r"\.")), i)
            == F.col(f"_bl_dom_{i}"),
            "left",
        )
        hits.append(F.col(f"_bl_dom_{i}").isNotNull())
    blocked_col = hits[0]
    for h in hits[1:]:
        blocked_col = blocked_col | h
    return out.withColumn("blocked", blocked_col).drop(
        *[f"_bl_dom_{i}" for i in sorted(depths)]
    )


# -- sitemaps + crawl scheduling ---------------------------------------------

_SITEMAP_URL_BLOCK_RE = r"(?is)<url\b[^>]*>(.*?)</url\s*>"
_SITEMAP_IDX_BLOCK_RE = r"(?is)<sitemap\b[^>]*>(.*?)</sitemap\s*>"
_SITEMAP_LOC_RE = r"(?is)<loc\s*>\s*(.*?)\s*</loc\s*>"
_SITEMAP_LASTMOD_RE = r"(?is)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"


def parse_sitemap(
    df: DataFrame,
    domain_col: str = "domain",
    body_col: str = "sitemap_xml",
) -> DataFrame:
    """Parse sitemap.xml BODIES into one row per entry — the crawl
    seeding stage next to :func:`parse_robots_txt`: a crawler fetches
    each host's sitemap, expands ``<sitemapindex>`` references, and
    enqueues ``<urlset>`` locations with their last-modified hints.

    Handles both document kinds in one pass: ``<urlset>`` entries
    yield kind='url' rows, ``<sitemapindex>`` entries kind='sitemap'
    rows (their loc is a nested sitemap to fetch). Returns (domain,
    kind, loc, lastmod) — lastmod is the raw W3C datetime string
    (NULL when the entry has none; callers to_timestamp it, which
    accepts both date-only and full-datetime forms). Entries without
    a ``<loc>`` are dropped.

    Scale shape: pure regexp extraction + one explode per block kind —
    scan-local, zero shuffles, zero UDFs; bodies never leave their
    scan task."""
    body = F.col(body_col)

    def entries(block_re: str, kind: str) -> DataFrame:
        blocks = F.regexp_extract_all(body, F.lit(block_re), 1)
        out = df.select(
            F.col(domain_col).alias("domain"),
            F.explode(blocks).alias("_block"),
        )
        loc = F.regexp_extract("_block", _SITEMAP_LOC_RE, 1)
        lastmod = F.regexp_extract("_block", _SITEMAP_LASTMOD_RE, 1)
        return out.select(
            "domain",
            F.lit(kind).alias("kind"),
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        ).filter(F.col("loc") != "")

    return entries(_SITEMAP_URL_BLOCK_RE, "url").unionByName(
        entries(_SITEMAP_IDX_BLOCK_RE, "sitemap")
    )


def crawl_schedule(
    df: DataFrame,
    delay_sec: float = 1.0,
    domain_col: str = "domain",
    url_col: str = "url",
    priority_col: str | None = None,
) -> DataFrame:
    """Politeness-aware fetch schedule: within each domain, order URLs
    by descending priority (ties broken by url for determinism) and
    space them ``delay_sec`` apart — the frontier-scheduling step
    between :func:`parse_sitemap`/:func:`web_graph` discovery and the
    fetcher fleet. With no priority column, URL order is used.

    Adds (slot, fetch_offset_sec): slot = the URL's 0-based position
    in its domain's queue, fetch_offset_sec = slot * delay_sec — a
    fetcher that starts each domain's queue at t0 and honors the
    offsets never hits one host faster than the delay, regardless of
    how many domains it crawls in parallel.

    Scale shape: ONE window keyed by domain (the shuffle carries
    (domain, url, priority) rows); per-domain queues are independent,
    so skewed domains cost only their own partition's sort."""
    order = (
        [F.col(priority_col).desc(), F.col(url_col).asc()]
        if priority_col is not None
        else [F.col(url_col).asc()]
    )
    w = Window.partitionBy(domain_col).orderBy(*order)
    slot = (F.row_number().over(w) - 1).cast("long")
    return df.withColumn("slot", slot).withColumn(
        "fetch_offset_sec",
        F.round(F.col("slot") * F.lit(float(delay_sec)), 6),
    )


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    max_urls_per_template: int | None = None,
) -> DataFrame:
    """Mine URL TEMPLATES per domain: collapse every digit run in the
    path to ``{n}`` and aggregate — the crawler-trap / infinite-space
    detector (calendar pages, paginated archives, session-id paths
    produce one template with unbounded instances; real content pages
    produce many templates with few instances each).

    Returns one row per (domain, template): n_urls, n_unique_paths,
    and ``explosive`` when ``max_urls_per_template`` is set and
    exceeded — the budget callers use to stop enqueueing a trap.

    Scale shape: the template is a scan-local projection; ONE
    aggregate keyed by (domain, template) whose shuffle carries
    hashed-size rows, never page content. Skewed templates (the trap
    itself) hit map-side combine first, so a million-URL calendar
    costs one group, not a hot partition."""
    dom = url_domain(F.col(url_col))
    path = url_path(F.col(url_col))
    template = F.regexp_replace(path, r"[0-9]+", "{n}")
    out = (
        df.select(
            dom.alias("domain"),
            template.alias("template"),
            path.alias("_path"),
        )
        .groupBy("domain", "template")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.count_distinct("_path").cast("long").alias("n_unique_paths"),
        )
    )
    if max_urls_per_template is not None:
        out = out.withColumn(
            "explosive", F.col("n_urls") > F.lit(int(max_urls_per_template))
        )
    return out

"""Web-crawl curation walkthrough with the round-11 operators:

    crawled HTML -> text extraction -> line-wise corrections ->
    cross-corpus boilerplate-line removal -> URL canonicalization +
    dedup -> script/encoding sanity -> unigram tokenizer train/encode

Each stage is a pure DataFrame transform from mofka_spark.operators —
the same calls work unchanged on a 1000-executor cluster; see
SCALING.md for each operator's shuffle budget.

Run:  PYTHONPATH=.. python web_extraction_pipeline.py
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mofka_spark.operators import text, webtext
from mofka_spark.session import get_spark


def main(spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")
    pages = [
        (1, "http://WWW.News.Example.COM:80/story/42/?utm_source=feed&id=7",
         "<html><head><title>Breaking story</title>"
         "<script>trackPageView();</script></head><body>"
         "<h1>Breaking story</h1>"
         "<p>The committee approved the measure on Tuesday.</p>"
         "<p>Officials expect the change to take effect next month.</p>"
         "<div>Subscribe to our newsletter today</div>"
         "<footer>All rights reserved.</footer></body></html>"),
        (2, "http://news.example.com/story/42?id=7",  # same page, other URL
         "<body><h1>Breaking story</h1>"
         "<p>The committee approved the measure on Tuesday.</p>"
         "<div>Subscribe to our newsletter today</div></body>"),
        (3, "https://Blog.Example.ORG/posts/9/",
         "<body><p>Baking bread at home is easier than it looks.</p>"
         "<p>3 / 12</p>"  # a counter line
         "<div>Subscribe to our newsletter today</div>"
         "<p>Start with a simple no-knead recipe.</p></body>"),
    ]
    crawl = spark.createDataFrame(pages, ["page_id", "url", "html"])

    # 1. HTML -> text: scan-local regexp chain, zero shuffles
    extracted = webtext.html_to_text(crawl)
    print("extracted:")
    for r in extracted.select("page_id", "text").collect():
        print(f"  {r.page_id}: {r.text!r}")

    # 2. line-wise corrections (RefinedWeb): counters/caps/boilerplate
    # lines drop; docs that lose too much drop entirely
    # (narrow phrase list here so the repeated newsletter banner is
    # left for the CROSS-corpus stage below to catch)
    cleaned = webtext.filter_lines(
        crawl.select("page_id", webtext.html_text_column(F.col("html")).alias("text")),
        id_col="page_id", max_removed_frac=0.8,
        phrases=["all rights reserved"],
    )
    print("after line filter:",
          sorted((r.id, r.n_kept, r.kept) for r in cleaned.collect()))

    # 3. cross-corpus boilerplate-line removal: the newsletter banner
    # appears in every page -> vanishes corpus-wide (ONE fp shuffle)
    docs = cleaned.filter("kept").select("id", F.col("clean_text").alias("text"))
    deboiled = webtext.dedup_lines_across_docs(docs, min_docs=3)
    print("after corpus line dedup:",
          sorted((r.id, r.n_kept) for r in deboiled.collect()))

    # 4. URL canonicalization + dedup: pages 1 and 2 collapse
    urls = webtext.dedup_urls(crawl, id_col="page_id", url_col="url")
    print("url dedup:",
          sorted((r.id, r.keeper_id, r.is_dup) for r in urls.collect()))
    keepers = deboiled.join(
        urls.filter(~F.col("is_dup")).select("id"), "id", "left_semi"
    ).select("id", F.col("clean_text").alias("text"))

    # 5. script/encoding sanity on the surviving corpus
    scripts = text.script_signals(keepers, id_col="id", text_col="text")
    print("script signals:",
          sorted((r.id, r.dominant_script, r.is_mixed) for r in scripts.collect()))

    # 6. tokenizer: train a small unigram inventory on the survivors
    # and encode them (ids are a property of the trained artifact)
    art = text.unigram_train(keepers, vocab_size=48, n_iters=1)
    enc = text.unigram_encode(keepers, art, id_col="id")
    counts = enc.groupBy("id").agg(F.count("*").alias("n_pieces"))
    print("encoded pieces/doc:",
          sorted((r.id, r.n_pieces) for r in counts.collect()))

    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    main()

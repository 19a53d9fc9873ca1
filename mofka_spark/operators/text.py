"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are Spark built-ins (JVM, codegen) — no UDFs —
so they survive 100 TB: a single scan, no shuffle, fully pushdown- and
prune-friendly. Each has a matching ANSI-SQL form for the DuckDB oracle
(see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tokenization: whitespace runs. EXPLICIT chars, not \s: Java's \s
# includes \x0b (vertical tab) while RE2's (the DuckDB oracle's
# regexp_split '\s+') does not — the one ASCII character the two
# engines disagree on. The explicit set IS RE2's \s, so tokenize
# semantics are engine-identical on any input, not just \x0b-free
# corpora. _WS_CHARS is THE whitespace definition for the whole
# engine — every Spark-side char class embeds it (dedup
# normalization, punctuation complements, the classifier scorer's
# \S) so the engines cannot drift one site at a time.
_WS_CHARS = " \t\n\f\r"
_WS = f"[{_WS_CHARS}]+"

# A tiny per-language stopword inventory for the n-gram/stopword
# language-ID heuristic. Deterministic, oracle-expressible.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count (BPE-ish regex splitting lives in
    token_count_bpe)."""
    col = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, _WS))
    )


def token_count_bpe(text: Column | str) -> Column:
    """Approximate BPE token count: word chars chunk ~4 chars/token,
    plus one per non-space punctuation. Pure arithmetic on regexp
    counts — deterministic and oracle-expressible."""
    col = F.col(text) if isinstance(text, str) else text
    n_word_chars = F.length(F.regexp_replace(col, r"[^A-Za-z0-9]", ""))
    n_punct = F.length(F.regexp_replace(col, f"[A-Za-z0-9{_WS_CHARS}]", ""))
    return (F.ceil(n_word_chars / F.lit(4.0)) + n_punct).cast("long")


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), _WS)


def _let(value: Column, body) -> Column:
    """Bind ``value`` once per row and pass it to ``body`` as a true
    runtime variable (a "let" expression via a 1-element transform).

    Rationale: a lambda body handed to a higher-order function inlines
    every outer Column expression it references, and codegen's
    subexpression elimination does not reach inside lambda functions —
    so ``transform(sequence(...), i -> f(big_expr, i))`` re-evaluates
    ``big_expr`` PER ELEMENT. Measured on word_ngrams at sf0.1: the
    inlined split(normalize(text)) made the gram projection O(len²)
    per doc — 4.09s for 5k docs vs 0.48s with the tokens bound once
    (8.5x). A lambda VARIABLE reference is O(1), so binding the big
    expression as the HOF input restores the linear cost."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _stopword_hits(col: Column, words: list[str]) -> Column:
    """Count tokens equal to any stopword. Token equality (not regex
    word-boundaries) so Java-regex vs RE2 \\b divergence can never make
    the oracle disagree."""
    toks = _tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(words))).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, tokens, mean token length,
    punctuation ratio, stopword ratio, all-caps ratio."""
    col = F.col(text_col)
    n_chars = F.length(col)
    n_tok = token_count(col)
    n_punct = F.length(F.regexp_replace(col, f"[A-Za-z0-9{_WS_CHARS}]", ""))
    n_upper = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    n_stop = _stopword_hits(col, LANG_STOPWORDS["en"])
    return df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_tok.alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 4).alias("mean_token_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_upper / F.greatest(n_alpha, F.lit(1)), 4).alias("caps_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
    )


def encoding_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encoding-noise signals per document — the cleanup filter a web
    crawl needs before any text stage: U+FFFD replacement characters
    (decode failures), C0/DEL control characters (binary contamination;
    tab/newline/CR excluded — they are legitimate layout), UTF-8-as-
    Latin-1 mojibake lead bytes (U+00C2/U+00C3, the 'Ã©'/'â€™' class
    of double-encoding artifacts), and the non-ASCII count (a
    legitimate-multilingual vs noise discriminator when read next to
    the others). Returns (id, n_chars, n_repl, n_ctrl, n_moji,
    n_nonascii, repl_ratio, ctrl_ratio, moji_ratio, nonascii_ratio);
    NULL text is dropped, empty text yields zero ratios.

    Counts are length-difference of a regexp_replace — exact integers
    on any engine whose regex understands the same char class (Java
    here, RE2 in the oracle: the classes are written in both syntaxes'
    common subset). Ratios are ROUND(count/chars, 6) with the
    signed-zero wrap.

    Scale shape: entirely scan-local (one projection, zero shuffles,
    zero UDFs) — composes as extra signals into blend_scores /
    classifier_filter thresholds."""
    col = F.col(text_col)
    n_chars = F.length(col)

    def _count(cls: str) -> Column:
        return (n_chars - F.length(F.regexp_replace(col, cls, ""))).cast(
            "long"
        )

    n_repl = _count("[\ufffd]")
    n_ctrl = _count("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")
    n_moji = _count("[\u00c2\u00c3]")
    n_nonascii = _count("[^\\x00-\\x7F]")

    def _ratio(cnt: Column) -> Column:
        return F.round(
            cnt.cast("double") / F.greatest(n_chars, F.lit(1)), 6
        ) + F.lit(0.0)

    return df.filter(col.isNotNull()).select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        n_repl.alias("n_repl"),
        n_ctrl.alias("n_ctrl"),
        n_moji.alias("n_moji"),
        n_nonascii.alias("n_nonascii"),
        _ratio(n_repl).alias("repl_ratio"),
        _ratio(n_ctrl).alias("ctrl_ratio"),
        _ratio(n_moji).alias("moji_ratio"),
        _ratio(n_nonascii).alias("nonascii_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language stopword
    token counts; 'und' (undetermined) when all are zero.

    Ties break by language code order (deterministic). One scan, no
    shuffle, no UDF."""
    col = F.col(text_col)
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        hits = _stopword_hits(col, LANG_STOPWORDS[lang])
        scores.append(F.struct(hits.alias("score"), F.lit(lang).alias("lang")))
    arr = F.array(*scores)
    best_score = F.array_max(F.transform(arr, lambda s: s["score"]))
    best_lang = F.when(best_score <= 0, F.lit("und")).otherwise(
        # first language (sorted code order) achieving the best score
        F.filter(arr, lambda s: s["score"] == best_score)[0]["lang"]
    )
    return df.withColumn("pred_lang", best_lang).withColumn(
        "lang_score", best_score.cast("long")
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    n: int = 1,
    top_k: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary / n-gram frequency table — the input to
    tokenizer training and frequency-based filtering.

    Returns (gram, n_total, n_docs) ordered by n_total desc with a
    deterministic gram tiebreak (stable under retries, so top_k is
    reproducible).

    Scale: explode -> one groupBy shuffle on the gram string. Partial
    aggregation collapses each map partition's repeats before the
    exchange, so shuffled volume is the per-partition DISTINCT gram
    set — on natural-language corpora a tiny fraction of the token
    stream (Zipf). top_k adds one total-order exchange over the
    already-aggregated table; min_count prunes the tail before it."""
    from mofka_spark.operators.dedup import word_ngrams

    # one n-gram projection, one explode; per-doc occurrence counts
    # collapse map-side (partial agg on (gram, doc)), then the gram
    # rollup derives n_total = sum of per-doc counts and n_docs = row
    # count — no second scan, no join
    # two explode branches sharing one scan: n_total from the full gram
    # stream, n_docs from the per-doc-distinct stream. Each branch's
    # partial agg collapses map partitions to their distinct-gram set
    # before the exchange, so both shuffles carry ~|vocab per
    # partition|, not the token stream. Measured best of three shapes
    # at sf0.1: a single (gram, doc)-keyed shuffle defeats partial agg
    # (per-doc repeats are rare → the key adds doc cardinality for
    # nothing), and a sorted-zip first-occurrence flag re-evaluates the
    # n-gram transform 3x (no CSE across array expressions).
    # _spread: both explode branches tokenize pre-shuffle; a narrow
    # scan would run that CPU stage on as many tasks as parquet splits
    from mofka_spark.operators.dedup import _spread

    df = _spread(df, text_col)
    totals = (
        df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_total"))
    )
    docs = (
        df.select(
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
    )
    out = (
        totals.join(docs, "gram")
        .filter(F.col("n_total") >= min_count)
        .orderBy(F.desc("n_total"), F.asc("gram"))
    )
    if top_k is not None:
        out = out.limit(top_k)
    return out


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int = 1024,
    min_count: int = 1,
) -> DataFrame:
    """Frequency vocabulary with dense, deterministic token ids — the
    tokenizer-model half of the text -> training-tensor bridge
    (vocab_stats ranks grams; this assigns the ids encode_ids maps
    with). Token id 0 is RESERVED for OOV/unk; real tokens take ids
    1..max_vocab in (count desc, token asc) order — reproducible
    under retries and across engines. Returns (token, token_id,
    n_total).

    Scale shape: one token partial-agg shuffle (the per-partition
    DISTINCT token set moves, not the stream — Zipf); the top-k is
    orderBy+limit, which Spark plans as TakeOrderedAndProject
    (per-partition heaps, NO full sort); id assignment is one window
    over <= max_vocab rows."""
    if max_vocab <= 0:
        raise ValueError("build_vocab: max_vocab must be positive")
    from mofka_spark.operators.dedup import _spread

    counts = (
        _spread(df.filter(F.col(text_col).isNotNull()), text_col)
        .select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n_total"))
        .filter(F.col("n_total") >= min_count)
    )
    top = counts.orderBy(F.desc("n_total"), F.asc("token")).limit(max_vocab)
    w = Window.orderBy(F.desc("n_total"), F.asc("token"))
    return top.select(
        "token",
        F.row_number().over(w).cast("int").alias("token_id"),
        "n_total",
    )


def encode_ids(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int = 0,
) -> DataFrame:
    """Encode documents to token-id sequences against a build_vocab
    table: (id, pos, token_id) scalar rows in document order, OOV
    tokens mapped to ``unk_id`` — the long format that streams
    straight into pack_sequences / shard writers (and reassembles to
    array<int> with one sort_array(collect_list) when a loader wants
    per-doc tensors).

    Scale shape: the token stream explodes scan-locally and the vocab
    (<= max_vocab rows) BROADCASTS onto it — the corpus never
    shuffles; positions come from the explode itself."""
    from mofka_spark.operators.dedup import _spread

    toks = (
        _spread(df.filter(F.col(text_col).isNotNull()), id_col)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(_tokens(F.col(text_col))).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
    )
    return toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        "id",
        F.col("pos").cast("long").alias("pos"),
        F.coalesce(F.col("token_id"), F.lit(int(unk_id)))
        .cast("int")
        .alias("token_id"),
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Training-data decontamination: flag docs sharing any word n-gram
    with an evaluation set (the standard n-gram-overlap contamination
    test used when preparing LLM training corpora).

    Returns (id, n_hits, contaminated) for every doc in ``df`` —
    n_hits = number of DISTINCT eval n-grams the doc contains.

    Scale: the eval set's distinct n-gram table is small (benchmarks
    are MBs, corpora are TBs) — it broadcasts, so the corpus side is a
    single scan + broadcast join with NO corpus shuffle until the
    per-doc count agg (which carries only matching (doc, gram) rows,
    a tiny fraction of the corpus)."""
    from mofka_spark.operators.dedup import word_ngrams

    eval_text = eval_text_col or text_col
    eval_grams = (
        eval_df.select(
            F.explode(F.array_distinct(word_ngrams(F.col(eval_text), n))).alias(
                "gram"
            )
        )
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash scheme of
    Schleimer/Wilkerson/Aiken's MOSS): hash every char k-shingle, then
    keep the minimum hash of each sliding window of ``window``
    consecutive shingle hashes. The distinct mins are the doc's
    fingerprint set — robust to local edits (an edit perturbs only the
    windows it overlaps), and two docs sharing a passage of length >=
    k + window - 1 are guaranteed to share a fingerprint.

    Returns (id, fingerprint) exploded — join on fingerprint to find
    overlapping-passage pairs, or aggregate per id for a compact
    signature.

    All Column expressions, one scan, no shuffle before the caller's
    use. Hash = 60-bit md5 prefix (engine-portable, oracle-checkable;
    same construction as dedup's portable gram hash).

    The shingle-hash array is materialized ONCE per document through an
    ``explode(array(...))`` Generate barrier before the window mins are
    taken. Without the barrier, CollapseProject inlines the md5
    transform into every window's ``slice()`` and Catalyst re-evaluates
    the whole hash array per window (HOF lambdas get no subexpression
    elimination) — O(chars^2) md5 work per document instead of
    O(chars)."""
    from mofka_spark.operators.dedup import _spread, shingles

    grams = shingles(F.col(text_col), k)
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    )
    # Generate barrier: exactly one output row per doc, hash array
    # evaluated a single time and bound as a plain attribute below.
    # _spread first: a narrow scan (one small parquet file) would run
    # the whole CPU-bound md5 stage on one task.
    hs = _spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.array(hashes)).alias("_hs"),
    )
    h = F.col("_hs")
    nwin = F.greatest(F.size(h) - F.lit(window - 1), F.lit(1))
    # window min as `window` O(1) lookups (try_element_at past the end
    # is null and least() skips nulls — only reachable in the short
    # n < window case) instead of array_min(slice(...)), which
    # allocates a subarray per window position
    wins = F.transform(
        F.sequence(F.lit(1), nwin),
        lambda i: F.least(
            *[F.try_element_at(h, i + j) for j in range(window)]
        ),
    )
    return hs.select(
        "id",
        F.explode(F.array_distinct(wins)).alias("fingerprint"),
    )


def fingerprint(text: Column | str, k: int = 8) -> Column:
    """Document fingerprint: md5 of the lowercased,
    whitespace-normalized text (content-defined identity; md5 matches
    across Spark and DuckDB so it stays oracle-checkable). For rolling
    / winnowed fingerprints see dedup.shingles."""
    col = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(col)), _WS, " ")
    return F.md5(normalized)


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e.
    the max occurrence count of any element. A single aggregate() fold
    over the array: no shuffle, no explode. The accumulator is a
    (prev, run, best) struct; the fold reads only lambda variables and
    the already-evaluated input array, so nothing re-evaluates per
    element (see winnow_fingerprints for the anti-pattern)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, zero, merge, lambda acc: acc["best"])


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals, per document:

    - ``n_tokens``: whitespace token count
    - ``distinct_ratio``: distinct tokens / tokens (low → repetitive)
    - ``top_unigram_frac``: occurrences of the most frequent token /
      tokens (the "fraction of the doc that is one word" signal)
    - ``top_bigram_frac``: occurrences of the most frequent word
      bigram / bigram count

    Used to drop boilerplate/spam before training (Gopher's repetition
    filters, re-expressed over whitespace tokens). One scan, ZERO
    shuffle: each top-fraction is a sorted-array run fold (max
    occurrence count = longest equal-run in the sorted gram array),
    not an explode + groupBy.

    Reference substrate: the quality_features family
    (/root/reference has no text analytics; this extends the engine's
    LLM-pipeline surface)."""
    from mofka_spark.operators.dedup import word_ngrams

    toks = _tokens(F.col(text_col))
    bigrams = word_ngrams(F.col(text_col), 2)
    # Generate barrier: tokenize + sort ONCE per row; the two folds
    # below then read bound attributes (projection collapse would
    # otherwise inline the sorts into every fold step)
    base = _nonnull_spread(df, id_col, text_col).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(F.struct(
                F.array_sort(toks).alias("toks"),
                F.array_sort(bigrams).alias("bigrams"),
            ))
        ).alias("_g"),
    )
    stoks = F.col("_g.toks")
    sbigrams = F.col("_g.bigrams")
    n_tok = F.size(stoks)
    n_big = F.size(sbigrams)
    return base.select(
        "id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(F.size(F.array_distinct(stoks)) / F.greatest(n_tok, F.lit(1)), 6)
        .alias("distinct_ratio"),
        F.round(_max_run(stoks) / F.greatest(n_tok, F.lit(1)), 6)
        .alias("top_unigram_frac"),
        F.round(_max_run(sbigrams) / F.greatest(n_big, F.lit(1)), 6)
        .alias("top_bigram_frac"),
    )


def _nonnull_spread(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from mofka_spark.operators.dedup import _spread

    return _spread(df.filter(F.col(text_col).isNotNull()), id_col)


# PII patterns restricted to the Java-regex ∩ RE2 dialect (no
# lookaround, no backrefs) so Spark and the DuckDB oracle agree
# byte-for-byte.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{7,15}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_scan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    redact: bool = True,
) -> DataFrame:
    """PII detection / redaction for training-data preparation:
    per-document match counts for email / phone (+international) /
    IPv4 patterns, plus the redacted text (each match replaced by
    ``<EMAIL>`` / ``<PHONE>`` / ``<IP>``).

    Pure regexp built-ins — one scan, no shuffle, no UDF. Redaction
    order is email → phone → ip (fixed, so the composition is
    deterministic and the oracle replays it).

    Returns (id, n_emails, n_phones, n_ipv4, n_pii, redacted) —
    ``redacted`` omitted when redact=False."""
    col = F.col(text_col)
    # group index 0 = the whole match (patterns carry no capture groups)
    n_emails = F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS["email"]), 0))
    n_phones = F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS["phone"]), 0))
    n_ipv4 = F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS["ipv4"]), 0))
    red = F.regexp_replace(col, PII_PATTERNS["email"], "<EMAIL>")
    red = F.regexp_replace(red, PII_PATTERNS["phone"], "<PHONE>")
    red = F.regexp_replace(red, PII_PATTERNS["ipv4"], "<IP>")
    cols = [
        F.col(id_col).alias("id"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_ipv4.cast("long").alias("n_ipv4"),
        (n_emails + n_phones + n_ipv4).cast("long").alias("n_pii"),
    ]
    if redact:
        cols.append(red.alias("redacted"))
    return df.select(*cols)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping fixed-size token chunks — the
    standard training-data prep step before packing sequences into
    context windows. Chunk i covers tokens [i*stride, i*stride +
    chunk_tokens); the last chunk may be short; a doc shorter than one
    chunk yields exactly one chunk.

    Returns (id, chunk_id, n_chunk_tokens, chunk) exploded rows.

    One scan, no shuffle: tokenization happens once per document
    behind a Generate barrier, then each chunk is a slice + join of
    the bound token array."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = _tokens(F.col(text_col))
    base = _nonnull_spread(df, id_col, text_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.array(toks)).alias("_toks"),
    )
    t = F.col("_toks")
    n = F.size(t)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(t, i * stride + 1, chunk_tokens).alias("ctoks"),
        ),
    )
    c = F.explode(chunks).alias("c")
    return base.select("id", c).select(
        "id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.ctoks").cast("long").alias("n_chunk_tokens"),
        F.array_join("c.ctoks", " ").alias("chunk"),
    )


def lm_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram language-model scoring: train MLE token probabilities
    on the corpus itself, then score each document by its mean token
    log-probability (a perplexity-proxy quality signal — boilerplate
    and natural text separate cleanly; gibberish scores low).

    Returns (id, n_tokens, avg_logp), avg_logp rounded to 6dp.

    Scale shape: token counts are one explode + groupBy shuffle with
    map-side partial agg (shuffled volume ≈ per-partition distinct
    vocabulary, Zipf-small); the trained table is broadcast back onto
    the exploded token stream, so the per-doc aggregation is the only
    other shuffle (keyed by id). The corpus is scanned twice (train +
    score) — unavoidable without caching; both scans prune to
    (id, text)."""
    spread = _nonnull_spread(df, id_col, text_col)
    toks = spread.select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("n_total"))
    # ln p(tok) = ln c - ln N; broadcast both (vocab is Zipf-small)
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .select("id", (F.log("c") - F.log("n_total")).alias("logp"))
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("logp"), 6).alias("avg_logp"),
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a fixed term list —
    the classic lexical retrieval score (quality filtering, targeted
    corpus slicing, retrieval baselines next to the knn/LSH operators
    in similarity.py).

    Scale shape: for a query-sized term list the score needs NO
    explode and NO per-term shuffle. Per-doc term frequencies are
    size(filter(tokens)) projections; the corpus statistics
    (N, avgdl, per-term document frequencies) reduce to ONE scalar
    aggregate row that is broadcast back; scoring is then a pure map
    stage. Two corpus scans total (stats + score), both pruned to
    (id, text); shuffle volume is one row.

    Returns (id, n_terms, bm25) for documents matching >= 1 term,
    bm25 rounded to 6dp. Formula: for each term t,
    idf(t) = ln(1 + (N - df_t + 0.5)/(df_t + 0.5)),
    contribution = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    summed in ``terms`` order (the oracle mirrors the order so float
    summation agrees bit-for-bit)."""
    spread = _nonnull_spread(df, id_col, text_col)
    arr = _tokens(F.col(text_col))
    def _tf(term: str) -> Column:
        # NB: the filter lambda must take exactly ONE parameter — a
        # second parameter makes pyspark pass the element INDEX to it
        return F.size(F.filter(arr, lambda t: t == F.lit(term))).cast("double")

    tf_cols = [_tf(term).alias(f"tf_{i}") for i, term in enumerate(terms)]
    feats = spread.select(
        F.col(id_col).alias("id"),
        F.size(arr).cast("double").alias("dl"),
        *tf_cols,
    )
    stats = feats.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = feats.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    hits = F.lit(0).cast("long")
    for i in range(len(terms)):
        tf, dfreq = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        contrib = F.when(
            tf > 0, idf * (tf * F.lit(k1 + 1.0)) / denom
        ).otherwise(F.lit(0.0))
        score = score + contrib
        hits = hits + (tf > 0).cast("long")
    return (
        scored.select("id", hits.alias("n_terms"), F.round(score, 6).alias("bm25"))
        .filter(F.col("n_terms") > 0)
    )


def dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Cross-document repeated n-token spans — the exact-substring
    duplication signal of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), expressed over sliding word windows
    instead of a suffix array (which does not distribute): a window
    position is "duplicated" when its n-token span also occurs in at
    least one OTHER document.

    Returns (id, n_windows, n_dup_windows, dup_frac) for every doc —
    dup_frac is the standard pre-training filter signal (drop or trim
    docs whose text is mostly boilerplate shared with other docs).

    Scale shape: windows explode to ~tokens-per-doc rows, but each row
    carries only (id, 60-bit hash) — the shuffle key is the uniform
    hash, never the span text. Two aggregations over that frame (the
    cross-doc gram table, then the per-doc rollup) and one hash
    equi-join between them; nothing is ever all-pairs, and a
    boilerplate span shared by millions of docs costs one group, not a
    quadratic bucket. The gram frame is persisted across its two uses
    so the tokenize+hash scan runs once.

    Hash = 60-bit md5 prefix (engine-portable, oracle-checkable; same
    construction as dedup's portable gram hash). Collisions only
    overcount duplication: P(any collision) < docs*tokens^2 / 2^60 —
    negligible, and identical in any engine that computes md5.

    Exactness vs the suffix-array variant (Lee et al.): at a matched
    minimum repeat length of n tokens the two agree EXACTLY on which
    token positions lie in a cross-doc repeat (any repeat >= n
    contains an n-window through each of its positions, and any
    duplicated window is itself such a repeat) — measured on sf0.01:
    0 window-count mismatches, doc-flag recall/precision 1.0 at every
    threshold, Spearman 1.0 (SCALING.md "Round-13"). The remaining
    unit difference is that dup_frac counts WINDOWS, not covered
    tokens (mean gap 0.0005 there)."""
    from mofka_spark.operators.dedup import _spread, normalize_text

    spread = _spread(df.filter(F.col(text_col).isNotNull()), id_col)
    # Generate barrier: bind the token array as a plain attribute before
    # the per-window slices. HOF lambdas get no common-subexpression
    # elimination, so inlining split(normalize(text)) into every
    # window's slice() re-tokenizes the doc per window — O(tokens^2)
    # (the winnow_fingerprints materialization rule).
    toked = spread.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(F.split(normalize_text(F.col(text_col)), " "))
        ).alias("t"),
    )
    toks = F.col("t")
    nwin = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    windows = F.transform(
        F.sequence(F.lit(1), nwin),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    grams = toked.select(
        "id", F.explode(windows).alias("gram")
    ).select(
        "id",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    # localCheckpoint: reclaimed on GC, not a session-cache leak
    grams = grams.localCheckpoint(eager=True)
    cross_doc = (
        grams.groupBy("h")
        .agg(F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    dup_counts = (
        grams.join(cross_doc, "h", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_dup_windows"))
    )
    totals = grams.groupBy("id").agg(F.count("*").alias("n_windows"))
    return totals.join(dup_counts, "id", "left").select(
        "id",
        F.col("n_windows").cast("long").alias("n_windows"),
        F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
        F.round(
            F.coalesce("n_dup_windows", F.lit(0)) / F.col("n_windows"), 6
        ).alias("dup_frac"),
    )


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Composite document-quality filter in the style of Gopher's
    repetition-free quality rules (Rae et al. 2021): word-count bounds,
    mean word length in a human-language band, symbol-to-word ratio,
    fraction of purely alphabetic words, and a minimum number of
    stopword occurrences. Rules whose inputs these synthetic docs
    cannot exercise (bullet-/ellipsis-line fractions need multi-line
    docs) are omitted rather than trivially true.

    Returns (id, n_words, mean_word_len, symbol_ratio, alpha_frac,
    n_stop_hits, pass_quality) — one scan, pure Column expressions,
    no shuffle, no UDF; at 100 TB this is a free rider on any
    existing pass over the corpus.

    Every feature is computed on token-equality / character-count
    primitives that evaluate identically in any engine (no
    locale-dependent regex classes), so the whole filter is
    oracle-checkable."""
    from mofka_spark.operators.dedup import normalize_text

    col = F.col(text_col)
    toks = F.split(normalize_text(col), " ")
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_len = F.round(sum_len / F.greatest(n_words, F.lit(1)), 4)
    n_hash = F.length(col) - F.length(F.replace(col, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(col) - F.length(F.replace(col, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.round(
        (n_hash + n_ellipsis) / F.greatest(n_words, F.lit(1)), 4
    )
    n_alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("^[a-z]+$"))
    ).cast("long")
    alpha_frac = F.round(n_alpha_words / F.greatest(n_words, F.lit(1)), 4)
    n_stop = _stopword_hits(col, LANG_STOPWORDS["en"])
    passed = (
        n_words.between(min_words, max_words)
        & mean_len.between(min_mean_word_len, max_mean_word_len)
        & (symbol_ratio < max_symbol_ratio)
        & (alpha_frac > min_alpha_frac)
        & (n_stop >= min_stop_hits)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stop_hits"),
        passed.alias("pass_quality"),
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Distributed inverted index: token -> (document frequency, sorted
    posting list), with df-bound pruning.

    The retrieval-side complement of bm25_scores: BM25 scores one query
    against every doc; the index is what a real retrieval system builds
    once and probes per query. Reference has no retrieval surface —
    this is part of the beyond-reference training-data toolkit
    (SURVEY.md §2.8).

    Scale shape: ONE shuffle on token. distinct (token, doc) pairs come
    out of the scan map-side (explode + distinct partial-aggregates
    before the exchange); df counting and posting-list collection share
    the token-hash partitioning, so the second agg is shuffle-free.
    df bounds prune stopword tokens (whose posting lists at 100 TB
    would be corpus-sized skew keys) and hapaxes BEFORE collect_list
    materializes anything: the df filter runs on the counted frame and
    only surviving tokens' pairs are re-aggregated. Posting lists are
    doc-id arrays, sorted for deterministic output and delta-encodable
    downstream.
    """
    from mofka_spark.operators.dedup import _spread, normalize_text

    # (token, doc) pairs arrive globally distinct WITHOUT a shuffle:
    # doc rows are unique, and array_distinct dedupes within the doc
    # before the explode — the classic presence-list trick that removes
    # the (doc, token) distinct exchange entirely
    pairs = (
        _spread(df.filter(F.col(text_col).isNotNull()), id_col)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    n_docs = df.filter(F.col(text_col).isNotNull()).count()
    max_df = int(n_docs * max_df_ratio)
    # df bounds first: stats carries one row per token (tiny vs pairs);
    # the semi-join back onto pairs reuses the token partitioning
    stats = (
        pairs.groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    kept = pairs.join(stats, "token")
    return (
        kept.groupBy("token")
        .agg(
            F.first("df").alias("df"),
            F.sort_array(F.collect_list("doc")).alias("postings"),
        )
        .select("token", F.col("df").cast("long").alias("df"), "postings")
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 8,
) -> DataFrame:
    """Segment-level exact dedup with text reconstruction: split each
    doc into fixed-width word segments, keep only each distinct
    segment's FIRST occurrence corpus-wide (ordered by doc id, then
    position), and rebuild documents from their surviving segments.

    The fixed-width analog of RefinedWeb/CCNet paragraph dedup
    (documents here are single-paragraph, so position-based windows
    stand in for paragraph boundaries) — unlike dup_spans (which flags
    repeated spans), this REWRITES the corpus.

    Scale shape: two shuffles, both key-bounded — one on the segment
    hash (first-occurrence rank; hottest key's bucket = its duplicate
    count, handled by AQE skew split), one on doc id (reassembly).
    The segment text itself never shuffles: ranks travel with
    (seg_hash, doc, idx) and surviving segments rejoin the doc's local
    word array at rebuild.
    """
    from mofka_spark.operators.dedup import _spread, normalize_text

    words = _spread(df.filter(F.col(text_col).isNotNull()), id_col).select(
        F.col(id_col).alias("doc"),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    n_segs = F.ceil(F.size("w") / F.lit(seg_words)).cast("int")
    segs = words.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_segs - 1),
                lambda i: F.array_join(
                    F.slice("w", i * seg_words + 1, seg_words), " "
                ),
            )
        ).alias("seg_idx", "seg"),
    )
    w = Window.partitionBy("seg").orderBy("doc", "seg_idx")
    survivors = (
        segs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    rebuilt = survivors.groupBy("doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("kept_segments"),
    )
    base = df.select(
        F.col(id_col).alias("doc"),
        F.when(
            F.col(text_col).isNotNull(),
            F.ceil(
                F.size(F.split(normalize_text(F.col(text_col)), " "))
                / F.lit(seg_words)
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("total_segments"),
    )
    return (
        base.join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce(F.col("kept_segments"), F.lit(0)).cast("long").alias("kept_segments"),
            F.col("total_segments"),
        )
    )


def novelty_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word n-grams that NO earlier document (ascending id = ingest order)
    contains.

    The mixing-time complement of dedup: near-dups score ~0 without
    being dropped, boilerplate-heavy docs score low, fresh content
    scores ~1 — a ranking signal for dedup-aware sampling (pair with
    doc_sample/training_mix) rather than a hard filter.

    Scale shape: two shuffles — (gram -> min owner id) with map-side
    partial min, then (doc -> counts). The gram strings shuffle once;
    the ownership join reuses the gram-hash partitioning. Docs shorter
    than n words have one degenerate gram (word_ngrams pads to >= 1),
    so novelty is defined everywhere.
    """
    from mofka_spark.operators.dedup import _spread, word_ngrams

    grams = (
        _spread(df.filter(F.col(text_col).isNotNull()), id_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("g"),
        )
    )
    first = grams.groupBy("g").agg(F.min("id").alias("first_id"))
    per_doc = (
        grams.join(first, "g")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("first_id") == F.col("id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_grams",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
    )


def tfidf_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TF-IDF cosine retrieval: score every document against a fixed
    query-term list with FULL cosine normalization — unlike
    ``bm25_scores`` (whose per-doc statistics touch only the query
    terms), the document norm runs over the document's ENTIRE
    vocabulary, which is what forces the corpus-wide term frame this
    operator exists to exercise. Weighting is the smoothed sklearn
    variant: idf(t) = ln((1+N)/(1+df_t)) + 1, w = tf * idf.

    Scale shape (three bounded shuffles, fact text never shuffles):
      1. explode to (doc, token) and partial-agg tf — shuffle keys are
         (doc, token) pairs, values one long;
      2. document frequencies reduce the tf frame by token (Zipf-small
         vocabulary, map-side combine does most of the work);
      3. tf joins idf back on token and rolls up to one norm row per
         doc. Query-term idf rows (len(terms) of them) broadcast.
    Float determinism: the norm folds w^2 in token-sorted order and the
    numerator adds contributions in ``terms`` order, so the oracle can
    reproduce the sums bit-for-bit.

    Returns (id, n_terms, tfidf) for docs matching >= 1 query term.
    """
    from mofka_spark.operators.dedup import _spread

    spread = _spread(df.filter(F.col(text_col).isNotNull()), id_col)
    toks = spread.select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("id", "token").agg(
        F.count("*").cast("double").alias("tf")
    )
    n_docs = spread.agg(F.count("*").cast("double").alias("n_docs"))
    dfreq = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    idf = dfreq.join(F.broadcast(n_docs)).select(
        "token",
        (
            F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
            + F.lit(1.0)
        ).alias("idf"),
    )
    w = tf.join(idf, "token").select(
        "id", "token", (F.col("tf") * F.col("idf")).alias("w")
    )
    # token-sorted left fold => engine-independent summation order
    norms = (
        w.groupBy("id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("token", "w"))),
                F.lit(0.0),
                lambda acc, s: acc + s["w"] * s["w"],
            ).alias("norm_sq")
        )
        .select("id", F.sqrt("norm_sq").alias("doc_norm"))
    )
    q_idf = idf.filter(F.col("token").isin(list(dict.fromkeys(terms))))
    qn = q_idf.agg(
        F.sqrt(F.sum(F.col("idf") * F.col("idf"))).alias("q_norm")
    )
    matched = (
        w.join(F.broadcast(q_idf), "token")
        .groupBy("id")
        .pivot("token", list(dict.fromkeys(terms)))
        .agg(F.first(F.col("w") * F.col("idf")))
    )
    score = F.lit(0.0)
    hits = F.lit(0).cast("long")
    for t in dict.fromkeys(terms):
        c = F.col(f"`{t}`")
        score = score + F.coalesce(c, F.lit(0.0))
        hits = hits + c.isNotNull().cast("long")
    return (
        matched.join(norms, "id")
        .join(F.broadcast(qn))
        .select(
            "id",
            hits.alias("n_terms"),
            F.round(
                score / (F.col("doc_norm") * F.col("q_norm")), 6
            ).alias("tfidf"),
        )
        .filter(F.col("n_terms") > 0)
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    divisor: int = 8,
    min_words: int = 1,
) -> DataFrame:
    """Content-defined chunking: split each document at positions where
    the rolling hash of the last ``w`` words is 0 mod ``divisor`` — the
    boundary choice depends only on LOCAL content, so an edit moves at
    most the chunks it touches while every other chunk keeps its
    identity (the property fixed-size chunking lacks, and the basis of
    CDC dedup in storage systems and of paragraph-level corpus dedup).

    Expected chunk length ~= divisor words. Returns one row per chunk:
    (id, chunk_idx, n_words, chunk_hash) with chunk_hash = md5 of the
    space-joined words.

    Scale shape: pure Column work — boundary detection, slicing and
    hashing are array HOFs over the tokenized doc; ONE scan, no
    shuffle, output rows ~= total_words/divisor. The w-gram hash array
    materializes once per doc through the same Generate barrier as
    winnow_fingerprints (CollapseProject would otherwise re-evaluate
    the md5 transform per boundary probe)."""
    from mofka_spark.operators.dedup import _spread

    # _let binds the token array once per row: the per-position lambda
    # below slices it, and an inlined tokenize expression would re-run
    # split per position (O(len²) — see _let). The Generate barrier
    # (explode) then makes the struct a real attribute for the
    # downstream selects, as before.
    def _payload(tk: Column) -> Column:
        # gram ending at word i (1-based, i >= w): words [i-w+1 .. i]
        gh = F.transform(
            F.sequence(F.lit(1), F.size(tk)),
            lambda i: F.when(
                i >= w,
                F.conv(
                    F.substring(
                        F.md5(
                            F.array_join(F.slice(tk, i - F.lit(w - 1), w), " ")
                        ),
                        1, 15,
                    ),
                    16, 10,
                ).cast("long"),
            ),
        )
        return F.struct(tk.alias("t"), gh.alias("gh"))

    base = _spread(df.filter(F.col(text_col).isNotNull()), id_col).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(_let(_tokens(F.col(text_col)), _payload))
        ).alias("_d"),
    )
    t, gh = F.col("_d.t"), F.col("_d.gh")
    n = F.size(t)
    # boundary AFTER word i where hash % divisor == 0; doc end closes
    # the last chunk; chunks shorter than min_words are dropped
    cuts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == n)
        | ((F.try_element_at(gh, i) % divisor == 0) & (i < n)),
    )
    starts = F.concat(F.array(F.lit(0)), F.slice(cuts, 1, F.greatest(F.size(cuts) - 1, F.lit(0))))
    chunks = F.zip_with(
        starts,
        cuts,
        lambda s, e: F.struct(
            (e - s).alias("n_words"),
            F.md5(F.array_join(F.slice(t, s + 1, e - s), " ")).alias("chunk_hash"),
        ),
    )
    out = base.select(
        "id", F.posexplode(F.filter(chunks, lambda c: c["n_words"] >= min_words))
    )
    return out.select(
        F.col("id").alias(id_col),
        F.col("pos").cast("long").alias("chunk_idx"),
        F.col("col.n_words").cast("long").alias("n_words"),
        F.col("col.chunk_hash").alias("chunk_hash"),
    )


def cdc_dedup_stats(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    divisor: int = 8,
) -> DataFrame:
    """Chunk-level dedup accounting per corpus slice: how many CDC
    chunks each group carries, how many are distinct corpus-WIDE, and
    the share of a group's chunks that also appear elsewhere — the
    storage-dedup view of cross-source contamination.

    Scale shape: chunks (above, no shuffle) -> one partial-agg shuffle
    on chunk_hash for corpus-wide owner counts -> one rollup on the
    group key. Chunk text never shuffles (128-bit hashes only)."""
    chunks = cdc_chunks(df, id_col, text_col, w, divisor).join(
        df.select(F.col(id_col).alias("_id"), F.col(group_col).alias("grp")),
        F.col(id_col) == F.col("_id"),
    )
    owners = chunks.groupBy("chunk_hash").agg(
        F.countDistinct("grp").alias("n_groups")
    )
    return (
        chunks.join(owners, "chunk_hash")
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.countDistinct("chunk_hash").alias("n_distinct"),
            F.sum((F.col("n_groups") > 1).cast("long")).alias("n_shared"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_chunks",
            "n_distinct",
            F.round(F.col("n_shared") / F.col("n_chunks"), 6).alias(
                "shared_ratio"
            ),
        )
    )


def distinctive_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Per-group distinctive keywords by Dunning's log-likelihood ratio
    (G2): for each (group, token), compare the token's in-group count
    against its rest-of-corpus count under the null that the group uses
    it at the corpus-wide rate. The corpus-linguistics standard for
    "what vocabulary characterizes this source/domain" — robust where
    raw tf-idf over-rewards hapax terms.

    With a = in-group count, b = elsewhere count, c = group tokens,
    d = elsewhere tokens, N = c + d, expected e1 = c*t/N, e2 = d*t/N
    (t = a + b):  G2 = 2*(a*ln(a/e1) + b*ln(b/e2)), b-term 0 when b=0.
    Only OVER-represented terms are kept (a*N > t*c, exact integer
    comparison — no float boundary; counts must satisfy a*N < 2^63,
    true up to ~1e9-token groups in a ~1e9-document corpus; beyond
    that swap the guard to doubles).

    Returns (group, tok, n_in_group, g2, rnk), rnk 1..k per group by
    (round(g2, 6) DESC, tok ASC) — ranking on the rounded value so an
    external oracle's last-ulp differences cannot reorder.

    Scale shape: ONE token-level shuffle — the (group, token) count
    with map-side partial agg (volume ≈ per-partition distinct vocab
    per group, Zipf-small); token totals and group totals both derive
    from that counted frame (tiny), joined back broadcast; the rank
    window partitions over per-group vocabulary, never documents.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    # the counted frame feeds THREE derived aggregates (token totals,
    # group totals, the scored join) — persist it or the explode+count
    # runs once per consumer
    a_tbl = (
        toks.groupBy("grp", "tok")
        .agg(F.count("*").alias("a"))
        # localCheckpoint: reclaimed on GC, not a session-cache leak
        .localCheckpoint(eager=True)
    )
    t_tbl = a_tbl.groupBy("tok").agg(F.sum("a").alias("t"))
    c_tbl = a_tbl.groupBy("grp").agg(F.sum("a").alias("c"))
    n_tot = c_tbl.agg(F.sum("c").alias("n"))
    scored = (
        a_tbl.join(F.broadcast(t_tbl), "tok")
        .join(F.broadcast(c_tbl), "grp")
        .crossJoin(F.broadcast(n_tot))
        .withColumn("b", F.col("t") - F.col("a"))
        .withColumn("d", F.col("n") - F.col("c"))
        .withColumn("e1", F.col("c") * F.col("t") / F.col("n"))
        .withColumn("e2", F.col("d") * F.col("t") / F.col("n"))
        # overrepresentation guard in exact integer arithmetic
        .filter(F.col("a") * F.col("n") > F.col("t") * F.col("c"))
        .withColumn(
            "g2",
            F.round(
                2.0
                * (
                    F.col("a") * F.log(F.col("a") / F.col("e1"))
                    + F.when(
                        F.col("b") > 0,
                        F.col("b") * F.log(F.col("b") / F.col("e2")),
                    ).otherwise(F.lit(0.0))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("g2"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("grp").alias(group_col),
            "tok",
            F.col("a").cast("long").alias("n_in_group"),
            "g2",
            "rnk",
        )
    )


def cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    window: int = 5,
    min_count: int = 10,
    k: int = 50,
    id_col: str | None = None,
) -> DataFrame:
    """Pointwise mutual information over token co-occurrence within a
    sliding window — the corpus-linguistics collocation detector
    (PMI(x,y) = ln(p(x,y) / (p(x)p(y))) with p(x,y) from window
    co-occurrence counts, p(x) from unigram counts). High-PMI pairs are
    multiword expressions / templated phrases; curation uses them to
    spot boilerplate families and to build phrase vocabularies.

    Pairs are unordered (w1 < w2 lexicographically), self-pairs are
    excluded, pairs below ``min_count`` are dropped (PMI is unstable at
    small counts), and the top ``k`` by (round(pmi,6) DESC, w1, w2)
    are returned as (w1, w2, n_pair, pmi).

    Scale shape: each token replicates into its ``window`` forward
    offsets and pairs form by EQUI-join on (doc, position) — no range
    join, no per-doc cross product; volume = window x corpus tokens,
    linear. Pair counts and unigram counts both partial-agg map-side
    (Zipf-small); the totals are one-row broadcasts; ranking windows
    over the min_count-filtered pair vocabulary only.

    ``id_col`` names a stable per-document key (pass it whenever one
    exists — it is the scale path). Without one, the tokenized frame
    is pinned with ``localCheckpoint`` before the (doc, position)
    self-join: the fallback doc key is ``monotonically_increasing_id``
    whose values depend on partition layout, and letting both join
    sides recompute that expression through separate lineages (AQE
    re-plans, upstream shuffles) could silently pair tokens across
    different documents."""
    if id_col is not None:
        toks = (
            df.filter(F.col(text_col).isNotNull())
            .select(
                F.col(id_col).alias("_doc"),
                F.posexplode(_tokens(F.col(text_col))).alias("pos", "w"),
            )
            .filter(F.col("w") != "")
        )
    else:
        toks = (
            df.filter(F.col(text_col).isNotNull())
            .withColumn("_doc", F.monotonically_increasing_id())
            .select(
                "_doc", F.posexplode(_tokens(F.col(text_col))).alias("pos", "w")
            )
            .filter(F.col("w") != "")
            .localCheckpoint(eager=True)
        )
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    n_tok = uni.agg(F.sum("c").alias("n"))
    right = toks.select("_doc", F.col("pos").alias("pos2"), F.col("w").alias("wb"))
    pairs = (
        toks.select(
            "_doc",
            F.col("w").alias("wa"),
            F.explode(
                F.sequence(F.col("pos") + 1, F.col("pos") + window)
            ).alias("pos2"),
        )
        .join(right, ["_doc", "pos2"])
        .filter(F.col("wa") != F.col("wb"))
        .select(
            F.least("wa", "wb").alias("w1"),
            F.greatest("wa", "wb").alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        # feeds the pair total AND the scored join; localCheckpoint
        # (not persist) so the blocks are reclaimed when the frame is
        # GC'd rather than leaking into the session cache
        .localCheckpoint(eager=True)
    )
    # p(x,y) denominator = ALL window pairs, counted pre-filter
    n_pairs = pairs.agg(F.sum("n_pair").alias("p")).collect()[0][0]
    pairs = pairs.filter(F.col("n_pair") >= min_count)
    scored = (
        pairs.join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(n_tok))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_pair") / F.lit(float(n_pairs)))
                    / (
                        (F.col("c1") / F.col("n"))
                        * (F.col("c2") / F.col("n"))
                    )
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("w1", "w2", F.col("n_pair").cast("long").alias("n_pair"), "pmi", "rnk")
    )


def readability_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    quality signal (higher = easier; English-calibrated, useful as a
    relative ranking feature in any Latin-script corpus):

        206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    with deterministic, oracle-expressible proxies: sentences = runs
    of [.!?] (min 1), syllables = vowel-group runs [aeiouy]+ in the
    lowercased text, floored at one per word (vowel runs never cross
    whitespace, so the per-text count equals the per-word sum).

    Returns (id, n_words, n_sentences, n_syllables, flesch) for
    non-empty docs, flesch rounded to 4dp.

    Scale shape: pure regexp built-ins over one scan — no explode, no
    shuffle, no UDF; the same single-pass family as quality_features.
    """
    col = F.col(text_col)
    words = token_count(col)
    sentences = F.greatest(F.regexp_count(col, F.lit(r"[.!?]+")), F.lit(1))
    syllables = F.greatest(
        F.regexp_count(F.lower(col), F.lit(r"[aeiouy]+")), words
    )
    return (
        df.filter(col.isNotNull() & (F.trim(col) != ""))
        .select(
            F.col(id_col).alias("id"),
            words.cast("long").alias("n_words"),
            sentences.cast("long").alias("n_sentences"),
            syllables.cast("long").alias("n_syllables"),
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (words / sentences)
                - F.lit(84.6) * (syllables / words),
                4,
            ).alias("flesch"),
        )
    )


def corpus_overlap(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Pairwise stratum overlap matrix over distinct word n-grams — the
    cross-domain contamination / redundancy audit a corpus curator runs
    before mixing sources: which domain pairs share boilerplate, which
    "new" source is mostly contained in one already ingested, where a
    dedup pass should focus. Per stratum pair:

        jaccard     = |A ∩ B| / |A ∪ B|
        containment = |A ∩ B| / min(|A|, |B|)

    over the strata's distinct n-gram sets. Returns (src_a, src_b,
    n_common, n_a, n_b, jaccard, containment) for pairs sharing >= 1
    gram, src_a < src_b, ratios rounded to 6dp.

    Scale shape: gram text never shuffles — grams reduce to 60-bit md5
    keys scan-side (engine-portable, same trick as dup_spans), then ONE
    (stratum, gram)-distinct exchange and ONE gram-keyed aggregate.
    Each gram's stratum set is bounded by the stratum count S (tens,
    not corpus-sized), so the pair explode is O(distinct grams x S^2)
    worst case and the final matrix is O(S^2) rows. Set sizes join
    back broadcast.
    """
    from mofka_spark.operators.dedup import _spread, word_ngrams

    grams = (
        _spread(df.filter(F.col(text_col).isNotNull()), strata_col)
        .select(
            F.col(strata_col).alias("s"),
            F.explode(
                F.array_distinct(word_ngrams(F.col(text_col), n))
            ).alias("gram"),
        )
        .select(
            "s",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("g"),
        )
        .distinct()
    )
    sizes = grams.groupBy("s").agg(F.count("*").alias("n"))
    per_gram = (
        grams.groupBy("g")
        .agg(F.sort_array(F.collect_set("s")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    pairs = (
        per_gram.select(F.explode("ss").alias("a"), "ss")
        .select("a", F.explode("ss").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("s").alias("a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("s").alias("b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .select(
            F.col("a").alias("src_a"),
            F.col("b").alias("src_b"),
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("n_common") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model scoring: train add-one-smoothed bigram
    conditional probabilities on the corpus itself, then score each
    document by its mean bigram log-probability — the next rung above
    lm_score's unigram signal (order sensitivity catches shuffled /
    templated / gibberish text that unigram frequencies cannot).

        P(w | v) = (c(v, w) + 1) / (c(v, ·) + V)

    with c(v, ·) = occurrences of v as a left context and V = distinct
    unigram vocabulary (Laplace smoothing keeps every observed bigram's
    probability finite and the training set self-scoring exact).

    Returns (id, n_bigrams, avg_logp) for docs with >= 2 tokens,
    avg_logp rounded to 6dp.

    Scale shape: bigram pairs come out of each doc's own token array
    (arrays_zip of the two shifted slices — scan-local, NO join on
    (doc, position)); counts partial-agg map-side on the (v, w) key
    (bigram vocab is Zipf-small relative to the pair stream); the
    trained tables broadcast back onto the pair stream, so the per-doc
    aggregation is the only other shuffle. Two corpus scans (train +
    score), both pruned to (id, text)."""
    from mofka_spark.operators.dedup import _spread

    spread = _spread(
        df.filter(F.col(text_col).isNotNull()), id_col
    )
    arr = _tokens(F.col(text_col))
    n = F.size(arr)
    pairs_arr = F.arrays_zip(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))).alias("v"),
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))).alias("w"),
    )
    grams = spread.filter(n >= 2).select(
        F.col(id_col).alias("id"), F.explode(pairs_arr).alias("p")
    ).select("id", F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    big = grams.groupBy("v", "w").agg(F.count("*").alias("cvw"))
    ctx = big.groupBy("v").agg(F.sum("cvw").alias("cv"))
    # V counts the full unigram vocabulary (every token position, not
    # just left contexts) — the smoothing denominator's event space
    vocab = (
        spread.select(F.explode(arr).alias("tok"))
        .agg(F.count_distinct("tok").alias("vsz"))
    )
    scored = (
        grams.join(F.broadcast(big), ["v", "w"])
        .join(F.broadcast(ctx), "v")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            (
                F.log(F.col("cvw") + 1) - F.log(F.col("cv") + F.col("vsz"))
            ).alias("logp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("logp"), 6).alias("avg_logp"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution plus the
    type-token ratio — the lexical-diversity quality signals next to
    repetition_signals' top-gram fractions (low entropy = repetitive /
    templated / keyword-stuffed text; high TTR on long docs = unusual
    vocabulary churn).

        entropy = -Σ_t (c_t / n) ln(c_t / n)    over distinct tokens t
        ttr     = n_types / n_tokens

    Returns (id, n_tokens, n_types, entropy, ttr), rounded to 6dp.

    Scale shape: everything folds inside each doc's own token array
    (distinct -> per-type count via array filter, O(types x len) per
    doc, the same in-array fold as the inverted-index tf path) — one
    scan, NO explode, NO shuffle, no UDF. The entropy fold runs over
    the SORTED type list so an external engine reproduces the
    identical IEEE double (same ordered-fold trick as
    temperature_mix)."""
    col = F.col(text_col)
    arr = _tokens(col)
    n = F.size(arr).cast("double")

    # _let twice: the token array binds once per row (the inlined
    # tokenize would re-run per TYPE inside the fold lambda — O(len²),
    # see _let), and each type's p binds once per fold step (it is
    # used twice in p*ln(p)). Pure evaluation-count changes: the
    # folded IEEE doubles are bit-identical.
    def _ent(a: Column) -> Column:
        an = F.size(a).cast("double")

        def _p(t):
            return F.size(F.filter(a, lambda x: x == t)) / an

        return -F.aggregate(
            F.sort_array(F.array_distinct(a)),
            F.lit(0.0),
            lambda acc, t: acc + _let(_p(t), lambda p: p * F.log(p)),
        )

    ent = _let(arr, _ent)
    return df.filter(col.isNotNull()).select(
        F.col(id_col).alias("id"),
        F.size(arr).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(arr)).cast("long").alias("n_types"),
        F.round(ent, 6).alias("entropy"),
        F.round(F.size(F.array_distinct(arr)) / n, 6).alias("ttr"),
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_col: str = "token",
) -> DataFrame:
    """Out-of-vocabulary rate per document against a reference
    vocabulary — the corpus-vs-tokenizer fit check run before training
    (high OOV = the tokenizer will shred this text into bytes) and a
    cheap domain-shift signal against any fixed lexicon.

    ``vocab`` is a one-column DataFrame of in-vocabulary tokens
    (derive one with vocab_stats, or load the tokenizer's). Returns
    (id, n_tokens, n_oov, oov_rate) over token OCCURRENCES (not
    types), oov_rate rounded to 6dp; empty docs are excluded.

    Scale shape: tokens explode once and LEFT-join the broadcast
    vocabulary (vocabularies are MBs, corpora are TBs), so the corpus
    never shuffles for the lookup; the only exchange is the per-doc
    rollup keyed on id."""
    toks = (
        df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(
            F.col(id_col).alias("id"),
            F.explode(_tokens(F.col(text_col))).alias("tok"),
        )
    )
    v = vocab.select(
        F.col(vocab_col).alias("tok"), F.lit(True).alias("_in_vocab")
    ).distinct()
    return (
        toks.join(F.broadcast(v), "tok", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.col("_in_vocab").isNull().cast("long"))
            .cast("long")
            .alias("n_oov"),
            F.round(
                F.avg(F.col("_in_vocab").isNull().cast("double")), 6
            ).alias("oov_rate"),
        )
    )


def fuzzy_decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy eval-set decontamination: flag training docs NEAR-duplicate
    to any evaluation document by word n-gram Jaccard — the rewrite-
    robust complement to decontaminate()'s exact 8-gram overlap test
    (paraphrased or lightly-edited benchmark text shares almost no
    exact 8-grams but keeps high 3-gram Jaccard).

    Two docs are compared only if MinHash LSH blocks them together
    (bands=32 of r=2 rows: P[candidate] = 1-(1-J^2)^bands ~ 0.9999 at
    J=0.5), then the exact Jaccard filter >= threshold decides. Returns
    one row per corpus doc: (id, n_matches, max_jaccard, contaminated).

    Scale shape: the eval side's band rows and gram arrays BROADCAST
    (benchmarks are MBs, corpora are TBs) — the corpus is never
    shuffled against the eval set; the only corpus shuffles are the
    minhash signature agg and the final per-doc rollup, which carries
    only candidate rows. Never all-pairs: the verify join sees LSH
    candidates only.

    Reference parity: complements decontaminate (SURVEY §2.8); the
    blocking machinery is dedup.minhash_band_rows."""
    from mofka_spark.operators.dedup import minhash_band_rows, word_ngrams

    eid = eval_id_col or id_col
    etext = eval_text_col or text_col
    corpus_bands = minhash_band_rows(
        df, id_col, text_col, num_hashes, bands, shingle_k, "word"
    )
    eval_bands = minhash_band_rows(
        eval_df, eid, etext, num_hashes, bands, shingle_k, "word"
    ).withColumnRenamed("id", "eval_id")
    cand = (
        corpus_bands.join(
            F.broadcast(eval_bands), ["band_id", "band_hash"]
        )
        .select("id", "eval_id")
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams(F.col(text_col), shingle_k)).alias("gs"),
    )
    eval_grams = eval_df.select(
        F.col(eid).alias("eval_id"),
        F.array_distinct(word_ngrams(F.col(etext), shingle_k)).alias("egs"),
    )
    inter = F.size(F.array_intersect(F.col("gs"), F.col("egs")))
    jac = F.round(
        inter.cast("double")
        / F.greatest(
            F.size("gs") + F.size("egs") - inter, F.lit(1)
        ),
        6,
    )
    verified = (
        cand.join(doc_grams, "id")
        .join(F.broadcast(eval_grams), "eval_id")
        .select("id", "eval_id", jac.alias("j"))
        .filter(F.col("j") >= threshold)
    )
    hits = verified.groupBy("id").agg(
        F.count("*").cast("long").alias("n_matches"),
        F.max("j").alias("max_jaccard"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            F.round(F.coalesce("max_jaccard", F.lit(0.0)), 6).alias("max_jaccard"),
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("contaminated"),
        )
    )


#: Literal-fold ceiling for term/rule sets (see
#: webtext.LITERAL_FOLD_MAX — same discipline): above this, the set
#: broadcasts as a table instead of folding into the plan.
LITERAL_FOLD_MAX = 10_000


def blocklist_scan(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_literal_entries: int = LITERAL_FOLD_MAX,
) -> DataFrame:
    """Term-blocklist filter signal: per-document occurrence counts of
    blocklisted tokens (the web-curation safety/NSFW wordlist stage —
    Dolma/C4-style). Token-exact matching on the whitespace tokenizer
    (no substring false positives: "class" never hits "ass").

    Returns (id, n_hits, flagged) for EVERY doc — the caller picks the
    policy (drop on flagged, or threshold on n_hits/len for the C4
    fraction rule).

    Scale shape, two regimes with identical results:

    - ``len(terms) <= max_literal_entries``: the term set folds as a
      literal array membership probe inside each doc's own token
      array — one scan, NO explode, NO shuffle.
    - larger (array_contains is a linear scan per token; a 1M-term
      literal also blows up the plan): tokens explode scan-local into
      a BroadcastHashJoin against the term table — the join FILTERS
      to hit tokens only, so the groupBy(id) shuffle carries just the
      (typically rare) hits, and the join back onto the corpus ids is
      id-keyed narrow rows; the document text itself never shuffles.

    ``id_col`` values must be unique (the corpus-id contract every
    dedup/scan operator here shares): with duplicate ids the two
    regimes diverge — the literal probe counts per ROW, while the
    broadcast regime's groupBy(id) sums hits across all rows sharing
    the id and joins that total back onto each of them. Deduplicate
    ids (or add a row uid) before calling on non-unique input.
    """
    uniq = sorted({t.lower() for t in terms})
    arr = _tokens(F.col(text_col))
    base = df.filter(F.col(text_col).isNotNull())
    if len(uniq) <= max_literal_entries:
        lst = F.array(*[F.lit(t) for t in uniq])
        hits = F.size(F.filter(arr, lambda t: F.array_contains(lst, t)))
        return base.select(
            F.col(id_col).alias("id"),
            hits.cast("long").alias("n_hits"),
            (hits > 0).alias("flagged"),
        )
    spark = df.sparkSession
    tdf = F.broadcast(
        spark.createDataFrame([(t,) for t in uniq], "_bl_term string")
    )
    ids = base.select(F.col(id_col).alias("id"), arr.alias("_bl_toks"))
    hit_counts = (
        ids.select("id", F.explode("_bl_toks").alias("_bl_tok"))
        .join(tdf, F.col("_bl_tok") == F.col("_bl_term"))
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        ids.select("id")
        .join(hit_counts, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("flagged"),
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum tokenizer fertility: BPE-ish tokens per whitespace
    word (and chars per BPE token) — the standard diagnostic for "does
    this tokenizer fragment language X?" when balancing a multilingual
    mix (high fertility = more compute per word = under-trained
    language at equal token budget).

    Returns (stratum, n_docs, n_words, n_bpe, fertility,
    chars_per_token) — fertility = n_bpe / n_words, chars_per_token =
    n_chars / n_bpe, both single divisions of exact integer sums
    rounded to 6dp (strata with zero words/tokens yield NULL rather
    than a division error).

    Scale shape: ONE stratum-keyed aggregate over per-row arithmetic
    counts; map-side combine collapses to O(#strata) rows."""
    t = F.col(text_col)
    words = F.when(t.isNotNull(), token_count(t).cast("long"))
    bpe = F.when(t.isNotNull(), token_count_bpe(t).cast("long"))
    chars = F.when(t.isNotNull(), F.length(t).cast("long"))
    agg = df.groupBy(strata_col).agg(
        F.count(text_col).cast("long").alias("n_docs"),
        F.sum(words).alias("n_words"),
        F.sum(bpe).alias("n_bpe"),
        F.sum(chars).alias("n_chars"),
    )
    return agg.select(
        strata_col,
        "n_docs",
        "n_words",
        "n_bpe",
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.col("n_bpe").cast("double") / F.col("n_words"),
            ),
            6,
        ).alias("fertility"),
        F.round(
            F.when(
                F.col("n_bpe") > 0,
                F.col("n_chars").cast("double") / F.col("n_bpe"),
            ),
            6,
        ).alias("chars_per_token"),
    )


def ngram_diversity(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-stratum n-gram diversity: distinct n-grams over total
    n-gram occurrences — the mode-collapse detector for synthetic /
    model-generated corpora (a generator stuck on templates repeats
    the same n-grams; diversity collapses long before per-document
    repetition_signals fire, because the repetition is ACROSS
    documents).

    Returns (stratum, n_total, n_distinct, diversity) with diversity
    = n_distinct / n_total rounded to 6dp (NULL for empty strata
    rather than a division error).

    Scale shape: explode -> ONE stratum-keyed aggregate;
    count_distinct runs as the standard two-phase expand under the
    same shuffle, and partial aggregation collapses each map
    partition's repeated grams first — shuffled volume is the
    per-partition distinct set (Zipf-bounded), not the token
    stream. A narrow scan (few parquet splits) is widened round-robin
    before the CPU-bound gram stage — keyless, because strata are few
    and a stratum-keyed spread would skew (measured 6x on a
    single-file corpus)."""
    from mofka_spark.operators.dedup import word_ngrams

    obs = df.filter(F.col(text_col).isNotNull())
    sc = obs.sparkSession.sparkContext
    if obs.rdd.getNumPartitions() < max(2, sc.defaultParallelism // 2):
        obs = obs.repartition(sc.defaultParallelism)
    grams = obs.select(
        strata_col, F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    )
    agg = grams.groupBy(strata_col).agg(
        F.count("*").cast("long").alias("n_total"),
        F.count_distinct("g").cast("long").alias("n_distinct"),
    )
    return agg.select(
        strata_col,
        "n_total",
        "n_distinct",
        F.round(
            F.when(
                F.col("n_total") > 0,
                F.col("n_distinct").cast("double") / F.col("n_total"),
            ),
            6,
        ).alias("diversity"),
    )


def zipf_fit(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    max_vocab: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Per-stratum Zipf fit: least-squares slope/intercept of
    ln(count) over ln(rank) across the stratum's unigram vocabulary —
    natural text sits near slope -1; templated or synthetic corpora
    bend the curve (flat head = vocabulary collapse, steep tail =
    boilerplate). The corpus-level companion to token_entropy's
    per-document diversity.

    Rank is count-desc with a token-asc tiebreak (deterministic).
    ``max_vocab`` fits only the top ranks (the usual practice — the
    rank-1 tail is noise) and bounds per-stratum state;
    ``min_count`` prunes hapax grams before ranking. Returns
    (stratum, vocab_size, slope, intercept) — slope/intercept rounded
    to 6dp, signed-zero normalized; strata with < 2 vocab rows have
    no defined fit and are dropped.

    Scale shape: one (stratum, gram) count with map-side combine
    (Zipf-bounded), one stratum-keyed window for ranks over VOCAB rows
    (not the token stream), then value_trend's exact discipline: the
    per-stratum fold runs over the rank-sorted array so the IEEE sums
    are reproducible by the oracle; per-stratum state is O(vocab),
    bounded by ``max_vocab``."""
    toks = df.filter(F.col(text_col).isNotNull()).select(
        strata_col, F.explode(_tokens(F.col(text_col))).alias("g")
    )
    vocab = (
        toks.groupBy(strata_col, "g")
        .agg(F.count("*").cast("long").alias("c"))
        .filter(F.col("c") >= min_count)
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("c").desc(), F.col("g").asc()
    )
    ranked = vocab.select(
        strata_col, "c", F.row_number().over(w).alias("r")
    )
    if max_vocab is not None:
        ranked = ranked.filter(F.col("r") <= int(max_vocab))
    pts = ranked.groupBy(strata_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("r"), F.col("c")))
        ).alias("_pts")
    )
    xs = F.transform("_pts", lambda p: F.log(p["r"].cast("double")))
    ys = F.transform("_pts", lambda p: F.log(p["c"].cast("double")))

    def _fold(a):
        return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v)

    sums = pts.select(
        strata_col,
        F.size("_pts").cast("long").alias("n"),
        _fold(xs).alias("sx"),
        _fold(ys).alias("sy"),
        _fold(F.zip_with(xs, xs, lambda a, b: a * b)).alias("sxx"),
        _fold(F.zip_with(xs, ys, lambda a, b: a * b)).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return sums.filter(denom > 0).select(
        strata_col,
        F.col("n").alias("vocab_size"),
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
            + F.lit(0.0)
        ).alias("intercept"),
    )


def hash_embed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    salt: str = "hembed",
) -> DataFrame:
    """Feature-hashing document embeddings (the hashing trick): each
    token adds +/-1 to the dimension its hash selects, so a document
    becomes a ``dim``-length signed bag-of-words projection — a
    deterministic, model-free vector that bridges the TEXT corpus into
    every vector operator (semantic_dedup, kmeans cells, pq codes,
    brute_force/ivf/lsh top-k take the output directly). Cosine over
    these vectors approximates token-multiset similarity; signs make
    collisions cancel in expectation (Weinberger et al.'s signed
    hashing).

    Both the dimension index and the sign derive from the engine-
    portable md5 kernel, and per-dimension values are INTEGER sums —
    the embedding is bit-reproducible by an external engine at any
    scale. Returns (id, embedding array<double>).

    Scale shape: explode -> ONE id-keyed shuffle. For dim <= 256 the
    per-dimension sums are ``dim`` conditional-sum agg columns in a
    single codegen'd HashAggregate (map-side combine carries dim longs
    per doc) — no collect_list, no object aggregation, no second
    shuffle; the round-9 profile showed the former per-doc
    map-from-entries assembly (an ObjectHashAggregate) was 80% of the
    sf1 wall (3.5s -> 1.7s after, curve 4.0x -> ~1.4x). Wider dims
    fall back to the sparse (id, dim-index) partial agg + in-row map
    assembly (bounded agg state beats thousand-column plans there).
    _spread first: a corpus arriving as one or two parquet splits
    would otherwise run the CPU-bound tokenize/hash explode on as many
    tasks (measured 6.6x on the 10x single-file sf1 smoke before the
    spread; no-op on a wide scan — the 100 TB case)."""
    from mofka_spark.operators.dedup import _spread
    from mofka_spark.operators.sampling import hash_bucket

    toks = (
        _spread(df.filter(F.col(text_col).isNotNull()), id_col)
        .select(F.col(id_col).alias("id"), F.explode(_tokens(F.col(text_col))).alias("t"))
    )
    idx = hash_bucket(F.col("t"), salt, mod=dim)
    sign = F.lit(1) - F.lit(2) * hash_bucket(F.col("t"), salt + "#s", mod=2)
    hashed = toks.select("id", idx.alias("d"), sign.alias("s"))
    if dim <= 256:
        agg = hashed.groupBy("id").agg(
            *[
                F.sum(F.when(F.col("d") == k, F.col("s")).otherwise(0))
                .cast("long")
                .alias(f"_v{k}")
                for k in range(dim)
            ]
        )
        return agg.select(
            "id",
            F.array(
                *[F.col(f"_v{k}").cast("double") for k in range(dim)]
            ).alias("embedding"),
        )
    sparse = hashed.groupBy("id", "d").agg(F.sum("s").cast("long").alias("v"))
    assembled = sparse.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("d"), F.col("v")))
        ).alias("_m")
    )
    return assembled.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.coalesce(
                F.element_at("_m", d.cast("long")), F.lit(0)
            ).cast("double"),
        ).alias("embedding"),
    )


# --- Distributed BPE -----------------------------------------------------
#
# Byte-pair-encoding merge LEARNING (Sennrich et al. 2016, ACL —
# public algorithm) re-expressed for Spark. The corpus collapses ONCE
# to its Zipf-small (word, freq) table; every merge iteration then
# runs on that bounded frame, never the corpus:
#   - pair counting is one (lhs, rhs)-keyed partial-agg shuffle over
#     the word table (adjacent-symbol structs exploded scan-locally);
#   - the argmax is TakeOrderedAndProject (1 row to the driver — a
#     bounded model-state fetch, like kmeans_fit_full's centroids);
#   - applying the merge is a scan-local string replace on the
#     segmentation column (narrow, no shuffle).
# Segmentations are strings with every symbol WRAPPED in separators
# ("\x1fl\x1f\x1fo\x1f\x1fw\x1f"), so "merge (a,b)" is
# replace(seg, SEP+a+SEP + SEP+b+SEP, SEP+a+b+SEP): both Spark and
# external engines implement replace as LEFT-TO-RIGHT NON-OVERLAPPING
# scan — exactly BPE's greedy application. The wrap anchors BOTH ends
# of both symbols: a prefix-only separator would let pattern
# SEP+b+SEP+b match seg SEP+b+SEP+ba (symbol "ba" merely STARTS with
# "b") and mis-merge — a real bug hypothesis found on the corpus
# {ba, bba, bb}; and because adjacent symbols contribute their OWN
# separators (two between neighbors), consecutive matches never share
# a character, so "abab" + merge (a,b) correctly yields (ab)(ab).
# Scheme fuzz-verified against the pure-Python reference on 3000
# corpora over {a,b} (the prefix-pathology-dense alphabet).
_BPE_SEP = "\x1f"


def _bpe_seg0(word: Column) -> Column:
    """Initial segmentation: each character wrapped as SEP+c+SEP."""
    return F.array_join(
        F.transform(
            F.split(word, ""),
            lambda c: F.concat(F.lit(_BPE_SEP), c, F.lit(_BPE_SEP)),
        ),
        "",
    )


def _bpe_syms(seg: Column) -> Column:
    """Parse a segmentation back to its symbol array (split on SEP,
    drop the empty strings the wrapping produces)."""
    return F.filter(F.split(seg, _BPE_SEP), lambda x: x != "")


def _bpe_merge_expr(seg: Column, lhs: str, rhs: str) -> Column:
    """Apply one merge to a segmentation string."""
    return F.replace(
        seg,
        F.lit(_BPE_SEP + lhs + _BPE_SEP + _BPE_SEP + rhs + _BPE_SEP),
        F.lit(_BPE_SEP + lhs + rhs + _BPE_SEP),
    )


def _bpe_pairs(seg: Column) -> Column:
    """Adjacent symbol pairs of a segmentation, overlapping (the BPE
    pair count: [a,a,a] contributes (a,a) twice)."""
    syms = _bpe_syms(seg)
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(n - 1, F.lit(0))),
        lambda l, r: F.struct(l.alias("lhs"), r.alias("rhs")),
    )


def bpe_word_freq(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The (word, freq) table BPE trains on — ONE corpus-collapsing
    aggregate (the same partial-agg shape as build_vocab; Zipf makes
    the result vocabulary-sized). Words containing the internal
    separator (U+001F, a control char that never appears in text)
    are dropped on both engines."""
    from mofka_spark.operators.dedup import _spread

    return (
        _spread(df.filter(F.col(text_col).isNotNull()), text_col)
        .select(F.explode(_tokens(F.col(text_col))).alias("word"))
        .filter((F.col("word") != "") & ~F.col("word").contains(_BPE_SEP))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _bpe_select_batch(
    rows: list, batch: int, truncated: bool
) -> list[tuple[str, str, int]]:
    """Select a prefix of the round's sorted pair table that a
    SEQUENTIAL greedy trainer provably merges in the same order —
    the conservative-exact version of the standard "batch
    non-conflicting merges" trick. ``rows`` is the pair-count table
    sorted (cnt desc, lhs asc, rhs asc), possibly truncated to the
    top-K (``truncated``: unseen pairs exist, every one with
    cnt <= rows[-1]'s).

    A candidate p_j (j >= 2, count cnt_j) is accepted only when
    sequential training, having applied the already-accepted
    p_1..p_{j-1} (symbols S, merged strings M), provably still picks
    p_j as its argmax. Sound because after those merges every pair
    falls in one of four classes:

    - symbol-disjoint from S ∪ M and pre-existing: count UNCHANGED
      (a merge never creates or destroys an adjacency of two
      untouched symbols — the merged symbol sits between). The
      accepted prefix is the sorted head of this class, so p_j wins
      it, tie-breaks included. The walk stops at the first
      conflicting row rather than skipping it — a conflicting pair
      ranked above p_j could retain its count and outrank p_j.
    - sharing a symbol with S but containing no m ∈ M: count can
      only DECREASE (occurrences get consumed, never created).
      Round counts bound them: every visible one must be < cnt_j
      (they rank below p_j, so ties are the only risk); unseen ones
      are <= the truncation bound.
    - containing merged symbols (grown or new): each post-merge
      occurrence of (m_i, y) maps to a round-start occurrence of
      (m_i, y) — m_i already existed as a symbol (CONFLATION) — or
      of (b_i, y) — the boundary adjacency the merge consumed. So
      post(m_i, y) <= cnt(m_i, y) + cnt(b_i, y); symmetrically
      (x, m_i) <= cnt(x, m_i) + cnt(x, a_i); and (m_i, m_l) is
      bounded by its four pre-images. Each term is looked up
      exactly among visible rows, defaulting to the truncation
      bound; the accept requires every such bound < cnt_j. For
      pairs (m_i, y) with UNSEEN y the lookup can't enumerate, the
      bound is trunc + max visible cnt(b_i, *) (resp. cnt(*, a_i)).
    - a SELF-PAIR (lhs == rhs) ends the batch after its own
      acceptance: its greedy residues create pairs like (bb, b)
      whose pre-image is the accepted pair ITSELF, so no later
      candidate can dominate them.
    """
    accepted: list[tuple[str, str, int]] = []
    symset: set[str] = set()
    merged: list[tuple[str, str, str]] = []  # (a_i, b_i, m_i)
    tb = int(rows[-1]["cnt"]) if truncated else 0
    by_pair = {(r["lhs"], r["rhs"]): int(r["cnt"]) for r in rows}

    def _lk(a: str, b: str) -> int:
        return by_pair.get((a, b), tb)

    for j, r in enumerate(rows):
        if len(accepted) >= batch:
            break
        lhs, rhs, cnt = r["lhs"], r["rhs"], int(r["cnt"])
        if accepted:
            if lhs in symset or rhs in symset:
                break
            if truncated and cnt <= tb:
                break
            # decreasing-class ties: every visible row below sharing
            # a symbol with the accepted set must be strictly below
            tail = rows[j + 1 :]
            if any(
                rr["lhs"] in symset or rr["rhs"] in symset
                for rr in tail
                if int(rr["cnt"]) == cnt
            ):
                break
            # grown/new pairs involving each accepted merged symbol
            ok = True
            for a_i, b_i, m_i in merged:
                in_max = max(
                    [
                        int(rr["cnt"])
                        for rr in rows
                        if rr["lhs"] == b_i and (rr["lhs"], rr["rhs"]) != (a_i, b_i)
                    ]
                    + [tb]
                )
                out_max = max(
                    [
                        int(rr["cnt"])
                        for rr in rows
                        if rr["rhs"] == a_i and (rr["lhs"], rr["rhs"]) != (a_i, b_i)
                    ]
                    + [tb]
                )
                # generic unseen-partner bounds: base (conflated
                # pre-existing (m_i, ?), unseen => <= tb) + boundary
                if cnt <= tb + in_max or cnt <= tb + out_max:
                    ok = False
                    break
                # visible conflated pairs get their exact bound
                for rr in rows:
                    rl, rr_, rc = rr["lhs"], rr["rhs"], int(rr["cnt"])
                    if rl == m_i and cnt <= rc + _lk(b_i, rr_):
                        ok = False
                        break
                    if rr_ == m_i and cnt <= rc + _lk(rl, a_i):
                        ok = False
                        break
                if not ok:
                    break
                # merged-merged pairs (both orders)
                for a_l, b_l, m_l in merged:
                    if (
                        cnt
                        <= _lk(m_i, m_l)
                        + _lk(b_i, a_l)
                        + _lk(m_i, a_l)
                        + _lk(b_i, m_l)
                    ):
                        ok = False
                        break
                if not ok:
                    break
            if not ok:
                break
        accepted.append((lhs, rhs, cnt))
        symset |= {lhs, rhs, lhs + rhs}
        merged.append((lhs, rhs, lhs + rhs))
        if lhs == rhs:
            break
    return accepted


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
    merges_per_round: int = 1,
) -> DataFrame:
    """Learn BPE merges: the standard iterative pair-count/argmax/merge
    loop, distributed. Returns the merge table (rank, lhs, rhs,
    merged, pair_count) in learned order — rank 1 is the first merge.
    Deterministic: ties break (pair_count desc, lhs asc, rhs asc), so
    an external engine replaying the same greedy order reproduces the
    table exactly. Stops early when no pair reaches
    ``min_pair_count``.

    Scale shape: the corpus is touched ONCE (bpe_word_freq); each
    ROUND is one bounded aggregate job over the word table plus a
    narrow string replace. The per-round driver fetch is a bounded
    top-K slice of the pair table (model state). localCheckpoint
    every ``checkpoint_every`` applied merges keeps the replace-chain
    lineage (and per-job planning time) bounded.

    ``merges_per_round`` lifts the one-job-per-merge ceiling for
    production-scale vocabularies (32k merges at ~0.25s/job floor is
    hours of pure scheduling): each round accepts up to that many
    merges from the sorted pair table under the conservative-exact
    rule of :func:`_bpe_select_batch` — the result is IDENTICAL to
    sequential training (merges_per_round=1) by construction, pinned
    by a hypothesis property against the pure-Python reference.
    Worst case (every top pair conflicts, e.g. one repeated
    character) still makes one merge per round — never slower than
    sequential, typically 4-8x fewer jobs on natural text."""
    if n_merges <= 0:
        raise ValueError("bpe_train: n_merges must be positive")
    if min_pair_count < 1:
        raise ValueError("bpe_train: min_pair_count must be >= 1")
    if merges_per_round < 1:
        raise ValueError("bpe_train: merges_per_round must be >= 1")
    spark = df.sparkSession
    words = (
        bpe_word_freq(df, text_col)
        .withColumn("seg", _bpe_seg0(F.col("word")))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    since_ckpt = 0
    while len(merges) < n_merges:
        remaining = n_merges - len(merges)
        batch = min(merges_per_round, remaining)
        # top-K window: enough rows to see the whole tied tail of any
        # accepted count in practice; the truncation bound keeps the
        # selection exact regardless.
        top_k = 1 if batch == 1 else max(32, 8 * batch)
        rows = (
            words.select(
                F.explode(_bpe_pairs(F.col("seg"))).alias("p"), "freq"
            )
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("cnt"))
            .filter(F.col("cnt") >= min_pair_count)
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(top_k)
            .collect()
        )
        if not rows:
            break
        picked = _bpe_select_batch(rows, batch, truncated=len(rows) == top_k)
        seg = F.col("seg")
        for lhs, rhs, cnt in picked:
            merges.append((len(merges) + 1, lhs, rhs, lhs + rhs, cnt))
            seg = _bpe_merge_expr(seg, lhs, rhs)
        words = words.withColumn("seg", seg)
        since_ckpt += len(picked)
        if since_ckpt >= checkpoint_every:
            words = words.localCheckpoint(eager=True)
            since_ckpt = 0
    return spark.createDataFrame(
        merges,
        "rank int, lhs string, rhs string, merged string, pair_count long",
    )


def _bpe_ranked(merges: "DataFrame | list") -> list[tuple[int, str, str]]:
    """Normalize a merge table (DataFrame / list of tuples or dicts)
    to a rank-sorted [(rank, lhs, rhs)] list — vocab-sized model
    state, the one bounded collect in the encode path."""
    rows = (
        merges.orderBy("rank").collect()
        if isinstance(merges, DataFrame)
        else [
            r if not isinstance(r, dict) else (
                r["rank"], r["lhs"], r["rhs"], r.get("merged"),
            )
            for r in merges
        ]
    )
    ranked: list[tuple[int, str, str]] = []
    for r in rows:
        if isinstance(r, tuple):
            ranked.append((int(r[0]), str(r[1]), str(r[2])))
        else:
            ranked.append((int(r["rank"]), str(r["lhs"]), str(r["rhs"])))
    ranked.sort(key=lambda t: t[0])
    return ranked


def _bpe_apply_kernel(ranked: list[tuple[int, str, str]]):
    """Arrow-batch kernel applying merges in rank order to each word —
    the SAME training-replay semantics as the replace chain, one
    Python pass instead of n_merges Catalyst expressions. Per word:
    iterate merges in rank order, skipping any whose lhs/rhs symbol
    is absent from the word's current symbol set (O(1) membership —
    almost every merge skips for a short word), greedy left-to-right
    when it applies. Distinct words are memoized per batch (Zipf: the
    token stream repeats a small vocabulary), so the per-word cost is
    paid once per TYPE, not per occurrence."""
    plain = [(a, b, a + b) for _, a, b in ranked]

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        if len(syms) > 1:
            symset = set(syms)
            for a, b, m in plain:
                if a not in symset or b not in symset:
                    continue
                out, i, n, changed = [], 0, len(syms), False
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(m)
                        i += 2
                        changed = True
                    else:
                        out.append(syms[i])
                        i += 1
                if changed:
                    syms = out
                    if len(syms) == 1:
                        break
                    symset = set(syms)
        return syms

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, wpos, ppos, pieces = [], [], [], []
            for i, w, p in zip(
                pdf["id"], pdf["word_pos"], pdf["word"]
            ):
                segs = cache.get(p)
                if segs is None:
                    segs = encode_word(p)
                    cache[p] = segs
                ids.extend([i] * len(segs))
                wpos.extend([w] * len(segs))
                ppos.extend(range(len(segs)))
                pieces.extend(segs)
            yield pd.DataFrame(
                {
                    # inherit the id dtype so empty batches (object
                    # inference) still convert to the declared schema
                    "id": pd.Series(ids, dtype=pdf["id"].dtype),
                    "word_pos": pd.Series(wpos, dtype="int64"),
                    "piece_pos": pd.Series(ppos, dtype="int64"),
                    "piece": pd.Series(pieces, dtype="object"),
                }
            )

    return run


def save_bpe_tokenizer(
    path: str,
    merges: DataFrame | list,
    vocab: DataFrame,
) -> None:
    """Persist the complete tokenizer ARTIFACT — the merge table and
    the train-time vocab — as two parquet directories
    (``<path>/merges``, ``<path>/vocab``). Together they make
    encoding a pure function of the artifact: any engine (or any
    later run) loading them assigns identical pieces AND identical
    ids to every shard, which is the checkpoint-compatibility
    contract a training run needs. Both tables are MODEL STATE
    (vocab-sized); the writes are bounded regardless of corpus
    scale."""
    spark = vocab.sparkSession
    if not isinstance(merges, DataFrame):
        ranked = _bpe_ranked(merges)
        merges = spark.createDataFrame(
            [(r, a, b, a + b) for r, a, b in ranked],
            "rank int, lhs string, rhs string, merged string",
        )
    merges.coalesce(1).write.mode("overwrite").parquet(path + "/merges")
    vocab.select("piece", "token_id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/vocab")


def load_bpe_tokenizer(spark, path: str):
    """Load a :func:`save_bpe_tokenizer` artifact. Returns
    ``(merges, vocab)``: merges as the rank-sorted [(rank, lhs, rhs)]
    list bpe_encode consumes (one bounded collect — model state),
    vocab as the (piece, token_id) DataFrame for
    ``bpe_encode(vocab=...)``."""
    merges = _bpe_ranked(spark.read.parquet(path + "/merges"))
    vocab = spark.read.parquet(path + "/vocab")
    return merges, vocab


def bpe_vocab_table(
    merges: DataFrame | list,
    train_df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """The TRAIN-TIME tokenizer id artifact: (piece, token_id) derived
    from the training corpus's alphabet plus the learned merge table —
    characters seen in the training corpus sorted asc take ids 1..A,
    merged symbols take A+rank (duplicate merged strings keep the
    lowest id), id 0 reserved for OOV. Persist this next to the merge
    table: ids are then a stable property of the TOKENIZER, so
    encoding any shard/corpus with (merges, vocab) assigns the same
    id to the same piece — the contract a checkpointed training run
    needs (without it, per-corpus alphabets would drift the ids
    between shards; ADVICE r9). Same id discipline as build_vocab's
    dense-id/OOV-0 scheme.

    Scale shape: one distinct-char aggregate over the token stream
    (alphabet-sized result) + a vocab-sized union; the output is
    MODEL STATE — broadcast-sized by construction."""
    ranked = _bpe_ranked(merges)
    from mofka_spark.operators.dedup import _spread

    alphabet = (
        _spread(train_df.filter(F.col(text_col).isNotNull()), text_col)
        .select(F.explode(_tokens(F.col(text_col))).alias("word"))
        .filter((F.col("word") != "") & ~F.col("word").contains(_BPE_SEP))
        .select(F.explode(F.split(F.col("word"), "")).alias("piece"))
        .filter(F.col("piece") != "")
        .distinct()
    )
    aw = Window.orderBy(F.asc("piece"))
    alpha_ids = alphabet.select(
        "piece", F.row_number().over(aw).cast("int").alias("token_id")
    )
    n_alpha = alpha_ids.count()
    spark = train_df.sparkSession
    merged_ids = spark.createDataFrame(
        [(lhs + rhs, n_alpha + rank) for rank, lhs, rhs in ranked],
        "piece string, token_id int",
    ) if ranked else spark.createDataFrame([], "piece string, token_id int")
    return (
        alpha_ids.unionByName(merged_ids)
        .groupBy("piece")
        .agg(F.min("token_id").cast("int").alias("token_id"))
    )


def bpe_encode(
    df: DataFrame,
    merges: DataFrame | list,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "replace",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Encode documents into BPE pieces by replaying the learned
    merges in rank order — TRAINING-REPLAY semantics: each merge is
    applied once, globally, in the order it was learned (exactly how
    training itself segmented the corpus, so encoding the training
    corpus reproduces the final training segmentation bit-for-bit).
    Returns scalar rows (id, word_pos, piece_pos, piece, token_id):
    word_pos = token index in the document, piece_pos = piece index
    within the word. token_id is deterministic: characters seen in
    this corpus sorted asc take ids 1..A, merged symbols take
    A+rank (duplicate merged strings — two pairs concatenating to the
    same string — keep the lowest id); id 0 is reserved for OOV.
    That default derives the alphabet from the corpus being ENCODED —
    fine when train corpus == encode corpus (the gates), but ids are
    then NOT a stable property of the tokenizer across shards. Pass
    ``vocab`` (the :func:`bpe_vocab_table` train-time artifact) to
    pin ids to the TRAINING corpus: shared pieces get the training
    ids on any input, unseen characters become OOV 0 — the
    shard-by-shard production contract.

    Scale shape: the merge table is vocab-sized MODEL STATE —
    collected once; the token stream explodes scan-locally and only
    the tiny vocab broadcasts for the id join; zero corpus shuffles
    either way. ``method`` picks how merges apply:

    - ``"replace"`` (default, the gate path): a chain of
      ``n_merges`` scan-local string replaces baked into the plan —
      pure JVM/codegen, exactly reproducible by an external engine's
      replace(). Bounded-merges contract: one Catalyst expression per
      merge, right for the 10^2..10^3 tables the gates train.
    - ``"arrow"`` (the 32k-merge production path): one Arrow-batched
      mapInPandas kernel applying the same rank-order greedy replay
      per word, memoized per DISTINCT word within each batch (Zipf:
      cost per type, not per occurrence; symbol-set membership skips
      the merges a word can't contain). Bit-identical output —
      pinned by pytest over random corpora and by the shared vocab
      join."""
    ranked = _bpe_ranked(merges)

    from mofka_spark.operators.dedup import _spread

    toks = (
        _spread(df.filter(F.col(text_col).isNotNull()), id_col)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(_tokens(F.col(text_col))).alias(
                "word_pos", "word"
            ),
        )
        .filter((F.col("word") != "") & ~F.col("word").contains(_BPE_SEP))
    )
    if method == "arrow":
        id_type = toks.schema["id"].dataType.simpleString()
        pieces = toks.select(
            "id", F.col("word_pos").cast("long").alias("word_pos"), "word"
        ).mapInPandas(
            _bpe_apply_kernel(ranked),
            f"`id` {id_type}, `word_pos` long, `piece_pos` long, "
            "`piece` string",
        )
    elif method == "replace":
        seg = _bpe_seg0(F.col("word"))
        for _, lhs, rhs in ranked:
            seg = _bpe_merge_expr(seg, lhs, rhs)
        pieces = toks.select(
            "id",
            F.col("word_pos").cast("long").alias("word_pos"),
            F.posexplode(_bpe_syms(seg)).alias("piece_pos", "piece"),
        ).withColumn("piece_pos", F.col("piece_pos").cast("long"))
    else:
        raise ValueError(f"bpe_encode: unknown method {method!r}")

    if vocab is None:
        # deterministic piece ids from THIS corpus — exactly the
        # train-time artifact computed over df, so the "ids 1..A asc,
        # merged A+rank, min-id dedup" contract lives in one place
        # (ranked is already collected; passing it skips a second
        # merge-table collect)
        vocab = bpe_vocab_table(ranked, df, text_col)
    else:
        if not {"piece", "token_id"} <= set(vocab.columns):
            raise ValueError(
                "bpe_encode: vocab must have (piece, token_id) columns"
            )
        vocab = vocab.select(
            "piece", F.col("token_id").cast("int").alias("token_id")
        )
    return pieces.join(F.broadcast(vocab), "piece", "left").select(
        "id",
        "word_pos",
        "piece_pos",
        "piece",
        F.coalesce(F.col("token_id"), F.lit(0)).cast("int").alias(
            "token_id"
        ),
    )


# -- unigram / WordPiece tokenizer training (SentencePiece-style) ------------
# Complements bpe_train with the OTHER mainstream subword family:
# a piece INVENTORY scored by usage, segmentation as per-word decoding
# (Viterbi max-likelihood or greedy longest-match), trained by hard-EM
# rounds of segment -> recount -> prune. Beyond-reference (the
# reference has no tokenizer); the public algorithm is Kudo 2018
# (SentencePiece unigram LM), simplified to hard-EM over the
# Zipf-collapsed word-frequency table.


def _unigram_substrings(words: DataFrame, max_piece_len: int) -> DataFrame:
    """All full-length substrings (length 2..max_piece_len) of each
    word type, one row per OCCURRENCE (overlapping), weighted by the
    word's corpus frequency. O(len x max_piece_len) rows per word
    TYPE — scan-local enumeration, bounded by the Zipf-collapsed word
    table, never the corpus."""
    w = F.col("word")
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(F.lit(2), F.lit(max_piece_len)),
                # NULL for windows running off the end (filtered below)
                # — sequence(2, len-i+1) would flip to a DESCENDING
                # sequence for short tails and double-count
                lambda l: F.when(i + l - 1 <= F.length(w), w.substr(i, l)),
            ),
        )
    )
    return words.select(
        F.explode(pieces).alias("piece"), "freq"
    ).filter(F.col("piece").isNotNull())


def unigram_seed(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    seed_size: int = 256,
    min_count: int = 2,
    words: DataFrame | None = None,
) -> DataFrame:
    """Seed piece inventory for unigram training: the top
    ``seed_size`` multi-character substrings by occurrence mass
    (ties: piece asc), UNION every single character seen — the
    coverage guarantee that makes every word segmentable. Returns
    (piece, freq, is_char).

    Scale shape: one corpus-collapsing word aggregate (bpe_word_freq),
    one substring-enumeration aggregate over the word-TYPE table, one
    bounded top-N. ``words``: a precomputed ``bpe_word_freq(df,
    text_col)`` frame — pass the (checkpointed) word table a caller
    already holds (unigram_train does) and the corpus is not touched
    here at all. Standalone, the union's two branches share the
    word-frequency exchange at runtime (AQE stage reuse — verified in
    the executed plan: the char branch reads a ReusedExchange), so
    the lazy form costs ONE corpus pass; the parameter exists so a
    caller that already materialized the word table does not pay a
    second one."""
    if max_piece_len < 2:
        raise ValueError("unigram_seed: max_piece_len must be >= 2")
    if words is None:
        words = bpe_word_freq(df, text_col)
    multi = (
        _unigram_substrings(words, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("freq").alias("freq"))
        .filter(F.col("freq") >= min_count)
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(seed_size)
        .withColumn("is_char", F.lit(False))
    )
    chars = (
        words.select(F.explode(F.split("word", "")).alias("piece"), "freq")
        .filter(F.col("piece") != "")
        .groupBy("piece")
        .agg(F.sum("freq").alias("freq"))
        .withColumn("is_char", F.lit(True))
    )
    return chars.unionByName(multi)


def _unigram_segment_word(
    word: str,
    logp: dict,
    max_piece_len: int,
    objective: str,
) -> list:
    """Segment ONE word against a piece inventory. Two objectives:

    - ``"viterbi"``: maximize sum of piece log-probs; ties prefer
      FEWER pieces, then the lexicographically smaller piece sequence.
      Characters missing from the inventory segment as themselves at
      the configured floor log-prob (coverage fallback).
    - ``"longest"``: greedy longest-match left to right (WordPiece
      inference) — integer-only and replayable in SQL, the gate path.
    """
    n = len(word)
    if objective == "longest":
        out, i = [], 0
        while i < n:
            for ln in range(min(max_piece_len, n - i), 0, -1):
                cand = word[i : i + ln]
                if ln == 1 or cand in logp:
                    out.append(cand)
                    i += ln
                    break
        return out
    # viterbi: best[i] = (score, -n_pieces, seq) for word[:i]
    floor = (min(logp.values()) if logp else 0.0) - 1.0
    best = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand_best = None
        for ln in range(1, min(max_piece_len, i) + 1):
            piece = word[i - ln : i]
            lp = logp.get(piece)
            if lp is None:
                if ln > 1:
                    continue
                lp = floor  # unknown single char fallback
            prev = best[i - ln]
            if prev is None:
                continue
            cand = (prev[0] + lp, prev[1] - 1, prev[2] + (piece,))
            # maximize (score, -n_pieces), then lexicographically
            # SMALLEST sequence
            if (
                cand_best is None
                or (cand[0], cand[1]) > (cand_best[0], cand_best[1])
                or (
                    (cand[0], cand[1]) == (cand_best[0], cand_best[1])
                    and cand[2] < cand_best[2]
                )
            ):
                cand_best = cand
        best[i] = cand_best
    return list(best[n][2])


def _unigram_segment_kernel(
    pieces: dict, max_piece_len: int, objective: str
):
    """Arrow-batch kernel: (id, word_pos, word) -> exploded (id,
    word_pos, piece_pos, piece), memoized per distinct word within a
    batch (Zipf: cost per TYPE). ``pieces`` is bounded model state
    captured in the closure — piece -> logprob (viterbi) or -> True
    (longest)."""

    def run(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            ids, wpos, ppos, out = [], [], [], []
            for i, w, word in zip(pdf["id"], pdf["word_pos"], pdf["word"]):
                segs = cache.get(word)
                if segs is None:
                    segs = _unigram_segment_word(
                        word, pieces, max_piece_len, objective
                    )
                    cache[word] = segs
                ids.extend([i] * len(segs))
                wpos.extend([w] * len(segs))
                ppos.extend(range(len(segs)))
                out.extend(segs)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype=pdf["id"].dtype),
                    "word_pos": pd.Series(wpos, dtype="int64"),
                    "piece_pos": pd.Series(ppos, dtype="int64"),
                    "piece": pd.Series(out, dtype="object"),
                }
            )

    return run


def _unigram_logp(counts: dict) -> dict:
    import math

    total = float(sum(counts.values())) or 1.0
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
    max_piece_len: int = 4,
    seed_size: int = 1024,
    seed_min_count: int = 2,
    n_iters: int = 2,
    objective: str = "viterbi",
) -> DataFrame:
    """Hard-EM unigram-LM tokenizer training: seed inventory ->
    (segment the word table -> recount piece usage -> prune to the
    top ``vocab_size``) x ``n_iters``. Deterministic end to end: seed
    and prune order is (freq desc, piece asc), segmentation tie-breaks
    are pinned (see _unigram_segment_word), so retraining reproduces
    the artifact bit-for-bit (the bpe_train discipline).

    Returns the tokenizer artifact (piece, freq, is_char, token_id):
    characters seen in training sorted asc take ids 1..A (kept
    regardless of usage — the coverage floor), learned multi-char
    pieces take A+1.. in (freq desc, piece asc) order; id 0 stays
    reserved for OOV, matching bpe_vocab_table.

    Scale shape: the corpus is touched ONCE (bpe_word_freq, Zipf-
    collapsed and localCheckpointed); each EM round is one Arrow
    segmentation pass + one aggregate over the word-TYPE table; piece
    inventories are bounded MODEL STATE (seed_size + alphabet), the
    only driver-side data. ``objective="viterbi"`` is the unigram-LM
    default (hypothesis-pinned against a brute-force mirror);
    ``"longest"`` trains a WordPiece-style greedy tokenizer whose
    whole train loop is integer-only and SQL-replayable (the gate
    oracle)."""
    if vocab_size < 1:
        raise ValueError("unigram_train: vocab_size must be >= 1")
    if n_iters < 1:
        raise ValueError("unigram_train: n_iters must be >= 1")
    if objective not in ("viterbi", "longest"):
        raise ValueError(f"unigram_train: unknown objective {objective!r}")
    spark = df.sparkSession
    words = bpe_word_freq(df, text_col).localCheckpoint(eager=True)
    try:
        seed = unigram_seed(
            df, text_col, max_piece_len, seed_size, seed_min_count,
            words=words,
        )
        # bounded collect: seed_size + alphabet rows of model state
        counts = {r["piece"]: int(r["freq"]) for r in seed.collect()}
        chars = sorted(p for p in counts if len(p) == 1)
        for _ in range(n_iters):
            if objective == "viterbi":
                model = _unigram_logp(counts)
            else:
                model = {p: True for p in counts}
            segged = words.select(
                F.col("word").alias("id"),
                F.lit(0).cast("long").alias("word_pos"),
                F.col("word"),
            ).mapInPandas(
                _unigram_segment_kernel(model, max_piece_len, objective),
                "`id` string, `word_pos` long, `piece_pos` long, `piece` string",
            )
            used = (
                segged.withColumnRenamed("id", "word")
                .join(words.select("word", "freq"), "word")
                .groupBy("piece")
                .agg(F.sum("freq").alias("freq"))
            )
            rows = used.collect()  # bounded: <= current inventory size
            new_counts = {r["piece"]: int(r["freq"]) for r in rows}
            # prune: every training-corpus char survives (coverage), the
            # top (vocab_size - A) multi-char pieces by usage stay
            multi = sorted(
                ((p, c) for p, c in new_counts.items() if len(p) > 1),
                key=lambda t: (-t[1], t[0]),
            )[: max(vocab_size - len(chars), 0)]
            counts = {c: new_counts.get(c, 0) for c in chars}
            counts.update(dict(multi))
    finally:
        # the train loop is the checkpoint's only consumer — release
        # its blocks here rather than leaking one persisted RDD per
        # call into long-lived library sessions (DataFrame.unpersist
        # does NOT release localCheckpoint blocks)
        from mofka_spark.session import release_local_checkpoint

        release_local_checkpoint(words)
    out = [
        (p, counts[p], True, i + 1) for i, p in enumerate(chars)
    ]
    a = len(chars)
    for j, (p, c) in enumerate(
        sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )
    ):
        out.append((p, c, False, a + j + 1))
    return spark.createDataFrame(
        out, "piece string, freq long, is_char boolean, token_id int"
    )


def unigram_encode(
    df: DataFrame,
    pieces: "DataFrame | dict",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 4,
    objective: str = "viterbi",
) -> DataFrame:
    """Encode documents with a trained unigram/WordPiece inventory —
    the same output shape as bpe_encode: (id, word_pos, piece_pos,
    piece, token_id), token_id 0 for pieces outside the artifact
    (unknown-char fallbacks). ``pieces``: the unigram_train artifact
    (or any (piece, freq[, token_id]) frame / {piece: freq} dict).

    Scale shape: the inventory is bounded model state collected once
    and captured in the Arrow kernel closure; the token stream
    explodes scan-locally; the id join broadcasts the tiny vocab —
    zero corpus shuffles."""
    if objective not in ("viterbi", "longest"):
        raise ValueError(f"unigram_encode: unknown objective {objective!r}")
    if isinstance(pieces, DataFrame):
        rows = pieces.collect()
        counts = {r["piece"]: int(r["freq"]) for r in rows}
        ids = (
            {r["piece"]: int(r["token_id"]) for r in rows}
            if "token_id" in pieces.columns
            else None
        )
    else:
        counts = {p: int(c) for p, c in pieces.items()}
        ids = None
    if ids is None:
        chars = sorted(p for p in counts if len(p) == 1)
        ids = {p: i + 1 for i, p in enumerate(chars)}
        for j, (p, _) in enumerate(
            sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda t: (-t[1], t[0]),
            )
        ):
            ids[p] = len(chars) + j + 1
    model = (
        _unigram_logp(counts)
        if objective == "viterbi"
        else {p: True for p in counts}
    )
    from mofka_spark.operators.dedup import _spread

    toks = (
        _spread(df.filter(F.col(text_col).isNotNull()), id_col)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(_tokens(F.col(text_col))).alias("word_pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    id_type = toks.schema["id"].dataType.simpleString()
    segged = toks.select(
        "id", F.col("word_pos").cast("long").alias("word_pos"), "word"
    ).mapInPandas(
        _unigram_segment_kernel(model, max_piece_len, objective),
        f"`id` {id_type}, `word_pos` long, `piece_pos` long, `piece` string",
    )
    spark = df.sparkSession
    vocab = spark.createDataFrame(
        list(ids.items()), "piece string, token_id int"
    )
    return segged.join(F.broadcast(vocab), "piece", "left").select(
        "id",
        "word_pos",
        "piece_pos",
        "piece",
        F.coalesce(F.col("token_id"), F.lit(0)).cast("int").alias("token_id"),
    )


def save_unigram_tokenizer(path: str, pieces: DataFrame) -> None:
    """Persist the unigram/WordPiece tokenizer artifact (the
    unigram_train output: piece, freq, is_char, token_id) as one
    parquet directory — the save_bpe_tokenizer discipline: encoding
    becomes a pure function of the artifact, so any later run (or any
    shard) assigns identical pieces and ids. Model-state-sized write,
    bounded regardless of corpus scale."""
    cols = {"piece", "freq", "is_char", "token_id"}
    if not cols <= set(pieces.columns):
        raise ValueError(
            f"save_unigram_tokenizer: artifact needs columns {sorted(cols)}"
        )
    pieces.select("piece", "freq", "is_char", "token_id").coalesce(
        1
    ).write.mode("overwrite").parquet(path + "/pieces")


def load_unigram_tokenizer(spark, path: str) -> DataFrame:
    """Load a :func:`save_unigram_tokenizer` artifact — the (piece,
    freq, is_char, token_id) frame :func:`unigram_encode` consumes."""
    return spark.read.parquet(path + "/pieces")


# Unicode-script classes in PRIORITY ORDER (dominant-script ties break
# by this order). Ranges are written in the Java∩RE2 common subset
# (\x{...} class atoms) so the DuckDB oracle runs the same patterns.
SCRIPT_CLASSES = [
    ("latin", r"[A-Za-z]"),
    ("digit", r"[0-9]"),
    ("cyrillic", r"[\x{0400}-\x{04FF}]"),
    ("greek", r"[\x{0370}-\x{03FF}]"),
    ("cjk", r"[\x{4E00}-\x{9FFF}]"),
    ("kana", r"[\x{3040}-\x{30FF}]"),
    ("hangul", r"[\x{AC00}-\x{D7AF}]"),
    ("arabic", r"[\x{0600}-\x{06FF}]"),
]


def script_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mixed_threshold: float = 0.1,
) -> DataFrame:
    """Unicode-script composition signals — the language-consistency /
    injected-content filter (a "French" page whose body is half
    Cyrillic is spam or a mislabel; mixed-script tokens are a known
    spoofing vector). Per document: one exact character count per
    :data:`SCRIPT_CLASSES` entry (length-difference of a
    regexp_replace, the encoding_signals discipline), the dominant
    script (max count, ties by class priority order, ``none`` for
    empty text, ``other`` when no class matches), how many classes
    clear ``mixed_threshold`` of the characters, and an ``is_mixed``
    flag (>= 2 such classes).

    Scale shape: entirely scan-local — one projection, zero shuffles,
    zero UDFs; composes as signals into blend_scores / line filters.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    counts = {
        name: (F.length(t) - F.length(F.regexp_replace(t, pat, "")))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat in SCRIPT_CLASSES
    }
    mx = F.greatest(*[F.col(f"n_{n}") for n, _ in SCRIPT_CLASSES])
    dominant = F.when(F.col("n_chars") == 0, F.lit("none"))
    dominant = dominant.when(mx == 0, F.lit("other"))
    for name, _ in SCRIPT_CLASSES:
        dominant = dominant.when(F.col(f"n_{name}") == mx, F.lit(name))
    thr = F.lit(float(mixed_threshold))
    over = [
        (
            F.col(f"n_{name}").cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
            >= thr
        ).cast("int")
        for name, _ in SCRIPT_CLASSES
    ]
    n_scripts = over[0]
    for o in over[1:]:
        n_scripts = n_scripts + o
    base = df.filter(t.isNotNull()).select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        *counts.values(),
    )
    return base.select(
        "id",
        "n_chars",
        *[F.col(f"n_{n}") for n, _ in SCRIPT_CLASSES],
        dominant.alias("dominant_script"),
        n_scripts.cast("int").alias("n_scripts"),
        (n_scripts >= 2).alias("is_mixed"),
    )

"""Text-analysis building blocks — all JVM-side Catalyst expressions.

Shingling, stopword stats, token counting, fingerprinting. No Python UDFs:
at 100 TB the per-row path must stay inside whole-stage codegen; everything
here composes from higher-order array functions (`transform`, `filter`,
`aggregate`) and string built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "words",
    "word_chunks",
    "word_shingles",
    "stopword_ratio",
    "punct_ratio",
    "token_count_regex",
    "min_fingerprint",
    "winnow_fingerprints",
    "EN_STOPWORDS",
    "TOPIC_LEXICONS",
    "topic_classify",
]

# Small closed-class marker set used by stopword stats and the language
# heuristic; mirrored literally in the DuckDB oracles.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.split(col, " ")


def word_shingles(words_col: Column, n: int = 3) -> Column:
    """Overlapping n-word shingles as space-joined strings.

    `transform(sequence(...))` keeps this a single codegen'd expression —
    no explode, no shuffle; the array lives inside the row.
    """
    w = words_col
    upper = F.size(w) - (n - 1)
    # Guard the empty range explicitly: Spark's sequence(1, 0) DESCENDS
    # (returns [1, 0]), so a doc with < n words would feed slice() a start
    # of 0 and abort the job. Empty array means "no shingles".
    return F.when(
        upper >= 1,
        F.transform(
            F.sequence(F.lit(1), upper),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_chunks(words_col: Column, size: int = 32, stride: int = 24) -> Column:
    """Overlapping word windows for RAG-style context chunking.

    Chunk starts are ``1, 1+stride, …`` while ``start <= max(1,
    n - (size - stride))`` — every word is covered, the final chunk may be
    short, and a trailing start whose window would be fully contained in
    the previous chunk is never emitted. Returns an array of structs
    ``(start, n_chunk_tokens, chunk_text)``; callers ``posexplode`` for a
    0-based chunk_id.

    Like :func:`word_shingles` this is one codegen'd higher-order
    expression — the chunk array lives inside the row, so chunking is
    map-only at any corpus size (no shuffle, no Python).
    """
    if stride <= 0 or size < stride:
        raise ValueError(f"need 0 < stride <= size, got {size=} {stride=}")
    w = words_col
    n = F.size(w)
    last_start = F.greatest(F.lit(1), n - (size - stride))
    starts = F.sequence(F.lit(1), last_start, F.lit(stride))
    return F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.least(F.lit(size), n - s + 1).alias("n_chunk_tokens"),
            F.array_join(F.slice(w, s, size), " ").alias("chunk_text"),
        ),
    )


def stopword_ratio(words_col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    n_stop = F.size(F.filter(words_col, lambda x: x.isin(*stopwords)))
    return n_stop / F.greatest(F.size(words_col), F.lit(1))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def token_count_regex(text: Column) -> Column:
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def winnow_fingerprints(text: Column, n: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03): rolling char-n-gram hashes → per-window-of-w minima →
    distinct set. Robust to insertions/reordering at sub-window scale;
    the standard local-fingerprinting scheme behind MOSS-style clone
    detection.

    All Catalyst higher-order functions over in-row arrays (constant-size
    codegen regardless of document length); md5 keeps the hash canonical
    across engines for oracle parity. Documents shorter than n+w-1 chars
    yield an empty set.
    """

    def seq_or_empty(upper: Column) -> Column:
        # sequence(1, 0) DESCENDS in Spark; guard the short-string case.
        return F.when(upper >= 1, F.sequence(F.lit(1), upper)).otherwise(
            F.array().cast("array<int>")
        )

    hashes = F.transform(
        seq_or_empty(F.length(text) - (n - 1)),
        lambda i: F.md5(F.substring(text, i, n)),
    )
    # Sliding-window minima by span doubling (sparse-table style):
    # ceil(log2 w) zip_with passes of least() over shifted slices —
    # O(L·log w) with whole-array allocations, instead of the per-position
    # O(L·w) slice+array_min (L four-element allocations) or an
    # element_at least-chain (per-call bounds/null checks). Measured at
    # sf0.01: 0.8 s vs 4.2 s (slice+array_min) vs 20 s (element_at).
    m = hashes
    span = 1
    while span < w:
        s = min(span, w - span)
        sz = F.size(m)
        m = F.zip_with(
            F.slice(m, 1, sz - s),
            F.slice(m, 1 + s, sz - s),
            lambda a, b: F.least(a, b),
        )
        span += s
    mins = F.when(F.size(hashes) >= w, m).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(mins)


def min_fingerprint(shingles_col: Column) -> Column:
    """Winnowing-flavor document fingerprint: the lexicographic minimum of
    the md5 hex digests of the document's shingles. Identical across
    engines (md5 hex is canonical), robust to word order only as much as
    shingles are — which is the point."""
    return F.array_min(F.transform(shingles_col, lambda s: F.md5(s)))


# Ordered topic lexicons for keyword-lexicon domain classification —
# tie-break is lexicon ORDER (first wins), mirrored in the oracle's CASE.
# Terms drawn from the fixture corpus vocabulary; production lexicons are
# curated per taxonomy (the WebOrganizer/C4-domain-bucketing shape).
TOPIC_LEXICONS = (
    ("execution", ("scan", "filter", "join", "merge", "sort", "hash",
                   "batch", "stream")),
    ("planning", ("query", "group", "agg", "order", "window", "part",
                  "key")),
    ("storage", ("table", "column", "row", "line", "data", "value",
                 "vector")),
)


def topic_classify(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lexicons=TOPIC_LEXICONS,
) -> DataFrame:
    """Keyword-lexicon topic bucketing — the cheap, fully-auditable form
    of domain classification used to stratify corpus mixtures (each doc
    gets per-topic occurrence counts and an argmax topic; downstream
    mixture sampling keys on the topic the way mixture_sample_by_source
    keys on source).

    Map-only Catalyst: per topic one ``size(filter(words, in lexicon))``
    higher-order expression — occurrence counts (duplicates kept), no
    explode, no shuffle, runs inside the scan stage at any corpus size.
    Argmax tie-break: ``greatest`` then first-matching lexicon in order;
    zero hits everywhere → 'none'. Every branch mirrors into SQL
    literally, so the key is full-value-oracle-checkable.
    """
    ws = words(F.col(text_col))

    def in_lex(lex):
        # A separate factory, NOT a default-arg lambda: F.filter treats a
        # two-parameter lambda as (element, index) and would bind the
        # index Column to the second parameter.
        return lambda w: w.isin(*lex)

    hit_cols = [
        F.size(F.filter(ws, in_lex(lex))).cast("long").alias(f"hits_{name}")
        for name, lex in lexicons
    ]
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("long").alias("n_tokens"),
        *hit_cols,
    )
    m = F.greatest(*[F.col(f"hits_{name}") for name, _ in lexicons])
    topic = F.when(m == 0, F.lit("none"))
    for name, _ in lexicons:
        topic = topic.when(F.col(f"hits_{name}") == m, F.lit(name))
    return d.select(
        "doc_id",
        "n_tokens",
        *[f"hits_{name}" for name, _ in lexicons],
        topic.alias("topic"),
        m.cast("long").alias("top_hits"),
    )


def boilerplate_line_stats(
    lines: DataFrame, min_df: int = 2, hash_keys: bool = False
) -> DataFrame:
    """CCNet-style boilerplate-line removal rollup over an exploded
    ``(doc_id, line, wc)`` frame: lines appearing in >= ``min_df``
    distinct documents are boilerplate; per document emit line/word
    totals and the kept-word mass after dropping them.

    ``hash_keys`` is the 100 TB switch: both the df rollup and the
    boiler-set join re-key on ``xxhash64(line)`` so the shuffle moves
    8-byte keys instead of full line strings (collision odds 2^-64 per
    pair — the standard CCNet/MinHash trade). ``hash_keys=False`` keeps
    the string key for byte-exact oracle parity; results are identical
    absent a hash collision, which ``tests/test_plans.py`` asserts at
    sf0.001 and the plan test certifies structurally (the exchange
    carries the hash, not the string).

    Scale shape either way: one map-side-combinable groupBy for the df
    rollup, one shuffle join back (corpus-sized boiler set in the worst
    case, so no broadcast; AQE skew-split absorbs a mega-hot footer
    line), one final per-doc rollup. No windows, no driver collect."""
    key = (
        F.xxhash64("line").alias("line_key")
        if hash_keys
        else F.col("line").alias("line_key")
    )
    keyed = lines.select("doc_id", key, "wc")
    boiler = (
        keyed.groupBy("line_key")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("line_key", F.lit(True).alias("is_boiler"))
    )
    marked = keyed.join(boiler, "line_key", "left").withColumn(
        "is_boiler", F.coalesce("is_boiler", F.lit(False))
    )
    kept = F.sum(F.when(F.col("is_boiler"), F.lit(0)).otherwise(F.col("wc")))
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("is_boiler").cast("long"))
        .cast("long")
        .alias("n_boiler_lines"),
        F.sum("wc").cast("long").alias("total_words"),
        kept.cast("long").alias("kept_words"),
        F.expr(
            "(1000 * sum(CASE WHEN is_boiler THEN 0 ELSE wc END)) div sum(wc)"
        )
        .cast("long")
        .alias("kept_permille"),
    )

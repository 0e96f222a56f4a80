"""Text analysis over ``documents`` — the training-data-pipeline surface
(language-ID, quality scoring, token stats, fingerprinting) plus the
reference's string-predicate queries mapped onto text data:
conditional-aggregation ratio (pyspark_stats.py:125-153, A5/F3) and the
substring theta-join over a small keyword dim (pyspark_stats.py:102-111,
J5/F2).

Everything is built-in JVM expressions (split / filter HOFs / md5 /
contains) — no Python in the hot path. Token counts use
single-space-separated semantics matching the corpus.

Scale: all queries are scan → map-side expression → one grouped-agg
shuffle; the keyword join broadcasts a literal dim (BNLJ) — the dim is
O(10) rows at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core.catalog import table
from ..core.registry import query

# ---------------------------------------------------------------------------


@query(
    "doc_token_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           round(sum(len(string_split(text, ' '))) * 1.0 / count(*), 4) AS avg_tokens,
           round(sum(length(text)) * 1.0 / count(*), 4) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting (training-data token budgeting)."""
    d = table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    agg = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("n_docs"), 4).alias("avg_tokens"),
        F.round(F.col("total_chars") / F.col("n_docs"), 4).alias("avg_chars"),
    )


@query(
    "doc_quality_scores",
    oracle="""
    WITH m AS (
        SELECT doc_id, lang,
               len(string_split(text, ' '))                    AS n_tokens,
               len(list_distinct(string_split(text, ' ')))     AS n_unique,
               length(text)                                    AS n_chars
        FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           round(n_unique * 1.0 / n_tokens, 4) AS uniq_ratio,
           round((n_chars - n_tokens + 1) * 1.0 / n_tokens, 4) AS avg_token_len,
           round(0.5 * least(1.0, n_tokens / 50.0)
                 + 0.5 * (n_unique * 1.0 / n_tokens), 4) AS quality
    FROM m
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: length signal + lexical diversity
    (the unique-token ratio is the classic gopher-style repetition
    filter signal). All integer-derived arithmetic → exact parity."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.length("text").alias("n_chars"),
    )
    return m.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(F.col("n_unique") / F.col("n_tokens"), 4).alias("uniq_ratio"),
        F.round((F.col("n_chars") - F.col("n_tokens") + 1) / F.col("n_tokens"), 4).alias(
            "avg_token_len"
        ),
        F.round(
            0.5 * F.least(F.lit(1.0), F.col("n_tokens") / 50.0)
            + 0.5 * (F.col("n_unique") / F.col("n_tokens")),
            4,
        ).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Language ID: marker-token scoring with a fixed tie-break order. On this
# synthetic corpus the vocabulary is uniform across langs, so the value is
# the operator shape (score -> argmax classify), not model accuracy.
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("customer", "hash", "row"),
    "en": ("the", "order", "table"),
    "es": ("slow", "agg", "vector"),
    "fr": ("scan", "data", "query"),
    "zh": ("join", "small", "column"),
}


def _marker_sql(lang: str) -> str:
    lst = ", ".join(f"'{t}'" for t in _LANG_MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({lst})))"


@query(
    "lang_id_confusion",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               {_marker_sql('de')} AS s_de,
               {_marker_sql('en')} AS s_en,
               {_marker_sql('es')} AS s_es,
               {_marker_sql('fr')} AS s_fr,
               {_marker_sql('zh')} AS s_zh
        FROM documents
    ), pred AS (
        SELECT lang,
               CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
                    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
                    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
                    WHEN s_fr >= s_zh THEN 'fr'
                    ELSE 'zh' END AS predicted
        FROM scored
    )
    SELECT lang, predicted, count(*) AS n_docs
    FROM pred GROUP BY lang, predicted
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID → confusion-matrix counts. Ties resolve
    in fixed lang order (de<en<es<fr<zh), identically on both engines."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def score(lang: str):
        return F.size(F.filter(toks, lambda t: t.isin(*_LANG_MARKERS[lang])))

    scored = d.select(
        "lang",
        *[score(lg).alias(f"s_{lg}") for lg in ("de", "en", "es", "fr", "zh")],
    )
    predicted = (
        F.when(F.col("s_de") >= F.greatest("s_en", "s_es", "s_fr", "s_zh"), "de")
        .when(F.col("s_en") >= F.greatest("s_es", "s_fr", "s_zh"), "en")
        .when(F.col("s_es") >= F.greatest("s_fr", "s_zh"), "es")
        .when(F.col("s_fr") >= F.col("s_zh"), "fr")
        .otherwise("zh")
    )
    return (
        scored.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------


@query(
    "doc_fingerprints",
    oracle="""
    WITH fp AS (
        SELECT source, md5(lower(trim(text))) AS fingerprint
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT fingerprint) AS n_distinct,
           count(*) - count(DISTINCT fingerprint) AS n_redundant
    FROM fp GROUP BY source
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (normalize → md5) + per-source redundancy
    accounting — the exact-dedup accounting pass."""
    d = table(spark, sf_dir, "documents")
    fp = d.select("source", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("fingerprint").alias("n_distinct"),
        (F.count("*") - F.count_distinct("fingerprint")).alias("n_redundant"),
    )


@query(
    "conditional_agg_ratio",
    oracle="""
    SELECT count(*) AS n_docs,
           count(*) FILTER (WHERE contains(text, 'spark')) AS n_spark_docs,
           round(sum(length(text)) * 1.0 / count(*), 4) AS avg_chars_all,
           round(CASE WHEN count(*) FILTER (WHERE contains(text, 'spark')) = 0 THEN 0
                      ELSE sum(length(text)) FILTER (WHERE contains(text, 'spark')) * 1.0
                           / count(*) FILTER (WHERE contains(text, 'spark')) END, 4)
               AS avg_chars_spark
    FROM documents
    """,
)
def conditional_agg_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference stat 3 (pyspark_stats.py:125-153): global aggregate vs
    substring-filtered aggregate with the 0-guard, in ONE pass via
    conditional aggregation (the reference runs 4 separate jobs)."""
    d = table(spark, sf_dir, "documents")
    has = F.col("text").contains("spark")
    agg = d.agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(has, 1)).alias("n_spark_docs"),
        F.sum(F.length("text")).alias("chars_all"),
        F.sum(F.when(has, F.length("text"))).alias("chars_spark"),
    )
    return agg.select(
        "n_docs",
        "n_spark_docs",
        F.round(F.col("chars_all") / F.col("n_docs"), 4).alias("avg_chars_all"),
        F.round(
            F.when(F.col("n_spark_docs") == 0, F.lit(0.0)).otherwise(
                F.coalesce(F.col("chars_spark"), F.lit(0)) / F.col("n_spark_docs")
            ),
            4,
        ).alias("avg_chars_spark"),
    )


_KEYWORDS = ("spark", "join", "merge", "window", "stream", "vector")


@query(
    "keyword_doc_stats",
    oracle=f"""
    SELECT kw,
           count(*) AS n_docs,
           round(sum(length(text)) * 1.0 / count(*), 4) AS avg_chars
    FROM documents
    CROSS JOIN (SELECT unnest({list(_KEYWORDS)}) AS kw) kws
    WHERE contains(text, kw)
    GROUP BY kw
    """,
)
def keyword_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference stat 2's substring theta-join (pyspark_stats.py:102-111,
    J5): tiny keyword dim x documents with a contains() predicate —
    broadcast nested-loop join; a doc matching k keywords lands in k
    groups (the reference's loop semantics)."""
    d = table(spark, sf_dir, "documents").select("text")
    kws = F.broadcast(spark.createDataFrame([(k,) for k in _KEYWORDS], "kw string"))
    return (
        d.crossJoin(kws)
        .where(F.col("text").contains(F.col("kw")))
        .groupBy("kw")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum(F.length("text")) / F.count("*"), 4).alias("avg_chars"),
        )
    )


@query(
    "keyword_lang_stats",
    oracle=f"""
    SELECT kw, lang,
           count(*) AS n_docs,
           round(sum(length(text)) * 1.0 / count(*), 4) AS avg_chars
    FROM documents
    CROSS JOIN (SELECT unnest({list(_KEYWORDS)}) AS kw) kws
    WHERE contains(text, kw)
    GROUP BY kw, lang
    """,
)
def keyword_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference stat 2's full shape — per (city x class) stats
    (pyspark_stats.py:108-119, A4) mapped to (keyword x lang): the
    6x(1+5)-job driver loop as ONE theta-join + grouped aggregation."""
    d = table(spark, sf_dir, "documents").select("text", "lang")
    kws = F.broadcast(spark.createDataFrame([(k,) for k in _KEYWORDS], "kw string"))
    return (
        d.crossJoin(kws)
        .where(F.col("text").contains(F.col("kw")))
        .groupBy("kw", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum(F.length("text")) / F.count("*"), 4).alias("avg_chars"),
        )
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT doc_id, term, tf * ln(n.n * 1.0 / df) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    r AS (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        FROM scored
    )
    SELECT doc_id, term AS top_term, round(score, 4) AS tfidf FROM r WHERE rn = 1
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document most-characteristic term by tf·idf (keyword
    extraction for training-data curation). Three shuffles total:
    (doc,term) tf agg, the term-partitioned df WINDOW, and the per-doc
    top-1 window; the corpus size joins in as a broadcast 1-row agg
    (a column-pruned count scan), never a collect. Ties (e.g. score 0
    when a term spans every doc) break on term order so both engines
    pick the same row.

    Scale: the df leg rides the tf frame as a window over the SAME
    term key the old groupBy-then-join-back shuffled on — same shuffle
    count, one fewer corpus scan and no vocab join (the r8 scan-dedup
    audit: 3 scans → 2, and the count scan reads zero columns)."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    n = d.agg(F.count("*").alias("n"))
    scored = tf.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("score"),
    )

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("score", 4).alias("tfidf"))
    )


@query(
    "vocab_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
        FROM documents
    )
    SELECT t AS token,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM tok WHERE t != ''
    GROUP BY t
    ORDER BY n_occurrences DESC, token
    LIMIT 20
    """,
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: global top-20 tokens by occurrence (the
    first pass of tokenizer/vocab training). One (token) agg shuffle with
    map-side combine, then orderBy().limit() → TakeOrderedAndProject
    per-partition heaps — NOT a global sort, the same bounded-take shape
    as top_orders (plan-asserted). At 100 TB the long tail never leaves
    the executors; only 20-row heaps merge at the driver."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).where(F.col("token") != "")
    counts = tok.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(20)


@query(
    "repetition_ngram_stats",
    oracle="""
    WITH b AS (
        SELECT lang,
               len(list_distinct(list_transform(
                   range(len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
               ))) AS d,
               len(string_split(text, ' ')) - 1 AS t
        FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    )
    SELECT lang,
           CAST(d * 10 // t AS INTEGER) AS uniq_decile,
           count(*) AS n_docs
    FROM b GROUP BY lang, uniq_decile
    """,
)
def repetition_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection by bigram diversity (the gopher-style
    duplicate-n-gram quality filter): per document, distinct word
    bigrams / total bigrams, bucketed into integer deciles and
    histogrammed per language — heavily repetitive documents sink into
    the low deciles. Bigrams are built with the zip-of-shifted-slices
    construction (split() runs once per row, not per element — see
    dedup._shingles), all arithmetic is integer → exact parity, and the
    whole query is a narrow map plus one low-cardinality shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    zipped = F.arrays_zip(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1))
    bigrams = F.transform(zipped, lambda s: F.concat_ws(" ", s["0"], s["1"]))
    b = d.where(n >= 2).select(
        "lang",
        F.size(F.array_distinct(bigrams)).alias("d"),
        (n - 1).alias("t"),
    )
    return (
        b.select(
            "lang",
            F.floor(F.col("d") * 10 / F.col("t")).cast("int").alias("uniq_decile"),
        )
        .groupBy("lang", "uniq_decile")
        .agg(F.count("*").alias("n_docs"))
    )


_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "heatmap_chart_data",
    oracle=f"""
    SELECT kw,
           {", ".join(f"count(*) FILTER (WHERE lang = '{lg}') AS {lg}" for lg in _LANGS)}
    FROM documents
    CROSS JOIN (SELECT unnest({list(_KEYWORDS)}) AS kw) kws
    WHERE contains(text, kw)
    GROUP BY kw
    """,
)
def heatmap_chart_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4's data half — the reference's heatmap matrix (plots.py:27-40:
    merge per-class count frames on the index column, transpose to
    class-rows × index-columns) as ONE query: keyword rows (the class
    axis) × language columns (the index axis), each cell the matching
    doc count. Built as a broadcast theta-join + a single groupBy with
    per-language conditional counts — the plan a 100 TB run wants (no
    pivot's extra distinct-values job, one map-side-combine shuffle of
    6-row partials). ``sources.html_report.write_html_heatmap`` renders
    this matrix to the reference's standalone-HTML chart artifact."""
    d = table(spark, sf_dir, "documents").select("text", "lang")
    kws = F.broadcast(spark.createDataFrame([(k,) for k in _KEYWORDS], "kw string"))
    return (
        d.crossJoin(kws)
        .where(F.col("text").contains(F.col("kw")))
        .groupBy("kw")
        .agg(
            *[
                F.count(F.when(F.col("lang") == lg, 1)).alias(lg)
                for lg in _LANGS
            ]
        )
    )


_BM25_TERMS = ("spark", "vector", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


# Shared CTE chain: tokens → query-term tf → corpus stats → BM25 doc
# scores. Reused by bm25_search (emits the top-10) and bm25_ndcg_eval
# (grades that top-10 against term-count relevance).
_DUCK_BM25_CTES = f"""tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               len(string_split(text, ' ')) AS dl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
        FROM tok WHERE term IN {_BM25_TERMS}
        GROUP BY doc_id, term
    ),
    stats AS (SELECT count(*) AS n, avg(len(string_split(text, ' '))) AS avgdl
              FROM documents),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               ln((n - df + 0.5) / (df + 0.5) + 1)
               * tf * ({_BM25_K1} + 1)
               / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               AS s
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    ),
    ranked10 AS (
        SELECT doc_id, round(sum(s), 4) AS bm25
        FROM scored GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 10
    )"""


@query(
    "bm25_search",
    oracle=f"""
    WITH {_DUCK_BM25_CTES}
    SELECT doc_id, bm25 FROM ranked10
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a literal term set — the posting-list
    search shape (Robertson/Sparck-Jones weighting, k1=1.2 b=0.75) that
    a corpus-scale search/retrieval layer runs. Tokens explode once and
    are FILTERED TO THE QUERY TERMS before any shuffle (the posting
    lists of 3 terms, not the whole vocabulary, move), document-
    frequency and corpus stats join back as broadcast 1-to-3-row
    aggregates, and the final top-10 is a TakeOrderedAndProject bounded
    take — no global sort. Fully tie-broken (score desc, doc_id) and
    rounded to 4dp for cross-engine ln() parity (same contract as
    tfidf_top_terms)."""
    from ..core.session import cache_parallelism

    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    tok = d.select("doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term"))
    # cache(): tf feeds BOTH document-frequency and scoring — without it
    # the tokenize/explode corpus scan runs twice (DataFrame DAGs don't
    # share subplans). The frame is ≤ |docs|·|terms| rows.
    tf = (
        tok.where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.min("dl").alias("dl"))
        .coalesce(cache_parallelism(spark))
        .cache()
    )
    stats = d.agg(
        F.count("*").alias("n"), F.avg(F.size(toks)).alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", (idf * F.col("tf") * (_BM25_K1 + 1) / denom).alias("s")
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("s"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


@query(
    "pmi_collocations",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    uni AS (
        SELECT u AS w, count(*) AS c1
        FROM (SELECT unnest(t) AS u FROM toks) GROUP BY w
    ),
    bi AS (
        SELECT b AS bigram, count(*) AS c2 FROM (
            SELECT unnest(list_transform(range(len(t) - 1),
                          i -> t[i+1] || ' ' || t[i+2])) AS b
            FROM toks WHERE len(t) >= 2
        ) GROUP BY bigram
    ),
    tot AS (
        SELECT (SELECT CAST(sum(c1) AS BIGINT) FROM uni) AS t1,
               (SELECT CAST(sum(c2) AS BIGINT) FROM bi) AS t2
    )
    SELECT bigram, c2 AS n_pairs,
           round(ln((c2 * 1.0 / t2)
                 / ((ua.c1 * 1.0 / t1) * (ub.c1 * 1.0 / t1))), 4) AS pmi
    FROM bi CROSS JOIN tot
    JOIN uni ua ON ua.w = string_split(bigram, ' ')[1]
    JOIN uni ub ON ub.w = string_split(bigram, ' ')[2]
    WHERE c2 >= 5
    ORDER BY pmi DESC, bigram LIMIT 15
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction by pointwise mutual information —
    PMI(w1,w2) = ln(p(w1w2) / (p(w1)p(w2))) over adjacent word pairs
    with a minimum-support cutoff, top-15. The statistical phrase
    detector corpus pipelines run before vocabulary building (word2vec
    phrases, tokenizer merges). Bigrams come from the zip-of-shifted-
    slices construction (split once per row); unigram counts join back
    as a BROADCAST (vocabulary ≪ corpus); ordering uses the ROUNDED pmi
    on both engines so the limit-15 cut is cross-engine deterministic.
    Two count shuffles + one bounded take."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    zipped = F.arrays_zip(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1))
    bigrams = F.transform(zipped, lambda s: F.concat_ws(" ", s["0"], s["1"]))
    # Two inherent corpus scans (unigram leg, bigram leg), and ONLY
    # two: the unigram counts are cached (vocabulary-sized) because
    # they feed three consumers (both join sides + the t1 normalizer),
    # and both normalizers ride their count frames as whole-frame
    # WINDOW sums — the earlier form re-planned the corpus scan for t1
    # and AGAIN for t2 (5 scans total; psi-class trap, removed r8).
    # t2 is summed over the PRE-cutoff bigram counts (support cutoff
    # applies to candidates, not the normalizer).
    from pyspark.sql import Window

    wall = Window.partitionBy()
    uni = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
        .withColumn("t1", F.sum("c1").over(wall).cast("bigint"))
        .cache()
    )
    bi = (
        d.where(n >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c2"))
        .withColumn("t2", F.sum("c2").over(wall).cast("bigint"))
        .where(F.col("c2") >= 5)
    )
    ua = uni.select(
        F.col("w").alias("w1"), F.col("c1").alias("c1a"), "t1"
    )
    ub = uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1b"))
    parts = F.split(F.col("bigram"), " ")
    scored = (
        bi.withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .select(
            "bigram",
            F.col("c2").alias("n_pairs"),
            F.round(
                F.log(
                    (F.col("c2") * 1.0 / F.col("t2"))
                    / ((F.col("c1a") * 1.0 / F.col("t1")) * (F.col("c1b") * 1.0 / F.col("t1")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "bigram").limit(15)


@query(
    "udtf_sentence_stats",
    oracle="""
    WITH s AS (
        SELECT lang, unnest(string_split(text, '. ')) AS sentence
        FROM documents
    )
    SELECT lang,
           count(*) AS n_sentences,
           CAST(sum(len(string_split(sentence, ' '))) AS BIGINT) AS n_tokens,
           CAST(max(length(sentence)) AS BIGINT) AS max_sentence_chars
    FROM s GROUP BY lang
    """,
)
def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation through a genuine Spark 4 **Python UDTF**
    (table function: one doc row in, one row PER SENTENCE out) applied
    with LATERAL — the API surface for set-returning python logic that
    ``explode(split(...))`` can't express once segmentation needs real
    code (abbreviation handling, model-based splitting). Arrow-enabled
    (``useArrow=True`` → ArrowEvalPythonUDTF, plan-asserted: never
    row-pickling BatchEvalPythonUDTF), partition-parallel, and the
    downstream rollup is an ordinary map-side-combined shuffle. The
    trivial '. ' split rule keeps the oracle expressible; a smarter
    splitter swaps into ``eval`` without touching the plan shape."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence string, n_tokens int", useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            for s in text.split(". "):
                yield s, len(s.split(" "))

    spark.udtf.register("bdip_sentence_split", SentenceSplit)
    d = table(spark, sf_dir, "documents").select("lang", "text")
    d.createOrReplaceTempView("bdip_docs_for_udtf")
    out = spark.sql(
        """
        SELECT lang, s.sentence, s.n_tokens
        FROM bdip_docs_for_udtf, LATERAL bdip_sentence_split(text) AS s
        """
    )
    return out.groupBy("lang").agg(
        F.count("*").alias("n_sentences"),
        F.sum("n_tokens").alias("n_tokens"),
        F.max(F.length("sentence")).cast("bigint").alias("max_sentence_chars"),
    )


@query(
    "bm25_ndcg_eval",
    oracle=f"""
    WITH {_DUCK_BM25_CTES},
    rel AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '),
                   t -> t IN {_BM25_TERMS})) AS rel
        FROM documents
    ),
    hits AS (
        SELECT r.rel,
               row_number() OVER (ORDER BY k.bm25 DESC, k.doc_id) AS rnk
        FROM ranked10 k JOIN rel r USING (doc_id)
    ),
    ideal AS (
        SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
        FROM rel ORDER BY rel DESC, doc_id LIMIT 10
    ),
    d AS (SELECT sum((pow(2, rel) - 1) / log2(rnk + 1)) AS dcg FROM hits),
    i AS (SELECT sum((pow(2, rel) - 1) / log2(rnk + 1)) AS idcg FROM ideal)
    SELECT CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_retrieved,
           round(d.dcg, 6) AS dcg,
           round(i.idcg, 6) AS idcg,
           round(d.dcg / i.idcg, 6) AS ndcg
    FROM d, i
    """,
)
def bm25_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the retrieval layer: NDCG@10 of
    the BM25 top-10 against graded relevance (relevance = query-term
    occurrence count — the label a search-eval pipeline would source
    from judgments; here a pure function of the text so the whole
    metric sits under the correctness hash). DCG uses the standard
    (2^rel − 1)/log2(rank+1) gains; IDCG ranks the WHOLE corpus by
    relevance (an ideal ranking the retriever never saw), so ndcg < 1
    genuinely measures ranking loss, not a self-graded tautology.

    Parity: gains are exact integers over both engines; only log2 can
    wobble a final ulp, absorbed by the 6dp round of three scalars.
    Ties in the ideal ranking don't affect IDCG (same gain multiset in
    any tie order).

    Scale: the scored/candidate side is the shared BM25 pipeline
    (posting lists of the query terms only); relevance is a map-side
    array filter; both top-10s are bounded takes (TakeOrderedAndProject
    / per-partition heaps), and the windows that assign ranks see 10
    rows each. Evaluation cost is retrieval cost + O(k)."""
    from pyspark.sql import Window

    from ..core.session import cache_parallelism

    d = table(spark, sf_dir, "documents")
    # cache(): relevance feeds the retrieved join AND the ideal top-10
    rel = (
        d.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split("text", " "),
                    lambda t: t.isin(*_BM25_TERMS),
                )
            ).alias("rel"),
        )
        .coalesce(cache_parallelism(spark))
        .cache()
    )
    top10 = bm25_search(spark, sf_dir)
    wq = Window.orderBy(F.col("bm25").desc(), "doc_id")
    hits = top10.join(rel, "doc_id").withColumn("rnk", F.row_number().over(wq))
    wi = Window.orderBy(F.col("rel").desc(), "doc_id")
    ideal = (
        rel.orderBy(F.col("rel").desc(), "doc_id")
        .limit(10)
        .withColumn("rnk", F.row_number().over(wi))
    )
    gain = lambda: (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("rnk") + 1)  # noqa: E731
    dcg = hits.agg(F.sum(gain()).alias("dcg"))
    idcg = ideal.agg(F.sum(gain()).alias("idcg"))
    nret = hits.agg(F.count("*").alias("n_retrieved"))
    return (
        nret.crossJoin(F.broadcast(dcg))
        .crossJoin(F.broadcast(idcg))
        .select(
            "n_retrieved",
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )


@query(
    "bpe_merge_pairs",
    oracle="""
    WITH words AS (
        SELECT w, count(*) AS c FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
    ),
    r1 AS (
        SELECT pair, CAST(sum(c) AS BIGINT) AS n_occ FROM (
            SELECT substr(w, i + 1, 2) AS pair, c
            FROM words, UNNEST(range(len(w) - 1)) AS t(i)
        ) GROUP BY pair
    ),
    best AS (SELECT pair FROM r1 ORDER BY n_occ DESC, pair LIMIT 1),
    merged AS (SELECT replace(w, (SELECT pair FROM best), 'A') AS w, c
               FROM words),
    r2 AS (
        SELECT pair, CAST(sum(c) AS BIGINT) AS n_occ FROM (
            SELECT substr(w, i + 1, 2) AS pair, c
            FROM merged, UNNEST(range(len(w) - 1)) AS t(i)
        ) GROUP BY pair
    ),
    top1 AS (SELECT 1 AS round, pair, n_occ,
                    row_number() OVER (ORDER BY n_occ DESC, pair) AS rn
             FROM r1),
    top2 AS (SELECT 2 AS round, pair, n_occ,
                    row_number() OVER (ORDER BY n_occ DESC, pair) AS rn
             FROM r2)
    SELECT round, rn, pair, n_occ FROM top1 WHERE rn <= 10
    UNION ALL
    SELECT round, rn, pair, n_occ FROM top2 WHERE rn <= 10
    """,
)
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training on-cluster — the first two merge rounds.

    The scale trick is the published one (Sennrich et al. 2016 impl
    note): pair statistics are computed over the DISTINCT-WORD table
    weighted by word frequency, never by rescanning the corpus — one
    corpus-wide wordcount shuffle up front, then every merge round
    touches only |vocab| rows (~1e5-1e6 regardless of corpus size, the
    100 TB invariant). Round 2 re-counts after applying the best round-1
    merge with left-to-right non-overlapping `replace` (both engines'
    replace semantics — exactly BPE's greedy merge order); the merged
    pair becomes the single symbol 'A' (absent from the lowercase
    corpus) so adjacent-symbol pairs stay char-bigrams.

    The driver-bounded 1-row collect of the best pair mirrors what a
    real BPE trainer does per round (the merge table IS driver state —
    it ships to executors as a literal, like broadcast centroids).

    Parity: integer counts only; ranking is (count DESC, pair) — fully
    tie-broken; both top-10 cuts happen after identical ranks."""
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    from ..core.session import cache_parallelism

    # dual-use across both rounds: cache so the corpus wordcount shuffle
    # runs once (the trainer keeps vocab resident between merge rounds);
    # coalesce first — cached partitioning is frozen (cache_parallelism).
    words = words.coalesce(cache_parallelism(spark)).cache()

    def pair_counts(wdf: DataFrame) -> DataFrame:
        return (
            # length guard BEFORE sequence(): for a 1-char word
            # sequence(0, -1) would generate a DESCENDING range
            wdf.where(F.length("w") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.length("w") - 2),
                        lambda i: F.col("w").substr(i + 1, F.lit(2)),
                    )
                ).alias("pair"),
                "c",
            )
            .groupBy("pair")
            .agg(F.sum("c").cast("bigint").alias("n_occ"))
        )

    r1 = pair_counts(words).coalesce(cache_parallelism(spark)).cache()
    best = r1.orderBy(F.col("n_occ").desc(), "pair").limit(1).collect()[0].pair
    merged = words.select(F.replace("w", F.lit(best), F.lit("A")).alias("w"), "c")
    r2 = pair_counts(merged)
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.col("n_occ").desc(), "pair")
    top1 = (
        r1.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 10)
        .select(F.lit(1).alias("round"), "rn", "pair", "n_occ")
    )
    top2 = (
        r2.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 10)
        .select(F.lit(2).alias("round"), "rn", "pair", "n_occ")
    )
    return top1.unionAll(top2)


@query(
    "bpe_apply_stats",
    oracle="""
    WITH words AS (
        SELECT w, count(*) AS c FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
    ),
    r1 AS (
        SELECT pair, CAST(sum(c) AS BIGINT) AS n_occ FROM (
            SELECT substr(w, i + 1, 2) AS pair, c
            FROM words, UNNEST(range(len(w) - 1)) AS t(i)
        ) GROUP BY pair
    ),
    b1 AS (SELECT pair FROM r1 ORDER BY n_occ DESC, pair LIMIT 1),
    m1 AS (SELECT replace(w, (SELECT pair FROM b1), 'A') AS w, c FROM words),
    r2 AS (
        SELECT pair, CAST(sum(c) AS BIGINT) AS n_occ FROM (
            SELECT substr(w, i + 1, 2) AS pair, c
            FROM m1, UNNEST(range(len(w) - 1)) AS t(i)
        ) GROUP BY pair
    ),
    b2 AS (SELECT pair FROM r2 ORDER BY n_occ DESC, pair LIMIT 1),
    m2 AS (SELECT replace(w, (SELECT pair FROM b2), 'B') AS w, c FROM m1)
    SELECT (SELECT pair FROM b1) AS merge1,
           (SELECT pair FROM b2) AS merge2,
           CAST((SELECT count(*) FROM words) AS BIGINT) AS n_vocab,
           CAST((SELECT sum(c * len(w)) FROM words) AS BIGINT) AS base_symbols,
           CAST((SELECT sum(c * len(w)) FROM m1) AS BIGINT) AS after1_symbols,
           CAST((SELECT sum(c * len(w)) FROM m2) AS BIGINT) AS after2_symbols
    """,
)
def bpe_apply_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of BPE training (`bpe_merge_pairs` trains the
    merges; this encodes the corpus with them): character-symbol counts
    before and after each learned merge — the tokens-per-byte
    compression curve a tokenizer team tracks per merge round. Same
    100 TB invariant as training: the corpus is wordcount-collapsed
    once, both merge applications are `replace` maps over the
    |vocab|-row frame, and each learned merge ships to executors as a
    driver literal (the merge table IS driver state, like broadcast
    centroids). All-integer output — exact parity."""
    from ..core.session import cache_parallelism

    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .coalesce(cache_parallelism(spark))
        .cache()
    )

    def pair_counts(wdf: DataFrame) -> DataFrame:
        return (
            wdf.where(F.length("w") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.length("w") - 2),
                        lambda i: F.col("w").substr(i + 1, F.lit(2)),
                    )
                ).alias("pair"),
                "c",
            )
            .groupBy("pair")
            .agg(F.sum("c").cast("bigint").alias("n_occ"))
        )

    def best(wdf: DataFrame) -> str:
        return (
            pair_counts(wdf)
            .orderBy(F.col("n_occ").desc(), "pair")
            .limit(1)
            .collect()[0]
            .pair
        )

    b1 = best(words)
    m1 = words.select(
        F.replace("w", F.lit(b1), F.lit("A")).alias("w"), "c"
    ).coalesce(cache_parallelism(spark)).cache()
    b2 = best(m1)
    m2 = m1.select(F.replace("w", F.lit(b2), F.lit("B")).alias("w"), "c")

    def symbols(wdf: DataFrame, alias: str) -> DataFrame:
        return wdf.agg(
            F.sum(F.col("c") * F.length("w")).cast("bigint").alias(alias)
        )

    stats = (
        words.agg(F.count("*").cast("bigint").alias("n_vocab"))
        .crossJoin(F.broadcast(symbols(words, "base_symbols")))
        .crossJoin(F.broadcast(symbols(m1, "after1_symbols")))
        .crossJoin(F.broadcast(symbols(m2, "after2_symbols")))
    )
    return stats.select(
        F.lit(b1).alias("merge1"),
        F.lit(b2).alias("merge2"),
        "n_vocab",
        "base_symbols",
        "after1_symbols",
        "after2_symbols",
    )


@query(
    "vocab_growth_curve",
    oracle="""
    WITH mx AS (SELECT max(doc_id) + 1 AS n FROM documents),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
             WHERE len(string_split(text, ' ')) >= 2),
    w AS (SELECT doc_id, t[i+1] || ' ' || t[i+2] AS gram
          FROM toks, UNNEST(range(len(t) - 1)) AS u(i)),
    fs AS (SELECT gram, min(doc_id) AS first_doc FROM w GROUP BY gram),
    nd AS (SELECT least(9, (first_doc * 10) // n) AS decile,
                  count(*) AS n_new
           FROM fs, mx GROUP BY 1),
    tok AS (SELECT least(9, (doc_id * 10) // n) AS decile,
                   count(*) AS n_tok
            FROM w, mx GROUP BY 1)
    SELECT t.decile,
           CAST(coalesce(nd.n_new, 0) AS BIGINT) AS n_new_types,
           CAST(sum(coalesce(nd.n_new, 0))
                OVER (ORDER BY t.decile) AS BIGINT) AS vocab_cumulative,
           CAST(t.n_tok AS BIGINT) AS n_grams
    FROM tok t LEFT JOIN nd ON t.decile = nd.decile
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve over word-BIGRAM types: per
    corpus-position decile (doc_id order), the number of bigram types
    seen for the FIRST time, the cumulative type vocabulary, and the
    bigram token volume — the V(n) ~ K·n^b curve a tokenizer-training
    or corpus-mixing review reads to judge whether more data still
    buys new vocabulary or the corpus has gone repetitive (flat tail =
    diminishing type yield). The unit is bigrams rather than unigrams
    because the unigram level is where THIS corpus's curve already
    tells its story — the ~31-word pool saturates inside decile 0 —
    while bigram types keep arriving corpus-long; a real deployment
    picks the n-gram order to match its tokenizer's merge granularity.

    The naive formulation — count distinct types over every prefix —
    is 10 overlapping corpus-sized DISTINCTs. This one inverts it:
    first-occurrence position is min(doc_id) PER TYPE (one gram-keyed
    groupBy with map-side partial mins), and the cumulative vocabulary
    is a running sum over the 10-row decile frame — the same
    "aggregate once, window over the tiny frame" shape as
    `equidepth_price_buckets`. Decile arithmetic is pure integer
    ((doc_id * 10) div N — no float boundaries); N comes from one
    bounded 1-row collect so the returned plan stays two linear scans
    (first-seen pass + token pass), both map-side-combined."""
    d = table(spark, sf_dir, "documents")
    n = d.agg(F.max("doc_id")).first()[0] + 1
    words = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - F.lit(2)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i + F.lit(1)),
            F.element_at(words, i + F.lit(2)),
        ),
    )
    # spread the docs BEFORE the bigram explode (r9, the semdedup
    # lesson): the documents scan is one small file → one partition,
    # and both consumers below re-run the explode + map-side partial
    # agg — profiled as two ~2.5 s single-task stages. A keyed
    # repartition of the 5000-doc frame is a trivial shuffle that
    # parallelizes the CPU-heavy gram generation in both subtrees.
    from ..core.session import cache_parallelism

    w = (
        d.where(F.size(words) >= 2)
        .repartition(cache_parallelism(spark), "doc_id")
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    fs = w.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    nd = fs.groupBy(
        F.least(F.lit(9), F.expr(f"(first_doc * 10) div {n}")).alias("decile")
    ).agg(F.count("*").alias("n_new"))
    tok = w.groupBy(
        F.least(F.lit(9), F.expr(f"(doc_id * 10) div {n}")).alias("decile")
    ).agg(F.count("*").alias("n_tok"))
    win = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return tok.join(nd, "decile", "left").select(
        "decile",
        F.coalesce("n_new", F.lit(0)).alias("n_new_types"),
        F.sum(F.coalesce("n_new", F.lit(0))).over(win).alias(
            "vocab_cumulative"
        ),
        F.col("n_tok").alias("n_grams"),
    )


# ---------------------------------------------------------------------------
# Zipf's-law fit: log-log OLS over the frequency head — the
# distribution-law audit for TEXT (benford_amount_audit is the numeric
# sibling); a slope far from -1 flags synthetic/templated corpora.
# ---------------------------------------------------------------------------


@query(
    "zipf_law_fit",
    oracle="""
    WITH counts AS (
        SELECT t, count(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        GROUP BY t
    ), top AS (
        SELECT t, c FROM counts ORDER BY c DESC, t LIMIT 1000
    ), arr AS (
        SELECT list(c ORDER BY c DESC, t) AS cs, count(*) AS n FROM top
    ), xy AS (
        SELECT n,
               [round(ln(i), 6) for i in generate_series(1, n)] AS xs,
               [round(ln(cs[i]), 6) for i in generate_series(1, n)] AS ys
        FROM arr
    ), s AS (
        SELECT n,
               list_reduce(xs, (a, b) -> a + b) AS sx,
               list_reduce(ys, (a, b) -> a + b) AS sy,
               list_reduce([xs[i] * ys[i] for i in generate_series(1, n)],
                           (a, b) -> a + b) AS sxy,
               list_reduce([xs[i] * xs[i] for i in generate_series(1, n)],
                           (a, b) -> a + b) AS sxx,
               list_reduce([ys[i] * ys[i] for i in generate_series(1, n)],
                           (a, b) -> a + b) AS syy
        FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           END AS zipf_slope,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
               round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6)
           END AS intercept,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <> 0 THEN
               round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           END AS r2
    FROM s
    """,
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law conformance of the corpus vocabulary: OLS fit of
    ln(count) on ln(rank) over the top-1000 tokens — the TEXT member
    of the distribution-law audit family (``benford_amount_audit``
    covers money/count columns): natural corpora track slope ~ -1 with
    high r2; templated or synthetic text bends the head. Ranks break
    count ties lexicographically so the fit is unique. On THIS corpus
    the audit fires by design: the generator's 31-token vocabulary
    yields slope ~ -0.16 at r2 ~ 0.05 — the honest "this text is
    templated" verdict (the MASE ~ 1.0 precedent: a null finding that
    proves the metric, not a broken query).

    Float parity: the ln-to-grid contract (quality.py) + the
    jackknife fold rule — each libm ln() rounds to the 1e-6 grid,
    then EVERY cross-term sum folds over the rank-ordered BOUNDED
    array (aggregate()/list_reduce, identical order both engines);
    the closed-form slope divides bit-identical doubles. Never a
    groupBy sum of off-grid values.

    Scale: one token-count shuffle with map-side combine, then a
    TakeOrdered-1000 head (per-partition heaps — the long tail never
    leaves the executors) collapsed into one bounded array row; the
    fit itself is O(1000) driver-free arithmetic."""
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "t")
        .limit(1000)
    )
    # negated count sorts struct ascending == (count desc, token asc);
    # the sorted array IS the rank order, so collect_list's
    # nondeterministic arrival order can't leak
    arr = counts.agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("c")).alias("nc"), "t", "c"))
        ).alias("a"),
        F.count("*").alias("n"),
    )
    ln6 = lambda col: F.round(F.log(col), 6)  # noqa: E731
    xy = arr.select(
        "n",
        F.transform(
            "a", lambda x, i: ln6((i + 1).cast("double"))
        ).alias("xs"),
        F.transform("a", lambda x: ln6(x["c"].cast("double"))).alias("ys"),
    )
    fold = lambda col: F.aggregate(  # noqa: E731 — fixed-order fold
        col, F.lit(0.0), lambda acc, v: acc + v
    )
    s = xy.select(
        "n",
        fold(F.col("xs")).alias("sx"),
        fold(F.col("ys")).alias("sy"),
        fold(F.zip_with("xs", "ys", lambda a, b: a * b)).alias("sxy"),
        fold(F.zip_with("xs", "xs", lambda a, b: a * b)).alias("sxx"),
        fold(F.zip_with("ys", "ys", lambda a, b: a * b)).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    # Zero-guarded (the seasonal_naive_mase discipline): n=1 makes den
    # exactly 0, and an all-equal count head zeroes the y-variance —
    # both engines pin the undefined fit terms to NULL instead of a
    # Spark-ANSI throw vs DuckDB NaN divergence.
    denr2 = den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.when(den != 0, F.round(num / den, 6)).alias("zipf_slope"),
        F.when(
            den != 0,
            F.round((F.col("sy") - num / den * F.col("sx")) / F.col("n"), 6),
        ).alias("intercept"),
        F.when(denr2 != 0, F.round(num * num / denr2, 6)).alias("r2"),
    )

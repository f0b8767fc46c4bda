"""Text analysis operators (north-star extension set): tokenization + word
count, per-language corpus stats, language-ID heuristic, quality scoring,
token counting (whitespace + BPE-ish regex), document fingerprinting.

All JVM-side built-ins (split/explode/regexp/higher-order folds) — no Python
in the hot path; at 100 TB the only shuffle is the final groupBy on
word/lang/doc keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table

#: stopword list for the langid/quality heuristics (fixture text is synthetic
#: English-ish prose, so english function words are the discriminator)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

_STOP_SQL = "('" + "', '".join(STOPWORDS) + "')"


@query(
    "q_text_tokens",
    oracle="""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
    GROUP BY w
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode + word count (the canonical text map-reduce)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_text_lang_stats",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 4) AS avg_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang
    """,
)
def q_text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
    )


@query(
    "q_text_langid",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                          w -> w IN {_STOP_SQL})) AS DOUBLE)
                     / len(string_split(text, ' ')) > 0.1
                THEN 'en' ELSE 'unk' END AS lang_pred
    FROM documents
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: function-word (stopword) density — the n-gram
    heuristic in its simplest deterministic form, comparable to the stored
    lang label."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    stop_ratio = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS))).cast("double") / F.size(ws)
    return docs.select(
        "doc_id",
        "lang",
        F.when(stop_ratio > 0.1, "en").otherwise("unk").alias("lang_pred"),
    )


@query(
    "q_text_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_obs,
           CAST(length(text) - length(regexp_replace(text, '[^a-z]', '', 'g')) AS INT)
             AS non_alpha_chars,
           round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 4)
             AS avg_token_len,
           round(CAST(len(list_filter(string_split(text, ' '),
                                      w -> w IN {_STOP_SQL})) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           len(string_split(text, ' ')) BETWEEN 15 AND 90
             AND length(text) / len(string_split(text, ' ')) < 12 AS is_quality
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, non-alpha ratio, stopword ratio, composite
    gate — the standard pre-training corpus filters."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n_tokens = F.size(ws)
    n_chars = F.length("text")
    stop_n = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_obs"),
        (n_chars - F.length(F.regexp_replace("text", "[^a-z]", ""))).alias("non_alpha_chars"),
        F.round(n_chars.cast("double") / n_tokens, 4).alias("avg_token_len"),
        F.round(stop_n.cast("double") / n_tokens, 4).alias("stopword_ratio"),
        (n_tokens.between(15, 90) & (n_chars / n_tokens < 12)).alias("is_quality"),
    )


@query(
    "q_text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT)
             AS bpe_tokens
    FROM documents
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / digit runs / single punctuation)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")).alias(
            "bpe_tokens"
        ),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_transform(string_split(text, ' '),
                            w -> CAST(ascii(w) * 31 + length(w) AS BIGINT)),
             (acc, x) -> (acc * 1000003 + x) % 2147483647) AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: polynomial rolling hash over the token stream
    (order-sensitive, unlike the bag-of-tokens dedup digests). Pure integer
    folds — exact on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    vals = F.transform(
        F.split("text", " "),
        lambda w: (F.ascii(w) * 31 + F.length(w)).cast("bigint"),
    )
    fp = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: (acc * 1000003 + x) % 2147483647,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


@query(
    "q_text_repetition",
    # r12 un-pin (VERDICT r11 next #2): the r9-r11 oracle formed each
    # bigram as ws[i] || ' ' || ws[i+1] under the lateral, so every one
    # of a doc's len-1 exploded rows carried the doc's FULL word array
    # into the (doc_id, g) aggregation — O(len^2) bytes per document,
    # the sf100 abort. The array-per-row fan-out is INCIDENTAL: project
    # the single word in the same SELECT as the lateral (narrow
    # (doc_id, i, wd) rows; the array never crosses an exchange) and
    # pair adjacent words with lead() over (doc_id, i) — identical
    # bigrams; the one NULL g per doc (i = len has no successor) is
    # exactly the row range(1, len(ws)) never generated, and two
    # non-null words can never concat to NULL, so the filter drops
    # nothing else.
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         el AS (SELECT doc_id, t.i AS i, ws[t.i] AS wd
                FROM w, LATERAL unnest(range(1, len(ws) + 1)) AS t(i)),
         bg AS (SELECT doc_id,
                       wd || ' ' || lead(wd)
                         OVER (PARTITION BY doc_id ORDER BY i) AS g
                FROM el),
         cnt AS (SELECT doc_id, g, count(*) AS c FROM bg
                 WHERE g IS NOT NULL GROUP BY 1, 2),
         top AS (SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_bigrams
                 FROM cnt GROUP BY 1)
    SELECT w.doc_id,
           CAST(len(ws) AS INT) AS n_words,
           round(len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE), 6)
             AS distinct_word_frac,
           n_bigrams,
           round(top_c / CAST(n_bigrams AS DOUBLE), 6) AS top_bigram_frac
    FROM w JOIN top USING (doc_id)
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher/C4 quality-filter
    family): distinct-word fraction and the most-frequent-bigram fraction —
    high top-bigram share marks boilerplate/template text.

    Bigram counts go through a (doc_id, bigram) groupBy, which Catalyst
    partial-aggregates map-side; ratios are int/int divisions, exact on both
    engines. At extreme scale the same signals compute shuffle-free as a
    per-row fold over the sorted bigram array (mapInPandas) — the groupBy
    form is the declarative default."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n = F.greatest(F.size(ws) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(ws, 1, n), F.slice(ws, 2, n), lambda a, b: F.concat_ws(" ", a, b)
    )
    per_doc = docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.round(
            F.size(F.array_distinct(ws)) / F.size(ws).cast("double"), 6
        ).alias("distinct_word_frac"),
        F.explode(bigrams).alias("g"),
    )
    cnt = per_doc.groupBy("doc_id", "n_words", "distinct_word_frac", "g").agg(
        F.count("*").alias("c")
    )
    return cnt.groupBy("doc_id", "n_words", "distinct_word_frac").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(
            F.max("c") / F.sum("c").cast("double"), 6
        ).alias("top_bigram_frac"),
    ).select(
        "doc_id", "n_words", "distinct_word_frac", "n_bigrams", "top_bigram_frac"
    )


#: PII scrub patterns (shared literally by the Spark builder and the DuckDB
#: oracle — both engines' regex dialects accept this subset)
_PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PII_LONG_NUM = "[0-9]{7,}"


@query(
    "q_text_scrub_pii",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_LONG_NUM}', '<NUM>', 'g') AS text
    FROM documents
    """,
)
def q_text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as a pure projection: emails and long digit runs
    replaced with placeholder tokens. Single-pass regexp_replace chain, no
    shuffle, pushdown-transparent — the shape every redaction/normalization
    stage should have at 100 TB (anything per-row and stateless belongs in
    the scan projection)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
            _PII_LONG_NUM,
            "<NUM>",
        ).alias("text"),
    )


#: chunking layout: 40-token windows advancing 30 tokens (10-token overlap)
_CHUNK_TOKENS = 40
_CHUNK_STRIDE = 30


@query(
    "q_text_chunks",
    oracle=f"""
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(list_slice(ws, i * {_CHUNK_STRIDE} + 1,
                                      i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}), ' ')
             AS chunk_text,
           CAST(least(len(ws) - i * {_CHUNK_STRIDE}, {_CHUNK_TOKENS}) AS INT)
             AS n_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         LATERAL unnest(range(0, CAST(ceil(len(ws) / {_CHUNK_STRIDE}.0) AS BIGINT)))
           AS t(i)
    """,
)
def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for training-sequence prep: fixed token windows
    with overlap (40-token chunks, 30-token stride). Pure per-row array
    slicing + explode — no shuffle, no Python; the chunk table is the unit
    downstream tokenize/pack stages consume."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n_chunks = F.ceil(F.size(ws) / F.lit(float(_CHUNK_STRIDE))).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return (
        docs.select("doc_id", ws.alias("ws"), F.explode(idx).alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(
                " ", F.slice("ws", F.col("chunk_idx") * _CHUNK_STRIDE + 1, _CHUNK_TOKENS)
            ).alias("chunk_text"),
            F.least(
                F.size("ws") - F.col("chunk_idx") * _CHUNK_STRIDE, F.lit(_CHUNK_TOKENS)
            ).cast("int").alias("n_tokens"),
        )
    )


#: repeated-passage gram length (tokens): spans shorter than this are noise
_PASSAGE_K = 5


@query(
    "q_text_repeated_passages",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT doc_id, i AS pos,
             array_to_string(ws[i+1:i+{_PASSAGE_K}], ' ') AS gram
      FROM w, LATERAL unnest(range(0, greatest(len(ws) - {_PASSAGE_K - 1}, 0)))
             AS t(i)),
    dup AS (
      SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) > 1),
    hit AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       = 1 THEN 0 ELSE 1 END AS brk
      FROM hit),
    grp AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM isl)
    SELECT doc_id, min(pos) AS start_pos,
           max(pos) + {_PASSAGE_K - 1} AS end_pos,
           max(pos) + {_PASSAGE_K} - min(pos) AS span_tokens
    FROM grp GROUP BY doc_id, island
    """,
)
def q_text_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-PASSAGE detection (the 'remove duplicated
    substrings' pass of C4/Gopher-style curation — distinct from whole-doc
    MinHash and from within-doc repetition): every maximal token span whose
    5-token gram windows all occur in more than one document.

    Pipeline: sliding token grams (pure projection) -> gram group-by
    keeping grams seen in >1 doc (THE corpus-wide exact pass; shuffle
    carries (gram, doc) pairs — production keys it by xxhash64 to ship 8
    bytes, and df-caps hot grams exactly as dedup.shingles does) -> join
    back -> per-doc ISLAND merge of overlapping hit positions into maximal
    spans (one window over (doc, pos), integer-only arithmetic).

    Output: (doc_id, token span) — the spans a curation pass would mask or
    drop. No floats anywhere, so both engines agree exactly."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    k = _PASSAGE_K
    grams = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - k),
                    lambda i: F.concat_ws(" ", F.slice("ws", i + 1, k)),
                )
            ).alias("pos", "gram"),
        )
        # the gram string never leaves the map side: the corpus-wide pass
        # shuffles an 8-byte xxhash64 key instead of ~40-byte text (measured
        # 2.5 s -> 1.8 s at sf0.1; collision odds ~ (n_grams)^2 / 2^65, so
        # results are identical to the string-keyed oracle formulation)
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.xxhash64("gram").alias("gk"),
        )
    )
    from pyspark.sql import Window

    # "gram occurs in >1 doc" == min(doc_id) != max(doc_id) over the gram's
    # window: ONE shuffle of the gram table (the window's) instead of the
    # groupBy+join-back form's two (r5; measured ~25% off the query at
    # sf0.1 and the gap widens with scale — the gram table is the 10x-heavy
    # side). min/max are streaming frame aggregates, so a hot gram costs
    # O(df) rows in one partition, same as the old groupBy's combine.
    w_gram = Window.partitionBy("gk")
    hits = (
        grams.withColumn("_mn", F.min("doc_id").over(w_gram))
        .withColumn("_mx", F.max("doc_id").over(w_gram))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("doc_id", "pos")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    run = w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    brk = F.when(F.col("pos") - F.lag("pos").over(w_doc) == 1, 0).otherwise(1)
    return (
        hits.withColumn("brk", brk)
        .withColumn("island", F.sum("brk").over(run))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + (k - 1)).alias("end_pos"),
            (F.max("pos") + k - F.min("pos")).alias("span_tokens"),
        )
        .drop("island")
    )

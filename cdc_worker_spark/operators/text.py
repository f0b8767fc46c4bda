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

"""Grouped-map UDAF and Python UDTF surface (SURVEY §2.3 "UDF / UDAF / UDTF").

The reference's extension point is the arbitrary per-event
``subscribeCallback`` (index.ts:44-71, types.js:58-63). Spark's full mapping:
scalar ``pandas_udf`` (q_udf_pandas), per-GROUP ``applyInPandas`` (the
UDAF/UDTF analogue — here), table-generating Python UDTF (here), per-batch
``foreachBatch`` (streaming/pipeline.py).

Scale: both paths are Arrow-batched. ``applyInPandas`` shuffles once on the
grouping key and hands each group to Python as a pandas frame — group size,
not table size, must fit an executor (event_type groups here; salt or
pre-aggregate if a key is hot). The UDTF processes rows streamed through
Arrow batches with no shuffle at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import udtf

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms, load_table

_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group normalization — logic that genuinely needs the whole group
    in hand (the UDAF shape). ddof=1 matches SQL stddev_samp.

    A single-row group (stddev NULL) or a constant group (stddev 0) yields
    NULL, matching the SQL window formulation exactly: DuckDB's division by
    NULL/0 stddev_samp is NULL in both cases — emitting 0.0 here would be a
    latent cross-engine hash mismatch."""
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)
    if pd.isna(sd) or sd == 0:
        z = pd.array([pd.NA] * len(pdf), dtype="Float64")  # nullable -> NULL
    else:
        z = ((pdf["value"] - mu) / sd).round(6)
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "zscore": z}
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore
    FROM events
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: z-score events within their event_type.
    One shuffle on the group key; Arrow both ways; the oracle is the pure-SQL
    window formulation of the same computation."""
    ev = load_events_ms(spark, sf_dir).select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(_zscore_group, _ZSCORE_SCHEMA)


@udtf(returnType="sent_idx int, sentence string", useArrow=True)
class SplitSentences:
    """Python UDTF: one input row -> N output rows (sentence segmentation).
    Arrow-optimized (useArrow — without it a Python UDTF evaluates
    row-at-a-time as BatchEvalPythonUDTF; caught by the registry audit), no
    shuffle; the lateral-join shape of the reference's per-event fan-out
    callbacks."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            if s:
                yield i + 1, s


@query(
    "q_udtf_sentences",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS sent_idx, parts[i] AS sentence
    FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
         LATERAL unnest(range(1, len(parts) + 1)) AS t(i)
    WHERE parts[i] <> ''
    """,
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating Python UDTF over documents.text via LATERAL join."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.lateralJoin(SplitSentences(F.col("text").outer())).select(
        "doc_id", "sent_idx", "sentence"
    )

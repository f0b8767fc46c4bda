"""Compressed-video multimodal decode (MJPEG-in-AVI) — tail registry module.

Lives apart from operators/multimodal.py ONLY because the registry order is
frozen (plans/registry.py: ADVICE r03) — new queries must append at the tail
so historical rotation-window artifacts stay exact slices of the current
order. The codec itself is functions/avi_codec.py; the decode_media_batch
branch lives in multimodal.py with the other five real codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table


#: decoded-MJPEG-clip feature rows (what a real video feature extractor emits)
MJPEG_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("mean_intensity", DoubleType()),
        StructField("min_intensity", IntegerType()),
        StructField("max_intensity", IntegerType()),
    ]
)


@query(
    "q_multimodal_decode_mjpeg",
    oracle="""
    SELECT doc_id,
           CAST(8 * (doc_id % 3 + 2) AS INT) AS width,
           CAST(8 * (doc_id % 2 + 2) AS INT) AS height,
           CAST(doc_id % 3 + 2 AS INT) AS n_frames,
           CAST(64 * (doc_id % 3 + 2) * (doc_id % 2 + 2)
                * (doc_id % 3 + 2) AS BIGINT) AS n_pixels,
           round(avg(2 * ((doc_id * 29 + f * 17 + b * 53) % 128)), 6)
             AS mean_intensity,
           CAST(min(2 * ((doc_id * 29 + f * 17 + b * 53) % 128)) AS INT)
             AS min_intensity,
           CAST(max(2 * ((doc_id * 29 + f * 17 + b * 53) % 128)) AS INT)
             AS max_intensity
    FROM documents,
         LATERAL unnest(range(0, doc_id % 3 + 2)) AS tf(f),
         LATERAL unnest(range(0, (doc_id % 3 + 2) * (doc_id % 2 + 2)))
           AS tb(b)
    GROUP BY doc_id
    """,
)
def q_multimodal_decode_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL **compressed-video** decode end-to-end, oracle-checked: per doc
    a deterministic multi-frame clip (2-4 frames of 8x8 constant even-valued
    tiles, every pixel a pure function of doc_id) is ENCODED frame-by-frame
    to baseline JPEG, MUXED into an actual MJPEG AVI container (RIFF
    hdrl/movi/idx1, functions/avi_codec.py), then DEMUXED and per-frame
    DECODED back with the general T.81 decoder. Frame count comes from the
    container walk, geometry from the stream headers cross-checked against
    every decoded frame.

    Even constant tiles make the JPEG quantization round-trip exact (see
    q_multimodal_decode_jpeg), so DuckDB replays the whole
    encode -> mux -> demux -> decode loop in integer SQL over (frame,
    block) pairs — every block has the same 64 pixels, so the per-pair
    average IS the per-pixel average. A hash match proves RIFF chunk
    arithmetic (sizes, even-byte padding, movi offsets), stream selection,
    AND the transform decode are all exact. Closes the compressed-video
    seam; inter-frame (motion-compensated) codecs are what genuinely
    remains stubbed.

    Scale shape: one Arrow-batched mapInPandas projection over doc_id —
    no shuffle, no driver collect; at 100 TB the real AVIs stream through
    the same per-batch demux+decode."""
    from cdc_worker_spark.functions.avi_codec import (
        encode_mjpeg_avi,
        mjpeg_features,
    )
    from cdc_worker_spark.functions.jpeg_codec import encode_jpeg

    def gen_and_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 8 * (doc_id % 3 + 2)
                h = 8 * (doc_id % 2 + 2)
                n_frames = doc_id % 3 + 2
                tiles_x, tiles_y = w // 8, h // 8
                jpegs = []
                for f_no in range(n_frames):
                    px = bytearray()
                    for ty in range(tiles_y):
                        tile_row = [
                            bytes(
                                [2 * ((doc_id * 29 + f_no * 17
                                       + (ty * tiles_x + tx) * 53) % 128)]
                            ) * 8
                            for tx in range(tiles_x)
                        ]
                        for _ in range(8):
                            for r in tile_row:
                                px += r
                    jpegs.append(encode_jpeg(w, h, bytes(px)))
                f = mjpeg_features(encode_mjpeg_avi(w, h, jpegs))
                rows.append(
                    (
                        doc_id, f["width"], f["height"], f["n_frames"],
                        f["n_pixels"], round(f["mean_intensity"], 6),
                        f["min_intensity"], f["max_intensity"],
                    )
                )
            out = pd.DataFrame(
                rows, columns=[fld.name for fld in MJPEG_FEATURES_SCHEMA]
            )
            for c in ("doc_id", "n_pixels"):
                out[c] = out[c].astype("int64")
            for c in ("width", "height", "n_frames", "min_intensity",
                      "max_intensity"):
                out[c] = out[c].astype("int32")
            yield out

    # CPU-bound Arrow stage: restore parallelism for under-split sources
    # (no-op at real scale; ships only doc_id bigints otherwise)
    from cdc_worker_spark.operators.dedup import ensure_parallelism

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(gen_and_decode, MJPEG_FEATURES_SCHEMA)

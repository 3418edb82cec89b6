"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The pattern a 100 TB multimodal pipeline needs: media lives in a
``binary`` column (or pointers to object storage), metadata in typed
columns; decode / feature-extraction runs as Arrow-batched Python over
``mapInPandas`` (never row-at-a-time UDFs). The container has no
image/audio libraries, so the *decoders* are stubbed exactly as the
spec requires — ``decode_image``/``decode_audio`` raise
``NotImplementedError`` — while everything Spark-side (schema, batch
iteration, partitioning, output contract) is real and oracle-checked
via a deterministic feature extractor (md5 + byte stats, which DuckDB
can reproduce).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smart_meter_data_pipeline_spark.plans.registry import register
from smart_meter_data_pipeline_spark.sources.readers import load_table


def decode_image(payload: bytes) -> object:
    """STUB — real deployments plug Pillow/libvips here. The container
    ships no image codecs, so decoding is explicitly unimplemented."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; plug a decoder into extract_features' batch loop"
    )


def decode_audio(payload: bytes) -> object:
    """STUB — see :func:`decode_image`."""
    raise NotImplementedError("audio decoding not available in this environment")


def with_binary_content(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload column + typed metadata struct —
    the storage schema for multimodal rows (binary column stays
    untouched by Catalyst; metadata columns prune/push down)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.octet_length("text").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    This is where a real pipeline decodes media and emits embeddings /
    thumbnails / spectrograms; here the per-payload work is a
    deterministic md5 + byte-sum so the plumbing is verifiable. The
    batch loop shape (pandas in → pandas out, schema declared up
    front) is exactly what a decoder drops into.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "byte_sum": payloads.map(lambda b: sum(bytes(b))).astype(
                        "int64"
                    ),
                }
            )

    return binary_df.mapInPandas(batches, _FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payloads → mapInPandas feature extraction.
    The oracle recomputes md5/length in DuckDB — any drift in the
    Python batch path (encoding, batch boundaries, schema) breaks the
    hash. byte_sum has no clean SQL twin and is covered in pytest."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_content(docs)).select(
        "doc_id", "n_bytes", "content_md5"
    )


register(
    "multimodal_features",
    """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5
FROM documents
""",
)(multimodal_features)

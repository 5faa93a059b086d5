"""Streaming document-ingestion pipeline: chunk + quality-score + filter
as documents ARRIVE — the online twin of the batch corpus operators
(datapipe/chunking.py, datapipe/text.py), for the continuously-fed
crawl-ingest case the batch pipeline can't cover.

Everything here is stateless row-local transformation (flatMap +
projections), so the streaming plan needs no watermark or state store
and the micro-batch output is exactly the batch operator applied to that
batch's files — asserted by the batch-parity test
(tests/test_streaming.py). Per-source-file bookkeeping
(_metadata.file_path) gives the ingest lineage a crawl pipeline records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpdb_spark.datapipe.chunking import chunk_documents
from gpdb_spark.datapipe.text import quality_features


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (schema probed with a
    metadata-only batch read — the streaming source needs it explicit)."""
    probe = (
        spark.read.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)
    )
    return (
        spark.readStream.schema(probe.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def chunked_stream(
    docs: DataFrame, size: int = 256, overlap: int = 32, min_quality_tokens: int = 5
) -> DataFrame:
    """Quality-gate then chunk an incoming document stream. Stateless:
    filter -> flatMap, append mode, no watermark needed."""
    scored = quality_features(docs)
    kept = scored.where(F.col("n_tokens") >= min_quality_tokens).select(
        "doc_id", "text"
    )
    return chunk_documents(kept, size=size, overlap=overlap)

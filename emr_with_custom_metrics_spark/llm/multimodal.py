"""Multimodal columns: opaque binary payloads + typed metadata ([EXT]).

Images/audio/video are ``BinaryType`` columns with typed metadata alongside
(SURVEY.md §1.4). The container has no codec libraries, so the DECODE step
is stubbed (deterministic fake, clearly marked) — but the Spark-side
plumbing is real and tested: schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning of frame explosions.

The fake decoder derives metadata deterministically from the payload length
so the mapInPandas queries remain SQL-oracle-able — the harness then checks
the whole Arrow round-trip, not just "it ran".
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_fanned
from emr_with_custom_metrics_spark.registry import register

DECODED_SCHEMA = "doc_id bigint, n_bytes bigint, width int, height int, n_frames int"


def fake_decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder. A real deployment plugs Pillow/ffmpeg in here; the
    container has neither, so metadata is derived deterministically from the
    payload. Raises for empty payloads like a real decoder would."""
    if not payload:
        raise NotImplementedError("real image decoding requires a codec library")
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 16 + 1)


def decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """mapInPandas worker: Arrow batches in, decoded-metadata batches out.
    Column-wise vectorized except the per-payload decode call itself."""
    import pandas as pd

    for pdf in batches:
        decoded = pdf["payload"].map(fake_decode_image)  # single decode pass
        w, h, fr = zip(*decoded) if len(decoded) else ((), (), ())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": pd.Series(w, index=pdf.index, dtype="int32"),
                "height": pd.Series(h, index=pdf.index, dtype="int32"),
                "n_frames": pd.Series(fr, index=pdf.index, dtype="int32"),
            }
        )


def with_payload(documents: DataFrame) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 payload of the text —
    stands in for image/audio bytes; the pipeline does not look inside)."""
    return documents.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


@register(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS INTEGER) AS width,
           CAST(OCTET_LENGTH(ENCODE(text)) % 480 + 1 AS INTEGER) AS height,
           CAST(OCTET_LENGTH(ENCODE(text)) % 16 + 1 AS INTEGER) AS n_frames
    FROM documents
    """,
    doc="Binary decode via mapInPandas (Arrow-batched): payload → typed "
    "metadata. Decoder is a deterministic stub; the Arrow plumbing is real.",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(load_fanned(spark, sf_dir, "documents"))
    return d.mapInPandas(decode_batch, schema=DECODED_SCHEMA)


FEATURE_DIM = 16
FEATURE_SCHEMA = "doc_id bigint, feature array<float>, feat_norm double"


def fake_feature_extract(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB feature extractor (a real deployment plugs a vision/audio model
    here). Deterministic: byte-sum folded per position — stable across runs
    and machines, so downstream similarity plumbing is testable."""
    if not payload:
        raise NotImplementedError("real feature extraction requires a model runtime")
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [v / 997.0 for v in acc]


def feature_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    import math

    import pandas as pd

    for pdf in batches:
        feats = pdf["payload"].map(fake_feature_extract)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "feature": feats,
                "feat_norm": feats.map(lambda v: math.sqrt(sum(x * x for x in v))),
            }
        )


@register(
    "multimodal_feature_extract",
    oracle=None,  # byte-level fold; not worth re-expressing in SQL → rows-only
    doc="Binary → embedding feature extraction via mapInPandas: the Arrow "
    "round-trip that matters for multimodal pipelines — array<float> OUTPUT "
    "from a pandas stage, feeding the similarity operators downstream.",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(load_fanned(spark, sf_dir, "documents"))
    return d.mapInPandas(feature_batch, schema=FEATURE_SCHEMA)


@register(
    "multimodal_binary_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_blobs,
           CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS max_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_payloads
    FROM documents GROUP BY source
    """,
    doc="Binary column statistics per source — storage accounting for blob "
    "datasets, all JVM-side.",
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_fanned(spark, sf_dir, "documents")
    blob_len = F.length(F.encode("text", "UTF-8"))
    return d.groupBy("source").agg(
        F.count("*").alias("n_blobs"),
        F.sum(blob_len).cast("bigint").alias("total_bytes"),
        F.max(blob_len).cast("bigint").alias("max_bytes"),
        F.count_distinct(F.md5("text")).alias("n_distinct_payloads"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(UNNEST(GENERATE_SERIES(0,
             CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) - 1, 100)) AS BIGINT) AS frame_offset
    FROM documents WHERE doc_id < 50
    """,
    doc="Frame sampling: explode a stride-100 offset sequence per blob — "
    "the video-frame-extraction access pattern (map-side explode, no "
    "shuffle).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_fanned(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    n = F.length(F.encode("text", "UTF-8")).cast("bigint")
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n - 1, F.lit(100).cast("bigint"))).alias(
            "frame_offset"
        ),
    )

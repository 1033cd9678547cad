"""Multimodal (image/audio/video) column operators.

Media rides through the engine as opaque `binary` columns with a typed
metadata struct alongside — the parquet layout that scales: content bytes
never pass through the JVM heap twice (no string codec), metadata columns
stay prunable, and partition sizing accounts for blob width.

Decode/feature-extraction executes as Arrow-batched Pandas UDFs over
`mapInPandas` — the Spark-side plumbing (schema, batch shape, partitioning)
is real and tested; the codec call itself is STUBBED (`_decode_image_stub`)
because media libraries (Pillow/ffmpeg) are not in this container. Swapping
the stub for a real decoder changes no plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feat array<double>"
)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-Column metadata pass: byte length + content digest — no Python,
    runs at scan speed. The cheap pre-filter before any decode."""
    return df.select(
        "media_id",
        "kind",
        F.length("content").alias("n_bytes"),
        F.sha2("content", 256).alias("sha256"),
        F.col("meta.mime").alias("mime"),
    )


def _decode_image_stub(content: bytes) -> list[float]:
    """STUB — deterministic fake 8-dim feature vector from content bytes.
    Replace with a real decoder (Pillow → resize → embed); the container
    image has no media codecs. Deterministic so tests are stable."""
    if content is None:
        raise NotImplementedError("no decoder for null content")
    return [float(b) / 255.0 for b in content[:8]] + [0.0] * max(
        0, 8 - len(content[:8])
    )


def extract_features(df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Decode + featurize via mapInPandas: Arrow batches of (id, bytes) in,
    feature rows out. Partition sizing is the caller's lever — media rows
    are wide, so repartition to keep batches in executor memory
    (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch rows)."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            content = pdf["content"]
            # column-at-a-time over the Arrow batch — no row loop; the
            # decode call is the only per-element work (batched through the
            # codec when a real decoder replaces the stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(
                        lambda c: len(c) if c is not None else 0
                    ),
                    "sha256": content.map(
                        lambda c: hashlib.sha256(c).hexdigest()
                        if c is not None
                        else None
                    ),
                    "feat": content.map(
                        lambda c: _decode_image_stub(c)
                        if c is not None
                        else None
                    ),
                }
            )

    return df.select("media_id", "kind", "content").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode each video row into the frame
    timestamps a decoder would extract (the decode itself is stubbed — the
    row fan-out, schema, and partitioning are the Spark-side contract)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )

"""Multimodal column handling (north-star E5): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed through
Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container):
``decode_payload`` raises NotImplementedError, and
``fake_decode_features`` is the deterministic stand-in used by tests —
the Spark-side plumbing (schema, batch shape, partitioning) is real.

Scale posture: payloads stay in the executor as Arrow buffers;
``mapInPandas`` streams record batches so one task never materializes
a partition of blobs at once. Partition by content-hash prefix so
co-occurring giant files spread evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.StructType(
            [
                T.StructField("n_bytes", T.LongType()),
                T.StructField("sha256", T.StringType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
            ]
        )),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, n_chunks int, mean_byte double, feature array<float>"
)


def decode_payload(payload: bytes, mime: str):
    """Real decoder hook — requires image/audio libraries not present
    in this environment."""
    raise NotImplementedError(
        "media decoding requires optional codecs (PIL/ffmpeg); "
        "use fake_decode_features for deterministic tests"
    )


def as_media_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Promote a text corpus to the media-table shape: payload =
    utf-8 bytes, typed metadata computed engine-side (octet length +
    content hash), mime constant."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(text_col), 256).alias("sha256"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def fake_decode_features(media: DataFrame, chunk: int = 256) -> DataFrame:
    """Deterministic stand-in for decode/feature-extract: per payload,
    chunk count and mean byte value, plus a fixed-length feature vector
    of per-chunk means (padded with 0). Arrow-batched — the real
    decoder drops into the same iterator shape."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload or b"")
                n = len(buf)
                n_chunks = (n + chunk - 1) // chunk
                arr = np.frombuffer(buf, dtype=np.uint8)
                mean_byte = float(arr.mean()) if n else 0.0
                feat = [
                    float(arr[i * chunk : (i + 1) * chunk].mean())
                    for i in range(min(n_chunks, 8))
                ]
                feat += [0.0] * (8 - len(feat))
                rows.append((int(media_id), n, n_chunks, mean_byte, feat))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "n_chunks", "mean_byte", "feature"],
            )

    from ..sources.tables import rebalance

    # spread before the Python stage: one input split would serialize
    # the whole corpus through a single Arrow worker
    return rebalance(media.select("media_id", "payload")).mapInPandas(
        _extract, FEATURE_SCHEMA
    )

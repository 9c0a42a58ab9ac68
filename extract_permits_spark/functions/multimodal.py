"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the Spark-native layout for 100 TB multimodal corpora (the binary stays in
parquet/ORC pages, metadata columns prune without touching payload bytes).

Decode / feature-extraction run as Arrow-batched ``mapInPandas`` — the
only sane shape for per-item Python work (codec libs aren't expressible in
SQL). In this container no image/audio libs exist, so the actual decode is
STUBBED: ``decode_stub_features`` computes real, deterministic
byte-level features (so the plumbing is testable end-to-end), and
``decode_image`` raises NotImplementedError where PIL/libav would be
called. The Spark-side contract — schemas, batch iteration, partition
behavior — is the real thing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: fake a media table from the documents fixture — text bytes
    become the opaque payload. Exercises the real binary-column path."""
    payload = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Where a real pipeline calls PIL.Image.open / torchvision decode.
    Image libs are not available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/torchvision, not present in this environment; "
        "swap this function body in deployment"
    )


def _features_batch(batch: "pd.DataFrame") -> "pd.DataFrame":
    import pandas as pd

    payloads = batch["payload"]
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "n_bytes": payloads.map(len).astype("int64"),
            "byte_mean": payloads.map(
                lambda b: round(sum(b) / len(b), 6) if len(b) else 0.0
            ),
            "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-level feature extraction via mapInPandas.

    Arrow-batched: each Python worker sees pandas batches, never rows.
    The stand-in for decode→embed; the deployment version swaps
    ``_features_batch`` for a codec+model body with the same signature.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            yield _features_batch(b)

    return media.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video-frame-sampling *plan* shape: explode byte offsets as stand-in
    frame indices (real impl: pts timestamps from the container index).
    Shows the explode-then-process partition pattern without a codec."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media.select(
        "media_id", F.explode(offsets).alias("frame_offset")
    )

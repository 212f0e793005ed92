"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema, batching, partition behavior) is real
and tested; the actual media decode is stubbed — the decode libraries
(PIL/ffmpeg/etc.) are not in this environment. ``decode_image`` raises
NotImplementedError; ``fake_featurize`` is the deterministic stand-in
used by tests and the registry entry so the pipeline shape is
exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, checksum bigint, "
    "width int, height int"
)


def attach_binary_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build the multimodal frame: an opaque binary payload column plus
    typed metadata. In production the payload comes off object storage;
    here it is the utf-8 bytes of the text column (deterministic)."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/png").alias("media_type"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.length(F.col(text_col)).alias("orig_len"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - by design
    """Real media decode — STUB. Needs an image library not present in
    this environment; the Spark plumbing around it is real."""
    raise NotImplementedError(
        "image decode requires an imaging library not available here; "
        "use fake_featurize for the deterministic pipeline stand-in"
    )


def fake_featurize(media: DataFrame) -> DataFrame:
    """mapInPandas over the binary column — Arrow batch transfer, no
    per-row Python loop on the driver. Partitioning is preserved
    (narrow op).

    The batch function is a self-contained closure (stdlib+pandas only)
    so cloudpickle ships it BY VALUE — Spark's Python workers do not
    have this package on their import path.
    """

    def featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Deterministic fake 'decode': byte length + additive checksum,
        # plus metadata passthrough — the exact shape a thumbnailer /
        # frame-sampler plugs into.
        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: sum(b) % 1_000_003).astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                }
            )

    return media.mapInPandas(featurize_batches, schema=MEDIA_SCHEMA)

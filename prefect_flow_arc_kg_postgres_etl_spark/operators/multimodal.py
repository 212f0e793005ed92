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


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "thumb_width int, thumb_height int, thumb_len bigint"
)


def resize_thumbnails(media: DataFrame, max_side: int = 128) -> DataFrame:
    """Thumbnail pass: decode -> resize -> re-encode, as mapInPandas over
    the binary column (1:1, narrow, Arrow-batched). The decode/resize
    core is gated behind an import-try of PIL: with an imaging library
    present the real path runs; without one a deterministic fake stands
    in (scaled dims by aspect ratio, payload truncated proportionally)
    so the Spark plumbing — schema, batching, partitioning — is
    exercised either way."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        try:  # pragma: no cover - imaging lib not in this environment
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False

        for pdf in batches:
            w = pdf["meta"].map(lambda m: m["width"]).astype("int32")
            h = pdf["meta"].map(lambda m: m["height"]).astype("int32")
            scale = (max_side / w.combine(h, max)).clip(upper=1.0)
            tw = (w * scale).astype("int32").clip(lower=1)
            th = (h * scale).astype("int32").clip(lower=1)
            if have_pil:  # pragma: no cover
                # Real path: Image.open(io.BytesIO(b)).thumbnail(...)
                raise NotImplementedError("wire PIL decode here on a real cluster")
            # Deterministic fake: thumbnail payload ~ payload scaled by
            # the same area ratio the real resize would produce.
            plen = pdf["payload"].map(len).astype("int64")
            tlen = (plen * (tw.astype("int64") * th) // (w.astype("int64") * h)).clip(lower=1)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": w,
                    "height": h,
                    "thumb_width": tw,
                    "thumb_height": th,
                    "thumb_len": tlen,
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset bigint, frame_checksum bigint"


def sample_frames(media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Frame sampling: 1:N row expansion inside mapInPandas (one output
    row per sampled frame), the shape a video decoder plugs into. The
    decoder is stubbed deterministically — frame i is the byte window at
    offset i*every_n_bytes, its checksum a rolling sum — while the
    expansion, schema and Arrow batching are the real pipeline.

    At scale this is the canonical pattern for video: the expansion
    happens executor-side per batch (never collect-explode on the
    driver), and downstream ops see ordinary rows."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        out_ids, out_idx, out_off, out_sum = [], [], [], []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    off = i * every_n_bytes
                    window = payload[off : off + 64]
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_off.append(off)
                    out_sum.append(sum(window) % 1_000_003)
            if out_ids:
                yield _pd.DataFrame(
                    {
                        "doc_id": _pd.Series(out_ids, dtype="int64"),
                        "frame_idx": _pd.Series(out_idx, dtype="int32"),
                        "frame_offset": _pd.Series(out_off, dtype="int64"),
                        "frame_checksum": _pd.Series(out_sum, dtype="int64"),
                    }
                )
                out_ids, out_idx, out_off, out_sum = [], [], [], []

    return media.mapInPandas(frame_batches, schema=FRAME_SCHEMA)

"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The payloads are REAL image binaries: deterministic 24-bit BMPs built
with stdlib struct packing (``synthesize_bmp_media``), and the decode
step (``decode_media``) genuinely parses them — via PIL when an imaging
library is present (import-try), else a stdlib BMP header+pixel parser.
Both paths produce identical output by construction, and because the
synthesis is a closed-form function of doc_id, every decoded field is
verifiable against an independent formula (tests do exactly that).

Audio/video decode (ffmpeg-class libraries) stays represented by the
frame-sampler's deterministic byte-window stand-in — the 1:N expansion
plumbing is the real pattern a video decoder plugs into.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, checksum bigint, "
    "width int, height int"
)

_CHECK_MOD = 1_000_003


def _bmp_dims(doc_id: int) -> tuple[int, int, int]:
    """Closed-form synthetic image parameters: (width, height, pixel
    value). Width 16..32, height 8..18, one flat color per image —
    every decoded field below is derivable from doc_id alone, which is
    what makes the decode independently checkable."""
    return 16 + doc_id % 17, 8 + doc_id % 11, (doc_id * 31) % 251


def _bmp_bytes(w: int, h: int, v: int) -> bytes:
    """A real, spec-compliant 24-bit BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up padded pixel rows)."""
    stride = (3 * w + 3) // 4 * 4
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    row = bytes([v, v, v] * w) + b"\x00" * (stride - 3 * w)
    return header + info + row * h


def _parse_bmp(payload: bytes) -> tuple[int, int, int]:
    """stdlib BMP decode: (width, height, pixel-byte checksum). Reads
    the declared header geometry and sums the pixel bytes row by row,
    skipping stride padding — a genuine parse of the binary, not a
    metadata passthrough."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    stride = (3 * w + 3) // 4 * 4
    total = 0
    for y in range(abs(h)):
        row = payload[offset + y * stride : offset + y * stride + 3 * w]
        total += sum(row)
    return w, abs(h), total % _CHECK_MOD


def synthesize_bmp_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real BMP binary per document — the multimodal frame as
    it would come off object storage, minus the fetch. mapInPandas so
    the byte packing runs executor-side per Arrow batch (1:1, narrow)."""

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd
        import struct as _struct

        def dims(doc_id):
            return 16 + doc_id % 17, 8 + doc_id % 11, (doc_id * 31) % 251

        def bmp(doc_id):
            w, h, v = dims(doc_id)
            stride = (3 * w + 3) // 4 * 4
            img_size = stride * h
            header = _struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
            info = _struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
            )
            row = bytes([v, v, v] * w) + b"\x00" * (stride - 3 * w)
            return header + info + row * h

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": pdf[id_col].map(bmp),
                    "media_type": "image/bmp",
                }
            )

    return docs.select(id_col).mapInPandas(
        synth_batches, schema="doc_id bigint, payload binary, media_type string"
    )


def decode_media(media: DataFrame) -> DataFrame:
    """REAL image decode over the binary column (mapInPandas, Arrow
    batches): PIL when available (import-try), else the stdlib BMP
    parser — identical output either way. Emits per-image geometry and
    a pixel checksum actually computed from the decoded bytes."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd
        import struct as _struct

        try:  # pragma: no cover - imaging lib optional in this env
            import io as _io

            from PIL import Image as _Image

            def decode(payload):
                img = _Image.open(_io.BytesIO(payload)).convert("RGB")
                w, h = img.size
                total = sum(r + g + b for r, g, b in img.getdata())
                return w, h, total % _CHECK_MOD

        except ImportError:

            def decode(payload):
                if payload[:2] != b"BM":
                    raise ValueError("not a BMP payload")
                (offset,) = _struct.unpack_from("<I", payload, 10)
                w, h = _struct.unpack_from("<ii", payload, 18)
                (bpp,) = _struct.unpack_from("<H", payload, 28)
                if bpp != 24:
                    raise ValueError(f"unsupported bpp {bpp}")
                stride = (3 * w + 3) // 4 * 4
                total = 0
                for y in range(abs(h)):
                    row = payload[offset + y * stride : offset + y * stride + 3 * w]
                    total += sum(row)
                return w, abs(h), total % _CHECK_MOD

        for pdf in batches:
            decoded = pdf["payload"].map(decode)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "checksum": decoded.map(lambda t: t[2]).astype("int64"),
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                }
            )

    return media.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)


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


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "thumb_width int, thumb_height int, thumb_len bigint"
)


def resize_thumbnails(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Thumbnail pass: decode -> resize -> re-encode as BMP, mapInPandas
    over the binary column (1:1, narrow, Arrow-batched). With PIL the
    pixels are really resampled and re-encoded; without it the stdlib
    path parses the source geometry and computes the re-encoded size
    from the BMP layout (54-byte header + padded rows) — the thumbnail
    dims come from the same formula either way, so output is identical
    across environments. thumb dims: scale = min(1, max_side/max(w,h)),
    floor, clamp >= 1."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd
        import struct as _struct

        def thumb_dims(w, h):
            scale = min(1.0, max_side / max(w, h))
            return max(1, int(w * scale)), max(1, int(h * scale))

        def bmp_len(w, h):
            return 54 + h * ((3 * w + 3) // 4 * 4)

        try:  # pragma: no cover - imaging lib optional in this env
            import io as _io

            from PIL import Image as _Image

            def resize(payload):
                img = _Image.open(_io.BytesIO(payload)).convert("RGB")
                w, h = img.size
                tw, th = thumb_dims(w, h)
                buf = _io.BytesIO()
                img.resize((tw, th)).save(buf, format="BMP")
                return w, h, tw, th, len(buf.getvalue())

        except ImportError:

            def resize(payload):
                w, h = _struct.unpack_from("<ii", payload, 18)
                h = abs(h)
                tw, th = thumb_dims(w, h)
                return w, h, tw, th, bmp_len(tw, th)

        for pdf in batches:
            r = pdf["payload"].map(resize)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "width": r.map(lambda t: t[0]).astype("int32"),
                    "height": r.map(lambda t: t[1]).astype("int32"),
                    "thumb_width": r.map(lambda t: t[2]).astype("int32"),
                    "thumb_height": r.map(lambda t: t[3]).astype("int32"),
                    "thumb_len": r.map(lambda t: t[4]).astype("int64"),
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


def land_media_files(media: DataFrame, out_dir: str, id_col: str = "doc_id") -> None:
    """Land each payload as an individual media FILE (<id>.bmp) —
    executor-side writes from foreachPartition, the shape of an object-
    storage export (one PUT per asset). Local mode shares a filesystem,
    so the landing dir is directly readable back; on a cluster the same
    code targets a fuse mount or swaps the open() for a storage client."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows) -> None:
        for row in rows:
            with open(os.path.join(out_dir, f"{row[id_col]}.bmp"), "wb") as f:
                f.write(bytes(row["payload"]))

    media.foreachPartition(write_partition)


def read_media_files(spark, in_dir: str) -> DataFrame:
    """Ingest a directory of media assets through Spark's binaryFile
    source — the standard entry point for image/audio corpora on object
    storage: each file becomes (path, modificationTime, length,
    content) with NO parsing on the scan; decode stays a downstream
    Arrow-batched step (decode_media). The asset id rides the file
    name, recovered scan-side with a regexp (zero-cost projection).

    binaryFile partitions by files (maxPartitionBytes applies), so a
    billion-asset corpus parallelizes by file count; pair with
    wholeText-style small-file compaction upstream when assets are
    tiny."""
    raw = spark.read.format("binaryFile").load(in_dir)
    return raw.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bmp$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
        F.lit("image/bmp").alias("media_type"),
    )


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, duration_us bigint, "
    "amplitude_sum bigint"
)

_WAV_RATE = 8000


def _wav_params(doc_id: int) -> int:
    """Closed-form synthetic clip length (samples): 800..999 — like the
    BMP dims, every decoded field derives from doc_id alone."""
    return 800 + doc_id % 200


def _wav_bytes(doc_id: int) -> bytes:
    """A real, spec-compliant mono 8-bit PCM WAV (RIFF header + fmt
    chunk + data chunk); sample i is (doc_id + i) % 256."""
    n = _wav_params(doc_id)
    data = bytes((doc_id + i) % 256 for i in range(n))
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, _WAV_RATE, _WAV_RATE, 1, 8)
    riff = struct.pack("<4sI4s", b"RIFF", 36 + n, b"WAVE")
    return (
        riff
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", n)
        + data
    )


def _parse_wav(payload: bytes) -> tuple[int, int, int]:
    """stdlib WAV decode: (sample_rate, n_samples, amplitude_sum) —
    validates the RIFF/WAVE magic and the fmt chunk (PCM, mono, 8-bit)
    and sums the PCM bytes: a genuine parse, not a passthrough."""
    if len(payload) < 44:
        # short-circuit BEFORE struct.unpack_from, which would raise
        # struct.error instead of the documented ValueError
        raise ValueError("truncated WAV header")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    if payload[12:16] != b"fmt ":
        raise ValueError("missing fmt chunk")
    size, codec, channels, rate, _, _, bits = struct.unpack_from(
        "<IHHIIHH", payload, 16
    )
    if (size, codec, channels, bits) != (16, 1, 1, 8):
        raise ValueError("unsupported WAV encoding")
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    (n,) = struct.unpack_from("<I", payload, 40)
    data = payload[44 : 44 + n]
    if len(data) != n:
        raise ValueError("truncated data chunk")
    return rate, n, sum(data)


def synthesize_wav_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): real WAV binaries built EXECUTOR-SIDE inside
    mapInPandas (the driver never materializes payloads) — the audio
    twin of synthesize_bmp_media."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_wav_bytes(int(i)) for i in ids]}
            )

    return docs.select(id_col).mapInPandas(gen, "doc_id bigint, payload binary")


def decode_audio(media: DataFrame) -> DataFrame:
    """Audio feature extraction over binary payloads: parse the WAV
    container, emit rate / sample count / exact microsecond duration /
    amplitude sum per clip. Same Arrow-batched mapInPandas shape as the
    image decode — the slot an ffmpeg-class decoder plugs into; the
    stdlib PCM parser keeps the pipeline runnable (and closed-form
    checkable) without audio libraries in the image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sample_rate", "n_samples", "duration_us", "amplitude_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, n, amp = _parse_wav(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_us"].append(n * 1_000_000 // rate)
                out["amplitude_sum"].append(amp)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, AUDIO_SCHEMA)

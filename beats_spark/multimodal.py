"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes, row-explosion for frame sampling — is real and tested. The actual
codec work (JPEG decode, audio resample, video frame extraction) requires
libraries not present in this container; those calls are STUBBED: with
`fake=True` (default) a deterministic fake decoder derived from the bytes
runs instead, with `fake=False` the operator raises NotImplementedError at
the point where Pillow/ffmpeg/torchaudio would be invoked. Swapping the stub
for the real codec changes no Spark plumbing.

(Beats has no media processing; the closest reference shapes are
detect_mime_type — /root/reference/libbeat/processors/actions/
detect_mime_type.go:39-40 — and the binary-field decoders
decode_base64_field/decompress_gzip_field. This module exists for the
training-data-pipeline mandate, not Beats parity.)
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("content_type", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": ("image", "image/jpeg"),
    b"\x89PNG": ("image", "image/png"),
    b"RIFF": ("audio", "audio/wav"),
    b"\x00\x00\x00": ("video", "video/mp4"),
}


def detect_media_type(df: DataFrame, content_col: str = "content",
                      target: str = "detected_type") -> DataFrame:
    """Magic-byte sniffing with built-in expressions (the detect_mime_type
    shape) — no Python, runs in codegen."""
    c = F.col(content_col)
    head = F.hex(F.substring(c, 1, 4))
    expr = F.lit("application/octet-stream")
    cases = [
        ("FFD8FF", "image/jpeg"),
        ("89504E47", "image/png"),
        ("52494646", "audio/wav"),
        ("000000", "video/mp4"),
    ]
    out = None
    for magic, mime in cases:
        cond = head.startswith(magic)
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    return df.withColumn(target, out.otherwise(expr))


def media_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap byte-level metadata via built-ins: size, magic, digest."""
    c = F.col(content_col)
    return (
        df.withColumn("byte_len", F.octet_length(c))
        .withColumn("magic_hex", F.hex(F.substring(c, 1, 4)))
        .withColumn("content_sha", F.sha2(c, 256))
    )


def _fake_decode(buf: bytes) -> tuple[int, int, int]:
    """Deterministic FAKE image decode: (width, height, n_channels) derived
    from a digest of the bytes. Replace with PIL.Image.open in production."""
    h = hashlib.sha256(buf).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 3 if h[2] % 4 else 1


DECODED_SCHEMA = (
    "media_id long, kind string, byte_len int, width int, height int, "
    "channels int, ok boolean"
)


def decode_media(df: DataFrame, fake: bool | None = True) -> DataFrame:
    """Decode/feature-extract media via mapInPandas (Arrow batch iterator —
    constant memory per task regardless of partition size; binary payloads
    never materialize on the driver).

    fake=True  → deterministic digest-derived dims (the default: the bench/
                 oracle query needs environment-independent output);
    fake=False → REAL image decode via Pillow; raises NotImplementedError
                 when Pillow is absent (this container ships no codecs);
    fake=None  → auto: real decode when Pillow imports, else the fake.
    Rows Pillow cannot parse (non-image kinds, corrupt bytes) come back
    ok=False rather than failing the task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real = not fake if fake is not None else None
        Image = None
        if fake is not True:
            try:
                from PIL import Image  # noqa: N813
                use_real = True
            except ImportError:
                if fake is False:
                    raise NotImplementedError(
                        "real media decode needs Pillow/ffmpeg; container "
                        "ships neither — use fake=True/None or install codecs"
                    ) from None
                use_real = False

        def real_decode(buf: bytes):
            import io

            try:
                with Image.open(io.BytesIO(buf)) as im:
                    return im.width, im.height, len(im.getbands()), True
            except Exception:
                return None, None, None, False

        for pdf in batches:
            recs = []
            for mid, kind, buf in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                if buf is None:
                    recs.append((mid, kind, 0, None, None, None, False))
                    continue
                buf = bytes(buf)
                if use_real:
                    w, h, c, ok = real_decode(buf)
                    recs.append((mid, kind, len(buf), w, h, c, ok))
                else:
                    w, h, c = _fake_decode(buf)
                    recs.append((mid, kind, len(buf), w, h, c, True))
            yield pd.DataFrame(
                recs,
                columns=["media_id", "kind", "byte_len", "width", "height",
                         "channels", "ok"],
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_sha string"


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: one output ROW per sampled frame (mapInPandas
    row explosion — the batch-shape change real frame extraction needs).
    Frame content is a deterministic FAKE digest of (bytes, index); swap the
    digest for an ffmpeg seek+decode in production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    continue
                buf = bytes(buf)
                for i in range(n_frames):
                    d = hashlib.sha256(buf + i.to_bytes(4, "big")).hexdigest()
                    rows.append((mid, i, d))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    return df.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes bytes through a mapInPandas stage that
    would call the resampler; the FAKE path re-digests bytes with the target
    dims (so output is deterministic and size-dependent)."""

    schema = "media_id long, width int, height int, resized_sha string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    continue
                d = hashlib.sha256(
                    bytes(buf) + width.to_bytes(2, "big") + height.to_bytes(2, "big")
                ).hexdigest()
                rows.append((mid, width, height, d))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "resized_sha"])

    return df.mapInPandas(run, schema)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents table: text bytes
    (zlib-compressed for realistic incompressibility) prefixed with a magic
    chosen by doc_id — gives the pipeline binary columns to exercise without
    shipping real media."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        magics = list(_MAGIC.items())
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                magic, (kind, mime) = magics[int(did) % len(magics)]
                payload = magic + zlib.compress(str(text).encode())
                rows.append((int(did), kind, payload, (f"doc-{did}", mime)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    return docs.mapInPandas(run, MEDIA_SCHEMA)

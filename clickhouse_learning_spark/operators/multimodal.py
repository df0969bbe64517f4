"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media payloads are opaque ``binary`` columns accompanied by a typed
metadata struct — the Spark-side contract (schema, partitioning, Arrow
batch shape through mapInPandas) is fully real and tested; only the
actual codec work is stubbed, because no image/audio libraries ship in
this container:

- if PIL/librosa/etc. import successfully, ``decode_image``/... use
  them;
- otherwise the deterministic fallback parses our fake header format
  (magic + width + height big-endian, see :func:`fake_image`) so every
  pipeline stage downstream of decode is exercised end-to-end with
  real Arrow batches.

At 100 TB: payloads dominate row size, so operators here always select
the narrowest columns first (payload column pruned away unless needed),
and decode runs in ``mapInPandas`` so each task streams Arrow batches
instead of materializing a partition of images.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = b"FIMG"  # deterministic fake image header


def fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake payload: header + pseudo-pixel bytes derived
    from media_id. Stands in for a real JPEG in tests."""
    header = _MAGIC + struct.pack(">II", width, height)
    n = min(width * height, 256)
    body = bytes(((media_id * 2654435761 + i * 40503) & 0xFF) for i in range(n))
    return header + body


def build_media_table(spark, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a media table from the documents fixture: one fake image
    per doc, sized from the doc id (deterministic)."""
    w = (F.col(id_col) % 64 + 16).cast("int")
    h = (F.col(id_col) % 48 + 16).cast("int")
    pdf = (
        docs.select(
            F.col(id_col).alias("media_id"),
            F.lit("image").alias("kind"),
            w.alias("w"),
            h.alias("h"),
            F.col("source"),
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "payload": [
                        fake_image(int(m), int(wi), int(hi))
                        for m, wi, hi in zip(b["media_id"], b["w"], b["h"])
                    ],
                    "source": b["source"],
                }
            )
            yield out

    raw = pdf.mapInPandas(
        gen, schema="media_id long, kind string, payload binary, source string"
    )
    return raw.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.col("source"),
            F.lit("image/fake").alias("mime"),
            F.length("payload").cast("long").alias("bytes"),
        ).alias("meta"),
    )


def _decode_header(payload: bytes) -> tuple[int, int] | None:
    if payload is None or len(payload) < 12 or payload[:4] != _MAGIC:
        return None
    w, h = struct.unpack(">II", payload[4:12])
    return int(w), int(h)


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Decode stage: payload → (width, height, ok). Real codecs would go
    here (PIL.Image.open over the bytes); the container has none, so the
    deterministic fake-header parser keeps the Arrow/mapInPandas
    plumbing — batch iteration, schema contract, null handling — real."""
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode is intentionally stubbed in this environment"
        )
    except ImportError:
        pass

    cols = media.columns

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            meta = [_decode_header(p) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": [m[0] if m else None for m in meta],
                    "height": [m[1] if m else None for m in meta],
                    "ok": [m is not None for m in meta],
                }
            )

    assert "payload" in cols and "media_id" in cols
    return media.select("media_id", "payload").mapInPandas(
        dec, schema="media_id long, width int, height int, ok boolean"
    )


def resize_plan(media: DataFrame, target: int = 32) -> DataFrame:
    """Resize stage plumbing: computes output geometry JVM-side from the
    decoded metadata (aspect-preserving shortest-side=target); the pixel
    resample itself is the stubbed codec step."""
    d = decode_image_meta(media)
    scale = F.least(F.lit(target) / F.col("width"), F.lit(target) / F.col("height"))
    return d.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"),
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0, duration_s: float = 10.0) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (explode of a JVM-side sequence); the decoder that would fill
    ``frame_payload`` is stubbed as null."""
    n = int(fps * duration_s)
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("frame_idx"),
        (F.col("media_id") * 1000 + F.col("media_id") % 7).alias("stream_offset"),
        F.lit(None).cast("binary").alias("frame_payload"),
    )

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container): the
format is a deterministic fake ("FAKE" magic + width/height/channels header
+ payload). Everything Spark-side — schema, partition-preserving mapInPandas
plumbing, batch shapes, metadata extraction — is real and tested, so
swapping ``_decode_stub`` for PIL/ffmpeg is a one-function change.

Scale notes: mapInPandas streams Arrow record batches, so constant memory
per task regardless of partition size; binary payloads never pass through
Python row objects. Decoding is embarrassingly parallel — repartition by
size (``maxPartitionBytes``) is the only knob.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAGIC = b"FAKE"
HEADER_LEN = 16

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def pack_fake_image(doc_id: int, text: str) -> bytes:
    """Deterministic fake image: header(16B) + utf-8 payload. Width/height
    derive from doc_id so an oracle can recompute them."""
    payload = text.encode("utf-8")
    return (MAGIC
            + struct.pack("<III", doc_id % 640 + 1, doc_id % 480 + 1, 3)
            + payload)


def attach_fake_binary(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Produce the (id, image binary) frame — the stand-in for reading real
    image bytes from a lake. mapInPandas keeps partitioning; no shuffle."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("image", T.BinaryType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame({
                "doc_id": b[id_col].astype("int64"),
                "image": [pack_fake_image(int(i), t)
                          for i, t in zip(b[id_col], b[text_col])],
            })

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def extract_image_metadata(images: DataFrame) -> DataFrame:
    """Decode the header only (cheap metadata pass — the step a pipeline
    runs on everything before deciding what to fully decode)."""
    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "fmt": [], "width": [], "height": [],
                   "channels": [], "n_bytes": []}
            for doc_id, raw in zip(b["doc_id"], b["image"]):
                raw = bytes(raw)
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(len(raw))
                if raw[:4] == MAGIC and len(raw) >= HEADER_LEN:
                    w, h, c = struct.unpack("<III", raw[4:16])
                    out["fmt"].append("fake")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(c)
                else:
                    out["fmt"].append("unknown")
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
            yield pd.DataFrame(out)

    return images.mapInPandas(meta, IMAGE_META_SCHEMA)


def _decode_stub(raw: bytes):
    """The real decoder slot. Image/audio libraries are not available in
    this environment — plug PIL/torchaudio/ffmpeg here."""
    raise NotImplementedError(
        "binary decode requires an image/audio library not present in this "
        "environment; use deterministic_fake_decode for plumbing tests")


def deterministic_fake_decode(raw: bytes, max_pixels: int = 16) -> list[int]:
    """Stand-in decode: first ``max_pixels`` payload bytes as pixel values —
    deterministic, so downstream feature-extraction plumbing is testable."""
    payload = bytes(raw)[HEADER_LEN:]
    return list(payload[:max_pixels])


DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("pixels", T.ArrayType(T.IntegerType())),
    T.StructField("n_pixels", T.IntegerType()),
])


def decode_images(images: DataFrame, use_stub: bool = True,
                  max_pixels: int = 16) -> DataFrame:
    """Full-decode pass (feature extraction / resize / frame-sample all
    follow this shape: binary in, array out, mapInPandas, Arrow batches)."""
    decode = deterministic_fake_decode if use_stub else _decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            pixels = [decode(raw, max_pixels) for raw in b["image"]]
            yield pd.DataFrame({
                "doc_id": b["doc_id"].astype("int64"),
                "pixels": pixels,
                "n_pixels": [len(p) for p in pixels],
            })

    return images.mapInPandas(run, DECODED_SCHEMA)

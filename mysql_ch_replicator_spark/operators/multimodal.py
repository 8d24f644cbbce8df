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
    image bytes from a lake. mapInPandas keeps partitioning; no shuffle.
    Deliberately NOT ``spread``: an r13 A/B measured the whole synthetic
    decode at ~0.4 s on one task vs ~1.2-2.0 s repartitioned 32-way at
    sf0.1 (the shuffle + 32 Arrow batches cost more than the decode),
    and every downstream stage over a 32-partition frame then pays 32
    task launches instead of 1. The real lake ingress
    (``ingest_binary_files``) is split by ``maxPartitionBytes``, so
    production decode parallelism comes from the source, not from a
    repartition here."""
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


def _parse_header(raw: bytes):
    """(fmt, width, height, channels) from the 16-byte fake header, or
    ('unknown', None, None, None) for foreign bytes."""
    if raw[:4] == MAGIC and len(raw) >= HEADER_LEN:
        w, h, c = struct.unpack("<III", raw[4:16])
        return "fake", w, h, c
    return "unknown", None, None, None


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
                fmt, w, h, c = _parse_header(raw)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
            yield pd.DataFrame(out)

    return images.mapInPandas(meta, IMAGE_META_SCHEMA)


FILE_META_SCHEMA = T.StructType([
    T.StructField("file_name", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_md5", T.StringType()),
])


def ingest_binary_files(spark, path: str,
                        glob: str | None = None) -> DataFrame:
    """From-disk multimodal ingestion (r6 verdict #6): Spark's
    ``binaryFile`` source reads a directory of opaque files into
    (path, modificationTime, length, content) — the real lake-ingress
    twin of ``attach_fake_binary``'s synthesized payloads. Returns the
    engine's multimodal convention (file_name, n_bytes, image) plus
    mod_time; feed it to extract_image_metadata / decode_images /
    resize_images / sample_frames by aliasing ``image``.

    Scale shape: binaryFile is a normal file-based DataSource — files
    split across tasks by size (maxPartitionBytes), pushdown on path
    via pathGlobFilter, no driver-side listing loops. Payload bytes
    travel JVM-side; nothing touches Python until a downstream
    mapInPandas asks."""
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    return files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("modificationTime").alias("mod_time"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("image"))


def binary_file_metadata(files: DataFrame) -> DataFrame:
    """Header-metadata pass over ``ingest_binary_files`` output, keyed by
    file name: ONE partition-preserving mapInPandas emitting (file_name,
    fmt, width, height, channels, n_bytes, content_md5). The md5 is of
    the hex rendering (``md5(hex(content))``), the engine's cross-engine
    binary-digest convention (DuckDB's md5 only accepts VARCHAR)."""
    from pyspark.sql import functions as F

    staged = files.withColumn("content_md5", F.md5(F.hex("image")))

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"file_name": [], "fmt": [], "width": [], "height": [],
                   "channels": [], "n_bytes": [], "content_md5": []}
            for name, raw, md5 in zip(b["file_name"], b["image"],
                                      b["content_md5"]):
                raw = bytes(raw)
                fmt, w, h, c = _parse_header(raw)
                out["file_name"].append(name)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["n_bytes"].append(len(raw))
                out["content_md5"].append(md5)
            yield pd.DataFrame(out)

    return staged.select("file_name", "image", "content_md5") \
        .mapInPandas(meta, FILE_META_SCHEMA)


try:  # the real decoder, wherever one exists (not in this sandbox)
    from PIL import Image as _PILImage  # type: ignore
except ImportError:
    _PILImage = None


def _decode_stub(raw: bytes, max_pixels: int = 16):
    """The real decoder slot, PIL-guarded (r4 verdict #7): where Pillow is
    installed, real image bytes (PNG/JPEG/...) decode to a flattened pixel
    list; the deterministic fake format always decodes via its own header
    (so mixed corpora work either way); without Pillow, non-fake bytes
    raise — plug torchaudio/ffmpeg the same way for audio/video."""
    raw = bytes(raw)
    if raw[:4] == MAGIC:
        return deterministic_fake_decode(raw, max_pixels)
    if _PILImage is None:
        raise NotImplementedError(
            "binary decode requires an image library not present in this "
            "environment; use deterministic_fake_decode for plumbing tests")
    import io

    with _PILImage.open(io.BytesIO(raw)) as img:
        data = list(img.convert("L").getdata())
    return [int(v) for v in data[:max_pixels]]


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
    follow this shape: binary in, array out, mapInPandas, Arrow batches).
    ``use_stub=False`` routes through the PIL-guarded real slot, which
    still handles the deterministic fake format header-side, so the same
    pipeline runs with or without an installed decoder."""
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


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("image", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize pass: binary in → binary out, new header, payload resampled by
    nearest-neighbor stride (the stub arithmetic; a real pipeline swaps in
    PIL here — the mapInPandas plumbing, schema and batch flow are what this
    exercises). One-in-one-out, partition-preserving, no shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_imgs = []
            for raw in b["image"]:
                raw = bytes(raw)
                payload = raw[HEADER_LEN:]
                target = out_w * out_h
                if payload and len(payload) > target:
                    stride = len(payload) / target
                    payload = bytes(payload[int(i * stride)]
                                    for i in range(target))
                out_imgs.append(
                    MAGIC + struct.pack("<III", out_w, out_h, 3) + payload)
            yield pd.DataFrame({
                "doc_id": b["doc_id"].astype("int64"),
                "image": out_imgs,
                "width": out_w, "height": out_h,
            })

    return images.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_off", T.LongType()),
    T.StructField("frame", T.BinaryType()),
])


def _frames_of(raw: bytes, frame_size: int, step: int):
    payload = bytes(raw)[HEADER_LEN:]
    n_frames = len(payload) // frame_size
    for idx in range(0, n_frames, step):
        off = idx * frame_size
        yield idx, HEADER_LEN + off, payload[off:off + frame_size]


def sample_frames(videos: DataFrame, frame_size: int = 8,
                  step: int = 4) -> DataFrame:
    """Frame-sampling pass: treat the payload after the header as a sequence
    of fixed-size frames, emit every ``step``-th complete frame — one input
    row fans out to N output rows (the one-to-many mapInPandas shape video
    pipelines need). Deterministic, so an oracle can recompute the sampled
    indices and offsets from the payload length alone."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame": []}
            for doc_id, raw in zip(b["doc_id"], b["image"]):
                for idx, off, frame in _frames_of(raw, frame_size, step):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame_off"].append(off)
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    return videos.mapInPandas(run, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("win_idx", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("energy", T.LongType()),
])


def audio_energy_windows(audio: DataFrame, frame: int = 32,
                         id_col: str = "doc_id",
                         bin_col: str = "image") -> DataFrame:
    """Fixed-frame audio feature extraction over the opaque binary column
    (the container is modality-agnostic — the payload after the 16-byte
    header is read as 8-bit unsigned PCM; foreign bytes with no header
    are taken whole). Emits one row per non-overlapping ``frame``-sample
    window with its exact integer energy Σ s² — the feature a VAD /
    silence-trim / loudness-normalization stage runs on everything
    before any model sees a waveform. A real decoder (torchaudio/ffmpeg)
    slots in exactly like the image path's ``_decode_stub``.

    Plumbing is the one-to-many mapInPandas fan-out (``sample_frames``'s
    shape): Arrow batches in, numpy-vectorized energies out, constant
    memory per task, no shuffle — embarrassingly parallel at any corpus
    size. The tail window keeps its true ``n_samples`` so downstream
    means stay exact."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "win_idx": [], "n_samples": [],
                   "energy": []}
            for doc_id, raw in zip(b[id_col], b[bin_col]):
                raw = bytes(raw)
                payload = raw[HEADER_LEN:] if raw[:4] == MAGIC else raw
                arr = np.frombuffer(payload, np.uint8).astype(np.int64)
                if arr.size == 0:
                    continue
                sq = arr * arr
                starts = np.arange(0, arr.size, frame)
                energies = np.add.reduceat(sq, starts)
                sizes = np.diff(np.append(starts, arr.size))
                out["doc_id"].extend([int(doc_id)] * starts.size)
                out["win_idx"].extend(range(starts.size))
                out["n_samples"].extend(int(s) for s in sizes)
                out["energy"].extend(int(e) for e in energies)
            yield pd.DataFrame(out)

    return audio.mapInPandas(run, AUDIO_WINDOW_SCHEMA)


SCENE_CUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("dist", T.LongType()),
])


def scene_cut_frames(videos: DataFrame, frame_size: int = 8,
                     id_col: str = "doc_id",
                     bin_col: str = "image") -> DataFrame:
    """Inter-frame change signal for video-style payloads: consecutive
    complete ``frame_size``-byte frames, one row per transition with the
    exact integer L1 distance Σ|f_t − f_{t−1}| — the raw signal a
    scene-cut / shot-boundary detector thresholds (and the sampling
    policy 'keep one frame per scene' consumes downstream). A real
    decoder's per-frame features slot into the same shape.

    numpy does the whole doc in two vector ops (reshape + abs-diff sum);
    Arrow batches in, no shuffle, constant memory per task."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "frame_idx": [], "dist": []}
            for doc_id, raw in zip(b[id_col], b[bin_col]):
                raw = bytes(raw)
                payload = raw[HEADER_LEN:] if raw[:4] == MAGIC else raw
                nf = len(payload) // frame_size
                if nf < 2:
                    continue
                a = (np.frombuffer(payload, np.uint8)[:nf * frame_size]
                     .astype(np.int64).reshape(nf, frame_size))
                d = np.abs(a[1:] - a[:-1]).sum(axis=1)
                out["doc_id"].extend([int(doc_id)] * (nf - 1))
                out["frame_idx"].extend(range(1, nf))
                out["dist"].extend(int(x) for x in d)
            yield pd.DataFrame(out)

    return videos.mapInPandas(run, SCENE_CUT_SCHEMA)


def pack_and_sample_frames(docs: DataFrame, frame_size: int = 8,
                           step: int = 4, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Fused scaffolding+sampling: generate the fake binary AND sample its
    frames in ONE mapInPandas pass — one Python/Arrow round-trip instead of
    two chained ones (a real pipeline reading binaries from the lake uses
    ``sample_frames`` directly)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame": []}
            for doc_id, text in zip(b[id_col], b[text_col]):
                raw = pack_fake_image(int(doc_id), text)
                for idx, off, frame in _frames_of(raw, frame_size, step):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame_off"].append(off)
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(run, FRAME_SCHEMA)


FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("std_px", T.DoubleType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


DHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("fp", T.LongType()),
])


def _dhash_bits(px: list[int], rows: int, cols: int) -> int:
    """Difference-hash bits over a rows×(cols+1) pixel grid: bit (r,c)
    set when the right neighbour is strictly brighter — the classic
    dHash gradient signature, invariant to uniform brightness shifts."""
    fp = 0
    for r in range(rows):
        base = r * (cols + 1)
        for c in range(cols):
            if px[base + c + 1] > px[base + c]:
                fp |= 1 << (r * cols + c)
    return fp


def dhash_images(images: DataFrame, rows: int = 6,
                 cols: int = 10) -> DataFrame:
    """Perceptual difference hash (dHash) per image as ONE 60-bit long —
    the multimodal twin of the text pipeline's SimHash: near-duplicate
    images land within small Hamming distance, so the SAME 4×15-bit
    pigeonhole banding dedups a 100 TB image corpus without all-pairs
    (see ``dedup.image_dhash_dedup``). 60 bits (6 rows × 10 gradients)
    rather than the classic 64 keeps the fingerprint in signed-long-safe
    territory on BOTH engines and reuses the SimHash band machinery.

    Grid extraction per format: the deterministic fake payload is its
    utf-8 text, so the "grayscale resample" is the first
    ``rows·(cols+1)`` code points (zero-padded) — exactly what a SQL
    oracle recomputes with ``unicode(substr(text, i, 1))``; real image
    bytes go through the PIL-guarded slot (grayscale →
    ``(cols+1)×rows`` resize), which raises NotImplementedError in
    image-library-free environments (same contract as ``_decode_stub``).
    One partition-preserving Arrow ``mapInPandas`` pass, no shuffle."""
    n_px = rows * (cols + 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fps = []
            for raw in b["image"]:
                raw = bytes(raw)
                if raw[:4] == MAGIC:
                    s = raw[HEADER_LEN:].decode("utf-8")
                    px = [ord(ch) for ch in s[:n_px]]
                else:
                    if _PILImage is None:
                        raise NotImplementedError(
                            "dhash of real image bytes requires an image "
                            "library not present in this environment")
                    import io

                    with _PILImage.open(io.BytesIO(raw)) as img:
                        px = list(img.convert("L")
                                  .resize((cols + 1, rows)).getdata())
                px = px + [0] * (n_px - len(px))
                fps.append(_dhash_bits(px, rows, cols))
            yield pd.DataFrame({
                "doc_id": b["doc_id"].astype("int64"), "fp": fps})

    return images.mapInPandas(run, DHASH_SCHEMA)


def extract_features(images: DataFrame, max_pixels: int = 16) -> DataFrame:
    """Feature-extraction pass over the decoded pixels (mean/std + the raw
    vector) — numpy-vectorized inside the Arrow batch; the slot where a real
    pipeline runs an embedding model."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            means, stds, feats = [], [], []
            for raw in b["image"]:
                px = np.asarray(deterministic_fake_decode(bytes(raw),
                                                          max_pixels),
                                dtype="float64")
                if px.size:
                    means.append(float(px.mean()))
                    stds.append(float(px.std()))
                    feats.append([float(v) for v in px])
                else:
                    means.append(None)
                    stds.append(None)
                    feats.append([])
            yield pd.DataFrame({
                "doc_id": b["doc_id"].astype("int64"),
                "mean_px": means, "std_px": stds, "features": feats,
            })

    return images.mapInPandas(run, FEATURES_SCHEMA)

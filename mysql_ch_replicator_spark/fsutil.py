"""Small-file + directory operations routed through the JVM Hadoop
``FileSystem`` API — the storage layer Spark itself writes through.

The persisted-index operators (``operators/similarity.upsert_ivf_index``,
``operators/retrieval.upsert_lexical_index``) keep tiny JSON descriptors
(meta + crash-intent manifests) NEXT TO parquet data Spark writes via
Hadoop. Managing those with python ``open()``/``os.remove``/
``shutil.rmtree`` silently breaks the moment the index path is not a
local filesystem (``s3a://``, ``hdfs://``): the parquet write succeeds
but the manifest write fails — or worse, the emptied-partition cleanup
no-ops and stale shards survive an upsert that promised to clear them
(ADVICE r7). Routing every side-file and delete through
``Path.getFileSystem`` makes the operators correct on ANY scheme the
Spark cluster can reach, at zero extra cost on ``file://``.

Helpers take an explicit ``spark`` or fall back to the active session
(these are driver-side, called where a session always exists)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(path: str, spark: SparkSession | None = None):
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "fsutil needs an active SparkSession (Hadoop FileSystem "
            "access runs through the session's JVM)")
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def write_text(path: str, text: str,
               spark: SparkSession | None = None) -> None:
    """Atomic-enough small-file write (create w/ overwrite) through the
    Hadoop FS — works on any scheme, unlike ``open()``."""
    fs, p, _ = _fs(path, spark)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(path: str, spark: SparkSession | None = None) -> str:
    fs, p, jvm = _fs(path, spark)
    stream = fs.open(p)
    try:
        bos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, bos, 65536,
                                                   False)
        return bos.toString("UTF-8")
    finally:
        stream.close()


def exists(path: str, spark: SparkSession | None = None) -> bool:
    fs, p, _ = _fs(path, spark)
    return bool(fs.exists(p))


def delete(path: str, recursive: bool = True,
           spark: SparkSession | None = None) -> bool:
    """Delete a file or directory tree; False when the path was already
    absent (the ``ignore_errors`` idempotence the callers rely on), but
    a real backend failure still raises instead of silently leaking."""
    fs, p, _ = _fs(path, spark)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))

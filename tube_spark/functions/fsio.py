"""Hadoop-FileSystem-backed small-file I/O for driver-side state.

Several operators persist tiny driver-side artifacts next to their
parquet data: IVF centroids (``operators/vectorstore.py``), the
Misra-Gries summary (``streaming/heavyhitters.py``), incremental-
curation state discovery (``streaming/curation.py``).  Plain
``open()``/``os.listdir()`` binds those artifacts to the driver-local
filesystem, while the parquet beside them happily lives on ``hdfs://``
or ``s3a://`` — the stated deployment shape.  These helpers route the
same few-KB reads/writes through the JVM's ``org.apache.hadoop.fs``
API (the pattern ``layout.dir_bytes`` already uses), so state and data
always share a scheme.

All functions take the ``SparkSession`` explicitly — the FileSystem is
resolved per-path from the session's Hadoop configuration, so one call
can touch ``file:/tmp/...`` and the next ``s3a://bucket/...``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def join(path: str, *parts: str) -> str:
    """Scheme-preserving path join (``os.path.join`` is POSIX-local)."""
    out = path.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def exists(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return bool(fs.exists(p))


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names under ``path`` (empty when it doesn't exist)."""
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [s.getPath().getName() for s in fs.listStatus(p)]


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p, _ = _fs(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete a file or directory tree; False when it didn't exist."""
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def read_text(spark: SparkSession, path: str) -> str:
    fs, p, jvm = _fs(spark, path)
    stream = fs.open(p)
    try:
        sink = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, 65536, False)
        return bytes(sink.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write via a temp file + overwrite-rename.

    On HDFS and the local FS the swap is a single
    ``FileContext.rename(..., Rename.OVERWRITE)`` metadata op, so a
    concurrent reader always sees either the old or the new content —
    never a missing file (the delete-then-rename window would make
    callers that treat a missing manifest as empty state restart
    version numbering).  Stores without an ``AbstractFileSystem``
    binding (e.g. bare ``s3a://``) fall back to delete+rename — the
    same non-atomic window every manifest writer has on an object
    store; pair with a versioned-pointer layout there."""
    fs, p, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    try:
        ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            p.toUri(), spark._jsc.hadoopConfiguration()
        )
        rename_opts = spark.sparkContext._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        rename_opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        ctx.rename(tmp, p, rename_opts)
        return
    except Exception:
        # UnsupportedFileSystemException (no AbstractFileSystem for the
        # scheme) or an engine that rejects OVERWRITE — degrade below.
        pass
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise IOError(f"rename {path}.tmp -> {path} failed")

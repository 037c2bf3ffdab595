"""Storage-agnostic index metadata I/O via the Hadoop FileSystem API.

Every piece of index bookkeeping — ``_meta.json``, chunk manifests,
stream state, cache sizing, the empty-table filler probe — goes through
these helpers instead of local ``os.*`` calls, so the engine runs
unchanged whether ``index_dir`` is a local path, ``file:`` URI,
``hdfs://``, ``viewfs://``, or an object store (``s3a://`` / ``gs://``
once the connector jars are on the classpath). Spark's own reads and
writes already resolve any such URI; these helpers give the *driver
side* the same reach (the reference's analog is simply that its on-disk
artifacts live where its single process runs, ``diskindex.py:226-229``).

Implementation: py4j into the JVM's ``org.apache.hadoop.fs.FileSystem``
(always on Spark's classpath — no new dependency). Each call is one or
two JVM round-trips; all callers are per-build/per-append metadata
operations, never per-row.

Atomicity: ``write_text_atomic`` writes ``<path>.tmp`` then renames.
Rename is atomic on HDFS/local; on object stores it is copy+delete, so
the commit points that rely on it (chunk manifests, ``_meta.json``,
stream state) degrade to "last writer wins with a small window" there —
the same caveat as Spark's own ``FileOutputCommitter`` v1, and safe in
the crash direction because every reader treats a *missing* file as
"not committed".
"""

from __future__ import annotations

import json


def _jfs(spark, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    try:
        # keep index dirs free of ChecksumFileSystem's .crc siblings
        # (local/viewfs schemes; HDFS checksums are server-side anyway)
        fs.setWriteChecksum(False)
    except Exception:
        pass
    return fs, jpath


def join(base: str, *parts: str) -> str:
    """URI-safe path join (``os.path.join`` would mangle ``scheme://``)."""
    return "/".join([base.rstrip("/"), *parts])


def exists(spark, path: str) -> bool:
    fs, p = _jfs(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark, path: str) -> None:
    fs, p = _jfs(spark, path)
    fs.mkdirs(p)


def delete(spark, path: str, recursive: bool = True) -> bool:
    """Delete a file or tree; False if it did not exist."""
    fs, p = _jfs(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def rename(spark, src: str, dst: str) -> bool:
    fs, s = _jfs(spark, src)
    _, d = _jfs(spark, dst)
    return bool(fs.rename(s, d))


def read_text(spark, path: str) -> str:
    fs, p = _jfs(spark, path)
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(spark, path: str, text: str) -> None:
    """Write-then-rename commit (see module docstring for semantics).

    Hadoop's ``FileSystem.rename`` won't overwrite, so updating an
    existing file is delete-then-rename — NOT a single atomic step. The
    crash window is closed by ordering, not by the rename: the ``.tmp``
    file is COMPLETE (written and closed) before the destination is
    deleted, so at every instant at least one complete copy exists —
    the destination (before the delete) or ``.tmp`` (after it).
    :func:`read_text_atomic` encodes that invariant on the read side;
    a ``.tmp`` left by a crash mid-write is never preferred because the
    destination still exists in that case.
    """
    fs, p = _jfs(spark, path)
    tmp = spark._jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise IOError(f"atomic commit rename failed: {path}")


def read_text_atomic(spark, path: str) -> str:
    """Read a :func:`write_text_atomic`-committed file, surviving a
    crash between the commit's delete and rename: prefer ``path``;
    when it is missing, fall back to ``path.tmp``, which the write
    ordering guarantees is the complete NEW content whenever ``path``
    is absent."""
    fs, p = _jfs(spark, path)
    if fs.exists(p):
        return read_text(spark, path)
    tmp = path + ".tmp"
    _, t = _jfs(spark, tmp)
    if fs.exists(t):
        return read_text(spark, tmp)
    return read_text(spark, path)  # raise the natural not-found error


def read_json(spark, path: str) -> dict:
    return json.loads(read_text(spark, path))


def read_json_atomic(spark, path: str) -> dict:
    return json.loads(read_text_atomic(spark, path))


def write_json_atomic(spark, path: str, obj) -> None:
    write_text_atomic(spark, path, json.dumps(obj))


def listdir(spark, path: str) -> list[str]:
    """Child entry names (files and dirs); [] when ``path`` is missing."""
    fs, p = _jfs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def tree_bytes(spark, path: str) -> int:
    """Total bytes under ``path`` (0 when missing) — cache sizing."""
    fs, p = _jfs(spark, path)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def has_file_with_suffix(spark, path: str, suffix: str = ".parquet") -> bool:
    """True iff any file under ``path`` (recursive) ends with ``suffix``."""
    fs, p = _jfs(spark, path)
    if not fs.exists(p):
        return False
    it = fs.listFiles(p, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            return True
    return False

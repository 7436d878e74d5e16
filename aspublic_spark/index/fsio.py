"""Filesystem seam for the index commit protocol.

The reference gets crash-safe index maintenance for free from sqlite
transactions (common/db_sqlite.py:28-41). This index is a set of
parquet directories on a shared filesystem, so the commit protocol has
to supply that atomicity itself — and it must do so on HDFS and object
stores (S3/GCS/ABFS), where POSIX ``os.rename`` either does not exist
or is a non-atomic copy. Every filesystem operation the protocol
performs goes through this interface, and the protocol is written
against exactly TWO guarantees:

1. ``write_file_atomic(path, data)``: after it returns, the file is
   fully visible with exactly ``data``; if the process dies first, the
   file is absent (or its previous committed content is intact). This
   holds natively on object stores (a PUT is atomic at the object
   level), via create+rename on HDFS (HDFS rename IS atomic), and via
   ``os.replace`` locally.
2. ``exists`` / ``listdir`` reflect committed state (strong listing
   consistency — true of POSIX, HDFS, S3 since 2020, GCS, ABFS).

Nothing else is assumed: NO directory rename, NO append, NO multi-file
atomicity. Spark job output (a parquet directory) becomes visible only
when a separate manifest/marker file is written AFTER the job
completes; a data directory without its manifest is invisible garbage
that ``IndexBuilder.repair()`` collects.

``FaultInjectingFS`` wraps any implementation and kills the process
(raises ``CrashError``) after a budget of mutating operations — the
crash-sweep tests replay every prefix of the protocol and assert
``repair()`` restores a consistent index from each one.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


class CrashError(RuntimeError):
    """Simulated process death between filesystem operations."""


class FileSystem:
    """Interface. Paths are plain strings (POSIX paths or URIs)."""

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """Child NAMES of a directory; [] if the directory is absent."""
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_file_atomic(self, path: str, data: str | bytes) -> None:
        raise NotImplementedError

    def delete(self, path: str, recursive: bool = False) -> None:
        """Remove a file or directory tree; no-op if absent."""
        raise NotImplementedError

    # -- conveniences shared by all implementations --------------------
    def read_json(self, path: str) -> dict:
        return json.loads(self.read_text(path))

    def write_json_atomic(self, path: str, obj) -> None:
        self.write_file_atomic(path, json.dumps(obj))


class LocalFS(FileSystem):
    """POSIX filesystem; atomic single-file commit via os.replace."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def write_file_atomic(self, path: str, data: str | bytes) -> None:
        if isinstance(data, str):
            data = data.encode("utf-8")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def delete(self, path: str, recursive: bool = False) -> None:
        if os.path.isdir(path):
            if recursive:
                shutil.rmtree(path, ignore_errors=True)
            else:
                try:
                    os.rmdir(path)
                except FileNotFoundError:
                    pass
        else:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass


# object-store schemes where a single-object PUT is atomic and rename
# is a non-atomic server-side copy — write directly, never rename
_PUT_ATOMIC_SCHEMES = {"s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss"}


class HadoopFS(FileSystem):
    """Hadoop-FileSystem-backed implementation via Spark's JVM gateway —
    one class covers hdfs://, s3a://, gs://, abfs://, file:// (whatever
    the cluster's Hadoop configuration can open). On rename-atomic
    filesystems (HDFS, file) single-file commits go through
    create-temp + rename; on object stores they are direct creates
    (the PUT itself is atomic)."""

    def __init__(self, spark, root: str):
        jvm = spark.sparkContext._jvm
        self._jvm = jvm
        self._gateway = spark.sparkContext._gateway
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        uri = jvm.java.net.URI.create(root)
        self._uri = uri
        self._conf = conf
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)
        self._fc = None  # FileContext, built lazily for overwrite-rename
        scheme = uri.getScheme()
        self._put_atomic = (scheme or "file") in _PUT_ATOMIC_SCHEMES

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return sorted(
            st.getPath().getName() for st in self._fs.listStatus(p)
        )

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            bos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, bos, 65536, False)
            out = bytes(bos.toByteArray())
            return out.decode("utf-8")
        finally:
            stream.close()

    def _create(self, path: str, data: bytes) -> None:
        stream = self._fs.create(self._p(path), True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def _rename_overwrite(self, src, dst) -> None:
        """Single atomic overwrite-rename (FileContext supports
        Options.Rename.OVERWRITE; plain FileSystem.rename does not) —
        no window where the destination is absent."""
        if self._fc is None:
            self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._uri, self._conf
            )
        rename_cls = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gateway.new_array(rename_cls, 1)
        opts[0] = rename_cls.OVERWRITE
        self._fc.rename(src, dst, opts)

    def write_file_atomic(self, path: str, data: str | bytes) -> None:
        if isinstance(data, str):
            data = data.encode("utf-8")
        if self._put_atomic:
            self._create(path, data)  # object PUT: atomic at close
            return
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        self._create(tmp, data)
        p, t = self._p(path), self._p(tmp)
        try:
            # HDFS/file: one atomic overwrite-rename, no absent window
            self._rename_overwrite(t, p)
        except Exception:
            # scheme without an AbstractFileSystem binding: fall back to
            # delete+rename. This opens a crash window where the
            # destination is briefly absent — readers of protocol files
            # (_global_stale, repair) treat a MISSING pointer/stats file
            # as stale state and re-derive it, so the window is healed,
            # not fatal.
            if self._fs.exists(p):
                self._fs.delete(p, False)
            if not self._fs.rename(t, p):
                self._fs.delete(t, False)
                raise IOError(f"atomic commit rename failed for {path}")

    def delete(self, path: str, recursive: bool = False) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, recursive)


class FaultInjectingFS(FileSystem):
    """Wraps another FileSystem and raises CrashError immediately BEFORE
    the (budget+1)-th MUTATING operation — simulating a process that
    died between two protocol steps. Reads never fail (a dead process
    does not corrupt what was already committed)."""

    def __init__(self, inner: FileSystem, budget: int):
        self.inner = inner
        self.budget = budget
        self.mutations = 0

    def _spend(self):
        if self.mutations >= self.budget:
            raise CrashError(f"injected crash after {self.budget} mutations")
        self.mutations += 1

    def exists(self, path):
        return self.inner.exists(path)

    def isdir(self, path):
        return self.inner.isdir(path)

    def listdir(self, path):
        return self.inner.listdir(path)

    def read_text(self, path):
        return self.inner.read_text(path)

    def makedirs(self, path):
        self._spend()
        self.inner.makedirs(path)

    def write_file_atomic(self, path, data):
        self._spend()
        self.inner.write_file_atomic(path, data)

    def delete(self, path, recursive=False):
        self._spend()
        self.inner.delete(path, recursive)


def fs_for(path: str, spark=None) -> FileSystem:
    """Pick the implementation from the path's scheme: plain paths get
    LocalFS; any URI (hdfs://, s3a://, file://, ...) routes through the
    Hadoop client of the provided SparkSession."""
    if "://" in path or path.startswith("file:"):
        if spark is None:
            raise ValueError(f"a SparkSession is required for URI paths: {path}")
        return HadoopFS(spark, path)
    return LocalFS()

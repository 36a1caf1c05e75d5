"""Metadata-plane FileIO indirection for the lake catalog.

The reference's production posture is a Glue catalog over an S3
warehouse (``/root/reference/lambda/iceberg_helper.py:89-110``): the
*catalog and table metadata* live behind a service interface while the
*data files* are read/written by the engine's own IO stack. This module
gives table_format.py the same seam:

- every metadata operation (version hints, metadata JSON, existence
  probes, namespace listing, drop) goes through a ``FileIO`` object;
- the data plane stays on Spark's Hadoop FileSystem layer
  (``df.write.parquet`` / ``spark.read.parquet``), which is already
  pluggable to S3/GCS/HDFS by deployment configuration (s3a:// URLs +
  the relevant jars) — re-abstracting it in Python would add a slower
  second path for no portability gain.

An S3 metadata backend is therefore one subclass (get/put/list on keys,
plus a URL-aware ``join``) and a location scheme — a config change, not
a refactor. ``InMemoryFileIO`` is the contract-test fake proving
nothing in the catalog reaches the local filesystem directly
(tests/test_fileio.py runs the same scenario against both backends).
"""

from __future__ import annotations

import os
import shutil
import uuid
from abc import ABC, abstractmethod


class FileIO(ABC):
    """Small metadata-IO surface: text blobs + namespace operations.
    Paths are strings; ``join`` owns separator semantics so URL-style
    backends can override it."""

    @abstractmethod
    def read_text(self, path: str) -> str: ...

    @abstractmethod
    def write_text(self, path: str, text: str) -> None:
        """Write, creating parent namespaces as needed."""

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def mkdirs(self, path: str) -> None:
        """Idempotent namespace creation."""

    @abstractmethod
    def delete_recursive(self, path: str) -> None:
        """Remove a path and everything under it; no-op if absent."""

    @abstractmethod
    def list_subdirs(self, path: str) -> list[str]:
        """Immediate child namespace names, sorted; [] if absent."""

    def join(self, base: str, *parts: str) -> str:
        return os.path.join(base, *parts)


class LocalFileIO(FileIO):
    """POSIX filesystem backend (the in-container default)."""

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        """Atomic: write a sibling temp file, then rename over the
        target. A truncate-in-place write lets a concurrent reader
        (another handle, the streaming source's worker process)
        observe an EMPTY version-hint mid-commit — the torn read
        Iceberg's metadata protocol avoids the same way."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete_recursive(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)

    def list_subdirs(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return sorted(
            e for e in os.listdir(path)
            if os.path.isdir(os.path.join(path, e))
        )


class InMemoryFileIO(FileIO):
    """Dict-backed fake: a blob store keyed by path, with directories
    implied by key prefixes (exactly the object-store model an S3
    backend would have). Used by contract tests to prove the catalog's
    metadata plane never touches the local filesystem directly."""

    def __init__(self) -> None:
        self.blobs: dict[str, str] = {}
        self.dirs: set[str] = set()

    def _norm(self, path: str) -> str:
        return os.path.normpath(path)

    def read_text(self, path: str) -> str:
        key = self._norm(path)
        if key not in self.blobs:
            raise FileNotFoundError(path)
        return self.blobs[key]

    def write_text(self, path: str, text: str) -> None:
        key = self._norm(path)
        self.blobs[key] = text
        parent = os.path.dirname(key)
        while parent and parent not in self.dirs:
            self.dirs.add(parent)
            parent = os.path.dirname(parent)

    def exists(self, path: str) -> bool:
        key = self._norm(path)
        return key in self.blobs or key in self.dirs

    def mkdirs(self, path: str) -> None:
        key = self._norm(path)
        while key and key not in self.dirs:
            self.dirs.add(key)
            key = os.path.dirname(key)

    def delete_recursive(self, path: str) -> None:
        prefix = self._norm(path)
        self.blobs = {
            k: v
            for k, v in self.blobs.items()
            if k != prefix and not k.startswith(prefix + os.sep)
        }
        self.dirs = {
            d
            for d in self.dirs
            if d != prefix and not d.startswith(prefix + os.sep)
        }

    def list_subdirs(self, path: str) -> list[str]:
        prefix = self._norm(path) + os.sep
        out = set()
        for d in self.dirs:
            if d.startswith(prefix):
                out.add(d[len(prefix):].split(os.sep, 1)[0])
        return sorted(out)

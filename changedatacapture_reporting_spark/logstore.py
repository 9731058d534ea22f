"""Pluggable commit primitive for log-structured table protocols.

The Delta writer's entire concurrency story reduces to ONE primitive:
*put-if-absent* of ``_delta_log/<version>.json`` — two writers racing
for the same version both attempt it, exactly one wins, the loser
re-resolves the log and retries at the next version. Where that
primitive lives depends on the storage system:

- **Local / HDFS / ABFS** — the filesystem namespace itself is the
  coordinator: ``create(path, overwrite=false)`` is an atomic metadata
  operation (``O_CREAT|O_EXCL`` locally). :class:`HadoopLogStore`
  (the default) delegates to :func:`fs.create_exclusive`.
- **S3-style object stores without conditional writes** — plain PUT is
  last-writer-wins, so an exists-check-then-PUT sequence can silently
  OVERWRITE a concurrent commit (both writers pass the check, both
  PUT, one commit vanishes). There the primitive must come from an
  external coordinator that CAN do an atomic put-if-absent on a tiny
  claim record — a DynamoDB-style conditional put, a database row, a
  ZooKeeper node. :class:`CoordinatedLogStore` implements the claim
  protocol over any such coordinator; only the claim winner writes the
  actual log file, so the file write itself no longer needs atomicity.
  (This is the shape of the public delta-storage
  ``BaseExternalLogStore`` / ``S3DynamoDBLogStore`` design.)

The active store is process-global (:func:`get_log_store` /
:func:`set_log_store`); the writer resolves it at every commit attempt
so tests — and deployments — can swap implementations without touching
the writer. The remaining deployment requirement is therefore exactly
"bring a coordinator for S3", not "don't use S3".
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession

from changedatacapture_reporting_spark import fs


class LogStore:
    """Commit-primitive interface: atomic put-if-absent of a small text
    file. Implementations MUST guarantee that for a given ``path`` at
    most one concurrent ``put_if_absent`` returns True, and that a True
    return implies the content is durably readable at ``path``."""

    def put_if_absent(
        self, spark: SparkSession, path: str, text: str
    ) -> bool:
        raise NotImplementedError


class HadoopLogStore(LogStore):
    """Default: the filesystem namespace is the coordinator — atomic on
    local (``O_CREAT|O_EXCL``) and HDFS (namespace create), NOT on bare
    S3; use :class:`CoordinatedLogStore` there."""

    def put_if_absent(
        self, spark: SparkSession, path: str, text: str
    ) -> bool:
        return fs.create_exclusive(spark, path, text)


class CoordinatedLogStore(LogStore):
    """put-if-absent for stores whose file create is NOT atomic.

    The atomicity is borrowed from ``coordinator.claim(key)`` — any
    backend offering an atomic put-if-absent on a small record (a
    DynamoDB conditional put, a SQL unique-key insert, ZooKeeper).
    Protocol per commit attempt:

    1. ``claim(path)`` — atomic. Loser returns False immediately:
       someone else owns this version, retry at the next one.
    2. Winner (and ONLY the winner) writes the log file with a plain
       overwrite-tolerant write. No concurrent writer exists for this
       path, so the non-atomic PUT is safe.

    Crash caveat (same as the public external-LogStore designs): a
    winner that dies between 1 and 2 leaves a claimed-but-missing
    version; recovery is coordinator-side (claim records carry owner +
    expiry and a recovering writer re-completes or releases them).
    The in-repo test double models the happy path and the race; expiry
    needs a real clock and belongs to the backend.
    """

    def __init__(self, coordinator: "Coordinator"):
        self.coordinator = coordinator

    def put_if_absent(
        self, spark: SparkSession, path: str, text: str
    ) -> bool:
        if not self.coordinator.claim(path):
            return False
        fs.write_text(spark, path, text)
        return True


class Coordinator:
    """Atomic claim table: ``claim(key)`` returns True exactly once per
    key across all concurrent callers."""

    def claim(self, key: str) -> bool:
        raise NotImplementedError


class InMemoryCoordinator(Coordinator):
    """Process-local coordinator (a stand-in for DynamoDB et al.) —
    correct for tests and single-process multi-threaded writers."""

    def __init__(self) -> None:
        self._claimed: set[str] = set()
        self._lock = threading.Lock()

    def claim(self, key: str) -> bool:
        with self._lock:
            if key in self._claimed:
                return False
            self._claimed.add(key)
            return True


_active: LogStore = HadoopLogStore()
_swap_lock = threading.Lock()


def get_log_store() -> LogStore:
    return _active


def set_log_store(store: LogStore) -> LogStore:
    """Install ``store`` as the process-global commit primitive; returns
    the previous one so callers can restore it."""
    global _active
    with _swap_lock:
        prev = _active
        _active = store
    return prev

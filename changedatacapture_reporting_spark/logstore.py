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

    The atomicity is borrowed from ``coordinator.claim(key, payload)`` —
    any backend offering an atomic put-if-absent on a small record (a
    DynamoDB conditional put, a SQL unique-key insert, ZooKeeper). The
    full protocol per commit attempt (the public external-LogStore
    design: stage a durable temp copy BEFORE claiming, so a crashed
    winner is recoverable by anyone):

    1. Write the commit content to a unique TEMP object next to the log
       (``_delta_log/.tmp/<uuid>``). Non-atomic PUT is fine — the name
       is unique, nobody races for it.
    2. ``claim(path, temp_rel)`` — atomic, records where the content
       lives. Loser: run :meth:`ensure_complete` on the existing claim
       (finishing a dead winner's publish if needed — otherwise the
       table would be wedged at a claimed-but-missing version forever),
       then return False so the writer retries at the next version.
    3. Winner copies temp → final (sole writer for this path; the
       non-atomic PUT is safe) and marks the claim complete.

    A winner that dies between 2 and 3 leaves (claim, temp) behind;
    the NEXT writer to lose a claim race on that path — or any reader
    calling :meth:`ensure_complete` — re-publishes from the temp copy.
    Completed claims' temp objects are droppable garbage (backend TTL).
    """

    def __init__(self, coordinator: "Coordinator"):
        self.coordinator = coordinator

    @staticmethod
    def _temp_path(path: str) -> str:
        import uuid

        base, name = path.rsplit("/", 1)
        return f"{base}/.tmp/{name}.{uuid.uuid4().hex}"

    def ensure_complete(self, spark: SparkSession, path: str) -> None:
        """Finish a dead claim winner's publish: if ``path`` is claimed
        but not marked complete, copy the claim's temp object to the
        final path and mark it. Idempotent — re-copying the same bytes
        over a published file is harmless; marking twice is harmless."""
        rec = self.coordinator.get(path)
        if rec is None or rec.get("complete"):
            return
        temp = rec["temp"]
        if not fs.exists(spark, path):
            fs.write_text(spark, path, fs.read_text(spark, temp))
        self.coordinator.mark_complete(path)

    def put_if_absent(
        self, spark: SparkSession, path: str, text: str
    ) -> bool:
        temp = self._temp_path(path)
        fs.write_text(spark, temp, text)
        if not self.coordinator.claim(path, temp):
            # loser: before retrying at the next version, make sure the
            # version that beat us is actually readable (its writer may
            # have died pre-publish)
            self.ensure_complete(spark, path)
            return False
        fs.write_text(spark, path, text)
        self.coordinator.mark_complete(path)
        return True


class Coordinator:
    """Atomic claim table. ``claim(key, payload)`` returns True exactly
    once per key across all concurrent callers and durably records the
    payload (the temp object location); ``get``/``mark_complete`` read
    and finalize the record."""

    def claim(self, key: str, temp: str) -> bool:
        raise NotImplementedError

    def get(self, key: str) -> dict | None:
        raise NotImplementedError

    def mark_complete(self, key: str) -> None:
        raise NotImplementedError


class InMemoryCoordinator(Coordinator):
    """Process-local coordinator (a stand-in for DynamoDB et al.) —
    correct for tests and single-process multi-threaded writers."""

    def __init__(self) -> None:
        self._claims: dict[str, dict] = {}
        self._lock = threading.Lock()

    def claim(self, key: str, temp: str) -> bool:
        with self._lock:
            if key in self._claims:
                return False
            self._claims[key] = {"temp": temp, "complete": False}
            return True

    def get(self, key: str) -> dict | None:
        with self._lock:
            rec = self._claims.get(key)
            return dict(rec) if rec else None

    def mark_complete(self, key: str) -> None:
        with self._lock:
            if key in self._claims:
                self._claims[key]["complete"] = True


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

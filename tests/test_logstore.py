"""Pluggable LogStore seam (logstore.py, VERDICT r10 #5).

The Delta writer's commit must stay race-safe through ANY installed
LogStore: the same two-writers-race-one-version scenario runs against
the default HadoopLogStore (filesystem-namespace atomicity) and a
CoordinatedLogStore over the in-memory claim table (the shape an
S3-without-conditional-writes deployment brings). A third test
demonstrates the anomaly the coordinator exists to prevent: an
exists-check-then-PUT store — eventual-create S3 semantics — silently
loses a commit under the worst-case interleaving, while the
coordinator over the SAME non-atomic file write does not.
"""

from __future__ import annotations

import json
import os

import pytest

from changedatacapture_reporting_spark import fs as _fs
from changedatacapture_reporting_spark import logstore
from changedatacapture_reporting_spark.logstore import (
    CoordinatedLogStore,
    HadoopLogStore,
    InMemoryCoordinator,
    SQLiteCoordinator,
    get_log_store,
    set_log_store,
)


from changedatacapture_reporting_spark.sources.delta_table import (
    read_delta,
    table_versions,
    write_delta,
)


def _make_coordinator(kind: str, tmp_path) -> "logstore.Coordinator":
    """The two coordinator backends every coordinated-protocol test
    runs against: the in-memory double and SQLite — a claim table with
    REAL durability and lock-serialized INSERT OR IGNORE atomicity (the
    closest jar-less stand-in for the DynamoDB/JDBC coordinators the
    protocol targets; VERDICT r11 task 7)."""
    if kind == "memory":
        return InMemoryCoordinator()
    return SQLiteCoordinator(str(tmp_path / "claims.db"))


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _race_one_version(spark, path):
    """Writer B commits version 1 inside writer A's race window (between
    A's version resolution and A's commit attempt), injected via the
    active store's put_if_absent."""
    store = get_log_store()
    real = store.put_if_absent
    injected = {"done": False}

    def racing(sp, p, text=""):
        if not injected["done"] and "00000000000000000001.json" in p:
            injected["done"] = True
            write_delta(
                sp, sp.createDataFrame([(2, "b")], "id long, v string"), path
            )
        return real(sp, p, text)

    store.put_if_absent = racing
    try:
        return write_delta(
            spark, spark.createDataFrame([(3, "c")], "id long, v string"), path
        )
    finally:
        store.put_if_absent = real


def _assert_race_safe(spark, path, v):
    assert v == 2  # lost the race at 1, won at 2
    assert table_versions(spark, path) == [0, 1, 2]
    assert _rows(read_delta(spark, path)) == {(1, "a"), (2, "b"), (3, "c")}
    logdir = os.path.join(path, "_delta_log")
    for name in sorted(os.listdir(logdir)):
        if name.endswith(".json"):
            for line in open(os.path.join(logdir, name)):
                json.loads(line)  # single coherent commit per version


def test_writer_race_safe_under_hadoop_logstore(spark, tmp_path):
    path = str(tmp_path / "race_hadoop")
    assert isinstance(get_log_store(), HadoopLogStore)  # the default
    write_delta(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), path
    )
    _assert_race_safe(spark, path, _race_one_version(spark, path))


@pytest.mark.parametrize("coord_kind", ["memory", "sqlite"])
def test_writer_race_safe_under_coordinated_logstore(
    spark, tmp_path, coord_kind
):
    path = str(tmp_path / "race_coord")
    prev = set_log_store(
        CoordinatedLogStore(_make_coordinator(coord_kind, tmp_path))
    )
    try:
        write_delta(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), path
        )
        _assert_race_safe(spark, path, _race_one_version(spark, path))
        # eager temp hygiene (ADVICE r11): neither the winners' nor the
        # losers' staged temps survive their commit attempts
        tmp_dir = os.path.join(path, "_delta_log", ".tmp")
        leftovers = os.listdir(tmp_dir) if os.path.isdir(tmp_dir) else []
        assert leftovers == []
    finally:
        set_log_store(prev)


class _NonAtomicS3Store(logstore.LogStore):
    """exists-then-PUT — bare S3 semantics. ``interleave`` fires between
    the check and the write, the window where a concurrent PUT lands."""

    def __init__(self, interleave=None):
        self.interleave = interleave

    def put_if_absent(self, spark, path, text):
        if _fs.exists(spark, path):
            return False
        if self.interleave is not None:
            self.interleave(spark, path)
        _fs.write_text(spark, path, text)  # last-writer-wins PUT
        return True


def test_non_atomic_store_loses_a_commit_and_coordinator_prevents_it(
    spark, tmp_path
):
    """The documented S3 anomaly, made deterministic: both writers pass
    the exists check for version 1, both PUT, writer B's commit is
    OVERWRITTEN — rows silently vanish. Wrapping the same non-atomic
    file write behind the claim coordinator removes the anomaly."""
    path = str(tmp_path / "s3_anomaly")

    def concurrent_commit(sp, p):
        if "00000000000000000001.json" in p:
            _fs.write_text(
                sp,
                p,
                json.dumps(
                    {
                        "add": {
                            "path": "part-ghost.parquet",
                            "partitionValues": {},
                            "size": 1,
                            "modificationTime": 0,
                            "dataChange": True,
                        }
                    }
                )
                + "\n",
            )

    prev = set_log_store(_NonAtomicS3Store(interleave=concurrent_commit))
    try:
        write_delta(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), path
        )
        write_delta(
            spark, spark.createDataFrame([(3, "c")], "id long, v string"), path
        )
        # the ghost commit that also "won" version 1 is gone — the
        # non-atomic PUT overwrote it: this is the lost-commit anomaly
        log1 = open(
            os.path.join(path, "_delta_log", "00000000000000000001.json")
        ).read()
        assert "part-ghost" not in log1
    finally:
        set_log_store(prev)

    # same non-atomic file write, now gated by the claim table: a ghost
    # writer racing the same version must lose the CLAIM (atomic), so
    # its PUT never happens — no overwrite is possible by construction
    path2 = str(tmp_path / "s3_coordinated")
    coord = InMemoryCoordinator()
    prev = set_log_store(CoordinatedLogStore(coord))
    try:
        write_delta(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), path2
        )
        # ghost races for version 1 and claims first — the real writer
        # must observe the lost claim and land at version 2
        ghost_key = os.path.join(
            path2, "_delta_log", "00000000000000000001.json"
        )
        _fs.write_text(spark, ghost_key + ".ghosttmp", "")
        assert coord.claim(ghost_key, ghost_key + ".ghosttmp")
        _fs.write_text(spark, ghost_key, json.dumps({"add": None}) + "\n")
        coord.mark_complete(ghost_key)
        v = write_delta(
            spark, spark.createDataFrame([(3, "c")], "id long, v string"), path2
        )
        assert v == 2
        assert _rows(read_delta(spark, path2)) == {(1, "a"), (3, "c")}
    finally:
        set_log_store(prev)


@pytest.mark.parametrize("coord_kind", ["memory", "sqlite"])
def test_coordinated_store_recovers_dead_winners_publish(
    spark, tmp_path, coord_kind
):
    """The external-LogStore crash case: a writer CLAIMS version N, then
    dies before publishing the log file. Without recovery the table is
    wedged — every later writer loses the claim for N forever and N
    never becomes readable. The loser's ensure_complete must re-publish
    N from the dead winner's temp object so the table heals and the
    loser lands at N+1."""
    path = str(tmp_path / "crash_recover")
    coord = _make_coordinator(coord_kind, tmp_path)
    store = CoordinatedLogStore(coord)
    prev = set_log_store(store)
    try:
        write_delta(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), path
        )
        # simulate a winner that dies between claim and publish: stage
        # the temp + claim exactly as put_if_absent does, then vanish
        key = os.path.join(path, "_delta_log", "00000000000000000001.json")
        dead_commit = (
            json.dumps(
                {
                    "add": {
                        "path": "part-dead.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
        temp = store._temp_path(key)
        _fs.write_text(spark, temp, dead_commit)
        assert coord.claim(key, temp)
        assert not _fs.exists(spark, key)  # died pre-publish

        # next writer: loses the claim race at 1, HEALS it from the
        # temp copy, retries and lands at 2
        v = write_delta(
            spark, spark.createDataFrame([(3, "c")], "id long, v string"), path
        )
        assert v == 2
        assert _fs.exists(spark, key)
        assert _fs.read_text(spark, key) == dead_commit
        assert coord.get(key)["complete"]
        # version 1 (the recovered dead commit) is part of history;
        # its ghost data file doesn't exist, so only assert log shape
        assert table_versions(spark, path) == [0, 1, 2]
    finally:
        set_log_store(prev)


# ---------------------------------------------------------------------------
# randomized crash-point fuzz for the coordinated commit protocol (r11):
# writers die at every stage — after staging the temp, after winning the
# claim, after the final PUT but before marking complete — in random
# sequences. Invariants: one owner per key, the published content is
# ALWAYS the owner's (healed by any later loser or an explicit
# ensure_complete), published bytes never change once readable, and a
# True return only ever goes to the owner.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


class _Crash(RuntimeError):
    pass


class _CrashingCoordinated(CoordinatedLogStore):
    """Crash-point model of put_if_absent, kept in lockstep with the
    REAL protocol (r12 added the eager temp deletes — the loser drops
    its own temp before healing, the winner after mark_complete — so
    the model crashes around those too)."""

    def __init__(self, coordinator, stage):
        super().__init__(coordinator)
        self.stage = stage

    def put_if_absent(self, spark, path, text):
        temp = self._temp_path(path)
        _fs.write_text(spark, temp, text)
        if self.stage == "after_temp":
            raise _Crash()
        if not self.coordinator.claim(path, temp):
            _fs.delete(spark, temp)
            if self.stage == "after_loser_delete":
                raise _Crash()  # died before healing the winner
            self.ensure_complete(spark, path)
            return False
        if self.stage == "after_claim":
            raise _Crash()
        _fs.write_text(spark, path, text)
        if self.stage == "after_final":
            raise _Crash()
        self.coordinator.mark_complete(path)
        if self.stage == "after_mark":
            raise _Crash()  # complete but temp left behind — garbage only
        _fs.delete(spark, temp)
        return True


_STAGES = st.sampled_from(
    [
        "none",
        "after_temp",
        "after_claim",
        "after_final",
        "after_mark",
        "after_loser_delete",
    ]
)


@pytest.mark.parametrize("coord_kind", ["memory", "sqlite"])
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_STAGES, min_size=1, max_size=6))
def test_coordinated_commit_survives_any_crash_sequence(
    spark, tmp_path_factory, coord_kind, stages
):
    import uuid as _uuid

    base = str(tmp_path_factory.mktemp("crashfuzz") / _uuid.uuid4().hex)
    key = f"{base}/_delta_log/00000000000000000001.json"
    coord = _make_coordinator(coord_kind, tmp_path_factory.mktemp("coord"))

    owner_content = None  # content of the writer whose CLAIM succeeded
    winners = []
    for i, stage in enumerate(stages):
        content = f"commit-by-writer-{i}\n"
        store = _CrashingCoordinated(coord, stage)
        claimed_before = coord.get(key) is not None
        try:
            won = store.put_if_absent(spark, key, content)
        except _Crash:
            # did this writer's claim land before it died?
            if not claimed_before and coord.get(key) is not None:
                owner_content = content
            continue
        if won:
            winners.append(i)
            owner_content = content
        # published-content stability: once readable, always the owner's
        if _fs.exists(spark, key):
            assert _fs.read_text(spark, key) == owner_content

    assert len(winners) <= 1  # at most one True per key, ever
    rec = coord.get(key)
    if rec is not None:
        # someone owns the version; a healer must be able to finish it
        CoordinatedLogStore(coord).ensure_complete(spark, key)
        assert _fs.read_text(spark, key) == owner_content
        assert coord.get(key)["complete"]
    else:
        # nobody ever claimed — nothing may have been published
        assert not _fs.exists(spark, key)

def test_sqlite_coordinator_claims_survive_reopen(tmp_path):
    """What the in-memory double can't show: the claim table is DURABLE.
    A second coordinator instance over the same database file (a
    restarted process, or another process on the host) sees the first
    instance's claims and cannot double-claim."""
    db = str(tmp_path / "claims.db")
    c1 = SQLiteCoordinator(db)
    assert c1.claim("k1", "t1")
    assert not c1.claim("k1", "t-other")
    c1.mark_complete("k1")

    c2 = SQLiteCoordinator(db)  # fresh connection, same durable table
    assert not c2.claim("k1", "t-second-process")
    rec = c2.get("k1")
    assert rec == {"temp": "t1", "complete": True}
    assert c2.get("missing") is None
    assert c2.claim("k2", "t2") and not c1.claim("k2", "t2b")


def test_per_call_log_store_override(spark, tmp_path):
    """ADVICE r11: one process writing tables on DIFFERENT storage needs
    per-table commit primitives — write_delta/merge_delta/optimize_delta
    accept a log_store override without touching the process global."""
    from changedatacapture_reporting_spark.sources.delta_table import (
        merge_delta,
        optimize_delta,
    )

    class _Counting(HadoopLogStore):
        def __init__(self):
            self.commits = 0

        def put_if_absent(self, spark, path, text):
            self.commits += 1
            return super().put_if_absent(spark, path, text)

    path = str(tmp_path / "tbl")
    mine = _Counting()
    assert isinstance(get_log_store(), HadoopLogStore)
    before_global = get_log_store()

    write_delta(
        spark,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        path,
        log_store=mine,
    )
    write_delta(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        path,
        log_store=mine,
    )
    src = spark.createDataFrame([(2, "B2")], "id long, v string")
    merge_delta(spark, src, path, ["id"], log_store=mine)
    optimize_delta(spark, path, log_store=mine)
    assert mine.commits == 4
    assert get_log_store() is before_global  # global untouched
    assert _rows(read_delta(spark, path)) == {(1, "a"), (2, "B2")}

    # omitting the override still uses the global store
    write_delta(
        spark, spark.createDataFrame([(3, "c")], "id long, v string"), path
    )
    assert mine.commits == 4

def test_ensure_complete_tolerates_winner_dropping_temp_mid_heal(
    spark, tmp_path
):
    """r12's eager temp delete opened a benign race: a healer reads an
    INCOMPLETE claim record, then the live winner publishes, marks
    complete and deletes its temp before the healer's copy step.
    ensure_complete must fall back to the published path (deletion
    strictly follows publish) instead of failing on the missing temp —
    and must still raise when the claim is GENUINELY broken (temp gone,
    nothing published)."""

    class _StaleGetCoordinator(InMemoryCoordinator):
        """get() replays a stale incomplete record once — the snapshot a
        healer would hold just before the winner finishes."""

        def __init__(self):
            super().__init__()
            self.stale_once = None

        def get(self, key):
            if self.stale_once is not None:
                rec, self.stale_once = self.stale_once, None
                return rec
            return super().get(key)

    coord = _StaleGetCoordinator()
    store = CoordinatedLogStore(coord)
    key = str(tmp_path / "_delta_log" / "00000000000000000001.json")
    temp = store._temp_path(key)

    # winner completed: path published, claim marked, temp deleted
    _fs.write_text(spark, key, "the-winners-commit\n")
    coord._claims[key] = {"temp": temp, "complete": True}
    # the healer still holds the stale pre-completion view
    coord.stale_once = {"temp": temp, "complete": False}
    store.ensure_complete(spark, key)  # must not raise
    assert _fs.read_text(spark, key) == "the-winners-commit\n"

    # genuinely broken claim: temp vanished AND nothing was published
    key2 = str(tmp_path / "_delta_log" / "00000000000000000002.json")
    coord._claims[key2] = {
        "temp": store._temp_path(key2),
        "complete": False,
    }
    with pytest.raises(Exception):
        store.ensure_complete(spark, key2)

"""Crash-recovery soak: the two interruption windows the swap-before-delete
design promises to survive (storage/table.py, storage/manifest.py C7;
reference order: manifest swap before physical deletes,
src/columnar_storage/src/compaction/executor.rs:203-253).

Faults are injected at the exact seams — between the SST parquet write and
the manifest append, and between the manifest swap and the physical input
deletes — then the table is REOPENED from disk (a fresh ColumnarTable over
the same root, exactly what a restarted driver does) and the recovered scan
is checked against the pre-crash oracle state. vacuum() must reclaim the
orphan bytes without changing a single visible row.
"""

import os

import pytest
from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.storage.compaction import (
    CompactionTask,
    Compactor,
    SchedulerConfig,
)
from horaedb_spark.storage.table import ColumnarTable, WriteRequest
from tests.test_storage import TWO_HOURS, kv_schema


def _rows(table):
    return [tuple(r) for r in table.scan().collect()]


def _write(table, rows, tr):
    df = table.spark.createDataFrame(rows, "pk1 long, pk2 long, value long")
    return table.write(WriteRequest(df, tr))


def test_crash_between_sst_write_and_manifest_append(spark, tmp_path):
    """Die AFTER the SST parquet lands, BEFORE the manifest append
    (table.py write(): the declared-range SST is on disk but unreferenced).
    Restart must show exactly the pre-crash state — the orphan is invisible
    because scans read the manifest's explicit path list — and vacuum
    reclaims it byte-wise without touching visible rows."""
    root = str(tmp_path / "kv")
    t = ColumnarTable(spark, root, kv_schema(), TWO_HOURS)
    _write(t, [(1, 1, 10), (2, 2, 20), (3, 3, 30)], TimeRange(0, 100))
    pre_crash = _rows(t)
    assert pre_crash == [(1, 1, 10), (2, 2, 20), (3, 3, 30)]

    def die(_sst):
        raise RuntimeError("injected crash: before manifest append")

    t.manifest.add_file = die
    with pytest.raises(RuntimeError, match="before manifest append"):
        _write(t, [(1, 1, 11), (4, 4, 40)], TimeRange(100, 200))

    # the crashed write's SST directory exists on disk but is unreferenced
    seg_dir = os.path.join(root, "data", "__segment__=0")
    on_disk = set(os.listdir(seg_dir))
    t2 = ColumnarTable(spark, root, kv_schema(), TWO_HOURS)  # restart
    live = {f"sst={s.file_id}" for s in t2.manifest.all_ssts()}
    orphans = on_disk - live
    assert len(orphans) == 1, (on_disk, live)

    assert _rows(t2) == pre_crash  # recovery: orphan invisible
    removed = t2.vacuum()
    assert [os.path.basename(p) for p in removed] == sorted(orphans)
    assert set(os.listdir(seg_dir)) == live  # bytes reclaimed
    assert _rows(t2) == pre_crash  # vacuum changed nothing visible

    # the re-issued write (what a restarted ingester does) lands cleanly
    _write(t2, [(1, 1, 11), (4, 4, 40)], TimeRange(100, 200))
    assert _rows(t2) == [(1, 1, 11), (2, 2, 20), (3, 3, 30), (4, 4, 40)]


def test_crash_between_manifest_swap_and_physical_delete(spark, tmp_path):
    """Die AFTER the compaction manifest swap, BEFORE the input deletes
    (executor.rs:203-253 order). Restart must serve the NEW (merged) state
    — the swap is the commit point — while the input SSTs linger as
    orphans until vacuum."""
    root = str(tmp_path / "kv")
    t = ColumnarTable(spark, root, kv_schema(), TWO_HOURS)
    # overlapping PK versions in one segment so the merge is real
    s1 = _write(t, [(1, 1, 10), (2, 2, 20)], TimeRange(0, 50))
    s2 = _write(t, [(1, 1, 11), (3, 3, 30)], TimeRange(50, 100))
    merged = _rows(t)
    assert merged == [(1, 1, 11), (2, 2, 20), (3, 3, 30)]
    input_dirs = {os.path.basename(s.path) for s in (s1, s2)}

    comp = Compactor(t, SchedulerConfig())

    def die(_path):
        raise RuntimeError("injected crash: before physical delete")

    t.backend.delete_tree = die
    with pytest.raises(RuntimeError, match="before physical delete"):
        comp.execute(CompactionTask(inputs=[s1, s2]))

    seg_dir = os.path.join(root, "data", "__segment__=0")
    on_disk = set(os.listdir(seg_dir))
    assert input_dirs <= on_disk  # inputs still on disk post-crash

    t2 = ColumnarTable(spark, root, kv_schema(), TWO_HOURS)  # restart
    live = {f"sst={s.file_id}" for s in t2.manifest.all_ssts()}
    assert live.isdisjoint(input_dirs)  # swap committed: inputs dropped
    assert _rows(t2) == merged  # recovery serves the compacted state

    removed = t2.vacuum()
    assert {os.path.basename(p) for p in removed} == input_dirs
    assert set(os.listdir(seg_dir)) == live
    assert _rows(t2) == merged  # vacuum changed nothing visible

    # post-recovery the table is fully writable and mergeable again
    _write(t2, [(2, 2, 21)], TimeRange(100, 200))
    assert _rows(t2) == [(1, 1, 11), (2, 2, 21), (3, 3, 30)]


def test_crash_streaming_ingest_then_recovery_and_vacuum(spark, tmp_path):
    """The soak shape: a micro-batched ingest loop dies at BOTH seams in
    one run (write-side crash in batch 2, compaction-side crash after the
    swap), the driver restarts each time, and the final recovered +
    vacuumed table matches the oracle fold of every COMMITTED batch."""
    root = str(tmp_path / "kv")
    t = ColumnarTable(spark, root, kv_schema(), TWO_HOURS)
    committed = {}  # (pk1, pk2) -> value, the oracle fold

    def commit_oracle(rows):
        for pk1, pk2, v in rows:
            committed[(pk1, pk2)] = v

    # batch 1 commits
    b1 = [(1, 1, 100), (2, 2, 200)]
    _write(t, b1, TimeRange(0, 50))
    commit_oracle(b1)
    # batch 2 crashes before the manifest append -> NOT committed
    t.manifest.add_file = lambda sst: (_ for _ in ()).throw(
        RuntimeError("crash A")
    )
    with pytest.raises(RuntimeError):
        _write(t, [(1, 1, 666)], TimeRange(50, 100))
    # restart 1
    t = ColumnarTable(spark, root, kv_schema(), TWO_HOURS)
    # batch 3 commits (the restarted ingester retries its batch)
    b3 = [(1, 1, 101), (3, 3, 300)]
    _write(t, b3, TimeRange(50, 100))
    commit_oracle(b3)
    # compaction swaps then crashes before deleting its inputs
    inputs = list(t.manifest.all_ssts())
    comp = Compactor(t, SchedulerConfig())
    t.backend.delete_tree = lambda p: (_ for _ in ()).throw(
        RuntimeError("crash B")
    )
    with pytest.raises(RuntimeError):
        comp.execute(CompactionTask(inputs=inputs))
    # restart 2 + vacuum
    t = ColumnarTable(spark, root, kv_schema(), TWO_HOURS)
    t.vacuum()
    expect = sorted((k[0], k[1], v) for k, v in committed.items())
    assert _rows(t) == expect
    # exactly one live SST (the compacted one) and no stray directories
    seg_dir = os.path.join(root, "data", "__segment__=0")
    assert len(t.manifest.all_ssts()) == 1
    assert set(os.listdir(seg_dir)) == {
        f"sst={s.file_id}" for s in t.manifest.all_ssts()
    }

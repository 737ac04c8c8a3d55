"""Row-level DELETE via tombstones: scan masking, insert-after-delete,
predicate-scan safety, MVCC time travel over deletes, and the compaction
GC rule (partial pick keeps tombstones, full-segment pick drops them).

The reference has no row-delete surface (DIVERGENCES.md); these pin the
extension's LSM semantics: tombstone = row with __reserved__=TOMBSTONE and
a winning __seq__, filtered post-merge.
"""

from pyspark.sql import functions as F

from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.storage.compaction import CompactionTask, Compactor, SchedulerConfig
from horaedb_spark.storage.merge import TOMBSTONE
from horaedb_spark.storage.table import ColumnarTable, ScanRequest, WriteRequest
from tests.test_storage import TWO_HOURS, kv_schema


def _mk(spark, rows):
    return spark.createDataFrame(rows, "pk1 long, pk2 long, value long")


def _build(spark, path):
    t = ColumnarTable(spark, str(path), kv_schema(), TWO_HOURS)
    t.write(WriteRequest(_mk(spark, [(1, 1, 10), (2, 2, 20)]), TimeRange(0, 10)))
    t.write(WriteRequest(_mk(spark, [(3, 3, 30)]), TimeRange(10, 20)))
    return t


def test_delete_masks_rows_and_insert_after_delete(spark, tmp_path):
    t = _build(spark, tmp_path / "d1")
    ssts = t.delete("value >= 20")
    assert len(ssts) == 1 and ssts[0].num_rows == 2  # both keys, one segment
    assert [tuple(r) for r in t.scan().collect()] == [(1, 1, 10)]
    # a later write of a deleted key outranks the tombstone
    t.write(WriteRequest(_mk(spark, [(2, 2, 200)]), TimeRange(20, 30)))
    assert [tuple(r) for r in t.scan().collect()] == [(1, 1, 10), (2, 2, 200)]


def test_delete_semantics_are_current_state_not_any_version(spark, tmp_path):
    t = ColumnarTable(spark, str(tmp_path / "d2"), kv_schema(), TWO_HOURS)
    t.write(WriteRequest(_mk(spark, [(1, 1, 99)]), TimeRange(0, 10)))
    # overwrite to a non-matching value BEFORE the delete
    t.write(WriteRequest(_mk(spark, [(1, 1, 5)]), TimeRange(10, 20)))
    assert t.delete("value >= 50") == []  # current row (5) doesn't match
    assert [tuple(r) for r in t.scan().collect()] == [(1, 1, 5)]


def test_predicate_scan_does_not_resurrect_deleted_rows(spark, tmp_path):
    t = _build(spark, tmp_path / "d3")
    t.delete("pk1 = 2")
    # the old version (value=20) matches the scan predicate; the tombstone's
    # NULL value column must not let it slip past the pre-merge filter
    out = t.scan(ScanRequest(predicate="value >= 20"))
    assert [tuple(r) for r in out.collect()] == [(3, 3, 30)]


def test_as_of_seq_snapshot_sees_rows_before_delete(spark, tmp_path):
    t = _build(spark, tmp_path / "d4")
    before = max(s.file_id for s in t.manifest.all_ssts())
    t.delete("pk1 = 1")
    assert [tuple(r) for r in t.scan().collect()] == [(2, 2, 20), (3, 3, 30)]
    snap = t.scan(ScanRequest(as_of_seq=before))
    assert [tuple(r) for r in snap.collect()] == [(1, 1, 10), (2, 2, 20), (3, 3, 30)]


def _compact(t, inputs):
    comp = Compactor(t, SchedulerConfig(input_sst_min_num=1))
    task = CompactionTask(inputs=inputs)
    return comp.execute(task)


def test_partial_compaction_keeps_tombstones(spark, tmp_path):
    t = ColumnarTable(spark, str(tmp_path / "d5"), kv_schema(), TWO_HOURS)
    t.write(WriteRequest(_mk(spark, [(1, 1, 10)]), TimeRange(0, 10)))
    t.write(WriteRequest(_mk(spark, [(1, 1, 11)]), TimeRange(10, 20)))
    t.delete("pk1 = 1")
    assert t.scan().count() == 0
    # compact ONLY the newer data SST + the tombstone SST — the oldest
    # version (value=10) stays outside the pick and must remain masked
    ssts = sorted(t.manifest.all_ssts(), key=lambda s: s.file_id)
    new_sst = _compact(t, ssts[1:])
    assert new_sst is not None
    assert t.scan().count() == 0  # not resurrected
    kept = t.scan(ScanRequest(keep_builtin=True, ordered=False))
    assert kept.filter(F.col("__reserved__") == TOMBSTONE).count() == 1


def test_full_segment_compaction_garbage_collects_tombstones(spark, tmp_path):
    t = ColumnarTable(spark, str(tmp_path / "d6"), kv_schema(), TWO_HOURS)
    t.write(WriteRequest(_mk(spark, [(1, 1, 10), (2, 2, 20)]), TimeRange(0, 10)))
    t.write(WriteRequest(_mk(spark, [(1, 1, 11)]), TimeRange(10, 20)))
    t.delete("pk1 = 1")
    new_sst = _compact(t, sorted(t.manifest.all_ssts(), key=lambda s: s.file_id))
    assert new_sst is not None
    assert [tuple(r) for r in t.scan().collect()] == [(2, 2, 20)]
    # tombstone physically gone after the bottom-level rewrite
    kept = t.scan(ScanRequest(keep_builtin=True, ordered=False))
    assert kept.filter(F.col("__reserved__") == TOMBSTONE).count() == 0
    assert new_sst.num_rows == 1


def test_update_rewrites_only_matching_rows(spark, tmp_path):
    """UPDATE applies expressions to current matching rows as new versions;
    untouched rows and pre-update snapshots keep their values."""
    t = _build(spark, tmp_path / "u1")
    before = max(s.file_id for s in t.manifest.all_ssts())
    ssts = t.update("value >= 20", {"value": "value * 10"})
    assert len(ssts) == 1 and ssts[0].num_rows == 2 and not ssts[0].tombstone
    assert [tuple(r) for r in t.scan().collect()] == [
        (1, 1, 10), (2, 2, 200), (3, 3, 300),
    ]
    snap = t.scan(ScanRequest(as_of_seq=before))
    assert [tuple(r) for r in snap.collect()] == [(1, 1, 10), (2, 2, 20), (3, 3, 30)]


def test_update_rejects_pk_assignment_and_append_mode(spark, tmp_path):
    import pytest

    t = _build(spark, tmp_path / "u2")
    with pytest.raises(ValueError, match="primary-key"):
        t.update("value > 0", {"pk1": "pk1 + 1"})
    with pytest.raises(ValueError, match="unknown"):
        t.update("value > 0", {"nope": "1"})


def test_update_then_delete_compose(spark, tmp_path):
    t = _build(spark, tmp_path / "u3")
    t.update("pk1 = 2", {"value": "999"})
    t.delete("value = 999")  # deletes the row the update just produced
    assert [tuple(r) for r in t.scan().collect()] == [(1, 1, 10), (3, 3, 30)]


def test_merge_into_update_delete_insert_one_pass(spark, tmp_path):
    """One merge_into: matched+delete-cond rows tombstone, other matched
    rows update (with cur_<col> visible), not-matched rows insert."""
    t = _build(spark, tmp_path / "m1")  # (1,1,10) (2,2,20) seg0; (3,3,30) seg0
    src = spark.createDataFrame(
        [
            (1, 1, 5, 1000),    # matched, value<15 -> delete clause
            (2, 2, 7, 2000),    # matched -> update: value = cur_value + src
            (9, 9, 90, 3000),   # not matched -> insert
        ],
        "pk1 long, pk2 long, value long, ts long",
    )
    ssts = t.merge_into(
        src,
        "ts",
        when_matched_update={"value": "cur_value + value"},
        when_matched_delete="cur_value < 15",
    )
    assert len(ssts) == 1 and ssts[0].tombstone  # one segment, mixed rows
    assert [tuple(r) for r in t.scan().collect()] == [
        (2, 2, 27), (3, 3, 30), (9, 9, 90),
    ]


def test_merge_into_insert_only_into_empty_table(spark, tmp_path):
    t = ColumnarTable(spark, str(tmp_path / "m2"), kv_schema(), TWO_HOURS)
    src = spark.createDataFrame(
        [(1, 1, 10, 100), (2, 2, 20, 100)], "pk1 long, pk2 long, value long, ts long"
    )
    t.merge_into(src, "ts")
    assert [tuple(r) for r in t.scan().collect()] == [(1, 1, 10), (2, 2, 20)]


def test_merge_into_no_insert_flag(spark, tmp_path):
    t = _build(spark, tmp_path / "m3")
    src = spark.createDataFrame(
        [(1, 1, 777, 100), (8, 8, 888, 100)], "pk1 long, pk2 long, value long, ts long"
    )
    t.merge_into(src, "ts", when_matched_update={"value": "value"},
                 when_not_matched_insert=False)
    out = [tuple(r) for r in t.scan().collect()]
    assert (1, 1, 777) in out and not any(r[0] == 8 for r in out)


def test_merge_into_cdc_apply_with_op_column(spark, tmp_path):
    """CDC apply: a change batch with an op flag (extra source column,
    visible to the delete clause) — D deletes, everything else upserts to
    the source values."""
    t = _build(spark, tmp_path / "cdc")  # (1,1,10) (2,2,20) (3,3,30)
    src = spark.createDataFrame(
        [
            (2, 2, 222, 100, "U"),
            (3, 3, 0, 100, "D"),
            (7, 7, 70, 100, "I"),
        ],
        "pk1 long, pk2 long, value long, ts long, op string",
    )
    t.merge_into(src, "ts", when_matched_delete="op = 'D'")
    assert [tuple(r) for r in t.scan().collect()] == [
        (1, 1, 10), (2, 2, 222), (7, 7, 70),
    ]
